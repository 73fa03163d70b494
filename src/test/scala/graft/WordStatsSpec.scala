package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Differential contract for the WordStats kernel: the codegen'd
  * single-pass struct must equal the higher-order-function tree it
  * replaced, field by field, over the corpus AND the edge cases the
  * corpus never hits (empties, exotic whitespace, unicode incl. the
  * kelvin sign, punctuation salad).
  */
class WordStatsSpec extends SparkSpec {
  import spark.implicits._

  private val edgeCases = Seq(
    "", " ", "   ", "\t", " \t ", "a", " a ", "\ta\t", "a b", "a  b",
    "the quick brown fox", "THE AND OR of to IN Is iT", "thee anda",
    "it, is. the; and", "...", "a-b c_d", "Kt is", "OK then",
    "café résumé the", "中文 text and",
    "x\nnewline\nthe", "mixedvt\fff\rcr the", "1 2 3 and 4",
    "trailing space the ", "  leading and", "punct!?'\"()[]{}-:;")

  // the ORIGINAL HOF formulations, kept verbatim as the reference
  private def hofFrame(df: org.apache.spark.sql.DataFrame) = {
    val t = col("t")
    val ws = split(trim(t), "\\s+")
    val stops = array(TextAnalysis.EnStopwords.map(lit): _*)
    df.select(t,
      size(ws).cast("long").as("n_words"),
      aggregate(ws, lit(0L), (acc, x) => acc + length(x).cast("long"))
        .as("sum_len"),
      size(filter(ws, x => x.rlike("[A-Za-z]"))).cast("long").as("n_alpha"),
      size(filter(ws, x => array_contains(stops, lower(x)))).cast("long")
        .as("n_stop"),
      length(regexp_replace(t, "[^.,;:!?'\"()\\[\\]{}-]", "")).cast("long")
        .as("n_punct"))
  }

  private def kernelFrame(df: org.apache.spark.sql.DataFrame) = {
    val st = TextAnalysis.wordStats(col("t"))
    df.select(col("t"), st.getField("n_words").as("n_words"),
      st.getField("sum_len").as("sum_len"),
      st.getField("n_alpha").as("n_alpha"),
      st.getField("n_stop").as("n_stop"),
      st.getField("n_punct").as("n_punct"))
  }

  test("kernel equals the HOF tree on edge cases") {
    val df = edgeCases.toDF("t")
    val a = hofFrame(df).collect().map(_.toSeq).sortBy(_.head.toString)
    val b = kernelFrame(df).collect().map(_.toSeq).sortBy(_.head.toString)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"hof=$x kernel=$y") }
  }

  test("kernel equals the HOF tree on random unicode strings") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val charGen = Gen.frequency(
      (8, Gen.alphaNumChar),
      (3, Gen.oneOf(' ', '\t', '\n', '\r', '\f', '')),
      (2, Gen.oneOf(".,;:!?'\"()[]{}-".toSeq)),
      (1, Gen.oneOf('é', 'ß', '中', '文', 'K', ' ', '')),
      (1, Gen.oneOf("the", "a", "IT", "Is").flatMap(s => Gen.const(s.head))))
    val strGen = Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, charGen))
      .map(_.mkString)
    val samples = (0 until 60).flatMap(i =>
      strGen(Gen.Parameters.default, Seed(5000L + i)))
    val df = samples.toDF("t")
    val a = hofFrame(df).collect().map(_.toSeq).sortBy(_.head.toString)
    val b = kernelFrame(df).collect().map(_.toSeq).sortBy(_.head.toString)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"hof=$x kernel=$y") }
  }

  test("kernel equals the HOF tree on the documents corpus") {
    val df = Engine.table(spark, sf, "documents")
      .select(col("text").as("t")).limit(500)
    val a = hofFrame(df).collect().map(_.toSeq).sortBy(_.head.toString)
    val b = kernelFrame(df).collect().map(_.toSeq).sortBy(_.head.toString)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("DsirBuckets kernel equals the split/explode/transform feature multiset") {
    graft.plans.PolyHashExpr.register(spark)
    val df = (edgeCases ++ Engine.table(spark, sf, "documents")
      .select("text").limit(200).collect().map(_.getString(0))).toDF("t")
    // the ORIGINAL formulation, kept verbatim as the reference
    val base = df.select(col("t"), split(trim(col("t")), "\\s+").as("ts"))
    val uni = base.select(col("t"), explode(col("ts")).as("feat"))
    val big = base.filter(size(col("ts")) >= 2)
      .select(col("t"), explode(transform(sequence(lit(1), size(col("ts")) - 1),
        i => concat(element_at(col("ts"), i), lit(" "),
          element_at(col("ts"), i + 1)))).as("feat"))
    val want = uni.unionByName(big).select(col("t"),
      pmod(call_function("poly_hash", col("feat"), lit(31L), lit(1000000007L)),
        lit(256L)).as("b"))
      .groupBy("t", "b").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = df.select(col("t"),
      explode(TextAnalysis.dsirBuckets(col("t"), 256)).as("b"))
      .groupBy("t", "b").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want)
  }

  test("gopherRules through the kernel matches its oracle semantics on knowns") {
    val df = Seq((1L, "the cat sat on a mat and it is fine ok " +
      ("word " * 45).trim)).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(df).collect()(0)
    assert(r.getAs[Long]("n_words") == 56)
    assert(r.getAs[Long]("n_stopwords") == 5) // the, a, and, it, is
    assert(r.getAs[Boolean]("passes")) // 56 words, short words, all alpha
  }
}
