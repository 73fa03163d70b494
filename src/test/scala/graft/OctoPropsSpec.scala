package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.functions.Octo
import graft.operators.{Dedup, TextAnalysis}

/** Property tests: batch-generate random inputs with ScalaCheck, run
  * the engine expressions over them in ONE Spark job, and compare each
  * row against an independent driver-side Scala model.
  */
class OctoPropsSpec extends SparkSpec {
  import spark.implicits._

  private val asciiText: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(Gen.alphaNumChar, Gen.const(' '))).map(_.mkString))

  private def samples[A](g: Gen[A], n: Int = 300): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))

  test("substr0 matches a reference model on random inputs") {
    val cases = samples(for {
      s <- asciiText; st <- Gen.chooseNum(-2, 45); ln <- Gen.chooseNum(0, 45)
    } yield (s, st, ln))
    val got = cases.toDF("s", "st", "ln")
      .select(Octo.substr0(col("s"), col("st"), col("ln"))).as[String].collect()
    cases.zip(got).foreach { case ((s, st, ln), g) =>
      // model: 0-based, start clamped to [0, len], window length ≥ 0
      val expected = s.drop(math.max(st, 0)).take(math.max(ln, 0))
      assert(Option(g).getOrElse("") == expected, s"substr0($s, $st, $ln)")
    }
  }

  test("intDiv truncates toward zero like Go/JVM integer division") {
    val cases = samples(for {
      a <- Gen.chooseNum(-100000L, 100000L)
      b <- Gen.chooseNum(-1000L, 1000L) if b != 0
    } yield (a, b))
    val got = cases.toDF("a", "b")
      .select(Octo.intDiv(col("a"), col("b"))).as[Long].collect()
    cases.zip(got).foreach { case ((a, b), g) =>
      assert(g == a / b, s"intDiv($a, $b)")
    }
  }

  test("fingerprint equals the driver-side rolling-hash model") {
    val cases = samples(asciiText).distinct
    val got = cases.toDF("t")
      .select(TextAnalysis.fingerprint(col("t"))).as[Long].collect()
    cases.zip(got).foreach { case (s, g) =>
      val expected =
        if (s.isEmpty) 0L
        else s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
      assert(g == expected, s"fingerprint(${s.take(20)}...)")
    }
  }

  test("tokenShingles size and content match the model") {
    val word = Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString)
    val cases = samples(Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" "))))
    val got = cases.toDF("t")
      .select(Dedup.tokenShingles(col("t"), 2)).as[Seq[String]].collect()
    cases.zip(got).foreach { case (s, g) =>
      val toks = s.trim.split("\\s+").toSeq
      val expected =
        if (toks.length < 2) Seq(toks.mkString(" "))
        else toks.sliding(2).map(_.mkString(" ")).toSeq.distinct
      assert(g == expected, s"shingles($s)")
    }
  }

  test("goFloat/goFloatPlain round-trip and are shortest on random doubles") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => SCTest}
    val doubles = Gen.oneOf(
      Gen.choose(-1e6, 1e6),
      Gen.choose(-1.0, 1.0),
      Gen.choose(Double.MinValue / 2, Double.MaxValue / 2),
      Gen.chooseNum(Long.MinValue, Long.MaxValue).map(l =>
        java.lang.Double.longBitsToDouble(l)).suchThat(d => !d.isNaN && !d.isInfinite))
    val prop = forAll(doubles) { d =>
      val g = graft.octo.GoFmt.goFloat(d)
      val p = graft.octo.GoFmt.goFloatPlain(d)
      // Go-style forms parse back to the same double (shortest-unique);
      // significant digits never exceed the 17 needed for uniqueness
      val sig = g.takeWhile(_ != 'e').dropWhile(c => c == '-' || c == '0' || c == '.')
        .count(_.isDigit)
      g.toDouble == d && p.toDouble == d && sig <= 17
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("wsTokens counts whitespace tokens") {
    val cases = samples(asciiText).filter(_.trim.nonEmpty)
    val got = cases.toDF("t")
      .select(TextAnalysis.wsTokens(col("t"))).as[Long].collect()
    cases.zip(got).foreach { case (s, g) =>
      assert(g == s.trim.split("\\s+").length.toLong, s"wsTokens($s)")
    }
  }

  test("chunkDedup matches a first-occurrence model on random corpora") {
    val word: Gen[String] = Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val text: Gen[String] = Gen.chooseNum(1, 20).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    // small alphabet + short words → plenty of cross-doc chunk collisions
    val docs = samples(text, 120).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val got = graft.operators.Dedup
      .chunkDedup(docs.toDF("doc_id", "text"), chunkTokens = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // model: chunks of 4 tokens per doc, global first (doc, pos) wins
    val all = docs.flatMap { case (id, t) =>
      t.trim.split("\\s+").grouped(4).zipWithIndex
        .map { case (cs, p) => (id, p.toLong, cs.mkString(" ")) }
    }
    val expected = all.groupBy(_._3).values
      .map(_.minBy(r => (r._1, r._2))).toSet
    assert(got == expected && got.size < all.size)
  }

  test("charEntropy matches a code-point histogram model on random unicode") {
    // mixed ASCII / Latin-1 / CJK / astral code points
    val uniChar: Gen[String] = Gen.frequency(
      6 -> Gen.alphaNumChar.map(_.toString),
      2 -> Gen.chooseNum(0xA0, 0x2FF).map(cp => new String(Character.toChars(cp))),
      2 -> Gen.chooseNum(0x4E00, 0x9FFF).map(cp => new String(Character.toChars(cp))),
      1 -> Gen.chooseNum(0x1F300, 0x1F5FF).map(cp => new String(Character.toChars(cp))))
    val uniText: Gen[String] =
      Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, uniChar).map(_.mkString))
    val cases = samples(uniText)
    val got = cases.toDF("s")
      .select(TextAnalysis.charEntropy(col("s"))).as[Double].collect()
    cases.zip(got).foreach { case (s, g) =>
      val cps = s.codePoints().toArray
      val expected =
        if (cps.isEmpty) 0.0
        else {
          val n = cps.length.toDouble
          cps.groupBy(identity).values
            .map(k => -(k.length / n) * (math.log(k.length / n) / math.log(2.0)))
            .sum
        }
      assert(math.abs(g - expected) < 1e-9, s"charEntropy(${s.take(20)}...)")
    }
  }

  test("TopKPerKey matches a driver-side model on random data, k, direction") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 4) {
      val k = 1 + rnd.nextInt(4)
      val asc = rnd.nextBoolean()
      val nKeys = 1 + rnd.nextInt(6)
      // duplicate scores on purpose: tie-break correctness is the
      // dangerous path in a bounded heap
      val rows = (0 until 400).map { i =>
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(8).toDouble, i.toLong)
      }
      val df = rows.toDF("key", "score", "uid")
      val got = graft.plans.TopKPerKey(df, Seq("key"),
          Seq(("score", asc), ("uid", true)), k)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
        .toSet
      val expected = rows.groupBy(_._1).flatMap { case (_, g) =>
        val sorted =
          if (asc) g.sortBy(t => (t._2, t._3))
          else g.sortBy(t => (-t._2, t._3))
        sorted.take(k)
      }.toSet
      assert(got == expected, s"trial=$trial k=$k asc=$asc")
    }
  }
}
