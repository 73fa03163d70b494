package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.types.UnionJson

/** Union-typed columns over the reference's union.json fixture shape
  * (FIXTURES.md §5): `value` is Float | String | List(Float | String).
  */
class UnionJsonSpec extends SparkSpec {

  private lazy val unionPath = {
    val f = Files.createTempFile("union", ".json")
    Files.writeString(f,
      """{"id": 0, "value": 42}
        |{"id": 1, "value": "42"}
        |{"id": 2, "value": [42, "42"]}
        |""".stripMargin)
    f.toString
  }

  test("union column keeps per-row runtime types") {
    val df = UnionJson.read(spark, unionPath, Seq("value"))
    val types = df.select(col("id"), UnionJson.unionTypeOf(col("value")).as("t"))
      .orderBy("id").collect().map(_.getString(1))
    assert(types(0) == "BIGINT")
    assert(types(1) == "STRING")
    assert(types(2).startsWith("ARRAY"))
  }

  test("JSON output round-trips each alternative (outputs/json/union.in)") {
    val df = UnionJson.read(spark, unionPath, Seq("value"))
    val out = df.select(col("id"), UnionJson.unionToJson(col("value")).as("j"))
      .orderBy("id").collect().map(_.getString(1))
    assert(out.toSeq == Seq("42", "\"42\"", "[42,\"42\"]"))
  }

  test("CAST narrows the union, NULL on mismatch (TypeCast semantics)") {
    val df = UnionJson.read(spark, unionPath, Seq("value"))
    val asLong = df.select(col("id"), UnionJson.castUnion(col("value"), "bigint").as("v"))
      .orderBy("id").collect()
    assert(asLong(0).getLong(1) == 42L)
    // "42" string alternative: lenient cast parses it — narrow via type check instead
    val typed = df.filter(UnionJson.unionTypeOf(col("value")) === "BIGINT")
    assert(typed.count() == 1)
  }

  test("non-union fields keep their inferred types") {
    val df = UnionJson.read(spark, unionPath, Seq("value"))
    assert(df.schema("id").dataType.typeName == "long")
    assert(df.schema("value").dataType.typeName == "variant")
  }

  test("readAllVariant keeps every field variant") {
    val df = UnionJson.readAllVariant(spark, unionPath)
    assert(df.schema.fields.forall(_.dataType.typeName == "variant"))
    assert(df.count() == 3)
  }

  test("distributed sort keys reproduce OValue.compare's cross-type order") {
    import spark.implicits._
    // one value per TypeID class plus within-type ties to break:
    // NULL < Ints (3 < 17) < Floats (2.5 < 9.75) < Booleans
    // (false < true) < Strings ("apple" < "pear")
    val raw = Seq("null", "17", "3", "9.75", "2.5", "true", "false",
      "\"pear\"", "\"apple\"")
    val df = raw.toDF("j").select(parse_json(col("j")).as("v"),
      col("j"))
    val sorted = df.orderBy(UnionJson.typeRank(col("v")),
        UnionJson.numKey(col("v")), UnionJson.strKey(col("v")))
      .select("j").collect().map(_.getString(0)).toSeq
    assert(sorted == Seq("null", "3", "17", "2.5", "9.75", "false",
      "true", "\"apple\"", "\"pear\""), sorted.mkString(","))
    // the driver-side comparator (values.go Compare, used by the CLI
    // live-table render) agrees on every adjacent pair
    val vals: Seq[Any] = Seq(null, 3L, 17L, 2.5, 9.75, false, true,
      "apple", "pear")
    vals.sliding(2).foreach { case Seq(a, b) =>
      assert(graft.octo.OValue.compare(a, b) < 0, s"$a !< $b")
    }
  }

  test("ORDER BY a VARIANT column works via VariantSortRule (distributed SortExec)") {
    import spark.implicits._
    val raw = Seq("\"pear\"", "2.5", "null", "17", "9.75", "true", "3",
      "false", "\"apple\"")
    val df = raw.toDF("j").select(parse_json(col("j")).as("v"), col("j"))
    // without the rule Spark rejects the sort (variant is unorderable);
    // with it the plan is a plain distributed sort over 3 scalar keys
    val asc = df.orderBy(col("v")).select("j").collect().map(_.getString(0))
    assert(asc.toSeq == Seq("null", "3", "17", "2.5", "9.75", "false",
      "true", "\"apple\"", "\"pear\""), asc.mkString(","))
    val desc = df.orderBy(col("v").desc).select("j")
      .collect().map(_.getString(0))
    assert(desc.toSeq == asc.toSeq.reverse, desc.mkString(","))
    // the physical plan sorts — no collect-and-compare fallback exists
    val plan = df.orderBy(col("v")).queryExecution.executedPlan.toString
    assert(plan.contains("Sort"), plan)
    // SQL surface too
    df.createOrReplaceTempView("variant_sort_t")
    val viaSql = spark.sql(
      "SELECT j FROM variant_sort_t ORDER BY v").collect()
      .map(_.getString(0))
    assert(viaSql.toSeq == asc.toSeq)
  }

  test("GROUP BY and DISTINCT on a VARIANT column work via VariantGroupRule") {
    import spark.implicits._
    // Int 5 vs Float 5.0 vs String "5" are DIFFERENT union values
    // (type id first — values.go Compare); each appears twice
    // NOTE: Spark renders the DECIMAL-stored 5.0 variant as json "5" —
    // identical to Int 5's rendering — so groups must be read back as
    // (runtime type, json) pairs; the grouping KEY is rank-qualified
    // for the same reason (see VariantGroupRule scaladoc)
    val raw = Seq("5", "5.0", "\"5\"", "5", "5.0", "\"5\"", "7")
    val df = raw.toDF("j").select(parse_json(col("j")).as("v"))
    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val grouped = keyed(df.groupBy(col("v")).agg(count(lit(1)).as("n"))
      .select(schema_of_variant(col("v")), to_json(col("v")), col("n"))
      .collect())
    assert(grouped == Map(("BIGINT", "5") -> 2L, ("DECIMAL(1,0)", "5") -> 2L,
      ("STRING", "\"5\"") -> 2L, ("BIGINT", "7") -> 1L), grouped.toString)
    // DISTINCT over a variant column
    val distinct = df.distinct()
      .select(schema_of_variant(col("v")), to_json(col("v")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(distinct == Set(("BIGINT", "5"), ("DECIMAL(1,0)", "5"),
      ("STRING", "\"5\""), ("BIGINT", "7")), distinct.toString)
    // grouped variant stays usable downstream (e.g. sort it — both
    // rules compose), and count(v) inside an aggregate is untouched
    val ordered = df.groupBy(col("v"))
      .agg(count(col("v")).as("n"))
      .orderBy(col("v"))
      .select(to_json(col("v"))).collect().map(_.getString(0))
    assert(ordered.toSeq == Seq("5", "7", "5", "\"5\""), // Int < Float < String
      ordered.mkString(","))
    // SQL surface
    df.createOrReplaceTempView("variant_group_t")
    val viaSql = keyed(spark.sql(
      """SELECT schema_of_variant(v), to_json(v), COUNT(*) AS n
        |FROM variant_group_t GROUP BY v""".stripMargin).collect())
    assert(viaSql == grouped)
  }

  test("min/max/count(DISTINCT) over a VARIANT column follow Value.Compare") {
    import spark.implicits._
    val raw = Seq("17", "3", "9.75", "2.5", "\"pear\"", "\"apple\"",
      "3", "null")
    val df = raw.toDF("j").select(parse_json(col("j")).as("v"))
    val r = df.agg(
        min(col("v")).as("mn"), max(col("v")).as("mx"),
        count_distinct(col("v")).as("nd"))
      .select(to_json(col("mn")), to_json(col("mx")), col("nd"))
      .collect().head
    // NULL values are SKIPPED (SQL MIN/MAX/COUNT semantics — without
    // the null-ordering guard the typed NULL would win min as TypeID
    // 0): min = Int 3 (Ints rank below Floats/Strings), max = lexical
    // max string, count distinct = 6 non-null values
    assert(r.getString(0) == "3", r.toString)
    assert(r.getString(1) == "\"pear\"", r.toString)
    assert(r.getLong(2) == 6L, r.toString)
    // grouped form composes with the variant grouping-key rewrite
    val g = df.filter(schema_of_variant(col("v")) =!= "VOID")
      .withColumn("grp",
        when(schema_of_variant(col("v")) === "STRING", "s").otherwise("n"))
      .groupBy("grp").agg(min(col("v")).as("mn"))
      .select(col("grp"), to_json(col("mn")))
      .collect().map(x => (x.getString(0), x.getString(1))).toMap
    // numerics group: Int 3 < Float 2.5 (TypeID first — Ints rank
    // below Floats regardless of magnitude)
    assert(g == Map("n" -> "3", "s" -> "\"apple\""), g.toString)
  }

  test("equality JOIN on VARIANT keys: typed equality, SQL null semantics, hash join plan") {
    import spark.implicits._
    val l = Seq(("a", "5"), ("b", "5.0"), ("c", "\"5\""), ("d", "null"))
      .toDF("lid", "j").select(col("lid"), parse_json(col("j")).as("lv"))
    val r = Seq(("x", "5"), ("y", "5.0"), ("z", "null"))
      .toDF("rid", "j").select(col("rid"), parse_json(col("j")).as("rv"))
    val joined = l.join(r, col("lv") === col("rv"))
    val pairs = joined.select("lid", "rid").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    // Int 5 = Int 5, Float 5.0 = Float 5.0; Int 5 ≠ Float 5.0 ≠ "5";
    // the union NULL value does not `=`-match (Kleene)
    assert(pairs == Set(("a", "x"), ("b", "y")), pairs.toString)
    // the rewritten condition is an EXTRACTABLE equi key → hash join,
    // not a nested loop
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("NestedLoop"), plan)
    // null-safe <=> matches the NULL values too
    val nsPairs = l.join(r, col("lv") <=> col("rv"))
      .select("lid", "rid").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(nsPairs == Set(("a", "x"), ("b", "y"), ("d", "z")),
      nsPairs.toString)
  }

  test("window PARTITION BY / ORDER BY a VARIANT column") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    val df = Seq("5", "5", "5.0", "\"5\"", "\"5\"", "\"5\"")
      .toDF("j").select(parse_json(col("j")).as("v"))
    val counts = df
      .withColumn("n", count(lit(1)).over(W.partitionBy(col("v"))))
      .select(schema_of_variant(col("v")), col("n"))
      .collect().map(x => (x.getString(0), x.getLong(1))).toSet
    assert(counts == Set(("BIGINT", 2L), ("DECIMAL(1,0)", 1L),
      ("STRING", 3L)), counts.toString)
    // window ORDER BY variant: ranks follow the cross-type total order
    val ranks = df.distinct()
      .withColumn("rk", row_number().over(W.orderBy(col("v"))))
      .select(schema_of_variant(col("v")), col("rk"))
      .collect().map(x => (x.getString(0), x.getInt(1))).toSet
    assert(ranks == Set(("BIGINT", 1), ("DECIMAL(1,0)", 2), ("STRING", 3)),
      ranks.toString) // Int < Float < String
  }
}
