package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOf, Skew}
import graft.functions.Octo

class AsOfSkewSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin picks the latest right row at or before each left time") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, "k1", ts("2024-01-01 10:00:00")),
      (2L, "k1", ts("2024-01-01 12:00:00")),
      (3L, "k2", ts("2024-01-01 09:00:00"))).toDF("id", "k", "ts")
    val right = Seq(
      ("k1", ts("2024-01-01 09:30:00"), 100.0),
      ("k1", ts("2024-01-01 11:00:00"), 200.0),
      ("k1", ts("2024-01-01 12:00:00"), 300.0), // equal ts matches
      ("k2", ts("2024-01-01 10:00:00"), 999.0)) // after left → no match
      .toDF("k", "ts", "v")
    val out = AsOf.asofJoin(left, right, "k", "ts", Seq("v"))
      .orderBy("id").collect()
    assert(out(0).getDouble(3) == 100.0)
    assert(out(1).getDouble(3) == 300.0)
    assert(out(2).isNullAt(3))
  }

  test("asofJoin carries the latest right row atomically when it holds NULLs") {
    // regression (round-1 ADVICE): per-column last(ignoreNulls) mixed
    // fields across right rows when the latest row had a NULL column
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq((1L, "k", ts("2024-01-01 12:00:00"))).toDF("id", "k", "ts")
    val right = Seq(
      ("k", ts("2024-01-01 10:00:00"), Option(100.0), Option("old")),
      ("k", ts("2024-01-01 11:00:00"), Option.empty[Double], Option("new")))
      .toDF("k", "ts", "v", "tag")
    val out = AsOf.asofJoin(left, right, "k", "ts", Seq("v", "tag")).collect()(0)
    // both payload fields come from the 11:00 row: v is NULL, tag "new"
    assert(out.isNullAt(3))
    assert(out.getString(4) == "new")
  }

  test("saltedJoin equals the plain join under heavy key skew") {
    val big = (1 to 5000).map(i => (if (i % 10 == 0) "cold" + i else "hot", i))
      .toDF("k", "v")
    val small = Seq(("hot", 1.5), ("cold20", 2.5)).toDF("k", "w")
    val plain = big.join(small, Seq("k")).select("k", "v", "w")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(big, small, Seq("k"), factor = 8)
      .select("k", "v", "w").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.size == 4501)
  }

  test("Go layout parse_time translation") {
    assert(Octo.goLayoutToJava("2006-01-02 15:04:05") == "yyyy-MM-dd HH:mm:ss")
    assert(Octo.goLayoutToJava("02 Jan 2006") == "dd MMM yyyy")
    val r = spark.range(1).select(
      Octo.parseTimeGo(lit("2024-03-05 17:30:00"), "2006-01-02 15:04:05").as("t"),
      Octo.parseTimeGo(lit("garbage"), "2006-01-02").as("bad")).collect().head
    assert(r.getTimestamp(0).toString == "2024-03-05 17:30:00.0")
    assert(r.isNullAt(1))
  }
}
