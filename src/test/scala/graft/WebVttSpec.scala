package graft

import org.apache.spark.sql.functions.col
import graft.operators.{Subtitles, Web}

/** robots.txt group/decision semantics (RFC 9309) and the WebVTT cue
  * model on inputs beyond the constructed p56/m23 corpora.
  */
class WebVttSpec extends SparkSpec {

  // ---- robots.txt ----

  test("parseRobots: multi-agent groups, reset after rules, comments") {
    val txt =
      """# top comment
        |User-agent: a
        |User-agent: b
        |Disallow: /x  # trailing comment
        |Allow: /x/y
        |
        |User-agent: c
        |Crawl-delay: 5
        |Disallow: /z
        |Sitemap: https://h/sitemap.xml
        |User-agent: d
        |Disallow: /w
        |""".stripMargin
    val rules = Web.parseRobots(txt)
    // a and b share the first group's two rules
    assert(rules.count(_._1 == "a") == 2 && rules.count(_._1 == "b") == 2)
    assert(rules.contains(("a", false, "/x")) &&
      rules.contains(("b", true, "/x/y")))
    // crawl-delay keeps c's group open for the following Disallow
    assert(rules.filter(_._1 == "c") == Vector(("c", false, "/z")))
    // a user-agent AFTER rules starts a fresh group: d does not
    // inherit /z, c does not get /w
    assert(rules.filter(_._1 == "d") == Vector(("d", false, "/w")))
  }

  test("parseRobots: empty Disallow yields no rule; sitemap ignored") {
    val rules = Web.parseRobots(
      "User-agent: *\nDisallow:\nSitemap: https://h/s.xml\n")
    assert(rules.isEmpty)
  }

  test("robotsAllowed: longest match, tie to Allow, group replacement") {
    val rules = Vector(
      ("*", false, "/p"), ("*", true, "/p/ok"),
      ("bot", true, "/p"))
    // * group: /p/ok wins by length over /p
    assert(Web.robotsAllowed(rules, "other", "/p/ok/1"))
    assert(!Web.robotsAllowed(rules, "other", "/p/x"))
    // bot's own group REPLACES *: /p allowed, and /p/ok rule is gone
    assert(Web.robotsAllowed(rules, "bot", "/p/x"))
    // no matching rule -> allowed
    assert(Web.robotsAllowed(rules, "other", "/q"))
    // equal-length tie -> Allow wins
    val tie = Vector(("*", false, "/a/"), ("*", true, "/a/"))
    assert(Web.robotsAllowed(tie, "x", "/a/1"))
    // case-insensitive agent match
    assert(Web.robotsAllowed(rules, "BOT", "/p/x"))
  }

  // ---- WebVTT ----

  private def cues(vtt: String): Array[org.apache.spark.sql.Row] = {
    import spark.implicits._
    Seq(vtt).toDF("v")
      .select(Subtitles.parseCues(col("v")).as("c"))
      .selectExpr("explode(c) AS c").select("c.*")
      .collect()
  }

  test("vtt: ids, settings, multi-line payloads, hour arithmetic") {
    val vtt = "WEBVTT\n\n" +
      "intro\n01:02:03.004 --> 01:02:04.500 align:start\nhello\nworld\n\n" +
      "00:00:01.000 --> 00:00:02.250\nplain"
    val c = cues(vtt)
    assert(c.length == 2)
    assert(c(0).getAs[Long]("start_ms") == 3723004L)
    assert(c(0).getAs[Long]("end_ms") == 3724500L, "settings dropped")
    assert(c(0).getAs[String]("text") == "hello\nworld")
    assert(c(0).getAs[Boolean]("has_id"))
    assert(c(1).getAs[Long]("start_ms") == 1000L)
    assert(!c(1).getAs[Boolean]("has_id"))
  }

  test("vtt: malformed cue yields null timestamps, not a drop") {
    val c = cues("WEBVTT\n\nnot a cue at all\njust text")
    assert(c.length == 1)
    assert(c(0).isNullAt(c(0).fieldIndex("start_ms")))
  }

  test("vtt: 3-digit hours parse") {
    val c = cues("WEBVTT\n\n100:00:00.001 --> 100:00:00.002\nx")
    assert(c(0).getAs[Long]("start_ms") == 360000000L + 1L)
  }

  test("vtt: timestamp format keeps 3-digit hours (no lpad truncation)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val ms = 100L * 3600000L + 62005L // 100:01:02.005
    val row = Seq(1).toDF("x")
      .select(Subtitles.vttTimestamp(lit(ms)).as("ts"))
      .select(col("ts"), Subtitles.vttMs(col("ts")).as("back"))
      .collect()(0)
    assert(row.getString(0) == "100:01:02.005")
    assert(row.getLong(1) == ms)
  }
}
