package graft

import org.apache.spark.sql.Column
import graft.operators.{Html, TextAnalysis}

/** Unit coverage for the HTML text extractor and the encoding-quality
  * counters on inputs nastier than the constructed t30/t31 corpora —
  * including the documented regex-extractor limitations, asserted so
  * they are spec'd behavior rather than silent surprises.
  */
class HtmlSpec extends SparkSpec {

  private def run(html: String, c: Column): Any = {
    import spark.implicits._
    Seq(html).toDF("h").select(c.as("r")).collect()(0).get(0)
  }
  private def text(html: String): String =
    run(html, Html.extractText(org.apache.spark.sql.functions.col("h")))
      .asInstanceOf[String]
  private val h = org.apache.spark.sql.functions.col("h")

  test("basic page: head dropped, tags stripped, whitespace collapsed") {
    val page = "<html><head><title>T</title><style>b{}</style></head>" +
      "<body>  <h1>Hello</h1>\n<p>world  now</p></body></html>"
    assert(text(page) == "Hello world now")
  }

  test("title text never leaks into the body extraction") {
    assert(text("<head><title>Secret</title></head><p>visible</p>")
      == "visible")
    assert(run("<head><title> Secret  title </title></head><p>x</p>",
      Html.title(h)) == "Secret title")
    assert(run("<p>no title</p>", Html.title(h)) == null)
  }

  test("<head> does not eat <header>; uppercase SCRIPT dropped") {
    val page = "<header>Top</header><SCRIPT>var x = '<p>fake</p>';" +
      "</SCRIPT><p>body</p>"
    assert(text(page) == "Top body")
  }

  test("script string literals containing tags are dropped with the script") {
    assert(text("<script>document.write(\"<b>bold</b>\")</script>ok")
      == "ok")
  }

  test("comments dropped, multi-line style dropped") {
    assert(text("a<!-- <p>ghost</p>\nstill ghost -->b<style>\np{}\n</style>c")
      == "a b c")
  }

  test("entities decode AFTER tag stripping; &amp; decodes one level") {
    assert(text("<p>Q &amp; A</p>") == "Q & A")
    // literal "<em>" written as entities survives as text
    assert(text("<p>&lt;em&gt;x&lt;/em&gt;</p>") == "<em>x</em>")
    // double-escape decodes exactly one level: &amp;lt; -> &lt;
    assert(text("<p>&amp;lt;</p>") == "&lt;")
    assert(text("<p>&#39;q&#39;&nbsp;&copy;</p>") == "'q' ©")
  }

  test("anchor texts and link density") {
    val page = "<nav><a href=\"/\">Home</a> <a href=\"/a\"><b>Ab</b>out</a>" +
      "</nav><p>12345</p>"
    val texts = run(page, Html.anchorTexts(h))
      .asInstanceOf[scala.collection.Seq[String]]
    assert(texts == Seq("Home", "Ab out"))
    // "Home Ab out 12345" = 17 visible chars, 10 of them anchor text
    assert(run(page, Html.anchorChars(h)) == 10)
    val d = run(page, Html.linkDensity(h)).asInstanceOf[Double]
    assert(math.abs(d - 10.0 / 17.0) < 1e-12)
    assert(run("", Html.linkDensity(h)).asInstanceOf[Double] == 0.0)
  }

  test("documented limitation: '>' inside an attribute value ends the tag") {
    // a regex stripper shares this edge with every regex stripper:
    // the tag ends at the first '>', leaving the attribute tail
    assert(text("<a href=\"x>y\">z</a>") == "y\">z")
  }

  test("documented limitation: nested <a> credits the outer anchor once") {
    val page = "<a>out<a>in</a>side</a>"
    val texts = run(page, Html.anchorTexts(h))
      .asInstanceOf[scala.collection.Seq[String]]
    // non-greedy match stops at the FIRST closer
    assert(texts == Seq("out in"))
  }

  test("encoding counters: replacement, control, mojibake") {
    def cnt(v: String, c: Column): Long =
      run(v, c).asInstanceOf[Long]
    val fffd = "\ufffd"
    assert(cnt(s"ab${fffd}c$fffd",
      TextAnalysis.replacementCharCount(h)) == 2L)
    assert(cnt("clean", TextAnalysis.replacementCharCount(h)) == 0L)
    // BEL and NUL count; TAB/LF/CR (real whitespace) do not
    assert(cnt("a\u0007b\u0000c\td\ne\rf",
      TextAnalysis.controlCharCount(h)) == 2L)
    // "caf\u00e9" and "it\u2019s" after a UTF-8 -> Latin-1/cp1252 mixup
    assert(cnt("caf\u00c3\u00a9 it\u00e2\u20ac\u2122s",
      TextAnalysis.mojibakeCount(h)) == 2L)
    assert(cnt("caf\u00e9 normal", TextAnalysis.mojibakeCount(h)) == 0L)
  }
}
