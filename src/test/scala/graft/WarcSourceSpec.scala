package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import graft.operators.{Gzip, Warc}
import graft.sources.PathTable

/** `.warc` / `.warc.gz` as path tables: record rows, HTTP split by the
  * record's own Content-Type, per-record gzip members, loud failure on
  * corruption.
  */
class WarcSourceSpec extends SparkSpec {

  private lazy val dir = Files.createTempDirectory("graft_warc").toFile

  private def sampleRecords: Seq[Array[Byte]] = Seq(
    Warc.encodeRecord(Seq(
      "WARC-Type" -> "warcinfo", "WARC-Record-ID" -> "<urn:uuid:1>",
      "WARC-Date" -> "2026-01-01T00:00:00Z",
      "Content-Type" -> "application/warc-fields"),
      "software: graft/1.0\r\n".getBytes(UTF_8)),
    Warc.encodeRecord(Seq(
      "WARC-Type" -> "response", "WARC-Record-ID" -> "<urn:uuid:2>",
      "WARC-Date" -> "2026-01-01T00:00:00Z",
      "WARC-Target-URI" -> "http://h/p",
      "Content-Type" -> "application/http;msgtype=response"),
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
        "<html>hi</html>").getBytes(UTF_8)))

  test("warc file reads as a table with the HTTP split") {
    val f = new java.io.File(dir, "sample.warc")
    Files.write(f.toPath, Warc.encodeFile(sampleRecords))
    val df = PathTable.resolve(spark, f.getAbsolutePath)
    val rows = df.orderBy("record_idx").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("warc_type") == "warcinfo")
    assert(rows(0).getAs[Any]("http_status") == null)
    assert(rows(0).getAs[String]("body") == "software: graft/1.0\r\n")
    assert(rows(1).getAs[String]("warc_type") == "response")
    assert(rows(1).getAs[Long]("http_status") == 200L)
    assert(rows(1).getAs[String]("http_content_type") == "text/html")
    assert(rows(1).getAs[String]("target_uri") == "http://h/p")
    assert(rows(1).getAs[String]("body") == "<html>hi</html>")
  }

  test("warc.gz with per-record members reads identically") {
    val f = new java.io.File(dir, "sample.warc.gz")
    Files.write(f.toPath,
      sampleRecords.map(Gzip.compress).reduce(_ ++ _))
    val df = PathTable.resolve(spark, f.getAbsolutePath)
    assert(df.count() == 2)
    assert(df.filter("warc_type = 'response'").select("body")
      .collect()(0).getString(0) == "<html>hi</html>")
  }

  test("corrupt archives fail loudly with the file path") {
    val f = new java.io.File(dir, "bad.warc")
    Files.write(f.toPath, "WARC/1.0\r\nbroken".getBytes(UTF_8))
    val e = intercept[org.apache.spark.SparkException] {
      PathTable.resolve(spark, f.getAbsolutePath).count()
    }
    assert(e.getMessage.contains("bad.warc") ||
      Option(e.getCause).exists(_.getMessage.contains("bad.warc")))
  }
}
