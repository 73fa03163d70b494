package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import org.apache.spark.sql.functions.col
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

  test("tar file reads as a table with WebDataset sample keys") {
    import graft.operators.Tar
    val f = new java.io.File(dir, "shard.tar")
    Files.write(f.toPath, Tar.encode(Seq(
      ("000001.txt", "hello".getBytes(UTF_8)),
      ("000001.cls", "en".getBytes(UTF_8)),
      ("000002.seg.json", "{}".getBytes(UTF_8)))))
    val df = PathTable.resolve(spark, f.getAbsolutePath)
    val rows = df.orderBy("member_idx").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[String]("sample_key")).toSeq ==
      Seq("000001", "000001", "000002"))
    // WebDataset extension = everything after the FIRST dot
    assert(rows(2).getAs[String]("ext") == "seg.json")
    assert(rows(0).getAs[String]("text") == "hello")
    assert(rows(0).getAs[Long]("size") == 5L)
    import spark.implicits._
    val grouped = df.groupBy("sample_key")
      .count().orderBy("sample_key").as[(String, Long)].collect().toSeq
    assert(grouped == Seq(("000001", 2L), ("000002", 1L)))
  }

  test("archives are reachable from the SQL dialect surface") {
    val w = new java.io.File(dir, "sql.warc")
    Files.write(w.toPath, Warc.encodeFile(sampleRecords))
    val prep = graft.sql.Dialect.prepare(spark,
      s"SELECT warc_type, http_status FROM ${w.getAbsolutePath} " +
        "WHERE http_status IS NOT NULL")
    val rows = prep.df.collect()
    assert(rows.length == 1 && rows(0).getLong(1) == 200L)
    val t = new java.io.File(dir, "sql.tar")
    Files.write(t.toPath, graft.operators.Tar.encode(Seq(
      ("a.txt", "x".getBytes(UTF_8)))))
    val trows = graft.sql.Dialect.prepare(spark,
      s"SELECT name, size FROM ${t.getAbsolutePath}").df.collect()
    assert(trows.length == 1 && trows(0).getString(0) == "a.txt")
  }

  test("multi-shard glob fans out one input partition per file") {
    val shardDir = Files.createTempDirectory("graft_warc_shards").toFile
    (0 until 64).foreach { k =>
      val recs = sampleRecords.map(Gzip.compress)
      Files.write(new java.io.File(shardDir, f"s$k%03d.warc.gz").toPath,
        recs.reduce(_ ++ _))
    }
    val df = PathTable.resolve(spark,
      s"${shardDir.getAbsolutePath}/s*.warc.gz")
    assert(df.rdd.getNumPartitions == 64,
      s"expected one partition per shard file, got ${df.rdd.getNumPartitions}")
    assert(df.count() == 128)
  }

  test("header-only projection prunes body out of the scan (plan-visible)") {
    val f = new java.io.File(dir, "prune.warc")
    Files.write(f.toPath, Warc.encodeFile(sampleRecords))
    val df = PathTable.resolve(spark, f.getAbsolutePath)
      .select("target_uri", "content_length", "warc_type")
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty, "expected a DSv2 BatchScan for the warc source")
    val readCols = scans.head.scan.readSchema().fieldNames.toSet
    // the pruned schema must exclude every block-derived field — this
    // is what guarantees the reader took Warc.parseFileHeaders (no
    // block copy, no HTTP parse) rather than the full walk
    assert(readCols == Set("target_uri", "content_length", "warc_type"),
      s"scan did not prune to the projection: $readCols")
    // and the header-only values still match the full read
    val full = PathTable.resolve(spark, f.getAbsolutePath)
      .select("target_uri", "content_length", "warc_type")
    assert(df.collect().toSet == full.collect().toSet)
    // content_length (declared, fast path) == block length (full path)
    val declared = df.agg(org.apache.spark.sql.functions.sum("content_length"))
      .collect()(0).getLong(0)
    val walked = PathTable.resolve(spark, f.getAbsolutePath)
      .selectExpr("sum(content_length)", "max(length(body))")
      .collect()(0).getLong(0)
    assert(declared == walked)
  }

  test("tar: multi-shard glob fans out; header-only projection prunes payload") {
    import graft.operators.Tar
    import spark.implicits._
    val shardDir = Files.createTempDirectory("graft_tar_shards").toFile
    (0 until 16).foreach { k =>
      Files.write(new java.io.File(shardDir, f"t$k%03d.tar").toPath,
        Tar.encode(Seq(
          (f"$k%06d.txt", ("payload " * 10).getBytes(UTF_8)),
          (f"$k%06d.cls", "en".getBytes(UTF_8)))))
    }
    val df = PathTable.resolve(spark, s"${shardDir.getAbsolutePath}/t*.tar")
    assert(df.rdd.getNumPartitions == 16)
    assert(df.count() == 32)
    // header-only projection: pruned scan schema excludes data/text
    val meta = df.select("sample_key", "ext", "size", "data_offset")
    val scans = meta.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSet ==
      Set("sample_key", "ext", "size", "data_offset"))
    // header-declared sizes match the full walk's payload lengths
    val bySize = meta.filter(col("ext") === "txt").select("size")
      .as[Long].collect().toSeq
    assert(bySize == Seq.fill(16)(80L))
    val fullText = df.filter(col("ext") === "cls").select("text")
      .as[String].collect().toSet
    assert(fullText == Set("en"))
  }

  test("gzip member with a bad CRC trailer fails loudly (ADVICE r8)") {
    // inflates fine (deflate stream untouched) but the CRC32 trailer
    // lies about the payload — the source must reject, not silently
    // admit a corrupt record into the corpus
    val member = Gzip.compress(Warc.encodeFile(sampleRecords.take(1)))
    member(member.length - 8) = (member(member.length - 8) ^ 0xFF).toByte
    val f = new java.io.File(dir, "badcrc.warc.gz")
    Files.write(f.toPath, member)
    val e = intercept[org.apache.spark.SparkException] {
      PathTable.resolve(spark, f.getAbsolutePath).count()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n")
    assert(msgs.contains("trailer verification") &&
      msgs.contains("badcrc.warc.gz"))
  }

  test("filter pushdown reaches the scan and skips pre-decode (plan-visible)") {
    import graft.sources.v2.WarcScan
    import org.apache.spark.sql.sources.{EqualTo, IsNotNull}
    val f = new java.io.File(dir, "pushdown.warc")
    Files.write(f.toPath, Warc.encodeFile(sampleRecords))
    def scanOf(df: org.apache.spark.sql.DataFrame): WarcScan =
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan
      }.collectFirst { case w: WarcScan => w }
        .getOrElse(fail("expected a WarcScan in the physical plan"))
    // header-stage predicate: pushed, and the surviving row is right
    val byType = PathTable.resolve(spark, f.getAbsolutePath)
      .filter(col("warc_type") === "response").select("warc_type", "body")
    assert(scanOf(byType).pushed.toSeq
      .contains(EqualTo("warc_type", "response")),
      s"warc_type filter not pushed: ${scanOf(byType).pushed.toSeq}")
    val rows = byType.collect()
    assert(rows.length == 1 && rows(0).getString(1) == "<html>hi</html>")
    // http-stage predicate: pushed; null http_status (warcinfo) excluded
    val byStatus = PathTable.resolve(spark, f.getAbsolutePath)
      .filter(col("http_status") === 200).select("record_idx", "body")
    val pushedStatus = scanOf(byStatus).pushed.toSeq
    assert(pushedStatus.contains(EqualTo("http_status", 200L)) ||
      pushedStatus.exists(_.references.contains("http_status")),
      s"http_status filter not pushed: $pushedStatus")
    assert(byStatus.collect().map(_.getLong(0)).toSeq == Seq(1L))
    // IS NOT NULL pushes; a non-translatable predicate stays residual
    // and the query is still correct (pushdown is advisory)
    val mixed = PathTable.resolve(spark, f.getAbsolutePath)
      .filter(col("http_status").isNotNull &&
        org.apache.spark.sql.functions.length(col("body")) > 2)
    assert(scanOf(mixed).pushed.toSeq.contains(IsNotNull("http_status")))
    assert(mixed.count() == 1)
    // filter that excludes everything: zero rows, no crash
    assert(PathTable.resolve(spark, f.getAbsolutePath)
      .filter(col("warc_type") === "nope").count() == 0)
    // record_idx stays the per-file ordinal even when earlier records
    // are skipped by the pushed filter
    val idx = PathTable.resolve(spark, f.getAbsolutePath)
      .filter(col("warc_type") === "response").select("record_idx")
      .collect().map(_.getLong(0)).toSeq
    assert(idx == Seq(1L))
  }

  test("pushed-filter evaluation is conservative (unit)") {
    import graft.sources.v2.WarcFilters
    import org.apache.spark.sql.sources._
    def get(v: Any): String => Any = _ => v
    // null operand at a top-level conjunct = SQL unknown = excluded
    assert(!WarcFilters.eval(EqualTo("http_status", 200L), get(null)))
    assert(!WarcFilters.eval(GreaterThan("http_status", 100L), get(null)))
    assert(!WarcFilters.eval(In("warc_type", Array("a", "b")), get(null)))
    // defensive type mismatch KEEPS the row (residual decides)
    assert(WarcFilters.eval(EqualTo("warc_type", java.lang.Boolean.TRUE),
      get("response")))
    assert(WarcFilters.eval(StringStartsWith("target_uri", "http"),
      get(7L)))
    // normal cases
    assert(WarcFilters.eval(EqualTo("http_status", 200), get(200L)))
    assert(!WarcFilters.eval(LessThan("content_length", 10L), get(11L)))
    assert(WarcFilters.eval(StringContains("target_uri", "/p"),
      get("http://h/p")))
    assert(WarcFilters.eval(IsNull("http_status"), get(null)))
  }

  test("tar: filter pushdown gates the payload slice (plan-visible)") {
    import graft.operators.Tar
    import graft.sources.v2.TarScan
    import org.apache.spark.sql.sources.{EqualTo, GreaterThan}
    import spark.implicits._
    val f = new java.io.File(dir, "pushdown.tar")
    Files.write(f.toPath, Tar.encode(Seq(
      ("000001.txt", "hello world".getBytes(UTF_8)),
      ("000001.cls", "en".getBytes(UTF_8)),
      ("000002.txt", "goodbye".getBytes(UTF_8)))))
    def scanOf(df: org.apache.spark.sql.DataFrame): TarScan =
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan
      }.collectFirst { case t: TarScan => t }
        .getOrElse(fail("expected a TarScan in the physical plan"))
    val txt = PathTable.resolve(spark, f.getAbsolutePath)
      .filter(col("ext") === "txt").select("sample_key", "text")
    assert(scanOf(txt).pushed.toSeq.contains(EqualTo("ext", "txt")),
      s"ext filter not pushed: ${scanOf(txt).pushed.toSeq}")
    assert(txt.as[(String, String)].collect().toSet ==
      Set(("000001", "hello world"), ("000002", "goodbye")))
    // numeric meta predicate pushes too; member_idx stays the file
    // ordinal when earlier members are skipped
    val big = PathTable.resolve(spark, f.getAbsolutePath)
      .filter(col("size") > 7).select("member_idx", "name")
    assert(scanOf(big).pushed.toSeq.contains(GreaterThan("size", 7L)))
    assert(big.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((0L, "000001.txt")))
    // filter excluding everything: zero rows, no crash
    assert(PathTable.resolve(spark, f.getAbsolutePath)
      .filter(col("ext") === "nope").count() == 0)
  }

  test("connectors report file-size statistics; a small archive broadcasts") {
    val f = new java.io.File(dir, "stats.warc")
    Files.write(f.toPath, Warc.encodeFile(sampleRecords))
    val df = PathTable.resolve(spark, f.getAbsolutePath)
    // the scan surfaces its shard bytes to the optimizer (without this
    // Catalyst assumes defaultSizeInBytes and never broadcasts)
    assert(df.queryExecution.optimizedPlan.stats.sizeInBytes ==
      BigInt(f.length()),
      s"stats ${df.queryExecution.optimizedPlan.stats.sizeInBytes} != " +
        s"file ${f.length()}")
    val t = new java.io.File(dir, "stats.tar")
    Files.write(t.toPath, graft.operators.Tar.encode(Seq(
      ("a.txt", "x".getBytes(UTF_8)))))
    val tdf = PathTable.resolve(spark, t.getAbsolutePath)
    assert(tdf.queryExecution.optimizedPlan.stats.sizeInBytes ==
      BigInt(t.length()))
    // a small archive under the broadcast threshold becomes the build
    // side of a BroadcastHashJoin (AQE off so the decision is the
    // logical-stats one being tested)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val big = spark.range(10000)
        .selectExpr("cast(id % 3 + 199 as long) as http_status")
      val joined = big.join(df.select("http_status", "target_uri"),
        Seq("http_status"))
      val bhj = joined.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }
      assert(bhj.nonEmpty, joined.queryExecution.executedPlan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("tar glob with no matches names the tar source in the error") {
    val e = intercept[Exception] {
      PathTable.resolve(spark, "/tmp/graft_no_such_dir/none*.tar").count()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n")
    assert(msgs.contains("graft-tar"), s"expected graft-tar in: $msgs")
  }

  test("pushdown property: random filters over a random archive equal " +
      "the unfiltered read filtered in SQL") {
    // one archive of randomized records: mixed types, some without an
    // HTTP block, varied status codes and URI shapes
    val rng = new scala.util.Random(20260816L)
    val recs = (0 until 60).map { i =>
      if (rng.nextInt(4) == 0)
        Warc.encodeRecord(Seq(
          "WARC-Type" -> "metadata", "WARC-Record-ID" -> s"<urn:uuid:m$i>",
          "WARC-Date" -> f"2026-01-${i % 28 + 1}%02dT00:00:00Z",
          "Content-Type" -> "application/warc-fields"),
          s"note: $i\r\n".getBytes(UTF_8))
      else
        Warc.encodeRecord(Seq(
          "WARC-Type" -> "response", "WARC-Record-ID" -> s"<urn:uuid:r$i>",
          "WARC-Date" -> f"2026-01-${i % 28 + 1}%02dT00:00:00Z",
          "WARC-Target-URI" -> s"http://h${i % 5}/p$i",
          "Content-Type" -> "application/http;msgtype=response"),
          (s"HTTP/1.1 ${Seq(200, 301, 404, 500)(i % 4)} X\r\n" +
            s"Content-Type: text/${Seq("html", "plain")(i % 2)}\r\n\r\n" +
            ("b" * (i % 37))).getBytes(UTF_8))
    }
    val f = new java.io.File(dir, "prop.warc")
    Files.write(f.toPath, Warc.encodeFile(recs))
    // SQL predicates spanning every pushable shape; each runs through
    // the pushdown route and must equal the in-memory filter of the
    // full unfiltered read
    val full = PathTable.resolve(spark, f.getAbsolutePath).collect().toSeq
    val fullDf = spark.createDataFrame(
      spark.sparkContext.parallelize(full),
      graft.sources.v2.WarcSourceTable.schema)
    val preds = Seq(
      "warc_type = 'response'", "warc_type != 'response'",
      "http_status = 200", "http_status > 300", "http_status <= 301",
      "http_status IS NULL", "http_status IS NOT NULL",
      "content_length > 20", "content_length < 5",
      "target_uri LIKE 'http://h1%'", "target_uri LIKE '%p7%'",
      "warc_type IN ('metadata', 'warcinfo')",
      "http_status IN (200, 404)", "record_idx > 30",
      "http_status = 200 AND content_length > 10",
      "warc_date >= '2026-01-15'",
      "http_content_type = 'text/html' AND http_status < 400")
    preds.foreach { p =>
      val pushed = PathTable.resolve(spark, f.getAbsolutePath)
        .filter(p).collect().toSeq
      val expected = fullDf.filter(p).collect().toSeq
      assert(pushed.map(_.toString).sorted == expected.map(_.toString).sorted,
        s"predicate [$p]: pushdown ${pushed.length} rows vs " +
          s"reference ${expected.length}")
    }
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
