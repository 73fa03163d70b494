package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

/** WARC (ISO 28500) record framing — the container format of web-scale
  * crawl corpora (Common Crawl ships ~100 TB/month of these). The
  * reference engine has no crawl-container support at all (its sources
  * are CSV/JSON/parquet/lines — octosql.go:61-96); for a 100-TB
  * training-data pipeline WARC ingest is the very first operator that
  * runs, so it's part of the beyond-reference pipeline mandate.
  *
  * Format (public spec, ISO 28500 / WARC 1.1): a WARC file is a
  * concatenation of records, each
  *
  * {{{
  *   WARC/1.0<CRLF>
  *   <header-name>: <value><CRLF> ...
  *   <CRLF>
  *   <Content-Length octets of block>
  *   <CRLF><CRLF>
  * }}}
  *
  * The block of a `response` record is itself an HTTP/1.1 response
  * (status line, headers, CRLFCRLF, body). Framing is LENGTH-based:
  * a body containing the literal text `WARC/1.0` must not confuse the
  * walk — the parser never scans for magic inside a block.
  *
  * Scale shape: records parse independently per payload — a
  * `mapPartitions` over binary rows with zero state and zero shuffle;
  * at cluster scale each executor walks its own WARC members. All
  * integer/byte arithmetic — deterministic, oracle-replayable.
  */
object Warc {

  /** One parsed WARC record: version line, headers in file order
    * (names case-preserved), and the raw block bytes.
    */
  final case class Record(version: String, headers: Vector[(String, String)],
                          block: Array[Byte]) {
    /** Case-insensitive header lookup (the spec makes names
      * case-insensitive — WARC 1.1 §4).
      */
    def header(name: String): Option[String] =
      headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase(name) => v
      }
  }

  /** A parsed HTTP/1.1 message block from a request/response record. */
  final case class Http(startLine: String, status: Option[Int],
                        headers: Vector[(String, String)],
                        body: Array[Byte]) {
    def header(name: String): Option[String] =
      headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase(name) => v
      }
  }

  private val Crlf = "\r\n".getBytes(UTF_8)

  /** Encode one record. `Content-Length` is computed from `block` and
    * appended after the caller's headers (last-wins on read would be
    * wrong, so callers must not pass their own Content-Length).
    */
  def encodeRecord(headers: Seq[(String, String)],
                   block: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    headers.foreach { case (k, v) => sb.append(k).append(": ")
      .append(v).append("\r\n") }
    sb.append("Content-Length: ").append(block.length).append("\r\n\r\n")
    val head = sb.toString.getBytes(UTF_8)
    val out = new Array[Byte](head.length + block.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(block, 0, out, head.length, block.length)
    System.arraycopy(Crlf, 0, out, head.length + block.length, 2)
    System.arraycopy(Crlf, 0, out, head.length + block.length + 2, 2)
    out
  }

  /** Concatenate records into one WARC member. */
  def encodeFile(records: Seq[Array[Byte]]): Array[Byte] = {
    val out = new Array[Byte](records.map(_.length).sum)
    var off = 0
    records.foreach { r =>
      System.arraycopy(r, 0, out, off, r.length); off += r.length
    }
    out
  }

  /** Walk every record in `bytes`. Returns None on any framing
    * violation (bad magic, missing blank line, truncated block,
    * missing record terminator, unparsable Content-Length) — a corrupt
    * member is rejected whole rather than half-read, the behavior a
    * crawl-ingest job wants (skip + count the member, keep the batch).
    */
  def parseFile(bytes: Array[Byte]): Option[Vector[Record]] = {
    val out = Vector.newBuilder[Record]
    var pos = 0
    while (pos < bytes.length) {
      parseRecord(bytes, pos) match {
        case Some((rec, next)) => out += rec; pos = next
        case None => return None
      }
    }
    Some(out.result())
  }

  /** Header-only walk: same framing validation as [[parseFile]] (the
    * Content-Length arithmetic still steps over every block and checks
    * the record terminator), but block bytes are never COPIED — each
    * record carries an empty block plus its declared length. This is
    * the projection-pruning fast path for header-only reads of large
    * archives: no per-record allocation proportional to body size, no
    * UTF-8 decode.
    */
  def parseFileHeaders(bytes: Array[Byte])
      : Option[Vector[(Record, Long)]] = {
    val out = Vector.newBuilder[(Record, Long)]
    var pos = 0
    while (pos < bytes.length) {
      parseRecordAt(bytes, pos, copyBlock = false) match {
        case Some((rec, len, next)) => out += ((rec, len)); pos = next
        case None => return None
      }
    }
    Some(out.result())
  }

  /** Parse one record at `from`; returns (record, offset past its
    * trailing CRLFCRLF).
    */
  private def parseRecord(bytes: Array[Byte],
                          from: Int): Option[(Record, Int)] =
    parseRecordAt(bytes, from, copyBlock = true)
      .map { case (rec, _, next) => (rec, next) }

  /** Shared framing walk; `copyBlock = false` skips the block copy
    * (record.block is empty; the declared length is returned).
    */
  private def parseRecordAt(bytes: Array[Byte], from: Int,
                            copyBlock: Boolean)
      : Option[(Record, Long, Int)] = {
    val headEnd = indexOfCrlfCrlf(bytes, from)
    if (headEnd < 0) return None
    val head = new String(bytes, from, headEnd - from, UTF_8)
    val lines = head.split("\r\n", -1)
    if (lines.isEmpty || !lines(0).startsWith("WARC/")) return None
    val hdrs = Vector.newBuilder[(String, String)]
    var i = 1
    while (i < lines.length) {
      val line = lines(i)
      val c = line.indexOf(':')
      if (c <= 0) return None
      hdrs += ((line.substring(0, c).trim, line.substring(c + 1).trim))
      i += 1
    }
    val rec0 = Record(lines(0), hdrs.result(), Array.emptyByteArray)
    // Long arithmetic: a corrupt Content-Length near Int.MaxValue must
    // not wrap the bounds check negative and index out of range
    val lenL = rec0.header("Content-Length")
      .flatMap(v => scala.util.Try(v.toLong).toOption)
      .getOrElse(return None)
    val blockStart = headEnd + 4
    // ADVICE r8: reject absurd lengths BEFORE any addition — a crafted
    // Content-Length near Long.MaxValue would overflow
    // blockStart + lenL + 4 to negative and bypass the bounds check
    if (lenL < 0 || lenL > bytes.length ||
        blockStart.toLong + lenL + 4 > bytes.length)
      return None
    val len = lenL.toInt
    val blockEnd = blockStart + len
    // record terminator: exactly CRLFCRLF after the block
    if (bytes(blockEnd) != '\r' || bytes(blockEnd + 1) != '\n' ||
        bytes(blockEnd + 2) != '\r' || bytes(blockEnd + 3) != '\n')
      return None
    val rec =
      if (copyBlock)
        rec0.copy(block = java.util.Arrays.copyOfRange(
          bytes, blockStart, blockEnd))
      else rec0
    Some((rec, lenL, blockEnd + 4))
  }

  /** Parse an HTTP/1.1 message block (request or response). The body is
    * everything after the first CRLFCRLF — HTTP inside WARC is stored
    * unchunked (the crawler dechunks before writing), so no
    * Transfer-Encoding handling is needed or attempted.
    */
  def parseHttp(block: Array[Byte]): Option[Http] = {
    val headEnd = indexOfCrlfCrlf(block, 0)
    if (headEnd < 0) return None
    val head = new String(block, 0, headEnd, UTF_8)
    val lines = head.split("\r\n", -1)
    if (lines.isEmpty) return None
    val start = lines(0)
    val status =
      if (start.startsWith("HTTP/")) {
        val parts = start.split(" ", 3)
        if (parts.length < 2) return None
        scala.util.Try(parts(1).toInt).toOption match {
          case Some(s) => Some(s)
          case None => return None
        }
      } else None
    val hdrs = Vector.newBuilder[(String, String)]
    var i = 1
    while (i < lines.length) {
      val c = lines(i).indexOf(':')
      if (c <= 0) return None
      hdrs += ((lines(i).substring(0, c).trim, lines(i).substring(c + 1).trim))
      i += 1
    }
    val body =
      java.util.Arrays.copyOfRange(block, headEnd + 4, block.length)
    Some(Http(start, status, hdrs.result(), body))
  }

  /** Deterministic test-corpus record builders shared by the m22 /
    * m25 / m27 queries and their oracles — ONE definition so the
    * construction can never diverge between the three (each oracle
    * re-encodes these exact strings in SQL).
    */
  object Fixture {
    val Date = "2026-01-01T00:00:00Z"

    def recordId(j: Long): String =
      f"<urn:uuid:00000000-0000-0000-0000-$j%012d>"

    def statusLine(id: Long): String = (id % 3) match {
      case 0 => "200 OK"
      case 1 => "301 Moved Permanently"
      case _ => "404 Not Found"
    }

    def uri(id: Long): String = s"http://example.com/doc/$id"

    /** warcinfo record with the fixed fields block; record-id j. */
    def warcinfoRecord(j: Long): Array[Byte] =
      encodeRecord(Seq(
        "WARC-Type" -> "warcinfo", "WARC-Record-ID" -> recordId(j),
        "WARC-Date" -> Date,
        "Content-Type" -> "application/warc-fields"),
        ("software: graft/1.0\r\n"
          + "format: WARC File Format 1.1\r\n").getBytes(UTF_8))

    /** request record for doc `id`; record-id j. */
    def requestRecord(id: Long, j: Long): Array[Byte] =
      encodeRecord(Seq(
        "WARC-Type" -> "request", "WARC-Record-ID" -> recordId(j),
        "WARC-Date" -> Date, "WARC-Target-URI" -> uri(id),
        "Content-Type" -> "application/http;msgtype=request"),
        (s"GET /doc/$id HTTP/1.1\r\nHost: example.com\r\n"
          + "User-Agent: graftbot/1.0\r\n\r\n").getBytes(UTF_8))

    /** response record: status by id%3, body = the document text. */
    def responseRecord(id: Long, j: Long, text: String): Array[Byte] = {
      val body = text.getBytes(UTF_8)
      val block = (s"HTTP/1.1 ${statusLine(id)}\r\n"
        + "Content-Type: text/plain; charset=utf-8\r\n"
        + s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8) ++
        body
      encodeRecord(Seq(
        "WARC-Type" -> "response", "WARC-Record-ID" -> recordId(j),
        "WARC-Date" -> Date, "WARC-Target-URI" -> uri(id),
        "Content-Type" -> "application/http;msgtype=response"), block)
    }
  }

  private def indexOfCrlfCrlf(bytes: Array[Byte], from: Int): Int = {
    var i = from
    val n = bytes.length - 3
    while (i < n) {
      if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
          bytes(i + 2) == '\r' && bytes(i + 3) == '\n') return i
      i += 1
    }
    -1
  }
}
