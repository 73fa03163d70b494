package graft

import java.nio.charset.StandardCharsets.UTF_8
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Warc

/** WARC framing walk: length-based record boundaries (never fooled by
  * magic bytes inside a block), strict record terminators, HTTP block
  * split, and whole-member rejection on any corruption.
  */
class WarcSpec extends AnyFunSuite {

  private def rec(tpe: String, block: String,
                  extra: Seq[(String, String)] = Nil): Array[Byte] =
    Warc.encodeRecord(Seq("WARC-Type" -> tpe) ++ extra,
      block.getBytes(UTF_8))

  test("round-trips a multi-record member") {
    val f = Warc.encodeFile(Seq(
      rec("warcinfo", "software: x\r\n"),
      rec("response", "HTTP/1.1 200 OK\r\nA: b\r\n\r\nhello",
        Seq("WARC-Target-URI" -> "http://h/p"))))
    val rs = Warc.parseFile(f).get
    assert(rs.length == 2)
    assert(rs(0).header("WARC-Type").contains("warcinfo"))
    assert(new String(rs(0).block, UTF_8) == "software: x\r\n")
    assert(rs(1).header("warc-target-uri").contains("http://h/p"),
      "header lookup is case-insensitive")
    val http = Warc.parseHttp(rs(1).block).get
    assert(http.status.contains(200))
    assert(http.header("a").contains("b"))
    assert(new String(http.body, UTF_8) == "hello")
  }

  test("length framing is not fooled by WARC magic inside a block") {
    val evil = "WARC/1.0\r\nWARC-Type: fake\r\n\r\n\r\n\r\n"
    val f = Warc.encodeFile(Seq(rec("resource", evil), rec("resource", "x")))
    val rs = Warc.parseFile(f).get
    assert(rs.length == 2)
    assert(new String(rs(0).block, UTF_8) == evil)
    assert(new String(rs(1).block, UTF_8) == "x")
  }

  test("empty block and empty member") {
    val f = Warc.encodeFile(Seq(rec("resource", "")))
    val rs = Warc.parseFile(f).get
    assert(rs.length == 1 && rs(0).block.isEmpty)
    assert(Warc.parseFile(Array.emptyByteArray).get.isEmpty)
  }

  test("rejects corrupt members whole") {
    val good = Warc.encodeFile(Seq(rec("resource", "abc")))
    // truncated block
    assert(Warc.parseFile(good.dropRight(3)).isEmpty)
    // bad magic
    val badMagic = good.clone(); badMagic(0) = 'X'
    assert(Warc.parseFile(badMagic).isEmpty)
    // broken record terminator (block overruns into it)
    val badTerm = good.clone()
    badTerm(good.length - 4) = 'x'
    assert(Warc.parseFile(badTerm).isEmpty)
    // header line without a colon
    val noColon = ("WARC/1.0\r\nWARC-Type resource\r\n"
      + "Content-Length: 0\r\n\r\n\r\n\r\n").getBytes(UTF_8)
    assert(Warc.parseFile(noColon).isEmpty)
    // unparsable Content-Length
    val badLen = ("WARC/1.0\r\nWARC-Type: resource\r\n"
      + "Content-Length: zap\r\n\r\n\r\n\r\n").getBytes(UTF_8)
    assert(Warc.parseFile(badLen).isEmpty)
    // near-Int.MaxValue Content-Length must reject, not wrap the
    // bounds check negative and throw
    val hugeLen = ("WARC/1.0\r\nWARC-Type: resource\r\n"
      + "Content-Length: 2147483600\r\n\r\n\r\n\r\n").getBytes(UTF_8)
    assert(Warc.parseFile(hugeLen).isEmpty)
    // near-Long.MaxValue: blockStart + len + 4 would overflow Long to
    // negative and bypass the bounds check (ADVICE r8) — must reject
    val hugeLong = ("WARC/1.0\r\nWARC-Type: resource\r\n"
      + "Content-Length: 9223372036854775800\r\n\r\n\r\n\r\n").getBytes(UTF_8)
    assert(Warc.parseFile(hugeLong).isEmpty)
  }

  test("http parse: request start line has no status; bare body split") {
    val req = Warc.parseHttp(
      "GET /p HTTP/1.1\r\nHost: h\r\n\r\n".getBytes(UTF_8)).get
    assert(req.status.isEmpty && req.header("host").contains("h")
      && req.body.isEmpty)
    // body containing CRLFCRLF: split happens at the FIRST one only
    val resp = Warc.parseHttp(
      "HTTP/1.1 404 Not Found\r\n\r\na\r\n\r\nb".getBytes(UTF_8)).get
    assert(resp.status.contains(404))
    assert(new String(resp.body, UTF_8) == "a\r\n\r\nb")
    // non-numeric status token is a reject, not a zero
    assert(Warc.parseHttp("HTTP/1.1 abc\r\n\r\n".getBytes(UTF_8)).isEmpty)
  }
}
