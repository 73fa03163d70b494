package graft

import java.nio.charset.StandardCharsets.UTF_8
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Gzip

/** RFC 1952 multi-member walk: member boundaries, optional header
  * fields, trailer verification, whole-blob rejection.
  */
class GzipSpec extends AnyFunSuite {

  test("walks concatenated members with exact boundaries") {
    val a = Gzip.compress("hello hello hello".getBytes(UTF_8))
    val b = Gzip.compress("world".getBytes(UTF_8))
    val ms = Gzip.members(a ++ b).get
    assert(ms.length == 2)
    assert(new String(ms(0).plain, UTF_8) == "hello hello hello")
    assert(new String(ms(1).plain, UTF_8) == "world")
    assert(ms(0).offset == 0 && ms(0).compLen == a.length)
    assert(ms(1).offset == a.length && ms(1).compLen == b.length)
    assert(ms.forall(m => m.crcOk && m.isizeOk))
  }

  test("optional FNAME/FEXTRA/FCOMMENT/FHCRC header fields are skipped") {
    val payload = "data with a name".getBytes(UTF_8)
    val base = Gzip.compress(payload)
    // rebuild with FLG = FEXTRA|FNAME|FCOMMENT (no FHCRC to keep the
    // trailer valid): header(10) + xtra(2+3) + name + comment
    val deflateAndTrailer = base.drop(10)
    val hdr = Array[Byte](0x1f.toByte, 0x8b.toByte, 8, (4 | 8 | 16).toByte,
      0, 0, 0, 0, 0, 0)
    val extra = Array[Byte](3, 0, 1, 2, 3)
    val name = "member.txt\u0000".getBytes(UTF_8)
    val comment = "a comment\u0000".getBytes(UTF_8)
    val blob = hdr ++ extra ++ name ++ comment ++ deflateAndTrailer
    val ms = Gzip.members(blob).get
    assert(ms.length == 1)
    assert(new String(ms(0).plain, UTF_8) == "data with a name")
    assert(ms(0).crcOk && ms(0).isizeOk)
  }

  test("corrupt trailer reported per member, not rejected") {
    val blob = Gzip.compress("abc".getBytes(UTF_8))
    blob(blob.length - 1) = (blob(blob.length - 1) ^ 0x7f).toByte // ISIZE
    blob(blob.length - 5) = (blob(blob.length - 5) ^ 0x7f).toByte // CRC
    val ms = Gzip.members(blob).get
    assert(ms.length == 1 && !ms(0).crcOk && !ms(0).isizeOk)
    assert(new String(ms(0).plain, UTF_8) == "abc")
  }

  test("rejects framing violations whole") {
    val good = Gzip.compress("abcdef".getBytes(UTF_8))
    // bad magic
    val badMagic = good.clone(); badMagic(0) = 0x1e
    assert(Gzip.members(badMagic).isEmpty)
    // bad compression method
    val badCm = good.clone(); badCm(2) = 7
    assert(Gzip.members(badCm).isEmpty)
    // truncated trailer
    assert(Gzip.members(good.dropRight(3)).isEmpty)
    // corrupt deflate stream
    val badData = good.clone(); badData(12) = (badData(12) ^ 0x55).toByte
    assert(Gzip.members(badData).isEmpty ||
      Gzip.members(badData).get.exists(m => !m.crcOk),
      "a deflate bitflip either breaks the stream or the CRC")
    // trailing garbage after a member that is not a new header
    assert(Gzip.members(good ++ Array[Byte](1, 2, 3)).isEmpty)
  }
}
