package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** OGG page framing (RFC 3533): lacing state machine including the
  * exact-255-multiple trailing-0 rule, OGG's unreflected CRC-32,
  * BOS/EOS flags, whole-stream rejection on structural violations.
  */
class OggSpec extends AnyFunSuite {

  private def pkt(n: Int): Array[Byte] = Array.tabulate(n)(i => i.toByte)

  test("round-trips packets across lacing shapes") {
    val packets = Seq(pkt(10), pkt(255), pkt(256), pkt(510), pkt(600))
    val granules = Seq(1L, 2L, 3L, 4L, 5L)
    val ogg = Multimodal.encodeOgg(7, packets, granules)
    val pages = Multimodal.oggPages(ogg).get
    assert(pages.length == 5)
    assert(pages.forall(_.crcOk))
    assert(pages.map(_.granule) == Vector(1L, 2L, 3L, 4L, 5L))
    assert(pages.map(_.seqNo) == Vector(0, 1, 2, 3, 4))
    assert((pages.head.headerType & 2) == 2, "BOS on first page")
    assert((pages.last.headerType & 4) == 4, "EOS on last page")
    // lacing shapes: 10 -> [10]; 255 -> [255,0]; 256 -> [255,1];
    // 510 -> [255,255,0]; 600 -> [255,255,90]
    assert(pages(0).lacing.toSeq == Seq(10))
    assert(pages(1).lacing.toSeq == Seq(255, 0))
    assert(pages(2).lacing.toSeq == Seq(255, 1))
    assert(pages(3).lacing.toSeq == Seq(255, 255, 0))
    assert(pages(4).lacing.toSeq == Seq(255, 255, 90))
    assert(Multimodal.oggPacketLengths(pages) ==
      Vector(10L, 255L, 256L, 510L, 600L))
    assert(pages.map(_.payload.length).sum == packets.map(_.length).sum)
  }

  test("crc damage is reported per page, not fatal") {
    val ogg = Multimodal.encodeOgg(1, Seq(pkt(40), pkt(41)), Seq(1L, 2L))
    // flip a payload byte in the FIRST page (offset 27+1 lacing = data)
    val bad = ogg.clone(); bad(30) = (bad(30) ^ 0x55).toByte
    val pages = Multimodal.oggPages(bad).get
    assert(!pages(0).crcOk && pages(1).crcOk)
  }

  test("ogg crc differs from a reflected crc32 (zlib)") {
    val data = "The quick brown fox".getBytes("UTF-8")
    val zlib = new java.util.zip.CRC32()
    zlib.update(data)
    assert((Multimodal.oggCrc(data, 0, data.length) & 0xffffffffL)
      != zlib.getValue)
  }

  test("structural violations reject whole") {
    val ogg = Multimodal.encodeOgg(1, Seq(pkt(40)), Seq(1L))
    val badMagic = ogg.clone(); badMagic(0) = 'X'
    assert(Multimodal.oggPages(badMagic).isEmpty)
    val badVersion = ogg.clone(); badVersion(4) = 1
    assert(Multimodal.oggPages(badVersion).isEmpty)
    assert(Multimodal.oggPages(ogg.dropRight(5)).isEmpty)
  }
}
