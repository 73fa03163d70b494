package graft

import java.nio.charset.StandardCharsets.UTF_8
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Tar

/** POSIX ustar framing: block math, octal fields, checksum
  * verification, whole-shard rejection on corruption.
  */
class TarSpec extends AnyFunSuite {

  test("round-trips members, offsets follow 512-block math") {
    val tar = Tar.encode(Seq(
      ("00000001.txt", "hello world".getBytes(UTF_8)),
      ("00000001.cls", "en".getBytes(UTF_8)),
      ("big.bin", Array.fill[Byte](512)(7)))) // exact block multiple
    val ms = Tar.parse(tar).get
    assert(ms.map(_.name) == Vector("00000001.txt", "00000001.cls",
      "big.bin"))
    assert(ms(0).size == 11 && ms(0).dataOffset == 512)
    // 11 bytes pad to 512 -> next header at 1024, data at 1536
    assert(ms(1).dataOffset == 1536)
    // 2 bytes pad to 512 -> next header at 2048, data at 2560
    assert(ms(2).dataOffset == 2560 && ms(2).size == 512)
    // exact multiple: no extra pad block; trailer after 2560+512
    assert(tar.length == 2560 + 512 + 1024)
    assert(new String(ms(0).data, UTF_8) == "hello world")
  }

  test("empty member and empty archive") {
    val ms = Tar.parse(Tar.encode(Seq(("e", Array.emptyByteArray)))).get
    assert(ms(0).size == 0 && ms(0).data.isEmpty)
    assert(Tar.parse(Tar.encode(Nil)).get.isEmpty)
  }

  test("rejects corruption whole") {
    val tar = Tar.encode(Seq(("a.txt", "abc".getBytes(UTF_8))))
    // flip a data byte -> checksum still fine (data not covered), ok
    val dataFlip = tar.clone(); dataFlip(513) = 'X'
    assert(Tar.parse(dataFlip).isDefined, "data is not checksummed")
    // flip a header byte -> checksum mismatch
    val hdrFlip = tar.clone(); hdrFlip(0) = 'z'
    assert(Tar.parse(hdrFlip).isEmpty)
    // break the magic (checksum recomputation not even reached)
    val magicFlip = tar.clone(); magicFlip(257) = 'X'
    assert(Tar.parse(magicFlip).isEmpty)
    // truncate the trailer -> reject
    assert(Tar.parse(tar.dropRight(512)).isEmpty)
    // truncate mid-data -> reject
    assert(Tar.parse(tar.take(600)).isEmpty)
  }
}
