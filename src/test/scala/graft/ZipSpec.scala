package graft

import java.nio.charset.StandardCharsets.UTF_8
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Zip

/** ZIP central-directory walk over the JDK writer's real output. */
class ZipSpec extends AnyFunSuite {

  private def writeZip(entries: Seq[(String, Array[Byte])],
                       comment: Option[String] = None): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    entries.foreach { case (name, data) =>
      val e = new java.util.zip.ZipEntry(name)
      e.setMethod(java.util.zip.ZipEntry.STORED)
      e.setSize(data.length.toLong)
      val crc = new java.util.zip.CRC32(); crc.update(data)
      e.setCrc(crc.getValue)
      e.setTime(315532800000L) // fixed DOS-representable mtime
      z.putNextEntry(e); z.write(data); z.closeEntry()
    }
    comment.foreach(z.setComment)
    z.close()
    bos.toByteArray
  }

  test("walks STORED entries with exact offsets (30 + name local headers)") {
    val zip = writeZip(Seq(
      ("00000001.txt", "hello world".getBytes(UTF_8)),
      ("00000001.cls", "en".getBytes(UTF_8))))
    val es = Zip.entries(zip).get
    assert(es.map(_.name) == Vector("00000001.txt", "00000001.cls"))
    assert(es.forall(e => e.method == 0 && e.localOk))
    assert(es(0).size == 11 && es(0).csize == 11)
    assert(es(0).localOffset == 0)
    assert(es(1).localOffset == 30 + 12 + 11,
      s"JDK local header layout changed: ${es(1).localOffset}")
    val crc = new java.util.zip.CRC32()
    crc.update("hello world".getBytes(UTF_8))
    assert(es(0).crc == crc.getValue)
  }

  test("EOCD found behind a trailing archive comment") {
    val zip = writeZip(Seq(("a", "x".getBytes(UTF_8))),
      comment = Some("a trailing comment"))
    val es = Zip.entries(zip).get
    assert(es.length == 1 && es(0).name == "a" && es(0).localOk)
  }

  test("deflated entries also walk (sizes from the directory)") {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    val e = new java.util.zip.ZipEntry("d.txt")
    z.putNextEntry(e)
    z.write(("repetitive " * 50).getBytes(UTF_8))
    z.closeEntry(); z.close()
    val es = Zip.entries(bos.toByteArray).get
    assert(es(0).method == 8 && es(0).size == 550 && es(0).csize < 550)
    assert(es(0).localOk)
  }

  test("crafted 2^31+ offsets reject instead of negative indexing") {
    // ADVICE r8: 32-bit offsets >= 2^31 go negative through .toInt;
    // both the directory offset and each local offset must bound-check
    // in Long space, not throw ArrayIndexOutOfBounds
    val zip = writeZip(Seq(("a", "x".getBytes(UTF_8))))
    val eocd = zip.length - 22
    val badDir = zip.clone()
    (eocd + 16 until eocd + 20).foreach(i => badDir(i) = 0x80.toByte)
    assert(Zip.entries(badDir).isEmpty)
    // local offset field is at central-dir entry + 42
    val dirOff = (zip(eocd + 16) & 0xFF) | ((zip(eocd + 17) & 0xFF) << 8)
    val badLocal = zip.clone()
    (dirOff + 42 until dirOff + 46).foreach(i => badLocal(i) = 0x80.toByte)
    val es = Zip.entries(badLocal).get
    assert(es.length == 1 && !es(0).localOk)
  }

  test("corruption rejects") {
    val zip = writeZip(Seq(("a", "x".getBytes(UTF_8))))
    assert(Zip.entries(zip.dropRight(4)).isEmpty) // truncated EOCD
    val bad = zip.clone()
    // break the central-dir magic (EOCD offset points at it)
    val eocd = zip.length - 22
    val dirOff = (zip(eocd + 16) & 0xFF) | ((zip(eocd + 17) & 0xFF) << 8)
    bad(dirOff) = 'X'
    assert(Zip.entries(bad).isEmpty)
  }
}
