package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

/** ZIP central-directory walk (PKWARE APPNOTE layout) — dataset drops
  * still ship as zip archives, and the central directory at the END of
  * the file is the random-access index (stream-parsing local headers
  * is the classic wrong approach: entries may carry data descriptors).
  * Walk: find EOCD (`PK\x05\x06`, scanned backward past an optional
  * trailing comment), read the directory offset/count, walk the
  * `PK\x01\x02` entries, and verify each referenced local header
  * (`PK\x03\x04`) exists at its claimed offset.
  *
  * Unlike the other container fixtures, the test corpus here is
  * written by the JDK's own [[java.util.zip.ZipOutputStream]] — the
  * walk reads a REAL third-party writer's output, not its own mirror
  * image (a mirrored encoder can hide a shared misreading of the
  * spec).
  */
object Zip {

  final case class Entry(name: String, method: Int, size: Long,
                         csize: Long, crc: Long, localOffset: Long,
                         localOk: Boolean)

  def entries(bytes: Array[Byte]): Option[Vector[Entry]] = {
    // EOCD: min 22 bytes, magic 0x06054b50 LE, possibly followed by a
    // comment (up to 64k) — scan backward
    var e = bytes.length - 22
    val stop = math.max(0, bytes.length - 22 - 0xFFFF)
    while (e >= stop &&
           !(bytes(e) == 0x50 && bytes(e + 1) == 0x4b &&
             bytes(e + 2) == 0x05 && bytes(e + 3) == 0x06)) e -= 1
    if (e < stop || e < 0) return None
    def le16(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    def le32(o: Int): Long =
      (bytes(o) & 0xFFL) | ((bytes(o + 1) & 0xFFL) << 8) |
      ((bytes(o + 2) & 0xFFL) << 16) | ((bytes(o + 3) & 0xFFL) << 24)
    val n = le16(e + 10)
    val dirOff = le32(e + 16)
    // ADVICE r8: a 32-bit offset >= 2^31 would go negative through
    // .toInt and index out of range — validate in Long space first
    if (dirOff > bytes.length.toLong) return None
    var p = dirOff.toInt
    val out = Vector.newBuilder[Entry]
    var i = 0
    while (i < n) {
      if (p + 46 > bytes.length || le32(p) != 0x02014b50L) return None
      val method = le16(p + 10)
      val crc = le32(p + 16)
      val csize = le32(p + 20)
      val size = le32(p + 24)
      val nameLen = le16(p + 28)
      val extraLen = le16(p + 30)
      val commentLen = le16(p + 32)
      val localOff = le32(p + 42)
      if (p + 46 + nameLen > bytes.length) return None
      val name = new String(bytes, p + 46, nameLen, UTF_8)
      // Long-space bound before .toInt: localOff >= 2^31 must read as
      // out-of-file, not as a negative array index
      val localOk = localOff + 4 <= bytes.length.toLong &&
        le32(localOff.toInt) == 0x04034b50L
      out += Entry(name, method, size, csize, crc, localOff, localOk)
      p += 46 + nameLen + extraLen + commentLen
      i += 1
    }
    Some(out.result())
  }
}
