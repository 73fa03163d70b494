package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

/** POSIX ustar archive framing — the container of WebDataset-style
  * multimodal training shards (a shard is a tar whose members group
  * into samples by basename: `000017.txt` + `000017.cls` +
  * `000017.jpg` = one sample). The reference engine has no archive
  * support; for a 100-TB multimodal pipeline the shard walk is the
  * ingest step before any decode.
  *
  * Format (public POSIX.1-1988/ustar): 512-byte header blocks — name
  * at 0 (100 bytes, NUL-terminated), size at 124 (octal, NUL/space
  * terminated), checksum at 148 (8 bytes: simple byte sum of the
  * header with the checksum field read as spaces), typeflag at 156,
  * `ustar` magic at 257 — each followed by the member data padded to
  * a 512 multiple, the archive ending in two zero blocks. All
  * arithmetic is integer block math, which is what makes the oracle
  * able to replay every member's byte offset as a window prefix-sum.
  *
  * Scale shape: one shard encodes/parses independently of every other
  * — shard-level parallelism with zero state and zero shuffle.
  */
object Tar {

  final case class Member(name: String, size: Long, dataOffset: Long,
                          data: Array[Byte])

  private def octal(v: Long, width: Int): Array[Byte] = {
    // width-1 octal digits, NUL terminator (GNU/POSIX common form)
    val s = java.lang.Long.toOctalString(v)
    val pad = "0" * (width - 1 - s.length) + s
    (pad + "\u0000").getBytes(UTF_8)
  }

  /** Encode one member header + padded data. */
  private def encodeMember(name: String, data: Array[Byte]): Array[Byte] = {
    val hdr = new Array[Byte](512)
    val nameB = name.getBytes(UTF_8)
    require(nameB.length <= 100, s"tar name too long: $name")
    System.arraycopy(nameB, 0, hdr, 0, nameB.length)
    System.arraycopy(octal(420, 8), 0, hdr, 100, 8) // mode 0644
    System.arraycopy(octal(0, 8), 0, hdr, 108, 8) // uid
    System.arraycopy(octal(0, 8), 0, hdr, 116, 8) // gid
    System.arraycopy(octal(data.length.toLong, 12), 0, hdr, 124, 12)
    System.arraycopy(octal(0, 12), 0, hdr, 136, 12) // mtime
    java.util.Arrays.fill(hdr, 148, 156, ' '.toByte) // chksum as spaces
    hdr(156) = '0' // typeflag: regular file
    System.arraycopy("ustar\u000000".getBytes(UTF_8), 0, hdr, 257, 8)
    var sum = 0L
    var i = 0
    while (i < 512) { sum += hdr(i) & 0xff; i += 1 }
    // checksum: 6 octal digits, NUL, space
    val ck = java.lang.Long.toOctalString(sum)
    val ckPad = "0" * (6 - ck.length) + ck
    System.arraycopy((ckPad + "\u0000 ").getBytes(UTF_8), 0, hdr, 148, 8)
    val padded = (data.length + 511) / 512 * 512
    val out = new Array[Byte](512 + padded)
    System.arraycopy(hdr, 0, out, 0, 512)
    System.arraycopy(data, 0, out, 512, data.length)
    out
  }

  /** Encode a full archive: members in order + two zero trailer
    * blocks.
    */
  def encode(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val parts = members.map { case (n, d) => encodeMember(n, d) }
    val out = new Array[Byte](parts.map(_.length).sum + 1024)
    var off = 0
    parts.foreach { p =>
      System.arraycopy(p, 0, out, off, p.length); off += p.length
    }
    out
  }

  private def parseOctal(bytes: Array[Byte], from: Int,
                         len: Int): Option[Long] = {
    var v = 0L
    var i = from
    var seen = false
    val end = from + len
    while (i < end) {
      val b = bytes(i) & 0xff
      if (b == 0 || b == ' ') {
        if (seen) return Some(v)
      } else if (b >= '0' && b <= '7') {
        v = v * 8 + (b - '0'); seen = true
      } else return None
      i += 1
    }
    if (seen) Some(v) else None
  }

  /** Walk every member. None on any framing violation: bad magic,
    * checksum mismatch, unparsable size, truncated data, or a missing
    * zero-block trailer — corrupt shards reject whole (count the
    * shard, keep the batch).
    */
  def parse(bytes: Array[Byte]): Option[Vector[Member]] =
    parse(bytes, copyData = true)

  /** Header-only walk: same checksum/framing validation, but member
    * payloads are never copied (each Member carries empty data; sizes
    * and offsets are real). The projection-pruning fast path for
    * name/size/offset-only reads of large shards.
    */
  def parseMeta(bytes: Array[Byte]): Option[Vector[Member]] =
    parse(bytes, copyData = false)

  private def parse(bytes: Array[Byte],
                    copyData: Boolean): Option[Vector[Member]] = {
    val out = Vector.newBuilder[Member]
    var pos = 0
    while (true) {
      if (pos + 512 > bytes.length) return None
      if (isZeroBlock(bytes, pos)) {
        // trailer: a second zero block must follow
        if (pos + 1024 > bytes.length || !isZeroBlock(bytes, pos + 512))
          return None
        return Some(out.result())
      }
      // magic: "ustar" at 257
      if (!(bytes(pos + 257) == 'u' && bytes(pos + 258) == 's' &&
            bytes(pos + 259) == 't' && bytes(pos + 260) == 'a' &&
            bytes(pos + 261) == 'r')) return None
      val stored = parseOctal(bytes, pos + 148, 8).getOrElse(return None)
      var sum = 0L
      var i = 0
      while (i < 512) {
        val b =
          if (i >= 148 && i < 156) ' '.toByte else bytes(pos + i)
        sum += b & 0xff
        i += 1
      }
      if (sum != stored) return None
      var nameEnd = pos
      while (nameEnd < pos + 100 && bytes(nameEnd) != 0) nameEnd += 1
      val name = new String(bytes, pos, nameEnd - pos, UTF_8)
      val size = parseOctal(bytes, pos + 124, 12).getOrElse(return None)
      val dataOff = pos + 512
      val padded = (size + 511) / 512 * 512
      if (dataOff + padded > bytes.length) return None
      out += Member(name, size, dataOff.toLong,
        if (copyData)
          java.util.Arrays.copyOfRange(bytes, dataOff,
            (dataOff + size).toInt)
        else Array.emptyByteArray)
      pos = (dataOff + padded).toInt
    }
    None // unreachable
  }

  private def isZeroBlock(bytes: Array[Byte], from: Int): Boolean = {
    var i = from
    while (i < from + 512) {
      if (bytes(i) != 0) return false
      i += 1
    }
    true
  }
}
