package graft.operators

/** Multi-member gzip walk (RFC 1952) — web-crawl corpora ship WARC as
  * PER-RECORD gzip members concatenated into one `.warc.gz` (the
  * Common Crawl convention: member boundaries are the random-access
  * seek index into a 100-TB crawl). A plain GZIPInputStream hides the
  * boundaries; this walk surfaces them: per member, the full header
  * grammar (magic, CM=8, FLG with FEXTRA/FNAME/FCOMMENT/FHCRC
  * optionals), raw-deflate inflate via the JDK's public
  * [[java.util.zip.Inflater]], then the CRC32 + ISIZE trailer verified
  * against the decompressed bytes.
  *
  * Scale shape: members decode independently and the walk is
  * sequential within one blob only — blob-level parallelism, zero
  * state, zero shuffle.
  */
object Gzip {

  /** One decoded member: byte offset of its header, compressed length
    * including header+trailer, decompressed payload, and trailer
    * verification results.
    */
  final case class Entry(offset: Long, compLen: Long, plain: Array[Byte],
                         crcOk: Boolean, isizeOk: Boolean)

  /** Compress one member (JDK GZIPOutputStream). */
  def compress(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(data)
    g.close()
    bos.toByteArray
  }

  /** Walk all concatenated members. None on any framing violation
    * (bad magic/method, truncated stream, deflate error) — corrupt
    * blobs reject whole. CRC/ISIZE mismatches do NOT reject: they are
    * reported per member (`crcOk`/`isizeOk`) so an audit can count
    * damaged members without dropping the readable ones.
    */
  def members(bytes: Array[Byte]): Option[Vector[Entry]] = {
    val out = Vector.newBuilder[Entry]
    var pos = 0
    while (pos < bytes.length) {
      val start = pos
      if (pos + 10 > bytes.length) return None
      if ((bytes(pos) & 0xff) != 0x1f || (bytes(pos + 1) & 0xff) != 0x8b
          || bytes(pos + 2) != 8) return None
      val flg = bytes(pos + 3) & 0xff
      pos += 10
      if ((flg & 4) != 0) { // FEXTRA
        if (pos + 2 > bytes.length) return None
        val xlen = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8)
        pos += 2 + xlen
      }
      if ((flg & 8) != 0) { // FNAME: NUL-terminated
        while (pos < bytes.length && bytes(pos) != 0) pos += 1
        pos += 1
      }
      if ((flg & 16) != 0) { // FCOMMENT
        while (pos < bytes.length && bytes(pos) != 0) pos += 1
        pos += 1
      }
      if ((flg & 2) != 0) pos += 2 // FHCRC
      if (pos >= bytes.length) return None
      val inf = new java.util.zip.Inflater(true) // raw deflate
      inf.setInput(bytes, pos, bytes.length - pos)
      val buf = new Array[Byte](8192)
      val bos = new java.io.ByteArrayOutputStream()
      try {
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          if (n == 0 && inf.needsInput()) { inf.end(); return None }
          bos.write(buf, 0, n)
        }
      } catch {
        case _: java.util.zip.DataFormatException => inf.end(); return None
      }
      val compUsed = inf.getBytesRead.toInt
      inf.end()
      pos += compUsed
      if (pos + 8 > bytes.length) return None
      val plain = bos.toByteArray
      def le32(o: Int): Long =
        (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
      val crc = new java.util.zip.CRC32()
      crc.update(plain, 0, plain.length)
      val crcOk = (crc.getValue & 0xffffffffL) == le32(pos)
      val isizeOk = (plain.length.toLong & 0xffffffffL) == le32(pos + 4)
      pos += 8
      out += Entry(start.toLong, (pos - start).toLong, plain, crcOk,
        isizeOk)
    }
    Some(out.result())
  }
}
