package graft.operators

import java.lang.Character.UnicodeScript

import org.apache.spark.unsafe.types.UTF8String

/** Unicode spoof audit (UTS #39-style) — the corpus-hygiene pass that
  * catches homoglyph spam, SEO cloaking, and prompt-injection payloads
  * hidden behind lookalike or invisible characters:
  *
  *   - `skeleton`: NFKC, strip invisible characters, then map a
  *     DOCUMENTED subset of the UTS #39 confusables table
  *     (Cyrillic/Greek → Latin lookalikes). Two texts that render the
  *     same skeleton to the same string, so exact/fuzzy dedup on the
  *     skeleton collapses homoglyph variants.
  *   - `mixedScriptTokens`: whitespace tokens whose letters span ≥2
  *     Unicode scripts (COMMON/INHERITED/UNKNOWN neutral) — the UTS
  *     #39 restriction-level signal; legitimate text is single-script
  *     per word in almost every language.
  *   - `invisibleCount`: zero-width and format characters (ZWSP, ZWNJ,
  *     ZWJ, word-joiner, BOM, soft hyphen) counted BEFORE
  *     normalization — NFKC removes some of them, and the count is
  *     the evidence.
  *
  * The full confusables table is a data file, not an algorithm;
  * pipelines that need it exactly load it as a broadcast lookup join
  * (same note as [[Url.registrableDomain]]'s suffix subset).
  */
object Spoof {

  /** Invisible / format characters counted and stripped. */
  private def isInvisible(cp: Int): Boolean = cp match {
    case 0x200B | 0x200C | 0x200D | 0x2060 | 0xFEFF | 0x00AD => true
    case _ => false
  }

  /** Documented UTS #39 subset: Cyrillic and Greek letters whose
    * reference glyphs are identical to Basic Latin ones.
    */
  private val confusable: Map[Int, Char] = Map(
    // Cyrillic lowercase
    0x0430 -> 'a', 0x0435 -> 'e', 0x043E -> 'o', 0x0440 -> 'p',
    0x0441 -> 'c', 0x0443 -> 'y', 0x0445 -> 'x', 0x0456 -> 'i',
    0x0455 -> 's', 0x0458 -> 'j',
    // Cyrillic uppercase
    0x0410 -> 'A', 0x0412 -> 'B', 0x0415 -> 'E', 0x041A -> 'K',
    0x041C -> 'M', 0x041D -> 'H', 0x041E -> 'O', 0x0420 -> 'P',
    0x0421 -> 'C', 0x0422 -> 'T', 0x0423 -> 'Y', 0x0425 -> 'X',
    // Greek lowercase
    0x03BF -> 'o', 0x03BD -> 'v', 0x03B9 -> 'i', 0x03C1 -> 'p',
    // Greek uppercase
    0x0391 -> 'A', 0x0392 -> 'B', 0x0395 -> 'E', 0x0396 -> 'Z',
    0x0397 -> 'H', 0x0399 -> 'I', 0x039A -> 'K', 0x039C -> 'M',
    0x039D -> 'N', 0x039F -> 'O', 0x03A1 -> 'P', 0x03A4 -> 'T',
    0x03A5 -> 'Y', 0x03A7 -> 'X')

  def skeleton(s: String): String = {
    val n = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKC)
    val b = new StringBuilder(n.length)
    var i = 0
    while (i < n.length) {
      val cp = n.codePointAt(i)
      if (!isInvisible(cp)) confusable.get(cp) match {
        case Some(c) => b.append(c)
        case None => b.appendAll(Character.toChars(cp))
      }
      i += Character.charCount(cp)
    }
    b.toString
  }

  /** Whitespace tokens whose letters span ≥2 scripts. */
  def mixedScriptTokens(s: String): Long = {
    var count = 0L
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && Character.isWhitespace(s.charAt(i))) i += 1
      if (i < len) {
        var first: UnicodeScript = null
        var mixed = false
        while (i < len && !Character.isWhitespace(s.charAt(i))) {
          val cp = s.codePointAt(i)
          if (Character.isLetter(cp)) {
            val sc = UnicodeScript.of(cp)
            if (sc != UnicodeScript.COMMON && sc != UnicodeScript.INHERITED &&
                sc != UnicodeScript.UNKNOWN) {
              if (first == null) first = sc
              else if (sc != first) mixed = true
            }
          }
          i += Character.charCount(cp)
        }
        if (mixed) count += 1
      }
    }
    count
  }

  def invisibleCount(s: String): Long = {
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (isInvisible(cp)) n += 1
      i += Character.charCount(cp)
    }
    n
  }

  // ---- UTF8String entry points for the codegen'd expressions ----

  def skeletonUtf8(s: UTF8String): UTF8String =
    UTF8String.fromString(skeleton(s.toString))

  def mixedUtf8(s: UTF8String): Long = mixedScriptTokens(s.toString)

  def invisibleUtf8(s: UTF8String): Long = invisibleCount(s.toString)
}
