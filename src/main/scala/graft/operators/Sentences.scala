package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sentence segmentation — the text-pipeline step before
  * sentence-level dedup, sequence packing, and parallel-corpus
  * alignment. Heuristic segmentation (terminal punctuation followed by
  * whitespace) with an abbreviation-protection pass, the standard
  * pragmatic design (a full ML segmenter is a model, not an operator).
  *
  * Pure Column algebra over codegen'd built-ins: protect → split on a
  * lookbehind regex (Java regex, which Spark's `split` compiles —
  * `(?<=[.!?])\s+` keeps the terminal with its sentence) → restore.
  * Embarrassingly parallel per document, zero shuffle, no UDFs.
  */
object Sentences {

  /** Default protected abbreviations: the '.' inside them must not end
    * a sentence.
    */
  val DefaultAbbrevs: Seq[String] =
    Seq("Dr.", "Mr.", "Mrs.", "Ms.", "Prof.", "e.g.", "i.e.", "etc.",
      "vs.", "St.")

  /** U+0001 stands in for a protected '.' between protect and restore
    * — a control char that survives `split` untouched. If the input
    * itself contains U+0001 it restores to '.', which preserves every
    * length statistic (documented tradeoff; real corpora strip C0
    * controls first — see t31's encoding-quality pass).
    */
  private val Mark = "\u0001"

  /** Split `text` into an array of sentences. Terminal punctuation
    * stays with its sentence; runs of whitespace between sentences are
    * consumed; protected abbreviations never split.
    */
  def split(text: Column, abbrevs: Seq[String] = DefaultAbbrevs): Column = {
    val protectedText = abbrevs.foldLeft(text) { (t, a) =>
      val marked = a.dropRight(1) + Mark
      // word-boundary anchor: 'etc.' must not match inside 'fetc.' —
      // an unanchored replace would suppress a REAL sentence boundary
      // after any word that merely ends in an abbreviation string
      regexp_replace(t,
        "(?<![\\p{L}\\p{N}])" + java.util.regex.Pattern.quote(a), marked)
    }
    val parts = org.apache.spark.sql.functions.split(
      protectedText, "(?<=[.!?])\\s+")
    transform(parts, p => regexp_replace(p, Mark, "."))
  }
}
