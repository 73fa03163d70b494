package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction for web-corpus pipelines — the step every
  * crawl-derived training set runs before any quality scoring or
  * dedup: drop non-text elements (script/style/comments), strip
  * markup, decode entities, collapse whitespace, and measure link
  * density (the classic boilerplate signal: nav/footer blocks are
  * mostly anchor text, body prose is not).
  *
  * Scale shape: pure per-row Column compositions over codegen'd
  * built-ins (`regexp_replace`, `regexp_extract_all`, `replace`,
  * higher-order `transform`/`aggregate`) — no UDFs, no state, no
  * shuffle. Known regex-extractor limitations (shared by every
  * regex-based stripper): an attribute value containing a literal
  * '>' ends the tag early, and nested `<a>` elements only credit the
  * outermost anchor up to its first closer. Both are spec'd, not
  * silent.
  */
object Html {

  /** Drop the non-rendered elements wholesale: `<head>` (title/meta
    * are metadata, not visible text — read them with [[title]]),
    * `<script>`/`<style>` anywhere in the body (their content is
    * code), and HTML comments. Non-greedy to the first matching
    * closer; case-insensitive; DOTALL so multi-line blocks go too.
    * `\b` keeps `<head>` from eating `<header>`.
    */
  def dropNonText(html: Column): Column = {
    val noHead =
      regexp_replace(html, "(?is)<head\\b[^>]*>.*?</head\\s*>", " ")
    val noScript =
      regexp_replace(noHead, "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
  }

  /** Decode the common named/numeric entities. `&amp;` decodes LAST
    * so double-escaped text (`&amp;lt;`) decodes exactly one level —
    * to the literal `&lt;` — matching how a browser renders it.
    * Literal `replace`, not regex, so no metacharacter surprises.
    */
  def decodeEntities(c: Column): Column = {
    val steps = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&apos;" -> "'", "&nbsp;" -> " ", "&copy;" -> "©")
    val base = steps.foldLeft(c) { case (acc, (ent, ch)) =>
      replace(acc, lit(ent), lit(ch))
    }
    replace(base, lit("&amp;"), lit("&"))
  }

  /** Visible text of an HTML document: non-text elements dropped,
    * every remaining tag replaced by a space (so words in adjacent
    * blocks never fuse), entities decoded AFTER tag stripping (so
    * `&lt;em&gt;` in source text survives as the literal `<em>`),
    * whitespace collapsed.
    */
  def extractText(html: Column): Column = {
    val noTags = regexp_replace(dropNonText(html), "<[^>]+>", " ")
    trim(regexp_replace(decodeEntities(noTags), "\\s+", " "))
  }

  /** `<title>` inner text, entity-decoded and whitespace-collapsed;
    * NULL when absent.
    */
  def title(html: Column): Column = {
    val raw = regexp_extract(html, "(?is)<title[^>]*>(.*?)</title\\s*>", 1)
    when(raw === "", lit(null).cast("string"))
      .otherwise(trim(regexp_replace(decodeEntities(raw), "\\s+", " ")))
  }

  /** Inner visible texts of every `<a>` element (array). */
  def anchorTexts(html: Column): Column =
    transform(
      regexp_extract_all(dropNonText(html),
        lit("(?is)<a\\b[^>]*>(.*?)</a\\s*>"), lit(1)),
      a => trim(regexp_replace(
        decodeEntities(regexp_replace(a, "<[^>]+>", " ")), "\\s+", " ")))

  /** Characters of anchor text (link-density numerator). */
  def anchorChars(html: Column): Column =
    aggregate(anchorTexts(html), lit(0), (acc, x) => acc + length(x))

  /** Anchor-text chars / total visible chars ∈ [0,1]; 0 for an empty
    * document. The boilerplate-block signal: jusText/trafilatura-style
    * extractors threshold on exactly this ratio.
    */
  def linkDensity(html: Column): Column = {
    val total = length(extractText(html))
    when(total === 0, lit(0.0))
      .otherwise(anchorChars(html).cast("double") / total.cast("double"))
  }
}
