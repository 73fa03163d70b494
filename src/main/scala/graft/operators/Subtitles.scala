package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** WebVTT timed-text handling — subtitle/caption tracks are the
  * text-audio-video alignment layer of multimodal training corpora
  * (every ASR / captioning / video-text dataset ships them). The
  * reference engine has no media support at all; this follows the
  * W3C WebVTT spec's cue model: a `WEBVTT` header block, then cue
  * blocks separated by blank lines, each cue = an OPTIONAL identifier
  * line, a timing line `HH:MM:SS.mmm --> HH:MM:SS.mmm` (optionally
  * followed by cue settings), then one or more payload lines.
  *
  * Everything here is pure Column algebra over codegen'd built-ins
  * (`split` / `transform` / `filter` / `aggregate` / `regexp_extract`)
  * — no UDFs, no state, no shuffle; cue extraction over 100 TB of
  * transcripts is embarrassingly parallel per document.
  */
object Subtitles {

  /** Format milliseconds as a VTT timestamp `HH:MM:SS.mmm`. Hours keep
    * every digit past 99 (lpad alone would TRUNCATE to len — the spec
    * allows 2+ hour digits and [[vttMs]] parses them).
    */
  def vttTimestamp(ms: Column): Column = {
    val hs = (ms / 3600000L).cast("long").cast("string")
    concat(
      when(length(hs) < 2, lpad(hs, 2, "0")).otherwise(hs), lit(":"),
      lpad(((ms / 60000L) % 60).cast("long").cast("string"), 2, "0"),
      lit(":"),
      lpad(((ms / 1000L) % 60).cast("long").cast("string"), 2, "0"),
      lit("."), lpad((ms % 1000).cast("long").cast("string"), 3, "0"))
  }

  /** Parse a VTT timestamp back to milliseconds (NULL on mismatch).
    * Hours may exceed two digits per the spec.
    */
  def vttMs(ts: Column): Column = {
    val re = "^(\\d{2,}):(\\d{2}):(\\d{2})\\.(\\d{3})$"
    when(regexp_extract(ts, re, 1) === "", lit(null).cast("long"))
      .otherwise(
        regexp_extract(ts, re, 1).cast("long") * 3600000L +
        regexp_extract(ts, re, 2).cast("long") * 60000L +
        regexp_extract(ts, re, 3).cast("long") * 1000L +
        regexp_extract(ts, re, 4).cast("long"))
  }

  /** Parse a WebVTT document into an array of cue structs
    * `(start_ms, end_ms, text, has_id)`. The timing line is recognized
    * by the ` --> ` arrow on the cue's first or second line (the spec
    * allows exactly one optional identifier line before it); cue
    * settings after the end timestamp are tolerated and dropped;
    * payload lines are rejoined with `\n`. Malformed cues (no arrow on
    * either line) yield NULL start/end so corrupt tracks are countable
    * rather than silently dropped.
    */
  def parseCues(vtt: Column): Column = {
    val blocks0 = split(vtt, "\n\n")
    // drop the WEBVTT header block (and anything before the first
    // blank line, e.g. header metadata lines)
    val blocks = slice(blocks0, lit(2), greatest(size(blocks0) - 1, lit(0)))
    transform(blocks, b => {
      val lines = split(b, "\n")
      val l1 = element_at(lines, 1)
      val l2 = when(size(lines) >= 2, element_at(lines, 2))
      val tIsFirst = l1.contains(" --> ")
      val timing = when(tIsFirst, l1)
        .when(l2.contains(" --> "), l2)
      val parts = split(timing, " --> ")
      val startTs = element_at(parts, 1)
      // settings after the end timestamp: keep the first token only
      val endTs = element_at(split(element_at(parts, 2), " "), 1)
      val textFrom = when(tIsFirst, 2).otherwise(3)
      val text = array_join(
        slice(lines, textFrom, greatest(size(lines), lit(1))), "\n")
      struct(
        vttMs(startTs).as("start_ms"),
        vttMs(endTs).as("end_ms"),
        text.as("text"),
        (!tIsFirst && timing.isNotNull).as("has_id"))
    })
  }
}
