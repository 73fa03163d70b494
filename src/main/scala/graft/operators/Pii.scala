package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines: per-document
  * match counts plus a redacted text column with every match replaced by
  * a typed placeholder.
  *
  * Scale shape: the whole operator is a single narrow projection of
  * codegen'd `regexp_extract_all` / `regexp_replace` expressions — zero
  * shuffles, zero UDFs, linear in input splits. At 100 TB the plan is
  * "scan → project → write" with column pruning intact; redaction
  * throughput is bounded only by regex evaluation, which whole-stage
  * codegen keeps on-heap per task.
  *
  * The reference engine (cube2222/octosql) has no PII surface; this is
  * one of the pipeline operators beyond the reference. Patterns are
  * deliberately restricted to syntax with identical semantics in Java
  * regex (Spark) and RE2 (DuckDB/Go) — character classes, bounded
  * repetition, `\b`/`\d` — no backreferences or lookaround, so oracle
  * engines replay them verbatim.
  */
object Pii {

  /** (name, pattern, placeholder). Order matters: rules are applied
    * top-down, so broader matches (emails, which contain dots and
    * digits) are consumed before narrower ones (IPs, phones).
    */
  val Rules: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\b\\d{3}-\\d{4}\\b", "<PHONE>"))

  /** Number of non-overlapping matches of `pattern` in `text`. */
  def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** `text` with every rule match replaced by its placeholder, rules
    * applied in [[Rules]] order.
    */
  def redact(text: Column): Column =
    Rules.foldLeft(text) { case (c, (_, pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** Per-document PII report: `(id, n_emails, n_ips, n_phones,
    * redacted)`. Counts are taken on the original text; redaction
    * applies all rules in order.
    */
  def scan(docs: DataFrame, idCol: String = "doc_id",
           textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val counts = Rules.map { case (name, pat, _) =>
      matchCount(t, pat).as(s"n_${name}s")
    }
    docs.select(col(idCol) +: counts :+ redact(t).as("redacted"): _*)
  }

  /** Keyed pseudonymization: replace identifier columns with
    * `sha2(key ‖ value)` hex digests — irreversible without the key,
    * but DETERMINISTIC, so joins and group-bys across datasets
    * pseudonymized with the same key still line up (the property plain
    * redaction destroys). A pure codegen projection: zero shuffle at
    * any corpus size; rotating the key re-keys the whole corpus in one
    * map pass. The key rides the plan as a literal — in production
    * inject it from a secret store, never a checked-in constant.
    */
  def pseudonymize(df: DataFrame, cols: Seq[String], key: String): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c,
        sha2(concat(lit(key), lit(":"), col(c).cast("string")), 256))
    }
}
