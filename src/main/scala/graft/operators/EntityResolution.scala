package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage by blocking + edit distance (the Fellegi-Sunter
  * candidate-generation shape every dirty-catalog cleanup runs): match
  * each dirty entity string to its best canonical entity.
  *
  * Scale contract: resolution runs over the DISTINCT-NAME DOMAIN, not
  * the row stream — both sides are `distinct()`-ed before any join, so
  * candidate generation is bounded by vocabulary size (entities),
  * never by corpus row count. Callers with per-row payloads join the
  * result back on the name. Blocking uses TWO keys (prefix-k and
  * suffix-k) unioned: a single-character corruption can break one of
  * them but not both (for names longer than 2k), so recall on
  * distance-1 errors is total while each join stays equi-key — no
  * all-pairs comparison anywhere.
  */
object EntityResolution {

  /** Best canonical match per distinct dirty name:
    * `(dirty, match_name, dist)`. Ties on distance break to the
    * lexicographically smallest canonical name (deterministic, and
    * replayable by any engine that compares ASCII bytewise).
    *
    * `block` is the prefix/suffix key length; `maxDist` the edit
    * threshold — dirty names farther than `maxDist` from every
    * blocked candidate produce no row (unresolved entities).
    */
  def resolve(dirty: DataFrame, canonical: DataFrame, nameCol: String,
              block: Int = 3, maxDist: Int = 2): DataFrame = {
    val cand = blockedCandidates(dirty, canonical, nameCol, block)
    cand
      .withColumn("dist", levenshtein(col("dirty"), col("canon")))
      .filter(col("dist") <= maxDist)
      // min(struct) orders by (dist, canon) — one shuffle on the
      // dirty-name key picks the winner, no window over candidates
      .groupBy("dirty")
      .agg(min(struct(col("dist"), col("canon"))).as("_best"))
      .select(col("dirty"), col("_best.canon").as("match_name"),
        col("_best.dist").as("dist"))
  }

  /** The shared prefix/suffix blocking pass: distinct `(dirty, canon)`
    * candidates agreeing on either block key.
    */
  private def blockedCandidates(dirty: DataFrame, canonical: DataFrame,
                                nameCol: String, block: Int): DataFrame = {
    require(block >= 1, s"block key length: $block")
    def keyed(df: DataFrame, as: String) =
      df.select(col(nameCol).as(as)).distinct()
        .withColumn("_pre", substring(col(as), 1, block))
        .withColumn("_suf", substring(col(as), -block, block))
    val d = keyed(dirty, "dirty")
    val c = keyed(canonical, "canon")
    d.join(c, d("_pre") === c("_pre")).select("dirty", "canon")
      .union(d.join(c, d("_suf") === c("_suf")).select("dirty", "canon"))
      .distinct()
  }

  /** Jaro-Winkler similarity as a Column — the codegen'd
    * [[graft.plans.JaroWinklerSim]] kernel.
    */
  def jaroWinkler(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.plans.JaroWinklerSim(
        org.apache.spark.sql.GraftSqlBridge.expression(a),
        org.apache.spark.sql.GraftSqlBridge.expression(b)))

  /** [[resolve]] with Jaro-Winkler scoring instead of edit distance —
    * the linkage metric that forgives transpositions and rewards a
    * shared prefix. Same blocked candidate generation; best match per
    * dirty name = highest similarity, ties to the lexicographically
    * smallest canonical. Similarities are rounded to 9 decimals BEFORE
    * the threshold and the ordering so any engine computing the same
    * standard Jaro-Winkler reproduces selection bit-for-bit (double
    * last-bit noise cannot flip a comparison).
    */
  def resolveJaro(dirty: DataFrame, canonical: DataFrame, nameCol: String,
                  block: Int = 3, minSim: Double = 0.9): DataFrame =
    blockedCandidates(dirty, canonical, nameCol, block)
      .withColumn("sim", round(jaroWinkler(col("dirty"), col("canon")), 9))
      .filter(col("sim") >= minSim)
      .withColumn("_neg", -col("sim"))
      .groupBy("dirty")
      .agg(min(struct(col("_neg"), col("canon"))).as("_best"))
      .select(col("dirty"), col("_best.canon").as("match_name"),
        round(-col("_best._neg"), 6).as("sim"))
}
