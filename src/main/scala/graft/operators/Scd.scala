package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Slowly-changing-dimension (type 2) maintenance — the merge a
  * warehouse runs per ingest batch to version dimension attributes
  * without losing history (MERGE INTO ... WHEN MATCHED/NOT MATCHED, as
  * one declarative plan).
  *
  * Scale design: ONE full-outer shuffle join on the business key, then
  * a generator projection (each joined row explodes into its 1-2
  * output versions) — the dimension is never scanned twice and no
  * branch re-runs the join. At 100 TB-fact scale dimensions are the
  * small side anyway; the same plan serves snapshot-sized updates.
  */
object Scd {

  /** `dim`: current open rows `(key, attr, valid_from)`; `updates`:
    * this batch's `(key, attr)` — ONE ROW PER KEY. A CDC batch that
    * carries several changes to one key must be reduced to last-wins
    * first ([[lastWins]]); feeding duplicates here fans the full-outer
    * join out per duplicate and emits multiple open versions for the
    * key, breaking the one-current-row invariant. Returns the merged
    * dimension `(key, attr, valid_from, valid_to, is_current)`:
    *   - key absent from updates, or attr unchanged → open row kept;
    *   - attr changed → old row closed at `batchTs` + new open row;
    *   - new key → new open row starting at `batchTs`.
    */
  def merge2(dim: DataFrame, updates: DataFrame, batchTs: Long): DataFrame = {
    // explicit presence flags, NOT attr-null checks: a dimension (or
    // update) row may legitimately carry a NULL attribute, and the
    // change test is null-safe so NULL -> NULL is a no-op while
    // NULL -> 'X' closes + reopens
    val d = dim.select(col("key"), col("attr").as("old_attr"),
      col("valid_from"), lit(true).as("has_old"))
    val u = updates.select(col("key"), col("attr").as("new_attr"),
      lit(true).as("has_new"))
    val openNew = struct(col("new_attr").as("attr"),
      lit(batchTs).as("valid_from"),
      lit(null).cast(LongType).as("valid_to"), lit(true).as("is_current"))
    val keepOld = struct(col("old_attr").as("attr"), col("valid_from"),
      lit(null).cast(LongType).as("valid_to"), lit(true).as("is_current"))
    val closeOld = struct(col("old_attr").as("attr"), col("valid_from"),
      lit(batchTs).as("valid_to"), lit(false).as("is_current"))
    d.join(u, Seq("key"), "full_outer")
      .select(col("key"), explode(
        when(col("has_old").isNull, array(openNew)) // insert
          .when(col("has_new").isNull || col("new_attr") <=> col("old_attr"),
            array(keepOld)) // absent or unchanged (null-safe): no-op
          .otherwise(array(closeOld, openNew))) // change: close + reopen
        .as("r"))
      .select(col("key"), col("r.attr"), col("r.valid_from"),
        col("r.valid_to"), col("r.is_current"))
  }

  /** Reduce a CDC batch to one last-wins row per key — the required
    * pre-step before [[merge2]] when a batch can carry several changes
    * to the same key. `seqCol` orders the changes (change-log offset /
    * event time); ties break on the attribute for determinism.
    */
  def lastWins(updates: DataFrame, keyCol: String, attrCol: String,
               seqCol: String): DataFrame =
    updates.groupBy(col(keyCol).as("key"))
      .agg(max_by(struct(col(attrCol).as("attr")),
        struct(col(seqCol), col(attrCol))).as("w"))
      .select(col("key"), col("w.attr").as("attr"))
}
