package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, the latest right row with
  * `rightTime <= leftTime` on the same key.
  *
  * Implemented as union + ordered window (last_value ignoreNulls) —
  * ONE shuffle on the key, no range-join pair explosion: the classic
  * scalable formulation. A naive `l JOIN r ON key AND rt <= lt` +
  * row_number builds |matches| intermediate rows (quadratic per key);
  * this builds |L| + |R|.
  */
object AsOf {

  /** @param left       probe side
    * @param right      build side (its columns are prefixed `asof_`)
    * @param keyCol     equality key present on both sides
    * @param timeCol    event-time column present on both sides
    * @param rightCols  right-side payload columns to carry
    * @param toleranceSeconds  if set, a match farther than this many
    *                   seconds from the left time (in the direction's
    *                   sense; absolute for `nearest`) is nulled out
    *                   (pandas `merge_asof(tolerance=...)` semantics) —
    *                   a stale quote is usually worse than no quote
    *
    * Tie semantics: among right rows with IDENTICAL (key, time) the
    * picked row is unspecified (the window's secondary order covers
    * only the side flag). Pre-aggregate duplicate-timestamp rows on
    * the right if the choice matters — at any timestamp granularity
    * worth as-of joining, exact duplicates are a data-quality signal.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               timeCol: String, rightCols: Seq[String],
               toleranceSeconds: Option[Long] = None,
               direction: String = "backward"): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"asofJoin: direction must be backward|forward|nearest, got $direction")
    val fwd = direction == "forward"
    val nearest = direction == "nearest"
    val leftCols = left.columns.toSeq
    // The right payload travels as ONE struct so last(ignoreNulls) picks
    // the whole latest right row atomically — filling columns
    // independently could mix fields from different right rows when the
    // latest row holds a NULL in one payload column (round-1 ADVICE).
    // The right event time rides along as __t for the tolerance check.
    // side ordering makes the equal-timestamp case match in BOTH
    // directions: backward (right sorts first, window looks back) and
    // forward (right sorts after, window looks ahead)
    val rSide = if (fwd) 1 else 0
    val r = right.select(
      col(keyCol), col(timeCol),
      struct((rightCols.map(col) :+ col(timeCol).as("__t")): _*).as("__r"))
      .withColumn("__side", lit(rSide))
      .withColumns(leftCols.filterNot(Seq(keyCol, timeCol).contains)
        .map(c => c -> lit(null)).toMap)
    val rStructType = r.schema("__r").dataType
    val l = left
      .withColumn("__side", lit(1 - rSide))
      .withColumn("__r", lit(null).cast(rStructType))
    val ordered = Seq(col("__side"), col("__r")) ++ leftCols.map(col)
    val unioned = l.select(ordered: _*).unionByName(r.select(ordered: _*))
    val wBase = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("__side"))
    // nearest (pandas merge_asof direction='nearest'): BOTH window
    // picks over the SAME sort (backward last + forward first — no
    // second shuffle or sort), then the smaller µs gap wins, ties to
    // backward. rSide=0 puts an equal-time right row in the backward
    // frame, where its zero gap always wins — so the forward frame
    // never needs to see it.
    val matched = if (nearest) {
      val wB = wBase.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wF = wBase.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val gapB = unix_micros(col(timeCol)) - unix_micros(col("__b.__t"))
      val gapF = unix_micros(col("__f.__t")) - unix_micros(col(timeCol))
      unioned
        .withColumn("__b", last(col("__r"), ignoreNulls = true).over(wB))
        .withColumn("__f", first(col("__r"), ignoreNulls = true).over(wF))
        .filter(col("__side") === (1 - rSide))
        .withColumn("__asof",
          when(col("__f").isNull ||
            (col("__b").isNotNull && gapB <= gapF), col("__b"))
            .otherwise(col("__f")))
    } else {
      val (w, pick) =
        if (fwd) (wBase.rowsBetween(Window.currentRow, Window.unboundedFollowing),
          first(col("__r"), ignoreNulls = true))
        else (wBase.rowsBetween(Window.unboundedPreceding, Window.currentRow),
          last(col("__r"), ignoreNulls = true))
      unioned
        .withColumn("__asof", pick.over(w))
        .filter(col("__side") === (1 - rSide))
    }
    // µs-exact staleness check — whole-second truncation would disagree
    // with a sub-second oracle at the boundary
    val keep = toleranceSeconds match {
      case None => lit(true)
      case Some(tol) =>
        val gap =
          if (nearest)
            abs(unix_micros(col(timeCol)) - unix_micros(col("__asof.__t")))
          else if (fwd)
            unix_micros(col("__asof.__t")) - unix_micros(col(timeCol))
          else unix_micros(col(timeCol)) - unix_micros(col("__asof.__t"))
        gap <= tol * 1000000L
    }
    matched.select((leftCols.map(col) ++
      rightCols.map(c =>
        when(keep, col(s"__asof.$c")).otherwise(lit(null))
          .as(s"asof_$c"))): _*)
  }
}
