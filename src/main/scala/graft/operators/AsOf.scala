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
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               timeCol: String, rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // side 0 sorts before side 1 at equal timestamps, so a right row at
    // exactly leftTime matches (ASOF >= semantics)
    val l = left
      .withColumn("__side", lit(1))
      .withColumns(rightCols.map(c => s"__r_$c" -> lit(null)).toMap)
    val r = right.select(
      (Seq(col(keyCol), col(timeCol)) ++ rightCols.map(c => col(c).as(s"__r_$c"))): _*)
      .withColumn("__side", lit(0))
      .withColumns(leftCols.filterNot(Seq(keyCol, timeCol).contains)
        .map(c => c -> lit(null)).toMap)
    val unioned = l.select(
      (Seq(col("__side")) ++ leftCols.map(col) ++ rightCols.map(c => col(s"__r_$c"))): _*)
      .unionByName(r.select(
        (Seq(col("__side")) ++ leftCols.map(col) ++ rightCols.map(c => col(s"__r_$c"))): _*))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select((leftCols.map(col) ++ rightCols.map(c => col(s"asof_$c"))): _*)
  }
}
