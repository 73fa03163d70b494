package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Generic (arbitrary Row schema, arbitrary aggregate) versions of the
  * retraction operators in [[Streams]] — the reference's
  * custom_trigger_group_by / outer_join / distinct nodes work over any
  * record shape (the execution/nodes package), so these do too.
  *
  * Execution shape: per-key state via `flatMapGroupsWithState` — the
  * state lives in Spark's distributed state store partitioned by key
  * (scales with executors, not driver memory). Keys ride along as a
  * canonical JSON string for grouping while the original typed columns
  * stay in the emitted rows; aggregate accumulators are opaque
  * kryo-encoded state (the store holds bytes either way).
  */
object RowStreams {

  /** An incrementally-updatable aggregate over rows — the reference's
    * aggregate interface (the aggregates package): a running
    * accumulator plus a result extraction. Retractions re-fire
    * `result` downstream.
    */
  trait RowAgg extends Serializable {
    def name: String
    def dataType: DataType
    def zero: Any
    def update(acc: Any, row: Row): Any
    def result(acc: Any): Any
  }

  case class CountAgg(name: String = "count") extends RowAgg {
    val dataType: DataType = LongType
    def zero: Any = 0L
    def update(acc: Any, row: Row): Any = acc.asInstanceOf[Long] + 1L
    def result(acc: Any): Any = acc
  }

  case class SumLongAgg(colName: String, name: String) extends RowAgg {
    val dataType: DataType = LongType
    def zero: Any = 0L
    def update(acc: Any, row: Row): Any = {
      val i = row.fieldIndex(colName)
      if (row.isNullAt(i)) acc
      else acc.asInstanceOf[Long] + row.getAs[Number](i).longValue()
    }
    def result(acc: Any): Any = acc
  }

  case class MaxLongAgg(colName: String, name: String) extends RowAgg {
    val dataType: DataType = LongType
    def zero: Any = null
    def update(acc: Any, row: Row): Any = {
      val i = row.fieldIndex(colName)
      if (row.isNullAt(i)) acc
      else {
        val v = row.getAs[Number](i).longValue()
        if (acc == null) v else math.max(acc.asInstanceOf[Long], v)
      }
    }
    def result(acc: Any): Any = acc
  }

  /** Int-truncating average, the reference's Int/Int avg quirk
    * (aggregates/average.go).
    */
  case class AvgIntAgg(colName: String, name: String) extends RowAgg {
    val dataType: DataType = LongType
    def zero: Any = (0L, 0L)
    def update(acc: Any, row: Row): Any = {
      val (s, n) = acc.asInstanceOf[(Long, Long)]
      val i = row.fieldIndex(colName)
      if (row.isNullAt(i)) acc else (s + row.getAs[Number](i).longValue(), n + 1)
    }
    def result(acc: Any): Any = {
      val (s, n) = acc.asInstanceOf[(Long, Long)]
      if (n == 0) null else s / n
    }
  }

  case class TriggerState(count: Long, accs: Array[Any],
                                  lastEmitted: Option[Array[Any]])

  /** `TRIGGER COUNTING n` group-by over arbitrary key columns and
    * aggregates: every n-th record of a key re-fires the aggregate row,
    * retracting the previously emitted one first. Output schema:
    * key columns ++ aggregate columns ++ `retraction`.
    */
  def countingTriggerAgg(df: DataFrame, keyCols: Seq[String], n: Int,
                         aggs: Seq[RowAgg]): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val keyFields = keyCols.map(c => inSchema(c))
    val outSchema = StructType(
      keyFields ++ aggs.map(a => StructField(a.name, a.dataType)) :+
        StructField("retraction", BooleanType, nullable = false))
    val keyed = df.withColumn("__k", to_json(struct(keyCols.map(col): _*)))
    implicit val stateEnc = Encoders.kryo[TriggerState]
    implicit val rowEnc = Encoders.row(outSchema)
    val kIdx = keyed.schema.fieldIndex("__k")
    val keyIdxs = keyCols.map(inSchema.fieldIndex)
    keyed.as(Encoders.row(keyed.schema))
      .groupByKey((r: Row) => r.getString(kIdx))(Encoders.STRING)
      .flatMapGroupsWithState[TriggerState, Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Row], state: GroupState[TriggerState]) =>
          var st = state.getOption.getOrElse(
            TriggerState(0L, aggs.map(_.zero).toArray, None))
          var keyVals: Array[Any] = null
          val out = scala.collection.mutable.ArrayBuffer.empty[Row]
          rows.foreach { r =>
            if (keyVals == null) keyVals = keyIdxs.map(r.get).toArray
            val accs = st.accs.zip(aggs).map { case (a, agg) => agg.update(a, r) }
            st = TriggerState(st.count + 1, accs, st.lastEmitted)
            if (st.count % n == 0) {
              st.lastEmitted.foreach { prev =>
                out += Row.fromSeq(keyVals.toSeq ++ prev.toSeq :+ true)
              }
              val vals = aggs.zip(accs).map { case (agg, a) => agg.result(a) }
              out += Row.fromSeq(keyVals.toSeq ++ vals :+ false)
              st = st.copy(lastEmitted = Some(vals.toArray))
            }
          }
          state.update(st)
          out.iterator
      }.toDF(outSchema.fieldNames: _*)
  }

  case class RowJoinState(lefts: List[Seq[Any]], rights: List[Seq[Any]])

  /** FULL OUTER streaming join with retraction semantics over arbitrary
    * row schemas (execution/nodes/outer_join.go:33-459): one-sided rows
    * emit null-padded immediately; the first row of the other side
    * retracts those paddings and emits the real joins. Output schema:
    * left columns ++ right columns ++ `retraction` (join key columns
    * appear once, from whichever side is present).
    */
  def outerJoinRows(left: DataFrame, right: DataFrame,
                    keyCols: Seq[String]): DataFrame = {
    // non-key column names must be disjoint: the internal wide union
    // carries both sides by name (qualify/rename on the caller side,
    // like the reference's requalifier)
    val clash = left.columns.toSet.intersect(right.columns.toSet) -- keyCols
    require(clash.isEmpty,
      s"outerJoinRows: non-key columns present on both sides: ${clash.mkString(", ")}; " +
        "rename one side first (the reference qualifies with relation aliases)")
    val lSchema = left.schema
    val rSchema = right.schema
    val lPayload = lSchema.fields.toSeq
    val rPayload = rSchema.fields.toSeq.filterNot(f => keyCols.contains(f.name))
    val outSchema = StructType(
      (lPayload.map(f => f.copy(nullable = true)) ++
        rPayload.map(f => f.copy(nullable = true))) :+
        StructField("retraction", BooleanType, nullable = false))
    val keyIdxL = keyCols.map(lSchema.fieldIndex)

    val lTagged = left.withColumn("__side", lit(0))
      .withColumn("__k", to_json(struct(keyCols.map(col): _*)))
    val rTagged = right.withColumn("__side", lit(1))
      .withColumn("__k", to_json(struct(keyCols.map(col): _*)))
    // union on a common wide schema: left fields ++ right payload fields
    val wide = lTagged
      .withColumns(rPayload.map(f => f.name -> lit(null).cast(f.dataType)).toMap)
      .select((lSchema.fieldNames.toSeq ++ rPayload.map(_.name) ++ Seq("__side", "__k")).map(col): _*)
      .unionByName(
        rTagged.withColumns(
          lSchema.fieldNames.toSeq.filterNot(keyCols.contains)
            .map(c => c -> lit(null).cast(lSchema(c).dataType)).toMap)
          .select((lSchema.fieldNames.toSeq ++ rPayload.map(_.name) ++ Seq("__side", "__k")).map(col): _*))
    val wideSchema = wide.schema
    val sideIdx = wideSchema.fieldIndex("__side")
    val kIdx = wideSchema.fieldIndex("__k")
    val lIdxs = lSchema.fieldNames.toSeq.map(wideSchema.fieldIndex)
    val rIdxs = rPayload.map(f => wideSchema.fieldIndex(f.name))

    implicit val stateEnc = Encoders.kryo[RowJoinState]
    implicit val rowEnc = Encoders.row(outSchema)
    wide.as(Encoders.row(wideSchema))
      .groupByKey((r: Row) => r.getString(kIdx))(Encoders.STRING)
      .flatMapGroupsWithState[RowJoinState, Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Row], state: GroupState[RowJoinState]) =>
          var st = state.getOption.getOrElse(RowJoinState(Nil, Nil))
          val out = scala.collection.mutable.ArrayBuffer.empty[Row]
          val nL = lIdxs.length
          def emit(l: Option[Seq[Any]], r: Option[Seq[Any]], retraction: Boolean,
                   keyFromRight: Option[Seq[Any]]): Unit = {
            val lVals = l.getOrElse {
              // null-padded left: key columns still carried from right
              val base = Array.fill[Any](nL)(null)
              keyFromRight.foreach { rv =>
                keyIdxL.zipWithIndex.foreach { case (li, ki) => base(li) = rv(ki) }
              }
              base.toSeq
            }
            out += Row.fromSeq(lVals ++ r.getOrElse(Seq.fill[Any](rIdxs.length)(null)) :+ retraction)
          }
          rows.foreach { row =>
            val side = row.getInt(sideIdx)
            if (side == 0) {
              val lv = lIdxs.map(row.get)
              if (st.rights.isEmpty) emit(Some(lv), None, retraction = false, None)
              else st.rights.reverse.foreach(rv =>
                emit(Some(lv), Some(rv.drop(keyCols.length)), retraction = false, None))
              if (st.lefts.isEmpty && st.rights.nonEmpty)
                st.rights.reverse.foreach(rv =>
                  emit(None, Some(rv.drop(keyCols.length)), retraction = true,
                    Some(rv.take(keyCols.length))))
              st = st.copy(lefts = lv :: st.lefts)
            } else {
              // right rows carry their key in the left-named key slots
              // (unionByName aligned them); payload in the right slots
              val rv = keyIdxL.map(row.get) ++ rIdxs.map(row.get)
              val rPay = rv.drop(keyCols.length)
              if (st.lefts.isEmpty)
                emit(None, Some(rPay), retraction = false, Some(rv.take(keyCols.length)))
              else st.lefts.reverse.foreach(lv =>
                emit(Some(lv), Some(rPay), retraction = false, None))
              if (st.rights.isEmpty && st.lefts.nonEmpty)
                st.lefts.reverse.foreach(lv =>
                  emit(Some(lv), None, retraction = true, None))
              st = st.copy(rights = rv :: st.rights)
            }
          }
          state.update(st)
          out.iterator
      }.toDF(outSchema.fieldNames: _*)
  }

  case class MultisetState(count: Long)

  /** Retraction-aware streaming DISTINCT over whole rows of any schema
    * (execution/nodes/distinct.go:26-76): emit on 0→1, retract on 1→0.
    * Input carries a `retraction` column; output replaces it with the
    * operator's own emission bit.
    */
  def distinctRows(df: DataFrame, retractionCol: String = "retraction"): DataFrame = {
    val valueCols = df.schema.fieldNames.toSeq.filterNot(_ == retractionCol)
    val outSchema = StructType(
      valueCols.map(c => df.schema(c)) :+
        StructField("retraction", BooleanType, nullable = false))
    val keyed = df.withColumn("__k", to_json(struct(valueCols.map(col): _*)))
    val kIdx = keyed.schema.fieldIndex("__k")
    val retIdx = keyed.schema.fieldIndex(retractionCol)
    val valIdxs = valueCols.map(keyed.schema.fieldIndex)
    implicit val stateEnc = Encoders.kryo[MultisetState]
    implicit val rowEnc = Encoders.row(outSchema)
    keyed.as(Encoders.row(keyed.schema))
      .groupByKey((r: Row) => r.getString(kIdx))(Encoders.STRING)
      .flatMapGroupsWithState[MultisetState, Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Row], state: GroupState[MultisetState]) =>
          var c = state.getOption.map(_.count).getOrElse(0L)
          val out = scala.collection.mutable.ArrayBuffer.empty[Row]
          rows.foreach { r =>
            val next = c + (if (r.getBoolean(retIdx)) -1L else 1L)
            val vals = valIdxs.map(r.get)
            if (c == 0L && next == 1L) out += Row.fromSeq(vals :+ false)
            if (c == 1L && next == 0L) out += Row.fromSeq(vals :+ true)
            c = math.max(next, 0L)
          }
          state.update(MultisetState(c))
          out.iterator
      }.toDF(outSchema.fieldNames: _*)
  }
}
