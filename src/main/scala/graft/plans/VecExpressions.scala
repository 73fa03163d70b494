package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dot product over two numeric array columns.
  *
  * The built-in route (`aggregate(zip_with(a, b, _*_), 0d, _+_)`) walks
  * higher-order-function lambdas per element — interpreted, boxing,
  * allocating an intermediate array per row. On an all-pairs similarity
  * join that's 3 HOF evaluations × 64 elements × O(n²) rows and
  * dominates the runtime. This expression compiles to a tight primitive
  * loop inside whole-stage codegen (~100× less overhead), which is the
  * difference between "works at sf0.01" and "works on 100 TB".
  *
  * Accumulation is sequential left-to-right in double, matching both
  * the HOF fold and DuckDB's list_cosine_similarity — bit-identical
  * results, so oracle parity is preserved.
  *
  * Null handling: null array → null result; null *elements* are read as
  * 0.0 (embeddings never carry null elements; documented contract).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements() < $b.numElements()
         |    ? $a.numElements() : $b.numElements();
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += (double)$a.$lGet($i) * (double)$b.$rGet($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Top-m nearest-centroid cell ids for a vector column, with the
  * centroid matrix carried as ONE plan reference object instead of
  * nlist×dim literal expression nodes.
  *
  * Why: building `array(struct(dot(vec, array(lit,...)), ...))` per
  * centroid puts O(nlist×dim) literal NODES in the plan, re-analyzed and
  * interpreted per row — invisible at nlist=16, an analysis-time and
  * plan-size killer at production nlist (thousands). Here the matrix is
  * a single `addReferenceObj` (compact double[][] shipped once per task
  * via the codegen references array), and scoring is a primitive loop
  * inside whole-stage codegen, like [[VecDot]].
  *
  * Centroids must be L2-normalized by the caller: cosine argmax over
  * normalized centroids equals dot argmax (the query's own norm scales
  * all scores equally), so no norms are needed per row. Cell ids are the
  * centroid row indices 0..nlist-1; ties break toward the lower index.
  */
case class VecTopCells(child: Expression, centroids: Array[Array[Double]], m: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private val take = math.min(m, centroids.length)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_top_cells expects array<float|double>, got $other")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val fl = isFloat
    val nC = centroids.length
    val scores = new Array[Double](nC)
    var c = 0
    while (c < nC) {
      val row = centroids(c)
      val n = math.min(row.length, v.numElements())
      var s = 0.0
      var i = 0
      while (i < n) {
        s += row(i) * (if (fl) v.getFloat(i).toDouble else v.getDouble(i))
        i += 1
      }
      scores(c) = s
      c += 1
    }
    val out = new Array[Int](take)
    val used = new Array[Boolean](nC)
    var r = 0
    while (r < take) {
      var best = -1
      var bs = Double.NegativeInfinity
      var j = 0
      while (j < nC) {
        if (!used(j) && scores(j) > bs) { bs = scores(j); best = j }
        j += 1
      }
      if (best < 0) {
        // all remaining scores NaN (bad vector component): degrade to
        // the lowest unused index rather than crash the task
        var k = 0
        while (best < 0 && k < nC) { if (!used(k)) best = k; k += 1 }
      }
      used(best) = true
      out(r) = best
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val scores = ctx.freshName("scores")
      val used = ctx.freshName("used")
      val out = ctx.freshName("out")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val r = ctx.freshName("r")
      val best = ctx.freshName("best")
      val bs = ctx.freshName("bs")
      s"""
         |double[] $scores = new double[$mat.length];
         |for (int $c = 0; $c < $mat.length; $c++) {
         |  double[] row = $mat[$c];
         |  int n = row.length < $v.numElements() ? row.length : $v.numElements();
         |  double s = 0.0;
         |  for (int $i = 0; $i < n; $i++) s += row[$i] * (double)$v.$get($i);
         |  $scores[$c] = s;
         |}
         |int[] $out = new int[$take];
         |boolean[] $used = new boolean[$mat.length];
         |for (int $r = 0; $r < $take; $r++) {
         |  int $best = -1; double $bs = Double.NEGATIVE_INFINITY;
         |  for (int $c = 0; $c < $mat.length; $c++) {
         |    if (!$used[$c] && $scores[$c] > $bs) { $bs = $scores[$c]; $best = $c; }
         |  }
         |  if ($best < 0) { // all remaining NaN: degrade, don't crash
         |    for (int $c = 0; $best < 0 && $c < $mat.length; $c++) {
         |      if (!$used[$c]) $best = $c;
         |    }
         |  }
         |  $used[$best] = true; $out[$r] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecTopCells =
    copy(child = newChild)
}

/** Nearest-centroid cell id by squared L2 distance — the k-means
  * assignment kernel. Same plan-shape discipline as [[VecTopCells]]:
  * the centroid matrix is ONE `addReferenceObj` (a compact double[][]
  * shipped once per task), never O(k×dim) literal expression nodes, and
  * the distance loop is primitive arithmetic inside whole-stage codegen.
  * Assignment therefore shuffles nothing: each Lloyd iteration is one
  * map-side pass plus the small (k×dim)-row mean aggregation.
  *
  * Distance is the left-to-right fold of (v_i − c_i)² in dimension
  * order, and ties break toward the lower cell index — bit-for-bit the
  * contract of the DuckDB oracle's `list_reduce` fold with
  * `ORDER BY dist, cell`, so assignments hash-compare exactly.
  * All-NaN distances (bad vector) degrade to cell 0 rather than crash.
  */
case class VecNearestCell(child: Expression, centroids: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_nearest_cell expects array<float|double>, got $other")
    }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val fl = isFloat
    var best = -1
    var bd = Double.PositiveInfinity
    var c = 0
    while (c < centroids.length) {
      val row = centroids(c)
      val n = math.min(row.length, v.numElements())
      var s = 0.0
      var i = 0
      while (i < n) {
        val diff = (if (fl) v.getFloat(i).toDouble else v.getDouble(i)) - row(i)
        s += diff * diff
        i += 1
      }
      if (s < bd) { bd = s; best = c }
      c += 1
    }
    if (best < 0) 0 else best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val best = ctx.freshName("best")
      val bd = ctx.freshName("bd")
      s"""
         |int $best = -1; double $bd = Double.POSITIVE_INFINITY;
         |for (int $c = 0; $c < $mat.length; $c++) {
         |  double[] row = $mat[$c];
         |  int n = row.length < $v.numElements() ? row.length : $v.numElements();
         |  double s = 0.0;
         |  for (int $i = 0; $i < n; $i++) {
         |    double diff = (double)$v.$get($i) - row[$i];
         |    s += diff * diff;
         |  }
         |  if (s < $bd) { $bd = s; $best = $c; }
         |}
         |${ev.value} = $best < 0 ? 0 : $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecNearestCell =
    copy(child = newChild)
}

/** All `tables` sign-LSH bucket ids of a vector in ONE pass — replaces
  * a tables×bits forest of `when(vec_dot(v, array(<dim literals>)) >=
  * 0, …)` nodes whose size defeats whole-stage codegen (measured: the
  * interpreted forest costs ~0.5 ms/row; this kernel is plain loops
  * over a constant `double[][][]` shipped once per task via
  * `addReferenceObj`, like [[VecTopCells]]' centroid matrix).
  * bucket[t] = OR over i of (dot(v, planes(t)(i)) >= 0 ? 1L << i : 0),
  * bit-identical to the expression-tree form it replaces.
  */
case class VecLshBuckets(child: Expression, planes: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) if planes.nonEmpty =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_lsh_buckets expects array<float|double> and >=1 table, got $other")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val fl = isFloat
    val out = new Array[Long](planes.length)
    var t = 0
    while (t < planes.length) {
      val tbl = planes(t)
      var bucket = 0L
      var b = 0
      while (b < tbl.length) {
        val row = tbl(b)
        val n = math.min(row.length, v.numElements())
        var s = 0.0
        var i = 0
        while (i < n) {
          s += row(i) * (if (fl) v.getFloat(i).toDouble else v.getDouble(i))
          i += 1
        }
        if (s >= 0) bucket |= 1L << b
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("planes", planes, "double[][][]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val bucket = ctx.freshName("bucket")
      s"""
         |long[] $out = new long[$mat.length];
         |for (int $t = 0; $t < $mat.length; $t++) {
         |  long $bucket = 0L;
         |  for (int $b = 0; $b < $mat[$t].length; $b++) {
         |    double[] row = $mat[$t][$b];
         |    int $n = row.length < $v.numElements() ? row.length : $v.numElements();
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) $s += row[$i] * (double)$v.$get($i);
         |    if ($s >= 0) $bucket |= 1L << $b;
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecLshBuckets =
    copy(child = newChild)
}

/** Johnson-Lindenstrauss random projection to `outDim` dimensions with a
  * deterministic ±1 sign matrix generated ARITHMETICALLY from (i, j) —
  * no carried matrix at all: `sign(i,j) = bit31((i·2654435761 +
  * j·2246822519) mod 2³²) == 0 ? +1 : −1` with 1-based indices, output
  * scaled by 1/√outDim. The same formula is replayable in any engine
  * (the DuckDB oracle uses an indexed list lambda), which is what makes
  * a *random* projection oracle-checkable: the "randomness" is a fixed
  * universal-hash sign pattern, as in feature hashing.
  *
  * Scale shape: a pure codegen'd projection — dimension reduction of a
  * 100 TB embedding corpus is one map pass with zero shuffle, zero
  * driver state, zero plan growth (contrast: a literal matrix would add
  * O(outDim×dim) plan nodes; even a reference object must ship with the
  * task binary). Accumulation is sequential in i per output j, matching
  * the oracle's list fold bit-for-bit.
  */
case class VecRandomProject(child: Expression, outDim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) if outDim > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_random_project expects array<float|double> and outDim > 0, got $other / $outDim")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val fl = isFloat
    val n = v.numElements()
    val scale = math.sqrt(outDim.toDouble)
    val out = new Array[Double](outDim)
    var j = 1
    while (j <= outDim) {
      var s = 0.0
      var i = 1
      while (i <= n) {
        val h = (i * 2654435761L + j * 2246822519L) & 0xFFFFFFFFL
        val sign = if ((h >>> 31) == 0L) 1.0 else -1.0
        val x = if (fl) v.getFloat(i - 1).toDouble else v.getDouble(i - 1)
        s += x * sign
        i += 1
      }
      out(j - 1) = s / scale
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      // every local must be ctx.freshName'd: a fixed name collides when
      // two VecRandomProject calls land in one codegen'd projection
      // (duplicate declaration -> janino failure -> silent interpreted
      // fallback)
      val scale = ctx.freshName("scale")
      s"""
         |double[] $out = new double[$outDim];
         |double $scale = Math.sqrt((double)$outDim);
         |for (int $j = 1; $j <= $outDim; $j++) {
         |  double $s = 0.0;
         |  for (int $i = 1; $i <= $v.numElements(); $i++) {
         |    long $h = ($i * 2654435761L + $j * 2246822519L) & 0xFFFFFFFFL;
         |    $s += (double)$v.$get($i - 1) * (($h >>> 31) == 0L ? 1.0 : -1.0);
         |  }
         |  $out[$j - 1] = $s / $scale;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecRandomProject =
    copy(child = newChild)
}

object VecExpressions {
  /** Register `vec_dot` in the session's function registry (idempotent)
    * so it's callable via `call_function` / SQL.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs(0), exprs(1)), "built-in")
}
