package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (broadcast the query set, scan the
  * corpus once — the right plan when queries ≪ corpus, which is the ANN
  * serving shape). Scale path: LSH bucketing via random hyperplanes cuts
  * the scanned fraction; recall is tunable with tables × bits.
  *
  * All math is `zip_with`/`aggregate` over array columns — codegen'd
  * Catalyst expressions, double precision, no UDFs.
  */
object Similarity {

  /** Dot product of two array<numeric> columns, accumulated in double,
    * sequential left-to-right (deterministic).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each row of `queries`, the k nearest
    * corpus rows (excluding identical ids), deterministic tie-break on
    * neighbor id. `queries` is broadcast — the corpus is scanned exactly
    * once regardless of k.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Deterministic random hyperplanes: `bits` planes of dimension `dim`,
    * components from a seeded PRNG (driver-side constant, shipped as a
    * literal — tiny).
    */
  def hyperplanes(dim: Int, bits: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits, dim)(rnd.nextGaussian())
  }

  /** Sign-bit LSH bucket id for a vector column under `planes`. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      when(dot(vec, planeLit) >= 0, shiftleft(lit(1L), i)).otherwise(0L)
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** LSH-bucketed ANN: both sides hashed into sign-pattern buckets, the
    * join only compares vectors in the same bucket. Trades recall for a
    * ~2^bits reduction in compared pairs; increase recall by repeating
    * with several seeds (multi-table LSH) and unioning.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              bits: Int = 8, dim: Int = 64, tables: Int = 2,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val perTable = (0 until tables).map { t =>
      val planes = hyperplanes(dim, bits, seed = 42L + t)
      val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
        .withColumn("bucket", lshBucket(col("qv"), planes))
      val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
        .withColumn("bucket", lshBucket(col("cv"), planes))
      c.join(broadcast(q), "bucket")
        .filter(col("neighbor_id") =!= col("query_id"))
        .select("query_id", "neighbor_id", "qv", "cv")
    }
    val cands = perTable.reduce(_ union _).distinct()
    val scored = cands.withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** All pairs (a < b) with cosine ≥ threshold — embedding near-dup
    * detection. Brute self-join here; swap candidate generation to
    * `lshTopK`-style bucketing at scale.
    */
  def cosinePairs(df: DataFrame, threshold: Double,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
