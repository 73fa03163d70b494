package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketches with SET OPERATIONS
  * (Bar-Yossef et al. 2002; Beyer et al., SIGMOD 2007 — the "distinct
  * sampling" / bottom-k family behind Theta sketches).
  *
  * A KMV sketch of a key set is its k smallest hash values. The k-th
  * minimum h_k estimates cardinality as (k-1) · M / h_k (hashes
  * uniform on [0, M)); with fewer than k distinct keys the sketch IS
  * the set and the count is exact. Unlike HLL, bottom-k sketches
  * compose under set algebra: the union sketch is the k smallest of
  * the merged sketches, and the fraction of union-sketch members
  * present in both sides estimates Jaccard — giving intersection
  * cardinality, which HLL cannot provide without inclusion-exclusion
  * error blowup.
  *
  * Everything is driven by the portable integer hash
  * ([[Sampling.hashKey]]), so sketches — not just estimates — replay
  * bit-for-bit in any engine: the DuckDB oracle reproduces h_k
  * exactly. Scale shape: one distinct-hash aggregate, one
  * per-group top-k window over ≤ k·groups rows; no global sort.
  */
object Sketches {

  /** Per-group KMV sketch summary: `(group, n_kept, kth_min, est)`.
    * `est` is rounded to 4 decimals (double division is the only
    * floating step; both engines divide the same integers).
    */
  def kmvEstimate(df: DataFrame, keyCol: String, groupCol: String,
                  k: Int, salts: Int = 32): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2: $k")
    val hashes = df
      .select(col(groupCol).as("grp"), Sampling.hashKey(col(keyCol)).as("h"))
      .distinct()
    // two-phase top-k: a single per-group window would sort a group's
    // ENTIRE distinct-key set in one task (groups are few and huge at
    // corpus scale). Phase 1 takes the k smallest per (group, salt) —
    // every task bounded by the group's 1/salts share; phase 2 takes
    // the k smallest of those ≤ salts·k survivors. The result set is
    // identical (the global k minima survive their salt's cut), so
    // the oracle needs no salt awareness.
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy("grp", "salt").orderBy("h")
    val phase1 = hashes
      .withColumn("salt", pmod(col("h"), lit(salts.toLong)))
      .withColumn("rn", row_number().over(w1))
      .filter(col("rn") <= k)
      .select("grp", "h")
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("h")
    val sk = phase1
      .withColumn("rn", row_number().over(w2))
      .filter(col("rn") <= k)
      .groupBy("grp")
      .agg(count(lit(1)).as("n_kept"), max("h").as("kth_min"))
    sk.select(col("grp").as(groupCol), col("n_kept"), col("kth_min"),
      round(when(col("n_kept") < k, col("n_kept").cast("double"))
        .otherwise(lit((k - 1).toDouble) * 4294967296.0
          / col("kth_min").cast("double")), 4).as("est"))
  }

  /** CMS cell index for key `k` under hash row `j`: portable integer
    * arithmetic (odd multiplier for every j — see cmsHeavyHitters),
    * shared by the batch heavy-hitter query and the streaming
    * windowed-sketch runner so both replay in any engine.
    */
  def cmsCell(k: Column, j: Column, width: Int): Column =
    pmod(k * (lit(2654435761L) + j * 81006L), lit(4294967296L)) % width

  /** Count-min sketch heavy hitters (Cormode & Muthukrishnan 2005).
    * The sketch is a depth×width counter matrix: row j counts keys
    * under hash_j, and est(x) = min_j counter[j][h_j(x)] ≥ true(x)
    * always (collisions only ADD). Building it is ONE map-side-
    * combinable aggregate whose state is depth·width cells — constant
    * regardless of key cardinality. That is the 100 TB story: exact
    * per-key counts shuffle every distinct key; the sketch shuffles
    * ≤ partitions·depth·width partial cells, then point-estimates any
    * candidate set by a broadcast-sized join against the matrix.
    *
    * Hashes are the portable Knuth-multiplicative family
    * ([[Sampling.hashKey]] with a per-row odd multiplier), integer-
    * only and engine-replayable, so the DuckDB oracle reproduces every
    * cell and every estimate bit-for-bit. The row step 81006 = 2·40503
    * is EVEN, so odd + even·j stays odd for every row — an odd step
    * makes rows 1 and 3 even (odd+odd), collapsing them onto 1/8 and
    * 1/2 of the cells (review-measured: 32 and 128 of 256).
    *
    * Returns the `topK` candidates by estimate (TakeOrdered, no global
    * sort): `(key, est, exact)` — `exact` is the in-query oracle of
    * sketch quality (est ≥ exact must hold on every row; the spec
    * asserts it).
    */
  def cmsHeavyHitters(df: DataFrame, keyCol: String, depth: Int = 4,
                      width: Int = 256, topK: Int = 10): DataFrame = {
    require(depth >= 1 && width >= 2 && topK >= 1)
    val rows = df.select(col(keyCol).cast("long").as("k"))
    def hj = cmsCell(col("k"), col("j"), width)
    // matrix: depth copies of the input -> (j, cell) counts. The
    // explode multiplies rows BEFORE the aggregate, but partial
    // aggregation collapses each task to <= depth*width cells, so the
    // exchange is constant-size.
    val cells = rows
      .select(col("k"), explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .select(col("j"), hj.as("c"))
      .groupBy("j", "c").agg(count(lit(1)).as("n"))
    val exact = rows.groupBy("k").agg(count(lit(1)).as("exact"))
    val est = exact
      .select(col("k"), col("exact"),
        explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .select(col("k"), col("exact"), col("j"), hj.as("c"))
      .join(cells, Seq("j", "c"))
      .groupBy("k", "exact").agg(min(col("n")).as("est"))
    est.select(col("k").as(keyCol), col("est"), col("exact"))
      .orderBy(col("est").desc, col(keyCol)).limit(topK)
  }

  /** KMV set algebra between two key sets A and B: the union sketch
    * (k smallest of A's and B's sketches merged), Jaccard from the
    * both-sides fraction, and the intersection estimate
    * J · est(A ∪ B). Returns one row:
    * `(n_union_kept, union_kth_min, union_est, n_both, jaccard, intersection_est)`.
    */
  def kmvIntersect(a: DataFrame, b: DataFrame, keyCol: String,
                   k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2: $k")
    // k smallest = ORDER BY + LIMIT: TakeOrderedAndProject (per-
    // partition heaps), never a global window/sort — the q9 discipline,
    // and what keeps this under AuditPlans' unpartitioned-window gate
    def sketch(df: DataFrame): DataFrame =
      df.select(Sampling.hashKey(col(keyCol)).as("h")).distinct()
        .orderBy("h").limit(k)
    val merged = sketch(a).unionByName(sketch(b))
      .groupBy("h")
      .agg((count(lit(1)) === 2).as("both"))
    val u = merged.orderBy("h").limit(k)
    u.agg(count(lit(1)).as("n_union_kept"), max("h").as("union_kth_min"),
        sum(when(col("both"), 1L).otherwise(0L)).as("n_both"))
      .select(col("n_union_kept"), col("union_kth_min"), col("n_both"),
        round(when(col("n_union_kept") < k, col("n_union_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) * 4294967296.0
            / col("union_kth_min").cast("double")), 4).as("union_est"))
      .select(col("n_union_kept"), col("union_kth_min"), col("n_both"),
        col("union_est"),
        round(col("n_both").cast("double")
          / col("n_union_kept").cast("double"), 6).as("jaccard"),
        round(col("n_both").cast("double") / col("n_union_kept").cast("double")
          * col("union_est"), 4).as("intersection_est"))
  }
}
