package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph authority scoring — the web-pipeline signal behind
  * domain-level quality weighting (CommonCrawl-style host ranks feed
  * crawl prioritization and training-data source weights).
  *
  * Scale design: the iteration state is one (vertex, rank) table; each
  * round is exactly one shuffle (edges ⋈ ranks on src, then a hash
  * aggregate keyed by dst) — the same bounded-round discipline as
  * [[Dedup.connectedComponents]]. Edges and degrees are eagerly
  * `localCheckpoint`ed (reused every round); each round's iteration
  * state is LAZILY checkpointed — plans stay constant-size (round N
  * roots at round N−1's checkpoint) while materialization happens once
  * in the consumer's job, not as a scheduled job per round. Driver
  * traffic is one Long (the vertex count).
  *
  * Numeric design: ranks are fixed-point BIGINTs (`scale` = 1e12), all
  * updates integer multiply/divide — associative, order-independent,
  * bit-identical across partitionings AND engines, so a DuckDB oracle
  * replays rounds exactly without any float-rounding treaty. Dangling
  * mass (vertices with no out-links) is dropped, not redistributed —
  * the common simplified PageRank; ranks then sum to ≤ `scale`.
  */
object Graph {

  /** `edges` must have string columns `srcCol`, `dstCol`; parallel
    * edges are collapsed (classic host-graph PageRank counts a link
    * once). Returns `(host, rank)` with rank in fixed-point units of
    * 1/`scale` after `iters` damped rounds from a uniform start.
    */
  def pageRank(edges: DataFrame, iters: Int = 3, dampingPct: Int = 85,
               scale: Long = 1000000000000L,
               srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iters >= 1 && dampingPct > 0 && dampingPct < 100)
    val e = Materialize.eager(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct())
    val verts = Materialize.eager(e.select(col("src").as("host"))
      .union(e.select(col("dst").as("host")))
      .distinct())
    val outdeg = Materialize.eager(
      e.groupBy("src").agg(count(lit(1)).as("outdeg")))
    val nV = verts.count() // the one driver scalar (bounded: one Long)
    require(nV > 0, "pageRank: the edge list is empty (no vertices)")
    val teleport = scale * (100L - dampingPct) / 100L / nV

    // LAZY checkpoints on the iteration state (here and in every
    // fixed-round loop below): no round has a driver action, so the
    // final consumer's one job materializes the whole cascade — plans
    // stay constant-size (each round's plan roots at the previous
    // round's checkpoint) while the per-round eager-materialization
    // jobs disappear (the t9/CC job-scheduling-floor discipline).
    var ranks = verts.select(col("host"), lit(scale / nV).as("rank"))
      .localCheckpoint(false)
    for (_ <- 1 to iters) {
      // contribution of src to each out-neighbor: rank div outdeg (exact)
      val contrib = e.join(ranks, e("src") === ranks("host"))
        .join(outdeg, "src")
        .select(col("dst"), expr("rank div outdeg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("in_mass"))
      ranks = verts.join(contrib, verts("host") === contrib("dst"), "left")
        .select(col("host"),
          (lit(teleport) +
            expr(s"(${dampingPct}L * coalesce(in_mass, 0L)) div 100L"))
            .as("rank"))
        .localCheckpoint(false)
    }
    ranks
  }

  /** Per-vertex triangle counts via degree-ordered edge orientation
    * (Suri & Vassilvitskii, WWW 2011; the MapReduce "MR nodeiterator"
    * family). Each undirected edge is oriented from its lower-ranked
    * endpoint under the total order (degree, vertex) — so every
    * vertex's OUT-degree in the oriented DAG is O(√m) regardless of
    * its raw degree, and the wedge join (out-neighbors paired per
    * pivot) is bounded even on power-law graphs where the naive
    * per-vertex neighbor pairing is quadratic in the max degree
    * (a celebrity host at web scale). Each triangle is enumerated
    * exactly once: its pivot is the lowest-ranked corner, and the
    * closing edge is oriented mid→high precisely because the wedge
    * condition already ordered the two endpoints.
    *
    * Shape: 2 joins to attach degrees, one self equi-join on the pivot
    * (hash join; the rank comparison is a post-join filter), one
    * equi-join to close wedges, one count aggregate. No windows, no
    * cartesian, all integer arithmetic — the DuckDB oracle replays it
    * exactly. Returns `(v, n_tri)` for every vertex in ≥ 1 triangle.
    */
  def triangles(edges: DataFrame, srcCol: String = "src",
                dstCol: String = "dst"): DataFrame = {
    val und = canonicalUndirected(edges, srcCol, dstCol)
    trianglesOf(und, degreesOf(und))
  }

  /** Canonical undirected edges: `(a < b)`, self-loops and parallel
    * edges dropped. One definition feeds [[triangles]] and
    * [[clusteringCoefficient]] so the canonicalization cannot drift.
    */
  private def canonicalUndirected(edges: DataFrame, srcCol: String,
                                  dstCol: String): DataFrame =
    edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
              greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()

  /** `(v, deg)` over canonical undirected edges. */
  private def degreesOf(und: DataFrame): DataFrame =
    und.select(col("a").as("v"))
      .union(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))

  private def trianglesOf(und: DataFrame, deg: DataFrame): DataFrame = {
    // rank(v) = (deg, v) packed into one orderable struct-free pair of
    // columns; orientation keeps the edge's (lo-rank -> hi-rank) form
    val withDeg = und
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
    val lowFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val orientedRaw = withDeg.select(
        when(lowFirst, col("a")).otherwise(col("b")).as("u"),
        when(lowFirst, col("da")).otherwise(col("db")).as("du"),
        when(lowFirst, col("b")).otherwise(col("a")).as("w"),
        when(lowFirst, col("db")).otherwise(col("da")).as("dw"))
    val oriented = Materialize.eager(orientedRaw) // reused 3x
    val e1 = oriented.select(col("u"), col("w").as("v1"), col("dw").as("d1"))
    val e2 = oriented.select(col("u"), col("w").as("v2"), col("dw").as("d2"))
    val wedges = e1.join(e2, "u")
      .filter(col("d1") < col("d2") ||
        (col("d1") === col("d2") && col("v1") < col("v2")))
    val closing = oriented.select(col("u").as("v1"), col("w").as("v2"))
    // explode, not a 3-way union: a union re-evaluates the wedge and
    // closing joins once per branch — the expensive enumeration ran 3×
    wedges.join(closing, Seq("v1", "v2"))
      .select(explode(array(col("u"), col("v1"), col("v2"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_tri"))
  }

  /** Per-vertex local clustering coefficient (Watts & Strogatz 1998):
    * c(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) — how close v's
    * neighborhood is to a clique, the standard community-density /
    * link-farm signal on crawl graphs. Rides [[triangles]] for the
    * numerator; the only float step is the final division of two
    * integers (rounded to 6 dp), so the oracle replays exactly.
    * Degree-1 vertices get 0. Returns `(v, n_tri, deg, coef)`.
    */
  def clusteringCoefficient(edges: DataFrame, srcCol: String = "src",
                            dstCol: String = "dst"): DataFrame = {
    val und = canonicalUndirected(edges, srcCol, dstCol)
    val deg = degreesOf(und)
    deg.join(trianglesOf(und, deg), Seq("v"), "left")
      .select(col("v"), coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        col("deg"),
        round(when(col("deg") >= 2,
            (lit(2L) * coalesce(col("n_tri"), lit(0L))).cast("double")
              / (col("deg") * (col("deg") - 1L)).cast("double"))
          .otherwise(lit(0.0)), 6).as("coef"))
  }

  /** HITS hubs & authorities (Kleinberg) — the complementary authority
    * model to [[pageRank]]: a good hub links to good authorities and
    * vice versa. Same fixed-point integer discipline; each half-round
    * max-normalizes by a global 1-row aggregate (a broadcast of one
    * value at any graph size, so the plan-audit's bounded-side rule
    * clears it). The per-key Long sums are safe to web-graph degrees
    * (sum ≤ deg·scale ≈ 2^45 at deg 10^7), and the `sum × scale`
    * normalization numerator — which DOES exceed a Long there — runs
    * in DECIMAL(38,0), matching the oracle's HUGEINT arithmetic
    * exactly. Returns `(host, hub, auth)`.
    */
  def hits(edges: DataFrame, iters: Int = 2, scale: Long = 1000000L,
           srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iters >= 1)
    val e = Materialize.eager(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct())
    require(e.head(1).nonEmpty, "hits: the edge list is empty")
    val verts = Materialize.eager(e.select(col("src").as("host"))
      .union(e.select(col("dst").as("host")))
      .distinct())
    // (raw div (38,0)) parses as IntegralDivide on decimals -> BIGINT,
    // exact at any in-degree (the Long multiply would wrap at ~2^63)
    def normalized(raw: String, mx: String): Column =
      expr(s"CAST(coalesce($raw, 0L) AS DECIMAL(38,0)) * $scale div $mx")
        .cast("long")
    var hub = verts.select(col("host"), lit(scale).as("hub"))
      .localCheckpoint(false) // lazy: see pageRank's iteration-state note
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      val aRaw = e.join(hub, e("src") === hub("host"))
        .groupBy("dst").agg(sum(col("hub")).as("ar"))
      auth = verts
        .join(aRaw, verts("host") === aRaw("dst"), "left")
        .crossJoin(aRaw.agg(max(col("ar")).as("amax")))
        .select(col("host"), normalized("ar", "amax").as("auth"))
        .localCheckpoint(false)
      val hRaw = e.join(auth, e("dst") === auth("host"))
        .groupBy("src").agg(sum(col("auth")).as("hr"))
      hub = verts
        .join(hRaw, verts("host") === hRaw("src"), "left")
        .crossJoin(hRaw.agg(max(col("hr")).as("hmax")))
        .select(col("host"), normalized("hr", "hmax").as("hub"))
        .localCheckpoint(false)
    }
    hub.join(auth, "host").select("host", "hub", "auth")
  }

  /** Multi-source BFS distances with a depth cap — "how far is every
    * page from a trusted seed set", the reachability half of
    * TrustRank-style crawl curation. Level-synchronous frontier
    * expansion on canonical undirected edges: each round is one
    * neighbor join + one distinct + one anti-join against the visited
    * set, so the whole run is `maxDepth` bounded-shuffle iterations
    * (the visited set is partitioned state, never driver-side).
    * Frontiers are `localCheckpoint`ed like the other iterative graph
    * ops — constant-size plans; a real cluster sets a reliable
    * checkpoint dir (see PLANS.md §scale-knobs on connected
    * components, the same caveat).
    *
    * `seeds` is a 1-column DataFrame of vertex ids; seeds not present
    * in the graph still report dist 0 (they are trivially reachable
    * from themselves). Unreached vertices are absent — the caller
    * left-joins the vertex set if "unreachable" rows are wanted.
    * Returns `(v, dist)` with the MINIMUM hop distance ≤ maxDepth.
    */
  def bfsDistances(edges: DataFrame, seeds: DataFrame, maxDepth: Int,
                   srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(maxDepth >= 0, s"maxDepth must be >= 0: $maxDepth")
    val und = canonicalUndirected(edges, srcCol, dstCol)
    // symmetric adjacency: BFS walks both directions of each edge
    val adj = Materialize.eager(
      und.select(col("a").as("s"), col("b").as("d"))
        .union(und.select(col("b").as("s"), col("a").as("d"))))
    var frontier = seeds.toDF("v").distinct()
      .localCheckpoint(false) // lazy: see pageRank's iteration-state note
    var visited = frontier
    var out = frontier.select(col("v"), lit(0).as("dist"))
    for (d <- 1 to maxDepth) {
      frontier = adj.join(frontier, adj("s") === frontier("v"))
        .select(col("d").as("v")).distinct()
        .join(visited, Seq("v"), "left_anti")
        .localCheckpoint(false)
      visited = visited.union(frontier).localCheckpoint(false)
      out = out.union(frontier.select(col("v"), lit(d).as("dist")))
    }
    out
  }

  /** Synchronous label propagation (Raghavan 2007) for community
    * detection: every node starts as its own label; each round it
    * adopts the most frequent label among its neighbors, ties broken
    * to the SMALLEST label — fully deterministic, so a fixed-round
    * unrolled SQL replay matches exactly (the usual LPA is randomized
    * and unverifiable; determinism is the price of an oracle, and at
    * scale the async/sync distinction changes communities anyway).
    *
    * Each round is one shuffle (adjacency ⋈ labels on the neighbor
    * key, then a two-level hash aggregate: count votes, then
    * `min(struct(-count, label))` picks the winner without a window).
    * Rounds are `localCheckpoint`ed — constant-size plans, same
    * discipline as [[pageRank]]. Returns `(node, community)` after
    * `iters` rounds.
    */
  def labelPropagation(edges: DataFrame, iters: Int,
                       srcCol: String = "src",
                       dstCol: String = "dst"): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val und = canonicalUndirected(edges, srcCol, dstCol)
    val adj = Materialize.eager(
      und.select(col("a").as("n"), col("b").as("nb"))
        .union(und.select(col("b").as("n"), col("a").as("nb"))))
    var labels = adj.select(col("n").as("node")).distinct()
      .withColumn("lab", col("node"))
      .localCheckpoint(false) // lazy: see pageRank's iteration-state note
    for (_ <- 1 to iters) {
      labels = adj
        .join(labels.select(col("node").as("nb"), col("lab")), "nb")
        .groupBy("n", "lab").agg(count(lit(1)).as("c"))
        .groupBy("n")
        .agg(min(struct((-col("c")).as("nc"), col("lab").as("lab")))
          .as("w"))
        .select(col("n").as("node"), col("w.lab").as("lab"))
        .localCheckpoint(false)
    }
    labels.select(col("node"), col("lab").as("community"))
  }
}
