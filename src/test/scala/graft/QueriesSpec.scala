package graft

import org.apache.spark.sql.functions._

/** Smoke: every SparkEntry query runs at sf0.001 and returns a sane
  * shape. Value-level correctness is the driver's DuckDB gate
  * (scripts/check.py locally).
  */
class QueriesSpec extends SparkSpec {

  // queries whose correct answer may legitimately be empty at sf0.001
  // (st21: clicks and purchases sharing a SAME-TYPED union key within
  // an hour first appear at sf0.01 — 34 oracle rows there, 0 here)
  private val mayBeEmpty = Set("q2_filter", "d2_ngram_jaccard",
    "d3_minhash_lsh", "d5_embed_pairs", "st21_stream_union_join")

  // The driver's oracle harness canonicalizes result rows with a pandas
  // lexsort before hashing; a raw ARRAY/MAP/STRUCT column makes that sort
  // throw (unhashable numpy.ndarray) whenever it participates in the key.
  // Guard the whole suite: every query must emit scalar-only columns,
  // except the documented allowlist below.
  private val nonScalarAllowed = Map(
    // array_agg IS the operator under test; its array column sorts last
    // by name ("vals") behind a unique (l_orderkey) lexsort prefix, so
    // the pandas sort never reaches it
    "q30_array_agg" -> "array_agg output; unique sort prefix shields it",
    // rows-only queries (no DuckDB oracle): the harness never sorts them
    "m2_media_features" -> "rows-only check; struct metadata is the point"
  )
  private def nonScalar(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    dt.isInstanceOf[ArrayType] || dt.isInstanceOf[MapType] ||
      dt.isInstanceOf[StructType]
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs") {
      val df = fn(spark, sf)
      // suite-wide plan-hygiene gate (shared with the AuditPlans main,
      // so a query cannot pass the spec while failing the main): an
      // all-pairs join shape appearing in ANY query fails the suite
      // unless it is an allow-listed in-query ground truth
      AuditPlans.gate(name, df).foreach(msg => fail(msg))
      // scalar-output-schema gate (ADVICE r7: checked here, on the ONE
      // build each query already gets — the former standalone test
      // re-executed every streaming drain and build-time write just to
      // read its schema)
      if (!nonScalarAllowed.contains(name)) {
        val bad = df.schema.fields.filter(f => nonScalar(f.dataType))
          .map(_.name)
        assert(bad.isEmpty, s"$name: non-scalar output columns " +
          s"(add concat_ws or allowlist): ${bad.mkString(",")}")
      }
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
      assert(df.columns.nonEmpty)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("non-scalar allowlist names only real queries") {
    val stale = nonScalarAllowed.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"allowlist entries without a query: $stale")
  }

  test("every query has an oracle") {
    // the once rows-only queries (d3, d4, s2, m2) gained oracles in
    // later rounds; the allowlist is gone so a new query cannot ship
    // without one
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("t29 surfaces disjoint-vocabulary source pairs with js = ln 2") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("t29_disjoint")
      .toFile.getAbsolutePath
    Seq((1L, "alpha beta gamma", "src_a", 15L),
        (2L, "delta epsilon zeta", "src_b", 17L))
      .toDF("doc_id", "text", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = SparkEntry.queries("t29_js_divergence")(spark, tmp).collect()
    assert(rows.length == 1, s"pair vanished: ${rows.mkString(",")}")
    assert(math.abs(rows(0).getDouble(2) - math.log(2.0)) < 1e-6,
      s"disjoint pair js=${rows(0).getDouble(2)} != ln 2")
  }

  test("q1_agg groups are complete") {
    val df = SparkEntry.queries("q1_agg")(spark, sf)
    val flags = df.select("l_returnflag").distinct().collect().map(_.getString(0))
    assert(flags.toSet.subsetOf(Set("A", "N", "R")))
  }

  test("q9_topk is ordered descending") {
    val rows = SparkEntry.queries("q9_topk")(spark, sf)
      .collect().map(_.getDouble(1))
    assert(rows.sameElements(rows.sortBy(-(_: Double))))
  }

  test("q65_funnel stage counts are monotonically non-increasing") {
    val byStage = SparkEntry.queries("q65_funnel")(spark, sf)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byStage.contains(1), "funnel lost stage 1")
    val counts = (1 to 3).map(s => byStage.getOrElse(s, 0L))
    assert(counts == counts.sortBy(-(_: Long)),
      s"a later funnel stage gained users: $byStage")
  }

  test("q67_markov transition probabilities sum to 1 per source state") {
    val sums = SparkEntry.queries("q67_markov")(spark, sf)
      .groupBy("prev").agg(sum("p").as("tot")).collect()
    sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9,
      s"transitions from ${r.getString(0)} sum to ${r.getDouble(1)}"))
  }

  test("q70_attribution credits every purchase exactly once") {
    val total = SparkEntry.queries("q70_attribution")(spark, sf)
      .agg(sum("n_purchases")).collect()(0).getLong(0)
    val purchases = graft.Engine.table(spark, sf, "events")
      .filter(col("event_type") === "purchase").count()
    assert(total == purchases, s"$total attributed vs $purchases purchases")
  }

  test("q69_equidepth buckets are equi-depth and value-ordered") {
    val rows = SparkEntry.queries("q69_equidepth")(spark, sf)
      .orderBy("bucket").collect()
    assert(rows.length == 16)
    val ns = rows.map(_.getLong(1))
    assert(ns.max - ns.min <= 1, s"depths not balanced: ${ns.mkString(",")}")
    // bucket value ranges must not overlap (lo of bucket k+1 >= hi of k)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) >= a.getLong(3),
        s"bucket ranges overlap: ${a.getLong(3)} > ${b.getLong(2)}")
    case _ => }
  }

  test("q76_trend_ols equals brute-force OLS per group") {
    val got = SparkEntry.queries("q76_trend_ols")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val pts = Engine.table(spark, sf, "events")
      .select(datediff(to_date(col("ts")), lit("2024-01-01"))
          .cast("double").as("x"),
        col("value"), col("event_type"))
      .collect().map(r => (r.getString(2), r.getDouble(0), r.getDouble(1)))
    for ((g, xs) <- pts.groupBy(_._1)) {
      val n = xs.size.toDouble
      val (sx, sy) = (xs.map(_._2).sum, xs.map(_._3).sum)
      val sxy = xs.map(p => p._2 * p._3).sum
      val sxx = xs.map(p => p._2 * p._2).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val (gn, gs, gi) = got(g)
      assert(gn == xs.size)
      assert(math.abs(gs - slope) < 1e-6, s"$g slope $gs vs $slope")
      assert(math.abs(gi - (sy - slope * sx) / n) < 1e-6)
    }
  }

  test("q77_ab_test equals brute-force Welch per metric") {
    val got = SparkEntry.queries("q77_ab_test")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(5))).toMap
    val pts = Engine.table(spark, sf, "events")
      .select(col("event_type"), col("user_id") % 2 === 0, col("value"))
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getDouble(2)))
    for ((g, xs) <- pts.groupBy(_._1)) {
      val a = xs.filter(_._2).map(_._3); val b = xs.filterNot(_._2).map(_._3)
      def mv(v: Seq[Double]) = {
        val m = v.sum / v.size
        (m, v.map(x => (x - m) * (x - m)).sum / (v.size - 1))
      }
      val ((ma, va), (mb, vb)) = (mv(a), mv(b))
      val tW = (ma - mb) / math.sqrt(va / a.size + vb / b.size)
      val (na, nb, gt) = got(g)
      assert(na == a.size && nb == b.size)
      assert(math.abs(gt - tW) < 1e-6, s"$g t $gt vs brute $tW")
    }
  }

  test("p43_entity_resolution resolves the corrupted catalog") {
    val rows = SparkEntry.queries("p43_entity_resolution")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, _, d) => d >= 0 && d <= 2 })
    // single-char deletions are distance 1 from their source (or 0 if
    // the corruption landed on another canonical name); most resolve
    assert(rows.count(_._3 <= 1) > rows.length / 2)
    val dirtyNames = rows.map(_._1)
    assert(dirtyNames.distinct.length == dirtyNames.length,
      "one best match per dirty name")
  }

  test("p44_zonemap: sorted layout prunes, answers agree") {
    val m = SparkEntry.queries("p44_zonemap")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (azones, ascan, arows, amatch) = m("arrival")
    val (szones, sscan, srows, smatch) = m("date_sorted")
    assert(amatch == smatch, "layout must not change the answer")
    assert(sscan < ascan, s"date-sorted must prune zones: $m")
    assert(srows < arows && srows >= smatch)
    assert(azones == 64 && szones <= 64)
  }

  test("t24_readability covers every source with a finite score") {
    val rows = SparkEntry.queries("t24_readability")(spark, sf).collect()
    val nSources = Engine.table(spark, sf, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select("source").distinct().count()
    assert(rows.length >= nSources - 1 && rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.isNullAt(5) && !r.getDouble(5).isNaN)
      assert(r.getLong(2) > 0 && r.getLong(4) >= r.getLong(1),
        "at least one sentence per counted doc")
    }
  }

  test("p45_lpa_communities partitions every vertex exactly once") {
    val sizes = SparkEntry.queries("p45_lpa_communities")(spark, sf)
      .collect().map(_.getLong(1))
    val ev = Engine.table(spark, sf, "events")
    val m = ev.agg(max(col("user_id")) + 1L).collect()(0).getLong(0)
    val nVerts = ev.select(col("user_id").as("v"))
      .union(ev.select(((col("user_id") * 31 + col("event_id") * 7 + 1)
        % m).as("v")))
      .distinct().count()
    // self-loop-only vertices (if any) drop out of the graph; all
    // others land in exactly one community
    assert(sizes.sum <= nVerts && sizes.sum > 0)
    assert(sizes.forall(_ > 0))
  }

  test("q80_grouped_corr stays within [-1, 1]") {
    val rows = SparkEntry.queries("q80_grouped_corr")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getDouble(2)
      assert(!c.isNaN && c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"corr $c")
    }
  }

  test("p49_poisson_bootstrap replicate means cluster around the true mean") {
    val rows = SparkEntry.queries("p49_poisson_bootstrap")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 32)
    val trueMean = Engine.table(spark, sf, "documents")
      .agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    val means = rows.map(_._3)
    // Poisson(1) resampling: every replicate mean is an unbiased
    // estimate; at n≈1.6k docs the spread is a few percent
    assert(means.forall(m => math.abs(m - trueMean) / trueMean < 0.25))
    assert(means.distinct.length > 1, "replicates must differ")
  }

  test("p50_psi_drift: parity halves of one distribution show near-zero PSI") {
    val rows = SparkEntry.queries("p50_psi_drift")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val psi = r.getDouble(3)
      assert(psi >= 0, s"${r.getString(0)}: psi $psi (PSI is nonneg)")
      // the halves are samples of the SAME distribution, so PSI is
      // sampling noise — but add-1 smoothing inflates tiny strata, so
      // only well-sampled types must sit under the 0.2 drift line
      if (math.min(r.getLong(1), r.getLong(2)) >= 500) {
        assert(psi < 0.2, s"${r.getString(0)}: psi $psi")
        assert(!r.getBoolean(4))
      }
    }
  }

  test("t27_burstiness buckets cover all multi-event users") {
    val rows = SparkEntry.queries("t27_burstiness")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.nonEmpty)
    assert(rows.forall { case (b, n) => b >= 0 && b <= 19 && n > 0 })
    val ev = Engine.table(spark, sf, "events")
    val multiUsers = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 3).count() // >= 2 gaps
    assert(rows.map(_._2).sum == multiUsers)
  }

  test("q86_ewma equals the brute-force truncated EWMA per user") {
    val got = SparkEntry.queries("q86_ewma")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val ev = Engine.table(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getLong(3)))
    for ((u, rows) <- ev.groupBy(_._1)) {
      val ordered = rows.sortBy(r => (r._3.getTime, r._2))
      for (i <- ordered.indices) {
        val frame = ordered.slice(math.max(0, i - 9), i + 1).map(_._4)
        val num = frame.foldLeft(0.0)((acc, x) => acc / 2.0 + x)
        val den = frame.foldLeft(0.0)((acc, _) => acc / 2.0 + 1.0)
        val expected = BigDecimal(num / den / 100.0)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(got((u, ordered(i)._2)) == expected,
          s"user $u event ${ordered(i)._2}")
      }
    }
  }

  test("t23_source_overlap pairs are canonical and jaccard bounded") {
    val rows = SparkEntry.queries("t23_source_overlap")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pair not canonical")
      val j = r.getDouble(3)
      assert(j > 0.0 && j <= 1.0, s"jaccard out of range: $j")
    }
  }

  test("p40_coverage_select gains are non-increasing (submodularity)") {
    val gains = SparkEntry.queries("p40_coverage_select")(spark, sf)
      .orderBy("round").collect().map(_.getLong(2))
    assert(gains.nonEmpty)
    assert(gains.sameElements(gains.sortBy(-(_: Long))),
      s"greedy gains increased: ${gains.mkString(",")}")
  }

  test("q68_cms_heavy estimates dominate exact counts") {
    SparkEntry.queries("q68_cms_heavy")(spark, sf).collect().foreach { r =>
      assert(r.getLong(1) >= r.getLong(2),
        s"CMS underestimated user ${r.getLong(0)}")
    }
  }

  test("s11_rrf fuses only ranked docs and bounds the fused score") {
    val rows = SparkEntry.queries("s11_rrf")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!(r.isNullAt(1) && r.isNullAt(2)),
        s"doc ${r.getLong(0)} in neither source ranking")
      val rrf = r.getDouble(3)
      assert(rrf > 0.0 && rrf <= 2.0 / 61.0, s"rrf out of range: $rrf")
    }
  }

  test("q66_retention week-0 cells cover every cohort user") {
    val df = SparkEntry.queries("q66_retention")(spark, sf)
    val week0 = df.filter(col("weeks_since") === 0)
      .agg(sum("n_active")).collect()(0).getLong(0)
    val signups = Engine.table(spark, sf, "events")
      .filter(col("event_type") === "signup")
      .select("user_id").distinct().count()
    // each cohort user's own first signup event is activity in week 0
    assert(week0 == signups, s"week-0 active $week0 != cohort $signups")
  }
}
