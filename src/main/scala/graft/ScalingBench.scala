package graft

/** Scale-factor scaling record (VERDICT r5 task 1): runs every
  * SparkEntry query at sf0.1 and at SoakGen-amplified 3× and 10×
  * equivalents (sf0.3 / sf1) in ONE session, fits the per-query
  * scaling exponent, and writes BENCH_SCALING.json — turning the
  * "survives 100×" claim from an assertion into a measured artifact.
  *
  * Exponent: least-squares slope of ln(time) on ln(sf) over the three
  * points. 1.0 = linear in data; < 1 = overhead-dominated or
  * sub-linear; > ~1.2 = super-linear growth that needs a fix or a
  * PLANS.md explanation (the flag threshold). Times are the min of
  * `SPARK_GRAFT_SAMPLES` (default 2) passes — the same reproducible-
  * capability discipline as Bench.
  *
  * Usage: runMain graft.ScalingBench [sf01Dir sf03Dir sf1Dir]
  * (defaults /root/testdata/sf0.1, /tmp/graft_sf03, /tmp/graft_sf1 —
  * generate the latter two with `runMain graft.SoakGen <src> <dst> N`).
  */
object ScalingBench {

  /** Least-squares slope of ln(time) on ln(sf): the scaling exponent.
    * 1.0 = linear in data, < 1 sub-linear/overhead-bound, > 1
    * super-linear. NaN-times and non-positive times are dropped; NaN
    * when fewer than two valid points remain.
    */
  private[graft] def fitExponent(ts: Seq[(Double, Double)]): Double = {
    val pts = ts.filter(p => !p._2.isNaN && p._2 > 0)
      .map { case (sf, t) => (math.log(sf), math.log(t)) }
    if (pts.size < 2) return Double.NaN
    val mx = pts.map(_._1).sum / pts.size
    val my = pts.map(_._2).sum / pts.size
    val num = pts.map { case (x, y) => (x - mx) * (y - my) }.sum
    val den = pts.map { case (x, _) => (x - mx) * (x - mx) }.sum
    num / den
  }

  def main(args: Array[String]): Unit = {
    val dirs = Seq(
      0.1 -> args.lift(0).getOrElse("/root/testdata/sf0.1"),
      0.3 -> args.lift(1).getOrElse("/tmp/graft_sf03"),
      1.0 -> args.lift(2).getOrElse("/tmp/graft_sf1"))
    dirs.foreach { case (_, d) =>
      require(new java.io.File(d, "documents.parquet").exists(),
        s"missing scaled dataset: $d (generate with graft.SoakGen)")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.get("SPARK_GRAFT_SAMPLES").map(_.toInt).getOrElse(2)
    val spark = Engine.session(s"local[$cpus]", cpus.toInt)

    def force(name: String, sfDir: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[scaling] $name@$sfDir failed: ${e.getMessage}")
        return Double.NaN
      }
      val dt = (System.nanoTime() - t0) / 1e9
      Engine.releaseCaches(spark)
      System.gc()
      dt
    }

    // SPARK_GRAFT_ONLY=q1,q2 measures a subset and MERGES it into the
    // existing record instead of overwriting — new queries join the
    // full-suite record without a 40-minute re-run. Unknown names fail
    // loudly (the Bench discipline).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { o =>
      val unknown = o -- SparkEntry.queries.keySet
      require(o.nonEmpty && unknown.isEmpty,
        s"SPARK_GRAFT_ONLY invalid; unknown: ${unknown.mkString(", ")}")
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // warm-up at the smallest scale: session machinery + codegen
    dirs.foreach { case (_, d) =>
      Engine.TableNames.foreach(n => Engine.table(spark, d, n).count()) }
    force("q1_agg", dirs.head._2)

    // per-sf sweeps smallest-first (JIT warms on cheap data; the big
    // sweep then measures data cost, not compilation)
    val times = scala.collection.mutable.Map.empty[(String, Double), Double]
    dirs.foreach { case (sf, d) =>
      names.foreach { n =>
        val t = (1 to passes).map(_ => force(n, d)).min
        times((n, sf)) = t
        println(f"[scaling] sf$sf%-4s $n%-28s $t%8.2f s")
      }
    }

    val records = names.map { n =>
      val ts = dirs.map { case (sf, _) => sf -> times((n, sf)) }
      val exp = fitExponent(ts)
      (n, ts, exp)
    }
    val flagged = records.filter { case (_, _, e) => e > 1.2 }
    flagged.foreach { case (n, ts, e) =>
      System.err.println(f"[scaling] SUPER-LINEAR $n exponent=$e%.2f times=" +
        ts.map(t => f"${t._2}%.2f").mkString("/")) }

    def j(v: Double): String =
      if (v.isNaN) "null" else f"$v%.4f"
    val path = java.nio.file.Paths.get("BENCH_SCALING.json")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    // merge base: the existing record when it exists (so subset runs
    // extend it and full runs preserve extra sections like st_scaling)
    val root: com.fasterxml.jackson.databind.node.ObjectNode =
      if (java.nio.file.Files.exists(path))
        mapper.readTree(path.toFile)
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      else mapper.createObjectNode()
    root.put("metric", "scaling").put("unit", "sec")
      .put("passes", passes).put("cpus", cpus)
    root.set[com.fasterxml.jackson.databind.JsonNode]("sfs", mapper.readTree(dirs.map(_._1).mkString("[", ",", "]")))
    val qNode = root.path("queries") match {
      case o: com.fasterxml.jackson.databind.node.ObjectNode => o
      case _ =>
        val o = mapper.createObjectNode(); root.set[com.fasterxml.jackson.databind.JsonNode]("queries", o); o
    }
    records.foreach { case (n, ts, e) =>
      val entry = ts.map { case (sf, t) =>
        s""""t${sf.toString.replace(".", "_")}":${j(t)}"""
      }.mkString("{", ",", s""","exponent":${j(e)}}""")
      qNode.set[com.fasterxml.jackson.databind.JsonNode](n, mapper.readTree(entry))
    }
    // totals + super-linear flags recomputed over the MERGED query set
    val totalsNode = mapper.createObjectNode()
    dirs.foreach { case (sf, _) =>
      var tot = 0.0
      val it = qNode.fields()
      while (it.hasNext) {
        val v = it.next().getValue.path(s"t${sf.toString.replace(".", "_")}")
        if (v.isNumber) tot += v.asDouble()
      }
      totalsNode.put(s"sf$sf", tot)
    }
    root.set[com.fasterxml.jackson.databind.JsonNode]("totals", totalsNode)
    val flaggedAll = {
      val b = Seq.newBuilder[String]
      val it = qNode.fields()
      while (it.hasNext) {
        val e = it.next()
        val exp = e.getValue.path("exponent")
        if (exp.isNumber && exp.asDouble() > 1.2) b += e.getKey
      }
      b.result().sorted
    }
    root.set[com.fasterxml.jackson.databind.JsonNode]("flagged_super_linear",
      mapper.readTree(flaggedAll.map("\"" + _ + "\"").mkString("[", ",", "]")))
    java.nio.file.Files.write(path,
      (mapper.writeValueAsString(root) + "\n").getBytes("UTF-8"))
    println(s"[scaling] wrote BENCH_SCALING.json (${qNode.size()} queries); " +
      s"${flaggedAll.size} super-linear queries" +
      (if (flaggedAll.isEmpty) "" else ": " + flaggedAll.mkString(", ")))
    spark.stop()
  }
}
