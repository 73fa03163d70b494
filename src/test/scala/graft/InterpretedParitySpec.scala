package graft

/** Codegen/interpreted differential over the custom Catalyst kernels.
  *
  * Every custom expression in graft.plans carries BOTH a `doGenCode`
  * (the hot path) and an interpreted `eval` (the path Spark silently
  * falls back to on a real cluster when a generated method trips the
  * JVM's 64KB limit, the code cache fills, or Janino fails — see
  * CodeGeneratorWithInterpretedFallback). A divergence between the two
  * is invisible locally (whole-stage codegen always wins at local[n]
  * scale) and silently corrupts results at 100 TB. This suite re-runs
  * one kernel-exercising SparkEntry query per expression with
  * `spark.sql.codegen.wholeStage=false` and
  * `spark.sql.codegen.factoryMode=NO_CODEGEN` and requires the
  * collected result to be identical to the codegen run.
  *
  * Kernel -> query map: WordStats -> t2/t5, CharEntropy -> t6,
  * DsirBuckets -> t13, CdcBoundaries -> d16, PolyHash -> d23/d9,
  * SimHash64 -> d4, TokenShingles+MinHashAgg -> d3, VecDot -> s1,
  * VecLshBuckets -> s2, VecTopCells -> s3, VecNearestCell -> s4,
  * VecRandomProject -> s6, JaroWinklerSim -> p51, AhoCount -> t32,
  * UnicodeNormStats -> t34.
  */
class InterpretedParitySpec extends SparkSpec {

  private val kernelQueries = Seq(
    "t2_quality", "t5_gopher_rules", "t6_entropy", "t13_dsir",
    "d16_cdc_dedup", "d23_winnowing", "d9_substring_dup", "d4_simhash",
    "d3_minhash_lsh", "s1_ann_topk", "s2_ann_lsh", "s3_ann_ivf",
    "s4_kmeans", "s6_random_projection", "p51_jaro_linkage",
    "t32_blocklist", "t34_normalization", "p57_url_canonical",
    "p58_link_graph", "t35_spoof_audit", "d27_homoglyph_dedup")

  /** Engine-ordering-free fingerprint of a result: JSON rows, sorted. */
  private def snapshot(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sf).toJSON.collect().toSeq.sorted

  private def withInterpreted[A](body: => A): A = {
    val conf = spark.conf
    val ws = conf.get("spark.sql.codegen.wholeStage", "true")
    val fm = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    conf.set("spark.sql.codegen.wholeStage", "false")
    conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try body
    finally {
      conf.set("spark.sql.codegen.wholeStage", ws)
      conf.set("spark.sql.codegen.factoryMode", fm)
    }
  }

  kernelQueries.foreach { name =>
    test(s"$name: interpreted eval matches codegen") {
      val gen = snapshot(name)
      val interp = withInterpreted(snapshot(name))
      assert(interp == gen,
        s"$name diverges between eval and doGenCode: " +
          s"codegen ${gen.size} rows, interpreted ${interp.size} rows; " +
          s"first diff: ${gen.zipAll(interp, "<missing>", "<missing>")
            .find { case (a, b) => a != b }}")
    }
  }
}
