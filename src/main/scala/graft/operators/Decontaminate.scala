package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.storage.StorageLevel

/** Benchmark decontamination: flag training documents whose word
  * n-gram shingles also occur in a held-out benchmark/eval set — the
  * standard leakage check a training-data pipeline runs before every
  * model train.
  *
  * Scale design (the asymmetry is the whole point): the corpus is the
  * 100 TB side, the benchmark is small (eval sets are MBs). The corpus
  * shingle index is therefore never shuffled wholesale against the
  * benchmark — a Bloom filter built over the benchmark's shingle
  * hashes (one distributed aggregate, one small binary to the driver)
  * is pushed into the corpus scan as a codegen'd `might_contain`
  * map-side filter, dropping ~all clean shingles before any shuffle.
  * The survivors (true overlaps + Bloom false positives) then take an
  * exact join against the benchmark shingle set, so the result is
  * EXACT regardless of the Bloom's false-positive rate. This is the
  * same two-phase shape Spark's own runtime row-group filtering uses
  * (`InjectRuntimeFilter`), applied cross-dataset.
  */
object Decontaminate {

  /** Per-corpus-document contamination scores: of the doc's distinct
    * word `n`-gram shingles, how many also occur anywhere in
    * `benchmark`. Returns `(doc_id, n_shingles, n_contam,
    * contam_frac)` with one row per corpus document (clean docs score
    * 0). Shingles are 64-bit-hashed before comparison, as in
    * [[Dedup.ngramJaccardPairs]]: same equality classes w.h.p., a
    * fraction of the shuffle bytes.
    *
    * `bloomPrefilter=false` skips the Bloom phase (exact join only) —
    * the differential-test reference; results are identical by
    * construction.
    *
    * `bloomExpectedItems` sizes the filter; the default (-1) counts the
    * benchmark shingle set first — one extra job over the persisted
    * SMALL side — so the filter is ~9.6 bits/item instead of a fixed
    * multi-MB literal when the eval set is tiny (and under-sized never
    * breaks correctness, only the pruning rate, thanks to the exact
    * join behind it).
    */
  def scores(corpus: DataFrame, benchmark: DataFrame,
             idCol: String, textCol: String, n: Int = 3,
             tokens: Boolean = true,
             bloomPrefilter: Boolean = true,
             bloomExpectedItems: Long = -1L): DataFrame = {
    val corpusIdx = Dedup.shingleIndex(corpus, idCol, textCol, n, None, tokens)
      .select(col("id"), xxhash64(col("shingle")).as("h"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val benchSet = Dedup.shingleIndex(benchmark, idCol, textCol, n, None, tokens)
      .select(xxhash64(col("shingle")).as("h")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    val candidates =
      if (bloomPrefilter) {
        // one aggregate over the benchmark shingle hashes; the filter
        // bytes are bounded by numBits (not by benchmark size) and are
        // order-independent, so the build is deterministic
        val items =
          if (bloomExpectedItems > 0) bloomExpectedItems
          else math.max(benchSet.count(), 1024L)
        val bloomBytes = benchSet
          .agg(GraftSqlBridge.column(
            new BloomFilterAggregate(
              GraftSqlBridge.expression(col("h")), items)
              .toAggregateExpression()).as("bf"))
          .head().getAs[Array[Byte]](0)
        if (bloomBytes == null) corpusIdx.limit(0) // empty benchmark
        else corpusIdx.filter(GraftSqlBridge.column(
          BloomFilterMightContain(
            Literal(bloomBytes, org.apache.spark.sql.types.BinaryType),
            GraftSqlBridge.expression(col("h")))))
      } else corpusIdx

    // exact semi-join scrubs Bloom false positives; AQE picks broadcast
    // when the benchmark set actually fits (never forced — eval suites
    // can still be millions of shingles)
    val contam = candidates.join(benchSet, "h")
      .groupBy("id").agg(count(lit(1)).as("n_contam"))
    val sizes = corpusIdx.groupBy("id").agg(count(lit(1)).as("n_shingles"))
    sizes.join(contam, Seq("id"), "left")
      .select(col("id").as("doc_id"), col("n_shingles"),
        coalesce(col("n_contam"), lit(0L)).as("n_contam"))
      .withColumn("contam_frac",
        col("n_contam").cast("double") / col("n_shingles").cast("double"))
  }
}
