package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Scratch: compare the containment pipeline's intermediate sizes with
  * hashed-long vs string rarity tie-break at one scale.
  * Run: sbt "Test/runMain graft.D26Probe <sfDir>"
  */
object D26Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/tmp/graft_sf1")
    val spark = Engine.session("local[32]", 32)
    val (tNum, tDen, shingleN) = (9, 10, 3)

    val base = Engine.table(spark, sfDir, "documents")
      .select(col("doc_id").cast(LongType).as("doc_id"), col("text"))
    val ts0 = split(trim(col("text")), "\\s+")
    val k = ((size(ts0) * 2 + 4) / 5).cast(IntegerType)
    val quote = array_join(slice(ts0, lit(1), k), " ")
    val pure = base.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), quote.as("text"))
    val noisy = base.filter(col("doc_id") % 7 === 1)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        concat(quote, lit(" zzzq qqzx wwvv vvuu uqzz")).as("text"))
    val docs = base.unionByName(pure).unionByName(noisy)

    for (hashed <- Seq(true, false)) {
      val raw = docs
        .select(col("doc_id").as("id"), split(trim(col("text")), "\\s+").as("ts"))
        .filter(size(col("ts")) >= shingleN)
        .select(col("id"), explode(expr(
          s"transform(sequence(0, size(ts) - $shingleN)," +
            s" i -> concat_ws(' ', slice(ts, i + 1, $shingleN)))")).as("s"))
      val toks = (if (hashed) raw.select(col("id"), xxhash64(col("s")).as("tok"))
                  else raw.select(col("id"), col("s").as("tok")))
        .distinct().persist()
      val sizes = toks.groupBy("id").agg(count(lit(1)).as("n"))
      val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
      val wDoc = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy("df", "tok")
      val ranked = toks.join(dfreq, "tok")
        .withColumn("rn", row_number().over(wDoc))
        .join(sizes, "id").persist()
      val prefix = ranked
        .filter(col("rn") <=
          col("n") - expr(s"(${tNum}L * n + ${tDen - 1}L) div ${tDen}L") + 1)
        .select(col("id").as("doc_a"), col("tok"), col("n").as("na"),
          col("rn").as("pa"))
      val index = ranked
        .join(prefix.select("tok").distinct(), "tok")
        .select(col("id").as("doc_b"), col("tok"), col("n").as("nb"),
          col("rn").as("pb"))
      val t0 = System.nanoTime()
      val joined = prefix.join(index, "tok")
        .filter(col("doc_a") =!= col("doc_b") &&
          lit(tDen) * col("nb") >= lit(tNum) * col("na"))
      val joinedN = joined.count()
      val t1 = System.nanoTime()
      val cands = joined
        .groupBy("doc_a", "doc_b")
        .agg(min("pa").as("pa"), min("pb").as("pb"),
          first("na").as("na"), first("nb").as("nb"))
        .filter(lit(tDen) *
          (lit(1L) + least(col("na") - col("pa"), col("nb") - col("pb"))) >=
          lit(tNum) * col("na"))
        .select("doc_a", "doc_b")
      val candsN = cands.count()
      val t2 = System.nanoTime()
      println(f"[d26probe] hashed=$hashed toks=${toks.count()} " +
        f"prefix=${prefix.count()} prefixToks=${prefix.select("tok").distinct().count()} " +
        f"index=${index.count()} joined=$joinedN cands=$candsN " +
        f"joinSec=${(t1 - t0) / 1e9}%.1f candSec=${(t2 - t1) / 1e9}%.1f")
      toks.unpersist(); ranked.unpersist()
      Engine.releaseCaches(spark)
    }
    spark.stop()
  }
}
