package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-soak data generator: amplifies a driver testdata directory N×
  * into a scratch dir (default /tmp/graft_sf1 = 10× sf0.1 ≈ sf1) so the
  * bench suite can be stressed one decade above the driver's scale.
  *
  * Fact tables get key-shifted replicas (join relationships preserved:
  * lineitem.l_orderkey and orders.o_orderkey shift together); dimension
  * tables are copied unchanged, so per-dim fan-in grows 10× — exactly
  * the skew the caps (maxDocFreq, maxBucket, AQE skew-join) exist for.
  * Document replicas get a per-copy suffix and embedding replicas a tiny
  * first-component perturbation: near-duplicates of their originals, so
  * dedup/ANN workloads see realistic 10-member near-dup clusters rather
  * than degenerate exact copies.
  *
  * Usage: runMain graft.SoakGen [srcDir] [dstDir] [copies]
  */
object SoakGen {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft_sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.session(s"local[$cpus]", cpus.toInt)
    val M = 10000000L

    def amplify(name: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      (0 until copies).map(k => f(base, k)).reduce(_ union _)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[soakgen] $name x$copies -> $dst")
    }

    amplify("documents") { (df, k) =>
      df.withColumn("doc_id", col("doc_id") + lit(k * M))
        .withColumn("text",
          if (k == 0) col("text") else concat(col("text"), lit(s" r$k")))
    }
    amplify("embeddings") { (df, k) =>
      df.withColumn("vec_id", col("vec_id") + lit(k * M))
        .withColumn("embedding",
          if (k == 0) col("embedding")
          else transform(col("embedding"), (x, i) =>
            when(i === 0, (x + lit(k * 0.001f)).cast("float")).otherwise(x)))
    }
    amplify("events") { (df, k) =>
      df.withColumn("event_id", col("event_id") + lit(k * 1000000000L))
    }
    amplify("lineitem") { (df, k) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(k * M))
    }
    amplify("orders") { (df, k) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(k * M))
    }
    Seq("region", "nation", "customer", "supplier", "part").foreach { n =>
      spark.read.parquet(s"$src/$n.parquet")
        .write.mode("overwrite").parquet(s"$dst/$n.parquet")
      println(s"[soakgen] $n copied (dimension)")
    }
    spark.stop()
  }
}
