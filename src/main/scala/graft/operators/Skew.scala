package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: key salting.
  *
  * A hot key routes all its rows to one reducer; salting splits the big
  * side's hot keys across `factor` sub-partitions and replicates the
  * small side to every sub-partition. AQE's skew-join handles most
  * cases at runtime; explicit salting remains the tool when one side
  * can be replicated cheaply and skew is extreme (power-law join keys
  * in web-scale corpora).
  */
object Skew {

  /** Inner equi-join `big ⋈ small` on `keys`, with the big side salted
    * `factor` ways. Result equals the unsalted join.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 factor: Int): DataFrame = {
    // deterministic spread: hash of the whole row modulo factor — rows
    // of a hot key distribute evenly without an RNG (replayable tasks)
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(factor)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(factor - 1L))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
