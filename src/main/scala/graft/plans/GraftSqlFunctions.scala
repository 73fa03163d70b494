package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.{BooleanType, IntegerType}

/** SQL registry for the dedup kernel expressions, so the pipeline
  * primitives are reachable from plain `spark.sql` (not only the
  * Scala operator API): `simhash64(text[, portable])`,
  * `token_shingles(text, n)`, and the `minhash_sig(h1, h2, k)`
  * aggregate. Registered once per session by [[graft.Engine.session]],
  * alongside vec_dot / poly_hash / char_entropy.
  *
  * Shape parameters (n, k, portable) must be literals — they size
  * codegen'd buffers and the aggregation state, which cannot vary per
  * row.
  */
object GraftSqlFunctions {

  private def bad(usage: String): Nothing =
    throw new IllegalArgumentException(s"usage: $usage (shape arguments must be literals)")

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("simhash64", {
      case Seq(e) => SimHash64(e, portable = false)
      case Seq(e, Literal(p: Boolean, BooleanType)) => SimHash64(e, p)
      case _ => bad("simhash64(text[, portable_literal])")
    }: Seq[Expression] => Expression, "built-in")
    reg.createOrReplaceTempFunction("token_shingles", {
      case Seq(e, Literal(n: Int, IntegerType)) => TokenShingles(e, n)
      case _ => bad("token_shingles(text, n_literal)")
    }: Seq[Expression] => Expression, "built-in")
    reg.createOrReplaceTempFunction("minhash_sig", {
      case Seq(h1, h2, Literal(k: Int, IntegerType)) =>
        MinHashAgg(h1, h2, k).toAggregateExpression()
      case _ => bad("minhash_sig(h1, h2, k_literal)")
    }: Seq[Expression] => Expression, "built-in")
  }
}
