package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** One-call SQL registration of the native graft expressions, so
  * `spark.sql` users get the same codegen'd scalars the DataFrame API
  * uses: `reverse_complement`, `translate_codons`, `dot_product`,
  * `cdc_boundaries`. (`NearestCentroid` is deliberately NOT here: its
  * codebook is constructor data collected from a DataFrame, which SQL
  * argument lists cannot express — use
  * `NearestCentroid.nearest_centroid` from the Column API.) Each
  * individual `register` stays callable for selective setups; all are
  * temp functions on the session's registry (per-session, no catalog
  * writes).
  */
object GraftFunctions {

  /** Shared arity-checked builder: every SQL entry point fails
    * analysis cleanly on wrong argument counts instead of throwing
    * head-of-empty-list (or silently dropping extras) at plan time.
    */
  private[functions] def registerChecked(
      spark: SparkSession, name: String, arity: Int)(
      build: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => {
        if (exprs.length != arity)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> s"`$name`",
              "expectedNum" -> arity.toString,
              "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        build(exprs)
      },
      "built-in")

  def registerAll(spark: SparkSession): Unit = {
    ReverseComplement.register(spark)
    TranslateCodons.register(spark)
    DotProduct.register(spark)
    CdcBoundaries.register(spark)
    LetterMatches.register(spark)
    SortedIntersectCount.register(spark)
  }
}
