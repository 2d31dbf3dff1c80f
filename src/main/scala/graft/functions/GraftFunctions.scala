package graft.functions

import org.apache.spark.sql.SparkSession

/** One-call SQL registration of every native graft expression, so
  * `spark.sql` users get the same codegen'd scalars the DataFrame API
  * uses: `reverse_complement`, `translate_codons`, `dot_product`,
  * `cdc_boundaries`. Each individual `register` stays callable for
  * selective setups; all are temp functions on the session's registry
  * (per-session, no catalog writes).
  */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    ReverseComplement.register(spark)
    TranslateCodons.register(spark)
    DotProduct.register(spark)
    CdcBoundaries.register(spark)
  }
}
