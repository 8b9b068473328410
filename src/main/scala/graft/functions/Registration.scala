package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Idempotent session-registry registration. The supported path is
  * `spark.sql.extensions=graft.GraftExtensions` (Verify/Bench/tests set
  * it), under which every graft function already exists when an
  * operator runs — this helper then no-ops instead of re-registering
  * (createOrReplaceTempFunction on every query invocation floods the
  * logs with SimpleFunctionRegistry replace warnings). Sessions built
  * WITHOUT the extension still work: the first operator call registers
  * the function it needs.
  */
object Registration {
  def ensure(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
  }
}
