package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Session-registry seam shared by every graft kernel.
  *
  * The Column wrappers register their expression builder lazily on first
  * use (the registry + `call_function` is the public Expression→Column
  * seam in Spark 4). Registration must be register-ONCE per session:
  * `createOrReplaceTempFunction` logs a
  * `WARN SimpleFunctionRegistry: the function X replaced ...` on every
  * repeat call, which at one wrapper call per Column reference floods the
  * logs and interleaves with machine-read output (the round-1 bench line
  * was unparseable partly because of this).
  */
object Registry {
  def registerOnce(spark: SparkSession, name: String)(
      builder: Seq[Expression] => Expression): Unit = {
    val r = spark.sessionState.functionRegistry
    if (!r.functionExists(FunctionIdentifier(name))) {
      r.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
