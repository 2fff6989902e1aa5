package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.CosineSimilarity

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so `spark.sql("SELECT graft_cosine(a, b)")`
  * works alongside the Column API.
  *
  * Enable with:
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(GraftExtensions.apply)        // programmatic, or
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}} */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.register(ext)
}

object GraftExtensions {
  val apply: SparkSessionExtensions => Unit = register

  private val cosineFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("graft_cosine"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_cosine takes exactly 2 arguments")
      CosineSimilarity(children.head, children(1))
    })

  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(cosineFn)

  /** Register into an already-running session (extensions are normally
    * applied at builder time; this covers shared-session setups). */
  def registerInto(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      cosineFn._1, cosineFn._2, cosineFn._3)
}
