package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes every graft native function
  * available in ANY session built with
  * `spark.sql.extensions=graft.core.GraftExtensions` — spark-submit,
  * thrift server, notebooks — without calling GraftFunctions.registerAll.
  * Same builders as GraftFunctions (one source of truth via
  * GraftFunctions.builders).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("org.apache.spark.sql.graft", name),
        (exprs: Seq[Expression]) => builder(exprs)))
    }
}
