package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension installer for graft's Catalyst expressions — lets a
  * cluster set `spark.sql.extensions=graft.plans.GraftExtensions` (or a
  * builder call `.withExtensions(new GraftExtensions)`) and get every
  * graft function in SQL on every session, instead of per-session
  * `VecExprs.register(spark)` calls. Same builders as the registry path,
  * so plans are identical either way.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.plans.GraftExtensions", name),
        builder))
    }
}
