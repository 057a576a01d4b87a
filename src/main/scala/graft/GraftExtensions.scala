package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extensions injector — the idiomatic Spark integration point
  * for a library engine: ship the jar, set
  * `--conf spark.sql.extensions=graft.GraftExtensions`, and every
  * session (jobs, thriftserver, notebooks) resolves the library's SQL
  * functions with no per-session `register` call. Injects the same
  * builder table as [[graft.functions.GraftFunctions.register]], so
  * the two registration paths cannot diverge.
  *
  * No custom analyzer/optimizer rules or strategies are injected: the
  * operator library is declarative DataFrame composition, so Catalyst
  * already plans it (SURVEY §4) — the extension surface is where a
  * rule WOULD go if profiling ever justified one.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}
