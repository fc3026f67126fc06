package graft

import graft.exprs.{AsOfLessOrEqual, ComplexityScore}
import org.apache.spark.sql.SparkSessionExtensions

/** Canonical extension point: register the engine's custom Catalyst
  * expressions with any SparkSession via
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`): `asof_lte(ts, ts)` and
  * `complexity_score(expr_string)` become SQL functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("asof_lte"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[AsOfLessOrEqual].getName, "asof_lte"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          AsOfLessOrEqual(exprs(0), exprs(1))))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("complexity_score"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[ComplexityScore].getName, "complexity_score"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          ComplexityScore(exprs.head)))
  }
}
