package graft.search

import graft.exprs._
import org.scalatest.funsuite.AnyFunSuite

/** Structural checks for the generated-oracle SQL (values are checked
  * end-to-end by the driver gate; nesting validity was additionally
  * hand-validated against DuckDB).
  */
class SqlGenSpec extends AnyFunSuite {

  test("nested windows materialize into layered CTEs (no window-in-window)") {
    val inner = GroupByThenE(AggKind.Max, RawCol("x"), RawCol("k2"))
    val outer = GroupByThenE(AggKind.Mean, inner, RawCol("k"))
    val e = Canon.canon(Unary(UnaryOp.MinMax, outer))
    val fit = FitStats(Map(Canon.key(e) -> IndexedSeq(0.0, 10.0)))
    val sql = new SqlGen().render("base AS (SELECT * FROM t)", "base",
      Seq("id"), Seq("f" -> e), fit)
    assert(sql.contains("__l1 AS ("), sql)
    // the inner window must be a materialized column, not nested in an
    // outer OVER's argument: no "OVER" may appear inside an aggregate call
    // argument of another window
    assert(sql.contains("MAX(CAST(x AS DOUBLE)) OVER (PARTITION BY k2) AS __n0"), sql)
    assert(sql.contains("AVG(CAST(__n0 AS DOUBLE)) OVER (PARTITION BY k)"), sql)
  }

  test("fitted scalars embed as round-trip-exact literals") {
    val e = Canon.canon(Unary(UnaryOp.MinMax, RawCol("x")))
    val v = 0.1 + 0.2 // not exactly 0.3 in binary
    val fit = FitStats(Map(Canon.key(e) -> IndexedSeq(0.0, v)))
    val sql = new SqlGen().render("base AS (SELECT * FROM t)", "base",
      Seq("id"), Seq("f" -> e), fit)
    assert(sql.contains(java.lang.Double.toString(v)), sql)
  }

  test("every UnaryOp, BinOp and AggKind renders without throwing") {
    val x = RawCol("x")
    val fit = FitStats(Map(
      Canon.key(Unary(UnaryOp.MinMax, x)) -> IndexedSeq(0.0, 1.0),
      Canon.key(Unary(UnaryOp.ZScore, x)) -> IndexedSeq(0.0, 1.0),
      Canon.key(Unary(UnaryOp.StdScale, x)) -> IndexedSeq(0.0, 1.0),
      Canon.key(Unary(UnaryOp.MDLP, x)) -> IndexedSeq(1.0, 2.0),
      Canon.key(Unary(UnaryOp.DiscretizeEW(10), x)) -> IndexedSeq(0.0, 1.0),
      Canon.key(Unary(UnaryOp.DiscretizeQ(4), x)) -> IndexedSeq(0.2, 0.5, 0.8),
      Canon.key(Unary(UnaryOp.ImputeMean, x)) -> IndexedSeq(0.5),
      Canon.key(Unary(UnaryOp.ImputeMedian, x)) -> IndexedSeq(0.5),
      Canon.key(Unary(UnaryOp.ImputeMode, x)) -> IndexedSeq(0.5)))
    val unaries = Seq(UnaryOp.Minus, UnaryOp.Inv, UnaryOp.Log, UnaryOp.Sqrt,
      UnaryOp.Square, UnaryOp.Abs, UnaryOp.Rint, UnaryOp.Exp, UnaryOp.Sin,
      UnaryOp.Cos, UnaryOp.Tan, UnaryOp.Sinh, UnaryOp.Cosh, UnaryOp.Tanh,
      UnaryOp.Degrees, UnaryOp.Radians, UnaryOp.Sigmoid, UnaryOp.MinMax,
      UnaryOp.StdScale, UnaryOp.ZScore, UnaryOp.MDLP, UnaryOp.DiscretizeEW(10),
      UnaryOp.DiscretizeQ(4), UnaryOp.ImputeMean, UnaryOp.ImputeMedian,
      UnaryOp.ImputeMode, UnaryOp.EqualsStr("it's"))
    val bins = Seq(BinOp.Add, BinOp.Mul, BinOp.Sub, BinOp.Div, BinOp.Pow,
      BinOp.Max2, BinOp.Min2)
    val aggs = Seq(AggKind.Mean, AggKind.Max, AggKind.Min, AggKind.Median,
      AggKind.Std, AggKind.Var, AggKind.Count, AggKind.Sum, AggKind.Prod)
    val exprs: Seq[FeatureExpr] =
      unaries.map(op => Unary(op, x)) ++
        bins.map(op => BinaryE(op, x, RawCol("y"))) ++
        aggs.map(a => GroupByThenE(a, x, RawCol("k")))
    val g = new SqlGen()
    exprs.foreach { e =>
      val f = g.gen(e, fit)
      assert(f.sql.nonEmpty)
    }
  }
}
