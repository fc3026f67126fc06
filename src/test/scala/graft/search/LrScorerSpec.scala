package graft.search

import graft.SparkSpec
import graft.exprs._
import org.apache.spark.sql.functions._

class LrScorerSpec extends SparkSpec {

  private def planted = spark.range(2000).select(
    (pmod(xxhash64(col("id")), lit(100)).cast("double") / 100 + 0.5).as("x1"),
    (pmod(xxhash64(col("id") + 7), lit(100)).cast("double") / 100 + 0.5).as("x2"))
    .withColumn("y", (col("x1") * col("x2") > lit(1.0)).cast("int"))

  test("reference 7-C grid is pinned") {
    // ComplexityDrivenFeatureConstruction.py:40-47: C in {1e-3..1e3}, reg = 1/C
    assert(LrScorer.DefaultGrid ==
      Seq(0.001, 0.01, 0.1, 1.0, 10.0, 100.0, 1000.0).map(1.0 / _))
  }

  test("LR CV: informative feature scores high AUC, noise scores ~0.5") {
    val df = planted.withColumn("prod", col("x1") * col("x2"))
      .withColumn("noise", pmod(xxhash64(col("x1") + 13), lit(1000)).cast("double") / 1000)
    // 2-point grid exercises the grid-search path (best-mean-AUC pick)
    val good = LrScorer.score(df, Seq("prod"), "y", folds = 3, grid = Seq(1.0, 1000.0))
    val bad = LrScorer.score(df, Seq("noise"), "y", folds = 3)
    assert(good.auc > 0.95, s"good=${good.auc}")
    assert(math.abs(bad.auc - 0.5) < 0.1, s"bad=${bad.auc}")
    assert(good.rss < bad.rss)
    assert(good.n > 0)
  }

  test("AICc selection prefers the informative champion over weak lower-complexity ones") {
    val df = planted
    val res = new Cdfc(df, Seq("x1", "x2"), Nil, Nil, col("y"),
      CdfcConfig(cMax = 3, binaryOps = Seq(BinOp.Mul),
        unaryOps = Seq(UnaryOp.Minus, UnaryOp.MinMax), groupByAggs = Seq.empty)).run()
    val (winner, perComplexity) = LrScorer.selectByAicc(df, res, "y", folds = 3)
    assert(perComplexity.size >= 2)
    assert(winner.key.contains("mul"), s"winner=${winner.key}, table=$perComplexity")
  }

  test("repeated CV is stable for a strong feature") {
    val df = planted.withColumn("prod", col("x1") * col("x2"))
    val (mu, sd) = LrScorer.repeatedCv(df, Seq("prod"), "y", repeats = 3, folds = 3)
    assert(mu > 0.95 && sd < 0.05, s"mu=$mu sd=$sd")
  }
}
