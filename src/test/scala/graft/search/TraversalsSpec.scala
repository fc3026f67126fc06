package graft.search

import graft.SparkSpec
import graft.exprs._
import org.apache.spark.sql.functions._

class TraversalsSpec extends SparkSpec {

  private def planted = spark.range(2500).select(
    (pmod(xxhash64(col("id")), lit(100)).cast("double") / 100 + 0.5).as("x1"),
    (pmod(xxhash64(col("id") + 7), lit(100)).cast("double") / 100 + 0.5).as("x2"))
    .withColumn("y", (col("x1") * col("x2") > lit(1.0)).cast("int"))

  test("rank scores and harmonic mean match the reference arithmetic") {
    val reps = Seq(
      Traversals.Rep(RawCol("a"), 0.2, 1),
      Traversals.Rep(RawCol("b"), 0.5, 1),
      Traversals.Rep(Unary(UnaryOp.Log, RawCol("a")), 0.8, 2),
      Traversals.Rep(BinaryE(BinOp.Mul, RawCol("a"), RawCol("b")), 0.9, 3))
    val m = reps(3)
    // accuracy: P(score <= 0.9) = 4/4 ; simplicity: P(complexity >= 3) = 1/4
    assert(Traversals.accuracyScore(m, reps) == 1.0)
    assert(Traversals.simplicityScore(m, reps) == 0.25)
    val h = Traversals.hScore(m, reps)
    assert(math.abs(h - 2 * 0.25 * 1.0 / 1.25) < 1e-12, h.toString)
    assert(Traversals.harmonicMean(0.0, 0.0) == 0.0)
  }

  test("best-first global traversal finds the planted composition") {
    val res = Traversals.run(planted, Seq("x1", "x2"), col("y"),
      Traversals.PopRule.BestScore, maxRuns = 3,
      unaryOps = Seq(UnaryOp.Log, UnaryOp.MinMax), binaryOps = Seq(BinOp.Mul, BinOp.Add))
    assert(Canon.key(res.best.expr).contains("mul"), Canon.key(res.best.expr))
    val rootMax = res.seen.filter(_.complexity == 1).map(_.score).max
    assert(res.best.score > rootMax)
    // every popped node was on the frontier exactly once
    assert(res.popped.map(r => Canon.key(r.expr)).distinct.size == res.popped.size)
  }

  test("harmonic-mean traversal reaches the composition and pops simple reps early") {
    val res = Traversals.run(planted, Seq("x1", "x2"), col("y"),
      Traversals.PopRule.HarmonicMean, maxRuns = 5,
      unaryOps = Seq(UnaryOp.Log, UnaryOp.MinMax), binaryOps = Seq(BinOp.Mul, BinOp.Add))
    assert(Canon.key(res.best.expr).contains("mul"), Canon.key(res.best.expr))
    // the first pop must be a raw feature: with only raws seen, simplicity
    // P(complexity >= 1) = 1 dominates any later h a deeper node can get
    assert(res.popped.head.complexity == 1, res.popped.map(_.expr).toString)
  }
}
