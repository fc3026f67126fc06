package graft.search

import graft.SparkSpec
import graft.exprs._
import org.apache.spark.sql.functions._

class MdlpSpec extends SparkSpec {
  import spark.implicits._

  test("MDLP: perfectly separable feature gets one cut at the class boundary midpoint") {
    // values 1..40; y = value > 20 — strong signal, one cut at 20.5
    val df = spark.range(1, 41).select(col("id").cast("double").as("x"),
      (col("id") > 20).cast("int").as("y"))
    val cuts = Mdlp.fitCuts(df, col("x"), col("y"))
    assert(cuts == IndexedSeq(20.5), cuts.toString)
  }

  test("MDLP: random labels accept no cut (criterion rejects)") {
    val df = spark.range(1, 101).select(col("id").cast("double").as("x"),
      pmod(xxhash64(col("id")), lit(2)).cast("int").as("y"))
    val cuts = Mdlp.fitCuts(df, col("x"), col("y"))
    assert(cuts.isEmpty, cuts.toString)
  }

  test("MDLP: two-boundary signal recovers both cuts recursively") {
    // y = 1 on the middle band [30, 70] of 1..100 -> cuts near 29.5, 70.5
    val df = spark.range(1, 101).select(col("id").cast("double").as("x"),
      (col("id") >= 30 && col("id") <= 70).cast("int").as("y"))
    val cuts = Mdlp.fitCuts(df, col("x"), col("y"))
    assert(cuts == IndexedSeq(29.5, 70.5), cuts.toString)
  }

  test("MDLP: boundary candidates only where classes mix (pure runs skipped)") {
    // duplicated values with pure classes except around the boundary
    val rows = (Seq.fill(30)((1.0, 0)) ++ Seq.fill(30)((2.0, 0)) ++
      Seq.fill(30)((3.0, 1)) ++ Seq.fill(30)((4.0, 1))).toDF("x", "y")
    val cuts = Mdlp.fitCuts(rows, col("x"), col("y"))
    assert(cuts == IndexedSeq(2.5), cuts.toString)
  }

  test("MDLP lowering bins by cut count; nulls -> -1; empty cuts -> constant") {
    val df = Seq((1L, Some(1.0)), (2L, Some(25.0)), (3L, Some(80.0)), (4L, None))
      .toDF("id", "x")
    val bin = Mdlp.binColumn(col("x"), IndexedSeq(20.5, 70.5))
    val got = df.select(col("id"), bin.as("b")).as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> -1))
    assert(df.select(Mdlp.binColumn(col("x"), IndexedSeq.empty)).distinct().count() == 1)
  }

  test("MDLP integrates with Fitter/search via the label") {
    val df = spark.range(1, 201).select(col("id").cast("double").as("x"),
      (col("id") > 100).cast("int").as("y"))
    val e = Unary(UnaryOp.MDLP, RawCol("x"))
    val fit = Fitter.fit(df, Seq(e), label = Some(col("y")))
    val out = LayerBuilder.select(df, Seq("x"), Seq("b" -> e), fit)
    assert(out.select("b").distinct().count() == 2)
    // canon: mdlp(scale(x)) == mdlp(x)
    assert(Canon.key(Unary(UnaryOp.MDLP, Unary(UnaryOp.MinMax, RawCol("x")))) ==
      Canon.key(e))
  }
}
