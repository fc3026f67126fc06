package graft.exprs

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class ParserAndCatalystSpec extends SparkSpec {
  import spark.implicits._

  private val genExpr: Gen[FeatureExpr] = {
    val genRaw = Gen.oneOf("a", "b", "col_1").map(RawCol(_))
    val genLeaf = Gen.frequency(5 -> genRaw, 1 -> Gen.const(ConstOne))
    def gen(depth: Int): Gen[FeatureExpr] =
      if (depth == 0) genLeaf
      else Gen.frequency(
        2 -> genLeaf,
        3 -> (for {
          op <- Gen.oneOf(UnaryOp.Minus, UnaryOp.Log, UnaryOp.MinMax,
            UnaryOp.DiscretizeEW(10), UnaryOp.DiscretizeQ(4), UnaryOp.ImputeMean,
            UnaryOp.EqualsStr("x y"), UnaryOp.Sigmoid)
          c <- gen(depth - 1)
        } yield Unary(op, c)),
        3 -> (for {
          op <- Gen.oneOf(BinOp.Add, BinOp.Mul, BinOp.Sub, BinOp.Div, BinOp.Pow)
          l <- gen(depth - 1); r <- gen(depth - 1)
        } yield BinaryE(op, l, r)),
        2 -> (for {
          a <- Gen.oneOf(AggKind.Mean, AggKind.Std, AggKind.Median, AggKind.Count)
          v <- gen(depth - 1); k <- genRaw
        } yield GroupByThenE(a, v, k)))
    gen(3)
  }

  test("one-hot values with quotes and backslashes round-trip render/parse") {
    for (v <- Seq("it's", "a'b'c", "back\\slash", "mix\\'ed", "'", "\\")) {
      val e = Unary(UnaryOp.EqualsStr(v), RawCol("c"))
      val parsed = FeatureExprParser.parse(e.render)
      assert(parsed == e, s"value <$v> rendered ${e.render} parsed $parsed")
    }
    // distinct values must not collide to one canonical key
    val k1 = Canon.key(Unary(UnaryOp.EqualsStr("a',b"), RawCol("c")))
    val k2 = Canon.key(Unary(UnaryOp.EqualsStr("a"), RawCol("c")))
    assert(k1 != k2)
  }

  test("parser round-trips render for arbitrary expression trees") {
    (0 until 300).foreach { i =>
      val e = genExpr(Gen.Parameters.default, Seed(i.toLong)).get
      val parsed = FeatureExprParser.parse(e.render)
      assert(parsed.render == e.render, s"seed $i: ${e.render}")
      assert(parsed.complexity == e.complexity)
    }
  }

  test("TokenPolyHash (codegen) == higher-order-function token hash") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val toks = Seq("", "a", "the", "hash", "Zebra9", "ünïcödé", "x" * 200)
      .toDF("tok")
    val rows = toks.select(
      graft.text.TextFeatures.tokenHash(col("tok")).as("fast"),
      graft.text.TextFeatures.tokenHashHof(col("tok")).as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
    // registered SQL function agrees too
    CatalystExprs.register(spark)
    toks.createOrReplaceTempView("toks")
    val viaSql = spark.sql(
      "SELECT token_poly_hash(tok) AS h FROM toks").collect().map(_.getLong(0)).toSeq
    assert(viaSql == rows.map(_.getLong(0)).toSeq)
  }

  test("ComplexityScore expression scores serialized candidates in SQL") {
    CatalystExprs.register(spark)
    val rows = Seq(
      "a",                           // 1
      "log(a)",                      // 2
      "add(a,b)",                    // 3
      "groupby_mean(scale(a),k)",    // 4
      "not a valid expr ((")         // -1
      .toDF("expr")
    val got = rows.selectExpr("complexity_score(expr) AS c")
      .as[Int].collect().toSeq
    assert(got == Seq(1, 2, 3, 4, -1))
  }

  test("AsOfLessOrEqual: codegen'd at-or-before predicate on timestamps") {
    CatalystExprs.register(spark)
    val df = Seq(
      ("2024-01-01 00:00:00", "2024-01-01 00:00:00"),
      ("2024-01-01 00:00:00", "2024-01-01 00:00:01"),
      ("2024-01-01 00:00:01", "2024-01-01 00:00:00"))
      .toDF("r", "l")
      .select(col("r").cast("timestamp").as("r"), col("l").cast("timestamp").as("l"))
    val got = df.select(CatalystExprs.asOfLessOrEqual(col("r"), col("l")))
      .as[Boolean].collect().toSeq
    assert(got == Seq(true, true, false))
    val sqlGot = df.selectExpr("asof_lte(r, l)").as[Boolean].collect().toSeq
    assert(sqlGot == got)
  }
}
