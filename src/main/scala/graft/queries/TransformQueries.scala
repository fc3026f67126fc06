package graft.queries

import graft.Tables
import graft.exprs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Candidate-transform library queries: every feature column is built by the
  * engine's FeatureExpr -> Fitter -> Lower path (never hand-written Columns),
  * so the correctness gate exercises the same code the CDFC search uses.
  */
object TransformQueries {

  private val L = "lineitem"

  private def li(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, L)

  private def sel(df: DataFrame, keys: Seq[String], feats: Seq[(String, FeatureExpr)],
      fitDf: DataFrame = null): DataFrame = {
    val fit = Fitter.fit(if (fitDf == null) df else fitDf, feats.map(_._2))
    graft.search.LayerBuilder.select(df, keys, feats, fit, round6 = true)
  }

  import UnaryOp._
  import BinOp._
  private val qty = RawCol("l_quantity")
  private val price = RawCol("l_extendedprice")
  private val disc = RawCol("l_discount")
  private val tax = RawCol("l_tax")
  private val keys = Seq("l_orderkey", "l_linenumber")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_unary" -> ((s, dir) => sel(li(s, dir), keys, Seq(
      "f_minus"   -> Unary(Minus, qty),
      "f_inv"     -> Unary(Inv, price),
      "f_log"     -> Unary(Log, price),
      "f_sqrt"    -> Unary(Sqrt, qty),
      "f_square"  -> Unary(Square, disc),
      "f_abs"     -> Unary(Abs, Unary(Minus, qty)),
      "f_sigmoid" -> Unary(Sigmoid, tax),
      "f_minmax"  -> Unary(MinMax, price),
      "f_zscore"  -> Unary(ZScore, qty),
      "f_degrees" -> Unary(Degrees, disc),
      "f_exp"     -> Unary(Exp, disc),
      "f_tanh"    -> Unary(Tanh, tax)))),

    "q_binary" -> ((s, dir) => sel(li(s, dir), keys, Seq(
      "f_revenue" -> BinaryE(Mul, price, BinaryE(Sub, ConstOne, disc)),
      "f_add"     -> BinaryE(Add, qty, tax),
      "f_sub"     -> BinaryE(Sub, price, qty),
      "f_div"     -> BinaryE(Div, price, qty),
      "f_max"     -> BinaryE(Max2, disc, tax),
      "f_min"     -> BinaryE(Min2, disc, tax),
      "f_pow"     -> BinaryE(Pow, BinaryE(Add, ConstOne, disc), qty)))),

    "q_discretize" -> ((s, dir) => sel(li(s, dir), keys, Seq(
      "f_ew10" -> Unary(DiscretizeEW(10), price),
      "f_q4"   -> Unary(DiscretizeQ(4), price)))),

    "q_impute" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("v", when(col("event_type") =!= "error", col("value")))
      sel(ev, Seq("event_id"), Seq(
        "f_imp_mean"   -> Unary(ImputeMean, RawCol("v")),
        "f_imp_median" -> Unary(ImputeMedian, RawCol("v"))))
    }),

    "q_onehot" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val vals = graft.profile.Profiler.distinctValues(ev, col("event_type"))
      sel(ev, Seq("event_id"),
        vals.map(v => s"f_is_$v" -> (Unary(EqualsStr(v), RawCol("event_type")): FeatureExpr)))
    }),

    "q_groupby_expr" -> ((s, dir) => sel(li(s, dir), keys, Seq(
      "f_mean_by_flag" -> GroupByThenE(AggKind.Mean, price, RawCol("l_returnflag")),
      "f_max_by_flag"  -> GroupByThenE(AggKind.Max, qty, RawCol("l_returnflag")),
      "f_std_by_flag"  -> GroupByThenE(AggKind.Std, price, RawCol("l_returnflag")),
      "f_med_by_flag"  -> GroupByThenE(AggKind.Median, qty, RawCol("l_returnflag")),
      "f_cnt_by_flag"  -> GroupByThenE(AggKind.Count, price, RawCol("l_returnflag")),
      "f_sum_by_flag"  -> GroupByThenE(AggKind.Sum, qty, RawCol("l_returnflag"))))),

    // Fit-on-train-only scaling: fold from a portable hash; stats computed on
    // folds != 0 only, applied everywhere (leakage-controlled fit scope).
    "q_scale_fold" -> ((s, dir) => {
      val df = li(s, dir).withColumn("fold",
        pmod(col("l_orderkey") * lit(2654435761L) + col("l_linenumber"), lit(5)))
      val feats = Seq(
        "f_mm_train" -> Unary(MinMax, price),
        "f_z_train"  -> Unary(ZScore, qty))
      sel(df, keys :+ "fold", feats.map { case (n, e) => n -> (e: FeatureExpr) },
        fitDf = df.filter(col("fold") =!= 0))
    })
  )

  private def round6(expr: String): String = PortableRound.sql6(expr)

  val oracles: Map[String, String] = Map(
    "q_unary" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  ${round6("-l_quantity")} AS f_minus,
         |  ${round6("1.0 / l_extendedprice")} AS f_inv,
         |  ${round6("LN(l_extendedprice)")} AS f_log,
         |  ${round6("SQRT(l_quantity)")} AS f_sqrt,
         |  ${round6("l_discount * l_discount")} AS f_square,
         |  ${round6("ABS(-l_quantity)")} AS f_abs,
         |  ${round6("1.0 / (1.0 + EXP(-l_tax))")} AS f_sigmoid,
         |  ${round6("(l_extendedprice - MIN(l_extendedprice) OVER ()) / (MAX(l_extendedprice) OVER () - MIN(l_extendedprice) OVER ())")} AS f_minmax,
         |  ${round6("(l_quantity - AVG(l_quantity) OVER ()) / STDDEV_POP(l_quantity) OVER ()")} AS f_zscore,
         |  ${round6("DEGREES(l_discount)")} AS f_degrees,
         |  ${round6("EXP(l_discount)")} AS f_exp,
         |  ${round6("(EXP(l_tax) - EXP(-l_tax)) / (EXP(l_tax) + EXP(-l_tax))")} AS f_tanh
         |FROM lineitem""".stripMargin,

    "q_binary" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  ${round6("l_extendedprice * (1.0 - l_discount)")} AS f_revenue,
         |  ${round6("l_quantity + l_tax")} AS f_add,
         |  ${round6("l_extendedprice - l_quantity")} AS f_sub,
         |  ${round6("l_extendedprice / l_quantity")} AS f_div,
         |  ${round6("GREATEST(l_discount, l_tax)")} AS f_max,
         |  ${round6("LEAST(l_discount, l_tax)")} AS f_min,
         |  ${round6("POW(1.0 + l_discount, l_quantity)")} AS f_pow
         |FROM lineitem""".stripMargin,

    "q_discretize" ->
      s"""WITH s AS (
         |  SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi,
         |         QUANTILE_CONT(l_extendedprice, 0.25) AS q1,
         |         QUANTILE_CONT(l_extendedprice, 0.50) AS q2,
         |         QUANTILE_CONT(l_extendedprice, 0.75) AS q3
         |  FROM lineitem)
         |SELECT l_orderkey, l_linenumber,
         |  CAST(LEAST(GREATEST(CAST(CEIL((l_extendedprice - lo) / ((hi - lo) / 10)) AS INT) - 1, 0), 9) AS DOUBLE) AS f_ew10,
         |  CAST((CASE WHEN l_extendedprice > q1 THEN 1 ELSE 0 END) +
         |       (CASE WHEN l_extendedprice > q2 THEN 1 ELSE 0 END) +
         |       (CASE WHEN l_extendedprice > q3 THEN 1 ELSE 0 END) AS DOUBLE) AS f_q4
         |FROM lineitem, s""".stripMargin,

    "q_impute" ->
      s"""WITH e AS (
         |  SELECT event_id, CASE WHEN event_type <> 'error' THEN value END AS v FROM events),
         |s AS (SELECT AVG(v) AS mu, MEDIAN(v) AS md FROM e)
         |SELECT event_id, ${round6("COALESCE(v, mu)")} AS f_imp_mean,
         |       ${round6("COALESCE(v, md)")} AS f_imp_median
         |FROM e, s""".stripMargin,

    "q_onehot" ->
      s"""SELECT event_id,
         |  CAST(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS DOUBLE) AS f_is_click,
         |  CAST(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS DOUBLE) AS f_is_error,
         |  CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS DOUBLE) AS f_is_purchase,
         |  CAST(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS DOUBLE) AS f_is_signup,
         |  CAST(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS DOUBLE) AS f_is_view
         |FROM events""".stripMargin,

    "q_groupby_expr" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  ${round6("AVG(l_extendedprice) OVER (PARTITION BY l_returnflag)")} AS f_mean_by_flag,
         |  ${round6("MAX(l_quantity) OVER (PARTITION BY l_returnflag)")} AS f_max_by_flag,
         |  ${round6("STDDEV_POP(l_extendedprice) OVER (PARTITION BY l_returnflag)")} AS f_std_by_flag,
         |  ${round6("MEDIAN(l_quantity) OVER (PARTITION BY l_returnflag)")} AS f_med_by_flag,
         |  ${round6("COUNT(l_extendedprice) OVER (PARTITION BY l_returnflag)")} AS f_cnt_by_flag,
         |  ${round6("SUM(l_quantity) OVER (PARTITION BY l_returnflag)")} AS f_sum_by_flag
         |FROM lineitem""".stripMargin,

    "q_scale_fold" ->
      s"""WITH f AS (
         |  SELECT *, (l_orderkey * 2654435761 + l_linenumber) % 5 AS fold FROM lineitem),
         |s AS (
         |  SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi,
         |         AVG(l_quantity) AS mu, STDDEV_POP(l_quantity) AS sd
         |  FROM f WHERE fold <> 0)
         |SELECT l_orderkey, l_linenumber, CAST(fold AS BIGINT) AS fold,
         |  ${round6("(l_extendedprice - lo) / (hi - lo)")} AS f_mm_train,
         |  ${round6("(l_quantity - mu) / sd")} AS f_z_train
         |FROM f, s""".stripMargin
  )
}
