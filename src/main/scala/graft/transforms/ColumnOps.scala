package graft.transforms

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The legacy per-column mapper families (SURVEY §2.6,
  * `model/ml/kaggle/representation_learning/Transformer/`): date expansion,
  * categorical encoders, rank/quantile/winsorize numerics, text number
  * parsing. These are standalone column operators (not part of the CDFC
  * lattice), each a pure Column program or a fit-as-aggregation.
  */
object ColumnOps {

  // ---- parsers (DateTransformer / DateExpansionTransformer) -----------

  /** Expand a timestamp into calendar component features. */
  def dateExpansion(ts: Column): Seq[(String, Column)] = Seq(
    "ts_unix"  -> unix_micros(ts),
    "ts_year"  -> year(ts).cast("long"),
    "ts_month" -> month(ts).cast("long"),
    "ts_day"   -> dayofmonth(ts).cast("long"),
    "ts_dow"   -> dayofweek(ts).cast("long"), // 1 = Sunday
    "ts_doy"   -> dayofyear(ts).cast("long"),
    "ts_hour"  -> hour(ts).cast("long"))

  /** Numbers embedded in text (ParseNumbersTransformer): first integer
    * matching `v<digits>` style markers, null if absent.
    */
  def parseNumber(text: Column, pattern: String = "v(-?\\d+)"): Column = {
    val s = regexp_extract(text, pattern, 1)
    when(s =!= "", s.cast("long"))
  }

  // ---- categorical encoders -------------------------------------------

  /** Ordinal/label encoding: dense ids 1..K over the sorted distinct
    * values, attached via broadcast join (never a global window — the dict
    * is value-cardinality-sized, the data never shuffles).
    */
  def ordinalEncode(df: DataFrame, c: String, out: String): DataFrame = {
    val dict = df.select(col(c)).distinct()
      .withColumn(out, row_number().over(Window.orderBy(col(c))).cast("long"))
    df.join(broadcast(dict), Seq(c), "left")
  }

  /** Frequency encoding: relative frequency of the value. */
  def frequencyEncode(c: Column): Column =
    count(lit(1)).over(Window.partitionBy(c)).cast("double") /
      count(lit(1)).over(Window.partitionBy())

  /** Helmert contrast coding (patsy convention over sorted levels): for
    * contrast j in 1..k-1, level index i (0-based):
    * -1 if i < j, j if i == j, 0 if i > j. Returns k-1 columns
    * `<out>_1..<out>_{k-1}` attached via broadcast dict join.
    */
  def helmertEncode(df: DataFrame, c: String, out: String): DataFrame =
    contrastEncode(df, c, out) { (i, j, _) =>
      if (i < j) -1.0 else if (i == j) j.toDouble else 0.0
    }

  /** Backward-difference coding: contrast j compares level j to level j-1;
    * level i gets -(k-j)/k if i < j else j/k.
    */
  def backwardDifferenceEncode(df: DataFrame, c: String, out: String): DataFrame =
    contrastEncode(df, c, out) { (i, j, k) =>
      if (i < j) -(k - j).toDouble / k else j.toDouble / k
    }

  private def contrastEncode(df: DataFrame, c: String, out: String)(
      coef: (Int, Int, Int) => Double): DataFrame = {
    val levels = df.select(col(c).cast("string").as(c)).distinct()
      .collect().map(_.getString(0)).sorted
    val k = levels.length
    val spark = df.sparkSession
    import spark.implicits._
    val rows = levels.zipWithIndex.map { case (lv, i) =>
      (lv, (1 until k).map(j => coef(i, j, k)))
    }
    val dict = rows.toSeq.toDF(c, "__coefs")
      .select(col(c) +: (1 until k).map(j =>
        element_at(col("__coefs"), j).as(s"${out}_$j")): _*)
    df.withColumn(c, col(c).cast("string")).join(broadcast(dict), Seq(c), "left")
  }

  // ---- numeric mappers -------------------------------------------------

  /** scipy rankdata(method='average'): min-rank + (ties-1)/2, over a global
    * ordering. NOTE: a global rank is inherently a single total order; at
    * scale prefer percent_rank on a sampled sketch or avoid global ranks.
    */
  def rankAverage(c: Column): Column = {
    val w = Window.orderBy(c)
    rank().over(w).cast("double") +
      (count(lit(1)).over(Window.partitionBy(c)).cast("double") - 1) / 2.0
  }

  /** Quantile bucket 1..n with deterministic tie-break columns. */
  def quantileBucket(n: Int, order: Column*): Column =
    ntile(n).over(Window.orderBy(order: _*))

  /** Winsorize: clamp at the [p, 1-p] exact percentiles (fit = one agg). */
  def winsorizeBounds(df: DataFrame, c: Column, p: Double): (Double, Double) = {
    val r = df.agg(
      percentile(c.cast("double"), lit(p)).as("lo"),
      percentile(c.cast("double"), lit(1 - p)).as("hi")).head()
    (r.getDouble(0), r.getDouble(1))
  }
  def winsorize(c: Column, bounds: (Double, Double)): Column =
    least(greatest(c, lit(bounds._1)), lit(bounds._2))

  /** Binarize at a fitted threshold (mean by default in the reference). */
  def binarize(c: Column, threshold: Double): Column =
    (c > lit(threshold)).cast("long")
}
