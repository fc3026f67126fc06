package graft.fairness

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fairness aggregates — the reference's flagship relational queries
  * (`fmeasures/ROD.py`, `CDP.py`, `CTPB.py`, `CTNB.py`) as pure groupBy
  * aggregations: bin contexts -> per-(context, sensitive) rates -> pivot ->
  * frequency-weighted combine. No per-context driver loop (the reference
  * iterates contexts in python; here each metric is 2-3 shuffles of
  * context-cardinality-sized data regardless of row count).
  *
  * Markov-blanket note: the R/bnlearn causal filter is out of scope
  * (external interpreter); `mb` defaults to all admissible columns — the
  * reference's own fallback (`ROD.py:84-88`).
  */
object FairMetrics {

  /** Quartile-bin numeric context columns exactly as `generate_binned_df`
    * (`ROD.py:52-59`): pd.qcut(q=4, duplicates='drop'), right-closed at the
    * interior quantile edges; non-numeric / low-cardinality columns pass
    * through as strings. Returns the df with `<col>__bin` string columns.
    */
  def binContexts(df: DataFrame, cols: Seq[String]): (DataFrame, Seq[String]) = {
    val numericTypes = Set("double", "float", "integer", "long", "short")
    val numeric = cols.filter(c =>
      numericTypes.contains(df.schema(c).dataType.typeName))
    // ONE batched agg for every numeric context column's distinct count AND
    // quantile edges — fit-job count is independent of context width (a real
    // Markov-blanket has many context columns; 2 sequential jobs per column
    // was a driver-side loop in disguise). Quantiles for low-cardinality
    // columns are computed-and-discarded: same single pass either way.
    val stats: Map[String, (Long, Seq[Double])] =
      if (numeric.isEmpty) Map.empty
      else {
        val aggs = numeric.flatMap { c =>
          Seq(
            approx_count_distinct(col(c)).as(s"__d_$c"),
            percentile(col(c).cast("double"), typedLit(Seq(0.25, 0.5, 0.75)))
              .as(s"__q_$c"))
        }
        val r = df.agg(aggs.head, aggs.tail: _*).head()
        numeric.map { c =>
          val qIx = r.fieldIndex(s"__q_$c")
          val qs = if (r.isNullAt(qIx)) Seq.empty[Double] else r.getSeq[Double](qIx)
          c -> (r.getLong(r.fieldIndex(s"__d_$c")), qs)
        }.toMap
      }
    var out = df
    val binned = cols.map { c =>
      val name = s"${c}__bin"
      stats.get(c) match {
        case Some((dist, qs0)) if dist > 4 && qs0.nonEmpty =>
          val qs = qs0.distinct
          val bin = qs.map(e => when(col(c) > lit(e), 1).otherwise(0))
            .reduceLeft[Column](_ + _)
          out = out.withColumn(name, bin.cast("string"))
        case _ =>
          out = out.withColumn(name, col(c).cast("string"))
      }
      name
    }
    (out, binned)
  }

  /** ROD (`ROD.py:62-176`): per context z, odds ratio
    * OR = (p1|not-prot,z / p0|not-prot,z) * (p0|prot,z / p1|prot,z) from mean
    * predicted probability (empty side => 0.5/0.5), weighted by context
    * frequency over ALL rows; non-finite ORs dropped (weights not
    * renormalized — faithful). ROD = -|sum w*OR - 1|. One row out.
    */
  def rod(df: DataFrame, pred: Column, isProtected: Column,
      contextCols: Seq[String]): DataFrame = {
    val (b, ctx) = binContexts(df, contextCols)
    val base = b.withColumn("__p", pred.cast("double"))
      .withColumn("__prot", isProtected.cast("boolean"))
    val perGroup = base.groupBy((ctx.map(col) :+ col("__prot")): _*)
      .agg(avg(col("__p")).as("p1"), count(lit(1)).as("n"))
    val piv = perGroup.groupBy(ctx.map(col): _*)
      .agg(
        max(when(col("__prot"), col("p1"))).as("p1_prot"),
        max(when(!col("__prot"), col("p1"))).as("p1_not"),
        sum(col("n")).as("nz"))
    val p10 = coalesce(col("p1_not"), lit(0.5))   // sensitive != protected
    val p11 = coalesce(col("p1_prot"), lit(0.5))  // sensitive == protected
    val orCol = (p10 / (lit(1.0) - p10)) * ((lit(1.0) - p11) / p11)
    piv
      .withColumn("__or", orCol)
      // scalar total via broadcast agg, not an empty-partition window (the
      // context table is cardinality-bounded, but the single-partition
      // WindowExec is a needless anti-pattern in a one-row-output plan)
      .crossJoin(broadcast(piv.agg(sum(col("nz")).as("__total"))))
      .filter(!isnan(col("__or")) && col("__or") =!= Double.PositiveInfinity &&
        col("__or") =!= Double.NegativeInfinity)
      // all ORs non-finite => empty sum; reference: np.dot([],[]) = 0 -> rod = -1
      .agg((-abs(coalesce(sum(col("__or") * col("nz") / col("__total")), lit(0.0)) - 1.0)).as("rod"))
  }

  /** CDP (`CDP.py:30-71`): per context, between-group difference (max-min)
    * of selection rate mean(pred); contexts with a single sensitive value
    * skipped; frequency-weighted sum.
    */
  def cdp(df: DataFrame, predBinary: Column, sensitive: Column,
      contextCols: Seq[String]): DataFrame =
    rateGapMetric(df, predBinary.cast("double"), sensitive, contextCols,
      restrict = lit(true), out = "cdp")

  /** CTPB: between-group TPR gap per context (rates over y_true=1 rows). */
  def ctpb(df: DataFrame, yTrue: Column, predBinary: Column, sensitive: Column,
      contextCols: Seq[String]): DataFrame =
    rateGapMetric(df, predBinary.cast("double"), sensitive, contextCols,
      restrict = yTrue.cast("int") === 1, out = "ctpb")

  /** CTNB: between-group TNR gap per context (rates over y_true=0 rows). */
  def ctnb(df: DataFrame, yTrue: Column, predBinary: Column, sensitive: Column,
      contextCols: Seq[String]): DataFrame =
    rateGapMetric(df, lit(1.0) - predBinary.cast("double"), sensitive, contextCols,
      restrict = yTrue.cast("int") === 0, out = "ctnb")

  private def rateGapMetric(df: DataFrame, rateOf: Column, sensitive: Column,
      contextCols: Seq[String], restrict: Column, out: String): DataFrame = {
    val (b, ctx) = binContexts(df, contextCols)
    val base = b.withColumn("__r", when(restrict, rateOf))
      .withColumn("__s", sensitive.cast("string"))
    val perGroup = base.groupBy((ctx.map(col) :+ col("__s")): _*)
      .agg(avg(col("__r")).as("rate"), count(lit(1)).as("n"))
    val piv = perGroup.groupBy(ctx.map(col): _*)
      .agg(
        max(col("rate")).as("mx"), min(col("rate")).as("mn"),
        countDistinct(col("__s")).as("ns"), sum(col("n")).as("nz"))
    piv
      .crossJoin(broadcast(piv.agg(sum(col("nz")).as("__total"))))
      .filter(col("ns") > 1 && col("mx").isNotNull && col("mn").isNotNull)
      .agg(sum((col("mx") - col("mn")) * col("nz") / col("__total")).as(out))
  }
}
