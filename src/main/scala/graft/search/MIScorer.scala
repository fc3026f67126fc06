package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Candidate gain oracle: mutual information between the equi-width-binned
  * feature and the (binary) label, computed for a whole batch of candidates
  * in ONE aggregation job — counts are map-side partial aggregates, so no
  * data row ever shuffles (the job moves F x (bins+1) x 2 counters per
  * partition, independent of table size).
  *
  * This is the cheap closed-form stand-in for the reference's per-candidate
  * CV grid-search LR scoring (`run_evaluation.py:142-243`) used to prune;
  * the same shape the reference itself uses for its MI prefilter
  * (`fairexp.py:117-126`, `mutual_info_classif`). Scores are in nats,
  * normalized by H(y) so the gate threshold is scale-free.
  *
  * The same job also returns each candidate's value fingerprint
  * (order-insensitive sum of xxhash64 of the rounded value) and approx
  * distinct count — feeding the runtime constant prune
  * (`run_evaluation.py:287-290`) and value-equality dedup (`:292-298`)
  * without extra passes.
  */
object MIScorer {

  final case class FeatureStats(
      mi: Double,
      fingerprint: Long,
      distinct: Long,
      min: Double,
      max: Double,
      missing: Long)

  /** @param label boolean/0-1 column (rows with null label are excluded)
    * @param lohi   per-feature (min,max) for binning; names must match feats
    */
  def scoreBatch(
      df: DataFrame,
      feats: Seq[(String, Column)],
      label: Column,
      lohi: Map[String, (Double, Double)],
      bins: Int = 10): Map[String, FeatureStats] = {
    if (feats.isEmpty) return Map.empty
    val y = label.cast("int")

    // Explode the batch to (fid, v, y) rows and aggregate per fid — a wide
    // agg with F x (2*bins+7) aggregate expressions (~1700 for a 64-batch)
    // blows the codegen method limit and falls back to interpreted Janino
    // (measured ~9s/batch at sf0.1); the exploded groupBy keeps ~27 compact
    // aggregates, map-side partial on |F| keys (~3x faster, same results).
    val pairs = feats.zipWithIndex.map { case ((_, c), i) =>
      struct(lit(i).as("fid"), c.cast("double").as("v"))
    }
    val loArr = typedLit(feats.map { case (n, _) => lohi(n)._1 })
    val wArr = typedLit(feats.map { case (n, _) =>
      val (lo, hi) = lohi(n)
      if (hi > lo) (hi - lo) / bins else 1.0
    })
    val hiArr = typedLit(feats.map { case (n, _) => lohi(n)._2 })
    val v = col("v")
    // right-closed equi-width bin in [0, bins-1]; null/NaN -> bin `bins`.
    // The <=lo / >=hi short-circuits equal the ceil formula for finite
    // values AND absorb +-Infinity (whose ceil->int cast throws under ANSI;
    // infs arise from unguarded Div/Inv candidates in one-shot generators).
    val binCol = when(v.isNull || isnan(v), lit(bins))
      .when(v <= element_at(loArr, col("fid") + 1), lit(0))
      .when(v >= element_at(hiArr, col("fid") + 1), lit(bins - 1))
      .otherwise(
        least(greatest(ceil((v - element_at(loArr, col("fid") + 1))
          / element_at(wArr, col("fid") + 1)).cast("int") - 1, lit(0)), lit(bins - 1)))
    val ex = df.filter(y.isNotNull)
      .select(explode(array(pairs: _*)).as("fv"), y.as("__y"))
      .select(col("fv.fid").as("fid"), col("fv.v").as("v"), col("__y"))
      .withColumn("__bin", binCol)

    val aggs: Seq[Column] =
      (0 to bins).flatMap { b =>
        Seq(
          count(when(col("__bin") === b && col("__y") === 0, 1)).as(s"b${b}_0"),
          count(when(col("__bin") === b && col("__y") === 1, 1)).as(s"b${b}_1"))
      } ++ Seq(
        // order-insensitive value fingerprint; bit_xor cannot overflow
        // (ANSI mode makes sum(long) throw at scale)
        call_function("bit_xor", xxhash64(round(v, 6))).as("fp"),
        approx_count_distinct(v).as("dist"),
        min(v).as("mn"),
        max(v).as("mx"),
        count(when(v.isNull || isnan(v), 1)).as("miss"))
    val rows = ex.groupBy(col("fid")).agg(aggs.head, aggs.tail: _*).collect()
    val byFid = rows.map(r => r.getInt(r.fieldIndex("fid")) -> r).toMap
    // a fid missing from the exploded groupBy means zero scored rows (empty
    // fit scope / all-null labels) — the old single-row wide agg returned a
    // row of zero counts; mirror that with a degenerate zero-stats result
    // instead of crashing on byFid(i)
    val empty = FeatureStats(0.0, 0L, 0L, Double.NaN, Double.NaN, 0L)

    feats.zipWithIndex.map { case ((n, _), i) =>
      byFid.get(i) match {
        case None => n -> empty
        case Some(row) =>
          val counts = (0 to bins).map { b =>
            (row.getLong(row.fieldIndex(s"b${b}_0")),
              row.getLong(row.fieldIndex(s"b${b}_1")))
          }
          val total = counts.map(t => t._1 + t._2).sum.toDouble
          val py1 = counts.map(_._2).sum / total
          val py0 = 1.0 - py1
          var mi = 0.0
          counts.foreach { case (c0, c1) =>
            val pb = (c0 + c1) / total
            if (c0 > 0) { val p = c0 / total; mi += p * math.log(p / (pb * py0)) }
            if (c1 > 0) { val p = c1 / total; mi += p * math.log(p / (pb * py1)) }
          }
          val hy = -Seq(py0, py1).filter(_ > 0).map(p => p * math.log(p)).sum
          val fpIdx = row.fieldIndex("fp")
          val mnIdx = row.fieldIndex("mn")
          val mxIdx = row.fieldIndex("mx")
          n -> FeatureStats(
            mi = if (hy > 0) mi / hy else 0.0,
            fingerprint = if (row.isNullAt(fpIdx)) 0L else row.getLong(fpIdx),
            distinct = row.getLong(row.fieldIndex("dist")),
            min = if (row.isNullAt(mnIdx)) Double.NaN else row.getDouble(mnIdx),
            max = if (row.isNullAt(mxIdx)) Double.NaN else row.getDouble(mxIdx),
            missing = row.getLong(row.fieldIndex("miss")))
      }
    }.toMap
  }
}
