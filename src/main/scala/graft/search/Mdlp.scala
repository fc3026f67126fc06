package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fayyad-Irani MDLP supervised discretization, reference-faithful
  * (`transformations/mdlp_discretization/MDLP.py`):
  *
  *  - candidate cuts = midpoints between adjacent distinct values whose
  *    merged class set has more than one class (`feature_boundary_points`)
  *  - best cut per partition = max information gain, smallest cut on ties
  *  - accepted iff gain > (log2(N-1) + delta)/N with
  *    delta = log2(3^k) - k*E + k_left*E_left + k_right*E_right
  *    (the reference uses log2(3^k), not the textbook 3^k - 2 — we match
  *    the reference)
  *  - recurse into both sides; cuts sorted ascending
  *
  * Spark shape: ONE aggregation job collects the (value, class) histogram
  * (cardinality-bounded — this is the reference's own implicit bound, since
  * it materializes unique values); the recursion runs driver-side on prefix
  * sums, O(distinct x classes) per level. The transform lowers to a pure
  * comparison sum (whole-stage codegen).
  */
object Mdlp {

  /** Fit cut points on (value, label). Returns ascending cuts; empty when
    * MDLP rejects every cut (the reference raises "MDLP discretization
    * failed!" — callers drop the candidate; in the search the resulting
    * constant column dies in the constant prune).
    */
  def fitCuts(df: DataFrame, value: Column, label: Column,
      maxDistinct: Int = 100000): IndexedSeq[Double] = {
    val hist = df
      .filter(value.isNotNull && !isnan(value.cast("double")) && label.isNotNull)
      .groupBy(value.cast("double").as("v"), label.cast("string").as("y"))
      .agg(count(lit(1)).as("n"))
      .collect()
    cutsFromHistogram(
      hist.map(r => (r.getDouble(0), r.getString(1), r.getLong(2))), maxDistinct)
  }

  /** The Fayyad-Irani recursion proper, over sorted distinct values and
    * per-value class counts.
    */
  private def runMdlp(values: Array[Double], counts: Array[Array[Long]],
      k: Int): IndexedSeq[Double] = {
    // prefix(i)(c) = counts over values(0..i-1)
    val prefix = Array.ofDim[Long](values.length + 1, k)
    for (i <- values.indices; c <- 0 until k)
      prefix(i + 1)(c) = prefix(i)(c) + counts(i)(c)

    // boundary(i): a candidate cut exists between values(i-1) and values(i)
    val boundary = Array.tabulate(values.length) { i =>
      i > 0 && {
        val merged = (0 until k).count(c => counts(i - 1)(c) > 0 || counts(i)(c) > 0)
        merged > 1
      }
    }

    def rangeCounts(lo: Int, hi: Int): Array[Long] =
      Array.tabulate(k)(c => prefix(hi)(c) - prefix(lo)(c))
    def entropy(cc: Array[Long]): Double = {
      val n = cc.sum.toDouble
      if (n == 0) 0.0
      else -cc.iterator.filter(_ > 0).map { x =>
        val p = x / n; p * (math.log(p) / math.log(2))
      }.sum
    }

    val cuts = collection.mutable.ArrayBuffer[Double]()
    def recurse(lo: Int, hi: Int): Unit = {
      if (hi - lo < 2) return
      val cc = rangeCounts(lo, hi)
      val nTotal = cc.sum.toDouble
      val eFull = entropy(cc)
      // candidates: boundary indices strictly inside the partition range
      val cands = (lo + 1 until hi).filter(boundary)
      if (cands.isEmpty) return
      var bestI = -1
      var bestGain = Double.NegativeInfinity
      cands.foreach { i =>
        val l = rangeCounts(lo, i); val r = rangeCounts(i, hi)
        val gain = eFull -
          (l.sum / nTotal) * entropy(l) - (r.sum / nTotal) * entropy(r)
        if (gain > bestGain + 1e-15) { bestGain = gain; bestI = i } // first on ties
      }
      val l = rangeCounts(lo, bestI); val r = rangeCounts(bestI, hi)
      val kAll = cc.count(_ > 0); val kl = l.count(_ > 0); val kr = r.count(_ > 0)
      val delta = kAll * (math.log(3) / math.log(2)) - kAll * eFull +
        kl * entropy(l) + kr * entropy(r)
      val threshold = ((math.log(nTotal - 1) / math.log(2)) + delta) / nTotal
      if (bestGain > threshold && l.sum > 0 && r.sum > 0) {
        cuts += (values(bestI - 1) + values(bestI)) / 2.0
        recurse(lo, bestI)
        recurse(bestI, hi)
      }
    }
    recurse(0, values.length)
    cuts.sorted.toIndexedSeq
  }

  /** Batch variant: ONE histogram job for many (key, value-column) pairs —
    * rows are exploded as (node, value) pairs so all per-node histograms
    * come back from a single groupBy, instead of one job per MDLP node
    * (the per-layer job count is what dominates search latency).
    */
  def fitCutsBatch(df: DataFrame, nodes: Seq[(String, Column)], label: Column,
      maxDistinct: Int = 100000): Map[String, IndexedSeq[Double]] = {
    if (nodes.isEmpty) return Map.empty
    if (nodes.size == 1) return Map(nodes.head._1 -> fitCuts(df, nodes.head._2, label, maxDistinct))
    val pairs = nodes.zipWithIndex.map { case ((_, c), i) =>
      struct(lit(i).as("nid"), c.cast("double").as("v"))
    }
    val hist = df
      .filter(label.isNotNull)
      .select(explode(array(pairs: _*)).as("nv"), label.cast("string").as("y"))
      .select(col("nv.nid").as("nid"), col("nv.v").as("v"), col("y"))
      .filter(col("v").isNotNull && !isnan(col("v")))
      .groupBy(col("nid"), col("v"), col("y"))
      .agg(count(lit(1)).as("n"))
      .collect()
    val byNode = hist.groupBy(_.getInt(0))
    nodes.zipWithIndex.map { case ((key, _), i) =>
      val rows = byNode.getOrElse(i, Array.empty)
      key -> cutsFromHistogram(
        rows.map(r => (r.getDouble(1), r.getString(2), r.getLong(3))), maxDistinct)
    }.toMap
  }

  /** Driver-side MDLP recursion over a (value, class, count) histogram. */
  private def cutsFromHistogram(hist: Array[(Double, String, Long)],
      maxDistinct: Int): IndexedSeq[Double] = {
    if (hist.isEmpty) return IndexedSeq.empty
    val classes = hist.map(_._2).distinct.sorted
    val classIdx = classes.zipWithIndex.toMap
    val byValue = hist.groupBy(_._1).toArray.sortBy(_._1)
    require(byValue.length <= maxDistinct,
      s"MDLP: ${byValue.length} distinct values exceeds driver bound $maxDistinct")
    val values = byValue.map(_._1)
    val k = classes.length
    val counts = byValue.map { case (_, rows) =>
      val a = new Array[Long](k)
      rows.foreach(r => a(classIdx(r._2)) += r._3)
      a
    }
    runMdlp(values, counts, k)
  }

  /** Lower the fitted cuts to a bin column: bin = #cuts below x (right-
    * closed at cuts), null/NaN -> -1; no accepted cuts -> constant 0
    * (dies in the search's constant prune, reference raises).
    */
  /** The top-level Fayyad-Irani decision WITHOUT recursion: the best
    * boundary midpoint over the full range and whether MDLP accepts it.
    * Unlike the search's internal recursion (which keeps the reference's
    * first-on-ties float compare), gains and the threshold are rounded to
    * 1e-12 with the portable floor formula before comparison, so an
    * independent SQL engine reproduces the choice bit-for-bit (log/entropy
    * chains differ by ULPs across libm implementations).
    */
  def topCut(df: DataFrame, value: Column, label: Column): Option[(Double, Boolean)] = {
    val hist = df
      .filter(value.isNotNull && !isnan(value.cast("double")) && label.isNotNull)
      .groupBy(value.cast("double").as("v"), label.cast("string").as("y"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getDouble(0), r.getString(1), r.getLong(2)))
    if (hist.isEmpty) return None
    val classes = hist.map(_._2).distinct.sorted
    val k = classes.length
    val cidx = classes.zipWithIndex.toMap
    val values = hist.map(_._1).distinct.sorted
    val vidx = values.zipWithIndex.toMap
    val counts = Array.ofDim[Long](values.length, k)
    hist.foreach { case (v, y, n) => counts(vidx(v))(cidx(y)) += n }
    val prefix = Array.ofDim[Long](values.length + 1, k)
    for (i <- values.indices; c <- 0 until k)
      prefix(i + 1)(c) = prefix(i)(c) + counts(i)(c)
    def rangeCounts(lo: Int, hi: Int): Array[Long] =
      Array.tabulate(k)(c => prefix(hi)(c) - prefix(lo)(c))
    def entropy(cc: Array[Long]): Double = {
      val n = cc.sum.toDouble
      if (n == 0) 0.0
      else -cc.iterator.filter(_ > 0).map { x =>
        val p = x / n; p * (math.log(p) / math.log(2))
      }.sum
    }
    def r12(x: Double): Double = math.floor(x * 1e12 + 0.5) / 1e12
    val cc = rangeCounts(0, values.length)
    val nTotal = cc.sum.toDouble
    val eFull = entropy(cc)
    val cands = (1 until values.length).filter { i =>
      (0 until k).count(c => counts(i - 1)(c) > 0 || counts(i)(c) > 0) > 1
    }
    if (cands.isEmpty) return None
    var bestI = -1
    var bestGain = Double.NegativeInfinity
    cands.foreach { i =>
      val l = rangeCounts(0, i); val r = rangeCounts(i, values.length)
      val gain = r12(eFull -
        (l.sum / nTotal) * entropy(l) - (r.sum / nTotal) * entropy(r))
      if (gain > bestGain) { bestGain = gain; bestI = i } // smallest cut on ties
    }
    val l = rangeCounts(0, bestI); val r = rangeCounts(bestI, values.length)
    val kAll = cc.count(_ > 0); val kl = l.count(_ > 0); val kr = r.count(_ > 0)
    val delta = kAll * (math.log(3) / math.log(2)) - kAll * eFull +
      kl * entropy(l) + kr * entropy(r)
    val threshold = r12(((math.log(nTotal - 1) / math.log(2)) + delta) / nTotal)
    Some(((values(bestI - 1) + values(bestI)) / 2.0, bestGain > threshold))
  }

  def binColumn(c: Column, cuts: IndexedSeq[Double]): Column =
    if (cuts.isEmpty) lit(0)
    else {
      val bin = cuts.map(e => when(c > lit(e), 1).otherwise(0)).reduce[Column](_ + _)
      when(c.isNull || isnan(c.cast("double")), -1).otherwise(bin)
    }
}
