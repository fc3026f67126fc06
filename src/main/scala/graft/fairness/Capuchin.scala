package graft.fairness

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Capuchin repair baseline (`benchmark/capuchin.py:9-117`): per admissible
  * context, the (target x sensitive) contingency matrix of counts is
  * replaced by its best rank-1 nonnegative approximation (rank-1 NMF =
  * leading singular pair, nonnegative by Perron-Frobenius); tuple weights =
  * repaired count / original count. Rank-1 independence of (sensitive,
  * target) within every admissible context is the repair criterion.
  *
  * Spark shape: ONE groupBy cube over (admissible..., sensitive, target);
  * the per-context matrices are tiny (|target| x |sensitive|) and the power
  * iteration runs driver-side over the collected cube (context cardinality
  * is bounded by the binned admissible space).
  */
object Capuchin {

  final case class RepairedCell(
      context: Seq[String], sensitive: String, target: String,
      count: Long, repaired: Double, weight: Double)

  /** The rank-1 decomposition of one context's contingency matrix:
    * repaired(y, s) = sigma * u(y) * v(s). Exposed so an oracle can embed
    * the FITTED factors as literals (the IVF-centroid pattern) and
    * recompute the outer product + weights independently in SQL.
    */
  final case class Rank1Factors(
      sigma: Double, u: Map[String, Double], v: Map[String, Double])

  def repair(
      df: DataFrame,
      admissible: Seq[String],
      sensitive: Column,
      target: Column): Seq[RepairedCell] =
    repairWithFactors(df, admissible, sensitive, target)._1

  def repairWithFactors(
      df: DataFrame,
      admissible: Seq[String],
      sensitive: Column,
      target: Column): (Seq[RepairedCell], Map[Seq[String], Rank1Factors]) = {
    val cube = df.groupBy(
        (admissible.map(c => col(c).cast("string").as(c)) :+
          sensitive.cast("string").as("__s") :+ target.cast("string").as("__y")): _*)
      .agg(count(lit(1)).as("n"))
      .collect()

    val perCtx = cube.groupBy(r => admissible.indices.map(r.getString).toSeq).toSeq.map {
      case (ctx, rows) =>
        val ss = rows.map(_.getString(admissible.size)).distinct.sorted
        val ys = rows.map(_.getString(admissible.size + 1)).distinct.sorted
        val m = Array.ofDim[Double](ys.size, ss.size)
        rows.foreach { r =>
          m(ys.indexOf(r.getString(admissible.size + 1)))(ss.indexOf(r.getString(admissible.size))) =
            r.getLong(admissible.size + 2).toDouble
        }
        val (sigma, u, v) = rank1Factors(m)
        val cells = rows.map { r =>
          val yi = ys.indexOf(r.getString(admissible.size + 1))
          val si = ss.indexOf(r.getString(admissible.size))
          val n = r.getLong(admissible.size + 2)
          val approx = sigma * u(yi) * v(si)
          RepairedCell(ctx, ss(si), ys(yi), n, approx,
            if (n == 0) 1.0 else approx / n)
        }
        (ctx, cells,
          Rank1Factors(sigma, ys.zip(u).toMap, ss.zip(v).toMap))
    }
    (perCtx.flatMap(_._2), perCtx.map(p => p._1 -> p._3).toMap)
  }

  /** Best rank-1 nonnegative approximation via power iteration. */
  private[fairness] def rank1(m: Array[Array[Double]], iters: Int = 200): Array[Array[Double]] = {
    val (sigma, u, v) = rank1Factors(m, iters)
    Array.tabulate(m.length, m(0).length)((i, j) => sigma * u(i) * v(j))
  }

  /** (sigma, u, v) of the leading singular pair, u/v nonnegative. */
  private[fairness] def rank1Factors(
      m: Array[Array[Double]], iters: Int = 200): (Double, Array[Double], Array[Double]) = {
    val rows = m.length; val cols = m(0).length
    var v = Array.fill(cols)(1.0 / math.sqrt(cols))
    var u = Array.fill(rows)(0.0)
    var sigma = 0.0
    (0 until iters).foreach { _ =>
      u = Array.tabulate(rows)(i => (0 until cols).map(j => m(i)(j) * v(j)).sum)
      val un = math.sqrt(u.map(x => x * x).sum)
      if (un > 0) u = u.map(_ / un)
      v = Array.tabulate(cols)(j => (0 until rows).map(i => m(i)(j) * u(i)).sum)
      sigma = math.sqrt(v.map(x => x * x).sum)
      if (sigma > 0) v = v.map(_ / sigma)
    }
    (sigma, u, v)
  }
}
