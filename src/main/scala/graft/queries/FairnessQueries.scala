package graft.queries

import graft.exprs.PortableRound.col6
import graft.Tables
import graft.transcripts.Transcripts
import graft.fairness.{Capuchin, FairExp, FairMetrics}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fairness-aggregate queries (ROD / CDP / CTPB / CTNB) over transcripts
  * with a deterministic pseudo-prediction, so the whole metric pipeline is
  * DuckDB-checkable: bin -> per-(context, sensitive) rates -> pivot ->
  * weighted combine.
  */
object FairnessQueries {

  /** Deterministic scaffold: pseudo-probability from text_len, protected
    * flag from the conv id parity, binary label from a different residue.
    */
  private def base(s: SparkSession, dir: String): DataFrame =
    Transcripts.fromEvents(Tables.events(s, dir))
      .withColumn("text_len", length(col("text")))
      .withColumn("p", (col("text_len") * 37 % 97).cast("double") / 96.0)
      .withColumn("prot", substring(col("conv_id"), 2, 10).cast("int") % 2 === 0)
      .withColumn("pbin", (col("text_len") * 37 % 97 > 48).cast("int"))
      .withColumn("ytrue", (col("text_len") * 13 % 2).cast("int"))

  private val ctx = Seq("role", "text_len")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rod" -> ((s, dir) => {
      val b = base(s, dir)
      FairMetrics.rod(b, col("p"), col("prot"), ctx)
        .select(col6(col("rod")).as("rod"))
    }),
    "q_cdp" -> ((s, dir) => {
      val b = base(s, dir)
      FairMetrics.cdp(b, col("pbin"), col("prot"), ctx)
        .select(col6(col("cdp")).as("cdp"))
    }),
    "q_ctpb" -> ((s, dir) => {
      val b = base(s, dir)
      FairMetrics.ctpb(b, col("ytrue"), col("pbin"), col("prot"), ctx)
        .select(col6(col("ctpb")).as("ctpb"))
    }),
    "q_ctnb" -> ((s, dir) => {
      val b = base(s, dir)
      FairMetrics.ctnb(b, col("ytrue"), col("pbin"), col("prot"), ctx)
        .select(col6(col("ctnb")).as("ctnb"))
    }),

    // Capuchin repair with a GENERATED full-value oracle (the IVF-centroid
    // pattern): the contingency cube over (role, prot, ytrue) is recomputed
    // from raw data in DuckDB; the fitted rank-1 factors (sigma, u, v) embed
    // as literals and the oracle recomputes repaired = sigma*u(y)*v(s) and
    // weight = repaired/n independently — only the power iteration itself
    // is trusted, exactly like fitted scalers.
    "q_capuchin" -> ((s, dir) => {
      import s.implicits._
      val b = base(s, dir)
      val (cells, factors) =
        Capuchin.repairWithFactors(b, Seq("role"), col("prot"), col("ytrue"))
      capuchinFactors = Some(factors)
      cells.map(c => (c.context.head, c.sensitive, c.target, c.count,
          r6(c.repaired), r6(c.weight)))
        .toSeq.toDF("role", "s", "y", "n", "repaired", "weight")
    }),

    // FairExp end-to-end (forward-floating search + fairness repair +
    // Pareto pick) as a planted-bias 1-row property gate: `x_fair` drives
    // the label imperfectly, `x_leak` encodes the protected attribute plus
    // a small label bonus (predictive but unfair), `x_junk` is noise. The
    // pipeline must keep x_fair, and the repair/Pareto stage must emit a
    // winner WITHOUT x_leak that is at least as fair as the biased pair.
    "q_fairexp" -> ((s, dir) => {
      import s.implicits._
      val ev0 = Tables.events(s, dir).filter(col("event_id") < 3000)
      val med = ev0.agg(percentile(col("value"), lit(0.5))).head().getDouble(0)
      val ev = ev0.select(
          col("event_id"),
          col("value"),
          (col("event_id") % 2 === 0).as("prot"),
          (pmod(xxhash64(col("event_id")), lit(1000)).cast("double") / 1000.0).as("u1"),
          (pmod(xxhash64(col("event_id") + 7), lit(1000)).cast("double") / 1000.0).as("u2"))
        .withColumn("y", (col("value") > med).cast("int"))
        // fair-but-noisy: the label signal blurred by +-1.5 median-widths
        .withColumn("x_fair", col("value") + (col("u1") - 0.5) * lit(3.0) * abs(lit(med)))
        .withColumn("x_leak", col("prot").cast("double") * 0.8 + col("y") * 0.3)
        .withColumn("x_junk", col("u2"))
        .withColumn("ctx", (col("u1") > 0.5).cast("string"))
        // pin partition layout: LR's treeAggregate sums floats in partition
        // order, so an unpinned fixture could flip the gate booleans with
        // SPARK_GRAFT_CPUS / scan split count (the Boruta lesson)
        .repartition(4, col("event_id")).sortWithinPartitions("event_id")
      val res = FairExp.run(ev, Seq("x_fair", "x_leak", "x_junk"), "y",
        col("prot"), Seq("ctx"), f1Tolerance = 0.07)
      val biasedPair = res.visited
        .find(_.features.toSet == Set("x_fair", "x_leak"))
        .getOrElse(FairExp.evaluate(ev, Seq("x_fair", "x_leak"), "y",
          col("prot"), Seq("ctx")))
      val keepsFair = res.selected.contains("x_fair")
      val dropsLeak = !res.selected.contains("x_leak")
      val fairer = res.rod >= biasedPair.rod - 1e-12
      Seq((b2l(keepsFair), b2l(dropsLeak), b2l(fairer)))
        .toDF("keeps_fair_ok", "drops_leak_ok", "fairer_than_biased_ok")
    })
  )

  private def b2l(b: Boolean): Long = if (b) 1L else 0L
  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Fitted rank-1 factors stashed by q_capuchin when it runs (Verify runs
    * every query before dumping oracle_sql.json).
    */
  @volatile private var capuchinFactors:
      Option[Map[Seq[String], Capuchin.Rank1Factors]] = None

  private def dlit(v: Double): String =
    s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"

  private def capuchinSql(factors: Map[Seq[String], Capuchin.Rank1Factors]): String = {
    val sig = factors.toSeq.sortBy(_._1.head).map { case (ctx, f) =>
      s"('${ctx.head}', ${dlit(f.sigma)})"
    }.mkString(", ")
    val uf = factors.toSeq.flatMap { case (ctx, f) =>
      f.u.toSeq.sorted.map { case (y, u) => s"('${ctx.head}', '$y', ${dlit(u)})" }
    }.mkString(", ")
    val vf = factors.toSeq.flatMap { case (ctx, f) =>
      f.v.toSeq.sorted.map { case (sv, v) => s"('${ctx.head}', '$sv', ${dlit(v)})" }
    }.mkString(", ")
    s"""$baseSql,
       |cube AS (
       |  SELECT role, CAST(prot AS VARCHAR) AS s, CAST(ytrue AS VARCHAR) AS y,
       |         COUNT(*) AS n
       |  FROM b0 GROUP BY role, s, y),
       |sig(role, sigma) AS (VALUES $sig),
       |uf(role, y, u) AS (VALUES $uf),
       |vf(role, s, v) AS (VALUES $vf)
       |SELECT cube.role AS role, s, y, CAST(n AS BIGINT) AS n,
       |       FLOOR(CAST((sigma * u * v) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS repaired,
       |       FLOOR(CAST((sigma * u * v / n) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS weight
       |FROM cube JOIN sig USING (role) JOIN uf USING (role, y) JOIN vf USING (role, s)""".stripMargin
  }

  private val baseSql: String =
    s"""WITH ${Transcripts.sqlCte},
       |b0 AS (
       |  SELECT role, LENGTH(text) AS text_len,
       |         CAST((LENGTH(text) * 37) % 97 AS DOUBLE) / 96.0 AS p,
       |         (CAST(SUBSTR(conv_id, 2) AS INT) % 2 = 0) AS prot,
       |         CASE WHEN (LENGTH(text) * 37) % 97 > 48 THEN 1 ELSE 0 END AS pbin,
       |         CAST((LENGTH(text) * 13) % 2 AS INT) AS ytrue
       |  FROM transcripts),
       |qs AS (
       |  SELECT QUANTILE_CONT(CAST(text_len AS DOUBLE), 0.25) AS q1,
       |         QUANTILE_CONT(CAST(text_len AS DOUBLE), 0.50) AS q2,
       |         QUANTILE_CONT(CAST(text_len AS DOUBLE), 0.75) AS q3
       |  FROM b0),
       |b AS (
       |  SELECT role,
       |         CAST((CASE WHEN text_len > q1 THEN 1 ELSE 0 END) +
       |              (CASE WHEN text_len > q2 THEN 1 ELSE 0 END) +
       |              (CASE WHEN text_len > q3 THEN 1 ELSE 0 END) AS VARCHAR) AS tl_bin,
       |         p, prot, pbin, ytrue
       |  FROM b0, qs)""".stripMargin

  private def gapSql(rateExpr: String, restrict: String, out: String): String =
    s"""$baseSql,
       |g AS (
       |  SELECT role, tl_bin, prot, AVG(CASE WHEN $restrict THEN $rateExpr END) AS rate, COUNT(*) AS n
       |  FROM b GROUP BY role, tl_bin, prot),
       |piv AS (
       |  SELECT role, tl_bin, MAX(rate) AS mx, MIN(rate) AS mn,
       |         COUNT(DISTINCT prot) AS ns, SUM(n) AS nz
       |  FROM g GROUP BY role, tl_bin),
       |t AS (SELECT SUM(nz) AS total FROM piv)
       |SELECT FLOOR(CAST((SUM((mx - mn) * nz / total)) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS $out
       |FROM piv, t WHERE ns > 1 AND mx IS NOT NULL AND mn IS NOT NULL""".stripMargin

  def oracles: Map[String, String] =
    capuchinFactors.map(f => "q_capuchin" -> capuchinSql(f)).toMap ++ staticOracles

  private val staticOracles: Map[String, String] = Map(
    "q_fairexp" ->
      ("SELECT CAST(1 AS BIGINT) AS keeps_fair_ok, CAST(1 AS BIGINT) AS drops_leak_ok, " +
        "CAST(1 AS BIGINT) AS fairer_than_biased_ok"),

    "q_rod" ->
      s"""$baseSql,
         |g AS (
         |  SELECT role, tl_bin, prot, AVG(p) AS p1, COUNT(*) AS n
         |  FROM b GROUP BY role, tl_bin, prot),
         |piv AS (
         |  SELECT role, tl_bin,
         |         MAX(CASE WHEN prot THEN p1 END) AS p1_prot,
         |         MAX(CASE WHEN NOT prot THEN p1 END) AS p1_not,
         |         SUM(n) AS nz
         |  FROM g GROUP BY role, tl_bin),
         |t AS (SELECT SUM(nz) AS total FROM piv),
         |ors AS (
         |  SELECT (COALESCE(p1_not, 0.5) / (1 - COALESCE(p1_not, 0.5))) *
         |         ((1 - COALESCE(p1_prot, 0.5)) / COALESCE(p1_prot, 0.5)) AS orv, nz
         |  FROM piv)
         |SELECT FLOOR(CAST((-ABS(SUM(orv * nz / total) - 1.0)) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS rod
         |FROM ors, t WHERE orv = orv AND ABS(orv) < 1e308""".stripMargin,
    "q_cdp"  -> gapSql("CAST(pbin AS DOUBLE)", "TRUE", "cdp"),
    "q_ctpb" -> gapSql("CAST(pbin AS DOUBLE)", "ytrue = 1", "ctpb"),
    "q_ctnb" -> gapSql("1.0 - CAST(pbin AS DOUBLE)", "ytrue = 0", "ctnb")
  )
}
