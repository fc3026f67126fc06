package graft.queries

import graft.exprs.PortableRound.col6
import graft.Tables
import graft.transcripts.Transcripts
import graft.fairness.FairMetrics
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
    })
  )

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

  val oracles: Map[String, String] = Map(
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
