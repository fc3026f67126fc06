package graft.queries

import graft.exprs.PortableRound.col6
import graft.Tables
import graft.transcripts.Transcripts
import graft.transforms.ColumnOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Legacy per-column mapper queries (SURVEY §2.6) with DuckDB oracles. */
object LegacyQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dates" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .withColumn("d", col("o_orderdate").cast("timestamp"))
      o.select(col("o_orderkey") +:
        ColumnOps.dateExpansion(col("d")).map { case (n, c) => c.as(n) }: _*)
    }),

    "q_encoders" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      ColumnOps.ordinalEncode(ev, "event_type", "et_ord")
        .withColumn("et_freq", col6(ColumnOps.frequencyEncode(col("event_type"))))
        .select("event_id", "et_ord", "et_freq")
    }),

    "q_rank_quantile" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.select(
        col("l_orderkey"), col("l_linenumber"),
        col6(ColumnOps.rankAverage(col("l_extendedprice"))).as("price_rank"),
        ColumnOps.quantileBucket(10, col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
          .cast("long").as("price_decile"))
    }),

    "q_winsorize" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val b = ColumnOps.winsorizeBounds(li, col("l_extendedprice"), 0.05)
      val mean = li.agg(avg(col("l_quantity"))).head().getDouble(0)
      li.select(
        col("l_orderkey"), col("l_linenumber"),
        col6(ColumnOps.winsorize(col("l_extendedprice"), b)).as("price_w"),
        ColumnOps.binarize(col("l_quantity"), mean).as("qty_bin"))
    }),

    "q_parse_numbers" -> ((s, dir) => {
      Transcripts.fromEvents(Tables.events(s, dir)).select(
        col("conv_id"), col("turn_idx").cast("long").as("turn_idx"),
        ColumnOps.parseNumber(col("text")).as("v_cents"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_dates" ->
      """SELECT o_orderkey,
        |  epoch_us(o_orderdate) AS ts_unix,
        |  CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS ts_year,
        |  CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS ts_month,
        |  CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS ts_day,
        |  CAST(EXTRACT(DOW FROM o_orderdate) + 1 AS BIGINT) AS ts_dow,
        |  CAST(EXTRACT(DOY FROM o_orderdate) AS BIGINT) AS ts_doy,
        |  CAST(EXTRACT(HOUR FROM o_orderdate) AS BIGINT) AS ts_hour
        |FROM orders""".stripMargin,

    "q_encoders" ->
      """WITH dict AS (
        |  SELECT event_type, CAST(ROW_NUMBER() OVER (ORDER BY event_type) AS BIGINT) AS et_ord
        |  FROM (SELECT DISTINCT event_type FROM events)),
        |t AS (SELECT COUNT(*) AS total FROM events),
        |f AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type)
        |SELECT e.event_id, d.et_ord,
        |       FLOOR(CAST((CAST(f.n AS DOUBLE) / t.total) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS et_freq
        |FROM events e JOIN dict d USING (event_type) JOIN f USING (event_type), t""".stripMargin,

    "q_rank_quantile" ->
      """SELECT l_orderkey, l_linenumber,
        |  FLOOR(CAST((CAST(RANK() OVER (ORDER BY l_extendedprice) AS DOUBLE) +
        |        (CAST(COUNT(*) OVER (PARTITION BY l_extendedprice) AS DOUBLE) - 1) / 2.0) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS price_rank,
        |  CAST(NTILE(10) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS BIGINT) AS price_decile
        |FROM lineitem""".stripMargin,

    "q_winsorize" ->
      """WITH s AS (
        |  SELECT QUANTILE_CONT(l_extendedprice, 0.05) AS lo,
        |         QUANTILE_CONT(l_extendedprice, 0.95) AS hi,
        |         AVG(l_quantity) AS mu
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber,
        |  FLOOR(CAST((LEAST(GREATEST(l_extendedprice, lo), hi)) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS price_w,
        |  CAST(CASE WHEN l_quantity > mu THEN 1 ELSE 0 END AS BIGINT) AS qty_bin
        |FROM lineitem, s""".stripMargin,

    "q_parse_numbers" ->
      s"""WITH ${Transcripts.sqlCte}
         |SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
         |       CAST(regexp_extract(text, 'v(-?\\d+)', 1) AS BIGINT) AS v_cents
         |FROM transcripts""".stripMargin
  )
}
