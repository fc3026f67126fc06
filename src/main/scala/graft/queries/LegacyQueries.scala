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
      ColumnOps.frequencyEncode(
        ColumnOps.ordinalEncode(ev, "event_type", "et_ord"),
        col("event_type"), "__freq")
        .withColumn("et_freq", col6(col("__freq")))
        .select("event_id", "et_ord", "et_freq")
    }),

    "q_rank_quantile" -> ((s, dir) => {
      // both rank ops run from the RAW table (chaining would re-execute the
      // first op's join inside every internal job of the second); the avg
      // rank attaches via the per-VALUE table (unique per value — the row
      // key is not unique in the fixture, so a key join would fan out)
      val li = Tables.lineitem(s, dir)
      // both rank ops bucket on l_extendedprice -> ONE shared bounds agg
      // (bucket ids only steer parallelism; ranks are bucket-invariant)
      val bounds = Some(ColumnOps.rangeBounds(li, col("l_extendedprice")))
      // with the bounds shared, each op's remaining eager step (its totals
      // collect) is independent -> concurrent (FitPool)
      val ops = graft.search.FitPool.all[org.apache.spark.sql.DataFrame](s, "rankfit")(
        () => ColumnOps.quantileBucket(li, 10,
          Seq(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")),
          "price_decile", bounds = bounds),
        () => ColumnOps.valueRanks(li, col("l_extendedprice"), bounds = bounds))
      val dec = ops(0)
      val ranks = ops(1)
        .select(col("__v"),
          col6(col("__cum") + (col("__cnt") + 1) / lit(2.0)).as("price_rank"))
      dec.join(ranks, col("l_extendedprice").cast("double") <=> col("__v"), "left")
        .select(col("l_orderkey"), col("l_linenumber"), col("price_rank"), col("price_decile"))
    }),

    "q_numeric_residue" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      // the rsh bandwidth fit and the shared rank-table fit are independent
      // -> concurrent (FitPool); each job's plan is unchanged
      val fits = graft.search.FitPool.all[Any](s, "residuefit")(
        () => ColumnOps.rshParams(ev, col("value")),
        () => ColumnOps.valueRankTable(ev, col("value")))
      val (n, h) = fits(0).asInstanceOf[(Long, Double)]
      residueParams = Some((n, h)) // oracle SQL embeds the same n/h literals
      // each op runs from the RAW table (chaining re-executes the previous
      // op's join inside the next op's internal jobs); outputs join on key.
      // pp and tt rank the SAME column -> ONE shared value-rank table (one
      // bounds agg + one totals collect; n comes with it, no count jobs)
      val vrt = fits(1).asInstanceOf[ColumnOps.ValueRankTable]
      val pp = ColumnOps.plottingPositionsOn(ev, col("value"), vrt, "__pp")
        .select(col("event_id"), col6(col("__pp")).as("pp"))
      val tt = ColumnOps.trimtailOn(ev, col("value"), vrt, "__tt", p = 0.2)
        .select(col("event_id"), col6(col("__tt")).as("trimmed"))
      // rsh band join over probe subset only — band density grows with sf
      val rs = ColumnOps.rshWith(ev, col("value"), Seq("event_id"), "__rsh",
        n, h, probe = Some(col("event_id") < 2000))
        .select(col("event_id"), col6(col("__rsh")).as("rsh"))
      pp.filter(col("event_id") < 2000)
        .join(tt, "event_id").join(rs, "event_id")
        .select(col("event_id"), col("pp"), col("trimmed"), col("rsh"))
    }),

    // spark.ml-backed mappers are not SQL-expressible; pin them as 1-row
    // properties (like q_ann_recall): the oracle is the literal truth row,
    // so a regression turns the CORRECTNESS row red.
    "q_ml_props" -> ((s, dir) => {
      import s.implicits._
      // bounded probe subset — the property does not need the full table,
      // and two KMeans fits over it would dominate the bench
      val ev = Tables.events(s, dir).filter(col("event_id") < 10000)
      def wssse(k: Int): Double =
        graft.transforms.MlOps.kmeansFeatures(ev, Seq("value"), k)
          .agg(sum(pow(col("cluster_dist"), 2))).head().getDouble(0)
      // the two seeded KMeans fits and the Word2Vec chain are independent
      // deterministic probes -> concurrent (FitPool), identical values
      val probes = graft.search.FitPool.all[Any](s, "mlprops")(
        () => wssse(8),
        () => wssse(2),
        () => {
          val wv = graft.transforms.MlOps.avgWord2Vec(Tables.documents(s, dir), "text")
          val arr = org.apache.spark.ml.functions.vector_to_array(col("doc_vec"))
          val bad = wv.filter(size(arr) =!= 16 ||
            exists(arr, x => isnan(x) || x === Double.PositiveInfinity)).count()
          (bad, wv.count())
        })
      val kmeansOk = probes(0).asInstanceOf[Double] < probes(1).asInstanceOf[Double]
      val (bad, total) = probes(2).asInstanceOf[(Long, Long)]
      Seq((if (kmeansOk) 1L else 0L,
        if (bad == 0 && total > 0) 1L else 0L)).toDF("kmeans_wssse_ok", "w2v_ok")
    }),

    "q_contrasts" -> ((s, dir) => {
      // event_type has a stable 5-level domain across scale factors
      val ev = Tables.events(s, dir)
      val h = ColumnOps.helmertEncode(ev, "event_type", "h")
      val b = ColumnOps.backwardDifferenceEncode(h, "event_type", "bd")
      b.select(col("event_id") +:
        ((1 to 4).map(j => col(s"h_$j")) ++ (1 to 4).map(j => col(s"bd_$j"))): _*)
    }),

    "q_parsers" -> ((s, dir) => {
      // parser INPUTS are derived deterministically from the events table
      // (no external data); the same derivation exists in the oracle SQL
      val ev = Tables.events(s, dir).select(
        col("event_id"),
        (col("value") % 180.0 - 90.0).as("lat"),
        ((col("value") * 2.0) % 360.0 - 180.0).as("lon"),
        concat(lit("("), lpad((col("event_id") % 900 + 100).cast("string"), 3, "0"),
          lit(") 555-"), lpad((col("event_id") % 10000).cast("string"), 4, "0")).as("phone_raw"),
        concat((col("event_id") % 9999 + 1).cast("string"), lit(" Main Street Apt "),
          (col("event_id") % 50).cast("string"), lit(", Springfield "),
          lpad((col("event_id") % 100000).cast("string"), 5, "0")).as("addr_raw"))
      val cart = ColumnOps.latLonCartesian(col("lat"), col("lon"))
        .map { case (n, c) => col6(c).as(n) }
      val phone = ColumnOps.parsePhone(col("phone_raw")).map { case (n, c) => c.as(n) }
      val addr = ColumnOps.parseAddress(col("addr_raw")).map { case (n, c) => c.as(n) }
      ev.select(col("event_id") +: (cart ++ phone ++ addr): _*)
    }),

    "q_winsorize" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      // the two fits (exact-percentile bounds, mean) are independent
      // aggregates -> concurrent (FitPool); each job's plan is unchanged
      val fits = graft.search.FitPool.all[Any](s, "winsfit")(
        () => ColumnOps.winsorizeBounds(li, col("l_extendedprice"), 0.05),
        () => li.agg(avg(col("l_quantity"))).head().getDouble(0))
      val b = fits(0).asInstanceOf[(Double, Double)]
      val mean = fits(1).asInstanceOf[Double]
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

  /** (n, h) from the q_numeric_residue run — the oracle embeds the same
    * bandwidth literals (POW differs by ULPs across engines).
    */
  @volatile private var residueParams: Option[(Long, Double)] = None

  private def dlit(v: Double): String = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
  private def pr(x: String): String =
    s"FLOOR(CAST(($x) AS DOUBLE) * 1000000 + 0.5) / 1000000"

  private def residueOracle(n: Long, h: Double): String = {
    val cut = math.floor(0.2 * n).toLong
    val denom = dlit(n + 1 - 0.4 - 0.4)
    val rshDen = dlit(2.0 * n * h)
    s"""WITH rk AS (
       |  SELECT event_id, value,
       |         CAST(RANK() OVER (ORDER BY value) AS DOUBLE) +
       |           (CAST(COUNT(*) OVER (PARTITION BY value) AS DOUBLE) - 1) / 2.0 AS avg_rank,
       |         COUNT(*) OVER (ORDER BY value) AS cum_end
       |  FROM events),
       |x AS (SELECT event_id, value, FLOOR(value / ${dlit(h)}) AS bk FROM events
       |      WHERE event_id < 2000),
       |v AS (SELECT value AS d, FLOOR(value / ${dlit(h)}) AS dbk FROM events),
       |cnt AS (
       |  SELECT x.event_id, COUNT(*) AS band
       |  FROM x JOIN v ON v.dbk BETWEEN x.bk - 1 AND x.bk + 1
       |              AND v.d >= x.value - ${dlit(h)} AND v.d <= x.value + ${dlit(h)}
       |  GROUP BY x.event_id)
       |SELECT rk.event_id,
       |  ${pr(s"(avg_rank - 0.4) / $denom")} AS pp,
       |  ${pr(s"CASE WHEN cum_end > $cut THEN value END")} AS trimmed,
       |  ${pr(s"band / $rshDen")} AS rsh
       |FROM rk JOIN cnt USING (event_id)
       |WHERE rk.event_id < 2000""".stripMargin
  }

  def oracles: Map[String, String] =
    staticOracles ++ residueParams.map { case (n, h) => "q_numeric_residue" -> residueOracle(n, h) }

  private val staticOracles: Map[String, String] = Map(
    "q_ml_props" ->
      "SELECT CAST(1 AS BIGINT) AS kmeans_wssse_ok, CAST(1 AS BIGINT) AS w2v_ok",

    "q_contrasts" -> {
      val k = 5
      val hCols = (1 until k).map(j =>
        s"CASE WHEN i < $j THEN -1.0 WHEN i = $j THEN CAST($j AS DOUBLE) ELSE 0.0 END AS h_$j")
      val bdCols = (1 until k).map(j =>
        s"CASE WHEN i < $j THEN -($k - $j) / $k.0 ELSE $j / $k.0 END AS bd_$j")
      s"""WITH dict AS (
         |  SELECT event_type, CAST(ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS INT) AS i
         |  FROM (SELECT DISTINCT event_type FROM events))
         |SELECT e.event_id,
         |  ${(hCols ++ bdCols).mkString(",\n  ")}
         |FROM events e JOIN dict USING (event_type)""".stripMargin
    },

    "q_parsers" ->
      s"""WITH e AS (
         |  SELECT event_id,
         |         value % 180.0 - 90.0 AS lat,
         |         (value * 2.0) % 360.0 - 180.0 AS lon,
         |         '(' || lpad(CAST(event_id % 900 + 100 AS VARCHAR), 3, '0') || ') 555-' ||
         |           lpad(CAST(event_id % 10000 AS VARCHAR), 4, '0') AS phone_raw,
         |         CAST(event_id % 9999 + 1 AS VARCHAR) || ' Main Street Apt ' ||
         |           CAST(event_id % 50 AS VARCHAR) || ', Springfield ' ||
         |           lpad(CAST(event_id % 100000 AS VARCHAR), 5, '0') AS addr_raw
         |  FROM events),
         |d AS (SELECT *, regexp_replace(phone_raw, '[^0-9]', '', 'g') AS digits FROM e)
         |SELECT event_id,
         |  ${pr("6371.230 * COS(RADIANS(lat)) * COS(RADIANS(lon))")} AS coord_x,
         |  ${pr("6371.230 * COS(RADIANS(lat)) * SIN(RADIANS(lon))")} AS coord_y,
         |  ${pr("6371.230 * SIN(RADIANS(lat))")} AS coord_z,
         |  digits AS phone_digits,
         |  substr(digits, 1, 3) AS phone_area,
         |  right(digits, 4) AS phone_line,
         |  regexp_extract(addr_raw, '^([0-9]+)', 1) AS addr_house,
         |  regexp_extract(addr_raw, '^[0-9]+ ([A-Za-z]+ [A-Za-z]+)', 1) AS addr_street,
         |  regexp_extract(addr_raw, '([0-9]{5})${"$"}', 1) AS addr_zip
         |FROM d""".stripMargin,

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
