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
    * values, attached via broadcast join. The dict ids come from the
    * range-bucketed [[ordinalRank]] (distinct values are unique, so the
    * numbering equals a global sort without any single-partition window —
    * the encoding stays exact even for high-cardinality ordinal domains).
    */
  def ordinalEncode(df: DataFrame, c: String, out: String): DataFrame = {
    val isString = df.schema(c).dataType == org.apache.spark.sql.types.StringType
    val bucketBy = if (isString) Some(stringProxy(col(c))) else None
    val dict = ordinalRank(df.select(col(c)).distinct(), Seq(col(c)), out,
      bucketBy = bucketBy)
    df.join(broadcast(dict), Seq(c), "left")
  }

  /** Frequency encoding: relative frequency of the value. The total is a
    * driver scalar (one count job) — an empty-partition window for it would
    * single-partition the whole table.
    */
  def frequencyEncode(df: DataFrame, c: Column, out: String): DataFrame = {
    val total = df.count()
    df.withColumn(out,
      count(lit(1)).over(Window.partitionBy(c)).cast("double") / lit(total.toDouble))
  }

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

  private def contrastEncode(df: DataFrame, c: String, out: String,
      maxLevels: Int = 1000)(
      coef: (Int, Int, Int) => Double): DataFrame = {
    // contrast coding is only defined for bounded categorical domains; the
    // cap turns a mistakenly-continuous column into a clear error instead
    // of a driver OOM (the dict itself is k rows, k-1 output columns)
    val levels = df.select(col(c).cast("string").as(c)).distinct()
      .limit(maxLevels + 1)
      .collect().map(_.getString(0)).sorted
    require(levels.length <= maxLevels,
      s"contrast coding needs a bounded categorical domain; '$c' has > $maxLevels levels")
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

  // ---- scale-safe global ranks ----------------------------------------

  /** Deterministic range-bucket id for `c` from approx-quantile boundaries
    * (a literal comparison chain — unlike repartitionByRange, whose
    * RangePartitioner reseeds its sampler per JOB via the RDD id, so two
    * actions over the same frame can disagree on partition bounds).
    * Rows with equal `c` always share a bucket; nulls land in bucket 0.
    */
  private def rangeBucket(df: DataFrame, c: Column, parts: Int): Column =
    bucketExpr(c, rangeBounds(df, c, parts))

  /** The driver-side half of [[rangeBucket]]: approx-quantile bucket BOUNDS
    * for `c` (distinct, ascending). Exposed so two rank ops over the SAME
    * column share one bounds aggregate instead of each running its own —
    * the bucket id only steers parallelism; every rank/offset downstream is
    * bucket-invariant, so shared bounds are bit-identical by construction.
    */
  def rangeBounds(df: DataFrame, c: Column, parts: Int = 32): Seq[Double] = {
    val probs = (1 until parts).map(_.toDouble / parts)
    // NOT spread like [[spread1]]: measured — the approx sketch's per-row
    // update is cheap enough that a repartition costs more than it saves
    // (q_rank_quantile 3.35 -> 4.27 s with a spread here; reverted)
    val row = df.agg(percentile_approx(c.cast("double"), typedLit(probs), lit(10000))
      .as("__b")).head()
    if (row.isNullAt(0)) Seq.empty[Double]
    else row.getSeq[Double](0).distinct
  }

  private def bucketExpr(c: Column, bounds: Seq[Double]): Column =
    bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(c.cast("double") > lit(b), 1).otherwise(0)
    }

  /** Per-distinct-value rank table `(__v, __cnt, __cum)` where `__cum` is
    * the number of rows strictly below the value. The global cumulative sum
    * is computed WITHOUT a single-partition window: values get deterministic
    * range buckets, each bucket cumsums locally under a per-bucket window,
    * and per-bucket offsets (`parts` scalars) are added back.
    * Nulls are excluded (null rank = null downstream).
    */
  def valueRanks(df: DataFrame, c: Column, parts: Int = 32,
      bounds: Option[Seq[Double]] = None): DataFrame =
    valueRankTable(df, c, parts, bounds).ranks

  /** [[valueRanks]] plus the non-null row count `n` — `n` is the sum of the
    * per-bucket totals the op ALREADY collects for its prefix offsets, so a
    * caller that needs both (plotting positions, trimtail) pays no separate
    * count job, and two ops over the same column can share one table.
    */
  final case class ValueRankTable(ranks: DataFrame, n: Long)

  def valueRankTable(df: DataFrame, c: Column, parts: Int = 32,
      bounds: Option[Seq[Double]] = None): ValueRankTable = {
    val bucket = bucketExpr(c, bounds.getOrElse(rangeBounds(df, c, parts)))
    val vals = df.select(c.cast("double").as("__v"), bucket.as("__pid"))
      .filter(col("__v").isNotNull)
      .groupBy(col("__v"), col("__pid")).agg(count(lit(1)).as("__cnt"))
    // per-bucket totals -> prefix offsets; `parts` scalars to the driver
    val totals = vals.groupBy(col("__pid")).agg(sum(col("__cnt")).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = totals.keys.toSeq.sorted
    val offsets = pids.zip(pids.scanLeft(0L)((acc, p) => acc + totals(p)).init).toMap
    val w = Window.partitionBy(col("__pid")).orderBy(col("__v"))
    val ranks = vals
      .withColumn("__cum",
        sum(col("__cnt")).over(w) - col("__cnt") +
          coalesce(element_at(typedLit(offsets), col("__pid")), lit(0L)))
      .select(col("__v"), col("__cnt"), col("__cum"))
    ValueRankTable(ranks, totals.values.sum)
  }

  /** scipy rankdata(method='average') as a whole-table op: min-rank +
    * (ties-1)/2 = rows-below + (ties+1)/2, attached via a value join against
    * [[valueRanks]] (hash join; AQE broadcasts the rank table when small).
    */
  def rankAverage(df: DataFrame, c: Column, out: String): DataFrame = {
    val ranks = valueRanks(df, c)
      .select(col("__v"), (col("__cum") + (col("__cnt") + 1) / lit(2.0)).as(out))
    df.join(ranks, c.cast("double") <=> col("__v"), "left").drop("__v")
  }

  /** Global ordinal rank 1..N over a caller-supplied TOTAL order (supply
    * tie-break columns). Range-partitioned two-pass, like [[valueRanks]].
    */
  /** Monotone numeric proxy over a string's first three codepoints (UTF-8
    * order for BMP text). Shared prefixes collapse to one value — exactly
    * what range-bucketing needs (ties stay in one bucket; the in-bucket
    * window still sorts by the full value).
    */
  def stringProxy(c: Column): Column = {
    val M = 1114112L // beyond any Unicode codepoint
    def cp(i: Int) = coalesce(ascii(substring(c, i, 1)).cast("long"), lit(0L))
    cp(1) * lit(M * M) + cp(2) * lit(M) + cp(3)
  }

  def ordinalRank(df: DataFrame, orderCols: Seq[Column], out: String,
      parts: Int = 32, bucketBy: Option[Column] = None,
      bounds: Option[Seq[Double]] = None): DataFrame =
    ordinalRankN(df, orderCols, out, parts, bucketBy, bounds)._1

  /** [[ordinalRank]] plus the TOTAL row count (the per-bucket totals' sum —
    * no separate count job for callers like [[quantileBucket]]).
    */
  private def ordinalRankN(df: DataFrame, orderCols: Seq[Column], out: String,
      parts: Int, bucketBy: Option[Column],
      bounds: Option[Seq[Double]]): (DataFrame, Long) = {
    // deterministic buckets on the FIRST order column (ties stay together;
    // remaining order columns only break ties inside a bucket). For string
    // orders pass bucketBy = stringProxy(col) — the bucket function must be
    // numeric and monotone in the window order.
    val bucketCol = bucketBy.getOrElse(orderCols.head)
    val ranged = df.withColumn("__pid",
      bucketExpr(bucketCol, bounds.getOrElse(rangeBounds(df, bucketCol, parts))))
    val totals = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = totals.keys.toSeq.sorted
    val offsets = pids.zip(pids.scanLeft(0L)((acc, p) => acc + totals(p)).init).toMap
    val w = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
    val ranked = ranged
      .withColumn(out,
        row_number().over(w).cast("long") +
          coalesce(element_at(typedLit(offsets), col("__pid")), lit(0L)))
      .drop("__pid")
    (ranked, totals.values.sum)
  }

  /** NTILE(n) over a total order, from the scale-safe ordinal rank (exact
    * SQL NTILE semantics: the first N mod n buckets get one extra row).
    */
  def quantileBucket(df: DataFrame, n: Int, orderCols: Seq[Column],
      out: String, bounds: Option[Seq[Double]] = None): DataFrame = {
    // total == sum of the rank op's per-bucket totals (every row gets a
    // bucket) — the standalone df.count() job it replaces returned the same
    val (ranked, total) = ordinalRankN(df, orderCols, "__r", 32, None, bounds)
    val q = total / n; val m = total % n
    val bucket = when(col("__r") <= lit(m * (q + 1)),
        (col("__r") - 1) / lit(q + 1) + 1)
      .otherwise(lit(m) + (col("__r") - lit(m * (q + 1)) - 1) / lit(q) + 1)
    ranked.withColumn(out, bucket.cast("long")).drop("__r")
  }

  /** Exact `percentile` is an ImperativeAggregate whose per-row update
    * (boxed OpenHashMap insert) dominates whole queries when the scan has
    * few partitions (a single-row-group parquet file reads as ONE split).
    * Spreading the pruned value column over the session's parallelism
    * before the agg parallelizes the update loop; the result is EXACTLY
    * partition-invariant (count merging + one deterministic sort), so the
    * values are bit-identical.
    */
  private def spread1(df: DataFrame, c: Column): DataFrame = {
    val spark = df.sparkSession
    df.select(c.cast("double").as("__p")).repartition(spark.sparkContext.defaultParallelism)
  }

  /** Winsorize: clamp at the [p, 1-p] exact percentiles (fit = one agg). */
  def winsorizeBounds(df: DataFrame, c: Column, p: Double): (Double, Double) = {
    val r = spread1(df, c).agg(
      percentile(col("__p"), lit(p)).as("lo"),
      percentile(col("__p"), lit(1 - p)).as("hi")).head()
    (r.getDouble(0), r.getDouble(1))
  }
  def winsorize(c: Column, bounds: (Double, Double)): Column =
    least(greatest(c, lit(bounds._1)), lit(bounds._2))

  /** Binarize at a fitted threshold (mean by default in the reference). */
  def binarize(c: Column, threshold: Double): Column =
    (c > lit(threshold)).cast("long")

  // ---- numeric mapper residue (scipy.stats.mstats family) ---------------

  /** mstats.plotting_positions(alpha=0.4, beta=0.4): (rank - alpha) /
    * (n + 1 - alpha - beta) with AVERAGE ranks for ties (the reference's
    * sort-position ranks are nondeterministic under ties; averaging is the
    * deterministic refinement). Built on [[valueRanks]] — no global window.
    */
  def plottingPositions(df: DataFrame, c: Column, out: String,
      alpha: Double = 0.4, beta: Double = 0.4): DataFrame =
    plottingPositionsOn(df, c, valueRankTable(df, c), out, alpha, beta)

  /** [[plottingPositions]] over a shared [[ValueRankTable]] (vrt.n == the
    * non-null count the standalone path used — same totals, same floats).
    */
  def plottingPositionsOn(df: DataFrame, c: Column, vrt: ValueRankTable,
      out: String, alpha: Double = 0.4, beta: Double = 0.4): DataFrame = {
    val n = vrt.n
    val ranks = vrt.ranks.select(col("__v"),
      ((col("__cum") + (col("__cnt") + 1) / lit(2.0)) - lit(alpha))
        ./(lit(n + 1 - alpha - beta)).as(out))
    df.join(ranks, c.cast("double") <=> col("__v"), "left").drop("__v")
  }

  /** mstats.trimtail(tail='left'): null out the lowest floor(p*n) values.
    * Tie groups straddling the cut survive whole (the reference masks exact
    * sorted positions, splitting ties arbitrarily; whole-group survival is
    * the deterministic refinement). Built on [[valueRanks]].
    */
  def trimtail(df: DataFrame, c: Column, out: String, p: Double = 0.2): DataFrame =
    trimtailOn(df, c, valueRankTable(df, c), out, p)

  /** [[trimtail]] over a shared [[ValueRankTable]] (same n, same cut). */
  def trimtailOn(df: DataFrame, c: Column, vrt: ValueRankTable,
      out: String, p: Double = 0.2): DataFrame = {
    val cut = math.floor(p * vrt.n).toLong
    val ranks = vrt.ranks.select(col("__v"),
      (col("__cum") + col("__cnt")).as("__cumEnd"))
    df.join(ranks, c.cast("double") <=> col("__v"), "left")
      .withColumn(out, when(col("__cumEnd") > cut, c.cast("double")))
      .drop("__v", "__cumEnd")
  }

  /** mstats.rsh: Rosenblatt shifted-histogram density at each data point —
    * rsh(x) = #{v : x-h <= v <= x+h} / (2*n*h), h = 1.2*IQR/n^(1/5) (exact
    * quartiles stand in for the reference's idealfourths). The band count
    * is a bucketized self-join (bucket width h, neighbors within +-1
    * bucket) — never an all-pairs join, O(n * band density).
    */
  def rsh(df: DataFrame, c: Column, keyCols: Seq[String], out: String,
      probe: Option[Column] = None): DataFrame = {
    val (n, h) = rshParams(df, c)
    rshWith(df, c, keyCols, out, n, h, probe)
  }

  /** The mstats.rsh bandwidth: (count, 1.2*IQR/n^(1/5)). Exposed so an
    * oracle can embed the identical h as a literal (POW differs by ULPs
    * across engines, which would flip band-boundary membership).
    */
  def rshParams(df: DataFrame, c: Column): (Long, Double) = {
    val r = spread1(df, c).agg(
      percentile(col("__p"), lit(0.25)).as("q1"),
      percentile(col("__p"), lit(0.75)).as("q3"),
      count(col("__p")).as("n")).head()
    val n = r.getLong(2)
    (n, if (n == 0) 0.0 else 1.2 * (r.getDouble(1) - r.getDouble(0)) / math.pow(n.toDouble, 0.2))
  }

  def rshWith(df: DataFrame, c: Column, keyCols: Seq[String], out: String,
      n: Long, h: Double, probe: Option[Column] = None): DataFrame = {
    if (h == 0.0 || n == 0)
      return df.withColumn(out, lit(null).cast("double"))
    val v = c.cast("double")
    val probes0 = df.select(keyCols.map(col) :+ v.as("__x"): _*)
    // explode each probe to its 3 neighbor buckets so the join has an
    // EQUALITY key (a pure range condition on the bucket ids plans as a
    // BroadcastNestedLoopJoin = all-pairs); every data row is in exactly
    // one bucket, so no candidate is double-counted
    val probes = probe.fold(probes0)(probes0.filter)
      .withColumn("__bk0", floor(col("__x") / lit(h)))
      .withColumn("__bk", explode(array(col("__bk0") - 1, col("__bk0"), col("__bk0") + 1)))
    val data = df.select(v.as("__d")).filter(col("__d").isNotNull)
      .withColumn("__dbk", floor(col("__d") / lit(h)))
    val cnt = probes.join(data,
        col("__dbk") === col("__bk") &&
          col("__d") >= col("__x") - lit(h) && col("__d") <= col("__x") + lit(h))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__band"))
    df.join(cnt, keyCols, "left")
      .withColumn(out, col("__band").cast("double") / lit(2.0 * n * h))
      .drop("__band")
  }

  // ---- parsers (lat/long, phone, address) -------------------------------
  // Reference: model/.../parser/LatitudeLongitudeTransformer.py:15-24 (the
  // cartesian formula, R = 6371.230); PhoneTransformer.py/AddressTransformer
  // .py in the reference are copy-paste date parsers (dead code), so the
  // regex extraction here implements what their names promise.

  /** Lat/long (degrees) -> earth-cartesian (x, y, z), R = 6371.230 km. */
  def latLonCartesian(lat: Column, lon: Column): Seq[(String, Column)] = {
    val R = 6371.230
    val la = radians(lat); val lo = radians(lon)
    Seq(
      "coord_x" -> lit(R) * cos(la) * cos(lo),
      "coord_y" -> lit(R) * cos(la) * sin(lo),
      "coord_z" -> lit(R) * sin(la))
  }

  /** Phone parsing: digit normalization + NANP area/line split. */
  def parsePhone(c: Column): Seq[(String, Column)] = {
    val digits = regexp_replace(c, "[^0-9]", "")
    Seq(
      "phone_digits" -> digits,
      "phone_area" -> substring(digits, 1, 3),
      "phone_line" -> substring(digits, -4, 4))
  }

  /** Address parsing: house number, street name, 5-digit zip. */
  def parseAddress(c: Column): Seq[(String, Column)] = Seq(
    "addr_house" -> regexp_extract(c, "^([0-9]+)", 1),
    "addr_street" -> regexp_extract(c, "^[0-9]+ ([A-Za-z]+ [A-Za-z]+)", 1),
    "addr_zip" -> regexp_extract(c, "([0-9]{5})$", 1))
}
