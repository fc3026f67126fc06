package graft

import graft.windows.AsOfJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew evidence for the north rule ("conv_id skew handled explicitly"):
  * measures the as-of join on an input where ONE conversation owns
  * `hotFrac` of all turns — the case where the plain union+window plan
  * serializes (an ordered window over one entity is one task) — comparing:
  *
  *   1. [[AsOfJoin.asOf]]      — union + window, partitioned by entity only
  *   2. [[AsOfJoin.asOfSkew]]  — event-time range buckets + carry-in stitch,
  *                               the hot key fans out over `numBuckets` tasks
  *
  * Both variants produce identical rows (bit_xor checksum compared), so the
  * emitted JSON is evidence that the skew path is equivalent AND faster
  * under a hot key. Protocol as in ScalingBench: tmpfs shuffle, min of
  * `SPARK_GRAFT_REPS` reps after warmup, input materialized once.
  *
  * Usage: runMain graft.SkewBench [nTurns] [hotFracPercent] [outJson]
  */
object SkewBench {

  def inputPath(nTurns: Long, hotPct: Int) =
    s"/tmp/graft_skew_input_${nTurns}_$hotPct.parquet"

  /** Synthetic turns where ~hotPct% of rows share conv_id "hot"; the rest
    * spread uniformly over `nConvs` conversations. Pure function of the row
    * id — reproducible under any partitioning.
    */
  def skewedTurns(spark: SparkSession, nTurns: Long, hotPct: Int,
      nConvs: Int = 4096): DataFrame = {
    val df = spark.range(0, nTurns, 1,
      math.max(spark.sparkContext.defaultParallelism, 1))
    val h = xxhash64(col("id") + 42)
    val conv = when(pmod(h, lit(100L)) < hotPct, lit("hot"))
      .otherwise(concat(lit("s"), pmod(xxhash64(h), lit(nConvs.toLong)).cast("string")))
    df.select(
      conv.as("conv_id"),
      col("id").as("turn_idx"),
      timestamp_micros(lit(1704067200000000L) + pmod(xxhash64(h + 1), lit(86400000000L * 30)))
        .as("ts"),
      (pmod(xxhash64(h + 2), lit(1000L)).cast("double") / 10.0).as("text_len"),
      (pmod(col("id"), lit(3)) === 2).as("is_tool"))
  }

  def materialize(spark: SparkSession, nTurns: Long, hotPct: Int): Unit = {
    val p = inputPath(nTurns, hotPct)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
      skewedTurns(spark, nTurns, hotPct).repartition(256)
        .write.mode("overwrite").parquet(p)
  }

  /** GroupByThen under the same hot key: window-partition-by-key (baseline,
    * one task per key) vs the two-phase salted aggregate + broadcast
    * join-back ([[graft.windows.WindowFeatures.groupByThenSalted]], fact
    * rows never shuffle). The aggregated value is integer-valued and both
    * variants round with the portable 6-dp formula, so the checksums are
    * comparable bit-for-bit.
    */
  def groupbyJob(spark: SparkSession, nTurns: Long, hotPct: Int,
      saltedPath: Boolean, broadcastJoin: Boolean = true): DataFrame = {
    import graft.exprs.PortableRound.col6
    import graft.windows.{WindowFeatures => WF}
    val t = spark.read.parquet(inputPath(nTurns, hotPct))
      .withColumn("v", pmod(xxhash64(col("turn_idx") + 5), lit(1000L)).cast("double"))
    val out =
      if (saltedPath) WF.groupByThenSalted(t, "conv_id", col("v"), "g", salts = 64,
        broadcastJoin = broadcastJoin)
      else {
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("conv_id"))
        val n = count(col("v")).over(w).cast("double")
        val s1 = sum(col("v")).over(w)
        val s2 = sum(col("v") * col("v")).over(w)
        t.withColumn("g_mean", s1 / n)
          .withColumn("g_std", when(n > 1, sqrt((s2 - s1 * s1 / n) / (n - 1))))
          .withColumn("g_min", min(col("v")).over(w))
          .withColumn("g_max", max(col("v")).over(w))
          .withColumn("g_cnt", count(col("v")).over(w))
          .withColumn("g_sum", s1)
      }
    out.select(col("conv_id"), col("turn_idx"),
      col6(col("g_mean")).as("g_mean"), col6(col("g_std")).as("g_std"),
      col("g_min").cast("long").as("g_min"), col("g_max").cast("long").as("g_max"),
      col("g_cnt").cast("long").as("g_cnt"), col6(col("g_sum")).as("g_sum"))
  }

  def asofJob(spark: SparkSession, nTurns: Long, hotPct: Int,
      skewPath: Boolean): DataFrame = {
    val t = spark.read.parquet(inputPath(nTurns, hotPct))
    val left = t.select(col("conv_id"), col("turn_idx"), col("ts"), col("text_len"))
    val right = t.filter(col("is_tool"))
      .select(col("conv_id"), col("ts"), col("turn_idx").as("seq"),
        col("text_len").as("pval"))
    if (skewPath)
      AsOfJoin.asOfSkew(left, right, "conv_id", Seq("pval"), col("seq"), numBuckets = 64)
    else
      AsOfJoin.asOf(left, right, "conv_id", Seq("pval"), col("seq"))
  }

  def main(args: Array[String]): Unit = {
    val nTurns = args.headOption.map(_.toLong).getOrElse(8000000L)
    val hotPct = args.lift(1).map(_.toInt).getOrElse(20)
    val outJson = args.lift(2).getOrElse("/root/repo/BENCH_SKEW.json")
    val mode = args.lift(3).getOrElse("asof") // "asof" | "groupby"
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt

    val spark = ScalingBench.session(cores)
    try {
      materialize(spark, nTurns, hotPct)
      // "groupbyns": the NON-broadcast salted fallback (r5-verdict item 6) —
      // baseline is the broadcast join-back, the measured path the shuffle
      // join-back on a cloned session with broadcast disabled and AQE skew
      // thresholds sized to this input so the skew-split engages
      lazy val ssNs = {
        val s2 = spark.newSession()
        s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
        s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        s2
      }
      def job(safePath: Boolean): DataFrame = mode match {
        case "groupby"   => groupbyJob(spark, nTurns, hotPct, safePath)
        case "groupbyns" =>
          if (safePath) groupbyJob(ssNs, nTurns, hotPct, saltedPath = true, broadcastJoin = false)
          else groupbyJob(spark, nTurns, hotPct, saltedPath = true)
        case _           => asofJob(spark, nTurns, hotPct, safePath)
      }
      def measure(safePath: Boolean): (Long, Double) = {
        Bench.force(job(safePath)) // warmup
        var chk = 0L
        var best = Double.MaxValue
        (1 to reps).foreach { _ =>
          val t0 = System.nanoTime()
          chk = Bench.force(job(safePath))
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        (chk, best)
      }
      val (chkPlain, secPlain) = measure(safePath = false)
      val (chkSkew, secSkew) = measure(safePath = true)
      val (baseKey, safeKey) = mode match {
        case "groupby"   => ("sec_window", "sec_salted")
        case "groupbyns" => ("sec_salted_broadcast", "sec_salted_shuffle")
        case _           => ("sec_union_window", "sec_skew_bucketed")
      }
      val json =
        s"""{"mode":"$mode","n_turns":$nTurns,"hot_pct":$hotPct,"cores":$cores,
           |"$baseKey":$secPlain,"$safeKey":$secSkew,
           |"speedup":${math.rint(secPlain / secSkew * 100) / 100.0},
           |"checksum_match":${chkPlain == chkSkew},"reps":$reps}"""
          .stripMargin.replace("\n", "")
      println(json)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json + "\n")
    } finally spark.stop()
  }
}
