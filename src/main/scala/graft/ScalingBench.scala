package graft

import graft.transcripts.Transcripts
import graft.windows.{AsOfJoin, WindowFeatures}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Two-cluster-size scaling evidence (BASELINE.json north rule): run the
  * SAME flagship feature job on the SAME parquet input at parallelism N and
  * 4N (local[8] vs local[32] standing in for N vs 4N executors), report
  * throughput at both and efficiency = T_4N / (4 * T_N).
  *
  * Measurement protocol (the sandbox shares a host, so wall-clock is noisy):
  *  - input is materialized ONCE to parquet with 256 files (scan splits must
  *    not be capped by writer cores)
  *  - each config runs `reps` times after a warmup; the MIN time is used
  *    (minimum is the noise-robust estimator of the true cost)
  *  - a bit_xor checksum both forces materialization and proves both
  *    parallelism levels computed identical results
  *
  * The measured job is the flagship per-turn feature construction: early
  * projection (text reduced to text_len BEFORE any shuffle — strings never
  * cross the exchange), then the full window-feature vector + sessionization
  * + an as-of join against the tool-turn stream, all sharing ONE
  * hash-exchange on conv_id.
  *
  * Usage: runMain graft.ScalingBench [nTurns] [outJson]
  */
object ScalingBench {

  def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores * 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      // shuffle files on tmpfs: the sandbox's single virtual disk serializes
      // concurrent shuffle writers and destroys scaling measurements
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def inputPath(nTurns: Long) = s"/tmp/graft_scaling_input_$nTurns.parquet"

  def materializeInput(nTurns: Long): Unit = {
    val p = inputPath(nTurns)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(p))) {
      val spark = session(32)
      try Transcripts.synthetic(spark, nTurns, math.max(32, (nTurns / 200).toInt), seed = 42L)
        .repartition(256)
        .write.mode("overwrite").parquet(p)
      finally spark.stop()
    }
  }

  /** The measured job: read -> project-early -> window features + as-of. */
  def flagshipJob(spark: SparkSession, nTurns: Long): DataFrame = {
    val raw = spark.read.parquet(inputPath(nTurns))
    // EARLY PROJECTION: text never crosses the shuffle (100 TB rule: prune
    // before the exchange; the scan itself is columnar so text is read once
    // to compute its length and dropped immediately)
    val t = raw.select(
      col("conv_id"), col("turn_idx"), col("role"), col("tool"),
      col("ts").cast("timestamp").as("ts"),
      length(col("text")).cast("double").as("text_len"))
    val w = WindowFeatures.convWindow()
    val feats = t
      .withColumn("gap_secs", WindowFeatures.gapSecs())
      .withColumn("prev_role", lag(col("role"), 1).over(w))
      .withColumn("roll5_mean_len", avg(col("text_len")).over(w.rowsBetween(-4, 0)))
      .withColumn("roll9_max_len", max(col("text_len")).over(w.rowsBetween(-8, 0)))
      .withColumn("run_mean_len", avg(col("text_len")).over(
        w.rowsBetween(Long.MinValue, 0)))
      .withColumn("session_id", WindowFeatures.sessionId(1800L))
      .withColumn("last_tool", WindowFeatures.backfill(col("tool")))
      .withColumn("lag2_len", lag(col("text_len"), 2).over(w))
      .withColumn("lead1_role", lead(col("role"), 1).over(w))
    val right = t.filter(col("role") === "tool")
      .select(col("conv_id"), col("ts"), col("turn_idx").cast("long").as("seq"),
        col("text_len").as("pval"))
    AsOfJoin.asOf(feats, right, "conv_id", Seq("pval"), col("seq"))
  }

  def measure(cores: Int, nTurns: Long, reps: Int): (Long, Double) = {
    val spark = session(cores)
    try {
      var chk = 0L
      var best = Double.MaxValue
      Bench.force(flagshipJob(spark, nTurns)) // warmup (JIT + page cache)
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        chk = Bench.force(flagshipJob(spark, nTurns))
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (chk, best)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val nTurns = args.headOption.map(_.toLong).getOrElse(16000000L)
    val outJson = args.lift(1).getOrElse("/root/repo/BENCH_SCALING.json")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val lowCores = sys.env.getOrElse("SPARK_GRAFT_N", "8").toInt
    val highCores = sys.env.getOrElse("SPARK_GRAFT_4N", "32").toInt

    materializeInput(nTurns)
    val (chkLow, secLow) = measure(lowCores, nTurns, reps)
    val (chkHigh, secHigh) = measure(highCores, nTurns, reps)
    val thrLow = nTurns / secLow
    val thrHigh = nTurns / secHigh
    val eff = thrHigh / ((highCores.toDouble / lowCores) * thrLow)
    val json =
      s"""{"n_turns":$nTurns,"cores_low":$lowCores,"cores_high":$highCores,
         |"sec_low":$secLow,"sec_high":$secHigh,
         |"turns_per_sec_low":${thrLow.round},"turns_per_sec_high":${thrHigh.round},
         |"scaling_efficiency":${math.rint(eff * 10000) / 10000.0},
         |"checksum_match":${chkLow == chkHigh},"reps":$reps}""".stripMargin.replace("\n", "")
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json + "\n")
  }
}
