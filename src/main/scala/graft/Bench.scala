package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-round benchmark: times every registered query at the given SF and
  * prints ONE JSON line. Each query is forced with a full-row checksum
  * (bit_xor of xxhash64 over all columns) so column pruning cannot skip the
  * work being measured; a warmup pass absorbs JVM/codegen startup.
  */
object Bench {

  /** Force full materialization; returns an order-insensitive checksum. */
  def force(df: DataFrame): Long = {
    val row = df.select(call_function("bit_xor",
      xxhash64(df.columns.map(col): _*)).as("chk")).head()
    if (row.isNullAt(0)) 0L else row.getLong(0)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: absorb JVM + codegen + parquet footer reads
    try force(SparkEntry.queries("q_transcripts")(spark, sfDir)) catch { case _: Throwable => }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try force(fn(spark, sfDir)) catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // headline throughput: the flagship window-feature job in turns/sec
    val transcripts = graft.transcripts.Transcripts.fromEvents(Tables.events(spark, sfDir))
    val nTurns = transcripts.count()
    force(graft.windows.WindowFeatures.standardFeatures(transcripts)) // warm
    val t0 = System.nanoTime()
    force(graft.windows.WindowFeatures.standardFeatures(transcripts))
    val flagshipSec = (System.nanoTime() - t0) / 1e9
    val turnsPerSec = nTurns / flagshipSec

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // constant-size PROPERTY gates (bounded-row ml-fit probes: selector /
    // traversal / recall invariants) vs data-scaled queries — the gates'
    // cost is fixed job-count overhead independent of SF, so the split
    // keeps the data-side number comparable across rounds and scales
    val gates = Set("q_selectors", "q_traversals", "q_ann_recall", "q_ml_props")
    val gateSec = results.collect { case (k, v) if gates(k) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","turns_per_sec":${turnsPerSec.round},"flagship_sec":$flagshipSec,"property_gates_sec":${f"$gateSec%.3f"},"data_queries_sec":${f"${total - gateSec}%.3f"}}""")
    spark.stop()
  }
}
