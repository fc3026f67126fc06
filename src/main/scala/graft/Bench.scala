package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-round benchmark: times every registered query at the given SF and
  * prints ONE JSON line. Each query is forced with a full-row checksum
  * (bit_xor of xxhash64 over all columns) so column pruning cannot skip the
  * work being measured; a warmup pass absorbs JVM/codegen startup.
  *
  * Self-proving protocol (per this box's min-of-reps convention — a shared
  * host needs min, not mean): every query runs `SPARK_GRAFT_REPS` times
  * (default 3); the headline `queries` map carries the per-query MIN, and
  * `queries_reps` carries every rep, so the committed BENCH JSON is the
  * evidence — no hand-written numbers anywhere. Optionally writes a
  * generated markdown table to `SPARK_GRAFT_BENCH_NOTES`.
  */
object Bench {

  /** Force full materialization; returns an order-insensitive checksum. */
  def force(df: DataFrame): Long = {
    val row = df.select(call_function("bit_xor",
      xxhash64(df.columns.map(col): _*)).as("chk")).head()
    if (row.isNullAt(0)) 0L else row.getLong(0)
  }

  private def fmt(v: Double): String = f"$v%.3f"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: absorb JVM + codegen + parquet footer reads
    try force(SparkEntry.queries("q_transcripts")(spark, sfDir)) catch { case _: Throwable => }

    // rep r runs every query before rep r+1 starts (not query-major): a
    // transient host stall then poisons one rep of many queries instead of
    // all reps of one, which is what makes min-of-reps robust here.
    //
    // CONTAMINATION MARKER (the ScalingBench protocol, applied here): a
    // zero-shuffle control job — row-local hash fold over the events scan —
    // brackets every rep. Its time moves ONLY with host load (no exchange,
    // no sort, no fits), so a rep whose control reading is inflated vs the
    // best control is attributable to a co-tenant burst, not a plan change.
    def controlJob(): Double = {
      val raw = Tables.events(spark, sfDir)
      val t0 = System.nanoTime()
      force(raw.select(xxhash64(raw.columns.map(col): _*).as("h")))
      (System.nanoTime() - t0) / 1e9
    }
    controlJob() // warm the control's own codegen/footers
    val names = SparkEntry.queries.keys.toSeq.sorted
    val times = collection.mutable.Map(names.map(_ -> Vector.empty[Double]): _*)
    val controls = collection.mutable.ArrayBuffer.empty[Double]
    (0 until reps).foreach { _ =>
      controls += controlJob()
      names.foreach { name =>
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        try force(fn(spark, sfDir)) catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
      }
      controls += controlJob()
    }
    val mins = names.map(n => n -> times(n).min)

    // headline throughput: the flagship window-feature job in turns/sec
    val transcripts = graft.transcripts.Transcripts.fromEvents(Tables.events(spark, sfDir))
    val nTurns = transcripts.count()
    force(graft.windows.WindowFeatures.standardFeatures(transcripts)) // warm
    val flagshipSec = (0 until reps).map { _ =>
      val t0 = System.nanoTime()
      force(graft.windows.WindowFeatures.standardFeatures(transcripts))
      (System.nanoTime() - t0) / 1e9
    }.min
    val turnsPerSec = nTurns / flagshipSec

    val qs = mins.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val repJson = names.map { n =>
      "\"" + n + "\":[" + times(n).map(fmt).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val total = mins.map(_._2).sum
    // constant-size PROPERTY gates (bounded-row ml-fit probes: selector /
    // traversal / recall invariants) vs data-scaled queries — the gates'
    // cost is fixed job-count overhead independent of SF, so the split
    // keeps the data-side number comparable across rounds and scales
    val gates = Set("q_selectors", "q_traversals", "q_ann_recall", "q_ml_props",
      "q_fairexp", "q_lr_aicc", "q_resume", "q_search_props", "q_cdfc_lr")
    val gateSec = mins.collect { case (k, v) if gates(k) => v }.sum
    val ctlJson = controls.map(fmt).mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,""" +
      s""""queries_reps":$repJson,"reps":$reps,"sf":"$sfDir",""" +
      s""""turns_per_sec":${turnsPerSec.round},"flagship_sec":${fmt(flagshipSec)},""" +
      s""""property_gates_sec":${fmt(gateSec)},"data_queries_sec":${fmt(total - gateSec)},""" +
      s""""control_reps":$ctlJson,"control_min":${fmt(controls.min)},""" +
      s""""control_spread":${fmt(controls.max / controls.min)}}"""
    println(line)

    sys.env.get("SPARK_GRAFT_BENCH_NOTES").foreach { path =>
      val rows = names.map { n =>
        val t = times(n)
        s"| $n | ${fmt(t.min)} | ${fmt(t.max)} | ${t.map(fmt).mkString(", ")} |"
      }
      val md =
        s"""# Bench notes (generated by graft.Bench — no hand-written numbers)
           |
           |sf dir: `$sfDir`, cpus: $cpus, reps: $reps (min-of-reps protocol;
           |shared host => min is the signal, spread is host noise).
           |
           |Total (sum of per-query min): ${fmt(total)} s = data ${fmt(total - gateSec)} s
           |+ constant-size property gates ${fmt(gateSec)} s.
           |Flagship window-feature job: ${turnsPerSec.round} turns/s
           |($nTurns turns in ${fmt(flagshipSec)} s, min of $reps).
           |
           |Zero-shuffle control job bracketing each rep (host-load marker —
           |moves only with co-tenant load, never with plan changes):
           |${controls.map(fmt).mkString(", ")} s; spread
           |${fmt(controls.max / controls.min)}x. A rep inflated together
           |with its control readings is host noise, not a regression.
           |
           || query | min (s) | max (s) | reps (s) |
           ||---|---|---|---|
           |${rows.mkString("\n|")}
           |""".stripMargin
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        md.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
