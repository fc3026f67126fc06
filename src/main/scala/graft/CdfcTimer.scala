package graft

import graft.exprs.PortableRound.col6
import graft.search.{CdfcConfig, FeatureConstructor}
import graft.transcripts.Transcripts
import org.apache.spark.sql.functions._

/** One-off timing harness for the q_cdfc pipeline. */
object CdfcTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = ScalingBench.session(32)
    val t0 = System.nanoTime()
    val out = FeatureConstructor.transcriptsPipeline(
      Transcripts.fromEvents(Tables.events(spark, sfDir)),
      CdfcConfig(cMax = 3, maxLayerWidth = 96, batchSize = 48))
    val featCols = out.columns.filter(_.startsWith("feat_")).sorted.toSeq
    Bench.force(out.select((Seq(col("conv_id"), col("turn_idx").cast("long")) ++
      featCols.map(c => col6(col(c)).as(c))): _*))
    println(f"[cdfc-timer] ${(System.nanoTime() - t0) / 1e9}%.1f s, ${featCols.size} features")
    spark.stop()
  }
}
