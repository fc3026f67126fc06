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
    // per-callsite job-time breakdown (search is job-count bound; this is
    // the measurement loop for shaving jobs)
    val jobTimes = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map { si =>
          val d = si.details.linesIterator.filter(_.contains("graft.")).take(1).toSeq
          if (d.nonEmpty) d.head.trim.replaceAll("^at ", "") else si.name
        }.getOrElse("?")
        starts.put(js.jobId, (site, System.nanoTime()))
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (site, t) = starts.getOrDefault(je.jobId, ("?", System.nanoTime()))
        jobTimes.merge(site, (1L, System.nanoTime() - t),
          (a, b) => (a._1 + b._1, a._2 + b._2))
      }
    })
    graft.search.Probe.enabled = true
    val t0 = System.nanoTime()
    val out = FeatureConstructor.transcriptsPipeline(
      Transcripts.fromEvents(Tables.events(spark, sfDir)),
      CdfcConfig(cMax = 3, maxLayerWidth = 96, batchSize = 48))
    val featCols = out.columns.filter(_.startsWith("feat_")).sorted.toSeq
    Bench.force(out.select((Seq(col("conv_id"), col("turn_idx").cast("long")) ++
      featCols.map(c => col6(col(c)).as(c))): _*))
    println(f"[cdfc-timer] ${(System.nanoTime() - t0) / 1e9}%.1f s, ${featCols.size} features")
    val t1 = System.nanoTime()
    val ekBase = FeatureConstructor.snapshot(FeatureConstructor.baseFeatures(
      Transcripts.fromEvents(Tables.events(spark, sfDir))).select(
      "conv_id", "turn_idx", "text_len", "gap_secs", "roll5_mean_len",
      "run_mean_len", "turn_pos", "label_next_tool"))
    val (ekTop, ekFit) = graft.search.ExploreKit.run(ekBase,
      Seq("text_len", "gap_secs", "roll5_mean_len", "run_mean_len", "turn_pos"),
      Seq("conv_id"), col("label_next_tool"), k = 8,
      graft.search.ExploreKit.EkConfig(maxCandidates = 128))
    val ekNamed = ekTop.map(t => s"ek_${graft.exprs.Lower.alias(t.expr)}" -> t.expr)
    Bench.force(graft.search.LayerBuilder.select(ekBase, Seq("conv_id", "turn_idx"), ekNamed, ekFit))
    println(f"[cdfc-timer] explorekit ${(System.nanoTime() - t1) / 1e9}%.1f s")

    import scala.jdk.CollectionConverters._
    jobTimes.asScala.toSeq.sortBy(-_._2._2).foreach { case (site, (n, ns)) =>
      println(f"[cdfc-timer]   $site%-40s jobs=$n%3d total=${ns / 1e9}%6.2f s")
    }
    graft.search.Probe.report().foreach(l => println(s"[cdfc-timer]   $l"))
    spark.stop()
  }
}
