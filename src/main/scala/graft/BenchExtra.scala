package graft

import org.apache.spark.sql.functions._

/** Optimization-round side harness (guide §1.4): times individual declared
  * queries in isolation with the same force/checksum action as
  * [[Bench]] (which stays FROZEN), optionally captures
  * `.explain("formatted")` per query, and reports a per-callsite job-time
  * breakdown. Never used by the driver — its numbers are cited in
  * OPTIMIZATION_r*.md only.
  *
  * Usage:
  *   runMain graft.BenchExtra [--reps N] [--plans DIR] [--jobs] q_a q_b ...
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var reps = 3
    var plansDir: Option[String] = None
    var jobs = false
    val names = collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--reps" => reps = args(i + 1).toInt; i += 2
        case "--plans" => plansDir = Some(args(i + 1)); i += 2
        case "--jobs" => jobs = true; i += 1
        case q => names += q; i += 1
      }
    }
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-query job/task counters (read between queries; Spark fires listener
    // events asynchronously, so drain with a listener-bus flush via jobEnd
    // counts — good enough for attribution at rep granularity)
    val jobCount = new java.util.concurrent.atomic.AtomicLong
    val taskCount = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobCount.incrementAndGet()
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        taskCount.incrementAndGet()
    })

    val jobTimes = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
    if (jobs) spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
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

    // warmup (same as Bench): absorb JVM + codegen + parquet footers
    try Bench.force(SparkEntry.queries("q_transcripts")(spark, sfDir)) catch { case _: Throwable => }

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(s"benchextra: $name")
      plansDir.foreach { d =>
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val p = java.nio.file.Paths.get(d)
        java.nio.file.Files.createDirectories(p)
        java.nio.file.Files.writeString(p.resolve(s"$name.txt"), plan)
      }
      val (j0, t0c) = (jobCount.get(), taskCount.get())
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        try Bench.force(fn(spark, sfDir)) catch { case e: Throwable =>
          System.err.println(s"[benchextra] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      spark.sparkContext.setJobDescription(null)
      val (jn, tn) = ((jobCount.get() - j0) / reps, (taskCount.get() - t0c) / reps)
      println(f"[benchextra] $name%-28s min=${times.min}%7.3f jobs/rep=$jn%4d tasks/rep=$tn%5d reps=${times.map(t => f"$t%.3f").mkString(",")}")
    }

    if (jobs) {
      import scala.jdk.CollectionConverters._
      jobTimes.asScala.toSeq.sortBy(-_._2._2).take(40).foreach { case (site, (n, ns)) =>
        println(f"[benchextra]   $site%-60s jobs=$n%4d total=${ns / 1e9}%7.2f s")
      }
    }
    spark.stop()
  }
}
