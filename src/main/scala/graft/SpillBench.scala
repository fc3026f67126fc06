package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Spill-regime evidence (the one 100 TB failure mode no other bench
  * touches): run the flagship job on an input whose shuffle/window state
  * exceeds executor memory and prove the plan degrades via SPILL, not OOM —
  * same checksum as the ample-heap run, with task-metric spill bytes as the
  * witness that the external sort actually went to the spill path.
  *
  * Protocol: launch twice via the forked-run heap knob —
  * {{{
  * SPARK_DRIVER_MEM=32g sbt "runMain graft.SpillBench 64000000 out.json"  // ample
  * SPARK_DRIVER_MEM=4g  sbt "runMain graft.SpillBench 64000000 out.json"  // constrained
  * }}}
  * Each run APPENDS one JSON line to the out file; the committed artifact
  * is the pair — identical `checksum`, constrained line with
  * `spilled_bytes > 0`, and the throughput ratio documents the graceful
  * degradation factor.
  */
object SpillBench {

  def main(args: Array[String]): Unit = {
    val nTurns = args.headOption.map(_.toLong).getOrElse(64000000L)
    val outJson = args.lift(1).getOrElse("/root/repo/BENCH_SPILL.json")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    ScalingBench.materializeInput(nTurns)
    val spark = ScalingBench.session(cores)
    try {
      val memSpill = new AtomicLong
      val diskSpill = new AtomicLong
      val peakExec = new AtomicLong
      val gcMs = new AtomicLong
      val runMs = new AtomicLong
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            memSpill.addAndGet(m.memoryBytesSpilled)
            diskSpill.addAndGet(m.diskBytesSpilled)
            peakExec.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
            gcMs.addAndGet(m.jvmGCTime)
            runMs.addAndGet(m.executorRunTime)
          }
        }
      })
      // zero-shuffle control brackets the measured run (the Bench /
      // ScalingBench contamination-marker protocol): its time moves only
      // with host load, so a slow flagship reading next to clean controls
      // is a plan/JVM effect, not a co-tenant burst
      def control(): Double = {
        val t0 = System.nanoTime()
        Bench.force(ScalingBench.controlJob(spark, nTurns))
        (System.nanoTime() - t0) / 1e9
      }
      // listener events drain asynchronously (the bus flush API is
      // private[spark]); poll until the task-time counter stops moving
      def drain(): Unit = {
        var prev = -1L
        while (prev != runMs.get) { prev = runMs.get; Thread.sleep(1000) }
      }
      control() // warm the control's own codegen
      val ctlBefore = control()
      drain()   // control tasks must not pollute the flagship's metrics
      val (gc0, run0, mem0, disk0) = (gcMs.get, runMs.get, memSpill.get, diskSpill.get)
      peakExec.set(0L)
      val t0 = System.nanoTime()
      val chk = Bench.force(ScalingBench.flagshipJob(spark, nTurns))
      val sec = (System.nanoTime() - t0) / 1e9
      drain()
      val (gc1, run1, mem1, disk1) = (gcMs.get, runMs.get, memSpill.get, diskSpill.get)
      val ctlAfter = control()
      val heapGb = Runtime.getRuntime.maxMemory / (1024.0 * 1024 * 1024)
      def f3(x: Double) = math.rint(x * 1000) / 1000.0
      val json =
        s"""{"n_turns":$nTurns,"cores":$cores,"heap_gb":${math.rint(heapGb * 10) / 10},
           |"mem_fraction":${sys.env.get("SPARK_GRAFT_MEM_FRACTION").map(_.toDouble).getOrElse(0.6)},
           |"sec":${f3(sec)},"turns_per_sec":${(nTurns / sec).round},
           |"memory_spilled_bytes":${mem1 - mem0},"disk_spilled_bytes":${disk1 - disk0},
           |"peak_task_execution_memory":${peakExec.get},
           |"task_gc_ms":${gc1 - gc0},"task_run_ms":${run1 - run0},
           |"control_before_sec":${f3(ctlBefore)},"control_after_sec":${f3(ctlAfter)},
           |"checksum":"${java.lang.Long.toHexString(chk)}"}""".stripMargin.replace("\n", "")
      println(json)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json + "\n",
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    } finally spark.stop()
  }
}
