package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: time individual stages of the scaling job at a given core
  * count to find what fails to scale. runMain graft.ScalingProbe <cores>
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(8)
    val n = args.lift(1).map(_.toLong).getOrElse(2000000L)
    val spark = ScalingBench.session(cores)
    import graft.transcripts.Transcripts

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    // pure shuffle+agg baseline
    time("warm-range-sum") {
      spark.range(n).select(sum(col("id"))).head()
    }
    time("shuffle-groupby") {
      spark.range(n).groupBy(pmod(col("id"), lit(10000)).as("k"))
        .agg(count(lit(1))).select(max("count(1)")).head()
    }
    val path = s"/tmp/graft_scaling_input_$n.parquet"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
      Transcripts.synthetic(spark, n, math.max(32, (n / 200).toInt), seed = 42L)
        .repartition(64) // scan parallelism must not be capped by writer cores
        .write.mode("overwrite").parquet(path)
    val t = spark.read.parquet(path).withColumn("ts", col("ts").cast("timestamp"))
    time("parquet-count") { t.count() }
    time("parquet-checksum") { Bench.force(t) }
    val feats = graft.windows.WindowFeatures.standardFeatures(t)
    time("window-features") { Bench.force(feats) }
    time("window-features-2nd") { Bench.force(feats) }
    val numeric = t.select(col("conv_id"), col("turn_idx"), col("ts"),
      length(col("text")).cast("double").as("text_len"))
    val wNum = graft.windows.WindowFeatures.standardFeatures(
      numeric.withColumn("role", lit("u")).withColumn("tool", lit(null).cast("string"))
        .withColumn("text", lit("x")))
    time("window-numeric") { Bench.force(wNum.drop("text")) }
    // wide feature job: 24 extra rolling/lag features on ONE partitioning
    val w = graft.windows.WindowFeatures.convWindow()
    val wide = (1 to 8).foldLeft(numeric) { (d, k) =>
      d.withColumn(s"lag_$k", lag(col("text_len"), k).over(w))
        .withColumn(s"roll_mean_$k", avg(col("text_len")).over(w.rowsBetween(-k * 2L, 0)))
        .withColumn(s"roll_max_$k", max(col("text_len")).over(w.rowsBetween(-k * 2L, 0)))
    }
    time("window-wide-24col") { Bench.force(wide) }
    time("window-wide-24col-2nd") { Bench.force(wide) }
    spark.stop()
  }
}
