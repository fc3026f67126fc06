package graft.checkpoint

import graft.exprs.FitStats
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Snapshot checkpointing for the layered search — the Iceberg-snapshot
  * analog (SURVEY §4.3): each completed layer commits
  *
  *   dir/layer=N/{survivors.parquet, seen.parquet, fit.parquet, manifest.json}
  *
  * with manifest.json written LAST as the commit marker (a layer directory
  * without a manifest is an aborted write and is ignored). Resume loads the
  * newest committed layer's full search state, so a restarted job skips
  * every completed layer and — because all fitted statistics are restored
  * verbatim — continues on the exact float path of the original run
  * (resume == fresh, property-tested).
  *
  * The audit table (dir/audit.parquet, appended per layer) carries
  * per-candidate metrics; dir/lineage.parquet carries per-partition input
  * lineage (partition id -> row count) per layer.
  */
object Checkpoint {

  final case class SurvivorRow(
      layer: Int, expr: String, score: Double, complexity: Int,
      passed: Boolean, inherited: Boolean)

  final case class SearchState(
      layer: Int,
      seen: Set[String],
      fingerprints: Set[Long],
      scores: Map[String, Double],
      survivors: Seq[SurvivorRow],
      fit: FitStats,
      profiles: Map[String, graft.profile.ColumnProfile],
      /** CV-LR AUC channel of the two-stage oracle (empty when LR is off);
        * persisted so a resumed search selects champions from the same
        * LR-scored pool as the fresh run. */
      lrAuc: Map[String, Double] = Map.empty)

  def layerDir(dir: String, layer: Int) = s"$dir/layer=$layer"

  def save(spark: SparkSession, dir: String, st: SearchState): Unit = {
    import spark.implicits._
    val d = layerDir(dir, st.layer)
    // the five state files are independent — write them CONCURRENTLY
    // (each is a tiny local-relation write whose cost is job + commit
    // latency, not data); the manifest commit marker still goes LAST, so
    // the manifest-gated resume contract is unchanged
    graft.search.FitPool.all[Unit](spark, "ckpt")(
      () => st.survivors.toDS().write.mode(SaveMode.Overwrite).parquet(s"$d/survivors.parquet"),
      () => st.seen.toSeq.toDS().toDF("key")
        .join(st.scores.toSeq.toDF("key", "score"), Seq("key"), "left")
        .write.mode(SaveMode.Overwrite).parquet(s"$d/seen.parquet"),
      () => st.fingerprints.toSeq.toDF("fp")
        .write.mode(SaveMode.Overwrite).parquet(s"$d/fingerprints.parquet"),
      () => st.fit.m.toSeq.map { case (k, v) => (k, v.toArray) }.toDF("key", "stats")
        .write.mode(SaveMode.Overwrite).parquet(s"$d/fit.parquet"),
      () => st.profiles.values.toSeq.toDS()
        .write.mode(SaveMode.Overwrite).parquet(s"$d/profiles.parquet"),
      () => if (st.lrAuc.nonEmpty)
        st.lrAuc.toSeq.toDF("key", "auc")
          .write.mode(SaveMode.Overwrite).parquet(s"$d/lrauc.parquet"))
    // commit marker last
    Files.createDirectories(Paths.get(d))
    Files.writeString(Paths.get(s"$d/manifest.json"),
      s"""{"layer": ${st.layer}, "survivors": ${st.survivors.size}, "seen": ${st.seen.size}, "complete": true}""")
    ()
  }

  /** Newest committed layer <= maxLayer, if any. */
  def load(spark: SparkSession, dir: String, maxLayer: Int): Option[SearchState] = {
    import spark.implicits._
    val committed = (1 to maxLayer).filter(l =>
      Files.exists(Paths.get(s"${layerDir(dir, l)}/manifest.json")))
    committed.lastOption.map { l =>
      val d = layerDir(dir, l)
      val survivors = spark.read.parquet(s"$d/survivors.parquet")
        .as[SurvivorRow].collect().toSeq.sortBy(s => (s.layer, s.expr))
      val seenScores = spark.read.parquet(s"$d/seen.parquet")
        .select(col("key"), col("score")).collect()
        .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      val fps = spark.read.parquet(s"$d/fingerprints.parquet")
        .as[Long].collect().toSet
      val fit = FitStats(spark.read.parquet(s"$d/fit.parquet")
        .select(col("key"), col("stats")).collect()
        .map(r => r.getString(0) -> r.getSeq[Double](1).toIndexedSeq).toMap)
      val profiles = spark.read.parquet(s"$d/profiles.parquet")
        .as[graft.profile.ColumnProfile].collect()
        .map(p => p.name -> p).toMap
      val lrAuc =
        if (Files.exists(Paths.get(s"$d/lrauc.parquet")))
          spark.read.parquet(s"$d/lrauc.parquet")
            .select(col("key"), col("auc")).collect()
            .map(r => r.getString(0) -> r.getDouble(1)).toMap
        else Map.empty[String, Double]
      SearchState(l, seenScores.map(_._1).toSet, fps,
        seenScores.collect { case (k, Some(s)) => k -> s }.toMap, survivors, fit,
        profiles, lrAuc)
    }
  }

  /** Append per-candidate metrics for a layer to the audit table. */
  def appendAudit(spark: SparkSession, dir: String, rows: Seq[SurvivorRow],
      durationMs: Long): Unit = {
    import spark.implicits._
    if (rows.nonEmpty)
      rows.toDS().withColumn("duration_ms", lit(durationMs))
        .write.mode(SaveMode.Append).parquet(s"$dir/audit.parquet")
  }

  /** Append per-partition input lineage (partition id -> rows) for a layer. */
  def appendLineage(dir: String, layer: Int, input: DataFrame): Unit = {
    input.groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("rows"))
      .withColumn("layer", lit(layer))
      .write.mode(SaveMode.Append).parquet(s"$dir/lineage.parquet")
  }
}
