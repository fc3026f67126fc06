package graft

import graft.transcripts.Transcripts
import graft.windows.WindowFeatures
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the per-module registries; each registry pairs
  * a DataFrame program with (where SQL-expressible) a DuckDB oracle over the
  * same parquet tables.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full standard per-turn feature vector of the minimum slice
    * (SURVEY §7.2) over transcripts derived from `events`.
    */
  def entry(spark: SparkSession): DataFrame =
    graft.search.FeatureConstructor.transcriptsPipeline(
      Transcripts.fromEvents(Tables.events(spark, "/root/testdata/sf0.001")),
      graft.search.CdfcConfig(cMax = 2, maxLayerWidth = 48))

  private def registries: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (graft.queries.WindowQueries.queries, graft.queries.WindowQueries.oracles),
      (graft.queries.TransformQueries.queries, graft.queries.TransformQueries.oracles),
      (graft.queries.SearchQueries.queries, graft.queries.SearchQueries.oracles),
      (graft.queries.FairnessQueries.queries, graft.queries.FairnessQueries.oracles),
      (graft.queries.TextQueries.queries, graft.queries.TextQueries.oracles),
      (graft.queries.SimilarityQueries.queries, graft.queries.SimilarityQueries.oracles),
      (graft.queries.LegacyQueries.queries, graft.queries.LegacyQueries.oracles),
      (graft.queries.VectorQueries.queries, graft.queries.VectorQueries.oracles)
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] =
    registries.map(_._2).reduce(_ ++ _)
}
