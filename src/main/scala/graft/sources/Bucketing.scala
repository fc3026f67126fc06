package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins and aggregations — the
  * pre-shuffle half of the 100 TB playbook: a table written with
  * `bucketBy(n, key).sortBy(key)` is persistently hash-partitioned AND
  * per-file sorted on the key, so every later equi-join or groupBy on that
  * key plans with ZERO exchange (and, with sortBy, zero sort) — the shuffle
  * is paid once at write time instead of once per query.
  *
  * At transcript scale: bucket the turns table by `conv_id` once on ingest;
  * every window pass, as-of self-join, and per-conversation aggregate then
  * reads co-located buckets. The bucket count is a layout decision
  * (rows / bucket should fit an executor's memory comfortably; powers of
  * two ease later re-bucketing).
  *
  * PlanSpec asserts the contract: bucketed-join plans contain no Exchange,
  * while the identical unbucketed join does.
  */
object Bucketing {

  /** Write `df` as a bucketed + per-bucket-sorted managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sortCols: Seq[String] = Seq.empty): Unit = {
    val sorted = if (sortCols.isEmpty) Seq(key) else sortCols
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(sorted.head, sorted.tail: _*)
      .saveAsTable(table)
  }

  /** [[writeBucketed]] that first drops the table AND deletes a stale
    * warehouse location — a previous JVM's in-memory catalog is gone but
    * its files survive, and saveAsTable refuses to reuse the path.
    */
  def replaceBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sortCols: Seq[String] = Seq.empty): Unit = {
    val spark = df.sparkSession
    drop(spark, table)
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    deleteRecursively(new java.io.File(wh, table))
    writeBucketed(df, table, key, buckets, sortCols)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete()
    ()
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  def drop(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    ()
  }
}
