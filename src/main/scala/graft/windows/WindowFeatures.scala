package graft.windows

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Point-in-time / windowed feature kernel over transcripts.
  *
  * Every operator here is leakage-free by construction: frames end at the
  * current row (`rowsBetween(unboundedPreceding, currentRow)` or explicit
  * `rangeBetween(-gap, 0)`), so a feature at (conv_id, ts) only ever reads
  * turns at-or-before ts. Ordering is always the stable `(ts, turn_idx)`
  * pair — `ts` alone is not unique within a conversation.
  *
  * Scale notes (100 TB): all features over one entity key share ONE
  * `Window.partitionBy(conv_id)` exchange — Spark reuses the hash
  * partitioning across every window function with the same partition spec,
  * so an arbitrarily wide feature select costs exactly one shuffle.
  * Skewed conv_id is handled in [[AsOfJoin]] (salted buckets); for
  * order-sensitive windows see the boundary-stitched range split there.
  *
  * Reference semantics: the group-aggregate join-back of
  * `FastGroupByThenTransformation.py:23-40` (fit = hash agg by key,
  * transform = map key -> aggregate) is [[groupByThen]]; the at-or-before
  * variants generalize it per the north rule.
  */
object WindowFeatures {

  /** Stable per-conversation ordering. */
  def convWindow(entity: String = "conv_id"): WindowSpec =
    Window.partitionBy(col(entity)).orderBy(col("ts"), col("turn_idx"))

  /** Frame of all turns at-or-before the current one. */
  def atOrBefore(entity: String = "conv_id"): WindowSpec =
    convWindow(entity).rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** lag/lead of arbitrary columns; k may be negative (lead). */
  def lagCol(c: Column, k: Int, entity: String = "conv_id"): Column =
    if (k >= 0) lag(c, k).over(convWindow(entity)) else lead(c, -k).over(convWindow(entity))

  /** Seconds between this turn and the previous one in the conversation. */
  def gapSecs(entity: String = "conv_id"): Column = {
    val w = convWindow(entity)
    (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))).cast("double") / 1e6
  }

  /** Rolling aggregate over the last `n` turns (inclusive of current). */
  def rollingRows(agg: Column => Column, c: Column, n: Int, entity: String = "conv_id"): Column =
    agg(c).over(convWindow(entity).rowsBetween(-(n - 1).toLong, Window.currentRow))

  /** Rolling aggregate over the trailing `seconds` of event time (inclusive).
    * Ordered by physical microseconds so the frame is a pure range predicate.
    */
  def rollingTime(agg: Column => Column, c: Column, seconds: Long, entity: String = "conv_id"): Column = {
    val w = Window.partitionBy(col(entity)).orderBy(unix_micros(col("ts")))
      .rangeBetween(-seconds * 1000000L, 0L)
    agg(c).over(w)
  }

  /** Backfill: latest non-null value of `c` at-or-before each turn. */
  def backfill(c: Column, entity: String = "conv_id"): Column =
    last(c, ignoreNulls = true).over(atOrBefore(entity))

  /** Gap-based sessionization: a new session starts when the inter-turn gap
    * exceeds `gapSeconds` (first turn of a conversation is session 0).
    * Returns the session index column (int, 0-based).
    */
  def sessionId(gapSeconds: Long, entity: String = "conv_id"): Column = {
    val w = convWindow(entity)
    val prevTs = lag(col("ts"), 1).over(w)
    val isStart = when(prevTs.isNull, 0)
      .when(unix_micros(col("ts")) - unix_micros(prevTs) > gapSeconds * 1000000L, 1)
      .otherwise(0)
    sum(isStart).over(convWindow(entity).rowsBetween(Window.unboundedPreceding, Window.currentRow))
      .cast("int")
  }

  /** GroupByThen (reference `FastGroupByThenTransformation`): whole-group
    * aggregate of `value` by `key`, joined back so output has one value per
    * input row. Implemented as an unordered window over the key partition —
    * one shuffle, no join. NOTE: this reads the whole group (reference
    * semantics, fit-on-everything); for the leakage-free variant use
    * [[groupByThenAtOrBefore]].
    */
  def groupByThen(agg: Column => Column, value: Column, key: Column): Column =
    agg(value).over(Window.partitionBy(key))

  /** Leakage-free GroupByThen: aggregate over group members at-or-before the
    * current turn only.
    */
  def groupByThenAtOrBefore(agg: Column => Column, value: Column, entity: String = "conv_id"): Column =
    agg(value).over(atOrBefore(entity))

  /** All standard per-turn features of the minimum slice (SURVEY §7.2) in one
    * select — single shuffle on `conv_id`.
    */
  def standardFeatures(transcripts: DataFrame, sessionGapSeconds: Long = 1800L): DataFrame = {
    val textLen = length(col("text")).cast("double")
    transcripts
      .withColumn("text_len", textLen)
      .withColumn("gap_secs", gapSecs())
      .withColumn("prev_role", lagCol(col("role"), 1))
      .withColumn("roll5_mean_len", rollingRows(avg, textLen, 5))
      .withColumn("session_id", sessionId(sessionGapSeconds))
      .withColumn("run_mean_len", groupByThenAtOrBefore(avg, textLen))
      .withColumn("last_tool", backfill(col("tool")))
  }
}
