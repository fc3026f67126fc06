package graft.streaming

import graft.transcripts.Turn
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Structured Streaming variants of the windowed feature core: the same
  * gap-sessionization and at-or-before running features, expressed over an
  * unbounded transcripts stream.
  *
  * The reference is batch-only (SURVEY §2.7); these exist because a
  * transcripts table at 10^12 turns is fed by a live stream — the batch
  * at-or-before semantics ARE streaming semantics (a feature at ts reads
  * only turns <= ts), so the two paths agree row-for-row on any prefix
  * (property-tested in StreamingSpec).
  */
object StreamingFeatures {

  /** Session aggregates via the built-in session_window (watermarked,
    * late-data-tolerant): one row per (conv_id, session).
    */
  def sessionAggregates(
      turns: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    turns
      .withWatermark("ts", watermark)
      .groupBy(col("conv_id"), session_window(col("ts"), gap).as("session"))
      .agg(
        count(lit(1)).as("session_turns"),
        sum(length(col("text")).cast("long")).as("session_chars"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .select(col("conv_id"), col("session.start").as("window_start"),
        col("session_turns"), col("session_chars"),
        col("session_start"), col("session_end"))

  /** Watermarked tumbling-window aggregates: turn counts + char sums per
    * (conv_id, fixed event-time window) — the plain windowed-agg shape of
    * the streaming bullet (session_window above covers the variable-length
    * case). Late data beyond `watermark` is dropped deterministically.
    */
  def tumblingAggregates(
      turns: DataFrame,
      width: String = "10 minutes",
      watermark: String = "1 hour"): DataFrame =
    turns
      .withWatermark("ts", watermark)
      .groupBy(col("conv_id"), window(col("ts"), width).as("w"))
      .agg(
        count(lit(1)).as("turns"),
        sum(length(col("text")).cast("long")).as("chars"))
      .select(col("conv_id"), col("w.start").as("window_start"),
        col("turns"), col("chars"))

  /** Streaming exact dedup: `dropDuplicatesWithinWatermark` keyed on an
    * 8-byte xxhash64 fingerprint of the text — the dedup state store
    * carries (fingerprint, event-time) only, never the blob, which is what
    * makes exact dedup feasible on an unbounded stream (the batch
    * counterpart is `Dedup.exactVerified`, same never-shuffle-the-blob
    * rule). Duplicates arriving within `horizon` of each other collapse to
    * the first arrival; fingerprints older than the watermark are EVICTED
    * (asserted in StreamingSpec), so state size is bounded by the
    * horizon's key cardinality, not the stream's. A duplicate arriving
    * after its key was evicted is re-emitted — the documented watermark
    * contract, traded deliberately for bounded state.
    *
    * Exactness caveat: unlike `Dedup.exactVerified`, there is no in-plan
    * blob re-verification here, so two DISTINCT texts colliding on the
    * 64-bit fingerprint within one horizon silently collapse. Collision
    * odds are birthday-bounded by the horizon's key cardinality k:
    * ~k^2 / 2^65 (~3e-7 at k = 10^6; at billions of in-horizon keys, key
    * on a wider fingerprint, e.g. two independent hashes concatenated).
    */
  def dedupWithinWatermark(turns: DataFrame, horizon: String = "1 hour"): DataFrame =
    turns
      .withColumn("fp", xxhash64(col("text")))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("fp")

  final case class ConvState(
      lastTsMicros: Long,
      turnCount: Long,
      lenSum: Double,
      lastTool: Option[String],
      sessionId: Int)

  final case class EnrichedTurn(
      conv_id: String,
      turn_idx: Int,
      ts: Timestamp,
      gap_secs: Option[Double],
      turns_so_far: Long,
      run_mean_len: Double,
      last_tool: Option[String],
      session_id: Int)

  /** Per-turn running features via keyed state (flatMapGroupsWithState):
    * gap to previous turn, running count/mean, last tool backfill, gap-based
    * session id — exactly the batch WindowFeatures semantics, incrementally.
    *
    * Turns of one conversation must arrive in (ts, turn_idx) order within
    * the group iterator — guaranteed by sorting each micro-batch group
    * (state carries exactness across batches).
    */
  def runningFeatures(
      turns: Dataset[Turn],
      sessionGapSeconds: Long = 1800L): Dataset[EnrichedTurn] = {
    import turns.sparkSession.implicits._
    turns
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState[ConvState, EnrichedTurn](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (convId: String, rows: Iterator[Turn], state: GroupState[ConvState]) =>
          var st = state.getOption.getOrElse(ConvState(Long.MinValue, 0L, 0.0, None, 0))
          // full microsecond precision: getTime truncates to millis
          def micros(ts: Timestamp): Long =
            (ts.getTime / 1000L) * 1000000L + ts.getNanos / 1000L
          val out = rows.toSeq.sortBy(t => (micros(t.ts), t.turn_idx)).map { t =>
            val tsMicros = micros(t.ts)
            val gap =
              if (st.lastTsMicros == Long.MinValue) None
              else Some((tsMicros - st.lastTsMicros) / 1e6)
            val newSession = gap.exists(_ > sessionGapSeconds)
            st = ConvState(
              tsMicros,
              st.turnCount + 1,
              st.lenSum + t.text.length,
              t.tool.orElse(st.lastTool),
              st.sessionId + (if (newSession) 1 else 0))
            EnrichedTurn(convId, t.turn_idx, t.ts, gap, st.turnCount,
              st.lenSum / st.turnCount, st.lastTool, st.sessionId)
          }
          state.update(st)
          out.iterator
      }
  }
}
