package graft.streaming

import graft.SparkSpec
import graft.transcripts.{Transcripts, Turn}
import graft.windows.WindowFeatures
import graft.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def batchTurns = Transcripts.fromEvents(Tables.events(spark, sf0001))

  test("streaming runningFeatures == batch WindowFeatures on any prefix (2 micro-batches)") {
    implicit val sqlCtx = spark.sqlContext
    val turns = batchTurns.as[Turn].collect().sortBy(t => (t.ts.getTime, t.turn_idx))
    val (first, second) = turns.splitAt(turns.length / 2)
    // split respects event time -> second batch has no turns before first's
    val stream = MemoryStream[Turn]
    val q = StreamingFeatures.runningFeatures(stream.toDS())
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    stream.addData(first.toIndexedSeq)
    q.processAllAvailable()
    stream.addData(second.toIndexedSeq)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("enriched")
      .select("conv_id", "turn_idx", "gap_secs", "turns_so_far", "run_mean_len", "last_tool", "session_id")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.toSeq.drop(2)).toMap

    val batch = WindowFeatures.standardFeatures(batchTurns)
      .select(col("conv_id"), col("turn_idx"), col("gap_secs"),
        (col("turn_idx") + 1).cast("long").as("turns_so_far"),
        col("run_mean_len"), col("last_tool"), col("session_id"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.toSeq.drop(2)).toMap

    assert(streamed.size == batch.size && streamed.nonEmpty)
    batch.foreach { case (k, v) =>
      val s = streamed(k)
      // gap
      assert(Option(s(0)) == Option(v(0)), s"$k gap: $s vs $v")
      assert(s(1) == v(1), s"$k count")
      assert(math.abs(s(2).asInstanceOf[Double] - v(2).asInstanceOf[Double]) < 1e-9, s"$k mean")
      assert(s(3) == v(3), s"$k tool")
      assert(s(4) == v(4), s"$k session")
    }
  }

  test("session_window aggregates: turn counts per conversation match batch sessionization") {
    implicit val sqlCtx = spark.sqlContext
    val turns = batchTurns.as[Turn].collect().toIndexedSeq
    val stream = MemoryStream[Turn]
    val q = StreamingFeatures.sessionAggregates(stream.toDS().toDF(), "30 minutes", "0 seconds")
      .writeStream.format("memory").queryName("sessions").outputMode("complete").start()
    stream.addData(turns)
    q.processAllAvailable()
    q.stop()

    val streamedTotal = spark.table("sessions")
      .agg(sum("session_turns")).head().getLong(0)
    assert(streamedTotal == turns.size)
    // session count per conv matches the batch gap-sessionization
    val batchSessions = batchTurns
      .withColumn("sid", WindowFeatures.sessionId(1800L))
      .groupBy("conv_id").agg(countDistinct("sid").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val streamSessions = spark.table("sessions")
      .groupBy("conv_id").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamSessions == batchSessions)
  }

  test("tumbling-window aggregates: streaming == batch groupBy(window) exactly") {
    implicit val sqlCtx = spark.sqlContext
    val turns = batchTurns.as[Turn].collect().toIndexedSeq
    val stream = MemoryStream[Turn]
    val q = StreamingFeatures.tumblingAggregates(stream.toDS().toDF(), "10 minutes", "0 seconds")
      .writeStream.format("memory").queryName("tumbling").outputMode("complete").start()
    stream.addData(turns)
    q.processAllAvailable()
    q.stop()

    val batch = batchTurns
      .groupBy(col("conv_id"), window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("turns"), sum(length(col("text")).cast("long")).as("chars"))
      .select(col("conv_id"), col("w.start").as("window_start"), col("turns"), col("chars"))
      .collect().map(_.toSeq).toSet
    val streamed = spark.table("tumbling").collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("append-mode session_window emits each closed session once and EVICTS its state") {
    // complete mode buffers all session state forever; the production shape
    // is watermarked append, whose state store must SHRINK once the
    // watermark passes session closes — asserted on the query's own
    // stateOperators.numRowsTotal, batch by batch
    implicit val sqlCtx = spark.sqlContext
    val turns = batchTurns.as[Turn].collect()
      .sortBy(t => (t.ts.getTime, t.turn_idx)).toIndexedSeq
    val maxMs = turns.last.ts.getTime
    def sentinel(tag: String, plusDays: Int) =
      Turn("zzz_" + tag, 0, "user", "", None,
        new java.sql.Timestamp(maxMs + plusDays * 86400000L))
    val stream = MemoryStream[Turn]
    // 30-day watermark delay: longer than the fixture's whole time span, so
    // after the real batch EVERY session is still open in state (a shorter
    // delay lets the engine's no-data follow-up batch evict most sessions
    // immediately, hiding the buffered phase this test wants to observe)
    val q = StreamingFeatures.sessionAggregates(stream.toDS().toDF(), "30 minutes", "30 days")
      .writeStream.format("memory").queryName("sess_append").outputMode("append").start()
    val stateRows = scala.collection.mutable.ArrayBuffer[Long]()
    def feed(batch: Seq[Turn]): Unit = {
      stream.addData(batch.toIndexedSeq)
      q.processAllAvailable()
      stateRows += q.lastProgress.stateOperators(0).numRowsTotal
    }
    feed(turns)                      // all real turns: sessions buffered in state
    feed(Seq(sentinel("a", 100)))    // watermark jumps past every real close
    feed(Seq(sentinel("b", 200)))    // a batch runs UNDER that watermark -> eviction
    q.stop()

    assert(stateRows.head > 2, s"expected buffered sessions after batch 1: $stateRows")
    assert(stateRows.last < stateRows.head,
      s"state must shrink after the watermark passes: $stateRows")
    assert(stateRows.last <= 2, // only the sentinels' own open sessions may remain
      s"real sessions must be evicted, state = $stateRows")

    // emitted-once parity: append output (sans sentinels) == batch gap-island sessions
    val emitted = spark.table("sess_append").filter(!col("conv_id").startsWith("zzz_"))
    val batchSessions = batchTurns
      .withColumn("sid", WindowFeatures.sessionId(1800L))
      .select("conv_id", "sid").distinct().count()
    assert(emitted.count() == batchSessions)
    val totalTurns = emitted.agg(sum("session_turns")).head().getLong(0)
    assert(totalTurns == turns.size)
  }

  test("broadcast as-of runs UNCHANGED on a stream and equals the batch as-of") {
    // asOfBroadcast is a stateless projection over a stream-static broadcast
    // join (no state store, no watermark needed), so a live transcript feed
    // can attach dimension history per-row with zero stream-side shuffle —
    // the same code path as batch, literally the same function.
    implicit val sqlCtx = spark.sqlContext
    val right = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .select(concat(lit("c"), col("user_id").cast("string")).as("conv_id"),
        col("ts").cast("timestamp").as("ts"), col("event_id"), col("value").as("pval"))
    def narrow(df: org.apache.spark.sql.DataFrame) =
      df.select(col("conv_id"), col("turn_idx"), col("ts"))
    val batchOut = graft.windows.AsOfJoin
      .asOfBroadcast(narrow(batchTurns), right, "conv_id", Seq("pval"), col("event_id"))
      .collect().map(_.toSeq).toSet

    val turns = batchTurns.as[Turn].collect().toIndexedSeq
    val stream = MemoryStream[Turn]
    val streamedDf = graft.windows.AsOfJoin
      .asOfBroadcast(narrow(stream.toDS().toDF()), right, "conv_id", Seq("pval"), col("event_id"))
    val q = streamedDf.writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    stream.addData(turns.take(turns.size / 2))
    q.processAllAvailable()
    stream.addData(turns.drop(turns.size / 2))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("asof_stream").collect().map(_.toSeq).toSet
    assert(streamed == batchOut)
    assert(streamed.nonEmpty)
  }

  test("dedupWithinWatermark: cross-batch dedup, state EVICTION, and post-eviction re-emission") {
    implicit val sqlCtx = spark.sqlContext
    def turn(conv: String, idx: Int, text: String, minute: Long) =
      Turn(conv, idx, "user", text, None,
        new java.sql.Timestamp(1700000000000L + minute * 60000L))
    val stream = MemoryStream[Turn]
    // 10-minute horizon: duplicates within 10 min collapse; a fingerprint
    // whose event time falls behind the watermark is evicted and a LATER
    // duplicate re-emits — the documented bounded-state contract
    val q = StreamingFeatures.dedupWithinWatermark(stream.toDS().toDF(), "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream").outputMode("append").start()
    val stateRows = scala.collection.mutable.ArrayBuffer[Long]()
    def feed(batch: Turn*): Unit = {
      stream.addData(batch.toIndexedSeq)
      q.processAllAvailable()
      stateRows += q.lastProgress.stateOperators(0).numRowsTotal
    }
    feed(turn("c1", 0, "A", 0), turn("c1", 1, "B", 1))
    feed(turn("c2", 0, "A", 2))                 // cross-batch dup, within horizon
    feed(turn("c3", 0, "advance", 180))         // watermark -> 170 min, evicts A/B
    feed(turn("c4", 0, "A", 181))               // dup AFTER eviction -> re-emitted
    q.stop()

    val out = spark.table("dedup_stream").select("conv_id", "text")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("c1", "A"), ("c1", "B"), ("c3", "advance"), ("c4", "A")),
      s"survivors: $out")
    // batch 2's dup was absorbed by state carried across the boundary
    // (no ("c2","A") above); eviction shows as state shrink: by batch 4
    // only the advance-key and the re-admitted A may remain
    assert(stateRows(0) == 2, s"state: $stateRows")
    assert(stateRows.last <= 2, s"A/B must have been evicted: $stateRows")
    assert(out.contains(("c4", "A")), "post-eviction duplicate must re-emit")
  }
}
