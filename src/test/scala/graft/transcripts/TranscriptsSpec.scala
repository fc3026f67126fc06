package graft.transcripts

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class TranscriptsSpec extends SparkSpec {

  test("fromEvents: dense 0-based turn_idx per conversation, stable under re-derivation") {
    val t = Transcripts.fromEvents(Tables.events(spark, sf0001)).cache()
    val perConv = t.groupBy("conv_id")
      .agg(count(lit(1)).as("n"), min("turn_idx").as("lo"), max("turn_idx").as("hi"),
        countDistinct("turn_idx").as("d"))
    assert(perConv.filter(col("lo") =!= 0 || col("hi") =!= col("n") - 1 || col("d") =!= col("n")).count() == 0)
    // per-turn text equality under stable (conv_id, turn_idx) ordering
    val again = Transcripts.fromEvents(Tables.events(spark, sf0001))
    assert(t.join(again, Seq("conv_id", "turn_idx"))
      .filter(t("text") =!= again("text")).count() == 0)
    t.unpersist()
  }

  test("fromEvents: schema matches the canonical transcript schema") {
    val t = Transcripts.fromEvents(Tables.events(spark, sf0001))
    assert(t.schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq ==
      Seq("conv_id" -> "string", "turn_idx" -> "integer", "role" -> "string",
        "text" -> "string", "tool" -> "string", "ts" -> "timestamp"))
  }

  test("synthetic: deterministic, Zipf-skewed, requested row count") {
    val a = Transcripts.synthetic(spark, 5000, 50, seed = 7).cache()
    assert(a.count() == 5000)
    val sizes = a.groupBy("conv_id").count().orderBy(desc("count"))
      .limit(3).collect().map(_.getLong(1))
    // hot conversation holds a large share (skew exists)
    assert(sizes.head > 5000 / 50 * 3, s"head=${sizes.head}")
    val b = Transcripts.synthetic(spark, 5000, 50, seed = 7)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    a.unpersist()
  }
}
