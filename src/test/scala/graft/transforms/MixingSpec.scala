package graft.transforms

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixingSpec extends SparkSpec {
  import spark.implicits._

  private def coin(id: Long): Long =
    ((id % 2147483648L) * 2654435761L + 1013904223L) % 4294967296L

  test("stratifiedSample: per-row decision matches the portable coin exactly") {
    val df = (0L until 500L).map(i => (i, if (i % 2 == 0) "en" else "xx"))
      .toDF("id", "g")
    val kept = Mixing.stratifiedSample(df, "g", "id", Map("en" -> 0.5), 0.1)
      .select("id").as[Long].collect().toSet
    val expect = (0L until 500L).filter { i =>
      coin(i) % 1000000L < (if (i % 2 == 0) 500000L else 100000L)
    }.toSet
    assert(kept == expect)
  }

  test("stratifiedSample: keep sets NEST as the fraction grows (consistent sampling)") {
    val df = (0L until 2000L).map(i => (i, "g")).toDF("id", "g")
    val at25 = Mixing.stratifiedSample(df, "g", "id", Map.empty, 0.25)
      .select("id").as[Long].collect().toSet
    val at50 = Mixing.stratifiedSample(df, "g", "id", Map.empty, 0.50)
      .select("id").as[Long].collect().toSet
    assert(at25.subsetOf(at50))
    // the coin is uniform enough that quotas land near their targets
    assert(math.abs(at50.size / 2000.0 - 0.5) < 0.05)
  }

  test("packSequences: offsets are the contiguous per-shard stream; bins chunk by budget") {
    val df = Seq((0L, 30L), (8L, 50L), (16L, 40L), (1L, 100L), (9L, 10L))
      .toDF("id", "w")
    val out = Mixing.packSequences(df, "id", "w", budget = 60L, shards = 8)
      .select("id", "shard", "offset", "bin")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // shard 0 stream: id 0 (w=30) -> offset 0 bin 0; id 8 (w=50) -> offset 30
    // bin 0 (starts inside bin 0, crosses the boundary); id 16 -> offset 80 bin 1
    assert(out.toSeq == Seq((0L, 0L, 0L, 0L), (1L, 1L, 0L, 0L),
      (8L, 0L, 30L, 0L), (9L, 1L, 100L, 1L), (16L, 0L, 80L, 1L)))
  }

  test("packSequences: rejects non-positive budget/shards") {
    val df = Seq((0L, 1L)).toDF("id", "w")
    intercept[IllegalArgumentException](Mixing.packSequences(df, "id", "w", 0L, 8))
    intercept[IllegalArgumentException](Mixing.packSequences(df, "id", "w", 10L, 0))
  }
}
