package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: docs shorter than 3 tokens produce no shingles, not garbage") {
    val docs = Seq((1L, "a b c d"), (2L, "a b"), (3L, "x"), (4L, "a b c"))
      .toDF("doc_id", "text")
    val sh = Dedup.shingles(docs).collect()
    val byDoc = sh.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(byDoc.getOrElse(1L, 0) == 2)  // "a b c", "b c d"
    assert(!byDoc.contains(2L) && !byDoc.contains(3L))
    assert(byDoc.getOrElse(4L, 0) == 1)
  }

  test("identical docs share all shingles; jaccard pairs find them at 1.0") {
    val docs = Seq((1L, "the fast cat runs home"), (2L, "the fast cat runs home"),
      (3L, "a totally different sentence here")).toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(Dedup.shingles(docs), threshold = 0.9)
      .as[(Long, Long, Double)].collect()
    assert(pairs.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("minhash signatures of identical shingle sets are identical") {
    val docs = Seq((1L, "the fast cat runs home"), (2L, "the fast cat runs home"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(Dedup.shingles(docs)).collect()
    assert(sigs.length == 2)
    assert(sigs(0).toSeq.drop(1) == sigs(1).toSeq.drop(1))
  }
}
