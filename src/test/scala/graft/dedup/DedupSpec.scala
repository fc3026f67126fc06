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

  test("fingerprint exact-dedup agrees with full-text exact-dedup") {
    val docs = ((1L to 30L).map(i => (i, s"doc body ${i % 7} with shared text")) ++
      Seq((100L, ""), (101L, ""))).toDF("doc_id", "text")
    val full = Dedup.exact(docs).collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val fp = Dedup.exactByFingerprint(docs).collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(fp == full)
  }

  test("hot-bucket cap drops degenerate LSH buckets; other bands keep recall") {
    // 40 identical docs (one giant bucket in every band) + one near-dup pair
    val docs = ((1L to 40L).map(i => (i, "the same giant cluster text body here")) ++
      Seq((100L, "alpha beta gamma delta epsilon zeta"),
          (101L, "alpha beta gamma delta epsilon zeta")))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(Dedup.shingles(docs))
    val capped = Dedup.lshCandidates(sigs, maxBucket = Some(10)).collect()
    // the 40-doc bucket (780 pairs) is dropped; the pair of 2 survives
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((100L, 101L)))
    val uncapped = Dedup.lshCandidates(sigs).count()
    assert(uncapped == 40L * 39 / 2 + 1)
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

  test("connectedComponents: transitive closure over pairs, singletons, long chains") {
    def cc(pairs: Seq[(Long, Long)], n: Long): Map[Long, Long] = {
      val p = pairs.toDF("a", "b")
      val v = (1L to n).toDF("doc_id")
      Dedup.connectedComponents(p, v)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    // two components + two singletons; transitivity across pairs (1-2, 2-3)
    assert(cc(Seq((1L, 2L), (2L, 3L), (5L, 6L)), 7L) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L, 7L -> 7L))
    // a 30-node path graph — worst case for label propagation, needs the
    // star rounds to contract; all nodes must land on the chain min
    val chain = (1L until 30L).map(i => (i, i + 1))
    assert(cc(chain, 30L).values.toSet == Set(1L))
    // edge direction and duplication must not matter
    assert(cc(Seq((9L, 2L), (2L, 9L), (9L, 2L)), 9L)(9L) == 2L)
    // empty edge set: everything is a singleton
    assert(cc(Nil, 3L) == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }
}
