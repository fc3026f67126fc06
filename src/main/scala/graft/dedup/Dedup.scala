package graft.dedup

import graft.text.TextFeatures
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora:
  *
  *  - [[exact]]: hash-groupBy exact dedup (keep min id per identical text)
  *  - [[shingles]]: 3-token shingle codes over the portable dictionary
  *  - [[minhashSignatures]] + [[lshCandidates]]: MinHash (k hash functions)
  *    banded into LSH buckets; candidate pairs share >= 1 band
  *  - [[jaccardPairs]]: exact shingle-set Jaccard via an inverted-index
  *    self-join (only pairs sharing >= 1 shingle are ever materialized —
  *    never a cross join)
  *
  * All hashes are affine (a*x+b mod prime) over data-derived dictionary
  * ids — deterministic and reproducible in any SQL engine.
  *
  * Scale notes: the inverted-index join keys on shingle code; hot shingles
  * (near-universal n-grams) are the skew risk — [[jaccardPairs]] drops
  * shingles occurring in more than `maxDf` documents (a standard LSH trick:
  * ubiquitous shingles carry no discriminative signal and quadratically
  * blow up the join).
  */
object Dedup {

  val P: Long = 1000000007L

  /** Exact dedup: representative (min id) per identical text. */
  def exact(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame =
    docs.select(col(id), col(text))
      .withColumn("keep_id", min(col(id)).over(org.apache.spark.sql.expressions.Window.partitionBy(col(text))))
      .select(col(id), col("keep_id"), (col(id) =!= col("keep_id")).cast("int").as("is_dup"))

  /** (doc_id, shingle): 3-token shingle codes tid1*V^2 + tid2*V + tid3. */
  def shingles(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame = {
    val toks = TextFeatures.tokens(docs, id, text)
    val dict = TextFeatures.tokenDict(toks)
    val v = dict.count() + 1
    // shingle codes are tid-base-V numerals; minhash multiplies by ~1e9, so
    // V^3 * 1e9 must stay under 2^63 (ANSI). Larger vocabularies need a
    // modular polynomial hash instead of exact codes.
    require(v <= 2000, s"token vocabulary too large for exact shingle codes: $v")
    val t = toks.join(broadcast(dict), "tok").select(col(id), col("pos"), col("tid"))
    val t1 = t.as("t1"); val t2 = t.as("t2"); val t3 = t.as("t3")
    t1.join(t2, col(s"t1.$id") === col(s"t2.$id") && col("t2.pos") === col("t1.pos") + 1)
      .join(t3, col(s"t1.$id") === col(s"t3.$id") && col("t3.pos") === col("t1.pos") + 2)
      .select(col(s"t1.$id").as(id),
        (col("t1.tid") * lit(v * v) + col("t2.tid") * lit(v) + col("t3.tid")).as("shingle"))
      .distinct()
  }

  /** MinHash signature: k affine hashes over the shingle set.
    * Output: (doc_id, mh_0..mh_{k-1}).
    */
  def minhashSignatures(sh: DataFrame, k: Int = 16, id: String = "doc_id"): DataFrame = {
    val aggs = (0 until k).map { i =>
      val a = 1103515245L * (i + 1) % P
      val b = 12345L * (i + 1) % P
      min(pmod(col("shingle") * lit(a) + lit(b), lit(P))).as(s"mh_$i")
    }
    sh.groupBy(col(id)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs: band the signature (bands x rowsPerBand = k),
    * bucket-join on (band index, band signature), dedup pairs (a < b).
    */
  def lshCandidates(sigs: DataFrame, bands: Int = 4, rowsPerBand: Int = 4,
      id: String = "doc_id"): DataFrame = {
    val banded = (0 until bands).map { b =>
      val sig = concat_ws("_",
        (0 until rowsPerBand).map(r => col(s"mh_${b * rowsPerBand + r}").cast("string")): _*)
      sigs.select(col(id), lit(b).as("band"), sig.as("sig"))
    }.reduce(_ unionByName _)
    val l = banded.as("l"); val r = banded.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.sig") === col("r.sig") &&
        col(s"l.$id") < col(s"r.$id"))
      .select(col(s"l.$id").as("a"), col(s"r.$id").as("b"))
      .distinct()
  }

  /** Exact shingle Jaccard for every pair sharing >= 1 (non-ubiquitous)
    * shingle; returns pairs with jaccard >= threshold.
    */
  def jaccardPairs(sh: DataFrame, threshold: Double = 0.5, maxDf: Long = 1000,
      id: String = "doc_id"): DataFrame = {
    val sizes = sh.groupBy(col(id)).agg(count(lit(1)).as("sz"))
    val df = sh.withColumn("df",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("shingle"))))
      .filter(col("df") <= maxDf)
      .select(col(id), col("shingle"))
    val l = df.as("l"); val r = df.as("r")
    val inter = l.join(r, col("l.shingle") === col("r.shingle") && col(s"l.$id") < col(s"r.$id"))
      .groupBy(col(s"l.$id").as("a"), col(s"r.$id").as("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed(id, "a").withColumnRenamed("sz", "sza"), "a")
      .join(sizes.withColumnRenamed(id, "b").withColumnRenamed("sz", "szb"), "b")
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("sza") + col("szb") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }
}
