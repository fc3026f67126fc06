package graft.text

import graft.exprs.PortableRound.col6
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text vectorization family (legacy `NgramTransformer` / `TFIDF` /
  * `HashingTransformer`, SURVEY §2.6): n-gram counts, TF-IDF, and feature
  * hashing — all in portable relational arithmetic (the spark.ml
  * HashingTF/IDF estimators produce the same quantities; the relational
  * form keeps every value reproducible in any SQL engine and scales as
  * plain aggregations).
  */
object TextVectors {

  /** (doc_id, ngram, count): contiguous word n-grams per document.
    *
    * Plan shape: ROW-LOCAL sliding window over `split()` (the
    * [[graft.dedup.Dedup.shingles]] shape) — no joins, no second exchange;
    * the only shuffle is the final groupBy(doc, ngram). The obvious
    * alternative (self-join the exploded token table on (doc, pos+i),
    * round-1's plan) exchanges the full token table n-1 times — a
    * token-count-sized shuffle for no reason at corpus scale.
    */
  def ngramCounts(docs: DataFrame, n: Int, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    val toks = split(col(text), " ")
    docs
      .select(col(id), explode(
        // sequence(0, m) DESCENDS when m < 0, so guard short docs explicitly
        when(size(toks) >= n,
          transform(sequence(lit(0), size(toks) - n),
            i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
          .otherwise(array().cast("array<string>"))).as("ngram"))
      .groupBy(col(id), col("ngram")).agg(count(lit(1)).as("cnt"))
  }

  /** Smoothed TF-IDF per (doc, token): tf * (ln((N+1)/(df+1)) + 1)
    * (sklearn's smooth_idf definition, which the reference's TfidfVectorizer
    * uses by default). tf = raw term count in the doc.
    */
  def tfidf(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame = {
    val toks = TextFeatures.tokens(docs, id, text)
    val nDocs = docs.select(col(id)).distinct().count()
    val tf = toks.groupBy(col(id), col("tok")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "tok")
      .withColumn("tfidf",
        col("tf") * (log((lit(nDocs + 1.0)) / (col("df") + 1.0)) + 1.0))
      .select(col(id), col("tok"), col("tf"), col("df"), col6(col("tfidf")).as("tfidf"))
  }

  /** Feature hashing (HashingTransformer): bucket counts over `numBuckets`
    * via the portable row-local token hash ((tid mod P9) * 2654435761
    * mod 2^32 mod B) — no dictionary, no join, no vocabulary bound.
    */
  def hashingTf(docs: DataFrame, numBuckets: Int = 64, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    val toks = TextFeatures.hashedTokens(docs, id, text)
    toks
      .withColumn("bucket",
        pmod(pmod(pmod(col("tid"), lit(TextFeatures.P9)) * lit(2654435761L),
          lit(4294967296L)), lit(numBuckets.toLong)))
      .groupBy(col(id), col("bucket")).agg(count(lit(1)).as("cnt"))
  }
}
