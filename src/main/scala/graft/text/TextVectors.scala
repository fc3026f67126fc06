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

  /** (doc_id, ngram, count): contiguous word n-grams per document. */
  def ngramCounts(docs: DataFrame, n: Int, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    val toks = TextFeatures.tokens(docs, id, text)
    val joined = (2 to n).foldLeft(
      toks.select(col(id), col("pos"), col("tok").as("g1"))) { (acc, i) =>
      val t = toks.select(col(id).as("__id"), col("pos").as("__pos"), col("tok").as(s"g$i"))
      acc.join(t, col(id) === col("__id") && col("__pos") === col("pos") + (i - 1))
        .drop("__id", "__pos")
    }
    joined
      .select(col(id), concat_ws(" ", (1 to n).map(i => col(s"g$i")): _*).as("ngram"))
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
