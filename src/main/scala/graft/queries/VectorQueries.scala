package graft.queries

import graft.Tables
import graft.text.TextVectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-vectorization queries (n-grams, TF-IDF, feature hashing). */
object VectorQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ngrams" -> ((s, dir) =>
      TextVectors.ngramCounts(Tables.documents(s, dir), 2)),
    "q_tfidf" -> ((s, dir) =>
      TextVectors.tfidf(Tables.documents(s, dir))),
    "q_hashing_tf" -> ((s, dir) =>
      TextVectors.hashingTf(Tables.documents(s, dir)))
  )

  private val tokCte =
    """tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
      |         generate_subscripts(string_split(text, ' '), 1) AS pos
      |  FROM documents)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_ngrams" ->
      s"""WITH $tokCte
         |SELECT t1.doc_id, t1.tok || ' ' || t2.tok AS ngram, COUNT(*) AS cnt
         |FROM tok t1 JOIN tok t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
         |GROUP BY t1.doc_id, ngram""".stripMargin,

    "q_tfidf" ->
      s"""WITH $tokCte,
         |n AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM documents),
         |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY doc_id, tok),
         |dfx AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok)
         |SELECT tf.doc_id, tf.tok, tf.tf, dfx.df,
         |       FLOOR(CAST((tf.tf * (LN((n.nd + 1.0) / (dfx.df + 1.0)) + 1.0)) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS tfidf
         |FROM tf JOIN dfx USING (tok), n""".stripMargin,

    "q_hashing_tf" ->
      s"""WITH $tokCte,
         |h AS (
         |  SELECT doc_id,
         |         list_reduce(
         |           list_prepend(CAST(0 AS BIGINT),
         |             list_transform(string_split(tok, ''), c -> CAST(ascii(c) AS BIGINT))),
         |           (a, b) -> (a * 131 + b) % 9007199254740881) AS tid
         |  FROM tok)
         |SELECT doc_id, (((tid % 1000000007) * 2654435761) % 4294967296) % 64 AS bucket, COUNT(*) AS cnt
         |FROM h
         |GROUP BY doc_id, bucket""".stripMargin
  )
}
