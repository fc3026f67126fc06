package graft.queries

import graft.Tables
import graft.similarity.Ann
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search queries over `embeddings`. Brute-force top-k is
  * DuckDB-checked (list_dot_product); the LSH paths are rows-only here and
  * recall-tested against brute force in AnnSpec.
  */
object SimilarityQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cosine_topk" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      // rank on rounded cosine + id tie-break so float last-ulp differences
      // between engines cannot flip ranks
      Ann.cosineTopK(e.filter(col("vec_id") < 20), e, k = 5)
    }),
    "q_ann_lsh" -> ((s, dir) =>
      Ann.lshTopK(Tables.embeddings(s, dir), k = 5, nBits = 6)),
    "q_ann_ivf" -> ((s, dir) =>
      Ann.ivfTopK(Tables.embeddings(s, dir), k = 5, nlist = 16, nprobe = 4)),
    "q_near_dup" -> ((s, dir) =>
      Ann.nearDupPairs(Tables.embeddings(s, dir), threshold = 0.9, nBits = 4))
  )

  val oracles: Map[String, String] = Map(
    "q_cosine_topk" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |         SQRT(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS nid,
        |         list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
        |  FROM e q, e c
        |  WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id),
        |ranked AS (
        |  SELECT qid, nid, cos,
        |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY FLOOR(CAST((cos) AS DOUBLE) * 1000000 + 0.5) / 1000000 DESC, nid) AS rnk
        |  FROM scored)
        |SELECT qid, nid, CAST(rnk AS BIGINT) AS rnk, FLOOR(CAST((cos) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS cos
        |FROM ranked WHERE rnk <= 5""".stripMargin
  )
}
