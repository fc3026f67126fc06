package graft.transforms

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.{VectorAssembler, Word2Vec}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** spark.ml-backed legacy mappers (SURVEY §2.6 numeric `cluster` /
  * `cluster-dist` and text `AvgWord2VecTransformer`): estimator-style
  * fit-then-attach features. Seeded for reproducibility on a fixed input
  * (KMeans init and Word2Vec negative sampling are seed-deterministic).
  */
object MlOps {

  /** KMeans cluster id + distance-to-centroid features over numeric cols. */
  def kmeansFeatures(df: DataFrame, cols: Seq[String], k: Int,
      seed: Long = 42L): DataFrame = {
    val asm = new VectorAssembler().setInputCols(cols.toArray).setOutputCol("__kmf")
    val v = asm.transform(df.na.drop(cols))
    val model = new KMeans().setK(k).setSeed(seed).setFeaturesCol("__kmf")
      .setPredictionCol("cluster_id").fit(v)
    val centers = model.clusterCenters.map(_.toArray)
    val dist = {
      val vArr = org.apache.spark.ml.functions.vector_to_array(col("__kmf"))
      val perCenter = centers.zipWithIndex.map { case (c, i) =>
        val d2 = c.indices.map(j =>
          pow(element_at(vArr, j + 1) - lit(c(j)), 2)).reduce[Column](_ + _)
        when(col("cluster_id") === i, sqrt(d2))
      }
      coalesce(perCenter: _*)
    }
    model.transform(v).withColumn("cluster_dist", dist).drop("__kmf")
  }

  /** Average word2vec document embedding (AvgWord2VecTransformer): the
    * Word2Vec estimator already averages word vectors per document.
    */
  def avgWord2Vec(df: DataFrame, textCol: String, dim: Int = 16,
      seed: Long = 42L): DataFrame = {
    val withToks = df.withColumn("__toks", split(col(textCol), " "))
    val model = new Word2Vec().setInputCol("__toks").setOutputCol("doc_vec")
      .setVectorSize(dim).setSeed(seed).setMinCount(1).setMaxIter(1)
      .fit(withToks)
    model.transform(withToks).drop("__toks")
  }
}
