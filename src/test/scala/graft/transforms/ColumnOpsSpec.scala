package graft.transforms

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ColumnOpsSpec extends SparkSpec {
  import spark.implicits._

  test("helmert coding: hand matrix for k=3 (levels a<b<c)") {
    val df = Seq("a", "b", "c", "b").toDF("g")
    val rows = ColumnOps.helmertEncode(df, "g", "h")
      .select("g", "h_1", "h_2").distinct().collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(rows("a") == ((-1.0, -1.0)))
    assert(rows("b") == ((1.0, -1.0)))
    assert(rows("c") == ((0.0, 2.0)))
  }

  test("backward-difference coding: hand matrix for k=4") {
    val df = Seq("a", "b", "c", "d").toDF("g")
    val rows = ColumnOps.backwardDifferenceEncode(df, "g", "bd")
      .select("g", "bd_1", "bd_2", "bd_3").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(rows("a") == ((-0.75, -0.5, -0.25)))
    assert(rows("b") == ((0.25, -0.5, -0.25)))
    assert(rows("c") == ((0.25, 0.5, -0.25)))
    assert(rows("d") == ((0.25, 0.5, 0.75)))
  }

  test("kmeans features: separable blobs get distinct clusters, small distances") {
    val df = spark.range(200).select(
      (when(col("id") % 2 === 0, 0.0).otherwise(10.0) +
        pmod(xxhash64(col("id")), lit(100)).cast("double") / 1000).as("x"),
      (when(col("id") % 2 === 0, 0.0).otherwise(10.0) +
        pmod(xxhash64(col("id") + 1), lit(100)).cast("double") / 1000).as("y"))
    val out = MlOps.kmeansFeatures(df, Seq("x", "y"), 2)
    val byBlob = out.groupBy((col("x") > 5).as("blob"))
      .agg(countDistinct("cluster_id").as("n"), max("cluster_dist").as("d"))
      .collect()
    assert(byBlob.forall(r => r.getLong(1) == 1), byBlob.mkString)
    assert(byBlob.forall(r => r.getDouble(2) < 1.0))
  }

  test("avgWord2Vec produces fixed-dim doc vectors deterministically") {
    val df = Seq("the fast cat", "the slow dog", "fast cat runs").toDF("text")
    val a = MlOps.avgWord2Vec(df, "text", dim = 8)
      .select("doc_vec").collect().map(_.get(0).toString)
    val b = MlOps.avgWord2Vec(df, "text", dim = 8)
      .select("doc_vec").collect().map(_.get(0).toString)
    assert(a.length == 3 && a.forall(_.nonEmpty))
    assert(a.toSeq == b.toSeq) // seeded determinism
  }
}
