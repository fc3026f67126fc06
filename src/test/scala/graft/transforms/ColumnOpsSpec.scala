package graft.transforms

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ColumnOpsSpec extends SparkSpec {
  import spark.implicits._

  test("scale-safe rankAverage/quantileBucket match single-partition window reference") {
    import org.apache.spark.sql.expressions.Window
    val vs = Seq(5.0, 1.0, 3.0, 3.0, 2.0, 3.0, 9.0, 1.0, 7.0, 4.0)
    val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      .repartition(4)
    val got = ColumnOps.rankAverage(df, col("v"), "r")
      .select("id", "r").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ref = df.withColumn("r",
        rank().over(Window.orderBy(col("v"))).cast("double") +
          (count(lit(1)).over(Window.partitionBy(col("v"))).cast("double") - 1) / 2.0)
      .select("id", "r").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == ref)
    val gotQ = ColumnOps.quantileBucket(df, 3, Seq(col("v"), col("id")), "q")
      .select("id", "q").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val refQ = df.withColumn("q", ntile(3).over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select("id", "q").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotQ == refQ)
  }

  test("plotting positions, trimtail, rsh: hand-checked on a small sample") {
    val vs = Seq(1.0, 2.0, 2.0, 3.0, 10.0)
    val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val pp = ColumnOps.plottingPositions(df, col("v"), "pp")
      .select("id", "pp").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // avg ranks: 1, 2.5, 2.5, 4, 5; pp = (r - .4) / (5 + .2)
    assert(math.abs(pp(0L) - (1 - 0.4) / 5.2) < 1e-12)
    assert(math.abs(pp(1L) - (2.5 - 0.4) / 5.2) < 1e-12)
    assert(math.abs(pp(4L) - (5 - 0.4) / 5.2) < 1e-12)
    // trimtail p=0.2: floor(0.2*5)=1 lowest value nulled
    val tt = ColumnOps.trimtail(df, col("v"), "t", 0.2)
      .select("id", "t").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(tt(0L).isEmpty && tt(1L).nonEmpty && tt(4L).nonEmpty)
    // rsh: band counts / (2nh) with h = 1.2*IQR/n^0.2
    val (n, h) = ColumnOps.rshParams(df, col("v"))
    assert(n == 5)
    val rs = ColumnOps.rshWith(df, col("v"), Seq("id"), "rsh", n, h)
      .select("id", "rsh").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def band(x: Double) = vs.count(v => v >= x - h && v <= x + h)
    vs.zipWithIndex.foreach { case (x, i) =>
      assert(math.abs(rs(i.toLong) - band(x) / (2.0 * n * h)) < 1e-12, s"x=$x")
    }
  }

  test("shared range bounds / rank table: identical results to standalone ops") {
    // the optimization contract: sharing ONE bounds agg / ONE value-rank
    // table across rank ops must be bit-identical to each op fitting alone
    val vs = Seq(5.0, 1.0, 3.0, 3.0, 2.0, 3.0, 9.0, 1.0, 7.0, 4.0, 6.0, 2.0)
    val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      .repartition(4)
    val bounds = Some(ColumnOps.rangeBounds(df, col("v")))
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq).toSet
    assert(rows(ColumnOps.valueRanks(df, col("v"), bounds = bounds)) ==
      rows(ColumnOps.valueRanks(df, col("v"))))
    assert(rows(ColumnOps.quantileBucket(df, 3, Seq(col("v"), col("id")), "q", bounds = bounds)) ==
      rows(ColumnOps.quantileBucket(df, 3, Seq(col("v"), col("id")), "q")))
    val vrt = ColumnOps.valueRankTable(df, col("v"))
    assert(vrt.n == vs.length) // totals' sum == non-null count
    assert(rows(ColumnOps.plottingPositionsOn(df, col("v"), vrt, "pp")) ==
      rows(ColumnOps.plottingPositions(df, col("v"), "pp")))
    assert(rows(ColumnOps.trimtailOn(df, col("v"), vrt, "t", 0.2)) ==
      rows(ColumnOps.trimtail(df, col("v"), "t", 0.2)))
  }

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
