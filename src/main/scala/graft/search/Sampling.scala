package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's sampling baselines, Spark-first:
  *
  *  - [[smote]] (`transformations/sampling/SmoteTransformation.py:8`,
  *    imblearn SMOTE): oversample the minority class to parity by
  *    interpolating each minority row toward its nearest same-class
  *    neighbors. Neighbors come from multi-table LSH buckets (never
  *    all-pairs); the interpolation weight is a hash of the (row, neighbor)
  *    ids — deterministic under any partitioning, unlike imblearn's RNG.
  *  - [[condensedNearestNeighbour]] (`instance_selection/
  *    instance_selection_cnn.py:5`): keep a small prototype set that
  *    1-NN-classifies the rest correctly — batch variant: per round,
  *    broadcast the (bounded) prototype set, add the lowest-id misclassified
  *    rows, stop when consistent or at the cap.
  */
object Sampling {

  /** Oversample minority rows (label == minorityLabel) to approximate
    * class parity. Output: original rows + synthetic rows (synthetic get
    * `isSynthetic = 1`). `k` nearest same-class neighbors per row feed the
    * interpolation pool (the imblearn default k=5).
    */
  def smote(df: DataFrame, featureCols: Seq[String], labelCol: String,
      minorityLabel: Double, k: Int = 5, nBits: Int = 4, tables: Int = 4): DataFrame = {
    val base = df.select((featureCols.map(c => col(c).cast("double").as(c)) :+
      col(labelCol).cast("double").as("__y")): _*).na.drop()
      .withColumn("__id", xxhash64(struct(featureCols.map(col): _*), lit(31)))
      .dropDuplicates("__id")
    val minority = base.filter(col("__y") === minorityLabel)
    val nMin = minority.count()
    val nMaj = base.count() - nMin
    val perRow = math.max(((nMaj - nMin).toDouble / math.max(nMin, 1L)).round.toInt, 0)
    if (perRow == 0 || nMin == 0)
      return base.select(featureCols.map(col) :+ col("__y").as(labelCol): _*)
        .withColumn("isSynthetic", lit(0))
    val vec = array(featureCols.map(col): _*)
    val m = minority.withColumn("__v", vec)
    val buckets = (0 until tables).map { t =>
      m.select(col("__id"), col("__v"), lit(t).as("__tbl"),
        graft.similarity.Ann.lshBucket(col("__v"), nBits, t).as("__bkt"))
    }.reduce(_ unionByName _)
    // codegen'd kernel, bit-identical to the HOF fold (ArrayKernelsSpec)
    val d2 = graft.exprs.ArrayKernels.sqDist(col("__v"), col("__nv"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__id")).orderBy(col("__d2"), col("__nid"))
    val neighbors = buckets.as("l")
      .join(buckets.select(col("__tbl"), col("__bkt"),
        col("__id").as("__nid"), col("__v").as("__nv")).as("r"), Seq("__tbl", "__bkt"))
      .filter(col("__id") =!= col("__nid"))
      .select(col("__id"), col("__v"), col("__nid"), col("__nv")).distinct()
      .withColumn("__d2", d2)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
    // synthetic row j of a minority row interpolates toward neighbor
    // (j mod k) with a deterministic weight in [0,1) hashed from
    // (id, nid, j); minority rows whose buckets held no same-class
    // neighbor contribute no synthetics (estimator-sampling semantics)
    val jdf = m.select(col("__id"), col("__v"))
      .withColumn("__j", explode(sequence(lit(0), lit(perRow - 1))))
      .withColumn("__rn", (pmod(col("__j"), lit(k.toLong)) + 1).cast("int"))
    val paired = jdf.join(
      neighbors.select(col("__id"), col("__rn"), col("__nid"), col("__nv")),
      Seq("__id", "__rn"))
    val wgt = pmod(xxhash64(col("__id"), col("__nid"), col("__j")), lit(1000003L))
      .cast("double") / 1000003.0
    val synth = paired
      .withColumn("__w", wgt)
      .withColumn("__sv", zip_with(col("__v"), col("__nv"),
        (x, y) => x + col("__w") * (y - x)))
      .select(featureCols.zipWithIndex.map { case (c, i) =>
        element_at(col("__sv"), i + 1).as(c)
      } :+ lit(minorityLabel).as(labelCol): _*)
      .withColumn("isSynthetic", lit(1))
    base.select(featureCols.map(col) :+ col("__y").as(labelCol): _*)
      .withColumn("isSynthetic", lit(0))
      .unionByName(synth)
  }

  /** Condensed nearest-neighbour instance selection: returns the prototype
    * subset (bounded by `maxPrototypes`). Deterministic: seeds with the
    * lowest-id row of each class; each round adds the `addPerRound`
    * lowest-id rows misclassified by 1-NN against the current prototypes.
    */
  def condensedNearestNeighbour(df: DataFrame, featureCols: Seq[String],
      labelCol: String, maxPrototypes: Int = 256, addPerRound: Int = 64,
      maxRounds: Int = 8): DataFrame = {
    val base = df.select((featureCols.map(c => col(c).cast("double").as(c)) :+
      col(labelCol).cast("double").as("__y")): _*).na.drop()
      .withColumn("__id", xxhash64(struct(featureCols.map(col): _*), lit(47)))
      .dropDuplicates("__id")
      .withColumn("__v", array(featureCols.map(col): _*))
    // seed: lowest-id member of each class
    var protos: Array[(Long, Seq[Double], Double)] = base
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__y")).orderBy(col("__id"))))
      .filter(col("__rn") === 1)
      .select(col("__id"), col("__v"), col("__y"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
    var round = 0
    var changed = true
    while (changed && round < maxRounds && protos.length < maxPrototypes) {
      round += 1
      // broadcast the prototype set as literal arrays: 1-NN label per row
      val scored = protos.map { case (_, pv, py) =>
        // codegen'd kernel, bit-identical to the HOF fold (ArrayKernelsSpec)
        val dd = graft.exprs.ArrayKernels.sqDist(col("__v"), typedLit(pv))
        struct(dd.as("d"), lit(py).as("py"))
      }
      val pred = base.withColumn("__pred",
        array_sort(array(scored: _*)).getItem(0).getField("py"))
      val mis = pred.filter(col("__pred") =!= col("__y"))
        .orderBy(col("__id")).limit(math.min(addPerRound, maxPrototypes - protos.length))
        .select(col("__id"), col("__v"), col("__y"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
      changed = mis.nonEmpty
      protos = protos ++ mis
    }
    val ids = protos.map(_._1).toSeq
    base.filter(col("__id").isin(ids: _*))
      .select(featureCols.map(col) :+ col("__y").as(labelCol): _*)
  }
}
