package graft.search

import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's wrapper-style feature selectors (SURVEY §2.5 residue,
  * `transformations/feature_selection/`): RFE, Boruta, ReliefF, SISSO —
  * re-expressed Spark-first. Each takes a numeric feature matrix + binary
  * label and returns the selected column names.
  *
  * Determinism: the reference delegates to sklearn/boruta/skrebate with
  * seeded RNGs; here every "random" choice is a hash — permutations are
  * orderings by `xxhash64(id, salt)`, sampling is an id-hash filter — so
  * results are reproducible under any partitioning.
  */
object Selectors {

  /** Recursive feature elimination (`FeatureEliminationTransformer.py:5-18`,
    * sklearn RFE over an estimator): fit a linear model on the surviving
    * features, drop the one with the smallest |standardized coefficient|,
    * repeat until `keep` remain. One ml fit per elimination round.
    */
  def rfe(df: DataFrame, featureCols: Seq[String], labelCol: String,
      keep: Int): Seq[String] = {
    var kept = featureCols.toVector
    val base = df.select((featureCols.map(c => col(c).cast("double").as(c)) :+
      col(labelCol).cast("double").as("__y")): _*).na.drop()
    // standardize coefficients by feature stddev so scale does not decide
    val stds = base.agg(
      featureCols.map(c => stddev_pop(col(c)).as(c)).head,
      featureCols.map(c => stddev_pop(col(c)).as(c)).tail: _*).head()
    val sd = featureCols.map(c => c -> math.max(stds.getAs[Double](c), 1e-12)).toMap
    while (kept.size > keep) {
      val asm = new VectorAssembler().setInputCols(kept.toArray).setOutputCol("features")
      val m = new LinearRegression().setLabelCol("__y").setMaxIter(30)
        .fit(asm.transform(base))
      val weakest = kept.zip(m.coefficients.toArray)
        .minBy { case (c, w) => (math.abs(w) * sd(c), c) }._1
      kept = kept.filterNot(_ == weakest)
    }
    kept
  }

  /** Boruta (`BorutaTransformer.py:8-24`: BorutaPy over a depth-5 random
    * forest): each round adds a SHADOW copy of every feature — the column's
    * values under a deterministic hash permutation — fits the forest, and
    * counts a "hit" for every real feature whose importance beats the best
    * shadow importance; features with hits in more than half the rounds are
    * confirmed. (BorutaPy's binomial test over max-shadow hits, simplified
    * to a majority vote with a fixed round count — deterministic, no RNG.)
    */
  def boruta(df: DataFrame, featureCols: Seq[String], labelCol: String,
      rounds: Int = 5, maxDepth: Int = 5, seed: Long = 1L): Seq[String] = {
    val base = df.select((featureCols.map(c => col(c).cast("double").as(c)) :+
      col(labelCol).cast("double").as("__y")): _*).na.drop()
    // rounds are independent (distinct shadow salts) -> concurrent fits;
    // hit counts combine after, so results match the sequential loop exactly
    val perRound = FitPool.map(df.sparkSession, "boruta", 0 until rounds) { r =>
      // Spark ML RandomForest bootstrap sampling is seeded PER PARTITION
      // INDEX and drawn in row order, so featureImportances depends on the
      // fit input's partition layout (shadowed() ends in a shuffle join
      // sized by spark.sql.shuffle.partitions = cpus). Pin the bounded
      // (gate-sized) fit input to a fixed content-hashed partitioning +
      // within-partition order so the confirmed set is invariant to
      // SPARK_GRAFT_CPUS / upstream split count.
      val shadow0 = shadowed(base, featureCols, salt = seed + r)
      val rowH = xxhash64(shadow0.columns.map(col).toSeq: _*)
      val withShadow = shadow0.withColumn("__rh", rowH)
        .repartition(4, col("__rh")).sortWithinPartitions("__rh").drop("__rh")
      val all = featureCols ++ featureCols.map(c => s"__sh_$c")
      val asm = new VectorAssembler().setInputCols(all.toArray).setOutputCol("features")
      val rf = new RandomForestClassifier().setLabelCol("__y")
        .setMaxDepth(maxDepth).setNumTrees(20).setSeed(seed)
        .fit(asm.transform(withShadow))
      val imp = rf.featureImportances.toArray
      val shadowMax = imp.drop(featureCols.size).max
      featureCols.indices.map(i => featureCols(i) -> (imp(i) > shadowMax)).toMap
    }
    featureCols.filter(c => perRound.count(_(c)) * 2 > rounds)
  }

  /** Attach `__sh_<c>` columns: each feature's values under a deterministic
    * hash permutation (rank rows by xxhash64(row, saltA) and by saltB, then
    * join rank-to-rank — value i of ordering B lands on row i of ordering
    * A). Distribution preserved, feature-label association destroyed, no
    * RNG, no driver-side data.
    */
  private[search] def shadowed(base: DataFrame, featureCols: Seq[String],
      salt: Long): DataFrame = {
    val allCols = base.columns.map(col).toSeq
    val hA = xxhash64(struct(allCols: _*), lit(salt))
    val hB = xxhash64(struct(allCols: _*), lit(salt + 1000003L))
    val a = graft.transforms.ColumnOps.ordinalRank(
      base.withColumn("__ha", hA), Seq(col("__ha")), "__ra").drop("__ha")
    val b = graft.transforms.ColumnOps.ordinalRank(
      base.withColumn("__hb", hB), Seq(col("__hb")), "__rb")
      .select(col("__rb") +: featureCols.map(c => col(c).as(s"__sh_$c")): _*)
    a.join(b, col("__ra") === col("__rb")).drop("__ra", "__rb")
  }

  /** ReliefF (`skrebateTransformer.py:7-22`): feature weights from nearest
    * same-class (hit) and other-class (miss) neighbors of sampled probes:
    * w_f += (|x_f - miss_f| - |x_f - hit_f|) / range_f. Probes are an
    * id-hash sample; neighbors are exact nearest by squared euclidean over
    * multi-table LSH candidate buckets (the all-pairs-free shape — probes
    * whose bucket lacks a hit or miss are dropped, standard estimator
    * sampling semantics). Returns the top-`keep` features by weight.
    */
  def reliefF(df: DataFrame, featureCols: Seq[String], labelCol: String,
      keep: Int, probes: Int = 256, nBits: Int = 4, tables: Int = 4): Seq[String] = {
    val base = df.select((featureCols.map(c => col(c).cast("double").as(c)) :+
      col(labelCol).cast("double").as("__y")): _*).na.drop()
      .withColumn("__id", xxhash64(struct(featureCols.map(col): _*), lit(17)))
      .dropDuplicates("__id")
    val ranges = base.agg(
      featureCols.map(c => (max(col(c)) - min(col(c))).as(c)).head,
      featureCols.map(c => (max(col(c)) - min(col(c))).as(c)).tail: _*).head()
    val rng = featureCols.map(c => c -> math.max(ranges.getAs[Double](c), 1e-12)).toMap
    val vec = array(featureCols.map(c => col(c) / lit(rng(c))): _*)
    val e = base.withColumn("__v", vec)
    val total = e.count()
    val sampled = e.filter(pmod(col("__id"), lit(math.max(total / probes, 1L))) === 0)
    val buckets = (0 until tables).map { t =>
      e.select(col("__id"), lit(t).as("__tbl"),
        graft.similarity.Ann.lshBucket(col("__v"), nBits, t).as("__bkt"))
    }.reduce(_ unionByName _)
    val probeB = (0 until tables).map { t =>
      sampled.select(col("__id").as("__pid"), col("__v").as("__pv"), col("__y").as("__py"),
        lit(t).as("__tbl"), graft.similarity.Ann.lshBucket(col("__v"), nBits, t).as("__bkt"))
    }.reduce(_ unionByName _)
    val cand = probeB.join(buckets, Seq("__tbl", "__bkt"))
      .filter(col("__pid") =!= col("__id"))
      .select(col("__pid"), col("__pv"), col("__py"), col("__id")).distinct()
      .join(e.select(col("__id"), col("__v").as("__nv"), col("__y").as("__ny")), "__id")
    // codegen'd kernel, bit-identical to the HOF fold (ArrayKernelsSpec)
    val d2 = graft.exprs.ArrayKernels.sqDist(col("__pv"), col("__nv"))
    val scoredCand = cand.withColumn("__d2", d2)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__pid"), col("__isHit"))
      .orderBy(col("__d2"), col("__id"))
    val nearest = scoredCand
      .withColumn("__isHit", (col("__py") === col("__ny")).cast("int"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
    // per-feature weight contributions, one explode + one agg
    val contrib = nearest.select(col("__pid"), col("__isHit"),
      posexplode(zip_with(col("__pv"), col("__nv"), (x, y) => abs(x - y))).as(Seq("__f", "__ad")))
    val weights = contrib
      .groupBy(col("__f"))
      .agg(sum(when(col("__isHit") === 0, col("__ad")).otherwise(-col("__ad"))).as("__w"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    featureCols.zipWithIndex
      .map { case (c, i) => c -> weights.getOrElse(i, Double.NegativeInfinity) }
      .sortBy { case (c, w2) => (-w2, c) }.take(keep).map(_._1)
  }

  /** SISSO-style screening (`SissoTransformer.py`): iterative
    * sure-independence screening — each round picks the feature most
    * |correlated| with the current residual, refits a linear model on the
    * union, recomputes the residual. `keep` rounds = `keep` features.
    * Correlations are one agg job per round; fits are on the few selected.
    */
  def sisso(df: DataFrame, featureCols: Seq[String], labelCol: String,
      keep: Int): Seq[String] = {
    val base = df.select((featureCols.map(c => col(c).cast("double").as(c)) :+
      col(labelCol).cast("double").as("__y")): _*).na.drop()
    var selected = Vector.empty[String]
    var resCol: Column = col("__y")
    (0 until math.min(keep, featureCols.size)).foreach { _ =>
      val rest = featureCols.filterNot(selected.contains)
      if (rest.nonEmpty) {
        val withRes = base.withColumn("__res", resCol)
        val corrs = withRes.agg(
          rest.map(c => corr(col(c), col("__res")).as(c)).head,
          rest.map(c => corr(col(c), col("__res")).as(c)).tail: _*).head()
        val best = rest.map { c =>
          val v = corrs.getAs[Double](c)
          c -> (if (v.isNaN) 0.0 else math.abs(v))
        }.maxBy { case (c, v) => (v, c) }._1
        selected = selected :+ best
        val asm = new VectorAssembler().setInputCols(selected.toArray).setOutputCol("features")
        val m = new LinearRegression().setLabelCol("__y").setMaxIter(30).fit(asm.transform(base))
        val terms = selected.zip(m.coefficients.toArray)
          .map { case (c, w) => col(c) * lit(w) }
          .reduceOption[Column](_ + _).getOrElse(lit(0.0))
        resCol = col("__y") - (terms + lit(m.intercept))
      }
    }
    selected
  }
}
