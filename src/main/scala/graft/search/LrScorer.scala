package graft.search

import graft.exprs._
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact model-based scoring of search survivors — the reference's CV
  * grid-search LogisticRegression oracle (`run_evaluation.py:142-243`) and
  * the AICc final selection (`ComplexityDrivenFeatureConstruction.py:
  * 754-802`), applied to the FEW candidates that survive the cheap MI gate
  * (the reference fits LR for every candidate; fitting only survivors is
  * the Spark-shaped two-stage oracle announced in SURVEY §2.4).
  *
  * Folds are deterministic hash folds (`pmod(xxhash64(all columns, salt),
  * k)`) — never randomSplit, which is not reproducible under repartition.
  * Repeated-CV stability (`multiple_cv_scikit.py`) = the same scoring under
  * different fold salts.
  */
object LrScorer {

  final case class LrScore(auc: Double, rss: Double, n: Long)

  /** Reference default LR grid: 7 C values (`ComplexityDrivenFeature
    * Construction.py:40-47`), C = 1/regParam.
    */
  val DefaultGrid: Seq[Double] = Seq(0.001, 0.01, 0.1, 1.0, 10.0, 100.0, 1000.0).map(1.0 / _)

  def foldCol(salt: Int, k: Int): Column =
    pmod(xxhash64(struct(col("*")), lit(salt)), lit(k)).cast("int")

  /** CV-score one candidate set: per grid value, k-fold CV AUC; keep the
    * best mean; rss accumulated from the best grid's out-of-fold
    * probabilities (the reference's `rss` additional metric).
    */
  def score(
      dfIn: DataFrame,
      featureCols: Seq[String],
      labelCol: String,
      folds: Int = 5,
      grid: Seq[Double] = Seq(1.0),
      saltSeed: Int = 42): LrScore = {
    val df = dfIn
      // fold hash over the FULL input row (feature-only hashes collapse
      // low-cardinality features into single folds)
      .withColumn("fold", pmod(xxhash64(struct(dfIn.columns.map(col): _*), lit(saltSeed)), lit(folds)).cast("int"))
      .select((featureCols.map(c => col(c).cast("double").as(c)) :+
        col(labelCol).cast("double").as("label") :+ col("fold")): _*)
      .na.drop()
      .cache()
    try {
      val assembler = new VectorAssembler()
        .setInputCols(featureCols.toArray).setOutputCol("features")
      val evaluator = new BinaryClassificationEvaluator()
        .setRawPredictionCol("probability").setMetricName("areaUnderROC")

      val byGrid = grid.map { reg =>
        val perFold = (0 until folds).map { f =>
          val train = assembler.transform(df.filter(col("fold") =!= f))
          val test = assembler.transform(df.filter(col("fold") === f))
          val model = new LogisticRegression()
            .setRegParam(reg).setMaxIter(50).setTol(1e-6)
            .fit(train)
          val pred = model.transform(test)
          val auc = evaluator.evaluate(pred)
          val Seq(rss, n) = pred
            .select(vectorElement(col("probability"), 1).as("p"), col("label"))
            .agg(sum(pow(col("label") - col("p"), 2)), count(lit(1)))
            .head().toSeq.map(x => x.toString.toDouble)
          (auc, rss, n)
        }
        val meanAuc = perFold.map(_._1).sum / folds
        (meanAuc, perFold.map(_._2).sum, perFold.map(_._3).sum.toLong)
      }
      val best = byGrid.maxBy(_._1)
      LrScore(best._1, best._2, best._3)
    } finally df.unpersist()
  }

  private def vectorElement(v: Column, i: Int): Column =
    element_at(org.apache.spark.ml.functions.vector_to_array(v), i + 1)

  /** Repeated CV with different fold salts (`multiple_cv_scikit.py:44-161`):
    * mean and stddev of the CV AUC across repeats.
    */
  def repeatedCv(df: DataFrame, featureCols: Seq[String], labelCol: String,
      repeats: Int = 5, folds: Int = 5, grid: Seq[Double] = Seq(1.0)): (Double, Double) = {
    val scores = (0 until repeats).map(r =>
      score(df, featureCols, labelCol, folds, grid, saltSeed = 42 + r).auc)
    val mu = scores.sum / repeats
    val sd = math.sqrt(scores.map(s => (s - mu) * (s - mu)).sum / repeats)
    (mu, sd)
  }

  /** AICc final selection over per-complexity champions
    * (`ComplexityDrivenFeatureConstruction.py:754-802`):
    * AICc = 2k + n*ln(rss/n) + 2k(k+1)/(n-k-1), k = complexity.
    * Returns (champion, aicc) per complexity and the global argmin.
    */
  def selectByAicc(
      df: DataFrame,
      result: CdfcResult,
      labelCol: String,
      folds: Int = 5,
      grid: Seq[Double] = Seq(1.0)): (Scored, Seq[(Scored, Double)]) = {
    val champions = result.survivors.filter(_.passed)
      .groupBy(_.complexity).toSeq.sortBy(_._1)
      .map { case (_, ss) => ss.maxBy(_.score) }
    val scored = champions.map { ch =>
      ch -> aiccOf(df, ch, result.fit, labelCol, folds, grid)
    }
    (scored.minBy(_._2)._1, scored)
  }

  private def aiccOf(df: DataFrame, ch: Scored, fit: FitStats, labelCol: String,
      folds: Int, grid: Seq[Double]): Double = {
    val name = Lower.alias(ch.expr)
    val mat = LayerBuilder.select(df, Seq(labelCol), Seq(name -> ch.expr), fit)
    val s = score(mat, Seq(name), labelCol, folds, grid)
    val k = ch.complexity.toDouble
    val n = s.n.toDouble
    2 * k + n * math.log(math.max(s.rss, 1e-12) / n) + (2 * k * (k + 1)) / math.max(n - k - 1, 1.0)
  }
}
