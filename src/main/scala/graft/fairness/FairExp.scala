package graft.fairness

import graft.search.LrScorer
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FairExp second-stage selection (`fairexp.py:299-740`): a forward-floating
  * feature-subset search over complexity-ordered constructed features,
  * optimizing accuracy (F1) first, then repairing fairness (ROD) by
  * floating removal, with the final subset picked as the Pareto point
  * closest to the ideal (F1=1, ROD=0) (`fairexp.py:235-254, 715-731`).
  *
  * Every subset evaluation is one Spark LR fit + one ROD aggregation —
  * the driver loop holds only feature names and scores.
  */
object FairExp {

  final case class Eval(features: Seq[String], f1: Double, rod: Double)
  final case class Result(
      selected: Seq[String], f1: Double, rod: Double,
      visited: Seq[Eval], paretoFront: Seq[Eval])

  /** Evaluate one subset: deterministic 70/30 hash split, LR fit, F1 on the
    * held-out split, ROD from held-out predicted probabilities over the
    * admissible contexts (reference: per-fold GridSearchCV F1 +
    * predict_proba -> ROD, `fairexp.py:257-296`).
    */
  def evaluate(
      df: DataFrame,
      features: Seq[String],
      labelCol: String,
      isProtected: Column,
      admissible: Seq[String]): Eval = {
    val base = df
      // split hash over the FULL input row — hashing just the feature values
      // collapses low-cardinality features into one side of the split
      .withColumn("__test", pmod(xxhash64(struct(df.columns.map(col): _*), lit(42)), lit(10)) < 3)
      .select((features.map(c => col(c).cast("double").as(c)) ++
        admissible.map(col) :+ col(labelCol).cast("double").as("label") :+
        isProtected.as("__prot") :+ col("__test")): _*)
      .na.drop(features :+ "label")
      // cache: the train fit, the F1 evaluation and the ROD aggregation are
      // three independent actions over this frame — uncached, each replays
      // the scan+derive lineage (same rows, same partitions, so every fitted
      // float is unchanged)
      .cache()
    try {
      val assembler = new VectorAssembler().setInputCols(features.toArray).setOutputCol("features")
      val model = new LogisticRegression().setMaxIter(50).setTol(1e-6)
        .fit(assembler.transform(base.filter(!col("__test"))))
      val pred = model.transform(assembler.transform(base.filter(col("__test"))))
        .withColumn("__p", element_at(org.apache.spark.ml.functions.vector_to_array(col("probability")), 2))
      val f1 = new MulticlassClassificationEvaluator()
        .setMetricName("f1").setLabelCol("label").evaluate(pred)
      val rod = FairMetrics.rod(pred, col("__p"), col("__prot"), admissible)
        .head().getDouble(0)
      Eval(features, f1, rod)
    } finally { base.unpersist(); () }
  }

  /** @param featureCols candidate features in ascending complexity order
    *                    (`fairexp.py:184-189`)
    */
  def run(
      df: DataFrame,
      featureCols: Seq[String],
      labelCol: String,
      isProtected: Column,
      admissible: Seq[String],
      f1Tolerance: Double = 0.02): Result = {
    val visited = collection.mutable.ArrayBuffer[Eval]()
    def eval(fs: Seq[String]): Eval = {
      val e = evaluate(df, fs, labelCol, isProtected, admissible)
      visited += e
      e
    }

    // Phase 1: forward add in complexity order, keep if F1 improves, with
    // floating backward elimination after each accepted add
    var selected = Vector.empty[String]
    var bestF1 = Double.NegativeInfinity
    featureCols.foreach { f =>
      val cand = selected :+ f
      val e = eval(cand)
      if (e.f1 > bestF1) {
        selected = cand; bestF1 = e.f1
        // floating elimination: drop any earlier feature whose removal improves F1.
        // The sequential walk stops at the first improving removal; the
        // candidate evaluations are independent, so they run CONCURRENTLY
        // (FitPool, the reference n_jobs knob) and the decision walk replays
        // over the results — only evaluations the sequential loop would have
        // reached are appended to `visited`, so the recorded trajectory (and
        // the Pareto front over it) is identical
        var improved = true
        while (improved && selected.size > 1) {
          improved = false
          val cands = selected.dropRight(1).map(g => selected.filterNot(_ == g))
          val evs = graft.search.FitPool.map(df.sparkSession, "fairexp-float", cands)(
            fs => evaluate(df, fs, labelCol, isProtected, admissible))
          cands.zip(evs).foreach { case (without, e2) =>
            if (!improved) {
              visited += e2
              if (e2.f1 > bestF1) { selected = without; bestF1 = e2.f1; improved = true }
            }
          }
        }
      }
    }

    // Phase 2: fairness repair — floating removal driven by ROD, keeping F1
    // within tolerance of the phase-1 best
    var current = selected
    var curEval = eval(current)
    var improvedRod = true
    while (improvedRod && current.size > 1) {
      improvedRod = false
      // the leave-one-out evaluations of a round are independent -> fit
      // concurrently (reference n_jobs knob); append to `visited` in task
      // order so the Pareto front is identical to the sequential loop
      val options = graft.search.FitPool.map(df.sparkSession, "fairexp", current) { g =>
        evaluate(df, current.filterNot(_ == g), labelCol, isProtected, admissible)
      }
      options.foreach(visited += _)
      val ok = options.filter(o => o.f1 >= bestF1 - f1Tolerance)
      val better = ok.filter(_.rod > curEval.rod) // ROD is negative; closer to 0 = fairer
      if (better.nonEmpty) {
        val pick = better.maxBy(_.rod)
        current = pick.features.toVector; curEval = pick; improvedRod = true
      }
    }

    // Pareto selection: min distance to the ideal point (F1=1, ROD=0)
    val front = paretoFront(visited.toSeq)
    val winner = front.minBy(e => math.sqrt(math.pow(1 - e.f1, 2) + math.pow(e.rod, 2)))
    Result(winner.features, winner.f1, winner.rod, visited.toSeq, front)
  }

  /** Non-dominated (maximize f1, maximize rod since rod <= 0) subsets. */
  def paretoFront(evals: Seq[Eval]): Seq[Eval] =
    evals.filter(e => !evals.exists(o =>
      (o.f1 >= e.f1 && o.rod >= e.rod) && (o.f1 > e.f1 || o.rod > e.rod)))
}
