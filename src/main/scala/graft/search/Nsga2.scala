package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** NSGA-II feature-mask selection (reference `evolutionary.py:28-239`:
  * pymoo NSGA2 over binary masks with objectives [model accuracy, ROD,
  * -mask size]). The genetic machinery (fast non-dominated sort, crowding
  * distance, binary tournament, uniform crossover, bitflip mutation) is
  * driver-side over popSize-bit genomes; only objective EVALUATION touches
  * data, and each distinct mask is evaluated once (memoized) as Spark jobs.
  * Seeded `scala.util.Random` — reproducible, unlike pymoo's global RNG.
  */
object Nsga2 {

  final case class Individual(mask: Vector[Boolean], objectives: Vector[Double])

  /** Maximizes every objective. Returns the final front (rank-0).
    *
    * `initPop` seeds the starting population (warm start); when it holds
    * the EXHAUSTIVE mask enumeration, elitist environmental selection
    * (parents ∪ children, best fronts kept) makes the final front exactly
    * the true Pareto front of the whole space, trajectory-independent —
    * the property `q_nsga2` checks against a SQL-recomputed front.
    */
  def run(
      nGenes: Int,
      evaluate: Vector[Boolean] => Vector[Double],
      popSize: Int = 16,
      generations: Int = 5,
      seed: Long = 42L,
      initPop: Seq[Vector[Boolean]] = Nil): Seq[Individual] = {
    require(nGenes > 0 && (if (initPop.nonEmpty) initPop.size else popSize) >= 4)
    val rnd = new scala.util.Random(seed)
    val memo = collection.mutable.HashMap[Vector[Boolean], Vector[Double]]()
    def eval(m: Vector[Boolean]): Vector[Double] = memo.getOrElseUpdate(m, evaluate(m))

    def randomMask(): Vector[Boolean] = Vector.fill(nGenes)(rnd.nextBoolean())
    var pop: Vector[Individual] =
      (if (initPop.nonEmpty) initPop.toVector
       else Vector.fill(popSize)(randomMask())).map(m => Individual(m, eval(m)))

    def dominates(a: Individual, b: Individual): Boolean =
      a.objectives.zip(b.objectives).forall { case (x, y) => x >= y } &&
        a.objectives.zip(b.objectives).exists { case (x, y) => x > y }

    /** Fast non-dominated sort: list of fronts (rank 0 first). */
    def fronts(ind: Vector[Individual]): Vector[Vector[Individual]] = {
      var remaining = ind
      val out = Vector.newBuilder[Vector[Individual]]
      while (remaining.nonEmpty) {
        val front = remaining.filter(a => !remaining.exists(b => b != a && dominates(b, a)))
        out += front
        remaining = remaining.filterNot(front.contains)
      }
      out.result()
    }

    def crowding(front: Vector[Individual]): Map[Individual, Double] = {
      val n = front.size
      if (n <= 2) return front.map(_ -> Double.PositiveInfinity).toMap
      val d = collection.mutable.HashMap(front.map(_ -> 0.0): _*)
      front.head.objectives.indices.foreach { o =>
        val sorted = front.sortBy(_.objectives(o))
        val span = math.max(sorted.last.objectives(o) - sorted.head.objectives(o), 1e-12)
        d(sorted.head) = Double.PositiveInfinity
        d(sorted.last) = Double.PositiveInfinity
        (1 until n - 1).foreach { i =>
          if (!d(sorted(i)).isInfinity)
            d(sorted(i)) += (sorted(i + 1).objectives(o) - sorted(i - 1).objectives(o)) / span
        }
      }
      d.toMap
    }

    def tournament(ranked: Map[Individual, (Int, Double)]): Individual = {
      val a = pop(rnd.nextInt(pop.size)); val b = pop(rnd.nextInt(pop.size))
      val (ra, ca) = ranked(a); val (rb, cb) = ranked(b)
      if (ra < rb || (ra == rb && ca > cb)) a else b
    }

    (0 until generations).foreach { _ =>
      val fs = fronts(pop)
      val ranked = fs.zipWithIndex.flatMap { case (f, r) =>
        val c = crowding(f); f.map(i => i -> (r, c(i)))
      }.toMap
      val children = Vector.fill(popSize) {
        val p1 = tournament(ranked); val p2 = tournament(ranked)
        var child = p1.mask.zip(p2.mask).map { case (x, y) => if (rnd.nextBoolean()) x else y }
        child = child.map(g => if (rnd.nextDouble() < 1.0 / nGenes) !g else g)
        Individual(child, eval(child))
      }
      // environmental selection: fill from the best fronts of parents+children
      val union = (pop ++ children).distinct
      val selected = Vector.newBuilder[Individual]
      var left = popSize
      fronts(union).foreach { f =>
        if (left > 0) {
          if (f.size <= left) { selected ++= f; left -= f.size }
          else {
            val c = crowding(f)
            selected ++= f.sortBy(i => -c(i)).take(left); left = 0
          }
        }
      }
      pop = selected.result()
    }
    fronts(pop).head
  }

  /** The reference's concrete instantiation (`evolutionary.py:31-66`):
    * maximize (train F1, ROD over predicted probabilities, -|mask|) from
    * ONE logistic-regression fit per distinct mask. Empty masks score
    * (0, -inf, 0) like the reference's all-zero guard (`:34-36`).
    */
  def selectFeatures(
      df: DataFrame,
      featureCols: Seq[String],
      labelCol: String,
      isProtected: org.apache.spark.sql.Column,
      contextCols: Seq[String],
      popSize: Int = 12,
      generations: Int = 3,
      seed: Long = 42L): Seq[Individual] = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.VectorAssembler
    val cached = df.select(
      featureCols.map(c => col(c).cast("double").as(c)) ++
        contextCols.filterNot(featureCols.contains).map(col) :+
        col(labelCol).cast("double").as("__y") :+ isProtected.as("__prot"): _*)
      .na.drop()
    run(featureCols.size, mask => {
      val chosen = featureCols.zip(mask).collect { case (c, true) => c }
      if (chosen.isEmpty) Vector(0.0, Double.NegativeInfinity, 0.0)
      else {
        val asm = new VectorAssembler().setInputCols(chosen.toArray).setOutputCol("features")
        val m = new LogisticRegression().setLabelCol("__y").setMaxIter(30)
          .fit(asm.transform(cached))
        val pred = m.transform(asm.transform(cached))
          .withColumn("__p1",
            org.apache.spark.ml.functions.vector_to_array(col("probability")).getItem(1))
        val agg = pred.agg(
          count(when(col("prediction") === 1 && col("__y") === 1, 1)).as("tp"),
          count(when(col("prediction") === 1 && col("__y") === 0, 1)).as("fp"),
          count(when(col("prediction") === 0 && col("__y") === 1, 1)).as("fn")).head()
        val (tp, fp, fn) = (agg.getLong(0).toDouble, agg.getLong(1).toDouble, agg.getLong(2).toDouble)
        val f1 = if (2 * tp + fp + fn == 0) 0.0 else 2 * tp / (2 * tp + fp + fn)
        val rod = graft.fairness.FairMetrics.rod(pred, col("__p1"), col("__prot"), contextCols)
          .head().getDouble(0)
        Vector(f1, rod, -chosen.size.toDouble)
      }
    }, popSize, generations, seed)
  }
}
