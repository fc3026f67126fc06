package graft.fairness

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FairExpSpec extends SparkSpec {

  // y depends on good1+good2; `leak` encodes the protected attribute (unfair
  // but predictive); `junk` is noise
  private def data = spark.range(3000).select(
    (pmod(xxhash64(col("id")), lit(100)).cast("double") / 100).as("good1"),
    (pmod(xxhash64(col("id") + 1), lit(100)).cast("double") / 100).as("good2"),
    (pmod(xxhash64(col("id") + 2), lit(100)).cast("double") / 100).as("junk"),
    (pmod(xxhash64(col("id") + 3), lit(2)) === 0).as("prot"))
    .withColumn("y", (col("good1") + col("good2") > lit(1.0)).cast("int"))
    .withColumn("leak", col("prot").cast("double") * 0.8 + col("y") * 0.4)
    .withColumn("ctx", (col("good1") > 0.5).cast("string"))

  test("phase 1 keeps informative features and drops noise") {
    val res = FairExp.run(data, Seq("good1", "good2", "junk"), "y", col("prot"), Seq("ctx"))
    assert(res.selected.contains("good1") && res.selected.contains("good2"), res.selected)
    assert(res.f1 > 0.8, res.toString)
    assert(res.visited.nonEmpty && res.paretoFront.nonEmpty)
  }

  test("pareto front contains only non-dominated evals") {
    val evals = Seq(
      FairExp.Eval(Seq("a"), 0.9, -0.5),
      FairExp.Eval(Seq("b"), 0.8, -0.1),
      FairExp.Eval(Seq("c"), 0.7, -0.6)) // dominated by both
    val front = FairExp.paretoFront(evals)
    assert(front.map(_.features.head).toSet == Set("a", "b"))
  }

  test("evaluate returns a finite rod and f1 for a protected-leaking feature") {
    val e = FairExp.evaluate(data, Seq("leak"), "y", col("prot"), Seq("ctx"))
    assert(e.f1 > 0.4 && !e.rod.isNaN && e.rod <= 0.0, e.toString)
  }

  test("speculative floating elimination visits exactly the sequential trajectory") {
    // reference clone of the ORIGINAL sequential phase-1 loop (the r6
    // optimization evaluates a floating round's leave-one-out candidates
    // concurrently but must record the identical decision walk)
    val df = data
    val featureCols = Seq("good1", "good2", "junk")
    val visited = collection.mutable.ArrayBuffer[Seq[String]]()
    var selected = Vector.empty[String]
    var bestF1 = Double.NegativeInfinity
    featureCols.foreach { f =>
      val cand = selected :+ f
      visited += cand
      val e = FairExp.evaluate(df, cand, "y", col("prot"), Seq("ctx"))
      if (e.f1 > bestF1) {
        selected = cand; bestF1 = e.f1
        var improved = true
        while (improved && selected.size > 1) {
          improved = false
          selected.dropRight(1).foreach { g =>
            if (!improved) {
              val without = selected.filterNot(_ == g)
              visited += without
              val e2 = FairExp.evaluate(df, without, "y", col("prot"), Seq("ctx"))
              if (e2.f1 > bestF1) { selected = without; bestF1 = e2.f1; improved = true }
            }
          }
        }
      }
    }
    val res = FairExp.run(df, featureCols, "y", col("prot"), Seq("ctx"))
    // phase 1's trajectory is a prefix of res.visited (phase 2 appends after)
    val phase1 = res.visited.take(visited.size).map(_.features.toList)
    assert(phase1 == visited.map(_.toList).toSeq,
      s"speculative walk diverged:\n got $phase1\n exp ${visited.toSeq}")
  }
}
