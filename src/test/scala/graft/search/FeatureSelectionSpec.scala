package graft.search

import graft.SparkSpec
import graft.fairness.Capuchin
import org.apache.spark.sql.functions._

class FeatureSelectionSpec extends SparkSpec {

  private def data = spark.range(2000).select(
    (pmod(xxhash64(col("id")), lit(100)).cast("double") / 100).as("a"),
    (pmod(xxhash64(col("id") + 1), lit(100)).cast("double") / 100).as("b"))
    .withColumn("a_lin", col("a") * 2 + 1)        // perfectly redundant with a
    .withColumn("y", (col("a") > 0.5).cast("int"))

  test("selectKBestMI ranks the informative feature first") {
    val top = FeatureSelection.selectKBestMI(data, Seq("a", "b", "a_lin"), col("y"), 2)
    assert(top.take(2).toSet.subsetOf(Set("a", "a_lin")), top.toString)
  }

  test("redundancyRemoval drops a linearly dependent column, keeps independents") {
    val kept = FeatureSelection.redundancyRemoval(data, Seq("a", "b", "a_lin"))
    assert(kept.size == 2 && kept.contains("b"), kept.toString)
    assert(kept.count(c => c == "a" || c == "a_lin") == 1)
  }

  test("Capuchin rank-1 repair: independent contingency is a fixpoint, dependent is altered") {
    // context X: independent counts (rank 1) -> weights ~1
    // context Z: diagonal (dependent) -> weights != 1
    val rows = (
      Seq.fill(40)(("X", "m", "0")) ++ Seq.fill(40)(("X", "f", "0")) ++
      Seq.fill(10)(("X", "m", "1")) ++ Seq.fill(10)(("X", "f", "1")) ++
      Seq.fill(50)(("Z", "m", "1")) ++ Seq.fill(50)(("Z", "f", "0")))
    import spark.implicits._
    val df = rows.toDF("ctx", "s", "y")
    val cells = Capuchin.repair(df, Seq("ctx"), col("s"), col("y"))
    val xCells = cells.filter(_.context == Seq("X"))
    assert(xCells.forall(c => math.abs(c.weight - 1.0) < 1e-6), xCells.toString)
    val zCells = cells.filter(_.context == Seq("Z"))
    assert(zCells.exists(c => math.abs(c.weight - 1.0) > 0.2), zCells.toString)
  }
}
