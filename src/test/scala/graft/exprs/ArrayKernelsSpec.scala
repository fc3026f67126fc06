package graft.exprs

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The codegen'd array kernels must be BIT-IDENTICAL to the HOF chains they
  * replaced (same left-to-right fold, same null semantics) — the similarity
  * family's oracle parity rests on that equivalence.
  */
class ArrayKernelsSpec extends SparkSpec {

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
  private def hofSq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, x) => acc + x)
  private def hofProj(v: org.apache.spark.sql.Column, base: Int) =
    aggregate(
      zip_with(v, sequence(lit(0), size(v) - 1), (x, i) =>
        x * ((pmod((i + 1) * lit(2654435761L) + lit(base.toLong) * lit(40503L), lit(1009L))
          .cast("double") / 1009.0) - 0.5)),
      lit(0.0d), (acc, x) => acc + x)

  private lazy val fixtures = {
    import spark.implicits._
    Seq(
      (1L, Seq[java.lang.Double](1.5, -2.25, 3.125, 0.1), Seq[java.lang.Double](0.5, 4.0, -1.5, 7.3)),
      (2L, Seq[java.lang.Double](1e-9, 2e9, -3.7, 0.0), Seq[java.lang.Double](5.5, -1e-3, 2.0, 1.0)),
      (3L, Seq[java.lang.Double](1.0, null, 3.0, 4.0), Seq[java.lang.Double](1.0, 2.0, 3.0, 4.0)), // null element
      (4L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0, 2.0, 3.0)), // length mismatch
      (5L, Seq.empty[java.lang.Double], Seq.empty[java.lang.Double]), // empty
      (6L, null, Seq[java.lang.Double](1.0, 2.0)) // null array
    ).toDF("id", "a", "b")
      .select(col("id"), col("a").cast("array<double>").as("a"),
        col("b").cast("array<double>").as("b"))
  }

  private def assertBitIdentical(kernel: org.apache.spark.sql.Column,
      hof: org.apache.spark.sql.Column, what: String): Unit = {
    val rows = fixtures.select(col("id"), kernel.as("k"), hof.as("h")).collect()
    rows.foreach { r =>
      val k = if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1))
      val h = if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2))
      assert((k == null && h == null) ||
        (k != null && h != null &&
          java.lang.Double.doubleToRawLongBits(k) == java.lang.Double.doubleToRawLongBits(h)),
        s"$what diverges on id=${r.getLong(0)}: kernel=$k hof=$h")
    }
  }

  test("ArrayDotProduct == HOF fold, bit-for-bit incl. null semantics") {
    assertBitIdentical(ArrayKernels.dot(col("a"), col("b")), hofDot(col("a"), col("b")), "dot")
  }

  test("ArraySqDistance == HOF fold, bit-for-bit incl. null semantics") {
    assertBitIdentical(ArrayKernels.sqDist(col("a"), col("b")), hofSq(col("a"), col("b")), "sqDist")
  }

  test("LshProjection == HOF plane fold, bit-for-bit, several plane bases") {
    Seq(0, 5, 63, 64 * 11 + 3).foreach { base =>
      assertBitIdentical(ArrayKernels.lshProj(col("a"), base), hofProj(col("a"), base),
        s"lshProj(base=$base)")
    }
  }
}
