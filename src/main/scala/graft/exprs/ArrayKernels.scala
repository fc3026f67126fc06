package graft.exprs

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd array kernels for the similarity family — the [[TokenPolyHash]]
  * treatment applied to the embedding hot path.
  *
  * Each kernel is value-identical to the higher-order-function formulation it
  * replaces (`aggregate(zip_with(a, b, f), 0.0, (acc, x) => acc + x)`): the
  * SAME left-to-right fold over the same doubles, so every float result is
  * bit-for-bit the one the HOF chain produced — including the null semantics
  * (null input, length mismatch, or a null element all yield null, exactly
  * as a null lambda product poisons the HOF fold). The HOF chain evaluates
  * its lambda through interpreted per-element variable binding and allocates
  * an intermediate array per row; these kernels are one compiled loop in
  * whole-stage codegen, which is what a 64-dim dot product per candidate
  * pair needs at corpus scale.
  */

/** `ArrayDotProduct(a, b)`: sum over i of a(i)*b(i), left-to-right fold from
  * 0.0. Null iff an input is null, lengths differ, or any element is null —
  * the exact outcome of `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)`.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  // no declared input types (AbstractDataType is sql-private; the
  // TokenPolyHash precedent): every call site casts to array<double> first
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayDotProduct =
    copy(left = l, right = r)
}

/** `ArraySqDistance(a, b)`: sum over i of (a(i)-b(i))^2, left-to-right fold
  * from 0.0 — value-identical to
  * `aggregate(zip_with(a, b, (x, y) => (x-y)*(x-y)), 0.0, _ + _)`.
  */
case class ArraySqDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  // no declared input types (AbstractDataType is sql-private; the
  // TokenPolyHash precedent): every call site casts to array<double> first
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $sum += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArraySqDistance =
    copy(left = l, right = r)
}

/** `LshProjection(vec, planeBase)`: sum over i of
  * `vec(i) * plane(planeBase, i)` with
  * `plane(bit, i) = (((i+1)*2654435761 + bit*40503) mod 1009) / 1009.0 - 0.5`
  * — the identical integer-then-double arithmetic of
  * [[graft.similarity.Ann.planeValue]] and of the HOF chain
  * `aggregate(zip_with(vec, sequence(0, size(vec)-1), (x, i) => x * plane(bit, i)), 0.0, _ + _)`,
  * same left-to-right fold. An EMPTY vec yields null: `sequence(0, -1)`
  * produces [0, -1], whose zip_with padding poisons the HOF fold — mirrored
  * here so the kernel is a drop-in.
  */
case class LshProjection(left: Expression, right: Expression)
    extends BinaryExpression {
  // vec must be array<double>, planeBase an int literal (see call sites)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val base = r.asInstanceOf[Int]
    val n = a.numElements()
    if (n == 0) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val p = (((i + 1).toLong * 2654435761L + base.toLong * 40503L) % 1009L).toDouble / 1009.0 - 0.5
      s += a.getDouble(i) * p
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, base) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val p = ctx.freshName("p")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $p = (double)((((long)($i + 1)) * 2654435761L + ((long)$base) * 40503L) % 1009L) / 1009.0 - 0.5;
         |    $sum += $a.getDouble($i) * $p;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): LshProjection =
    copy(left = l, right = r)
}

object ArrayKernels {
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(ArrayDotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  def sqDist(a: Column, b: Column): Column =
    GraftSqlBridge.column(ArraySqDistance(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  def lshProj(vec: Column, planeBase: Int): Column =
    GraftSqlBridge.column(LshProjection(
      GraftSqlBridge.expression(vec),
      GraftSqlBridge.expression(org.apache.spark.sql.functions.lit(planeBase))))
}
