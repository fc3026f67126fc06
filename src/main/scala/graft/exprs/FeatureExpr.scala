package graft.exprs

/** The engine's logical feature-expression tree.
  *
  * This is OUR search tree (name, parents, complexity, canonical form) — the
  * analog of the reference's `CandidateFeature(transformation, parents)`
  * expression DAG (`candidates/CandidateFeature.py:13-55`). It carries search
  * metadata; execution happens by lowering to a Catalyst `Column`
  * ([[Lower]]), so Catalyst keeps its own tree for the physical plan.
  *
  * Complexity (reference `CandidateFeature.get_complexity`,
  * `CandidateFeature.py:168-176`): raw column = 1, identity/concat = sum of
  * parents, every other node = sum of parents + 1.
  */
sealed trait FeatureExpr {
  /** Transformation-node count, reference semantics. */
  def complexity: Int = this match {
    case RawCol(_)              => 1
    case ConstOne               => 1
    case ConcatE(cs)            => cs.map(_.complexity).sum
    case Unary(_, c)            => c.complexity + 1
    case BinaryE(_, l, r)       => l.complexity + r.complexity + 1
    case GroupByThenE(_, v, k)  => v.complexity + k.complexity + 1
    case ConstVal(_)            => 0
  }

  /** Raw columns referenced (free symbols). Empty => constant expression
    * (dropped by the search, reference `ComplexityDrivenFeatureConstruction
    * .py:149` `free_symbols == 0`).
    */
  def rawCols: Set[String] = this match {
    case RawCol(n)             => Set(n)
    case ConstOne | ConstVal(_) => Set.empty
    case ConcatE(cs)           => cs.flatMap(_.rawCols).toSet
    case Unary(_, c)           => c.rawCols
    case BinaryE(_, l, r)      => l.rawCols ++ r.rawCols
    case GroupByThenE(_, v, k) => v.rawCols ++ k.rawCols
  }

  /** Stable structural rendering — canonical key AFTER [[Canon.canon]], and
    * the serialization format parsed back by [[FeatureExprParser]]
    * (checkpoint manifests + the ComplexityScore Catalyst expression).
    */
  def render: String = this match {
    case RawCol(n)                        => n
    case ConstOne                         => "const(1.0)"
    case ConstVal(v)                      => s"const($v)"
    case ConcatE(cs)                      => cs.map(_.render).mkString("concat(", ",", ")")
    case Unary(UnaryOp.EqualsStr(v), c)   =>
      s"equals(${c.render},'${FeatureExpr.escape(v)}')"
    case Unary(op, c)                     => s"${op.name}(${c.render})"
    case BinaryE(op, l, r)                => s"${op.name}(${l.render},${r.render})"
    case GroupByThenE(a, v, k)            => s"groupby_${a.name}(${v.render},${k.render})"
  }

  /** Human-readable name, reference style (`"(agg(v) GroupyBy k)"`). */
  def name: String = this match {
    case GroupByThenE(a, v, k) => s"(${a.name}(${v.name}) GroupByThen ${k.name})"
    case _                     => render
  }
}

object FeatureExpr {
  /** Escape a one-hot string value for [[FeatureExpr.render]] — data-derived
    * categorical values may contain quotes/backslashes, which would
    * otherwise break the render/parse round-trip (checkpoint resume) and
    * collide distinct values to one canonical key.
    */
  def escape(v: String): String =
    v.replace("\\", "\\\\").replace("'", "\\'")

  def unescape(v: String): String = {
    val sb = new StringBuilder(v.length)
    var i = 0
    while (i < v.length) {
      if (v(i) == '\\' && i + 1 < v.length) { sb += v(i + 1); i += 2 }
      else { sb += v(i); i += 1 }
    }
    sb.toString
  }
}

final case class RawCol(colName: String) extends FeatureExpr
case object ConstOne extends FeatureExpr              // DummyOneTransformation
final case class ConstVal(v: Double) extends FeatureExpr // canonicalizer result only
final case class ConcatE(children: Seq[FeatureExpr]) extends FeatureExpr
final case class Unary(op: UnaryOp, child: FeatureExpr) extends FeatureExpr
final case class BinaryE(op: BinOp, left: FeatureExpr, right: FeatureExpr) extends FeatureExpr
final case class GroupByThenE(agg: AggKind, value: FeatureExpr, key: FeatureExpr) extends FeatureExpr

/** Unary transforms (reference §2.2: the transformations dir +
  * `generators/NumpyClassGenerator*.py` method lists).
  */
sealed abstract class UnaryOp(val name: String) {
  /** Idempotent under self-nesting (sympy classes `scale`, `impute`,
    * `discretize` in the reference declare `f(f(x)) = f(x)`).
    */
  def idempotent: Boolean = false
  /** Requires fitted global statistics (fit = aggregation). */
  def needsFit: Boolean = false
}
object UnaryOp {
  case object Minus    extends UnaryOp("minus")        // MinusTransformation
  case object Inv      extends UnaryOp("inv")          // OneDivisionTransformation
  case object Log      extends UnaryOp("log")          // LogTransformation
  case object Sqrt     extends UnaryOp("sqrt")
  case object Square   extends UnaryOp("square")
  case object Abs      extends UnaryOp("abs")
  case object Rint     extends UnaryOp("rint")
  case object Exp      extends UnaryOp("exp")
  case object Sin      extends UnaryOp("sin")
  case object Cos      extends UnaryOp("cos")
  case object Tan      extends UnaryOp("tan")
  case object Sinh     extends UnaryOp("sinh")
  case object Cosh     extends UnaryOp("cosh")
  case object Tanh     extends UnaryOp("tanh")
  case object Degrees  extends UnaryOp("degrees")
  case object Radians  extends UnaryOp("radians")
  case object Sigmoid  extends UnaryOp("sigmoid")
  case object MinMax   extends UnaryOp("scale")   { override def idempotent = true; override def needsFit = true }
  case object StdScale extends UnaryOp("stdscale"){ override def idempotent = true; override def needsFit = true }
  case object ZScore   extends UnaryOp("zscore")  { override def idempotent = true; override def needsFit = true }
  /** Supervised Fayyad-Irani MDLP binning (fit needs the label; see
    * [[graft.search.Mdlp]]). */
  case object MDLP extends UnaryOp("mdlpdiscretize") {
    override def idempotent = true; override def needsFit = true
  }
  final case class DiscretizeEW(bins: Int) extends UnaryOp(s"discretize$bins") {
    override def idempotent = true; override def needsFit = true
  }
  final case class DiscretizeQ(bins: Int) extends UnaryOp(s"qdiscretize$bins") {
    override def idempotent = true; override def needsFit = true
  }
  sealed abstract class Impute(n: String) extends UnaryOp(n) {
    override def idempotent = true; override def needsFit = true
  }
  case object ImputeMean   extends Impute("impute_mean")
  case object ImputeMedian extends Impute("impute_median")
  case object ImputeMode   extends Impute("impute_mode")
  /** One-hot indicator for one distinct value (OneHotTransformation:
    * one transform PER value, `(x == value).astype(int)`).
    */
  final case class EqualsStr(value: String) extends UnaryOp(s"equals[$value]")
}

/** Binary ops. Commutative+repetition set = HigherOrderCommutative
  * (nansum/nanprod/nanmax/nanmin); ordered set = NonCommutativeBinary
  * (divide/subtract/power).
  */
sealed abstract class BinOp(val name: String, val commutative: Boolean)
object BinOp {
  case object Add  extends BinOp("add", true)
  case object Mul  extends BinOp("mul", true)
  case object Max2 extends BinOp("max", true)
  case object Min2 extends BinOp("min", true)
  case object Sub  extends BinOp("sub", false)
  case object Div  extends BinOp("div", false)
  case object Pow  extends BinOp("pow", false)
}

/** GroupByThen aggregates (`GroupByThenGenerator.py:139-161` defaults +
  * add-ons).
  */
sealed abstract class AggKind(val name: String) {
  /** Conditionally idempotent: agg(agg(v by k) by k) = agg(v by k)
    * (`groupbythenIdempotentFunction`). */
  def idempotent: Boolean = false
}
object AggKind {
  case object Mean   extends AggKind("mean")   { override def idempotent = true }
  case object Max    extends AggKind("max")    { override def idempotent = true }
  case object Min    extends AggKind("min")    { override def idempotent = true }
  case object Median extends AggKind("median") { override def idempotent = true }
  case object Std    extends AggKind("std")
  case object Var    extends AggKind("var")
  case object Count  extends AggKind("count")
  case object Sum    extends AggKind("sum")
  case object Prod   extends AggKind("prod")
}
