package graft.exprs

/** Canonicalization engine: the reference's sympy rewrite system re-expressed
  * as a driver-side Scala term rewriter. It prunes the SEARCH (duplicate /
  * constant candidates), not the physical plan — Catalyst never sees it.
  *
  * Rules reproduced (with reference citations):
  *  - involution: -(-x)=x, 1/(1/x)=x (sympy Mul/Pow automatic)
  *  - idempotence: scale(scale(x))=scale(x), impute, discretize
  *    (`MinMaxScalingTransformation.py:8-11`, `ImputationTransformation.py`,
  *    `PandasDiscretizerTransformation.py`)
  *  - commutative normal form: Add/Mul/Max/Min flatten + sort args; concat
  *    flattens, sorts, dedups (`IdentityTransformation.py:8-31`)
  *  - GroupByThen key normalization: -k, 1/k, scale(k), impute(k), log(k)
  *    all preserve the grouping => replace key by its core
  *    (`generators/GroupByThenGenerator.py:9-28`)
  *  - conditional idempotence: agg(groupbythen(v by k) by k) = inner for
  *    mean/min/max/median; std of it = 0 (`GroupByThenGenerator.py:31-137`)
  *  - agg(v by v) = v (idempotent aggs); std(v by v) = 0
  *  - min(-v by k) = -(max(v by k)), max(-v by k) = -(min(v by k)),
  *    mean(-v by k) = -(mean(v by k)), std strips the minus
  */
object Canon {

  /** Fixpoint canonical form. */
  def canon(e: FeatureExpr): FeatureExpr = {
    var cur = e
    var next = step(cur)
    var i = 0
    while (next != cur && i < 64) { cur = next; next = step(cur); i += 1 }
    next
  }

  /** Canonical key for dedup (the analog of the sympy-string seen-set,
    * `ComplexityDrivenFeatureConstruction.py:150-154`).
    */
  def key(e: FeatureExpr): String = canon(e).render

  /** Constant expression (no free raw columns) — dropped by the search. */
  def isConstant(e: FeatureExpr): Boolean = canon(e).rawCols.isEmpty

  private def step(e: FeatureExpr): FeatureExpr = e match {
    case r @ (RawCol(_) | ConstOne | ConstVal(_)) => r

    case ConcatE(cs) =>
      // flatten + sort + dedup: {a,{b,a}} == {a,b}
      val flat = cs.map(step).flatMap {
        case ConcatE(inner) => inner
        case other          => Seq(other)
      }
      val dedup = flat.distinct.sortBy(_.render)
      if (dedup.size == 1) dedup.head else ConcatE(dedup)

    case Unary(op, c0) =>
      val c = step(c0)
      (op, c) match {
        case (UnaryOp.Minus, Unary(UnaryOp.Minus, x)) => x
        case (UnaryOp.Inv, Unary(UnaryOp.Inv, x))     => x
        case (o, Unary(o2, _)) if o.idempotent && o == o2 => c
        // mdlpdiscretize(scale(x)) = mdlpdiscretize(x) — MDLP is invariant
        // under monotone rescaling (`MDLPDiscretizerTransformation.py:11-17`)
        case (UnaryOp.MDLP, Unary(UnaryOp.MinMax, x)) => step(Unary(UnaryOp.MDLP, x))
        // exp(log(x)) = x, log(exp(x)) = x (sympy automatic simplification)
        case (UnaryOp.Exp, Unary(UnaryOp.Log, x)) => x
        case (UnaryOp.Log, Unary(UnaryOp.Exp, x)) => x
        case _ => Unary(op, c)
      }

    case BinaryE(op, l0, r0) =>
      val l = step(l0); val r = step(r0)
      if (op.commutative) {
        // flatten same-op chain, sort by render, rebuild left-deep
        def flat(x: FeatureExpr): Seq[FeatureExpr] = x match {
          case BinaryE(o2, a, b) if o2 == op => flat(a) ++ flat(b)
          case other => Seq(other)
        }
        val args = (flat(l) ++ flat(r)).sortBy(_.render)
        args.reduceLeft((a, b) => BinaryE(op, a, b))
      } else (op, l, r) match {
        case (BinOp.Sub, a, b) if a == b => ConstVal(0.0)
        case (BinOp.Div, a, b) if a == b => ConstVal(1.0)
        case _ => BinaryE(op, l, r)
      }

    case GroupByThenE(agg, v0, k0) =>
      val v = step(v0)
      val k = normalizeKey(step(k0))
      (agg, v) match {
        // agg(groupbythen(... by k) by k) collapses (idempotent aggs)
        case (a, g @ GroupByThenE(_, _, ik)) if a.idempotent && ik == k => g
        case (AggKind.Std, GroupByThenE(_, _, ik)) if ik == k => ConstVal(0.0)
        case (AggKind.Var, GroupByThenE(_, _, ik)) if ik == k => ConstVal(0.0)
        // agg(v by v)
        case (a, vv) if a.idempotent && vv == k => vv
        case (AggKind.Std, vv) if vv == k => ConstVal(0.0)
        case (AggKind.Var, vv) if vv == k => ConstVal(0.0)
        // sign rules
        case (AggKind.Min, Unary(UnaryOp.Minus, x))  => Unary(UnaryOp.Minus, GroupByThenE(AggKind.Max, x, k))
        case (AggKind.Max, Unary(UnaryOp.Minus, x))  => Unary(UnaryOp.Minus, GroupByThenE(AggKind.Min, x, k))
        case (AggKind.Mean, Unary(UnaryOp.Minus, x)) => Unary(UnaryOp.Minus, GroupByThenE(AggKind.Mean, x, k))
        case (AggKind.Std, Unary(UnaryOp.Minus, x))  => GroupByThenE(AggKind.Std, x, k)
        case (AggKind.Var, Unary(UnaryOp.Minus, x))  => GroupByThenE(AggKind.Var, x, k)
        case _ => GroupByThenE(agg, v, k)
      }
  }

  /** Distinct-count-preserving unwraps on the grouping key. */
  private def normalizeKey(k: FeatureExpr): FeatureExpr = k match {
    case Unary(UnaryOp.Minus, x)    => normalizeKey(x)
    case Unary(UnaryOp.Inv, x)      => normalizeKey(x)
    case Unary(UnaryOp.MinMax, x)   => normalizeKey(x)
    case Unary(_: UnaryOp.Impute, x) => normalizeKey(x)
    case Unary(UnaryOp.Log, x)      => normalizeKey(x)
    case other                      => other
  }
}
