package graft.exprs

import org.scalatest.funsuite.AnyFunSuite
import UnaryOp._
import BinOp._
import AggKind._

/** The rewrite laws of `generators/GroupByThenGenerator.py:9-137` and the
  * sympy canonicalization (`ComplexityDrivenFeatureConstruction.py:142-160`,
  * `IdentityTransformation.py:8-31`) — each test names its reference rule.
  */
class CanonSpec extends AnyFunSuite {
  private val a = RawCol("a"); private val b = RawCol("b"); private val k = RawCol("k")
  private def c(e: FeatureExpr) = Canon.canon(e)

  test("involution: -(-x) = x, 1/(1/x) = x") {
    assert(c(Unary(Minus, Unary(Minus, a))) == a)
    assert(c(Unary(Inv, Unary(Inv, a))) == a)
  }

  test("idempotence: scale/impute/discretize self-nesting collapses") {
    for (op <- Seq(MinMax, StdScale, ImputeMean, DiscretizeEW(10): UnaryOp))
      assert(c(Unary(op, Unary(op, a))) == c(Unary(op, a)))
  }

  test("commutative normal form: a+b == b+a, flattened and sorted") {
    assert(c(BinaryE(Add, a, b)) == c(BinaryE(Add, b, a)))
    assert(c(BinaryE(Mul, BinaryE(Mul, b, a), a)) == c(BinaryE(Mul, a, BinaryE(Mul, a, b))))
    assert(c(BinaryE(Max2, b, a)) == c(BinaryE(Max2, a, b)))
  }

  test("concat flatten+sort+dedup: {a,{b,a}} == {a,b} (IdentityTransformation)") {
    assert(c(ConcatE(Seq(a, ConcatE(Seq(b, a))))) == c(ConcatE(Seq(b, a))))
    assert(c(ConcatE(Seq(a))) == a)
  }

  test("constant expressions detected: a-a, a/a, 1") {
    assert(Canon.isConstant(BinaryE(Sub, a, a)))
    assert(Canon.isConstant(BinaryE(Div, a, a)))
    assert(Canon.isConstant(ConstOne))
    assert(!Canon.isConstant(BinaryE(Sub, a, b)))
  }

  test("GroupByThen key normalization: -k, 1/k, scale(k), impute(k), log(k) -> k") {
    val base = GroupByThenE(Mean, a, k)
    for (kk <- Seq(Unary(Minus, k), Unary(Inv, k), Unary(MinMax, k),
        Unary(ImputeMean, k), Unary(Log, k), Unary(Log, Unary(Minus, k))))
      assert(c(GroupByThenE(Mean, a, kk)) == c(base), kk.render)
  }

  test("conditional idempotence: mean(mean(v by k) by k) = mean(v by k); std of it = 0") {
    val inner = GroupByThenE(Mean, a, k)
    assert(c(GroupByThenE(Mean, inner, k)) == c(inner))
    assert(c(GroupByThenE(Max, inner, k)) == c(inner))
    assert(c(GroupByThenE(Std, inner, k)) == ConstVal(0.0))
  }

  test("agg(v by v) = v for idempotent aggs; std(v by v) = 0") {
    assert(c(GroupByThenE(Mean, a, a)) == a)
    assert(c(GroupByThenE(Std, a, a)) == ConstVal(0.0))
  }

  test("sign rules: min(-v by k) = -(max(v by k)); mean(-v by k) = -(mean(v by k)); std strips minus") {
    assert(c(GroupByThenE(Min, Unary(Minus, a), k)) ==
      Unary(Minus, GroupByThenE(Max, a, k)))
    assert(c(GroupByThenE(Max, Unary(Minus, a), k)) ==
      Unary(Minus, GroupByThenE(Min, a, k)))
    assert(c(GroupByThenE(Mean, Unary(Minus, a), k)) ==
      Unary(Minus, GroupByThenE(Mean, a, k)))
    assert(c(GroupByThenE(Std, Unary(Minus, a), k)) == GroupByThenE(Std, a, k))
  }

  test("complexity: raw=1, concat=sum(parents), transform=sum+1 (CandidateFeature.py:168-176)") {
    assert(a.complexity == 1)
    assert(Unary(Log, a).complexity == 2)
    assert(BinaryE(Add, a, b).complexity == 3)
    assert(ConcatE(Seq(a, Unary(Log, b))).complexity == 3)
    assert(GroupByThenE(Mean, a, k).complexity == 3)
  }

  test("exp/log inverse pair") {
    assert(c(Unary(Exp, Unary(Log, a))) == a)
    assert(c(Unary(Log, Unary(Exp, a))) == a)
  }
}
