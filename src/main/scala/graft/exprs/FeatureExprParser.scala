package graft.exprs

/** Parser for [[FeatureExpr.render]] — the inverse of the serialization, used
  * by checkpoint resume and the ComplexityScore Catalyst expression.
  *
  * Grammar: expr := ident | name '(' expr (',' expr | ',' "'"str"'")* ')'
  */
object FeatureExprParser {

  def parse(s: String): FeatureExpr = {
    val (e, rest) = parseExpr(s.trim, 0)
    require(rest == s.trim.length, s"trailing input at $rest in: $s")
    e
  }

  def tryParse(s: String): Option[FeatureExpr] =
    try Some(parse(s)) catch { case _: Exception => None }

  private val unaryByName: Map[String, UnaryOp] = Seq(
    UnaryOp.Minus, UnaryOp.Inv, UnaryOp.Log, UnaryOp.Sqrt, UnaryOp.Square,
    UnaryOp.Abs, UnaryOp.Rint, UnaryOp.Exp, UnaryOp.Sin, UnaryOp.Cos,
    UnaryOp.Tan, UnaryOp.Sinh, UnaryOp.Cosh, UnaryOp.Tanh, UnaryOp.Degrees,
    UnaryOp.Radians, UnaryOp.Sigmoid, UnaryOp.MinMax, UnaryOp.StdScale,
    UnaryOp.ZScore, UnaryOp.ImputeMean, UnaryOp.ImputeMedian, UnaryOp.ImputeMode,
    UnaryOp.MDLP)
    .map(op => op.name -> op).toMap

  private val binByName: Map[String, BinOp] = Seq(
    BinOp.Add, BinOp.Mul, BinOp.Max2, BinOp.Min2, BinOp.Sub, BinOp.Div, BinOp.Pow)
    .map(op => op.name -> op).toMap

  private val aggByName: Map[String, AggKind] = Seq(
    AggKind.Mean, AggKind.Max, AggKind.Min, AggKind.Median, AggKind.Std,
    AggKind.Var, AggKind.Count, AggKind.Sum, AggKind.Prod)
    .map(a => a.name -> a).toMap

  private def parseExpr(s: String, pos0: Int): (FeatureExpr, Int) = {
    var pos = pos0
    val start = pos
    while (pos < s.length && (s(pos).isLetterOrDigit || s(pos) == '_' || s(pos) == '.' ||
        s(pos) == '-' || s(pos) == 'E')) pos += 1
    val name = s.substring(start, pos)
    if (pos >= s.length || s(pos) != '(') {
      require(name.nonEmpty, s"empty identifier at $pos0 in: $s")
      (RawCol(name), pos)
    } else {
      pos += 1 // consume '('
      var args = Vector.empty[Either[FeatureExpr, String]]
      if (s(pos) != ')') {
        var done = false
        while (!done) {
          if (s(pos) == '\'') {
            // scan for the closing quote, honoring backslash escapes
            var end = pos + 1
            while (end < s.length && s(end) != '\'') {
              if (s(end) == '\\') end += 1
              end += 1
            }
            require(end < s.length, s"unterminated string at $pos in: $s")
            args :+= Right(FeatureExpr.unescape(s.substring(pos + 1, end)))
            pos = end + 1
          } else {
            val (e, p) = parseExpr(s, pos)
            args :+= Left(e); pos = p
          }
          if (s(pos) == ',') pos += 1 else done = true
        }
      }
      require(s(pos) == ')', s"expected ) at $pos in: $s")
      pos += 1
      (build(name, args), pos)
    }
  }

  private def build(name: String, args: Vector[Either[FeatureExpr, String]]): FeatureExpr = {
    def e(i: Int) = args(i).swap.getOrElse(throw new IllegalArgumentException(s"$name: arg $i is a string"))
    name match {
      case "const" =>
        val v = args.head match {
          case Left(RawCol(n)) => n.toDouble
          case Right(sv)       => sv.toDouble
          case Left(o)         => throw new IllegalArgumentException(s"const($o)")
        }
        if (v == 1.0) ConstOne else ConstVal(v)
      case "concat" => ConcatE(args.map(a => a.swap.toOption.get))
      case "equals" =>
        val v = args(1).getOrElse(throw new IllegalArgumentException("equals: missing value"))
        Unary(UnaryOp.EqualsStr(v), e(0))
      case n if n.startsWith("groupby_") =>
        GroupByThenE(aggByName(n.stripPrefix("groupby_")), e(0), e(1))
      case n if n.startsWith("discretize") =>
        Unary(UnaryOp.DiscretizeEW(n.stripPrefix("discretize").toInt), e(0))
      case n if n.startsWith("qdiscretize") =>
        Unary(UnaryOp.DiscretizeQ(n.stripPrefix("qdiscretize").toInt), e(0))
      case n if unaryByName.contains(n) => Unary(unaryByName(n), e(0))
      case n if binByName.contains(n)   => BinaryE(binByName(n), e(0), e(1))
      case n => throw new IllegalArgumentException(s"unknown function: $n")
    }
  }
}
