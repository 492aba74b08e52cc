package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Late-interaction (ColBERT-style, Khattab & Zaharia 2020) MaxSim score
  * between a document's token-vector list and a query's token-vector list:
  *
  *   score(D, Q) = Σ_{q ∈ Q} max_{d ∈ D} dot(q, d)
  *
  * The multi-vector analog of the reference's single-vector similarity
  * surface (`/root/reference/index/space/space.go:40-73`) — each query
  * token independently finds its best-matching document token, and the
  * evidence sums. Both sides are `array<array<float|double>>`.
  *
  * Reproducibility contract (matches [[VectorDistance]]): every dot product
  * folds in element order in double precision; the max over document tokens
  * is order-free; the outer sum folds in QUERY-TOKEN order. A DuckDB oracle
  * replays it bit-for-bit with `max(list_inner_product(..))` grouped per
  * query token and `sum(m ORDER BY token_pos)`.
  *
  * An empty document token list contributes 0.0 per query token ("no
  * evidence"), keeping the expression total; operators filter empty docs
  * upstream. Fully codegen'd: nested primitive loops over `ArrayData`, no
  * boxing, stays inside WholeStageCodegen.
  */
case class MaxSimScore(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "maxsim_score"

  private def innerElemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[ArrayType].elementType

  private def readElem(arr: ArrayData, i: Int, et: DataType): Double = et match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  private def readElemCode(v: String, i: String, et: DataType): String = et match {
    case FloatType => s"(double) $v.getFloat($i)"
    case DoubleType => s"$v.getDouble($i)"
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(ArrayType(FloatType | DoubleType, _), _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<array<float|double>> inputs, " +
          s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val d = a.asInstanceOf[ArrayData]
    val q = b.asInstanceOf[ArrayData]
    val dt = innerElemType(left)
    val qt = innerElemType(right)
    val nd = d.numElements()
    val nq = q.numElements()
    var score = 0.0
    var j = 0
    while (j < nq) {
      val qv = q.getArray(j)
      var best = 0.0
      var first = true
      var i = 0
      while (i < nd) {
        val dv = d.getArray(i)
        val n = math.min(qv.numElements(), dv.numElements())
        var acc = 0.0
        var e = 0
        while (e < n) {
          acc += readElem(dv, e, dt) * readElem(qv, e, qt)
          e += 1
        }
        if (first || acc > best) { best = acc; first = false }
        i += 1
      }
      if (!first) score += best
      j += 1
    }
    score
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dt = innerElemType(left)
      val qt = innerElemType(right)
      val nd = ctx.freshName("nd")
      val nq = ctx.freshName("nq")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val e = ctx.freshName("e")
      val n = ctx.freshName("n")
      val qv = ctx.freshName("qv")
      val dv = ctx.freshName("dv")
      val acc = ctx.freshName("acc")
      val best = ctx.freshName("best")
      val score = ctx.freshName("score")
      val ad = classOf[ArrayData].getName
      s"""
       |int $nd = $a.numElements();
       |int $nq = $b.numElements();
       |double $score = 0.0;
       |for (int $j = 0; $j < $nq; $j++) {
       |  $ad $qv = $b.getArray($j);
       |  double $best = 0.0;
       |  boolean ${best}_first = true;
       |  for (int $i = 0; $i < $nd; $i++) {
       |    $ad $dv = $a.getArray($i);
       |    int $n = java.lang.Math.min($qv.numElements(), $dv.numElements());
       |    double $acc = 0.0;
       |    for (int $e = 0; $e < $n; $e++) {
       |      $acc += (${readElemCode(dv, e, dt)}) * (${readElemCode(qv, e, qt)});
       |    }
       |    if (${best}_first || $acc > $best) { $best = $acc; ${best}_first = false; }
       |  }
       |  if (!${best}_first) $score += $best;
       |}
       |${ev.value} = $score;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
