package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

import graft.functions.VectorDistance

/** Declarative-SQL kNN dispatch — the optimizer half of the custom-operator
  * path. Users write the canonical top-k-by-distance idiom in plain SQL:
  *
  * {{{
  * SELECT qid, id, dist FROM (
  *   SELECT q.qid, d.id, dist_euclidean(d.vector, q.qv) AS dist,
  *          row_number() OVER (PARTITION BY q.qid
  *                             ORDER BY dist_euclidean(d.vector, q.qv), d.id) AS rnk
  *   FROM vectors d CROSS JOIN query_batch q)
  * WHERE rnk <= 10
  * }}}
  *
  * and this [[Rule]] rewrites the cross join + full window scan into
  * [[KnnCandidatesNode]]: one bounded-heap pass over the data emitting at most
  * k·P candidate rows, with the original `Window`/`Filter` kept on top as the
  * k-merge. The rewrite is exact — the per-partition heap and the window share
  * the same (dist, id) total order, so every global top-k row survives the
  * candidate pass — and fires only when it can prove the pattern:
  *
  *  - the rank filter is `row_number() <= k` (or `< k+1`) with a literal k;
  *  - the window is `PARTITION BY qid ORDER BY dist ASC, id ASC` where `dist`
  *    resolves to a [[VectorDistance]] between one column of each join side;
  *  - the join is an unconditioned INNER/CROSS join whose query side folded to
  *    a [[LocalRelation]] (literal VALUES / local Datasets — bounded by
  *    construction, ≤ [[KnnSqlRewrite.MaxQueries]] rows, no nulls);
  *  - every projected column maps onto the node's (qid, id, dist) output.
  *
  * Anything else is left untouched for the standard planner. Like the rest of
  * the kNN surface (`Knn.bruteForce`, [[KnnCandidates.knn]]) the rewritten
  * operator assumes non-null (id, vector) data rows.
  *
  * Reference anchor: search semantics of `index/index.go:62-75` (top-k by
  * distance with id tie-break), surfaced through SQL instead of an API call.
  */
object KnnRewrite {

  /** Idempotently install the rewrite rule + planner strategy on a session
    * built without `GraftExtensions` (e.g. a driver-owned session).
    */
  def install(spark: SparkSession): Unit = {
    KnnCandidates.install(spark)
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val cur = classic.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[KnnSqlRewrite])) {
      classic.experimental.extraOptimizations = cur :+ new KnnSqlRewrite
    }
  }

  /** True when the analyzed/optimized plan dispatched to the custom node. */
  def fired(df: org.apache.spark.sql.DataFrame): Boolean =
    graft.internal.SqlBridge.logicalPlan(df) // force analysis
      .exists(_.isInstanceOf[KnnCandidatesNode]) ||
      df.queryExecution.optimizedPlan.exists(_.isInstanceOf[KnnCandidatesNode])
}

class KnnSqlRewrite extends Rule[LogicalPlan] {
  import KnnSqlRewrite._

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) => tryRewrite(cond, w).getOrElse(f)
  }

  private def tryRewrite(cond: Expression, w: Window): Option[LogicalPlan] = {
    for {
      (rankAttr, k) <- rankLimit(cond)
      _ <- rowNumberFor(w, rankAttr)
      qidAttr0 <- w.partitionSpec match {
        case Seq(a: Attribute) => Some(a)
        case _ => None
      }
      (distKey, idKey) <- w.orderSpec match {
        case Seq(SortOrder(d, Ascending, _, _), SortOrder(i: Attribute, Ascending, _, _)) => Some((d, i))
        case _ => None
      }
      // WindowGroupLimit is a pure optimization node the standard planner may
      // have inserted below the window; the candidates node subsumes it.
      inner = w.child match {
        case wgl: WindowGroupLimit => wgl.child
        case c => c
      }
      rewritten <- inner match {
        case Project(projList, Join(left, right, jt, None, _)) if jt == Inner || jt == Cross =>
          rewriteJoin(w, cond, projList, left, right, qidAttr0, distKey, idKey, k)
        case _ => None
      }
    } yield rewritten
  }

  // scalastyle:off method.length
  private def rewriteJoin(
      w: Window,
      cond: Expression,
      projList: Seq[NamedExpression],
      left: LogicalPlan,
      right: LogicalPlan,
      qidAttr: Attribute,
      distKey: Expression,
      idKey: Attribute,
      k: Int): Option[LogicalPlan] = {
    val distExpr = resolveThrough(distKey, projList)
    val (vecA, vecB, metric) = distExpr match {
      case VectorDistance(a: Attribute, b: Attribute, m) => (a, b, m)
      case _ => return None
    }
    val idAttr = resolveThrough(idKey, projList) match {
      case a: Attribute => a
      case _ => return None
    }
    val qid = resolveThrough(qidAttr, projList) match {
      case a: Attribute => a
      case _ => return None
    }
    // Orient the sides: the data side holds (id, vector); the query side holds
    // (qid, query vector) and must have folded to a literal LocalRelation.
    val oriented = (left.outputSet, right.outputSet) match {
      case (l, r) if l.contains(idAttr) && r.contains(qid) => Some((left, right))
      case (l, r) if r.contains(idAttr) && l.contains(qid) => Some((right, left))
      case _ => None
    }
    val (dataSide, querySide) = oriented.getOrElse(return None)
    val dataVec =
      if (dataSide.outputSet.contains(vecA) && querySide.outputSet.contains(vecB)) vecA
      else if (dataSide.outputSet.contains(vecB) && querySide.outputSet.contains(vecA)) vecB
      else return None
    val queryVec = if (dataVec eq vecA) vecB else vecA
    if (!isLongish(idAttr.dataType) || !isLongish(qid.dataType)) return None
    if (!isFloatArray(dataVec.dataType) || !isFloatArray(queryVec.dataType)) return None

    val queries = collectQueries(querySide, qid, queryVec).getOrElse(return None)
    if (queries.isEmpty || k <= 0) return None

    // (id, vector) feed for the physical operator's fixed row layout.
    val dataChild = Project(Seq(
      Alias(castTo(idAttr, LongType), "id")(),
      Alias(dataVec, "vector")()), dataSide)

    val node = KnnCandidatesNode.create(queries, k, metric, dataChild)
    val Seq(nodeQid, nodeId, nodeDist) = node.output

    // Re-express every projected column in terms of the node output, keeping
    // the original exprIds so the Window/Filter above need no surgery.
    val mapped = projList.map {
      case al @ Alias(child, name) =>
        mapExpr(child, qid, idAttr, distExpr, nodeQid, nodeId, nodeDist)
          .map(e => Alias(castTo(e, al.dataType), name)(exprId = al.exprId))
      case at: Attribute =>
        mapExpr(at, qid, idAttr, distExpr, nodeQid, nodeId, nodeDist)
          .map(e => Alias(castTo(e, at.dataType), at.name)(exprId = at.exprId))
      case _ => None
    }
    if (mapped.exists(_.isEmpty)) return None
    Some(Filter(cond, w.copy(child = Project(mapped.map(_.get), node))))
  }
  // scalastyle:on method.length

  private def mapExpr(
      e: Expression,
      qid: Attribute,
      id: Attribute,
      dist: Expression,
      nodeQid: Attribute,
      nodeId: Attribute,
      nodeDist: Attribute): Option[Expression] = e match {
    case a: Attribute if a.exprId == qid.exprId => Some(nodeQid)
    case a: Attribute if a.exprId == id.exprId => Some(nodeId)
    case other if other.semanticEquals(dist) => Some(nodeDist)
    case _ => None
  }

  /** `rank <= k` / `rank < k+1` with a literal integer bound. */
  private def rankLimit(cond: Expression): Option[(Attribute, Int)] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) => Some((a, k))
    case LessThan(a: Attribute, Literal(k: Int, IntegerType)) => Some((a, k - 1))
    case EqualTo(a: Attribute, Literal(k: Int, IntegerType)) if k == 1 => Some((a, 1))
    case _ => None
  }

  /** The window must compute exactly one expression: `row_number()` bound to
    * the filtered rank attribute.
    */
  private def rowNumberFor(w: Window, rank: Attribute): Option[Unit] =
    w.windowExpressions match {
      case Seq(al @ Alias(WindowExpression(_: RowNumber, _), _)) if al.exprId == rank.exprId => Some(())
      case _ => None
    }

  /** Chase an order/partition key through the pre-window projection to the
    * expression it names (`_w0` extraction aliases, user aliases).
    */
  private def resolveThrough(e: Expression, projList: Seq[NamedExpression]): Expression = e match {
    case a: Attribute =>
      projList.collectFirst {
        case al @ Alias(child, _) if al.exprId == a.exprId => child
        case at: Attribute if at.exprId == a.exprId => at
      }.getOrElse(a)
    case other => other
  }

  /** Driver-side extraction of the literal query batch. Bails (no rewrite) on
    * anything but a plain LocalRelation with in-bounds, null-free rows.
    */
  private def collectQueries(
      plan: LogicalPlan,
      qid: Attribute,
      vec: Attribute): Option[Array[(Long, Array[Float])]] = plan match {
    case lr: LocalRelation if lr.data.length <= MaxQueries =>
      val qi = lr.output.indexWhere(_.exprId == qid.exprId)
      val vi = lr.output.indexWhere(_.exprId == vec.exprId)
      if (qi < 0 || vi < 0) return None
      val out = new Array[(Long, Array[Float])](lr.data.length)
      var i = 0
      while (i < lr.data.length) {
        val row = lr.data(i)
        if (row.isNullAt(qi) || row.isNullAt(vi)) return None
        val q = qid.dataType match {
          case LongType => row.getLong(qi)
          case IntegerType => row.getInt(qi).toLong
          case _ => return None
        }
        out(i) = (q, row.getArray(vi).toFloatArray())
        i += 1
      }
      Some(out)
    case _ => None
  }

  private def castTo(e: Expression, dt: DataType): Expression =
    if (e.dataType == dt) e else Cast(e, dt)

  private def isLongish(dt: DataType): Boolean = dt == LongType || dt == IntegerType

  private def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

object KnnSqlRewrite {
  /** Upper bound on the literal query batch collected at optimization time —
    * same driver-memory contract as the API query arrays.
    */
  final val MaxQueries = 65536
}
