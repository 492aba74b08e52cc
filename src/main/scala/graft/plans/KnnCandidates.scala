package graft.plans

import graft.core.Distances
import graft.internal.SqlBridge
import graft.knn.TopK
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Whole-operator Catalyst extension for kNN candidate generation — the
  * (c)-level custom-operator path: a logical node, a planner strategy, and a
  * physical operator, registered per session. Semantically identical to
  * `Knn.partitioned`'s `mapPartitions` formulation, but planner-visible:
  * Catalyst can push column pruning beneath it, `explain` shows the
  * operator, and the planner composes it with the downstream k-merge
  * window like any built-in node.
  */
case class KnnCandidatesNode(
    queries: Array[(Long, Array[Float])],
    k: Int,
    metric: Int,
    child: LogicalPlan,
    outputAttrs: Seq[Attribute]) extends UnaryNode {

  // stable attributes: held in the constructor so copy()/transform does not
  // mint fresh exprIds and break downstream references
  override def output: Seq[Attribute] = outputAttrs

  // consumes every child column (id, vector) — without this, column pruning
  // sees no references and prunes the scan to struct<>
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    child.outputSet

  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object KnnCandidatesNode {
  def create(
      queries: Array[(Long, Array[Float])],
      k: Int,
      metric: Int,
      child: LogicalPlan): KnnCandidatesNode =
    KnnCandidatesNode(queries, k, metric, child, Seq(
      AttributeReference("qid", LongType, nullable = false)(),
      AttributeReference("id", LongType, nullable = false)(),
      AttributeReference("dist", DoubleType, nullable = false)()))
}

case class KnnCandidatesExec(
    queries: Array[(Long, Array[Float])],
    k: Int,
    metric: Int,
    output: Seq[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  override protected def doExecute(): RDD[InternalRow] = {
    val m = metric
    val kk = k
    val bc = session.sparkContext.broadcast(queries)
    child.execute().mapPartitions { iter =>
      val qs = bc.value
      val heaps = Array.fill(qs.length)(new TopK(kk))
      val kernel = Distances.distance(m) _
      iter.foreach { row =>
        val id = row.getLong(0)
        val vec = row.getArray(1).toFloatArray()
        var qi = 0
        while (qi < qs.length) {
          heaps(qi).push(kernel(vec, qs(qi)._2), id)
          qi += 1
        }
      }
      val proj = UnsafeProjection.create(Array[org.apache.spark.sql.types.DataType](LongType, LongType, DoubleType))
      val out = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        h.sorted.iterator.map { case (dist, id) =>
          out.update(0, qs(qi)._1)
          out.update(1, id)
          out.update(2, dist)
          proj(out)
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Planner rule mapping the logical node to the physical operator. */
class KnnStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case KnnCandidatesNode(queries, k, metric, child, outputAttrs) =>
      KnnCandidatesExec(queries, k, metric, outputAttrs, planLater(child)) :: Nil
    case _ => Nil
  }
}

object KnnCandidates {

  /** Idempotently install the strategy on the session. */
  def install(spark: SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val cur = classic.experimental.extraStrategies
    if (!cur.exists(_.isInstanceOf[KnnStrategy])) {
      classic.experimental.extraStrategies = cur :+ new KnnStrategy
    }
  }

  /** Planner-integrated exact kNN: candidates via the custom operator, then
    * the standard k-merge window. Hash-matches `Knn.bruteForce`.
    * data: (id: long, vector: array<float>).
    */
  def knn(
      spark: SparkSession,
      data: DataFrame,
      queries: Array[(Long, Array[Float])],
      k: Int,
      metric: String = "euclidean"): DataFrame = {
    install(spark)
    val pre = data.select(col("id").cast("long"), col("vector").cast(ArrayType(FloatType)))
    val node = KnnCandidatesNode.create(queries, k, Distances.metricId(metric), SqlBridge.logicalPlan(pre))
    val candidates = SqlBridge.ofRows(spark, node)
    val w = Window.partitionBy("qid").orderBy(col("dist"), col("id"))
    candidates.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
