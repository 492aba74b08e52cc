package graft.functions

import graft.text.Robots
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row [[Robots]] evaluation with a ThreadLocal parse memo.
  *
  * A politeness join feeds (robots, agent, path) rows where the SAME
  * robots.txt repeats for every census row of a host, so the parse is
  * memoized on the robots text. ThreadLocal single-slot (not a shared
  * slot — concurrent tasks each hold their own deserialized String and
  * would thrash one shared slot; one task per thread makes a per-thread
  * slot hit whenever rows arrive host-clustered, which a host join or
  * host-partitioned census naturally produces).
  */
object RobotsCheckKernel {
  private val memo = new ThreadLocal[(String, Seq[Robots.Group])]

  private def groups(robots: String): Seq[Robots.Group] = {
    val m = memo.get()
    if (m != null && m._1 == robots) m._2
    else {
      val g = Robots.parse(robots)
      memo.set((robots, g))
      g
    }
  }

  def check(robots: UTF8String, agent: UTF8String, path: UTF8String): InternalRow = {
    val d = Robots.evaluate(groups(robots.toString), agent.toString, path.toString)
    new GenericInternalRow(Array[Any](
      d.allowed,
      if (d.rule == null) null else UTF8String.fromString(d.rule),
      if (d.crawlDelay == null) null else d.crawlDelay.doubleValue()))
  }
}

/** `(robots string, agent string, path string) → struct(allowed boolean,
  * rule string, crawl_delay double)` — see [[RobotsCheckKernel]].
  */
case class RobotsCheck(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("allowed", BooleanType, nullable = false),
    StructField("rule", StringType, nullable = true),
    StructField("crawl_delay", DoubleType, nullable = true)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "robots_check"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val bad = children.zip(Seq("robots", "agent", "path"))
      .find(_._1.dataType != StringType)
    bad match {
      case Some((c, n)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"robots_check $n must be string, got ${c.dataType.catalogString}")
      case None =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }
  }

  override def nullSafeEval(r: Any, a: Any, p: Any): Any =
    RobotsCheckKernel.check(r.asInstanceOf[UTF8String],
      a.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (r, a, p) =>
      s"${ev.value} = graft.functions.RobotsCheckKernel.check($r, $a, $p);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
