package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen Bloom-filter membership probe over a 64-bit hash column.
  *
  * The expression carries the BROADCAST HANDLE, not the filter: what the
  * plan tree serializes (and what `explain`/canonicalization hash) is a
  * few-byte broadcast id, while the multi-MB bit array ships once per
  * executor through the block manager — the same distribution a UDF
  * closure over `Broadcast.value` gets, without the UDF's lambda-boxing
  * or its codegen opacity. The filter is resolved from the broadcast
  * ONCE per operator instance (a mutable-state init in codegen, a
  * transient lazy in interpreted eval), so the per-row cost is exactly
  * the probe's few hashed bit reads, inside the surrounding
  * whole-stage-codegen span.
  *
  * Used by [[graft.dedup.Dedup.contaminationPairsBloom]]'s first gate;
  * false positives there are removed by the exact join downstream, so
  * this expression only ever PRUNES.
  */
case class BloomMightContainLong(child: Expression, filter: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bf: BloomFilter = filter.value

  override def nullSafeEval(h: Any): Any = bf.mightContainLong(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", filter, "org.apache.spark.broadcast.Broadcast")
    val bfVar = ctx.addMutableState("org.apache.spark.util.sketch.BloomFilter", "bloomFilter",
      v => s"$v = (org.apache.spark.util.sketch.BloomFilter) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, h => s"${ev.value} = $bfVar.mightContainLong($h);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
