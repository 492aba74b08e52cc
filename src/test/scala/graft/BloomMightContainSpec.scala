package graft

import graft.functions.BloomMightContainLong
import graft.internal.SqlBridge
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

class BloomMightContainSpec extends SparkTestBase {
  import spark.implicits._

  private def probeCol(bc: org.apache.spark.broadcast.Broadcast[BloomFilter]) =
    SqlBridge.column(BloomMightContainLong(SqlBridge.expression(col("h")), bc))

  test("no false negatives; false positives possible but bounded in practice") {
    val member = (0L until 1000L).map(_ * 7919L)
    val filter = BloomFilter.create(member.size.toLong, 0.01)
    member.foreach(filter.putLong)
    val bc = spark.sparkContext.broadcast(filter)

    val hits = member.toDF("h").filter(probeCol(bc)).count()
    assert(hits === member.size.toLong, "a Bloom filter must never reject a member")

    // 10k non-members at fpp=0.01: expect ~100 stragglers, assert a loose 5x bound
    val nonMember = (0L until 10000L).map(i => i * 7919L + 1L)
    val fp = nonMember.toDF("h").filter(probeCol(bc)).count()
    assert(fp < 500L, s"false-positive count $fp far above the 1% design point")
  }

  test("interpreted eval agrees with the codegen path") {
    val filter = BloomFilter.create(100L, 0.01)
    Seq(1L, 2L, 3L).foreach(filter.putLong)
    val bc = spark.sparkContext.broadcast(filter)
    val expr = BloomMightContainLong(SqlBridge.expression(col("h")), bc)
    // interpreted: direct eval on the expression with a bound row
    val bound = expr.copy(child = org.apache.spark.sql.catalyst.expressions.BoundReference(
      0, org.apache.spark.sql.types.LongType, nullable = false))
    val interp = (0L to 10L).map(h =>
      bound.eval(org.apache.spark.sql.catalyst.InternalRow(h)).asInstanceOf[Boolean])
    // repartition blocks ConvertToLocalRelation so the probe really runs
    // in the executed (codegen) plan, not in a driver-side constant fold
    val codegen = (0L to 10L).map(h =>
      Seq(h).toDF("h").repartition(1).filter(probeCol(bc)).count() == 1L)
    assert(interp === codegen)
    assert(interp.slice(1, 4).forall(identity), "planted members 1..3 must probe true")
  }

  test("null hash rows are dropped (nullIntolerant), and the probe stays inside codegen") {
    val filter = BloomFilter.create(100L, 0.01)
    filter.putLong(42L)
    val bc = spark.sparkContext.broadcast(filter)
    // spark.range is a real (non-foldable) source, so the probe must run
    // in the executed plan rather than in a driver-side constant fold
    val df = spark.range(3)
      .select(when($"id" === 1L, lit(null))
        .otherwise(when($"id" === 0L, lit(42L)).otherwise(lit(43L))).as("h"))
      .filter(probeCol(bc))
    assert(df.as[Option[Long]].collect().flatten.toSet === Set(42L))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" is toString's WholeStageCodegen marker — the Filter carrying
    // the probe must sit inside a codegen stage
    assert(plan.linesIterator.exists(l =>
      l.contains("bloom_might_contain") && l.trim.stripPrefix("+- ").startsWith("*(")),
      s"probe fell out of codegen:\n$plan")
  }
}
