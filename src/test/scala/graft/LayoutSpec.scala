package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._

/** Z-order layout: the clustering key must be a correct Morton interleave,
  * the re-layout must be a pure permutation of the input, and — the point
  * of the operator — per-partition min/max spans on EVERY z-column must
  * shrink far below the global span (that shrinkage is exactly what
  * parquet stats pruning converts into skipped files), where a plain sort
  * clusters only its leading column.
  */
class LayoutSpec extends SparkTestBase {

  import spark.implicits._

  test("zvalue interleaves quantized ranks bit by bit") {
    // 2 bits per column, ranks computed over [0, 3] directly
    val df = Seq((0.0, 0.0), (3.0, 0.0), (0.0, 3.0), (3.0, 3.0), (2.0, 1.0))
      .toDF("a", "b")
    val z = df.select(Layout.zvalue(Seq(col("a"), col("b")),
        Seq(0.0, 0.0), Seq(3.0, 3.0), bits = 2)).as[Long].collect().toSeq
    // a bits at even positions, b bits at odd: (a,b)=(3,0)→0b0101=5,
    // (0,3)→0b1010=10, (3,3)→15, (2,1)→ a=10₂→bits 0,2 ⇒ 0b0100; b=01₂→bit 1 ⇒ 0b0010 ⇒ 6
    assert(z === Seq(0L, 5L, 10L, 15L, 6L))
  }

  test("a constant column contributes rank 0 instead of dividing by zero") {
    val df = Seq((1.0, 5.0), (2.0, 5.0)).toDF("a", "b")
    val z = df.select(Layout.zvalue(Seq(col("a"), col("b")),
        Seq(1.0, 5.0), Seq(2.0, 5.0), bits = 2)).as[Long].collect().toSeq
    // b contributes nothing; a=1→rank 0, a=2→rank 3=11₂ at even positions ⇒ 5
    assert(z === Seq(0L, 5L))
  }

  test("zorder is a permutation and clusters both dimensions; a sort clusters only one") {
    // 100×100 grid in row-shuffled order
    val n = 10000
    val df = spark.range(n).select(
        (pmod(xxhash64(col("id")), lit(n)) ).as("shuffled"))
      .select((col("shuffled") % 100).cast("double").as("a"),
        (col("shuffled") / 100).cast("long").cast("double").as("b"),
        col("shuffled").as("id"))
      .repartition(8)
    val zed = Layout.zorder(df, Seq("a", "b"), bits = 8, nPartitions = 16).cache()
    assert(zed.select("id").as[Long].collect().sorted.toSeq ===
      df.select("id").as[Long].collect().sorted.toSeq) // pure permutation

    def spans(d: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val rows = d.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
        .select("sa", "sb").as[(Double, Double)].collect()
      (rows.map(_._1).sum / rows.length, rows.map(_._2).sum / rows.length)
    }
    val (za, zb) = spans(zed)
    // 16 partitions over a 256×256-rank plane: each z-range covers a
    // subgrid, so BOTH average spans sit well under the global 99
    assert(za < 50 && zb < 50, s"z-order spans too wide: a=$za b=$zb")
    val sorted = df.repartitionByRange(16, col("a")).sortWithinPartitions("a")
    val (sa, sb) = spans(sorted)
    assert(sa < 50, s"sanity: sorting clusters its own column (a span $sa)")
    assert(sb > 90, s"sanity: sorting must NOT cluster the other column (b span $sb)")
  }
}
