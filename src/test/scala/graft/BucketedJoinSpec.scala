package graft

import org.apache.spark.sql.functions._

class BucketedJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed+sorted tables join with zero exchanges; sorts stay partition-local") {
    val tmp = java.nio.file.Files.createTempDirectory("bucketed_spec").toString
    spark.sql("DROP TABLE IF EXISTS spec_bucketed_a")
    spark.sql("DROP TABLE IF EXISTS spec_bucketed_b")
    val a = (1L to 1000L).map(i => (i % 97, i)).toDF("k", "va")
    val b = (1L to 500L).map(i => (i % 97, i * 10)).toDF("k", "vb")
    a.repartition(4, col("k"))
      .write.option("path", s"$tmp/a").bucketBy(4, "k").sortBy("k")
      .saveAsTable("spec_bucketed_a")
    b.repartition(4, col("k"))
      .write.option("path", s"$tmp/b").bucketBy(4, "k").sortBy("k")
      .saveAsTable("spec_bucketed_b")

    val j = spark.table("spec_bucketed_a").hint("merge")
      .join(spark.table("spec_bucketed_b"), Seq("k"))
    val rows = j.count()
    // every a-row matches ceil/floor of 500/97 b-rows per key bucket
    assert(rows === a.join(b, Seq("k")).count())

    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed co-located join must not shuffle:\n$plan")
    // Spark >= 3.1 no longer trusts write-time sortedness by default
    // (LEGACY_BUCKETED_TABLE_SCAN_OUTPUT_ORDERING), so SMJ re-sorts —
    // but only WITHIN partitions (global=false): no data movement
    val sorts = plan.linesIterator.filter(_.contains("Sort [")).toSeq
    assert(sorts.nonEmpty && sorts.forall(_.contains("], false, 0")),
      s"any SMJ sort must be partition-local, never global:\n$plan")
  }

  test("the catalog row's aggregate matches the plain join at sf0.001") {
    val out = Queries.all("bucketed_join")(spark, "/root/testdata/sf0.001")
      .as[(String, Double, Double, Long)].collect()
    val l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val exp = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_price"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority")
      .as[(String, Double, Double, Long)].collect()
    assert(out === exp)
  }
}
