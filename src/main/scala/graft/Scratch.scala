package graft

import graft.internal.SqlBridge
import graft.functions.{ShingleHashSet, JaccardFromSortedSets}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // warm
    docs.queryExecution.toRdd.count()

    val d = docs.select(col("source").as("bucket"), col("doc_id").as("id"),
      SqlBridge.column(ShingleHashSet(SqlBridge.expression(col("text")), 3)).as("hs"))

    time("shingle kernel only")(d.queryExecution.toRdd.count())

    val joined = d.alias("l").join(d.alias("r"), Seq("bucket"))
      .filter(col("l.id") < col("r.id"))
    time("join only (no jaccard)")(
      joined.select(col("l.id"), col("r.id")).queryExecution.toRdd.count())

    val withJ = joined.select(
      col("l.id").as("doc_a"), col("r.id").as("doc_b"),
      SqlBridge.column(JaccardFromSortedSets(
        SqlBridge.expression(col("l.hs")), SqlBridge.expression(col("r.hs")))).as("jaccard"))
    time("join + jaccard")(withJ.queryExecution.toRdd.count())

    time("full query (2nd run)")(
      Queries.all("ngram_jaccard")(spark, dir).queryExecution.toRdd.count())

    time("ann_ivf (2nd run)")(
      Queries.all("ann_ivf")(spark, dir).queryExecution.toRdd.count())

    time("multimodal_features")(
      Queries.all("multimodal_features")(spark, dir).queryExecution.toRdd.count())

    time("doc_embed")(
      Queries.all("doc_embed")(spark, dir).queryExecution.toRdd.count())

    time("dedup_minhash_lsh")(
      Queries.all("dedup_minhash_lsh")(spark, dir).queryExecution.toRdd.count())

    spark.stop()
  }
}
