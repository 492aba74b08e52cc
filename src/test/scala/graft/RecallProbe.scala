package graft

import graft.hnsw.{HnswConfig, HnswSpark}
import graft.knn.{Ivf, Knn}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Test-scope probe: prints per-query n_hits for the approximate ANN catalog
  * entries at each sf, to validate the recall thresholds baked into their
  * closed-form oracles.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { dir =>
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val data = e.select(col("vec_id").as("id"), col("embedding").as("vector"))
      val queriesDf = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val queries = queriesDf.collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
      val exact = Knn.bruteForce(data, queriesDf, 10, "euclidean").select("qid", "id")

      def hits(name: String, approx: org.apache.spark.sql.DataFrame): Unit = {
        val h = approx.select(col("qid"), col("id"))
          .join(exact.withColumn("hit", lit(1L)), Seq("qid", "id"), "left")
          .groupBy("qid").agg(count(lit(1)).as("n"), sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
          .orderBy("qid").collect()
        println(s"$dir $name: " + h.map(r => s"q${r.getLong(0)}=${r.getLong(2)}/${r.getLong(1)}").mkString(" "))
      }

      hits("hnsw ef=100", HnswSpark.search(spark, data, queries, 10, "euclidean",
        HnswConfig(ef = 100), numPartitions = 4))

      hits("hnsw heuristic+extend", HnswSpark.search(spark, data, queries, 10, "euclidean",
        HnswConfig(ef = 100, heuristic = true, extendCandidates = true), numPartitions = 4))
      val exactCos = Knn.bruteForce(data, queriesDf, 10, "cosine").select("qid", "id")
      val hc = HnswSpark.search(spark, data, queries, 10, "cosine",
          HnswConfig(ef = 100), numPartitions = 4)
        .select(col("qid"), col("id"))
        .join(exactCos.withColumn("hit", lit(1L)), Seq("qid", "id"), "left")
        .groupBy("qid").agg(count(lit(1)).as("n"), sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .orderBy("qid").collect()
      println(s"$dir hnsw cosine: " + hc.map(r => s"q${r.getLong(0)}=${r.getLong(2)}/${r.getLong(1)}").mkString(" "))

      // filtered search: allow id % 7 != 0, exact side on the filtered data
      val exactFiltered = Knn.bruteForce(data.filter(col("id") % 7 =!= 0), queriesDf, 10, "euclidean")
        .select("qid", "id")
      val hf = HnswSpark.searchFiltered(spark, data, queries, 10, _ % 7 != 0,
          "euclidean", HnswConfig(ef = 100), numPartitions = 4, efOverride = 150)
        .select(col("qid"), col("id"))
        .join(exactFiltered.withColumn("hit", lit(1L)), Seq("qid", "id"), "left")
        .groupBy("qid").agg(count(lit(1)).as("n"), sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .orderBy("qid").collect()
      println(s"$dir hnsw filtered: " + hf.map(r => s"q${r.getLong(0)}=${r.getLong(2)}/${r.getLong(1)}").mkString(" "))

      // persisted-artifact search
      val out = java.nio.file.Files.createTempDirectory("probe_hnsw").toString
      HnswSpark.buildAndSave(spark, data, out, config = HnswConfig(ef = 100), numPartitions = 4)
      hits("hnsw searchSaved", HnswSpark.searchSaved(spark, out, queries, 10))
      Seq(1, 2).foreach { iters =>
        val centroids = Ivf.train(spark, data, c = 16, iterations = iters)
        val assigned = Ivf.assign(spark, data, centroids).cache()
        Seq(4, 6, 8).foreach { np =>
          hits(s"ivf it=$iters nprobe=$np", Ivf.search(spark, assigned, centroids, queries, k = 10, nprobe = np))
        }
        assigned.unpersist()
      }
    }
    spark.stop()
  }
}
