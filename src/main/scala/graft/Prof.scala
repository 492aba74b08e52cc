package graft
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.1"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val data = e.select(col("vec_id").as("id"), col("embedding").as("vector"))
    val queries = e.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime; f; println(f"PROF $name ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    time("warmup")(graft.knn.Knn.partitionedDF(data, queries.limit(100), 10).queryExecution.toRdd.count())
    time("matryoshkaDF")(graft.knn.Knn.matryoshkaDF(data, queries, 10, 16, 50).queryExecution.toRdd.count())
    time("matryoshkaDF_2nd")(graft.knn.Knn.matryoshkaDF(data, queries, 10, 16, 50).queryExecution.toRdd.count())
    time("matryoshka_arr200")(graft.knn.Knn.matryoshka(data, queries.filter(col("qid") < 200), 10, 16, 50).queryExecution.toRdd.count())
    time("rp_searchDF")(graft.knn.RandomProjection.searchDF(data, queries, 10, 64, 16, 50).queryExecution.toRdd.count())
    time("rp_arr200")(graft.knn.RandomProjection.search(data, queries.filter(col("qid") < 200), 10, 64, 16, 50).queryExecution.toRdd.count())
    time("partitionedDF")(graft.knn.Knn.partitionedDF(data, queries, 10).queryExecution.toRdd.count())
    time("coarse_only_mat")(graft.knn.Knn.partitionedDF(
      data.select(col("id"), slice(col("vector"),1,16).as("vector")),
      queries.select(col("qid"), slice(col("qvec"),1,16).as("qvec")), 50).queryExecution.toRdd.count())
    spark.stop()
  }
}
