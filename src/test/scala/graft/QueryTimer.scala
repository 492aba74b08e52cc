package graft

import org.apache.spark.sql.SparkSession

/** Test-scope timing harness: `Test/runMain graft.QueryTimer <sfDir> <query>...`
  * times named catalog queries (all of them if none given). Not part of the
  * library artifact.
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Queries.all.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warm codegen/JIT
    try Queries.all("q1_agg")(spark, sfDir).queryExecution.toRdd.count()
    catch { case _: Throwable => () }

    names.foreach { name =>
      (1 to 2).foreach { run =>
        val t0 = System.nanoTime()
        val n = Queries.all(name)(spark, sfDir).queryExecution.toRdd.count()
        println(f"$name%-28s run$run ${(System.nanoTime() - t0) / 1e9}%7.3f s  ($n rows)")
      }
    }
    spark.stop()
  }
}
