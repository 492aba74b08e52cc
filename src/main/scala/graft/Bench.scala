package graft

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the JVM/codegen once so per-query times measure the plan, not JIT.
    try SparkEntry.queries("q1_agg")(spark, sfDir).queryExecution.toRdd.count()
    catch { case _: Throwable => () }

    // Best-of-N per query (warm): a single timing conflates the plan with
    // whatever else the machine is doing — round-over-round regressions are
    // only attributable when environment drift is squeezed out of the
    // measurement. The min is the statistic least sensitive to load spikes.
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    // Optional comma-separated query filter (local iteration only; the
    // driver passes no args and benches the full catalog).
    val only: Option[Set[String]] = args.headOption.map(_.split(",").toSet)
    var errors = Map.empty[String, String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      // a failed rep contributes no timing — min over successes only, so a
      // broken query reports -1 next to its error entry instead of the
      // misleadingly fast time of the rep that threw
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        // toRdd.count() executes the full physical plan (a plain .count()
        // would let Catalyst prune computed columns and measure the scan).
        try {
          fn(spark, sfDir).queryExecution.toRdd.count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            errors += name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
            None
        }
      }
      name -> (if (times.isEmpty) -1.0 else times.min)
    }

    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qs = results.map { case (k, v) => s"${q(k)}:$v" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"failed":${errors.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
