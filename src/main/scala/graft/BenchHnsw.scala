package graft

import graft.core.Distances
import graft.hnsw.{HnswConfig, HnswIndex}
import graft.knn.TopK
import org.apache.spark.sql.SparkSession

/** Single-node HNSW micro-benchmark, comparable to the reference's
  * `run_benchmark.sh` output (`/root/reference/results.txt`: inserts/s,
  * queries/s, avg recall at a given M). Usage: runMain graft.BenchHnsw [sfDir] [M]
  */
object BenchHnsw {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val m = if (args.length > 1) args(1).toInt else 16
    val items: Array[(Long, Array[Float])] =
      if (sfDir.startsWith("synthetic-clustered:")) {
        // synthetic-clustered:N:dim:C — planted Gaussian-ish clusters, the
        // geometry class of the reference's Fashion-MNIST benchmark data
        // (real embedding corpora are clustered; uniform-random vectors at
        // dim 784 are the distance-concentration worst case where ANY
        // graph index degrades — see the clustered-vs-uniform recall
        // discussion at the ann_ivf catalog entry)
        // synthetic-clustered:N:dim:C:latent — clustered points on a
        // latent-dimensional manifold linearly embedded in the ambient
        // space (real image/text embeddings have low INTRINSIC dimension
        // inside a high ambient one; generating full-rank noise at dim
        // 784 is the distance-concentration regime no index survives)
        val parts = sfDir.split(":")
        val n = parts(1).toInt
        val dim = if (parts.length > 2) parts(2).toInt else 784
        val c = if (parts.length > 3) parts(3).toInt else 100
        val latent = if (parts.length > 4) parts(4).toInt else 16
        def unit(x: Long): Double = graft.core.SplitMix.unit(graft.core.SplitMix.mix(x))
        // fixed ambient embedding P (dim × latent), entries ~U(-1,1)/√latent
        val p = Array.tabulate(dim, latent)((d, l) =>
          (unit(d.toLong * 7919L + l * 104729L + 3L) * 2 - 1) / math.sqrt(latent))
        Array.tabulate(n) { i =>
          val cl = i % c
          val z = Array.tabulate(latent) { l =>
            val center = unit(cl.toLong * 1000003L + l)
            val noise = (unit(i.toLong * 31L + l.toLong * 7L + 1L) - 0.5) * 0.2
            center + noise
          }
          (i.toLong, Array.tabulate(dim) { d =>
            var acc = 0.0
            var l = 0
            while (l < latent) { acc += p(d)(l) * z(l); l += 1 }
            acc.toFloat
          })
        }
      } else if (sfDir.startsWith("synthetic:")) {
        // synthetic:N:dim — deterministic random vectors for scale probes
        val parts = sfDir.split(":")
        val n = parts(1).toInt
        val dim = if (parts.length > 2) parts(2).toInt else 64
        val rnd = new scala.util.Random(7)
        Array.tabulate(n)(i => (i.toLong, Array.fill(dim)(rnd.nextFloat())))
      } else {
        val spark = SparkSession.builder().master("local[4]")
          .config("spark.ui.enabled", "false").getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
        val r = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .selectExpr("vec_id", "embedding").collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        spark.stop()
        r
      }

    val dim = items.head._2.length
    val k = 10

    // warm-up pass for JIT
    locally {
      val w = new HnswIndex(Distances.Euclidean, HnswConfig(m = m))
      items.take(500).foreach { case (id, v) => w.add(id, v) }
    }

    val index = new HnswIndex(Distances.Euclidean, HnswConfig(m = m, ef = 20))
    val t0 = System.nanoTime()
    items.foreach { case (id, v) => index.add(id, v) }
    val buildSec = (System.nanoTime() - t0) / 1e9

    val queries = items.take(math.min(1000, items.length))
    val t1 = System.nanoTime()
    var sink = 0L
    queries.foreach { case (_, q) => sink += index.search(q, k).length }
    val searchSec = (System.nanoTime() - t1) / 1e9

    // recall vs exact brute force on a sample
    val sample = queries.take(100)
    val recalls = sample.map { case (_, q) =>
      val heap = new TopK(k)
      items.foreach { case (id, v) => heap.push(Distances.euclidean(v, q), id) }
      val exact = heap.sorted.map(_._2).toSet
      val approx = index.search(q, k).map(_._1).toSet
      approx.intersect(exact).size.toDouble / k
    }
    val recall = recalls.sum / recalls.length

    println(
      f"""{"metric":"hnsw","n":${items.length},"dim":$dim,"m":$m,"build_inserts_per_s":${items.length / buildSec}%.1f,"search_queries_per_s":${queries.length / searchSec}%.1f,"avg_recall":$recall%.4f,"sink":$sink}""")

    // ef sweep: recall vs qps tradeoff on the same graph (ann-benchmarks
    // style, reference run_benchmark.sh sweeps M instead)
    // effective ef = max(config.ef, k passed to search) per hnsw.go:231,
    // so searching with k'=ef and truncating sweeps ef on the same graph
    Seq(10, 20, 50, 100, 200).foreach { ef =>
      val t2 = System.nanoTime()
      var s2 = 0L
      queries.foreach { case (_, q) => s2 += index.search(q, math.max(k, ef)).take(k).length }
      val sec = (System.nanoTime() - t2) / 1e9
      val rec = sample.map { case (_, q) =>
        val heap = new TopK(k)
        items.foreach { case (id, v) => heap.push(Distances.euclidean(v, q), id) }
        val exact = heap.sorted.map(_._2).toSet
        index.search(q, math.max(k, ef)).take(k).map(_._1).toSet.intersect(exact).size.toDouble / k
      }
      println(f"""{"metric":"hnsw_ef_sweep","ef":$ef,"queries_per_s":${queries.length / sec}%.1f,"avg_recall":${rec.sum / rec.length}%.4f,"sink":$s2}""")
    }
  }
}
