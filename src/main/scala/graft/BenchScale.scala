package graft

import graft.hnsw.{HnswConfig, HnswSpark}
import graft.knn.Knn
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Scale smoke: exercises the distributed paths (partitioned exact kNN,
  * HNSW build/save/searchSaved, MinHash dedup) on a generated vector/doc
  * set well beyond the testdata size, verifying the plans stay
  * partition-parallel with bounded memory. Usage:
  *   runMain graft.BenchScale [nVectors] [dim] [nDocs]
  */
object BenchScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val dim = if (args.length > 1) args(1).toInt else 64
    val nDocs = if (args.length > 2) args(2).toInt else 100000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // deterministic synthetic vectors, generated distributed (no driver data)
    val data = spark.range(n).select(col("id"),
        expr(s"transform(sequence(0, ${dim - 1}), j -> cast(sin(id * 0.7 + j * 1.3) + cos(id * 0.13 * j) as float))")
          .as("vector"))
      .repartition(cpus.toInt * 2, col("id"))
    data.cache()
    timed(s"materialize $n x$dim vectors")(data.count())

    val queries = data.filter(col("id") < 64).as[(Long, Array[Float])].collect().sortBy(_._1)

    val exact = timed(s"exact partitioned kNN (${queries.length} queries, k=10)") {
      Knn.partitioned(spark, data, queries, k = 10).count()
    }
    println(s"[scale] exact result rows: $exact")

    // expression-path throughput: exact element-ordered fold vs SIMD
    // dispatch (Panama when available: DistKernel.isSimd below)
    val qLit = array(queries.head._2.map(v => lit(v)): _*).cast("array<float>")
    println(s"[scale] SIMD kernel active: ${graft.core.DistKernel.isSimd}")
    timed(s"full-scan distance, exact expression ($n rows)") {
      data.select(sum(graft.functions.vec.dist(col("vector"), qLit, "euclidean"))).head()
    }
    timed(s"full-scan distance, SIMD expression ($n rows)") {
      data.select(sum(graft.functions.vec.distSimd(col("vector"), qLit, "euclidean"))).head()
    }

    val viaPlan = timed("exact kNN via custom Catalyst operator") {
      graft.plans.KnnCandidates.knn(spark, data, queries, k = 10).count()
    }
    println(s"[scale] custom-plan result rows: $viaPlan")

    val outDir = java.nio.file.Files.createTempDirectory("scale_hnsw").toString
    val sizes = timed(s"HNSW build+save (${cpus.toInt * 2} partitions)") {
      HnswSpark.buildAndSave(spark, data, outDir, config = HnswConfig(m = 16, efConstruction = 100))
    }
    println(s"[scale] partitions built: ${sizes.length}, vectors indexed: ${sizes.map(_._2.toLong).sum}")

    val approx = timed("HNSW searchSaved") {
      HnswSpark.searchSaved(spark, outDir, queries, k = 10).count()
    }
    println(s"[scale] approx result rows: $approx")

    // DataFrame query side over the same persisted graphs: every query
    // visits every partition graph (the partitioned-HNSW fan-out), so
    // cost scales with Q×P searches — the batch-serving shape without a
    // driver query array
    val nHnswQ = math.min(10000, n / 10).toInt
    val hnswQueries = spark.range(nHnswQ).select(col("id").as("qid"),
      expr(s"transform(sequence(0, ${dim - 1}), j -> cast(sin((id + 3) * 0.8 + j * 1.1) + cos(id * 0.17 * j) as float))")
        .as("qvec"))
    val approxDf = timed(s"HNSW searchSavedDF ($nHnswQ-query DataFrame side)") {
      HnswSpark.searchSavedDF(spark, outDir, hnswQueries, k = 10).count()
    }
    println(s"[scale] approx DF result rows: $approxDf (expect ${nHnswQ * 10})")

    // corpus-vs-corpus ANN at scale: a 100k-query DataFrame against the
    // n-vector corpus through IVF×SQ8 — probes nprobe/C of the cells,
    // scans 1 byte/dim inside them, rescores only coarse survivors. No
    // driver-resident query array anywhere; this is the LLM-pipeline
    // shape (dedup-by-ANN) the DataFrame query side exists for.
    {
      val nQueries = math.min(100000, n / 10).toInt
      val c = 256
      val centroids = timed(s"IVF train (kmeans||, c=$c, 2 Lloyd passes, $n vectors)") {
        graft.knn.Ivf.train(spark, data, c, iterations = 2, seeding = "kmeans||")
      }
      // mini-batch train: identical seeding + Lloyd over a deterministic 10%
      // md5 sample — the offline-cost lever (recall floors for sampled train
      // are gated by ClusteredRecallSpec; this row measures the speedup)
      timed(s"IVF train sampled (kmeans||, c=$c, sampleFraction=0.1, $n vectors)") {
        graft.knn.Ivf.train(spark, data, c, iterations = 2, seeding = "kmeans||",
          sampleFraction = 0.1)
      }
      val q8 = graft.knn.Quantize.sq8(graft.knn.Ivf.assign(spark, data, centroids))
        .select("id", "cell", "vector", "codes", "q_scale", "q_offset")
        .repartition(cpus.toInt * 2, col("cell")).cache()
      timed(s"IVF assign + SQ8 encode ($n vectors)")(q8.count())
      val queries = spark.range(nQueries).select(col("id").as("qid"),
        expr(s"transform(sequence(0, ${dim - 1}), j -> cast(sin((id + 17) * 0.9 + j * 1.7) + cos(id * 0.31 * j) as float))")
          .as("qvec"))
      val nnRows = timed(s"IVF×SQ8 searchDF ($nQueries queries x $n vectors, k=10, nprobe=16/$c)") {
        graft.knn.Quantize.searchIvfSq8DF(q8, centroids, queries, k = 10, nprobe = 16).count()
      }
      println(s"[scale] corpus-vs-corpus result rows: $nnRows (expect ${nQueries * 10})")
      q8.unpersist()
    }

    // IVFADC at scale: residual PQ brings the per-vector scan payload to
    // m bytes (dim×4 / m compression — 32× at dim 64, m 8); encode is one
    // narrow codegen pass, the ADC scan touches nprobe/C of the data with
    // per-(query, probed cell) LUTs bounded by the probe fan-out
    {
      val c = 256
      val centroids = graft.knn.Ivf.train(spark, data, c, iterations = 1)
      val assigned = graft.knn.Ivf.assign(spark, data, centroids)
      val cb = timed(s"PQ residual train (m=8, ksub=256, capped sample of $n)") {
        graft.knn.Pq.trainResidual(spark, assigned, centroids, m = 8, ksub = 256, iterations = 2)
      }
      val encoded = graft.knn.Pq.encodeResidual(assigned, centroids, cb)
        .repartition(cpus.toInt * 2, col("cell")).cache()
      timed(s"IVFADC encode ($n vectors -> 8-byte codes)")(encoded.count())
      val adcRows = timed(s"IVFADC search (${queries.length} queries, k=10, nprobe=16/$c)") {
        graft.knn.Pq.searchIvfPqResidual(spark, encoded, centroids, cb, queries,
          k = 10, nprobe = 16, overscan = 12).cache()
      }
      val exactIds = Knn.partitioned(spark, data, queries, k = 10).select("qid", "id")
      val adcHits = adcRows.select("qid", "id").join(exactIds, Seq("qid", "id"), "left_semi").count()
      println(f"[scale] IVFADC recall@10: ${adcHits.toDouble / (queries.length * 10)}%.3f " +
        f"(8 bytes/vector vs ${dim * 4} raw = ${dim * 4 / 8}x compression)")
      encoded.unpersist(); adcRows.unpersist()
    }

    // OPQ at scale: the rotation fit is ONE tree-reduced (mean, covariance)
    // pass + a driver Jacobi (dim², row-count-free); applying it is a
    // narrow codegen pass. Downstream IVFADC runs verbatim in rotated
    // coordinates; recall is gated against the same exact arm and the
    // reconstruction-MSE comparison quantifies what the rotation bought.
    {
      val model = timed(s"OPQ train (stats pass over $n vectors + Jacobi, dim=$dim, m=8)") {
        graft.knn.Opq.train(data, m = 8)
      }
      val rotated = graft.knn.Opq.rotate(data, model)
        .repartition(cpus.toInt * 2, col("id")).cache()
      timed(s"OPQ rotate ($n vectors, codegen projection)")(rotated.count())
      val c = 256
      val centroids = graft.knn.Ivf.train(spark, rotated, c, iterations = 1)
      val assigned = graft.knn.Ivf.assign(spark, rotated, centroids)
      val cb = graft.knn.Pq.trainResidual(spark, assigned, centroids, m = 8, ksub = 256,
        iterations = 2)
      val encoded = graft.knn.Pq.encodeResidual(assigned, centroids, cb)
        .repartition(cpus.toInt * 2, col("cell")).cache()
      timed(s"OPQ×IVFADC encode ($n vectors)")(encoded.count())
      val rq = graft.knn.Opq.rotateQueries(model, queries)
      val opqRows = timed(s"OPQ×IVFADC search (${queries.length} queries, k=10, nprobe=16/$c)") {
        graft.knn.Pq.searchIvfPqResidual(spark, encoded, centroids, cb, rq,
          k = 10, nprobe = 16, overscan = 12).cache()
      }
      val exactIds = Knn.partitioned(spark, data, queries, k = 10).select("qid", "id")
      val opqHits = opqRows.select("qid", "id").join(exactIds, Seq("qid", "id"), "left_semi").count()
      println(f"[scale] OPQ×IVFADC recall@10: ${opqHits.toDouble / (queries.length * 10)}%.3f " +
        "(same 8 bytes/vector as raw IVFADC)")
      val mseRot = graft.knn.Pq.reconstructionMse(encoded, cb, Some(centroids))
      println(f"[scale] OPQ residual reconstruction MSE: $mseRot%.5f")
      encoded.unpersist(); opqRows.unpersist(); rotated.unpersist()
    }

    // streaming IVF×PQ maintenance: per-batch delta bytes at the m-byte
    // tier — the codes-only sink appends ~m bytes/vector where the raw
    // sink appends 4·dim, and a micro-batch against a big maintained
    // history still costs O(batch)
    {
      val nBase = math.max(1000, n / 10)
      val c = 64
      val sub = data.filter(col("id") < nBase)
      val centroids = graft.knn.Ivf.train(spark, sub, c, iterations = 1)
      val cb = graft.knn.Pq.trainResidual(spark,
        graft.knn.Ivf.assign(spark, sub, centroids), centroids, m = 8, ksub = 256)
      def dirBytes(d: String): Long = {
        def walk(f: java.io.File): Long =
          if (f.isFile) f.length()
          else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
        walk(new java.io.File(d))
      }
      def runSink(name: String, pq: Boolean): Unit = {
        val idxDir = java.nio.file.Files.createTempDirectory(s"scale_ivf_$name").toString
        val sink =
          if (pq) graft.streaming.StreamingOps.ivfPqMaintenanceSink(spark, idxDir, centroids, cb)
          else graft.streaming.StreamingOps.ivfMaintenanceSink(spark, idxDir, centroids)
        val baseOps = sub.as[(Long, Array[Float])]
          .map { case (id, v) => graft.streaming.StreamingOps.VectorOp(id, "upsert", v, 1L) }
        timed(s"$name sink: initial $nBase-vector batch")(sink(baseOps, 0L))
        val total = dirBytes(s"$idxDir/delta")
        println(f"[scale] $name delta: ${total / 1e6}%.2f MB (${total.toDouble / nBase}%.1f B/vector)")
        val microOps = data.filter(col("id") < 100).as[(Long, Array[Float])]
          .map { case (id, v) => graft.streaming.StreamingOps.VectorOp(id, "upsert", v, 2L) }
        timed(s"$name sink: 100-op micro-batch against the $nBase-vector history") {
          sink(microOps, 1L)
        }
      }
      runSink("raw-IVF", pq = false)
      runSink("IVF-PQ-codes-only", pq = true)
    }

    // probe-sequence LSH vs hamming-1 at scale: same equi-join shape,
    // 8 margin-ordered probe rows per vector instead of 17 uniform ones.
    // Capped at 200k: the synthetic sin/cos corpus is pathologically
    // self-similar (the 1M run verifies ~100M true sub-threshold pairs,
    // pricing pair VERIFICATION, not probing — measured once: hamming-1
    // 212 s vs probe-seq 85 s at 1M, the 17-vs-8 probe-row ratio)
    {
      val lshN = math.min(n, 200000)
      val lshBase = data.filter(col("id") < lshN)
      val planes = graft.dedup.Dedup.randomPlanes(nbits = 16, dim = dim, seed = 7)
      val lshData = lshBase.unionByName(
        lshBase.filter(col("id") % 1000 === 0).select((col("id") + 100000000L).as("id"), col("vector")))
      val h1 = timed(s"embedding near-dup hamming-1 ($lshN vectors + planted, 17 probes)") {
        graft.dedup.Dedup.embeddingNearDupPairs(lshData, planes, threshold = 0.01,
          multiProbe = true).count()
      }
      val ps = timed(s"embedding near-dup probe-sequence ($lshN vectors + planted, T=8)") {
        graft.dedup.Dedup.embeddingNearDupPairs(lshData, planes, threshold = 0.01,
          probes = 8).count()
      }
      println(s"[scale] near-dup pairs: hamming-1=$h1 probe-seq=$ps (planted copies in both)")
    }

    // SemDeDup at scale: k-means cells bound candidate work at N²/C
    // verifications — C is the lever that keeps intra-cell pair
    // generation tractable (the published SemDeDup deployment shape);
    // spill=2 doubles each vector's bucket exposure for boundary straddle
    {
      val nSem = math.min(n, 100000)
      val semBase = data.filter(col("id") < nSem)
      val semCopies = semBase.filter(col("id") < 1000)
        .select((col("id") + 10000000L).as("id"), col("vector"))
      val semPairs = timed(s"semantic near-dedup ($nSem vectors + 1k planted copies, c=256, spill=2)") {
        graft.dedup.Dedup.semanticNearDupPairs(
          semBase.unionByName(semCopies), c = 256, threshold = 1e-4, spill = 2).cache()
      }
      val found = semPairs.count()
      val planted = semPairs.filter(col("id_b") >= 10000000L && col("id_a") === col("id_b") - 10000000L).count()
      println(s"[scale] semantic pairs: $found; planted copies recovered: $planted/1000")
      semPairs.unpersist()
    }

    // clustered-corpus recall at scale: the geometry IVF exists for —
    // planted clusters, small probe fraction, recall vs exact kNN
    {
      val nc = 256
      val nClustered = math.min(n, 1000000)
      val cdim = 32
      val cdata = spark.range(nClustered).select(col("id"),
          expr(s"""transform(sequence(0, ${cdim - 1}), j -> cast(
            sin((id % $nc) * 2654435.761 + j * 1.9) +
            0.05 * sin(id * 0.7919 + j * 12.9898) as float))""").as("vector"))
        .repartition(cpus.toInt * 2, col("id")).cache()
      timed(s"materialize $nClustered x$cdim clustered vectors ($nc planted clusters)")(cdata.count())
      val centroids = timed(s"IVF train on clustered corpus (kmeans||, c=$nc)") {
        graft.knn.Ivf.train(spark, cdata, nc, iterations = 2, seeding = "kmeans||")
      }
      val assigned = graft.knn.Ivf.assign(spark, cdata, centroids, spill = 2).cache()
      timed("IVF assign (spill=2)")(assigned.count())
      val cq = cdata.filter(col("id") % (nClustered / 64) === 1)
        .as[(Long, Array[Float])].collect().sortBy(_._1)
      val approx = timed(s"IVF search (${cq.length} queries, k=10, nprobe=8/$nc = 3% probe)") {
        graft.knn.Ivf.search(spark, assigned, centroids, cq, k = 10, nprobe = 8, dedup = true)
          .select("qid", "id").cache()
      }
      val exactC = Knn.partitioned(spark, cdata, cq, k = 10).select("qid", "id")
      val hits = approx.join(exactC, Seq("qid", "id"), "left_semi").count()
      println(f"[scale] clustered-corpus IVF recall@10: ${hits.toDouble / (cq.length * 10)}%.3f (${cq.length} queries)")
      assigned.unpersist(); cdata.unpersist(); approx.unpersist()
    }

    // 1M-query DataFrame side through the blocked partitionedDF path:
    // per-task memory is one query block of heaps, not 1M heaps — the
    // multi-block branch materializes the data partition and re-scans it
    {
      // the assertion is QUERY-side memory (1M heaps would be ~200 MB/task
      // unchunked; blocks cap it at ~13 MB) — the data side stays small so
      // the section measures the shape, not a 1e12-flop scan; unbounded
      // data × unbounded queries is the IVF cogroup path's job
      val nQ = 1000000
      val smallN = math.min(n, 20000)
      val sdata = spark.range(smallN).select(col("id"),
          expr(s"transform(sequence(0, 15), j -> cast(sin(id * 0.7 + j * 1.3) as float))").as("vector"))
        .repartition(cpus.toInt * 2, col("id")).cache()
      sdata.count()
      val bigQ = spark.range(nQ).select(col("id").as("qid"),
        expr(s"transform(sequence(0, 15), j -> cast(cos((id + 5) * 0.9 + j * 1.7) as float))").as("qvec"))
      val rows1m = timed(s"exact partitionedDF ($nQ-query DataFrame x $smallN vectors, k=5, 64k blocks)") {
        Knn.partitionedDF(sdata, bigQ, k = 5).count()
      }
      println(s"[scale] 1M-query result rows: $rows1m (expect ${nQ * 5L})")
      sdata.unpersist()
    }

    // streaming-maintenance write amplification: the HNSW delta-log sink's
    // per-batch cost must be the BATCH, not the index — a micro-batch
    // against a compacted base appends O(batch) parquet bytes and touches
    // no graph artifact; compaction is the one explicit O(index) operation
    {
      val nBase = math.max(1000, n / 10)
      val idxDir = java.nio.file.Files.createTempDirectory("scale_hnsw_delta").toString
      val sink = graft.streaming.StreamingOps.hnswDeltaMaintenanceSink(
        spark, idxDir, cpus.toInt * 2, config = HnswConfig(m = 16, efConstruction = 100))
      val baseOps = data.filter(col("id") < nBase).as[(Long, Array[Float])]
        .map { case (id, v) => graft.streaming.StreamingOps.VectorOp(id, "upsert", v, 1L) }
      timed(s"HNSW delta sink: initial $nBase-vector batch (parquet append only)") {
        sink(baseOps, 0L)
      }
      timed(s"compactHnswMaintained (fold $nBase vectors into base graphs)") {
        graft.streaming.StreamingOps.compactHnswMaintained(spark, idxDir)
      }
      def dirBytes(d: String): Long = {
        def walk(f: java.io.File): Long =
          if (f.isFile) f.length()
          else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
        walk(new java.io.File(d))
      }
      val baseBytes = dirBytes(s"$idxDir/base")
      val deltaBefore = dirBytes(s"$idxDir/delta")
      val microOps = data.filter(col("id") < 100).as[(Long, Array[Float])]
        .map { case (id, v) => graft.streaming.StreamingOps.VectorOp(id, "upsert", v, 2L) }
      timed("HNSW delta sink: 100-op micro-batch against the compacted index") {
        sink(microOps, 1L)
      }
      val growth = dirBytes(s"$idxDir/delta") - deltaBefore
      println(f"[scale] base graphs: ${baseBytes / 1e6}%.1f MB; 100-op batch delta growth: " +
        f"${growth / 1e3}%.1f KB (${growth.toDouble / math.max(baseBytes, 1) * 100}%.3f%% of base, untouched)")
      val sRows = timed("searchHnswMaintained (64 queries over base+delta)") {
        graft.streaming.StreamingOps.searchHnswMaintained(spark, idxDir, queries, k = 10).count()
      }
      println(s"[scale] maintained search rows: $sRows")
    }

    // synthetic docs with planted dups for the dedup path
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
        expr("concat_ws(' ', transform(sequence(0, 40), j -> concat('w', cast(pmod(id * 2654435761 + j * 40503 + cast(pow(j, 3) as bigint), 999983) as string))))")
          .as("text"))
    val withCopies = docs.unionByName(
      docs.filter(col("doc_id") % 100 === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"), concat(lit("dup "), col("text")).as("text")))
    val pairsDf = graft.dedup.Dedup.minhashLshPairs(withCopies, threshold = 0.8).cache()
    val pairs = timed(s"MinHash LSH dedup ($nDocs docs + planted)") {
      pairsDf.count()
    }
    println(s"[scale] near-dup pairs: $pairs")
    val groups = timed("connected components over the pair set (pairs -> clusters)") {
      graft.dedup.Dedup.connectedComponents(pairsDf)
        .filter(col("id") =!= col("group_id")).count()
    }
    println(s"[scale] non-representative members dropped: $groups")

    // streaming near-dup at corpus scale: the same corpus replayed through
    // the ingestion-time form; the distinct pair count must equal batch.
    // Bounded to 200k docs: per-band bucket state stores each member's
    // shingle set once PER BAND (bands× the corpus shingle footprint —
    // ~6 GB of state at 1M docs, an OOM in this heap). The r9 fix is a
    // two-stage state layout (doc→set once, band buckets hold ids only).
    {
      val sCap = 200000
      val sDocs =
        if (nDocs <= sCap) withCopies
        else withCopies.filter(col("doc_id") % (nDocs / sCap) === 0)
      val sPairs =
        if (nDocs <= sCap) pairs
        else graft.dedup.Dedup.minhashLshPairs(sDocs, threshold = 0.8).count()
      val sdir = java.nio.file.Files.createTempDirectory("neardup_stream_scale").toString
      sDocs.write.parquet(s"$sdir/in")
      val src = spark.readStream
        .schema(spark.read.parquet(s"$sdir/in").schema).parquet(s"$sdir/in")
      val q = graft.streaming.StreamingOps.nearDupStream(src, threshold = 0.8)
        .writeStream.format("memory").queryName("neardup_scale")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      timed(s"streaming near-dup replay (${math.min(nDocs, sCap)} docs + planted)")(
        q.awaitTermination())
      val streamed = spark.sql(
        "SELECT count(*) FROM (SELECT DISTINCT doc_a, doc_b FROM neardup_scale)")
        .head().getLong(0)
      println(s"[scale] streaming near-dup pairs: $streamed (batch found $sPairs)")
      require(streamed == sPairs,
        s"streaming near-dup diverged from batch: $streamed vs $sPairs")
    }
    // the DISK-STATE near-dup sink has no bands×footprint memory bound —
    // run it over the FULL corpus the state-store form must cap, split
    // across two batches so the accumulated tables carry state
    {
      val sdir = java.nio.file.Files.createTempDirectory("neardup_sink_scale").toString
      val sink = graft.streaming.StreamingOps.nearDupSink(spark, sdir, threshold = 0.8)
      timed(s"disk-state near-dup sink: batch 1 (~${nDocs / 2} docs)") {
        sink(withCopies.filter(col("doc_id") % 2 === 0), 0L)
      }
      timed(s"disk-state near-dup sink: batch 2 (~${nDocs / 2} docs)") {
        sink(withCopies.filter(col("doc_id") % 2 =!= 0), 1L)
      }
      val sinkPairs = graft.streaming.StreamingOps.nearDupSinkPairs(spark, sdir).count()
      println(s"[scale] disk-state sink pairs: $sinkPairs (batch found $pairs)")
      require(sinkPairs == pairs,
        s"disk-state near-dup sink diverged from batch: $sinkPairs vs $pairs")
    }
    pairsDf.unpersist()

    // decontamination at corpus scale: the benchmark side is suite-sized,
    // the corpus streams once — bloom gate vs exact broadcast join, same
    // output by construction (the exact join removes bloom false positives)
    {
      val bench = docs.filter(col("doc_id") % 200 === 0)
        .select(col("doc_id").as("bench_id"), col("text"))
      val quotes = bench.filter(col("bench_id") < 2000)
        .select((col("bench_id") + 20000000L).as("doc_id"),
          concat(lit("quoted: "), col("text")).as("text"))
      val corpus = docs.unionByName(quotes)
      val exactN = timed(s"decontaminate exact ($nDocs docs x ${nDocs / 200}-doc benchmark, 13-gram)") {
        graft.dedup.Dedup.contaminationPairs(corpus, bench, minShared = 1, n = 13).count()
      }
      val bloomN = timed("decontaminate bloom-gated (same inputs)") {
        graft.dedup.Dedup.contaminationPairsBloom(corpus, bench, minShared = 1, n = 13).count()
      }
      println(s"[scale] contamination pairs: exact=$exactN bloom=$bloomN (must be equal)")

      // the audit RATE at scale: per-eval-doc fraction of 13-grams seen
      // in training — corpus streams once through the broadcast
      // bench-shingle gate, the matched-hash set is bounded by the suite.
      // Planted suite: half verbatim corpus slices (rate exactly 1),
      // half novel items (rate exactly 0) — any other value fails loudly.
      val rateBench = docs.filter(col("doc_id") % 200 === 0)
        .select(col("doc_id").as("bench_id"),
          when(col("doc_id") % 400 === 0,
            concat_ws(" ", slice(split(col("text"), " "), 3, 30)))
            .otherwise(expr("concat_ws(' ', transform(sequence(0, 19), " +
              "j -> concat('nv', cast(doc_id as string), 'x', cast(j as string))))"))
            .as("text"))
      val rates = timed(s"contamination rate ($nDocs docs x ${nDocs / 200}-item suite, 13-gram)") {
        graft.dedup.Dedup.contaminationRate(docs, rateBench, n = 13)
          .select(col("bench_id"), col("rate")).as[(Long, Double)].collect()
      }
      val ones = rates.count { case (id, r) => id % 400 == 0 && r == 1.0 }
      val zeros = rates.count { case (id, r) => id % 400 != 0 && r == 0.0 }
      require(ones + zeros == rates.length,
        s"contamination rates off: $ones exact-1 + $zeros exact-0 of ${rates.length}")
      println(s"[scale] contamination rate: ${rates.length} eval items, " +
        s"$ones fully-contained (rate 1), $zeros novel (rate 0)")
    }

    // cross-document maximal spans at corpus scale: the anchor join's
    // output folds to per-diagonal ISLANDS through a spillable window
    // before anything collects, so the planted near-identical 20k-token
    // pair (one mutated token) contributes 2 islands to its collected
    // row, not ~5k raw anchors; each planted twin reports exactly one
    // full-text span against its source
    {
      // cap at the synthetic generator's vocab period: doc text repeats
      // exactly every 999983 ids, so beyond it byte-identical duplicate
      // docs appear and the closed-form span count below stops holding
      // (17 wrap pairs + 1 twin interplay at nDocs=1M — fixture artifact,
      // not operator behavior)
      val nSpanDocs = math.min(nDocs, 999983)
      val spanDocs = docs.filter(col("doc_id") < nSpanDocs)
      val nTwins = (nSpanDocs + 199) / 200
      val twins = spanDocs.filter(col("doc_id") % 200 === 0)
        .select((col("doc_id") + 30000000L).as("doc_id"),
          concat(lit("tw0 tw1 tw2 "), col("text"), lit(" tw3")).as("text"))
      val big = spark.range(2).select((col("id") + 40000000L).as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(19999)),
          j => when(col("id") === 1 && j === lit(10000), lit("MUT"))
            .otherwise(concat(lit("g"), j.cast("string"))))).as("text"))
      val corpus = spanDocs.unionByName(twins).unionByName(big)
      val spans = graft.dedup.Dedup.crossDocMaximalSpans(corpus, n = 13,
        stride = 4, maxExtend = 200).cache()
      val total = timed(s"cross-doc maximal spans ($nSpanDocs docs + $nTwins twins + near-identical 20k-token pair, n=13, stride=4)") {
        spans.count()
      }
      val bigSpans = spans.filter(col("doc_a") === 40000000L && col("doc_b") === 40000001L)
        .select("a_start", "a_end").as[(Long, Long)].collect().toSet
      require(bigSpans == Set((0L, 10000L), (10001L, 20000L)),
        s"near-identical pair spans wrong: $bigSpans")
      require(total == nTwins + 2,
        s"expected ${nTwins + 2} spans (twins + 2 from the mutated pair), got $total")
      println(s"[scale] cross-doc spans: $total (exact bounds on the 20k-token pair)")
      spans.unpersist()
    }

    // LM quality scoring at corpus scale: one token-count shuffle
    // (vocab-sized result), one broadcast-join scoring pass
    {
      val scored = timed(s"unigram LM cross-entropy ($nDocs docs)") {
        graft.text.TextAnalysis.lmCrossEntropy(docs).count()
      }
      println(s"[scale] docs scored: $scored")
    }

    // Kneser-Ney training + scoring at corpus scale: this corpus draws
    // tokens near-uniformly from a ~1M vocab, so almost every bigram is
    // a singleton TYPE — the worst case, where the type table approaches
    // one row per corpus position. Train = one position pass + type-
    // bounded re-aggregations; the per-context mass invariant is then
    // checked DISTRIBUTED on sampled contexts, and the whole corpus is
    // scored back through the model's three hash joins.
    {
      val model = timed(s"Kneser-Ney bigram train ($nDocs docs, near-all-singleton types)") {
        graft.text.ArpaLm.trainKneserNeyBigram(docs)
      }
      println(s"[scale] KN model rows: ${model.count()}")
      val uni = model.filter(col("order") === 1 && col("word") =!= "<s>")
        .select(col("word"), pow(lit(10.0), col("log10p")).as("p1"))
      val bows = model.filter(col("order") === 1)
        .select(col("word").as("context"), pow(lit(10.0), col("backoff")).as("bow"))
      val sampled = model.filter(col("order") === 2).select("context").distinct().limit(64)
      val mass = model.filter(col("order") === 2)
        .join(broadcast(sampled), Seq("context"))
        .join(uni, Seq("word"))
        .groupBy("context")
        .agg(sum(pow(lit(10.0), col("log10p"))).as("seen"), sum(col("p1")).as("seenU"))
        .join(bows, Seq("context"))
        .select((col("seen") + col("bow") * (lit(1.0) - col("seenU"))).as("mass"))
        .collect()
      require(mass.nonEmpty && mass.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-6),
        s"KN mass invariant violated: ${mass.map(_.getDouble(0)).mkString(",")}")
      println(s"[scale] KN per-context mass: ${mass.length} sampled contexts within 1e-6 of 1")
      val knScored = timed(s"KN scoring ($nDocs docs through the model joins)") {
        graft.text.ArpaLm.score(docs, model, order = 2).count()
      }
      println(s"[scale] KN-scored docs: $knScored")
    }

    // provably-exact heavy hitters at corpus scale: this corpus's 3-gram
    // space is ~nDocs·40 distinct grams (each doc's tokens are
    // pseudo-random draws from a ~1M vocab — the near-worst case where a
    // full groupBy-count shuffle moves ~1 row per corpus position); the
    // MG sketch bounds executor memory at m counters, the driver sees one
    // m-entry summary, and the recount shuffle carries only
    // candidate-matching rows. A planted phrase on every 10th doc gives 3
    // provable heavy grams; the near-uniform tail keeps err > 0, so the
    // runtime proof is doing real work.
    {
      val hhDocs = docs.select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" the quick brown fox jumps")))
          .otherwise(col("text")).as("text"))
      val top = timed(s"heavy hitters: proven-exact top-3 3-grams ($nDocs docs, m=65536)") {
        graft.text.HeavyHitters.ngramTopK(hhDocs, n = 3, k = 3, m = 65536).collect()
      }
      val grams = top.map(_.getString(0)).toSet
      require(grams == Set("the quick brown", "quick brown fox", "brown fox jumps"),
        s"heavy hitters missed the planted phrase: $grams")
      require(top.forall(_.getLong(1) == (nDocs + 9) / 10),
        s"planted counts off: ${top.map(_.getLong(1)).mkString(",")}")
      println(s"[scale] heavy hitters: planted top-3 proven exact at ${(nDocs + 9) / 10} each")
    }

    // NON-SPLITTING FFD packing at corpus scale: ONE (source, shard)
    // shuffle, per-shard in-task sort + first-fit, bin state O(shard
    // tokens / blockLen). Validity proven in-flow: exactly one bin per
    // doc, no overfull bin (this corpus has no oversized docs at 2048),
    // and the mean fill ratio shows the padding the layout pays for
    // kill-the-splits.
    {
      val packDocs = docs.withColumn("source",
        concat(lit("src"), pmod(col("doc_id"), lit(8L)).cast("string")))
      val packed = graft.ops.Packing.packBestFit(packDocs, blockLen = 2048, nShards = 64)
      val nAssigned = timed(s"packBestFit ($nDocs docs, 2048-token bins, 8 sources x 64 shards)") {
        packed.cache().count()
      }
      require(nAssigned == nDocs.toLong, s"FFD split or dropped docs: $nAssigned != $nDocs")
      val summary = graft.ops.Packing.packBestFitSummary(packed, 2048).cache()
      val overfull = summary.filter(col("n_tokens") > 2048).count()
      require(overfull == 0, s"$overfull overfull bins with no oversized docs")
      val fill = summary.agg(avg("fill_ratio")).head().getDouble(0)
      val bins = summary.count()
      println(f"[scale] FFD packing: $bins bins, mean fill $fill%.3f, 0 split docs")
      packed.unpersist(); summary.unpersist()
    }

    // Rank-profile language ID at corpus scale: profiles train on a
    // bounded labeled slice (broadcast), classification is one explode +
    // per-doc count/rank window + broadcast profile join — linear in the
    // corpus, the corpus never self-joins.
    {
      val labeled = docs.filter(col("doc_id") < 1000)
        .withColumn("lang", concat(lit("l"), pmod(col("doc_id"), lit(5L)).cast("string")))
      val prof = graft.text.LangIdNgram.profiles(labeled, profileSize = 100)
      // the published operating point: classification on a ~300-char
      // normalized sample (Cavnar–Trenkle classify 300-byte excerpts) —
      // the per-doc gram fan-out is bounded by the sample, not the doc
      val classified = timed(s"lang_id_ngram classify ($nDocs docs, 5 profiles, 300-char samples)") {
        graft.text.LangIdNgram.classify(docs, prof, profileSize = 100, maxChars = 300).count()
      }
      println(s"[scale] lang-id classified: $classified docs")
    }

    // Aho–Corasick blocklist: WARM scan time must stay FLAT as the list
    // grows 1k → 10k → 100k entries (the automaton is interned once per
    // JVM — its build is timed separately below — and the per-doc scan
    // is O(text) with O(1) per char) — the property the regex
    // alternation form loses at production list sizes. The hitting
    // entries (w0..w999, overlapping the doc vocab) are IDENTICAL at
    // every size so hit-handling work is constant; growth entries are
    // zz-prefixed non-hitters.
    {
      import graft.text.TextAnalysis
      Seq(1000, 10000, 100000).foreach { listSize =>
        val words = (0 until 1000).map(i => s"w$i") ++
          (1000 until listSize).map(i => s"zzpad$i")
        val col0 = TextAnalysis.blocklistHitsAho(col("text"), words).as("h")
        timed(s"blocklist AC build+first scan ($nDocs docs, $listSize entries)") {
          docs.select(col0).agg(sum("h")).head().getLong(0)
        }
        val hits = timed(s"blocklist AC warm scan ($nDocs docs, $listSize entries)") {
          docs.select(col0).agg(sum("h")).head().getLong(0)
        }
        println(s"[scale] blocklist hits at $listSize entries: $hits")
      }
    }

    // WARC ingest at corpus scale: write the doc corpus as archives (one
    // part per partition; plain + gzip member-per-record), then read back
    // through record-boundary splits with the type filter pushed — the
    // raw-crawl ingest shape. Bytes/sec is the number that matters at
    // 100 TB: both paths must stream (no payload materialization on the
    // headers-only pass).
    {
      val out = java.nio.file.Files.createTempDirectory("scale_warc").toString
      val frame = docs.select(
        concat(lit("http://x/p/"), col("doc_id")).as("target_uri"),
        expr("encode(text, 'UTF-8')").as("payload"))
      timed(s"warc write ($nDocs docs, plain, ${cpus} parts)") {
        frame.write.format("warc").mode("overwrite").save(out)
      }
      val plainBytes = graft.io.HadoopIO.globWithLength(out, "*.warc",
        spark.sparkContext.hadoopConfiguration).map(_._2).sum
      val n1 = timed(s"warc read-back (record-boundary splits, 4 MB)") {
        spark.read.format("warc").option("maxPartitionBytes", (4L << 20).toString)
          .load(out).filter(col("record_type") === "conversion")
          .agg(sum("content_length")).head().getLong(0)
      }
      println(f"[scale] warc plain: ${plainBytes / 1e6}%.1f MB on disk, payload bytes $n1")
      val hdrs = timed("warc headers-only scan (payload skipped, not read)") {
        spark.read.format("warc").option("maxPartitionBytes", (4L << 20).toString)
          .load(out).agg(count(lit(1))).head().getLong(0)
      }
      require(hdrs == nDocs.toLong, s"warc read-back lost records: $hdrs != $nDocs")
      val gzOut = java.nio.file.Files.createTempDirectory("scale_warc_gz").toString
      timed(s"warc write ($nDocs docs, gzip member-per-record)") {
        frame.write.format("warc").option("gzip", true).mode("overwrite").save(gzOut)
      }
      val n2 = timed("warc.gz read-back (member-verified inflate)") {
        spark.read.format("warc").load(gzOut).agg(count(lit(1))).head().getLong(0)
      }
      require(n2 == nDocs.toLong, s"warc.gz read-back lost records: $n2 != $nDocs")

      // CDX-style SELECTIVE FETCH: bytes touched proportional to the
      // SELECTION, not the corpus. Offsets come from a headers-only scan
      // (the in-query stand-in for a CDX sidecar — payload bytes are
      // skipped, not read); the timed section is the pure ranged-read
      // cost of fetching 1-in-1000 records, to compare against the full
      // payload scan above.
      {
        import spark.implicits._
        val offs = spark.read.format("warc")
          .option("maxPartitionBytes", (4L << 20).toString).load(out)
          .select(col("path"), col("offset"),
            regexp_extract(col("target_uri"), "p/([0-9]+)$", 1).cast("long").as("id"))
          .filter(col("id") % 1000 === 0)
          .select("path", "offset")
          .as[(String, Long)].collect()
        val nSel = offs.length.toLong
        val nFetch = timed(s"warc selective fetch ($nSel of $nDocs records via offsets)") {
          graft.sources.WarcFetch.fetch(offs.toSeq.toDF("path", "offset"))
            .agg(count(lit(1))).head().getLong(0)
        }
        require(nFetch == nSel, s"selective fetch lost records: $nFetch != $nSel")
      }
    }

    // Unbounded exact-dedup digest sink at corpus scale: three batches
    // with planted cross-batch duplicates (beyond any watermark), the
    // smaller id arriving LAST; converged groups must match the batch
    // operator's counts exactly. Per-batch cost is one partial-agg pass
    // + an O(batch) append — the number to watch is per-batch seconds
    // staying flat as accumulated state grows.
    {
      val idx = java.nio.file.Files.createTempDirectory("scale_dedup_sink").toString
      val sink = graft.streaming.StreamingOps.dedupExactSink(spark, idx)
      val copies = docs.filter(col("doc_id") % 100 === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
      timed(s"dedupExactSink batch 0 (${nDocs / 100} copies first)") {
        sink(copies.toDF(), 0L)
      }
      timed(s"dedupExactSink batch 1 (${nDocs / 2} docs)") {
        sink(docs.filter(col("doc_id") % 2 === 0).toDF(), 1L)
      }
      timed(s"dedupExactSink batch 2 (${nDocs / 2} docs, smaller dup ids last)") {
        sink(docs.filter(col("doc_id") % 2 === 1).toDF(), 2L)
      }
      val groups = timed("dedupExactMaintained fold") {
        graft.streaming.StreamingOps.dedupExactMaintained(spark, idx)
          .filter(col("n_dups") > 1).count()
      }
      val want = graft.dedup.Dedup.exactGroups(docs.unionByName(copies))
        .filter(col("n_dups") > 1).count()
      require(groups == want, s"digest sink diverged from batch: $groups != $want")
      println(s"[scale] dedup digest sink: $groups duplicate groups (== batch operator)")
    }

    // 1-bit binary tier at corpus scale: one tree-aggregated threshold
    // pass, one fused pack + pop-count Hamming heap scan (8 bytes per 64
    // dims touched), candidate-only exact rescore; recall vs the exact
    // partitioned result above
    {
      val thr = timed(s"binary thresholds ($n x$dim, tree-aggregated mean)") {
        graft.knn.Quantize.binaryThresholds(data)
      }
      val bres = timed(s"binary-sketch kNN (${queries.length} queries, k=10, overscan=16)") {
        graft.knn.Quantize.searchBinary(spark, data, thr, queries, k = 10, overscan = 16)
          .select("qid", "id").as[(Long, Long)].collect()
      }
      val exactSet = Knn.partitioned(spark, data, queries, k = 10)
        .select("qid", "id").as[(Long, Long)].collect().toSet
      val recall = bres.count(exactSet.contains).toDouble / exactSet.size
      println(f"[scale] binary-sketch recall@10: $recall%.3f (${bres.length} rows)")
    }

    // BM25 at corpus scale: one corpus scan (postings filtered inside it),
    // window df over query-term postings only, broadcast query table
    {
      val sample = docs.orderBy("doc_id").limit(2).collect().map(_.getString(1))
      val bmQ = Seq((0L, sample(0).split(" ").take(3).mkString(" ")),
        (1L, sample(1).split(" ").slice(3, 6).mkString(" ")))
      val res = timed(s"BM25 top-10 ($nDocs docs, ${bmQ.length} queries)") {
        graft.text.Bm25.search(docs, bmQ, k = 10).count()
      }
      println(s"[scale] bm25 result rows: $res")

      // streaming-maintained lexical index at corpus scale: two O(batch)
      // delta appends, then the maintained serve must EQUAL the batch
      // search over the same corpus row-for-row
      val mdir = java.nio.file.Files.createTempDirectory("bm25_maint_scale").toString
      val sink = graft.streaming.StreamingOps.bm25MaintenanceSink(spark, mdir, nBuckets = 64)
      import spark.implicits._
      def ops(pred: org.apache.spark.sql.Column) = docs.filter(pred)
        .select(col("doc_id").as("id"), lit("upsert").as("op"), col("text"), lit(1L).as("version"))
        .as[graft.streaming.StreamingOps.DocOp]
      timed(s"bm25 maintenance sink: batch 1 (~${nDocs / 2} docs)") {
        sink(ops(col("doc_id") % 2 === 0), 0L)
      }
      timed(s"bm25 maintenance sink: batch 2 (~${nDocs / 2} docs)") {
        sink(ops(col("doc_id") % 2 =!= 0), 1L)
      }
      val maintained = timed("bm25 maintained serve (2 queries)") {
        graft.streaming.StreamingOps.searchBm25Maintained(spark, mdir, bmQ, 10)
          .orderBy("qid", "rank").collect().toSeq
      }
      val batchRes = graft.text.Bm25.search(docs, bmQ, k = 10)
        .orderBy("qid", "rank").collect().toSeq
      require(maintained == batchRes,
        s"maintained BM25 diverged from batch: ${maintained.size} vs ${batchRes.size} rows")
      println(s"[scale] bm25 maintained == batch: ${maintained.size} rows")
    }

    // Temporal joins at event-log scale: the as-of window formulation
    // (one key Exchange + sort) must hold at millions of rows, and its
    // answer must equal an independent argmax-join formulation; the
    // bucketed interval join must place every event in exactly the one
    // session that contains it (sessions partition each key's timeline).
    {
      val nKeys = 10000
      val ev = spark.range(n).select(col("id"),
          (col("id") % nKeys).as("k"),
          (pmod(xxhash64(col("id")), lit(2000000000L)) + 1L).as("ts"))
        .cache()
      ev.count()
      // side split must be independent of the key (id % 10 would make
      // each mod-10000 key entirely one side)
      val side = pmod(xxhash64(col("id") + 7), lit(10))
      val right = ev.filter(side === 0)
        .select(col("k"), col("ts"), col("id").as("rid"), (col("ts") % 97).as("v"))
      val left = ev.filter(side =!= 0).select(col("id"), col("k"), col("ts"))
      val nLeft = left.count()
      val joined = timed(s"as-of join ($n events, $nKeys keys)") {
        // toRdd.count(): a bare count would let Catalyst prune the window
        graft.ops.Temporal.asofJoin(left, right, "k", "ts", "rid", Seq("rid", "v"))
          .queryExecution.toRdd.count()
      }
      require(joined == nLeft, s"as-of join must be left-total: $joined vs $nLeft")
      // independent formulation on one key: argmax by (ts, rid) via
      // max(struct) over an inequality join — small enough to be exact.
      // Spot key = deterministically the right side's busiest key, so the
      // check can't go vacuous when small arg runs leave sparse keys
      // without right-side rows.
      val spotKey = right.groupBy("k").count()
        .orderBy(col("count").desc, col("k")).limit(1)
        .select("k").as[Long].collect().head
      val k0L = left.filter(col("k") === spotKey)
      val k0R = right.filter(col("k") === spotKey)
      val viaWindow = graft.ops.Temporal.asofJoin(k0L, k0R, "k", "ts", "rid", Seq("rid"))
        .select(col("id"), col("asof_rid")).as[(Long, Option[Long])].collect().toMap
      val brute = k0L.as("l")
        .join(k0R.as("r"), col("l.k") === col("r.k") && col("r.ts") <= col("l.ts"), "left")
        .groupBy(col("l.id")).agg(max(struct(col("r.ts"), col("r.rid"))).as("m"))
        .select(col("id"), col("m.rid")).as[(Long, Option[Long])].collect().toMap
      require(viaWindow == brute,
        s"as-of window formulation diverged from argmax join on key $spotKey (${k0L.count()} rows)")
      require(viaWindow.nonEmpty && viaWindow.values.exists(_.isDefined),
        s"as-of spot check is vacuous: no key-$spotKey left rows or no matches")
      println(s"[scale] as-of spot check: ${viaWindow.size} rows on key $spotKey " +
        s"(${viaWindow.values.count(_.isDefined)} matched), formulations equal")

      val sessions = graft.ops.Temporal.sessionize(ev, "k", "ts", "id", gap = 50000000L)
      val nSess = sessions.count()
      val contained = timed(s"interval join ($n events into $nSess sessions)") {
        graft.ops.Temporal.intervalJoin(ev, sessions, "k", "ts", "start_ts", "end_ts",
          bucket = 10000000L, payload = Seq("session"),
          maxBucketsPerInterval = 1 << 20).count()
      }
      require(contained == n.toLong,
        s"each event must land in exactly its own session: $contained vs $n")
      println(s"[scale] interval join: every event in exactly one session")
      ev.unpersist()
    }

    // Perceptual IMAGE near-dedup at corpus scale: nDocs real 16x12 PNG
    // payloads encode distributed (ImageIO in executor tasks), 1% planted
    // brightness-shifted copies; ONE decode scan materializes (id, hash,
    // thumb), the banded join + exact verify recovers EXACTLY the planted
    // pairs (random gradient fields collide within hamming 3 at ~2e-15).
    {
      val nImg = nDocs
      // copy-id offset clear of ANY nImg (50M was a silent collision
      // waiting for a >50M-doc arg run)
      val copyOff = math.max(50000000L, 2L * nImg)
      val images = spark.range(nImg).select(col("id")).as[Long]
        .mapPartitions { ids =>
          ids.flatMap { id =>
            val rgb = Array.tabulate(16 * 12 * 3) { i =>
              var x = id * 0x9e3779b97f4a7c15L + i * 0xbf58476d1ce4e5b9L
              x ^= x >>> 31; x *= 0x94d049bb133111ebL; x ^= x >>> 29
              (48 + ((x & 0x7fL).toInt % 128)).toByte // [48, 175]
            }
            val png = graft.multimodal.Multimodal.encodePng(rgb, 16, 12)
            if (id % 100 == 0) {
              val shifted = rgb.map(b => ((b & 0xff) + 20).toByte)
              Seq((id, png),
                (id + copyOff, graft.multimodal.Multimodal.encodePng(shifted, 16, 12)))
            } else Seq((id, png))
          }
        }.toDF("id", "payload")
      val planted = (nImg + 99) / 100
      val imgPairs = graft.dedup.ImageDedup.imageNearDupPairs(spark, images,
          maxDist = 3, bands = 4, pixTol = 0)
        .cache()
      val nP = timed(s"image dHash near-dedup ($nImg PNGs + $planted planted copies)") {
        imgPairs.count()
      }
      val recovered = imgPairs
        .filter(col("id_b") === col("id_a") + copyOff && col("hamming") === 0).count()
      require(recovered == planted.toLong,
        s"planted brightness copies not all recovered: $recovered/$planted")
      println(s"[scale] image near-dup pairs: $nP ($recovered planted recovered, hamming 0)")
      imgPairs.unpersist()
    }

    // STREAMING cluster resolution at corpus scale: the dedup section's
    // verified pair set replays through the union-find-forest sink in 4
    // hash-split batches (cross-batch merges are the norm under the
    // split); the read-side resolution must produce exactly the batch
    // operator's member count.
    {
      val sinkDir = java.nio.file.Files.createTempDirectory("scale_dgroups").toString
      val sink = graft.streaming.StreamingOps.dedupGroupsSink(spark, sinkDir)
      val sp = pairsDf.persist() // re-materialize: released after the batch section
      sp.count()
      val h = pmod(xxhash64(col("doc_a"), col("doc_b")), lit(4))
      timed(s"dedup-groups sink: 4-batch replay of the LSH pair set") {
        (0 until 4).foreach(b => sink(sp.filter(h === b).toDF(), b.toLong))
      }
      val streamedMembers = timed("dedup-groups sink: read-side resolution") {
        graft.streaming.StreamingOps.dedupGroupsSinkGroups(spark, sinkDir).count()
      }
      val batchMembers = graft.dedup.Dedup.connectedComponents(sp).count()
      sp.unpersist()
      require(streamedMembers == batchMembers,
        s"incremental components diverge from batch: $streamedMembers vs $batchMembers")
      println(s"[scale] dedup-groups sink: $streamedMembers members, equal to batch CC")
    }

    // Unigram-LM training at corpus scale: the corpus streams once into
    // the capped word table, the E-step lattice shuffle is bounded by
    // words x maxPieceLen, and the prune loop is vocab-local; Viterbi
    // counting then broadcasts the trained pieces over the full corpus.
    {
      val vocab = timed(s"unigram-LM train ($nDocs docs, seed 50k -> vocab 40k, 2 EM passes)") {
        graft.text.UnigramLm.train(docs, vocabSize = 40000, maxPieceLen = 8,
          seedSize = 50000, emIters = 1, pruneRate = 0.25)
      }
      require(vocab.nonEmpty && vocab.forall(_._2 <= 0.0), "degenerate unigram vocab")
      val counted = timed(s"unigram Viterbi token counts ($nDocs docs, ${vocab.size} pieces)") {
        graft.text.UnigramLm.countTokens(docs, vocab)
          .agg(coalesce(sum("n_tokens"), lit(0L))).head().getLong(0)
      }
      println(s"[scale] unigram: ${vocab.size} pieces trained; $counted tokens counted")
    }

    // WordPiece at corpus scale: one pass to the capped word table,
    // likelihood-merge loop driver-side (vocab-bounded), then greedy
    // MaxMatch counting with the piece set broadcast over the full corpus.
    {
      val model = timed(s"wordpiece train ($nDocs docs, 50k-word cap, 200 merges)") {
        graft.text.WordPiece.train(docs, numMerges = 200, maxWords = 50000)
      }
      require(model.merges.nonEmpty && model.vocab.size > model.merges.size,
        "degenerate wordpiece vocab")
      val counted = timed(s"wordpiece MaxMatch token counts ($nDocs docs, ${model.vocab.size} pieces)") {
        graft.text.WordPiece.countTokens(docs, model)
          .agg(coalesce(sum("n_tokens"), lit(0L))).head().getLong(0)
      }
      println(s"[scale] wordpiece: ${model.merges.size} merges trained; $counted tokens counted")
    }

    // Edit-distance-verified fuzzy dedup at corpus scale: LSH candidates,
    // length-ratio prune, exact Levenshtein DP only on candidate pairs —
    // the planted 1% prefix copies must all survive the 0.9 gate (a
    // 4-char prefix on a ~320-char doc is sim ~0.988).
    {
      val editPairs = timed(s"edit-verified dedup ($nDocs docs + 1% planted copies)") {
        graft.dedup.Dedup.editVerifiedPairs(withCopies,
          jaccardFloor = 0.8, minEditSim = 0.9).count()
      }
      require(editPairs >= nDocs / 100,
        s"edit gate lost planted copies: $editPairs < ${nDocs / 100}")
      println(s"[scale] edit-verified pairs: $editPairs")
    }

    // Incremental (recrawl) dedup at corpus scale: a 1% arriving batch
    // pairs against the full corpus through the bipartite band join —
    // the corpus never self-joins, within-batch pairs never generated.
    {
      val newBatch = docs.filter(col("doc_id") % 100 === 1)
        .select((col("doc_id") + 20000000L).as("doc_id"),
          concat(lit("recrawl "), col("text")).as("text"))
      val incPairs = timed(s"incremental dedup (${nDocs / 100} new vs $nDocs corpus)") {
        graft.dedup.Dedup.minhashLshPairsAgainst(newBatch, docs, threshold = 0.8).count()
      }
      require(incPairs >= nDocs / 100,
        s"bipartite candidates lost planted recrawls: $incPairs < ${nDocs / 100}")
      println(s"[scale] incremental pairs: $incPairs")
    }

    // Streaming weighted-sample reservoir at corpus scale: three batches
    // + compaction + a post-fold replay; the maintained sample must equal
    // the batch A-Res selection row-for-row (anti-join both ways).
    {
      val weighted = docs.withColumn("w", (length(col("text")) + lit(1)).cast("double"))
      val wsDir = java.nio.file.Files.createTempDirectory("scale_ws").toString
      val sink = graft.streaming.StreamingOps.weightedSampleSink(
        spark, wsDir, k = 10000, weightCol = "w")
      timed(s"weighted-sample sink (3 batches over $nDocs docs, k=10k)") {
        sink(weighted.filter(col("doc_id") % 3 === 0), 0L)
        sink(weighted.filter(col("doc_id") % 3 === 1), 1L)
        graft.streaming.StreamingOps.compactWeightedSample(spark, wsDir, maxBatches = 1)
        sink(weighted.filter(col("doc_id") % 3 === 0), 0L) // post-fold replay
        sink(weighted.filter(col("doc_id") % 3 === 2), 2L)
      }
      val maintained = graft.streaming.StreamingOps
        .weightedSampleMaintained(spark, wsDir).select("doc_id")
      val batchSel = graft.ops.Sampling.sampleWeighted(weighted, "doc_id", "w", k = 10000)
        .select("doc_id")
      val diff = maintained.exceptAll(batchSel).count() + batchSel.exceptAll(maintained).count()
      require(diff == 0, s"maintained reservoir diverged from batch A-Res: $diff rows differ")
      println(s"[scale] weighted reservoir == batch sample (10k rows, post-fold replay)")
    }

    // SSL-prototype pruning at corpus scale: sampled k-means train (the
    // 10x offline lever), one broadcast-centroid difficulty scan, one
    // cluster-keyed rank window; frac + boundary invariants re-derived by
    // the independent aggregate path.
    {
      val pruned = timed(s"prune_prototypes ($n x$dim vectors, c=256, f=0.3, 10% train)") {
        graft.ops.Prototypes.prunePrototypes(spark, data, c = 256,
          pruneFraction = 0.3, sampleFraction = 0.1).cache()
      }
      val stats = pruned.groupBy("cluster").agg(
        count(lit(1)).as("n"),
        sum(when(!col("keep"), 1L).otherwise(0L)).as("np"),
        max(when(!col("keep"), struct(col("dist"), col("id")))).as("pmax"),
        min(when(col("keep"), struct(col("dist"), col("id")))).as("kmin"))
      val bad = stats.filter(col("np") =!= floor(lit(0.3) * col("n")) ||
        (col("np") > 0 && !(col("pmax") < col("kmin")))).count()
      require(bad == 0, s"$bad clusters violate the prune fraction/boundary invariants")
      val kept = pruned.filter(col("keep")).count()
      println(s"[scale] prototype pruning: kept $kept of $n, all ${stats.count()} clusters exact")
      pruned.unpersist()
    }

    // Host-graph PageRank at crawl scale: ~10·nDocs edges over a 100k-host
    // space with a skewed in-degree (every host also links the hub ring
    // h0..h9 — the realistic shape: a few hosts absorb most links), plus
    // 1k pure sinks exercising the dangling arm. Invariants: mass
    // conserved (sum == 1 within fp), hub ranks dominate, fixed 10 rounds.
    {
      val nHosts = 100000
      val eBase = spark.range(nDocs.toLong * 10).select(
        concat(lit("h"), (col("id") % nHosts).cast("string")).as("src"),
        concat(lit("h"), ((col("id") * 2654435761L + 17) % nHosts).cast("string")).as("dst"))
      val eHub = spark.range(nDocs.toLong * 2).select(
        concat(lit("h"), (col("id") % nHosts).cast("string")).as("src"),
        concat(lit("h"), (col("id") % 10).cast("string")).as("dst"))
      val eSink = spark.range(1000).select(
        concat(lit("h"), (col("id") % nHosts).cast("string")).as("src"),
        concat(lit("sink"), col("id").cast("string")).as("dst"))
      val pr = timed(s"pagerank (${nDocs * 12L} edges, $nHosts hosts, 10 rounds)") {
        graft.ops.Graph.pagerank(eBase.unionByName(eHub).unionByName(eSink)).cache()
      }
      val mass = pr.agg(sum("rank")).head().getDouble(0)
      require(math.abs(mass - 1.0) < 1e-6, s"rank mass leaked: $mass")
      val hubMin = pr.filter(col("node").isin((0 until 10).map("h" + _): _*))
        .agg(min("rank")).head().getDouble(0)
      val restMax = pr.filter(!col("node").isin((0 until 10).map("h" + _): _*))
        .filter(col("node").startsWith("h"))
        .agg(max("rank")).head().getDouble(0)
      require(hubMin > restMax, s"hub ranks must dominate: $hubMin vs $restMax")
      println(f"[scale] pagerank: mass $mass%.9f, hub min $hubMin%.2e > rest max $restMax%.2e")
      pr.unpersist()
    }

    spark.stop()
  }
}
