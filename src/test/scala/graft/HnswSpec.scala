package graft

import graft.core.Distances
import graft.hnsw.{HnswConfig, HnswIndex, HnswSpark}
import graft.knn.TopK
import org.scalatest.funsuite.AnyFunSuite

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.util.Random

/** Mirrors the reference HNSW tests:
  * `/root/reference/index/hnsw_test.go:21` (search vs brute force),
  * `:101,164,270` (behavior with deleted vertices),
  * `index/hnsw_persistence_test.go` (round-trip).
  */
class HnswSpec extends AnyFunSuite {

  private def randomVectors(n: Int, dim: Int, seed: Long): Array[(Long, Array[Float])] = {
    val rnd = new Random(seed)
    Array.tabulate(n)(i => (i.toLong, Array.fill(dim)(rnd.nextFloat())))
  }

  private def bruteForceTopK(
      items: Seq[(Long, Array[Float])], q: Array[Float], k: Int, metric: Int = Distances.Euclidean): Array[Long] = {
    val heap = new TopK(k)
    items.foreach { case (id, v) => heap.push(Distances.distance(metric)(v, q), id) }
    heap.sorted.map(_._2)
  }

  private def buildIndex(items: Seq[(Long, Array[Float])], config: HnswConfig = HnswConfig()): HnswIndex = {
    val idx = new HnswIndex(Distances.Euclidean, config)
    items.foreach { case (id, v) => idx.add(id, v) }
    idx
  }

  test("search recall vs brute force >= 0.9 (hnsw_test.go:21)") {
    val dim = 32
    val items = randomVectors(1000, dim, seed = 7)
    val idx = buildIndex(items.toSeq, HnswConfig(m = 16, ef = 50))
    val rnd = new Random(13)
    val k = 10
    val recalls = (0 until 50).map { _ =>
      val q = Array.fill(dim)(rnd.nextFloat())
      val expected = bruteForceTopK(items.toSeq, q, k).toSet
      val got = idx.search(q, k).map(_._1).toSet
      got.intersect(expected).size.toDouble / k
    }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.9, s"avg recall $avg < 0.9")
  }

  test("search returns ascending distances with exact values") {
    val items = randomVectors(300, 16, seed = 3)
    val idx = buildIndex(items.toSeq)
    val q = items(42)._2
    val res = idx.search(q, 5)
    assert(res.length === 5)
    assert(res.head._1 === 42L) // self is nearest at distance 0
    assert(res.head._2 === 0.0)
    assert(res.map(_._2).toSeq === res.map(_._2).sorted.toSeq)
    // distances are the true kernel values
    res.foreach { case (id, d) =>
      assert(d === graft.core.DistKernel.best.euclidean(items(id.toInt)._2, q))
      assert(math.abs(d - Distances.euclidean(items(id.toInt)._2, q)) < 1e-4)
    }
  }

  test("heuristic neighbor selection with extendCandidates keeps recall (hnsw.go:369)") {
    val dim = 32
    val items = randomVectors(800, dim, seed = 41)
    val idx = buildIndex(items.toSeq,
      HnswConfig(m = 16, ef = 50, heuristic = true, extendCandidates = true, keepPruned = true))
    val rnd = new Random(43)
    val k = 10
    val recalls = (0 until 30).map { _ =>
      val q = Array.fill(dim)(rnd.nextFloat())
      val expected = bruteForceTopK(items.toSeq, q, k).toSet
      val got = idx.search(q, k).map(_._1).toSet
      got.intersect(expected).size.toDouble / k
    }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.85, s"avg recall $avg < 0.85")
  }

  test("deleted vertices are never returned (hnsw_test.go:101)") {
    val items = randomVectors(500, 16, seed = 11)
    val idx = buildIndex(items.toSeq)
    val deleted = (0 until 500 by 5).map(_.toLong).toSet
    deleted.foreach(id => assert(idx.remove(id)))
    val rnd = new Random(5)
    (0 until 20).foreach { _ =>
      val q = Array.fill(16)(rnd.nextFloat())
      val res = idx.search(q, 10)
      assert(res.nonEmpty)
      res.foreach { case (id, _) => assert(!deleted.contains(id), s"deleted id $id returned") }
    }
  }

  test("insert after deletes keeps the graph searchable (hnsw_test.go:164)") {
    val items = randomVectors(200, 16, seed = 17)
    val idx = buildIndex(items.take(100).toSeq)
    (0L until 50L by 2L).foreach(idx.remove)
    items.drop(100).foreach { case (id, v) => idx.add(id, v) }
    val q = items(150)._2
    val res = idx.search(q, 5)
    assert(res.head._1 === 150L)
  }

  test("removing the entrypoint hands off and search still works (hnsw_test.go:270)") {
    val items = randomVectors(100, 8, seed = 23)
    val idx = buildIndex(items.toSeq)
    val ep = idx.entrypointId
    assert(ep >= 0)
    assert(idx.remove(ep))
    assert(idx.entrypointId !== ep)
    val res = idx.search(items(((ep + 1) % 100).toInt)._2, 3)
    assert(res.nonEmpty)
    assert(!res.map(_._1).contains(ep))
  }

  test("filtered search returns only allowed ids with useful recall") {
    val items = randomVectors(600, 16, seed = 51)
    val idx = buildIndex(items.toSeq, HnswConfig(ef = 100))
    val rnd = new Random(53)
    (0 until 10).foreach { _ =>
      val q = Array.fill(16)(rnd.nextFloat())
      val res = idx.searchFiltered(q, 10, _ % 2 == 0)
      assert(res.nonEmpty)
      res.foreach { case (id, _) => assert(id % 2 == 0) }
      // recall vs exact filtered brute force
      val exact = bruteForceTopK(items.filter(_._1 % 2 == 0).toSeq, q, 10).toSet
      val recall = res.map(_._1).toSet.intersect(exact).size.toDouble / 10
      assert(recall >= 0.5, s"filtered recall $recall") // ef=100 over 50% selectivity
    }
  }

  test("remove returns false for missing ids, duplicate insert throws (hnsw.go:21-22)") {
    val idx = buildIndex(randomVectors(10, 4, seed = 1).toSeq)
    assert(!idx.remove(999L))
    intercept[IllegalArgumentException](idx.add(5L, Array.fill(4)(0f)))
  }

  test("persistence round-trip preserves search results (hnsw_persistence_test.go)") {
    val items = randomVectors(400, 16, seed = 29)
    val idx = buildIndex(items.toSeq, HnswConfig(m = 8, ef = 30))
    val bos = new ByteArrayOutputStream()
    idx.save(new DataOutputStream(bos))
    val loaded = HnswIndex.load(new DataInputStream(new ByteArrayInputStream(bos.toByteArray)))
    assert(loaded.size === idx.size)
    val rnd = new Random(31)
    (0 until 10).foreach { _ =>
      val q = Array.fill(16)(rnd.nextFloat())
      assert(loaded.search(q, 5).toSeq === idx.search(q, 5).toSeq)
    }
  }

  test("per-vertex metadata flows through insert, search, and v2 persistence (hnsw.go:80,242; hnsw_persistence.go:87,191)") {
    val items = randomVectors(200, 8, seed = 41)
    val idx = new HnswIndex(graft.core.Distances.Euclidean, HnswConfig(ef = 30))
    items.foreach { case (id, v) =>
      // every third vertex carries no metadata (null round-trips too)
      val meta = if (id % 3 == 0) null else s"meta-$id".getBytes("UTF-8")
      idx.add(id, v, meta)
    }

    // search results carry each vertex's metadata
    val res = idx.searchWithMeta(items(17)._2, 5)
    assert(res.head._1 === 17L)
    res.foreach { case (id, _, meta) =>
      if (id % 3 == 0) assert(meta === null)
      else assert(new String(meta, "UTF-8") === s"meta-$id")
    }

    // v2 persistence round-trips metadata (and nulls)
    val bos = new ByteArrayOutputStream()
    idx.save(new DataOutputStream(bos))
    val loaded = HnswIndex.load(new DataInputStream(new ByteArrayInputStream(bos.toByteArray)))
    assert(loaded.size === idx.size)
    items.foreach { case (id, _) =>
      val meta = loaded.getMetadata(id).get
      if (id % 3 == 0) assert(meta === null)
      else assert(new String(meta, "UTF-8") === s"meta-$id")
    }
    val res2 = loaded.searchWithMeta(items(17)._2, 5)
    assert(res2.map(r => (r._1, r._2)).toSeq === res.map(r => (r._1, r._2)).toSeq)
  }

  test("persistence after removals drops tombstones") {
    val items = randomVectors(100, 8, seed = 37)
    val idx = buildIndex(items.toSeq)
    (0L until 50L).foreach(idx.remove)
    val bos = new ByteArrayOutputStream()
    idx.save(new DataOutputStream(bos))
    val loaded = HnswIndex.load(new DataInputStream(new ByteArrayInputStream(bos.toByteArray)))
    assert(loaded.size === 50)
    val res = loaded.search(items(75)._2, 5)
    assert(res.head._1 === 75L)
    res.foreach { case (id, _) => assert(id >= 50L) }
  }

  test("config derives reference defaults (config.go:104-133)") {
    val c = HnswConfig()
    assert(c.m === 16)
    assert(c.mMax === 16)
    assert(c.mMax0 === 32)
    assert(c.ef === 20)
    assert(c.efConstruction === 200)
    assert(math.abs(c.levelMultiplier - 1.0 / math.log(16.0)) < 1e-12)
  }

  test("deterministic levels follow the exponential distribution shape") {
    val idx = new HnswIndex(Distances.Euclidean, HnswConfig())
    val levels = (0L until 10000L).map(idx.levelFor)
    assert(levels.min === 0)
    val frac0 = levels.count(_ == 0).toDouble / levels.size
    // P(level=0) = 1 - exp(-1/mL) ≈ 0.938 for m=16
    assert(frac0 > 0.9 && frac0 < 0.97, s"frac0=$frac0")
    assert(levels.max <= 10)
  }
}

/** Distributed HNSW: per-partition build + global merge on real testdata. */
class HnswSparkSpec extends SparkTestBase {

  test("partitioned HNSW search recall >= 0.9 vs exact kNN on sf0.001 embeddings") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val data = e.selectExpr("vec_id as id", "embedding as vector")
    val queries = e.filter("vec_id < 20")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

    val k = 10
    val approx = HnswSpark.search(spark, data, queries, k, "euclidean", HnswConfig(ef = 50), numPartitions = 4)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap

    val exact = graft.knn.Knn.bruteForce(data, spark.createDataFrame(
        spark.sparkContext.parallelize(queries.toSeq.map(q => org.apache.spark.sql.Row(q._1, q._2.toSeq))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("qid", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("qvec", org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))))),
        k, "euclidean")
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap

    val recalls = queries.map { case (qid, _) =>
      exact(qid).intersect(approx(qid)).size.toDouble / k
    }
    val avg = recalls.sum / recalls.length
    assert(avg >= 0.9, s"avg recall $avg < 0.9")
  }

  test("buildAndSave persists per-partition graphs that load and search") {
    val dir = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("hnsw").toString
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val data = e.selectExpr("vec_id as id", "embedding as vector")
    val sizes = HnswSpark.buildAndSave(spark, data, out, numPartitions = 4)
    assert(sizes.map(_._2).sum === 500)
    val idx = HnswSpark.loadPartition(s"$out/part-${sizes.head._1}.hnsw")
    assert(idx.size === sizes.head._2)
    val q = e.filter("vec_id = 0").collect().head.getSeq[Float](1).toArray
    assert(idx.search(q, 5).nonEmpty)
  }

  test("hnsw DataSource V2: saved graphs read back as a table, columns prune, torn sets fail at planning") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("hnsw_dsv2").toString
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val data = e.selectExpr("vec_id as id", "embedding as vector")
    HnswSpark.buildAndSave(spark, data, out, numPartitions = 4)

    val tbl = spark.read.format("hnsw").load(out)
    assert(tbl.count() === 500)
    // every (id, vector) round-trips the binary format byte-exactly
    val back = tbl.select(col("id"), col("vector")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toMap
    val orig = data.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toMap
    assert(back === orig)
    // part column reflects the artifact; levels are non-negative
    assert(tbl.select("part").distinct().count() === 4)
    assert(tbl.filter(col("level") < 0).count() === 0)
    // column pruning reaches the reader (ReadSchema excludes vector)
    val pruned = tbl.select("id").queryExecution.executedPlan.toString
    assert(!pruned.contains("vector"), s"vector not pruned from scan:\n$pruned")
    // a torn artifact set (file deleted under the manifest) fails at planning
    val victim = new java.io.File(out).listFiles().filter(_.getName.endsWith(".hnsw")).head
    victim.delete()
    intercept[Exception](spark.read.format("hnsw").load(out).count())
  }

  test("hnsw DataSource V2 write: declarative build matches buildAndSave byte-for-byte, modes enforce") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val data = e.selectExpr("vec_id as id", "embedding as vector")

    // programmatic build = ground truth
    val ref = java.nio.file.Files.createTempDirectory("hnsw_w_ref").toString
    HnswSpark.buildAndSave(spark, data, ref, numPartitions = 4)
    // declarative build: planner supplies the id-clustered id-sorted layout
    val out = java.nio.file.Files.createTempDirectory("hnsw_w_out").toString
    data.write.format("hnsw").option("partitions", 4).mode("append").save(out)

    def crcs(d: String): Map[String, Long] =
      new java.io.File(d).listFiles().filter(_.getName.endsWith(".hnsw")).map { f =>
        val crc = new java.util.zip.CRC32
        crc.update(java.nio.file.Files.readAllBytes(f.toPath))
        f.getName -> crc.getValue
      }.toMap
    assert(crcs(out) === crcs(ref),
      "DSv2 write artifacts differ from buildAndSave — distribution/ordering/insert parity broken")

    // the written index is a readable table AND a searchable index
    assert(spark.read.format("hnsw").load(out).count() === 500)
    val q = data.filter(col("id") === 7).select("vector").collect()(0).getSeq[Float](0).toArray
    val hits = HnswSpark.searchSaved(spark, out, Array((7L, q)), k = 5).collect()
    assert(hits.nonEmpty && hits.exists(_.getLong(1) == 7L))

    // append into an existing index fails loudly; overwrite truncates
    val err = intercept[Exception](
      data.write.format("hnsw").option("partitions", 4).mode("append").save(out))
    assert(String.valueOf(err.getMessage).contains("overwrite"))
    data.limit(100).write.format("hnsw").option("partitions", 2).mode("overwrite").save(out)
    assert(spark.read.format("hnsw").load(out).count() === 100)
    assert(new java.io.File(out).listFiles().count(_.getName.endsWith(".hnsw")) === 2)

    // unknown columns are rejected at analysis, not silently dropped
    val bad = intercept[Exception](
      data.withColumn("junk", lit(1)).write.format("hnsw").mode("overwrite").save(out))
    assert(String.valueOf(bad.getMessage).contains("junk"))
  }

  test("appendAndSave/removeAndSave maintain persisted graphs incrementally") {
    val dir = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("hnsw_inc").toString
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val data = e.selectExpr("vec_id as id", "embedding as vector")
    val first = data.filter("id < 300")
    val second = data.filter("id >= 300")

    HnswSpark.buildAndSave(spark, first, out, numPartitions = 4)
    val sizes = HnswSpark.appendAndSave(spark, second, out, numPartitions = 4)
    assert(sizes.map(_._2).sum === 500)

    // every appended vector is findable (itself at distance 0)
    val queries = second.limit(10).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val res = HnswSpark.searchSaved(spark, out, queries, k = 1).collect()
    queries.foreach { case (qid, _) =>
      val hit = res.find(_.getLong(0) == qid).get
      assert(hit.getLong(1) === qid && hit.getDouble(2) === 0.0)
    }

    // removals disappear from subsequent searches
    import spark.implicits._
    val removed = queries.take(3).map(_._1)
    HnswSpark.removeAndSave(spark, removed.toSeq.toDF("id"), out, numPartitions = 4)
    val res2 = HnswSpark.searchSaved(spark, out, queries, k = 5).collect()
    removed.foreach { rid =>
      assert(!res2.exists(_.getLong(1) == rid), s"removed id $rid still returned")
    }
  }

  test("distributed metadata: optional metadata column round-trips build→save→searchSaved") {
    val dir = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("hnsw_meta").toString
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val data = e.selectExpr("vec_id as id", "embedding as vector",
      "encode(cast(label as string), 'UTF-8') as metadata")
    HnswSpark.buildAndSave(spark, data, out, numPartitions = 4)

    val queries = e.filter("vec_id < 3").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val labels = e.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val res = HnswSpark.searchSaved(spark, out, queries, k = 5).collect()
    assert(res.nonEmpty)
    res.foreach { r =>
      val meta = r.getAs[Array[Byte]]("metadata")
      assert(new String(meta, "UTF-8").toInt === labels(r.getLong(1)))
    }
  }

  test("artifact lifecycle through fully-qualified file:// URIs (Hadoop FileSystem path)") {
    // The persistence boundary is the Hadoop FileSystem API: a scheme-qualified
    // URI must work end-to-end (build, list, append, remove, search). A
    // java.io.File-based implementation would throw on "file://..." paths.
    val dir = "/root/testdata/sf0.001"
    val out = "file://" + java.nio.file.Files.createTempDirectory("hnsw_uri").toString
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val data = e.selectExpr("vec_id as id", "embedding as vector")

    val sizes = HnswSpark.buildAndSave(spark, data.filter("id < 400"), out, numPartitions = 4)
    assert(sizes.map(_._2).sum === 400)
    val appended = HnswSpark.appendAndSave(spark, data.filter("id >= 400"), out, numPartitions = 4)
    assert(appended.map(_._2).sum + sizes.map(_._2).sum >= 500)

    val queries = e.filter("vec_id < 5").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val res = HnswSpark.searchSaved(spark, out, queries, k = 1).collect()
    queries.foreach { case (qid, _) =>
      val hit = res.find(_.getLong(0) == qid).get
      assert(hit.getLong(1) === qid && hit.getDouble(2) === 0.0)
    }

    import spark.implicits._
    HnswSpark.removeAndSave(spark, Seq(0L, 1L).toDF("id"), out, numPartitions = 4)
    val res2 = HnswSpark.searchSaved(spark, out, queries, k = 5).collect()
    assert(!res2.exists(r => r.getLong(1) == 0L || r.getLong(1) == 1L))

    // loadPartition accepts the qualified URI directly
    val first = graft.io.HadoopIO.glob(out, "*.hnsw", spark.sparkContext.hadoopConfiguration).head
    assert(first.startsWith("file:"))
    assert(HnswSpark.loadPartition(first).size > 0)
  }

  test("manifest: incomplete, torn, corrupt, or polluted artifact dirs fail loudly; legacy dirs load") {
    import java.nio.file.{Files, Paths, StandardOpenOption}
    val dir = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("hnsw_manifest").toString
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val data = e.selectExpr("vec_id as id", "embedding as vector")
    HnswSpark.buildAndSave(spark, data, out, numPartitions = 4)
    assert(Files.exists(Paths.get(out, "_manifest")))
    val queries = e.filter("vec_id < 3").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    assert(HnswSpark.searchSaved(spark, out, queries, k = 5).count() > 0)

    val parts = Files.list(Paths.get(out)).toArray.map(_.toString).filter(_.endsWith(".hnsw")).sorted
    assert(parts.length === 4)

    // a foreign artifact the save job didn't write → rejected
    val foreign = Paths.get(out, "part-99.hnsw")
    Files.copy(Paths.get(parts.head), foreign)
    val eExtra = intercept[IllegalArgumentException](
      HnswSpark.searchSaved(spark, out, queries, k = 5))
    assert(eExtra.getMessage.contains("not in its manifest"))
    Files.delete(foreign)

    // a torn save (wrong length) → rejected before any task runs
    val victim = Paths.get(parts.head)
    val original = Files.readAllBytes(victim)
    Files.write(victim, Array[Byte](0), StandardOpenOption.APPEND)
    val eTorn = intercept[IllegalArgumentException](
      HnswSpark.searchSaved(spark, out, queries, k = 5))
    assert(eTorn.getMessage.contains("torn"))

    // same-length corruption → CRC failure at load (flip a byte mid-file)
    val flipped = original.clone()
    flipped(original.length / 2) = (flipped(original.length / 2) ^ 0x5a).toByte
    Files.write(victim, flipped)
    // either our manifest CRC or Hadoop's own .crc sidecar layer fires —
    // both are loud; ours is the fallback for filesystems without one
    val eCrc = intercept[Exception](HnswSpark.searchSaved(spark, out, queries, k = 5).count())
    def causes(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.toString.toLowerCase).toSeq
    assert(causes(eCrc).exists(_.contains("checksum")), causes(eCrc).mkString("\n"))
    Files.write(victim, original)

    // a missing partition artifact → rejected, NOT silent low recall
    Files.delete(victim)
    val eMissing = intercept[IllegalArgumentException](
      HnswSpark.searchSaved(spark, out, queries, k = 5))
    assert(eMissing.getMessage.contains("INCOMPLETE"))
    Files.write(victim, original)

    // pre-manifest (legacy) dirs still serve
    Files.delete(Paths.get(out, "_manifest"))
    assert(HnswSpark.searchSaved(spark, out, queries, k = 5).count() > 0)

    // maintenance over a legacy dir re-establishes a full manifest
    HnswSpark.appendAndSave(spark, data.limit(0), out, numPartitions = 4) // empty batch: inherits legacy entries
    HnswSpark.removeAndSave(spark, spark.sql("select 0L as id"), out, numPartitions = 4)
    val entries = graft.io.Manifest.read(out, spark.sparkContext.hadoopConfiguration).get
    assert(entries.size === 4) // touched partition gets a CRC, others inherit length-only
    assert(HnswSpark.searchSavedDF(
      spark, out, e.selectExpr("vec_id as qid", "embedding as qvec").limit(3), k = 5).count() > 0)
  }

  test("a build that dies mid-job leaves a dir that fails loudly, not a 'legacy' dir that serves") {
    import java.nio.file.{Files, Paths}
    val dir = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("hnsw_crash").toString
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val data = e.selectExpr("vec_id as id", "embedding as vector")
    // a full build elsewhere supplies a realistic partial artifact
    val donor = Files.createTempDirectory("hnsw_donor").toString
    HnswSpark.buildAndSave(spark, data, donor, numPartitions = 4)
    // simulate the crash window: buildAndSave seeds the manifest FIRST
    // (empty for a fresh dir), then tasks write artifacts, then the real
    // manifest lands — die after one artifact, before the final manifest
    graft.io.Manifest.write(out, Seq.empty, spark.sparkContext.hadoopConfiguration)
    val part = Files.list(Paths.get(donor)).toArray.map(_.toString).filter(_.endsWith(".hnsw")).head
    Files.copy(Paths.get(part), Paths.get(out, "part-0.hnsw"))
    val queries = e.filter("vec_id < 3").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val ex = intercept[IllegalArgumentException](HnswSpark.searchSaved(spark, out, queries, k = 5))
    assert(ex.getMessage.contains("not in its manifest"), ex.getMessage)
  }

  test("searchSaved over persisted graphs equals live partitioned search") {
    val dir = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("hnsw_saved").toString
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val data = e.selectExpr("vec_id as id", "embedding as vector")
    val queries = e.filter("vec_id < 5").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)

    HnswSpark.buildAndSave(spark, data, out, numPartitions = 4)
    val saved = HnswSpark.searchSaved(spark, out, queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(x => (x._1, x._3, x._2))
    val live = HnswSpark.search(spark, data, queries, k = 10, numPartitions = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(x => (x._1, x._3, x._2))
    assert(saved.toSeq === live.toSeq)
  }
}
