package graft

import graft.functions.vec
import graft.knn.{Ivf, MaxSim}
import org.apache.spark.sql.functions._

/** Late-interaction (ColBERT MaxSim) retrieval: the exact kernel against a
  * plain-Scala reference, the two-stage form's exactness at full tokenK,
  * and the IVF-coarse form's recall on clustered token geometry.
  */
class MaxSimSpec extends SparkTestBase {
  import spark.implicits._

  private def unit(x: Long): Double = graft.core.SplitMix.unit(graft.core.SplitMix.mix(x))

  private val nDocs = 120
  private val toksPerDoc = 4
  private val dim = 8
  private val nClusters = 12

  /** Unit-normalized doc tokens clustered by doc id — doc d's tokens sit
    * near center (d % nClusters), so MaxSim neighbors are cluster-mates.
    * Pure function of ids: deterministic across runs and layouts.
    */
  private lazy val tokens: Seq[(Long, Long, Array[Float])] =
    (0L until nDocs.toLong).flatMap { d =>
      val c = (d % nClusters).toInt
      (0 until toksPerDoc).map { p =>
        val tid = d * toksPerDoc + p
        val raw = Array.tabulate(dim) { e =>
          val center = unit(c.toLong * 1000003L + e)
          val noise = (unit(tid * 31L + e.toLong * 7L + 1L) - 0.5) * 0.1
          center + noise
        }
        val n = math.sqrt(raw.map(x => x * x).sum)
        (d, tid, raw.map(x => (x / n).toFloat))
      }
    }

  private lazy val docVecs: Map[Long, Array[Array[Float]]] =
    tokens.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toArray).toMap

  private lazy val docsDf = docVecs.toSeq.sortBy(_._1).toDF("id", "vectors").cache()
  private lazy val docTokensDf = tokens.toDF("doc_id", "tok_id", "vector").cache()
  private lazy val queryIds = Seq(0L, 5L, 23L)
  private lazy val queriesDf = queryIds.map(q => (q, docVecs(q))).toDF("qid", "qvecs")

  private def naiveMaxSim(d: Array[Array[Float]], q: Array[Array[Float]]): Double =
    q.map { qv =>
      d.map { dv =>
        var acc = 0.0; var i = 0
        while (i < math.min(qv.length, dv.length)) { acc += dv(i).toDouble * qv(i).toDouble; i += 1 }
        acc
      }.max
    }.sum

  test("exact MaxSim matches a plain-Scala reference bit-for-bit") {
    val got = MaxSim.search(docsDf, queriesDf, 10)
      .select("qid", "id", "score", "rank").as[(Long, Long, Double, Int)]
      .collect().sortBy(r => (r._1, r._4))
    val want = queryIds.flatMap { q =>
      docVecs.toSeq.map { case (id, d) => (q, id, naiveMaxSim(d, docVecs(q))) }
        .sortBy { case (_, id, s) => (-s, id) }.take(10)
        .zipWithIndex.map { case ((qq, id, s), i) => (qq, id, s, i + 1) }
    }.sortBy(r => (r._1, r._4))
    assert(got.length === want.length)
    got.zip(want).foreach { case ((gq, gi, gs, gr), (wq, wi, ws, wr)) =>
      assert((gq, gi, gr) === (wq, wi, wr))
      assert(gs === ws) // identical double fold order -> bit-equal
    }
  }

  test("a query's own document ranks first (self-similarity dominates)") {
    val top1 = MaxSim.search(docsDf, queriesDf, 1)
      .select("qid", "id").as[(Long, Long)].collect().toMap
    queryIds.foreach(q => assert(top1(q) === q, s"doc $q not its own top-1"))
  }

  test("two-stage with exhaustive tokenK equals exact search row-for-row") {
    val exact = MaxSim.search(docsDf, queriesDf, 10)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().sorted
    val two = MaxSim.searchTwoStage(docsDf, docTokensDf, queriesDf,
        k = 10, tokenK = nDocs * toksPerDoc)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().sorted
    assert(two === exact)
  }

  test("two-stage at small tokenK keeps high recall on clustered tokens") {
    val exact = MaxSim.search(docsDf, queriesDf, 10).select("qid", "id")
    val two = MaxSim.searchTwoStage(docsDf, docTokensDf, queriesDf, k = 10, tokenK = 16)
      .select("qid", "id")
    val hits = two.join(exact, Seq("qid", "id"), "left_semi").count()
    val recall = hits.toDouble / (queryIds.size * 10)
    assert(recall >= 0.9, s"two-stage recall $recall < 0.9")
  }

  test("IVF-coarse two-stage: recall >= 0.9 on clustered token geometry") {
    val tokTable = docTokensDf.select(col("tok_id").as("id"), col("vector"))
    val centroids = Ivf.train(spark, tokTable, c = nClusters, iterations = 3)
    val assigned = Ivf.assign(spark, tokTable, centroids, spill = 2).cache()
    val got = MaxSim.searchTwoStageIvf(docsDf, docTokensDf, queriesDf,
      assigned, centroids, k = 10, tokenK = 16, nprobe = 3)
    val exact = MaxSim.search(docsDf, queriesDf, 10).select("qid", "id")
    val hits = got.select("qid", "id").join(exact, Seq("qid", "id"), "left_semi").count()
    val recall = hits.toDouble / (queryIds.size * 10)
    assert(recall >= 0.9, s"IVF two-stage recall $recall < 0.9")
    assigned.unpersist()
  }

  test("empty document token list scores 0.0, empty query scores 0.0") {
    val df = Seq(
      (Array.empty[Array[Float]], Array(Array(1f, 2f))),
      (Array(Array(1f, 2f)), Array.empty[Array[Float]])
    ).toDF("d", "q").select(vec.maxSim(col("d"), col("q")).as("s"))
    assert(df.as[Double].collect().toSeq === Seq(0.0, 0.0))
  }

  test("empty token lists are excluded from search results on both sides") {
    val docs = Seq(
      (1L, Array(Array(1f, 0f))),
      (2L, Array.empty[Array[Float]])).toDF("id", "vectors")
    val qs = Seq(
      (10L, Array(Array(1f, 0f))),
      (11L, Array.empty[Array[Float]])).toDF("qid", "qvecs")
    val got = MaxSim.search(docs, qs, 5).select("qid", "id").as[(Long, Long)].collect()
    // doc 2 never appears (searchTwoStage could never surface it), and
    // the empty query 11 has no rows at all
    assert(got.toSeq === Seq((10L, 1L)))
  }

  test("mismatched token dimensions fail loudly instead of truncating") {
    val docs = Seq((1L, Array(Array(1f, 0f, 0f)))).toDF("id", "vectors")
    val qs = Seq((10L, Array(Array(1f, 0f)))).toDF("qid", "qvecs")
    val e = intercept[Exception](MaxSim.search(docs, qs, 5).collect())
    assert(e.getMessage.contains("token dim"), e.getMessage)
  }

  test("searchTwoStageIvf rejects unpackable qids loudly") {
    val tokTable = docTokensDf.select(col("tok_id").as("id"), col("vector"))
    val centroids = Ivf.train(spark, tokTable, c = nClusters, iterations = 1)
    val assigned = Ivf.assign(spark, tokTable, centroids, spill = 1)
    val badQueries = Seq((-1L, docVecs(0L))).toDF("qid", "qvecs")
    val e = intercept[Exception](
      MaxSim.searchTwoStageIvf(docsDf, docTokensDf, badQueries,
        assigned, centroids, k = 5, tokenK = 4, nprobe = 2).collect())
    assert(e.getMessage.contains("unpackable"), e.getMessage)
  }

  test("maxsim_score is SQL-registered and matches the column API") {
    graft.functions.GraftFunctionRegistry.register(spark)
    val viaSql = spark.sql(
      "SELECT maxsim_score(array(array(1.0F,0.0F),array(0.0F,1.0F)), array(array(2.0F,3.0F)))")
      .as[Double].head()
    assert(viaSql === 3.0) // max(dot([1,0],[2,3]), dot([0,1],[2,3])) = max(2,3)
  }
}
