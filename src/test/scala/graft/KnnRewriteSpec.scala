package graft

import graft.knn.Knn
import graft.plans.{KnnCandidatesNode, KnnRewrite}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The SQL→custom-operator rewrite: fires on the canonical top-k-by-distance
  * idiom, stays exact (vs `Knn.bruteForce`, including ties), and leaves every
  * non-provable variant to the standard planner with unchanged results.
  */
class KnnRewriteSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def setupViews(nQueries: Int): Unit = {
    graft.functions.GraftFunctionRegistry.register(spark)
    KnnRewrite.install(spark)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    e.select(col("vec_id").as("id"), col("embedding").as("vector"))
      .createOrReplaceTempView("knnr_data")
    // literal query batch -> LocalRelation after local collection
    val rows = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").cast("long").as("qid"), col("embedding").as("qv"))
      .collect()
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.toSeq.asJava, rows.head.schema)
      .createOrReplaceTempView("knnr_q")
  }

  private def sqlKnn(rankPred: String = "rnk <= 10", extraCol: String = ""): DataFrame =
    spark.sql(
      s"""SELECT qid, id, round(dist, 4) AS dist, CAST(rnk AS BIGINT) AS rank FROM (
         |  SELECT q.qid AS qid, d.id AS id $extraCol,
         |         dist_euclidean(d.vector, q.qv) AS dist,
         |         row_number() OVER (PARTITION BY q.qid
         |                            ORDER BY dist_euclidean(d.vector, q.qv), d.id) AS rnk
         |  FROM knnr_data d CROSS JOIN knnr_q q)
         |WHERE $rankPred ORDER BY qid, rank""".stripMargin)

  test("canonical SQL kNN idiom dispatches to KnnCandidatesNode and matches bruteForce") {
    setupViews(5)
    val df = sqlKnn()
    assert(KnnRewrite.fired(df), df.queryExecution.optimizedPlan.toString)
    assert(df.queryExecution.executedPlan.toString.contains("KnnCandidates"))

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val data = e.select(col("vec_id").as("id"), col("embedding").as("vector"))
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val expected = Knn.bruteForce(data, queries, 10, "euclidean")
      .select(col("qid").cast("long"), col("id").cast("long"),
        round(col("dist"), 4).as("dist"), col("rank").cast("long"))
      .orderBy("qid", "rank")
    assert(df.collect().toSeq == expected.collect().toSeq)
  }

  test("rnk < k+1 form fires too") {
    setupViews(3)
    val df = sqlKnn(rankPred = "rnk < 6")
    assert(KnnRewrite.fired(df))
    assert(df.groupBy("qid").count().collect().forall(_.getLong(1) == 5L))
  }

  test("non-literal query side is left to the standard planner, same results") {
    setupViews(3)
    // query side reads the parquet scan directly -> not a LocalRelation
    spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < 3)
      .select(col("vec_id").cast("long").as("qid"), col("embedding").as("qv"))
      .createOrReplaceTempView("knnr_q_scan")
    val df = spark.sql(
      """SELECT qid, id, round(dist, 4) AS dist FROM (
        |  SELECT q.qid AS qid, d.id AS id,
        |         dist_euclidean(d.vector, q.qv) AS dist,
        |         row_number() OVER (PARTITION BY q.qid
        |                            ORDER BY dist_euclidean(d.vector, q.qv), d.id) AS rnk
        |  FROM knnr_data d CROSS JOIN knnr_q_scan q)
        |WHERE rnk <= 5 ORDER BY qid, dist""".stripMargin)
    assert(!KnnRewrite.fired(df))
    val viaRewrite = sqlKnn(rankPred = "rnk <= 5")
    assert(df.select("qid", "id", "dist").collect().toSeq ==
      viaRewrite.select("qid", "id", "dist").collect().toSeq)
  }

  test("extra projected column blocks the rewrite but not correctness") {
    setupViews(2)
    val df = spark.sql(
      """SELECT qid, id, vcopy[0] IS NOT NULL AS has_vec FROM (
        |  SELECT q.qid AS qid, d.id AS id, d.vector AS vcopy,
        |         row_number() OVER (PARTITION BY q.qid
        |                            ORDER BY dist_euclidean(d.vector, q.qv), d.id) AS rnk
        |  FROM knnr_data d CROSS JOIN knnr_q q)
        |WHERE rnk <= 3 ORDER BY qid, id""".stripMargin)
    assert(!KnnRewrite.fired(df))
    assert(df.count() == 6L)
  }

  test("descending order is not a kNN and is not rewritten") {
    setupViews(2)
    val df = spark.sql(
      """SELECT qid, id FROM (
        |  SELECT q.qid AS qid, d.id AS id,
        |         row_number() OVER (PARTITION BY q.qid
        |                            ORDER BY dist_euclidean(d.vector, q.qv) DESC, d.id) AS rnk
        |  FROM knnr_data d CROSS JOIN knnr_q q)
        |WHERE rnk <= 3""".stripMargin)
    assert(!KnnRewrite.fired(df))
    assert(df.count() == 6L)
  }

  test("tie-break exactness: duplicated vectors rank identically to the window formulation") {
    graft.functions.GraftFunctionRegistry.register(spark)
    KnnRewrite.install(spark)
    import spark.implicits._
    // 8 points, two exact duplicates of each of 4 distinct vectors
    val pts = (0 until 8).map(i => (i.toLong, Array.fill(4)((i % 4).toFloat)))
    pts.toDF("id", "vector").createOrReplaceTempView("knnr_ties")
    Seq((0L, Array(0f, 0f, 0f, 0f))).toDF("qid", "qv").createOrReplaceTempView("knnr_ties_q")
    val df = spark.sql(
      """SELECT qid, id, dist, rnk FROM (
        |  SELECT q.qid AS qid, d.id AS id,
        |         dist_euclidean(d.vector, q.qv) AS dist,
        |         row_number() OVER (PARTITION BY q.qid
        |                            ORDER BY dist_euclidean(d.vector, q.qv), d.id) AS rnk
        |  FROM knnr_ties d CROSS JOIN knnr_ties_q q)
        |WHERE rnk <= 4 ORDER BY rnk""".stripMargin)
    assert(KnnRewrite.fired(df))
    // ids 0 and 4 are the duplicate zero vectors: ranks 1,2 by id tie-break
    assert(df.select("id").as[Long].collect().take(2).toSeq == Seq(0L, 4L))
  }
}
