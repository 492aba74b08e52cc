package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack et al., SIGIR 2009): merge ranked
  * result lists from heterogeneous retrievers — e.g. the BM25 lexical arm
  * ([[graft.text.Bm25]]) and the vector kNN arm ([[graft.knn.Knn]]) — into
  * one ranking by rrf(d) = Σ_lists 1/(K + rank_list(d)), the standard
  * hybrid-search merge. Rank-based, so the arms' incomparable score
  * scales (BM25 mass vs a distance) never need calibration.
  *
  * Determinism: every input is (qid, id, rank) with integer ranks;
  * 1/(K + rank) is a single IEEE division and the per-(qid, id) sum folds
  * over the FIXED list order (an array built by list index, not a shuffle
  * order), so the fused score is bit-identical across engines and
  * layouts. Ties order by id.
  *
  * Scale shape: each arm's output is already top-k-bounded (k·Q rows), so
  * fusion operates on query-sized data regardless of corpus size — one
  * (qid, id) aggregation plus one per-qid window, both over ≤ lists·k·Q
  * rows.
  */
object Fusion {

  /** Weighted-sum fusion — the other standard hybrid merge: min-max
    * normalize each list's scores WITHIN each query (so the arms'
    * incomparable scales both land in [0, 1]), then rank by the weighted
    * sum. `lists` entries are (df with (qid, id, score), weight,
    * higherIsBetter) — pass `higherIsBetter = false` for distance lists,
    * which normalize inverted ((max − s)/(max − min)). A list whose
    * scores for a query are all equal normalizes to 1.0 (its entire
    * top-k ties at its own best — it ranks them all first, it just
    * cannot discriminate among them); absent documents contribute 0.
    *
    * Unlike [[rrf]] this uses the actual score GAPS, so a dominant exact
    * match separates from the pack instead of being one rank apart. Same
    * scale shape: inputs are top-k-bounded, the min/max windows and the
    * fused aggregation run on lists·k·Q rows; the per-(qid, id) sum folds
    * in list-index order for bit-determinism.
    */
  def weighted(lists: Seq[(DataFrame, Double, Boolean)], k: Int): DataFrame = {
    require(lists.nonEmpty, "no result lists to fuse")
    require(k > 0, s"k must be positive, got $k")
    require(lists.forall(_._2 >= 0), "weights must be non-negative")

    val wq = Window.partitionBy("qid")
    val tagged = lists.zipWithIndex.map { case ((df, weight, hib), i) =>
      val s = col("score").cast("double")
      val mn = min(s).over(wq)
      val mx = max(s).over(wq)
      val norm = when(mx === mn, lit(1.0))
        .otherwise(if (hib) (s - mn) / (mx - mn) else (mx - s) / (mx - mn))
      df.select(col("qid").cast("long").as("qid"), col("id").cast("long").as("id"), s)
        .withColumn("contrib", norm * lit(weight))
        .select(col("qid"), col("id"), lit(i).as("list_idx"), col("contrib"))
    }.reduce(_ unionByName _)

    val fused = tagged
      .groupBy("qid", "id")
      .agg(array_sort(collect_list(struct(col("list_idx"), col("contrib")))).as("cs"))
      .withColumn("fused_score",
        aggregate(col("cs"), lit(0.0), (acc, x) => acc + x.getField("contrib")))

    val w = Window.partitionBy("qid").orderBy(col("fused_score").desc, col("id").asc)
    fused
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), round(col("fused_score"), 6).as("fused_score"),
        col("rank").cast("long").as("rank"))
  }

  /** Fuse `lists` (each (qid, id, rank), rank 1-based) into top-`k`
    * (qid, id, rrf_score, rank). A document absent from a list simply
    * contributes nothing for that list (the standard convention).
    */
  def rrf(lists: Seq[DataFrame], k: Int, kRrf: Int = 60): DataFrame = {
    require(lists.nonEmpty, "no result lists to fuse")
    require(k > 0 && kRrf > 0, s"k and kRrf must be positive, got $k, $kRrf")

    val tagged = lists.zipWithIndex.map { case (df, i) =>
      df.select(col("qid").cast("long").as("qid"), col("id").cast("long").as("id"),
        lit(i).as("list_idx"), col("rank").cast("long").as("list_rank"))
    }.reduce(_ unionByName _)

    // fold contributions in list-index order: deterministic fp sum
    val fused = tagged
      .groupBy("qid", "id")
      .agg(array_sort(collect_list(struct(col("list_idx"), col("list_rank")))).as("cs"))
      .withColumn("rrf_score",
        aggregate(col("cs"), lit(0.0),
          (acc, x) => acc + lit(1.0) / (lit(kRrf) + x.getField("list_rank").cast("double"))))

    val w = Window.partitionBy("qid").orderBy(col("rrf_score").desc, col("id").asc)
    fused
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), round(col("rrf_score"), 6).as("rrf_score"),
        col("rank").cast("long").as("rank"))
  }
}
