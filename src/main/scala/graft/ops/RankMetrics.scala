package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval evaluation metrics over ranked results — recall@k, MRR@k,
  * nDCG@k (graded, standard 2^rel − 1 gain, log₂(rank+1) discount). Every
  * retrieval deployment closes its loop on these; the approximate tiers
  * here (IVF, PQ, HNSW, binary, Matryoshka) are tuned against exactly
  * this measurement, which the catalog rows have so far computed ad hoc
  * per query shape.
  *
  * Deterministic and engine-portable: plain arithmetic over the two
  * inputs — a SQL oracle replays it formula-for-formula.
  */
object RankMetrics {

  /** Per-query metrics: join `results` (qidCol, idCol, rankCol — rank
    * ascending from 1, the shape every search operator here emits)
    * against `relevance` (qidCol, idCol, relCol — graded gain, > 0 means
    * relevant), both truncated to the top `k` ranks.
    *
    * Returns one row per qid present in `results`:
    * (qid, n_relevant, n_hits, recall_at_k, mrr_at_k, ndcg_at_k,
    * ap_at_k). recall@k = hits / n_relevant; MRR@k = 1/first relevant
    * rank (0 if none); nDCG@k = DCG over the retrieved list / DCG of the
    * ideal (relevance-sorted) list truncated at k; AP@k = the standard
    * binary average precision — Σ over hit ranks r of precision@r,
    * normalized by min(n_relevant, k) (TREC convention: a perfect top-k
    * scores 1 even when n_relevant > k), with rel > 0 counting as
    * relevant ([[summarize]]'s mean of this column is MAP@k). A ranking
    * must be a permutation: two DISTINCT ids sharing one (qid, rank)
    * raise loudly — rank-label arithmetic would otherwise push AP@k and
    * nDCG@k silently past 1 (the same silent-wrong class the (qid, id)
    * dedup below closes), and there is no unambiguous tie semantics to
    * pick for the caller. Queries with NO relevant documents score 0
    * everywhere (they cannot be retrieved well or badly; filter on
    * n_relevant to exclude them from averages — a silent drop here would
    * skew macro-averages unnoticed).
    *
    * Scale shape: one (qid, id) equi-join, per-qid partial aggregations,
    * and one window each over the RELEVANCE table (ideal DCG, bounded by
    * the judgment-list length) and the top-k RESULT rows (cumulative
    * hits for AP, ≤ k rows per qid) — never the corpus. Nothing
    * driver-resident; metrics for a million queries are one more
    * qid-keyed aggregate.
    */
  def evaluate(
      results: DataFrame,
      relevance: DataFrame,
      k: Int,
      qidCol: String = "qid",
      idCol: String = "id",
      rankCol: String = "rank",
      relCol: String = "rel"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // both inputs dedupe on (qid, id): a doc retrieved at several ranks
    // keeps its best rank, duplicate judgments keep the highest grade —
    // otherwise the equi-join fans out and recall@k/nDCG silently exceed
    // 1 on sloppy input. One extra partial aggregation each; a clean
    // input is unchanged.
    val res = results.filter(col(rankCol) <= k)
      .select(col(qidCol).cast("long").as("qid"), col(idCol).cast("long").as("id"),
        col(rankCol).cast("int").as("__rank"))
      .groupBy("qid", "id").agg(min("__rank").as("__rank"))
    val rel = relevance.filter(col(relCol) > 0)
      .select(col(qidCol).cast("long").as("qid"), col(idCol).cast("long").as("id"),
        col(relCol).cast("double").as("__rel"))
      .groupBy("qid", "id").agg(max("__rel").as("__rel"))
    def gain(r: org.apache.spark.sql.Column) = pow(lit(2.0), r) - 1.0
    def discount(rank: org.apache.spark.sql.Column) = log(2.0, rank.cast("double") + 1.0)
    // ideal DCG: the relevance list sorted by gain desc (ties by id for
    // determinism), truncated at k
    val wIdeal = Window.partitionBy("qid").orderBy(col("__rel").desc, col("id"))
    val idealAgg = rel.withColumn("__rn", row_number().over(wIdeal))
      .groupBy("qid").agg(
        count(lit(1)).as("n_relevant"),
        sum(when(col("__rn") <= k, gain(col("__rel")) / discount(col("__rn")))
          .otherwise(0.0)).as("__idcg"))
    // a ranking must be a permutation: distinct ids sharing one rank have
    // no unambiguous precision/discount, and rank-label arithmetic would
    // silently push AP/nDCG past 1 — raise instead (same qid-keyed
    // exchange as the cumulative window below; ≤ k rows per qid)
    val wTie = Window.partitionBy("qid", "__rank")
    val resChecked = res
      .withColumn("__peers", count(lit(1)).over(wTie))
      .withColumn("__rank", when(col("__peers") > 1,
          raise_error(concat(
            lit("RankMetrics.evaluate: distinct ids share rank "),
            col("__rank").cast("string"), lit(" for qid "),
            col("qid").cast("string"),
            lit(" — a ranking must be a permutation; fix the ranker or pre-dedupe")))
          .cast("int"))
        .otherwise(col("__rank")))
      .drop("__peers")
    // cumulative hit count along the ranked list — the precision@r
    // numerator AP sums over hit positions
    val wRank = Window.partitionBy("qid").orderBy("__rank")
    val perQ = resChecked.join(rel, Seq("qid", "id"), "left")
      .withColumn("__hit", when(col("__rel").isNotNull, 1L).otherwise(0L))
      .withColumn("__cumhits", sum("__hit").over(wRank))
      .groupBy("qid").agg(
        sum(col("__hit")).as("n_hits"),
        min(when(col("__hit") === 1, col("__rank"))).as("__first_hit"),
        sum(when(col("__hit") === 1, gain(col("__rel")) / discount(col("__rank")))
          .otherwise(0.0)).as("__dcg"),
        sum(when(col("__hit") === 1,
          col("__cumhits").cast("double") / col("__rank"))).as("__apsum"))
    perQ.join(idealAgg, Seq("qid"), "left")
      .select(
        col("qid"),
        coalesce(col("n_relevant"), lit(0L)).as("n_relevant"),
        col("n_hits"),
        when(coalesce(col("n_relevant"), lit(0L)) === 0, 0.0)
          .otherwise(col("n_hits").cast("double") / col("n_relevant")).as("recall_at_k"),
        when(col("__first_hit").isNull, 0.0)
          .otherwise(lit(1.0) / col("__first_hit")).as("mrr_at_k"),
        when(coalesce(col("__idcg"), lit(0.0)) === 0.0, 0.0)
          .otherwise(col("__dcg") / col("__idcg")).as("ndcg_at_k"),
        when(coalesce(col("n_relevant"), lit(0L)) === 0, 0.0)
          .otherwise(coalesce(col("__apsum"), lit(0.0)) /
            least(col("n_relevant"), lit(k.toLong)).cast("double")).as("ap_at_k"))
  }

  /** Corpus-level macro averages of [[evaluate]] (queries weighted
    * equally), excluding zero-relevance queries by default — the number a
    * tuning loop actually reads. `map_at_k` is the mean of the per-query
    * average precision (MAP in the TREC sense). Returns one row:
    * (n_queries, recall_at_k, mrr_at_k, ndcg_at_k, map_at_k).
    */
  def summarize(perQuery: DataFrame, includeZeroRelevance: Boolean = false): DataFrame = {
    val base = if (includeZeroRelevance) perQuery
      else perQuery.filter(col("n_relevant") > 0)
    base.agg(
      count(lit(1)).as("n_queries"),
      avg("recall_at_k").as("recall_at_k"),
      avg("mrr_at_k").as("mrr_at_k"),
      avg("ndcg_at_k").as("ndcg_at_k"),
      avg("ap_at_k").as("map_at_k"))
  }
}
