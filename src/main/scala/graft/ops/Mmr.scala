package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein, SIGIR
  * 1998): greedily re-order a retrieved candidate list so each pick
  * maximizes λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s) — relevance
  * traded against redundancy to the results already chosen. The
  * diversification tail of the hybrid-search stack: retrieve
  * ([[graft.text.Bm25]] / [[graft.knn.Knn]]) → fuse ([[Fusion.rrf]]) →
  * diversify (here).
  *
  * Scale shape: candidates are a TOP-K-BOUNDED list per query (k·Q rows
  * total, corpus-size-free), so the greedy loop runs per-qid inside
  * `mapGroups` over ≤k rows — embeddings join candidate ids only (a
  * broadcast-sized id set per batch), nothing quadratic in the corpus and
  * nothing driver-resident.
  *
  * Determinism: sim is the cosine SIMILARITY dot/(‖a‖‖b‖) folded in
  * element order, rel and the λ arithmetic are fixed-order IEEE doubles,
  * and ties (first pick and every argmax) break by ascending id — so the
  * selection sequence is reproducible bit-for-bit across engines (the
  * catalog oracle replays the greedy loop unrolled in SQL).
  */
object Mmr {

  /** Element-order cosine similarity in double — the oracle replays the
    * identical fold (`list_dot/(sqrt(list_dot)·sqrt(list_dot))`).
    */
  private[graft] def cosineSim(a: Array[Float], b: Array[Float]): Double = {
    require(a.length == b.length, s"dim mismatch: ${a.length} vs ${b.length}")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Re-rank `candidates` (qid, id, rel — higher rel = more relevant)
    * using `vectors` (id, vector) for pairwise similarity; emit the top
    * `k` picks per query as (qid, id, mmr_rank, rel, max_sim) in
    * selection order (`max_sim` = similarity to the closest
    * previously-selected result, 0.0 for the first pick — the quantity
    * the picked score traded against). A candidate with no row in
    * `vectors` is DROPPED (inner join): redundancy against it cannot be
    * priced, and inventing a zero-similarity default would hand it a
    * diversity bonus for missing data — left-join first if absent
    * embeddings should rank purely by relevance instead.
    */
  def rerank(
      candidates: DataFrame, // (qid, id, rel)
      vectors: DataFrame, // (id, vector: array<float>)
      k: Int,
      lambda: Double = 0.7): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(lambda >= 0 && lambda <= 1, s"lambda must be in [0,1], got $lambda")
    val spark = candidates.sparkSession
    import spark.implicits._
    val oneMinusLambda = 1.0 - lambda

    val joined = candidates
      .select(col("qid").cast("long"), col("id").cast("long"), col("rel").cast("double"))
      .join(vectors.select(col("id").cast("long"), col("vector").cast("array<float>")),
        Seq("id"))
      .select("qid", "id", "rel", "vector")

    joined.as[(Long, Long, Double, Array[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (qid, iter) =>
        // ≤ candidate-list-sized; sorted by id so every argmax scan breaks
        // ties toward the smallest id deterministically
        val cand = iter.map { case (_, id, rel, v) => (id, rel, v) }.toArray.sortBy(_._1)
        val selected = new Array[Int](math.min(k, cand.length))
        // true running max — similarities can be NEGATIVE, and the oracle's
        // max() keeps them; only the DISPLAYED first-pick redundancy is 0
        val maxSim = Array.fill(cand.length)(Double.NegativeInfinity)
        val taken = new Array[Boolean](cand.length)
        var s = 0
        while (s < selected.length) {
          var best = -1
          var bestScore = Double.NegativeInfinity
          var i = 0
          while (i < cand.length) {
            if (!taken(i)) {
              val score =
                if (s == 0) cand(i)._2
                else lambda * cand(i)._2 - oneMinusLambda * maxSim(i)
              if (score > bestScore) { best = i; bestScore = score }
            }
            i += 1
          }
          taken(best) = true
          selected(s) = best
          // fold the new pick into every remaining candidate's redundancy
          i = 0
          while (i < cand.length) {
            if (!taken(i)) {
              val sim = cosineSim(cand(i)._3, cand(best)._3)
              if (sim > maxSim(i)) maxSim(i) = sim
            }
            i += 1
          }
          s += 1
        }
        selected.iterator.zipWithIndex.map { case (ci, rank) =>
          (qid, cand(ci)._1, (rank + 1).toLong, cand(ci)._2,
            if (rank == 0) 0.0 else maxSim(ci))
        }
      }
      .toDF("qid", "id", "mmr_rank", "rel", "max_sim")
  }
}
