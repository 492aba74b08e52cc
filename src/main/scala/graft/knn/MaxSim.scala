package graft.knn

import graft.functions.vec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Late-interaction (multi-vector) retrieval: documents and queries are
  * LISTS of token vectors and relevance is the ColBERT MaxSim score
  * (Khattab & Zaharia 2020) — each query token takes its best dot product
  * over the document's tokens, and the per-token maxima sum.
  *
  * This is the multi-vector extension of the reference's single-vector
  * search surface (`/root/reference/storage/dataset.go:349-433` searches one
  * embedding per item); late interaction is what a retrieval stack needs
  * when one pooled vector per document loses too much (long documents,
  * fine-grained phrase matching).
  *
  * Three serving shapes, mirroring the single-vector tiers:
  *  - [[search]]: exact — every (query, doc) pair scored by the codegen'd
  *    [[graft.functions.MaxSimScore]] kernel. The oracle formulation.
  *  - [[searchTwoStage]]: ColBERT's actual architecture — stage 1 retrieves
  *    the top `tokenK` DOCUMENT TOKENS per QUERY TOKEN (token-level kNN
  *    over the exploded token table), candidate documents are the owners of
  *    those tokens, stage 2 rescores candidates exactly. Fully
  *    deterministic given the token table, so a SQL oracle replays it.
  *  - [[searchTwoStageIvf]]: the 100 TB form — stage 1's token-level kNN
  *    runs through the IVF tier ([[Ivf.searchDF]]) instead of a full scan,
  *    so candidate generation probes nprobe/C of the token table. Exactness
  *    within probed cells is inherited; recall is the IVF coarse recall,
  *    gated in MaxSimSpec on planted geometry.
  *
  * Scale shape: the document side never moves (stage 1 shuffles only
  * exploded TOKEN candidates, k·|Q-tokens| rows; stage 2 joins the k'-doc
  * candidate set — both tiny next to the corpus). The query side broadcasts
  * in [[search]] and rides the IVF cogroup in the IVF form. MaxSim favors
  * NORMALIZED token vectors (dot ≡ cosine, and L2 ordering matches dot
  * ordering), which is also what makes the euclidean IVF coarse a faithful
  * proxy for the dot-product stage-1 ranking.
  */
object MaxSim {

  /** Exact MaxSim top-k. docs: (id, vectors: array<array<float>>),
    * queries: (qid, qvecs: array<array<float>>). Scores every pair with
    * one codegen kernel call; queries broadcast, docs stream in place.
    * Ranking tie-break (score DESC, id) is total, so output is
    * deterministic and layout-invariant.
    *
    * Empty token lists are filtered on BOTH sides: a doc with no tokens
    * would otherwise score 0.0 and could enter the top-k here while
    * [[searchTwoStage]] can never surface it (it owns no tokens), breaking
    * the tokenK-saturated equivalence between the two forms; a query with
    * no tokens scores every doc 0.0 and has no meaningful ranking.
    */
  def search(docs: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = docs.filter(size(col("vectors")) > 0)
      .crossJoin(broadcast(queries.filter(size(col("qvecs")) > 0)))
      .select(col("qid"), col("id"), scoreGuarded.as("score"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** The scoring kernel behind an entry-point dimension guard: the codegen
    * kernel ([[graft.functions.MaxSimScore]]) truncates each dot product to
    * the shorter of the two token dims (VectorDot's convention), so a
    * mismatched pair of token tables would yield plausible-looking but
    * wrong scores. Comparing the FIRST token of each list catches the
    * table-level mismatch for one extra `size` per pair (both lists are
    * non-empty here — [[search]]/[[rescore]] filter empties first); ragged
    * dims WITHIN one list remain the caller's contract, as documented on
    * the kernel.
    */
  private def scoreGuarded: org.apache.spark.sql.Column =
    when(size(element_at(col("vectors"), 1)) === size(element_at(col("qvecs"), 1)),
      vec.maxSim(col("vectors"), col("qvecs")))
      .otherwise(raise_error(concat(
        lit("MaxSim: document token dim "), size(element_at(col("vectors"), 1)),
        lit(" != query token dim "), size(element_at(col("qvecs"), 1)))))

  /** Two-stage MaxSim: exact token-level candidate generation + exact
    * rescore.
    *
    * docTokens: (doc_id, tok_id, vector) — one row per document token,
    * `tok_id` unique (it is the ranking tie-break, so uniqueness is what
    * makes stage 1 deterministic). docs/queries as in [[search]].
    *
    * Stage 1 keeps, per (qid, query-token position), the `tokenK` document
    * tokens with the highest dot product; the distinct owning doc_ids are
    * the candidates. Stage 2 is [[search]] restricted to candidates. With
    * `tokenK` ≥ the corpus token count this IS exact search; at production
    * sizes recall follows the usual ColBERT candidate-coverage behavior
    * (every true top doc needs only ONE of its tokens to surface for ONE
    * query token).
    */
  def searchTwoStage(docs: DataFrame, docTokens: DataFrame, queries: DataFrame,
      k: Int, tokenK: Int): DataFrame = {
    val qTokens = queries.select(col("qid"), posexplode(col("qvecs")).as(Seq("qpos", "qvec")))
    val scored = docTokens.crossJoin(broadcast(qTokens))
      .select(col("qid"), col("qpos"), col("doc_id"), col("tok_id"),
        vec.dot(col("vector"), col("qvec")).as("s"))
    val w1 = Window.partitionBy("qid", "qpos").orderBy(col("s").desc, col("tok_id"))
    val cand = scored.withColumn("r", row_number().over(w1)).filter(col("r") <= tokenK)
      .select(col("qid"), col("doc_id").as("id")).distinct()
    rescore(cand, docs, queries, k)
  }

  /** Two-stage MaxSim with IVF candidate generation — the corpus-scale
    * form. The token table is IVF-assigned once (offline); per query token,
    * stage 1 probes `nprobe` cells through [[Ivf.searchDF]] (euclidean on
    * normalized vectors preserves the dot ordering), and stage 2 rescores
    * the owning documents exactly. Token ids double as [[Ivf]] row ids;
    * the caller maps them back to documents via `docTokens`.
    */
  def searchTwoStageIvf(docs: DataFrame, docTokens: DataFrame, queries: DataFrame,
      assignedTokens: DataFrame, centroids: Array[Array[Float]],
      k: Int, tokenK: Int, nprobe: Int): DataFrame = {
    // searchDF keys results by qid alone — pack (query, token position)
    // into one id so per-token top-k's stay separate, then unpack with
    // INTEGER division (long `/` in Spark is double division, wrong above
    // 2^53). The packing needs qid ∈ [0, Long.MaxValue/PackShift) and
    // qpos < PackShift; out-of-range rows fail loudly instead of silently
    // attributing results to a neighboring query.
    val qTokens = queries
      .select(col("qid"), posexplode(col("qvecs")).as(Seq("qpos", "qvec")))
      .select(
        when(col("qid") >= 0 && col("qid") < MaxPackableQid && col("qpos") < PackShift,
          col("qid") * PackShift + col("qpos"))
          .otherwise(raise_error(concat(
            lit(s"searchTwoStageIvf: unpackable (qid, qpos) — need 0 <= qid < $MaxPackableQid"
              + s" and qpos < $PackShift, got ("), col("qid"), lit(", "), col("qpos"), lit(")"))))
          .as("qid"),
        col("qvec"))
    val tokenHits = Ivf.searchDF(assignedTokens, centroids, qTokens, tokenK, nprobe, dedup = true)
    val cand = tokenHits
      .select(expr(s"qid DIV $PackShift").as("qid"), col("id").as("tok_id"))
      .join(docTokens.select("tok_id", "doc_id"), "tok_id")
      .select(col("qid"), col("doc_id").as("id")).distinct()
    rescore(cand, docs, queries, k)
  }

  /** (qid, qpos) packing for [[searchTwoStageIvf]]'s stage-1 id space:
    * queries of up to one million tokens, qids up to ~9.2e12. */
  private val PackShift = 1000000L
  private val MaxPackableQid = Long.MaxValue / PackShift

  private def rescore(cand: DataFrame, docs: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val rescored = cand.join(docs.filter(size(col("vectors")) > 0), "id")
      .join(broadcast(queries.filter(size(col("qvecs")) > 0)), "qid")
      .select(col("qid"), col("id"), scoreGuarded.as("score"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("id"))
    rescored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
