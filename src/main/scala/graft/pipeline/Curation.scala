package graft.pipeline

import graft.dedup.Dedup
import graft.functions.vec
import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-data curation pipeline: the LLM-pipeline operators composed as
  * one declarative job graph (brief: "the operations a large-scale
  * training-data pipeline would need" working together, not in isolation):
  *
  *   documents → exact dedup (digest shuffle, keep-min-id)
  *             → NEAR-dup removal (MinHash+LSH pairs → connected
  *               components → keep the min-id representative per cluster)
  *             → SEMANTIC dedup (optional: SemDeDup over the docs'
  *               embeddings — k-means cells, intra-cell cosine pairs,
  *               same cluster→keep-min rule; catches same-content/
  *               different-words duplicates no text shingle sees)
  *             → LM perplexity band (optional: CCNet-style — drop both
  *               tails of the unigram cross-entropy distribution; the LM
  *               trains on the RAW input corpus so scores don't depend on
  *               which duplicates happened to be dropped upstream)
  *             → quality scoring + language id (single-pass kernels)
  *             → threshold/language filter
  *             → join embeddings (broadcast or shuffle by id)
  *             → curated corpus with vector norms
  *
  * Every batch stage is a Catalyst-optimized transform; the near-dup stage
  * is the one iterative step (label propagation is a fixpoint — no single
  * declarative plan expresses it), bounded by the tiny diameter of LSH
  * components. Consequence: with near-dup removal enabled, CALLING
  * [[Curation.curate]] eagerly runs the pair-generation and
  * label-propagation jobs (a fixpoint needs actions); only the remaining
  * stages of the returned DataFrame stay lazy. The deduped doc set stays
  * persisted for the returned plan's consumers and is reclaimed by the
  * ContextCleaner once the result is released.
  */
object Curation {

  def curate(
      docs: DataFrame,       // (doc_id, text, ...)
      embeddings: DataFrame, // (vec_id, embedding)
      minQuality: Double = 0.25,
      lang: String = "en",
      nearDupThreshold: Option[Double] = Some(0.8),
      // SemDeDup stage: (cosine-distance threshold); cells default to a
      // size that keeps intra-cell pair work tractable — callers at
      // corpus scale size semanticCells so cells stay 10-100k vectors
      semanticThreshold: Option[Double] = None,
      semanticCells: Int = 16,
      semanticSeeding: String = "kmeans||",
      // CCNet band: keep docs with lo <= cross-entropy <= hi (nats/token)
      ceBand: Option[(Double, Double)] = None,
      // quality-aware keepers: (id, score) — when present, the near-dup
      // and semantic stages keep each cluster's HIGHEST-scoring member
      // ([[graft.dedup.Dedup.keepBestPerGroup]]; ties by lowest id)
      // instead of the minimum id; must cover every doc_id — a grouped id
      // with no score FAILS LOUDLY (keepBestPerGroup raises), because an
      // unscored member that is neither keeper nor drop would silently
      // survive curation. The exact stage stays keep-min-id:
      // byte-identical text has identical score.
      keeperScores: Option[DataFrame] = None): DataFrame = {
    def dropsFrom(pairs: DataFrame): DataFrame = {
      val groups = Dedup.connectedComponents(pairs)
      keeperScores match {
        case Some(s) => Dedup.keepBestPerGroup(groups, s)
          .filter(col("keep") === 0L).select(col("id").as("doc_id"))
        case None => groups.filter(col("id") =!= col("group_id"))
          .select(col("id").as("doc_id"))
      }
    }
    val keeps = docs
      .groupBy(md5(col("text")).as("digest"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")

    // near-dups survive exact dedup (distinct digests, overlapping
    // shingles) — resolve pair evidence to clusters and keep one
    // representative per cluster (the min id, matching exact dedup's rule).
    // The deduped doc set is consumed by several branches (LSH pair
    // generation evaluates its input three times, plus the anti-join left
    // side) — persist it so the scan + digest shuffle + semi-join run
    // once; blocks are reclaimed by the ContextCleaner when the pipeline
    // result is released.
    val exactDedupedRaw = docs.join(keeps, Seq("doc_id"), "left_semi")
    val deduped = nearDupThreshold match {
      case Some(th) =>
        val exactDeduped = exactDedupedRaw.persist()
        val pairs = Dedup.minhashLshPairs(exactDeduped, threshold = th)
        exactDeduped.join(dropsFrom(pairs), Seq("doc_id"), "left_anti")
      case None =>
        // still multi-consumer when a semantic stage follows (embedding
        // join + the final anti-join both replay the digest shuffle)
        if (semanticThreshold.isDefined) exactDedupedRaw.persist()
        else exactDedupedRaw // single consumer: nothing to reuse
    }

    // semantic stage: only docs WITH an embedding can be semantically
    // deduped; docs lacking one pass through untouched (an inner-join
    // restriction here would silently drop them from the corpus)
    val semDeduped = semanticThreshold match {
      case Some(th) =>
        // the embedding join feeds k-means training (multi-pass), the
        // assignment pass, AND the connected-components edge
        // materialization (eager, inside this call) — persist it across
        // those consumers instead of re-running the upstream dedup plan
        // per pass; released as soon as the eager fixpoint is done
        val vecs = deduped.select(col("doc_id").as("id"))
          .join(embeddings.select(col("vec_id").as("id"), col("embedding").as("vector")),
            Seq("id"))
          .persist()
        val pairs = Dedup.semanticNearDupPairs(vecs, semanticCells, th,
          seeding = semanticSeeding)
          .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
        val drops = dropsFrom(pairs)
        vecs.unpersist(blocking = false) // CC checkpointed: lineage is cut
        deduped.join(drops, Seq("doc_id"), "left_anti")
      case None => deduped
    }

    // the LM trains on the RAW input docs, not the survivors: the model
    // is a corpus-level statistic and scoring must be reproducible
    // regardless of upstream dedup configuration (also what lets the
    // DuckDB oracle mirror it without replaying the dedup fixpoint)
    val banded = ceBand match {
      case Some((lo, hi)) =>
        val ce = TextAnalysis.lmCrossEntropy(docs)
          .select(col("doc_id"), col("cross_entropy"))
        semDeduped.join(ce, Seq("doc_id"))
          .filter(col("cross_entropy").between(lo, hi))
          .drop("cross_entropy")
      case None => semDeduped
    }

    val scored = banded
      .select(
        col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality"),
        TextAnalysis.langId(col("text")).as("pred_lang"))

    scored
      .filter(col("quality") >= minQuality && col("pred_lang") === lang)
      .join(embeddings.select(col("vec_id").as("doc_id"), col("embedding")), Seq("doc_id"))
      .select(col("doc_id"), col("quality"), col("pred_lang"),
        round(vec.norm(col("embedding").cast("array<double>")), 4).as("emb_norm"))
  }
}
