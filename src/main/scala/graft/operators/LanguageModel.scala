package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Staging.Stageable

/** Corpus-scale n-gram language-model scoring with STUPID BACKOFF
  * (Brants et al. 2007, "Large Language Models in Machine Translation") —
  * the LM-based quality filter of a training-data pipeline (CCNet,
  * Wenzek et al. 2020, filters Common Crawl by reference-LM perplexity;
  * Gopher/Rae et al. 2021 and Llama use the same family). A document whose
  * token transitions are atypical of the reference corpus (boilerplate,
  * lorem-ipsum, wrong language, OCR noise) scores LOW and gets filtered or
  * down-weighted before training.
  *
  * Two orders ship: the bigram chain below (the cheap screen) and the
  * TRIGRAM chain ([[lmScore3]]/[[scoreAgainst3]] — the order CCNet-class
  * reference filters train at; the bigram form passes word salad stitched
  * from common pairs, which the trigram chain backoff-penalizes).
  *
  * Model: bigram stupid backoff. For token w with predecessor u,
  *
  *   p(w | u) = c(u,w) / c(u)        when the bigram was observed,
  *            = 0.4 · c(w) / T       otherwise (backoff, fixed α = 0.4),
  *   p(w)     = c(w) / T             for a document's first token,
  *
  * where counts come from the REFERENCE corpus and T is its token total.
  * Stupid backoff deliberately uses unnormalized score ratios instead of
  * Kneser-Ney discounting — at corpus scale the counts are large enough
  * that the cheap estimator matches the expensive one (the paper's point),
  * and every ratio is ONE IEEE division, exactly replayable in ANSI SQL.
  *
  * The document score is the MEAN per-token score, not log-perplexity:
  * `log` would hang cross-engine equality on libm ulps (same reasoning as
  * `TextAnalysis.topKeywords`' linear idf), and the mean keeps the same
  * filtering ORDER for the thresholds a pipeline actually applies. To make
  * the mean independent of partition/merge order, per-token scores are
  * quantized to integer units of 1e-9 with `floor` (exact on doubles in
  * both engines — the `mixtureSample` trunc-cut precedent) and summed as
  * longs: `lm_score = Σ floor(p·1e9) / n_tok / 1e9`.
  *
  * Scale shape (100 TB corpus, reference possibly == corpus):
  *   - The corpus is tokenized ONCE; occurrences pre-aggregate to per-doc
  *     (prev, w) pair counts map-side, so the model joins see one row per
  *     DISTINCT per-doc transition, not one per token.
  *   - The unigram and bigram tables are vocabulary-sized (Heaps' law:
  *     sublinear in corpus size) and partial-agg'd; AQE broadcasts them
  *     when they fit, otherwise the joins are plain shuffled hash joins
  *     keyed on the token — no skew beyond natural token skew, which the
  *     pair-count pre-aggregation already bounds per document.
  *   - Nothing corpus-sized reaches the driver; T enters as a broadcast
  *     one-row aggregate.
  */
object LanguageModel {

  /** Per-document transition counts: one row per distinct (prev, w) pair
    * per document, weighted by its in-document count `k`. `prev` is NULL
    * for each document's first token; empty tokens (the `split` artifact
    * of an all-whitespace document) are dropped.
    */
  private def pairCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Tokens staged as a persisted ATTRIBUTE column (the Dedup.shingleFrame
    // house rule): the regex tokenizer runs exactly once per row, at
    // materialization. The r13 zip_with form passed the tokenizer
    // EXPRESSION into the zip's array arguments (evaluated 2×/row) and
    // nested interpreted HOFs (filter(zip_with(…)) — CodegenFallback,
    // allocation-heavy); both full-suite A/Bs measured it 0.55-0.65× vs
    // r12. This form is HOF-free: posexplode + element_at over the staged
    // array is whole-stage-codegen end to end, O(1) per token, and emits
    // the exact same (prev, w) multiset — prev = toks[i-1] (null ahead of
    // the first token), empty tokens (the `split` artifact of an
    // all-whitespace document) dropped.
    val staged = tokenFrame(docs, idCol, textCol)
    staged
      .select(col("_id"), col("_toks"), posexplode(col("_toks")))
      .filter(col("col") =!= "")
      .select(col("_id"),
        when(col("pos") > 0, element_at(col("_toks"), col("pos"))).as("prev"),
        col("col").as("w"))
      .groupBy(col("_id"), col("prev"), col("w"))
      .agg(count(lit(1)).as("k"))
  }

  /** Staged (_id, _toks) projection — one narrow persisted frame so the
    * tokenizer is computed once per row and every downstream reference is
    * a cheap attribute read (Staging's HOF rule).
    */
  private def tokenFrame(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("_id"),
        TextAnalysis.tokens(col(textCol)).as("_toks"))
      .stagePersist()

  /** Score `docs` against a stupid-backoff bigram LM trained on `ref`.
    * Output: one row per input document — (idCol, n_tok, lm_score),
    * lm_score ∈ [0, 1], 0 for empty documents and documents made entirely
    * of reference-unseen tokens. Deterministic under any partitioning.
    *
    * `minBigramCount` prunes bigrams the reference saw fewer times from
    * the model (they score through the backoff path instead) — the
    * standard count cutoff of corpus-scale LM training (Brants et al.
    * 2007 build their tables with exactly this knob). It exists because
    * the BIGRAM table is not Heaps-bounded the way the unigram table is:
    * distinct bigram types keep growing near-linearly in the long tail,
    * and at 10¹² training tokens the unpruned table outgrows what any
    * join side should carry. A cutoff of 2 typically drops the majority
    * of bigram TYPES (the df=1 tail) while keeping almost all bigram
    * MASS. Default 1 = no pruning (the oracle-gated configuration).
    */
  def scoreAgainst(docs: DataFrame, idCol: String, textCol: String,
      ref: DataFrame, refTextCol: String,
      minBigramCount: Long = 1L): DataFrame = {
    val refPairs = pairCounts(
      ref.select(monotonically_increasing_id().as("_rid"), col(refTextCol)),
      "_rid", refTextCol).stagePersist()
    scoreWithModel(docs, idCol, pairCounts(docs, idCol, textCol), refPairs,
      minBigramCount)
  }

  /** Self-trained form: the corpus is its own reference — the standard
    * boilerplate/outlier detector when no curated reference exists (a
    * document atypical of its OWN corpus is noise or template looping).
    * The corpus tokenizes ONCE: the staged per-doc pair frame serves both
    * the model aggregates and the scoring side.
    */
  def lmScore(docs: DataFrame, idCol: String, textCol: String,
      minBigramCount: Long = 1L): DataFrame = {
    val oc = pairCounts(docs, idCol, textCol).stagePersist()
    scoreWithModel(docs, idCol, oc, oc, minBigramCount)
  }

  /** Shared scoring plan: the model tables (unigram, total, bigram —
    * occurrence-weighted sums over the reference pair frame) joined onto
    * the per-doc pair counts, quantized mean per document.
    */
  private def scoreWithModel(docs: DataFrame, idCol: String,
      oc: DataFrame, refPairs: DataFrame, minBigramCount: Long): DataFrame = {
    require(minBigramCount >= 1L,
      s"minBigramCount must be >= 1, got $minBigramCount")
    val uni = refPairs.groupBy("w").agg(sum("k").as("cw"))
    val tot = refPairs.agg(sum("k").as("tt"))
    val big = refPairs.filter(col("prev").isNotNull)
      .groupBy("prev", "w").agg(sum("k").as("cbw"))
      .filter(col("cbw") >= minBigramCount)
    val cu = uni.select(col("w").as("prev"), col("cw").as("cu"))
    val scored = oc
      .join(uni, Seq("w"), "left")
      .join(cu, Seq("prev"), "left")
      .join(big, Seq("prev", "w"), "left")
      .crossJoin(broadcast(tot))
    // Unseen-in-reference words back off to c(w)=0 → p=0 (never null).
    val pUni = coalesce(col("cw"), lit(0L)).cast("double") / col("tt")
    val p = when(col("prev").isNull, pUni)
      .when(col("cbw").isNotNull, col("cbw").cast("double") / col("cu"))
      .otherwise(lit(0.4d) * pUni)
    quantizedMean(docs, idCol, scored, p)
  }

  // ---- order-3 backoff chain -------------------------------------------

  /** Per-document transition counts at ORDER 3: one row per distinct
    * (prev2, prev, w) triple per document, weighted by its in-document
    * count `k`. `prev` is NULL for a document's first token, `prev2` for
    * its first two — the same null-marking scheme as [[pairCounts]], one
    * order deeper. Still ONE tokenize pass; the staged frame is at most
    * one row per token occurrence (usually far fewer after the groupBy).
    */
  private def tripleCounts(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // same staged-attribute posexplode construction as [[pairCounts]]
    // (which see), one order deeper: prev = toks[i-1] (null for a
    // document's first token), prev2 = toks[i-2] (null for its first
    // two) — HOF-free, codegen'd, one tokenize per row.
    val staged = tokenFrame(docs, idCol, textCol)
    staged
      .select(col("_id"), col("_toks"), posexplode(col("_toks")))
      .filter(col("col") =!= "")
      .select(col("_id"),
        when(col("pos") > 1, element_at(col("_toks"), col("pos") - 1)).as("prev2"),
        when(col("pos") > 0, element_at(col("_toks"), col("pos"))).as("prev"),
        col("col").as("w"))
      .groupBy(col("_id"), col("prev2"), col("prev"), col("w"))
      .agg(count(lit(1)).as("k"))
  }

  /** Score `docs` against a TRIGRAM stupid-backoff LM trained on `ref` —
    * the order CCNet-class reference filters actually train at is ≥3;
    * the bigram form passes degenerate text stitched from common pairs
    * (word salad with plausible bigrams), which the trigram chain scores
    * through TWO backoff hops instead:
    *
    *   p(w | u,v) = c(u,v,w) / c(u,v)          trigram observed,
    *              = 0.4 · p(w | v)             otherwise,
    *   p(w | v)   = c(v,w) / c(v)              bigram observed,
    *              = 0.4 · c(w) / T             otherwise;
    *   a document's first token scores c(w)/T, its second p(w|v).
    *
    * Per-order count cutoffs (`minBigramCount`, `minTrigramCount`) prune
    * the NUMERATOR tables only — backoff denominators c(v) and c(u,v)
    * stay unpruned (pruning says which transitions the model trusts,
    * never what the contexts' masses were). The trigram table is the one
    * that is NOT Heaps-bounded (distinct trigram types grow near-linearly
    * in the long tail); its cutoff is the Brants table-size control and
    * the reason the knob exists per order. Everything else — quantized
    * 1e-9 integer-unit mean, broadcast one-row total, vocabulary-sized
    * partial-agg'd join sides — carries over from the bigram form
    * unchanged.
    */
  def scoreAgainst3(docs: DataFrame, idCol: String, textCol: String,
      ref: DataFrame, refTextCol: String,
      minBigramCount: Long = 1L, minTrigramCount: Long = 1L): DataFrame = {
    val refTriples = tripleCounts(
      ref.select(monotonically_increasing_id().as("_rid"), col(refTextCol)),
      "_rid", refTextCol).stagePersist()
    scoreWithModel3(docs, idCol, tripleCounts(docs, idCol, textCol),
      refTriples, minBigramCount, minTrigramCount)
  }

  /** Self-trained trigram form (corpus == reference): the staged per-doc
    * triple frame serves the model aggregates AND the scoring side — the
    * corpus still tokenizes exactly once.
    */
  def lmScore3(docs: DataFrame, idCol: String, textCol: String,
      minBigramCount: Long = 1L, minTrigramCount: Long = 1L): DataFrame = {
    val oc = tripleCounts(docs, idCol, textCol).stagePersist()
    scoreWithModel3(docs, idCol, oc, oc, minBigramCount, minTrigramCount)
  }

  private def scoreWithModel3(docs: DataFrame, idCol: String,
      oc: DataFrame, refTriples: DataFrame,
      minBigramCount: Long, minTrigramCount: Long): DataFrame = {
    require(minBigramCount >= 1L && minTrigramCount >= 1L,
      s"count cutoffs must be >= 1, got bigram=$minBigramCount trigram=$minTrigramCount")
    val uni = refTriples.groupBy("w").agg(sum("k").as("cw"))
    val tot = refTriples.agg(sum("k").as("tt"))
    val bigAll = refTriples.filter(col("prev").isNotNull)
      .groupBy("prev", "w").agg(sum("k").as("cbw"))
    val big = bigAll.filter(col("cbw") >= minBigramCount)
    val tri = refTriples.filter(col("prev2").isNotNull)
      .groupBy("prev2", "prev", "w").agg(sum("k").as("ctw"))
      .filter(col("ctw") >= minTrigramCount)
    val cu = uni.select(col("w").as("prev"), col("cw").as("cu"))
    // trigram CONTEXT mass c(u,v) joins from the UNPRUNED bigram table
    val cuv = bigAll.select(col("prev").as("prev2"), col("w").as("prev"),
      col("cbw").as("cuv"))
    val scored = oc
      .join(uni, Seq("w"), "left")
      .join(cu, Seq("prev"), "left")
      .join(big, Seq("prev", "w"), "left")
      .join(cuv, Seq("prev2", "prev"), "left")
      .join(tri, Seq("prev2", "prev", "w"), "left")
      .crossJoin(broadcast(tot))
    val pUni = coalesce(col("cw"), lit(0L)).cast("double") / col("tt")
    val pBi = when(col("cbw").isNotNull, col("cbw").cast("double") / col("cu"))
      .otherwise(lit(0.4d) * pUni)
    // a non-null ctw implies a non-null cuv (the reference saw the
    // context with every trigram it saw), so the division is total
    val p = when(col("prev").isNull, pUni)
      .when(col("prev2").isNull, pBi)
      .when(col("ctw").isNotNull, col("ctw").cast("double") / col("cuv"))
      .otherwise(lit(0.4d) * pBi)
    quantizedMean(docs, idCol, scored, p)
  }

  /** Shared quantized-mean tail: floor(p·1e9) integer units, exact long
    * sums per document (partition-order-free), left-joined back so
    * zero-token documents appear with n_tok = 0 (the Bpe.tokenCount rule).
    */
  private def quantizedMean(docs: DataFrame, idCol: String,
      scored: DataFrame, p: Column): DataFrame = {
    val agg = scored
      .select(col("_id"), col("k"),
        (col("k") * floor(p * lit(1e9d)).cast("long")).as("ku"))
      .groupBy("_id")
      .agg(sum("k").as("n_tok"), sum("ku").as("su"))
    docs.select(col(idCol))
      .join(agg.withColumnRenamed("_id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        when(col("su").isNull, lit(0.0d))
          .otherwise(col("su").cast("double") / col("n_tok") / lit(1e9d))
          .as("lm_score"))
  }

  // ---- CCNet perplexity bucketing ---------------------------------------

  /** CCNet's HEAD / MIDDLE / TAIL assignment (Wenzek et al. 2020 §4.4:
    * Common Crawl is cut into thirds per language by reference-LM
    * perplexity, and downstream recipes consume the buckets at different
    * rates — head-heavy for quality, a tail trickle for diversity).
    * `lm_score` is a FLUENCY score here (higher = more reference-like —
    * see the object doc's quantized mean), so head sits at the TOP of the
    * score axis: score ≥ tHead → 'head', ≥ tTail → 'middle', else 'tail'.
    * A pure codegen'd CASE that fuses into whatever plan carries the
    * score; the score doubles are bit-identical cross-engine (the
    * quantized-mean contract), so literal-threshold comparison is exact.
    *
    * Thresholds are EXPLICIT arguments, not derived inside the operator:
    * a production pipeline computes the cuts once (CCNet publishes
    * per-language threshold tables) and applies them map-side everywhere —
    * deriving per-run would hang a corpus-wide order statistic in front
    * of a per-row filter and make bucket membership depend on what else
    * shared the batch. [[bucketThresholds]] derives a pair when no
    * published cuts exist.
    */
  def perplexityBucket(score: Column, tTail: Double, tHead: Double): Column = {
    require(tTail <= tHead, s"tTail must be <= tHead, got $tTail > $tHead")
    when(score >= lit(tHead), lit("head"))
      .when(score >= lit(tTail), lit("middle"))
      .otherwise(lit("tail"))
  }

  /** Bucketed sampling over a scored frame: assign the CCNet bucket, then
    * a deterministic content-hash keep decision at that bucket's rate
    * (buckets missing from `rates` keep everything). Returns ALL rows
    * with (bucket, kept) so callers and the oracle can audit the
    * decision; filter on `kept` for the sampled corpus. The gate is the
    * same scrambled-fingerprint bucket every sampler and split uses —
    * fed the canonical fingerprint, a re-encoded re-crawl of a document
    * makes the IDENTICAL keep decision.
    */
  def bucketSample(scored: DataFrame, scoreCol: Column, fp: Column,
      tTail: Double, tHead: Double, rates: Map[String, Double]): DataFrame = {
    val unknown = rates.keySet -- Set("head", "middle", "tail")
    require(unknown.isEmpty, s"unknown bucket names: $unknown")
    val bucket = perplexityBucket(scoreCol, tTail, tHead)
    val rate = when(bucket === "head", lit(rates.getOrElse("head", 1.0d)))
      .when(bucket === "middle", lit(rates.getOrElse("middle", 1.0d)))
      .otherwise(lit(rates.getOrElse("tail", 1.0d)))
    scored.withColumn("bucket", bucket)
      .withColumn("kept", Sampling.keepByRateCol(fp, rate))
  }

  /** Derive (tTail, tHead) as the score's tercile cut points via ONE
    * `approx_percentile` aggregate — a partial-aggregated sketch, no sort,
    * no data shuffle. Approximate by design: the cuts move membership only
    * within the sketch's rank error, which a head/middle/tail recipe
    * tolerates (CCNet's own cuts come from a corpus SAMPLE). Not under any
    * oracle hash — the gate key pins the ASSIGNMENT algebra with explicit
    * thresholds instead.
    */
  def bucketThresholds(scored: DataFrame, scoreCol: Column,
      accuracy: Int = 10000): (Double, Double) = {
    val cuts = scored
      .agg(percentile_approx(scoreCol,
        array(lit(1.0d / 3), lit(2.0d / 3)), lit(accuracy)))
      .head().getSeq[Double](0)
    (cuts(0), cuts(1))
  }
}
