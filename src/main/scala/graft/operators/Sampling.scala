package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` is seed-dependent on PARTITIONING: adding an executor,
  * re-reading with a different split size, or AQE re-coalescing changes
  * which rows survive — unacceptable when a sample must be reproducible
  * across reruns of a 100 TB job. Content-hash sampling decides per ROW
  * from the row's own bytes, so membership is a pure function of the data:
  * stable under repartitioning, retries, and topology, and any worker can
  * re-derive it. The decision is a codegen'd column expression — no
  * shuffle, fuses into the scan.
  */
object Sampling {

  private val Scramble = 2654435761L // Knuth multiplicative-hash constant
  private val Buckets = 1000000L

  /** Pseudo-uniform value in [0, 1e6) derived from a content fingerprint
    * (`TextAnalysis.fingerprint` — rolling hash < 1e9+7, so the product
    * stays well inside Long range). The multiplicative scramble decorrelates
    * the sampling decision from fingerprint ORDER, while staying exactly
    * replicable in ANSI SQL for the oracle.
    */
  def uniformBucket(fp: Column): Column = pmod(fp * lit(Scramble), lit(Buckets))

  /** Keep-predicate sampling `rate` of rows by content hash. */
  def keepByRate(fp: Column, rate: Double): Column =
    uniformBucket(fp) < lit((rate * Buckets).toLong)

  /** Keep-flag with a per-row rate COLUMN (stratified and bucketed
    * callers build the rate by CASE over their stratum). The stratified
    * filter routes through it so every sampler agrees on the cutoff
    * arithmetic: `floor(rate · 1e6)` exactly, in-engine.
    */
  def keepByRateCol(fp: Column, rate: Column): Column =
    uniformBucket(fp) < (rate * Buckets).cast("long")

  /** EXACTLY k rows, deterministically: the k smallest (scrambled-hash,
    * tiebreak) pairs. Rate sampling can't hit a row budget ("exactly 1M
    * documents for this mixture") — ordering by a content-derived key and
    * cutting at k can, and stays reproducible across topologies like every
    * other decision here. Spark plans ORDER BY+LIMIT as per-partition
    * top-k + merge (TakeOrderedAndProject) for small k and a range-
    * partitioned sort + GlobalLimit beyond the top-k fallback threshold —
    * both scale; nothing quadratic, no full collect.
    */
  def exactKByHash(df: DataFrame, fp: Column, tiebreak: Column, k: Int): DataFrame =
    df.orderBy(uniformBucket(fp), tiebreak).limit(k)

  /** Stratified deterministic sample: per-stratum rates (e.g. by language
    * or source), `defaultRate` for unlisted strata. The typical mixture-
    * weighting step of a corpus build — downsample over-represented
    * strata, keep the rest. Returns the kept rows.
    */
  def stratifiedSample(df: DataFrame, fp: Column, strata: Column,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rateCol = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(strata === lit(k), lit(r)).otherwise(acc)
    }
    df.filter(keepByRateCol(fp, rateCol))
  }

  /** Deterministic train/val/test assignment by content hash — every
    * pipeline's final fan-out. Same contract as the samplers: membership
    * is a pure function of the row's bytes (a document lands in the same
    * split on every rerun, cluster, and data layout — and a near-dup's
    * EXACT copy can never straddle splits because identical text ⇒
    * identical fingerprint ⇒ identical split). Fractions are bucket
    * cutoffs on the scrambled hash: [0, train) → "train",
    * [train, train+val) → "val", rest → "test". No shuffle — a codegen'd
    * CASE that fuses into the scan.
    */
  def assignSplit(fp: Column, trainFrac: Double, valFrac: Double): Column =
    splitFromBucket(uniformBucket(fp), trainFrac, valFrac)

  /** The shared cutoff CASE: both split forms must agree on the fraction
    * arithmetic or row-keyed and group-keyed splits of the same fractions
    * would diverge.
    */
  private def splitFromBucket(b: Column, trainFrac: Double, valFrac: Double): Column = {
    val tCut = (trainFrac * Buckets).toLong
    val vCut = ((trainFrac + valFrac) * Buckets).toLong
    when(b < tCut, "train").when(b < vCut, "val").otherwise("test")
  }

  /** Bucket from an arbitrary long KEY (not a bounded fingerprint): the
    * key is reduced mod 1e9+7 FIRST so the scramble product stays inside
    * i64 for any input — `uniformBucket` would overflow past ids of
    * ~3.4e9, i.e. any real corpus. Same [0, 1e6) range and SQL
    * replicability as `uniformBucket`.
    */
  def uniformBucketKey(key: Column): Column =
    pmod(pmod(key, lit(1000000007L)) * lit(Scramble), lit(Buckets))

  /** LEAKAGE-SAFE split: assign train/val/test from a GROUP key (near-dup
    * cluster id, source domain, author …) instead of the row's own
    * content, so every member of a group lands in the SAME split.
    * Content-hash splitting (`assignSplit`) already pins exact copies
    * together (identical bytes ⇒ identical split), but NEAR-duplicates
    * have different bytes — a paraphrased document in train and its
    * sibling in test is evaluation leakage. Feed this the cluster column
    * of `Dedup.nearDupClusters` (or any grouping that encodes "these rows
    * share information") and the whole cluster moves as one unit.
    * Per-row codegen'd CASE on the group key — no shuffle beyond whatever
    * produced the key.
    */
  def assignSplitByGroup(groupKey: Column, trainFrac: Double, valFrac: Double): Column =
    splitFromBucket(uniformBucketKey(groupKey), trainFrac, valFrac)

  /** Per-group QUOTA: at most `k` rows per group, chosen by the
    * deterministic content-hash order — domain capping in a corpus build
    * ("no more than 10k pages per site", "500 problems per source"), the
    * long-tail-preserving alternative to rate-sampling a skewed group
    * column (a rate keeps 0.01% of the small domains too; a quota only
    * trims the heads). Selection is (scrambled hash, tiebreak) rank
    * within the group, so the kept subset is stable across reruns and
    * topology like every sampler here, and independent of the group's
    * size. Plans as one shuffle on the group key + a per-group
    * WindowGroupLimit (top-k pushed BEFORE the full sort); groups are
    * independent partitions — no global sort, skew bounded by the
    * largest single group's k-selection.
    */
  def groupQuota(df: DataFrame, group: Column, fp: Column, tiebreak: Column,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"quota must be positive, got $k")
    require(!df.columns.contains("__rank"),
      "input already has a __rank column — rename it before groupQuota")
    df.withColumn("__rank", row_number().over(
        Window.partitionBy(group).orderBy(uniformBucket(fp), tiebreak)))
      .filter(col("__rank") <= k)
      .drop("__rank")
  }

  /** Mixture sampling to TARGET OUTPUT PROPORTIONS — the corpus-weighting
    * step stated the way a data card states it: "the training mix is 50%
    * en, 12.5% each of de/es/fr/zh", not as per-stratum keep-rates.
    * Solves for the largest total T such that every stratum can supply
    * its share (T = min over strata of count_k / weight_k — the binding
    * stratum is kept whole, the rest are downsampled to match), then
    * keeps each stratum at rate_k = weight_k·T / count_k by the same
    * deterministic content-hash rule as every other sampler here.
    * Strata absent from `weights` are dropped.
    *
    * Fully declarative two-pass plan: pass 1 is a map-side-combined
    * count per stratum (tiny result), the binding minimum is a one-row
    * aggregate broadcast back over the rates, and pass 2 re-scans with a
    * broadcast hash semi-join on the (≤ strata-count row) rate table —
    * no driver collect, no full shuffle of the corpus.
    */
  def mixtureSample(df: DataFrame, fp: Column, strata: Column,
      weights: Map[String, Double]): DataFrame =
    mixtureByMeasure(df, fp, strata, weights,
      df.select(strata.as("_stratum")).groupBy("_stratum")
        .agg(count(lit(1)).cast("double").as("_n")))

  /** [[mixtureSample]] with proportions measured in TOKENS — the unit
    * data cards actually state ("the mix is 50% en BY TOKENS"). Document
    * counts mis-state a mixture whenever strata have different length
    * distributions (a verbose stratum at 12.5% of documents can be 30%
    * of tokens). Same solve with sum(tokens) as the stratum mass:
    * T = min_k(tokens_k / w_k), keep-rate_k = w_k·T / tokens_k, same
    * deterministic per-document content-hash rule. Rate-sampling
    * documents hits the token proportions in EXPECTATION — exact to
    * ~1/√docs-per-stratum since membership is hash-independent of
    * length, which at corpus scale is tighter than the weights are
    * specified; a hard per-stratum ceiling is [[tokenQuota]]'s job.
    */
  def mixtureByTokens(df: DataFrame, fp: Column, strata: Column,
      tokens: Column, weights: Map[String, Double]): DataFrame =
    mixtureByMeasure(df, fp, strata, weights,
      df.select(strata.as("_stratum"), tokens.cast("double").as("_m"))
        .groupBy("_stratum").agg(sum(col("_m")).as("_n")))

  /** Shared mixture solve over a per-stratum mass table `(_stratum, _n)`
    * — documents for [[mixtureSample]], token sums for
    * [[mixtureByTokens]]. Two-pass declarative plan as documented on
    * [[mixtureSample]].
    */
  private def mixtureByMeasure(df: DataFrame, fp: Column, strata: Column,
      weights: Map[String, Double], mass: DataFrame): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "mixture weights must be a non-empty map of positive fractions")
    import org.apache.spark.sql.functions.broadcast
    val weightCol = weights.foldLeft(lit(null).cast("double")) {
      case (acc, (k, w)) => when(col("_stratum") === lit(k), lit(w)).otherwise(acc)
    }
    val counts = mass.withColumn("_w", weightCol).filter(col("_w").isNotNull)
    // binding total: the stratum that runs out first caps the mixture.
    // The binding stratum's rate is mathematically exactly 1, but the
    // floating solve can land at 1−ulp (non-dyadic weights), and the
    // truncating cut would then silently drop ~1 per million of the
    // stratum the contract promises to keep WHOLE — clamp rate ≥ 1 to the
    // full bucket range (the oracle mirrors the same branch)
    val tMin = counts.agg(min(col("_n") / col("_w")).as("_t"))
    val rate = col("_w") * col("_t") / col("_n")
    val rates = counts.crossJoin(broadcast(tMin))
      .select(col("_stratum"),
        when(rate >= 1.0, lit(Buckets))
          .otherwise((rate * lit(Buckets.toDouble)).cast("long")).as("_cut"))
    df.join(broadcast(rates), strata === col("_stratum"), "inner")
      .filter(uniformBucket(fp) < col("_cut"))
      .drop("_stratum", "_cut")
  }

  /** Per-group TOKEN budget: greedily fill each group with documents in
    * the deterministic content-hash order until `budget` tokens are
    * reached — "at most 1B tokens per source", the token-denominated
    * sibling of [[groupQuota]]'s row cap. A document is kept iff the
    * budget was not already exhausted BEFORE it (greedy prefix fill:
    * the crossing document is included, so the overshoot is bounded by
    * one document and a group whose first document alone exceeds the
    * budget still contributes it — a hard `<= budget` cut would
    * silently emit nothing there). Selection is reproducible across
    * reruns and topology like every sampler here; `tiebreak` must be
    * unique within a group or ties make the prefix ambiguous.
    *
    * Plans as one shuffle on the group key + an in-partition sort for
    * the running-sum window — unlike [[groupQuota]] there is no
    * WindowGroupLimit short-circuit (the cutoff rank is data-dependent),
    * so the cost is the full sort of the LARGEST group. At 100 TB,
    * groups are sources/domains/languages (bounded cardinality each);
    * for a group so large its sort won't fit an executor, downsample
    * first with [[mixtureByTokens]]/[[keepByRate]] (expected-share) and
    * reserve the exact budget cut for the survivors.
    */
  def tokenQuota(df: DataFrame, group: Column, fp: Column, tiebreak: Column,
      tokens: Column, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0, s"token budget must be positive, got $budget")
    require(!df.columns.contains("__cum"),
      "input already has a __cum column — rename it before tokenQuota")
    df.withColumn("__cum", sum(tokens).over(
        Window.partitionBy(group).orderBy(uniformBucket(fp), tiebreak)))
      .filter(col("__cum") - tokens < budget)
      .drop("__cum")
  }

  // Affine remix constant for the EPOCH read-order key — a different odd
  // multiplier than `Scramble` so the training order is decorrelated from
  // the fractional-epoch keep decision (the Sharding shard⊥split rule).
  private val OrderScramble = 2246822519L // xxhash PRIME32_2

  /** Multi-EPOCH curriculum plan — the upsampling step of a training mix
    * ("2.5 epochs of books, 1 epoch of web"; Llama/GPT-3-style data cards
    * state repeat factors per source): every row is replicated
    * floor(e) times for its stratum's epoch factor e, plus one fractional
    * copy kept by content hash with probability e − floor(e), each copy
    * tagged with its `epoch` index and a deterministic `ord` read-order
    * key. Sorting the plan by `ord` interleaves sources and epochs
    * uniformly — the loader streams the plan in `ord` order and trains a
    * shuffled multi-epoch curriculum without a global runtime shuffle.
    *
    * Decisions are pure functions of (fingerprint, epoch): the fractional
    * copy survives iff `uniformBucket(fp + epoch)` clears the truncated
    * rate cut (the [[mixtureSample]] convention; the +epoch offset keeps
    * per-epoch decisions independent, and `fp < 1e9+7` keeps the scramble
    * product inside i64), and `ord = pmod((fp + epoch)·OrderScramble,
    * Buckets)` uses a DIFFERENT multiplier so read order never correlates
    * with the keep cut. Strata not named in `epochs` are dropped.
    *
    * Scale shape: per-row compute — a when-chain over the (tiny, constant)
    * epoch map, one ≤ ⌈e⌉-element sequence per row, explode, filter — no
    * shuffle, no driver involvement; output volume is Σ e_k · |stratum k|
    * by construction.
    */
  def epochPlan(df: DataFrame, fp: Column, strata: Column,
      epochs: Map[String, Double]): DataFrame = {
    require(epochs.nonEmpty && epochs.values.forall(_ > 0),
      "epoch factors must be a non-empty map of positive values")
    require(!df.columns.contains("epoch") && !df.columns.contains("ord"),
      "input already has an epoch/ord column — rename it before epochPlan")
    val eCol = epochs.foldLeft(lit(null).cast("double")) {
      case (acc, (k, e)) => when(strata === lit(k), lit(e)).otherwise(acc)
    }
    val nFull = floor(col("_e")).cast("long")
    val frac = col("_e") - floor(col("_e"))
    df.withColumn("_e", eCol).filter(col("_e").isNotNull)
      .withColumn("epoch", explode(sequence(lit(0L), nFull)))
      .filter(col("epoch") < nFull ||
        uniformBucket(fp + col("epoch")) <
          (frac * lit(Buckets.toDouble)).cast("long"))
      .withColumn("ord",
        pmod((fp + col("epoch")) * lit(OrderScramble), lit(Buckets)))
      .drop("_e")
  }
}
