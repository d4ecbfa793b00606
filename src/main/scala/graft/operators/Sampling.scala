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
    df.filter(uniformBucket(fp) < (rateCol * Buckets).cast("long"))
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
  def assignSplit(fp: Column, trainFrac: Double, valFrac: Double): Column = {
    val b = uniformBucket(fp)
    val tCut = (trainFrac * Buckets).toLong
    val vCut = ((trainFrac + valFrac) * Buckets).toLong
    when(b < tCut, "train").when(b < vCut, "val").otherwise("test")
  }
}
