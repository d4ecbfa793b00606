package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequence packing — the batch-construction step of an LLM training
  * pipeline: concatenate documents into fixed token-budget bins so
  * training sequences waste no padding.
  *
  * Distributed shape: a GLOBAL greedy pack would be a total order over
  * the corpus (one sort, one worker finishing the tail), so packing is
  * SHARD-LOCAL, which is how production packers actually run — each
  * worker packs its own shard and a bin never crosses shards. The shard
  * is content-addressed (`fingerprint % shards`, like every Sampling
  * decision: stable under repartitioning/retries), the in-shard order is
  * (fingerprint, id) — deterministic — and the bin index is the running
  * token sum before the document, integer-divided by the budget. A
  * document that crosses a budget boundary belongs to the bin its first
  * token lands in (standard pack-then-truncate semantics; bins overflow
  * by at most one document, they are never left short).
  *
  * Scale: the per-shard window is a running UNBOUNDED PRECEDING sum over
  * a sort — Spark evaluates it streamingly per partition (no per-key
  * buffering); shards = O(cluster parallelism) and each holds corpus/shards
  * rows. Everything is integer arithmetic on a 64-bit content hash, so
  * the DuckDB oracle replicates it bit-for-bit.
  */
object Packing {

  /** The global bin id: the in-shard bin index INTERLEAVED by shard.
    * `binIdx * shards + shard` is injective for ANY bin count — shard
    * occupies the residue class mod `shards`, so two shards can never
    * produce the same id no matter how many bins either holds (a
    * fixed-width split like `shard * 1e6 + binIdx` aliases once a shard
    * exceeds its width — guaranteed at 100 TB). Overflow would need a
    * shard's running token sum to reach Long.MaxValue/shards, at which
    * point the cumsum itself has already overflowed — no reachable corpus.
    */
  private[graft] def binId(shard: Long, binIdx: Long, shards: Int): Long =
    binIdx * shards + shard

  /** Assign every document to (shard, bin, pos): `bin` is globally unique
    * (see [[binId]] — the plan inlines the same arithmetic), `pos` is the
    * document's token offset inside its shard's running stream.
    */
  def packByBudget(docs: DataFrame, idCol: String, textCol: String,
      budget: Int = 2048, shards: Int = 32): DataFrame = {
    require(budget > 0 && shards > 0)
    val base = docs.select(
      col(idCol).as("id"),
      TextAnalysis.fingerprint(col(textCol)).as("fp"),
      TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
    val shard = pmod(col("fp"), lit(shards.toLong))
    // explicit ROWS frame: Spark's default is RANGE (peer rows would share
    // a cum), which only coincides with the oracle's ROWS frame because the
    // (fp, id) order key is unique — make the intended semantics literal
    val w = Window.partitionBy(col("shard")).orderBy(col("fp"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.withColumn("shard", shard)
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("id").as(idCol), col("shard"), col("n_tokens"),
        (col("cum") - col("n_tokens")).as("pos"),
        // binId(shard, (cum - n_tokens) div budget, shards), inlined
        (expr(s"((cum - n_tokens) div ${budget}L) * ${shards}L") +
          col("shard")).as("bin"))
  }

  /** Column-general packing over an arbitrary PLAN frame — the form the
    * training-set export composes, where one document yields several rows
    * (epoch copies) so [[packByBudget]]'s (fingerprint, id) order key is
    * not unique and the fingerprint/token columns already exist upstream.
    * Same semantics: shard = fp mod `shards` (a copy packs in its
    * document's shard — bins never cross shards by construction), in-shard
    * order = `orderKeys` (must be unique within a shard or the prefix sums
    * are ambiguous), `pos` = running token sum before the row, `bin` =
    * the shard-interleaved [[binId]]. Appends (shard, pos, bin) to the
    * input columns.
    */
  def packPlan(df: DataFrame, fp: Column, orderKeys: Seq[Column],
      tokens: Column, budget: Int, shards: Int): DataFrame = {
    require(budget > 0 && shards > 0 && orderKeys.nonEmpty)
    require(Seq("shard", "pos", "bin", "__tok", "__cum")
        .forall(c => !df.columns.contains(c)),
      "input already carries a packing column — rename before packPlan")
    val w = Window.partitionBy(col("shard")).orderBy(orderKeys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", pmod(fp, lit(shards.toLong)))
      .withColumn("__tok", tokens.cast("long"))
      .withColumn("__cum", sum(col("__tok")).over(w))
      .withColumn("pos", col("__cum") - col("__tok"))
      .withColumn("bin",
        expr(s"(pos div ${budget}L) * ${shards}L") + col("shard"))
      .drop("__tok", "__cum")
  }
}
