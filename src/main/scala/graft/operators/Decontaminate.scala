package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import Staging.Stageable

/** Benchmark decontamination — flag corpus documents that share n-gram
  * shingles with an evaluation set, the standard pre-training hygiene step
  * (n-gram overlap decontamination as published for GPT-3/PaLM training
  * corpora; no reference analogue — the reference stops at relational
  * navigation).
  *
  * Scale shape: the benchmark side is SMALL by nature (eval suites are
  * thousands of documents, the corpus is billions), so its distinct
  * shingle set broadcasts — the 100 TB corpus is scanned once, shingles
  * explode map-side into a broadcast hash join, and the per-document
  * overlap count partial-aggregates before the only shuffle (8-byte doc
  * ids + counts). Nothing corpus-sized ever shuffles on a string key.
  */
object Decontaminate {

  /** Per-document overlap with the benchmark shingle set:
    * (idCol, overlap = #distinct shared n-gram shingles,
    * contaminated = overlap ≥ minOverlap). Every input document appears
    * exactly once; zero-overlap documents report overlap = 0.
    */
  def flagContaminated(docs: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 3,
      minOverlap: Int = 2): DataFrame = {
    // corpus side stages tokens/shingles through the persisted projection
    // (Dedup.shingleFrame) — the hot-path staging rule: an inline
    // shingle expression would re-run the tokenizer per shingle index
    val docSh = Dedup.shingleFrame(docs, idCol, textCol, n)
      .select(col("id").as(idCol), explode(col("sh")).as("shingle"))
    // this persist is a staging BARRIER, not a reuse cache: without it
    // CollapseProject inlines the tokenizer into the shingle lambda and
    // re-runs it per shingle index (O(len²) per doc). Registered with
    // Staging, so the harness releases it after the consuming action.
    val benchSh = benchmark
      .select(Dedup.tokens(col(benchTextCol)).as("toks"))
      .stagePersist()
      .select(explode(Dedup.shinglesFromTokens(col("toks"), n)).as("shingle"))
      .distinct()
    // doc shingles are distinct per doc (Dedup.shingles), so the join hits
    // each shared shingle once and count(*) IS the distinct-overlap count
    val overlap = docSh.join(broadcast(benchSh), "shingle")
      .groupBy(idCol).agg(count(lit(1)).as("overlap"))
    docs.select(col(idCol))
      .join(overlap, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("overlap"), lit(0L)).as("overlap"),
        (coalesce(col("overlap"), lit(0L)) >= minOverlap).as("contaminated"))
  }
}
