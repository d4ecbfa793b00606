package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training and application at corpus scale
  * (Sennrich, Haddow & Birch 2016, arXiv:1508.07909 — the subword
  * tokenizer-training step of every modern LLM data pipeline; no
  * reference analogue, the reference stops at relational navigation).
  *
  * Scale shape — the whole point of the construction: the corpus is
  * scanned ONCE into a word-frequency table (Heaps-law sized: ~10⁷
  * distinct words for a 10¹² -token web corpus), and every merge
  * iteration runs on that table alone. Per merge: one partial-aggregating
  * pair-count groupBy (the shuffle carries (symbol-pair, partial count)
  * rows, bounded by distinct pairs, not corpus tokens), one 1-row
  * argmax collect, and one per-row array fold applying the winning merge
  * — guarded by a cheap `array_contains` pre-test so only words that can
  * change pay the fold. Nothing corpus-sized is ever touched again, and
  * nothing larger than one (pair, count) row ever reaches the driver.
  */
object Bpe {

  /** End-of-word marker symbol (separate trailing symbol, as published). */
  val EOW = "</w>"

  /** (word, n) frequency table — the one corpus scan. */
  def wordCounts(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(Dedup.tokens(textCol)).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Initial symbol sequence of a word: its characters + [[EOW]]. */
  def symbolsOf(word: Column): Column =
    concat(split(word, ""), array(lit(EOW)))

  /** Adjacent-pair occurrence counts over a (n, syms) frame, weighted by
    * word frequency: (l, r, n_occ). One map-side transform + one
    * partial-aggregating groupBy. */
  def pairCountsFrom(symFrame: DataFrame): DataFrame =
    symFrame
      .select(col("n"), explode(transform(
        slice(col("syms"), lit(1), size(col("syms")) - 1),
        (s, i) => struct(s.as("l"), element_at(col("syms"), i + 2).as("r"))))
        .as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("n")).as("n_occ"))

  /** Level-0 pair statistics straight off a corpus — the first
    * iteration's candidate table (and the SQL-expressible gate surface
    * for the trainer's core aggregation). */
  def pairCounts(docs: DataFrame, textCol: Column): DataFrame =
    pairCountsFrom(wordCounts(docs, textCol)
      .select(col("n"), symbolsOf(col("word")).as("syms")))

  /** One learned merge. `rank` is 0-based application order. */
  final case class Merge(rank: Int, left: String, right: String,
      merged: String, nOcc: Long)

  /** Greedy left-to-right application of ONE merge to a symbol array —
    * the published semantics ("aaa" under (a,a) → ["aa","a"]). A pure
    * fold; the `array_contains` guard keeps unaffected rows at one
    * cheap scan each. */
  private def applyMerge(syms: Column, l: String, r: String, m: String): Column = {
    val fold = aggregate(syms,
      array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(l) && s === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(m))))
          .otherwise(concat(acc, array(s))))
    when(array_contains(syms, l) && array_contains(syms, r), fold)
      .otherwise(syms)
  }

  /** Train `numMerges` merges. Ties break deterministically by
    * (count desc, left asc, right asc); training stops early when the
    * best pair occurs once (merging it cannot compress anything else).
    * The returned table is driver-sized by construction (one row per
    * merge — this IS the tokenizer artifact that ships). */
  def train(docs: DataFrame, textCol: Column, numMerges: Int): Seq[Merge] = {
    // localCheckpoint, not persist: it CUTS LINEAGE, so every iteration's
    // plan is one projection over a LogicalRDD. A persist-based loop keeps
    // the full nested logical plan — by merge 30 the accumulated fold
    // expressions make plan-string generation (fired per job by the
    // listener bus) the dominant cost (measured: the 5k-doc ladder tier
    // sat minutes in generateTreeString before this fix).
    var syms = wordCounts(docs, textCol)
      .select(col("n"), symbolsOf(col("word")).as("syms"))
      .localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val top = pairCountsFrom(syms)
        .orderBy(col("n_occ").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < 2L) done = true
      else {
        val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        val m = l + r
        out += Merge(rank, l, r, m, n)
        // eager: materializes from the parent checkpoint, then the parent
        // blocks become unreferenced and GC-evictable
        syms = syms
          .select(col("n"), applyMerge(col("syms"), l, r, m).as("syms"))
          .localCheckpoint()
        rank += 1
      }
    }
    out.toSeq
  }

  /** Batched trainer — the production-vocabulary path. A 32-50k-merge
    * vocabulary at [[train]]'s 2 driver-scheduled jobs per merge is ~10⁵
    * sequential jobs; here each ROUND recounts once, takes the top
    * `batchK` candidates, and applies the maximal rank-ordered
    * NON-INTERACTING prefix subset in one projection chain — so the
    * per-merge cost amortizes to (2 jobs)/(accepted per round).
    *
    * Non-interacting = no symbol (left, right, or product) shared with a
    * merge already accepted this round. Disjoint merges commute exactly:
    * replacing l,r → lr can neither destroy nor create an adjacency of a
    * pair that shares no symbol with it, so every accepted candidate's
    * count is still exact when it applies. The ONE divergence from the
    * sequential trainer (documented, spec-pinned): a pair CREATED by this
    * round's merges (its product chaining with a neighbor) only becomes a
    * candidate next round — a corpus where a chained pair would outrank a
    * later same-round candidate learns the same merges in a different
    * order. On corpora whose top-K candidates are pairwise disjoint and
    * un-chained the sequence is IDENTICAL (spec-pinned), and `batchK = 1`
    * degenerates to [[train]] exactly.
    */
  def trainBatched(docs: DataFrame, textCol: Column, numMerges: Int,
      batchK: Int = 16): Seq[Merge] =
    trainBatchedRounds(docs, textCol, numMerges, batchK)._1

  /** [[trainBatched]] plus the number of recount rounds it ran — the
    * scale harness logs it to prove the per-merge job amortization. */
  private[graft] def trainBatchedRounds(docs: DataFrame, textCol: Column,
      numMerges: Int, batchK: Int = 16): (Seq[Merge], Int) = {
    var syms = wordCounts(docs, textCol)
      .select(col("n"), symbolsOf(col("word")).as("syms"))
      .localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rounds = 0
    var done = false
    while (out.size < numMerges && !done) {
      val want = math.min(batchK, numMerges - out.size)
      val top = pairCountsFrom(syms)
        .orderBy(col("n_occ").desc, col("l"), col("r"))
        .limit(want).collect()
        .filter(_.getLong(2) >= 2L)
      if (top.isEmpty) done = true
      else {
        rounds += 1
        val used = scala.collection.mutable.Set.empty[String]
        val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        top.foreach { row =>
          val (l, r) = (row.getString(0), row.getString(1))
          if (accepted.size < want && !used(l) && !used(r) && !used(l + r)) {
            accepted += ((l, r, row.getLong(2)))
            used += l; used += r; used += (l + r)
          }
        }
        accepted.foreach { case (l, r, n) =>
          out += Merge(out.size, l, r, l + r, n)
        }
        // one projection PER accepted merge (chained selects — nesting the
        // folds as one expression would blow up 4^K; CollapseProject keeps
        // its hands off non-cheap fold lambdas), one lineage cut per round
        accepted.foreach { case (l, r, _) =>
          syms = syms.select(col("n"), applyMerge(col("syms"), l, r, l + r).as("syms"))
        }
        syms = syms.localCheckpoint()
      }
    }
    (out.toSeq, rounds)
  }

  /** Segment a word table with a learned merge list: merges fold in rank
    * order over the DISTINCT-word frame (vocabulary-sized work — the
    * corpus is never re-folded; callers join documents' words to the
    * segmentation). Folds apply in batches of `batch` projections with a
    * checkpoint between batches, so plan depth and generated-code size
    * stay bounded at any merge count (the janino lesson: never let a
    * driver-sized list inline into one unbounded codegen unit). */
  def segmentWords(words: DataFrame, wordCol: String, merges: Seq[Merge],
      batch: Int = 8): DataFrame = {
    var df = words.select(col(wordCol).as("word"), symbolsOf(col(wordCol)).as("syms"))
    merges.sortBy(_.rank).grouped(batch).foreach { group =>
      group.foreach { mg =>
        df = df.select(col("word"),
          applyMerge(col("syms"), mg.left, mg.right, mg.merged).as("syms"))
      }
      df = df.localCheckpoint(eager = false)
    }
    df.select(col("word"), col("syms").as("subwords"))
  }

  /** Per-document token count under a learned BPE vocabulary — the real
    * form of `TextAnalysis.bpeTokenCount`'s heuristic: distinct words
    * segment once (vocabulary-sized), documents join their words against
    * the (word → |subwords|) map. Output: (docs.*, n_bpe). */
  def tokenCount(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val occ = docs
      .select(col(idCol), explode(Dedup.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
    val seg = segmentWords(occ.select("word").distinct(), "word", merges)
      .select(col("word"), size(col("subwords")).cast("long").as("n_sub"))
    val counted = occ.join(seg, Seq("word"))
      .groupBy(idCol).agg(sum(col("n_sub")).as("n_bpe"))
    // docs whose text tokenizes to zero words have no occ rows — left-join
    // back so every input doc appears, with n_bpe = 0
    docs.select(col(idCol))
      .join(counted, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_bpe"), lit(0L)).as("n_bpe"))
  }
}
