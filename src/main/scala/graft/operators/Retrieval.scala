package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Staging.Stageable

/** Ranked lexical retrieval over a document corpus — BM25 (Robertson &
  * Zaragoza 2009, "The Probabilistic Relevance Framework: BM25 and
  * Beyond") with the Okapi saturation form. In a training-data pipeline
  * this is the targeted-curation / retrieval-side decontamination
  * primitive: given benchmark queries (or a curator's term list), pull
  * the corpus documents that best match so they can be audited, held out,
  * or up-weighted — the lexical complement of the embedding kNN family in
  * [[Similarity]].
  *
  * Scoring. For query term t and document d with term frequency tf,
  * document length dl and corpus stats (N docs, avgdl):
  *
  *   idf(t)    = (N − df(t) + 0.5) / (df(t) + 0.5)
  *   sat(t, d) = tf·(k1+1) / (tf + k1·((1−b) + b·dl/avgdl))
  *   score(d)  = Σ_t idf(t) · sat(t, d)
  *
  * The idf is the RATIONAL (un-logged) Robertson–Sparck-Jones form — the
  * same libm-avoidance rule as [[TextAnalysis.topKeywords]]'s linear idf
  * and [[LanguageModel]]'s ratio scores: `ln` would hang cross-engine
  * hash equality on libm ulps, while one IEEE division replays exactly in
  * ANSI SQL. Un-logging idf changes absolute scores but is monotone in
  * df, so single-term rankings are identical and multi-term rankings
  * sharpen the rare-term preference — acceptable for a curation tool
  * whose output is a ranked audit list, and stated here as the contract.
  *
  * Determinism. Per-term contributions are quantized to integer units of
  * 1e-9 with `floor` (the [[LanguageModel]] rule) and summed as longs, so
  * the document score is independent of term order and partition/merge
  * order; ranking ties break on ascending document id.
  *
  * Scale shape (100 TB corpus, q query terms, top k):
  *   - Per-document tf/dl are MAP-SIDE array scans over the tokenized
  *     text (`filter(tokens, _ = t)` per term) — no (doc, token) explode,
  *     no shuffle; the staged one-row-per-doc frame feeds both the stats
  *     aggregate and the scoring pass (Staging rule: the corpus tokenizes
  *     once).
  *   - Corpus stats (N, Σdl, df per term) are ONE partial aggregate to a
  *     single row, broadcast back via crossJoin.
  *   - Top-k is `orderBy(...).limit(k)` — Spark plans TakeOrderedAndProject
  *     (per-partition heaps + one k-row driver merge), never a global sort.
  *   - Nothing else shuffles: the whole query is two passes over the scan
  *     and one k-row result.
  */
object Retrieval {

  /** Top-k documents by BM25 over `terms`. Output:
    * (doc_id, dl, score, rank) ordered by rank; `score` is the quantized
    * sum replayed to a double (su / 1e9), `rank` dense from 1 with ties
    * broken on ascending id.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    require(terms.size <= 64,
      s"bm25TopK is a per-row term scan — ${terms.size} terms would " +
        "better run as a join against an inverted index")
    require(k >= 1, s"k must be positive, got $k")
    val toks = TextAnalysis.tokens(col(textCol))
    val tfCols = terms.indices.map { i =>
      size(filter(toks, x => x === lit(terms(i)))).cast("long").as(s"tf_$i")
    }
    val dlCol = size(filter(toks, x => x =!= lit(""))).cast("long").as("dl")
    // one row per doc: id, tf per term, dl — staged so the stats pass and
    // the scoring pass tokenize the corpus ONCE
    val base = Staging.stage(docs.select(
      (col(idCol).as("doc_id") +: tfCols :+ dlCol): _*))
    val statCols = count(lit(1)).as("n_docs") +: sum(col("dl")).as("t_len") +:
      terms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0L, 1L).otherwise(0L)).as(s"df_$i"))
    val stats = base.agg(statCols.head, statCols.tail: _*)
    // per-term contribution, quantized; literal arithmetic mirrored
    // operation-for-operation by the SQL oracle (IEEE ops only, no libm)
    def contrib(i: Int): Column = {
      val tf = col(s"tf_$i").cast("double")
      val df = col(s"df_$i").cast("double")
      val n = col("n_docs").cast("double")
      val dl = col("dl").cast("double")
      val tLen = col("t_len").cast("double")
      val idf = (n - df + lit(0.5)) / (df + lit(0.5))
      val sat = tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * (dl * n / tLen)))
      floor(idf * sat * lit(1e9d)).cast("long")
    }
    val su = terms.indices.map(contrib).reduce(_ + _)
    val top = base.crossJoin(broadcast(stats))
      .select(col("doc_id"), col("dl"), su.as("su"))
      .orderBy(col("su").desc, col("doc_id"))
      .limit(k)
    // rank over the bounded k-row result only (single-partition window on
    // ≤ k rows — never on the corpus)
    top.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("su").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("dl"),
        (col("su").cast("double") / lit(1e9d)).as("score"), col("rank"))
      .orderBy("rank")
  }
}
