package graft.queries

import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.operators.{Decontaminate, Dedup, Diff, Sampling, Sharding, Staging, TextAnalysis}
import graft.operators.Staging.Stageable

/** Corpus-lifecycle operators around the build itself: what to RE-process
  * (snapshot diff), how to WEIGHT it (mixture-to-target sampling), how to
  * SPLIT it without leakage (group-keyed split), what its vocabulary is
  * (top-k gram table), and how to SHIP it (deterministic shards +
  * verifiable manifest). No reference analogue — upstream stops at
  * relational navigation; these are the steps a 100 TB training-data
  * pipeline runs before and after everything in `ExtensionQueries`.
  *
  * All five are exactly SQL-expressible, so each gets a full-hash DuckDB
  * oracle (no gates needed): the samplers reuse the rolling-hash
  * fingerprint fold the oracle can replay, the diff is a relational full
  * outer join, and the manifest checksum is an order-independent bit_xor
  * both engines define identically.
  */
object PipelineQueries extends QueryModule {

  def queries: Map[String, Q] = Map(

    // Snapshot diff: prev = customer, next = a deterministically drifted
    // snapshot (updates: +10.00 acctbal on custkey%10=0; deletes:
    // custkey%17=3; inserts: custkey%50=7 re-keyed +1e6). The operator
    // reports churn only — added/removed/changed + the changed column set.
    "q_diff" -> { (s, dir) =>
      val t = new Tables(s, dir)
      val prev = t.customer
      val next = prev
        .filter(col("c_custkey") % 17 =!= 3)
        .withColumn("c_acctbal",
          when(col("c_custkey") % 10 === 0, col("c_acctbal") + 10.0)
            .otherwise(col("c_acctbal")))
        .unionByName(prev.filter(col("c_custkey") % 50 === 7)
          .withColumn("c_custkey", col("c_custkey") + 1000000L))
      Diff.snapshotDiff(prev, next, Seq("c_custkey")).orderBy("c_custkey")
    },

    // Mixture sampling to target OUTPUT proportions (50% en, 12.5% each
    // de/es/fr/zh): the binding stratum is kept whole, the rest
    // downsample to match, membership by content hash.
    "q_mixture" -> { (s, dir) =>
      val t = new Tables(s, dir)
      Sampling.mixtureSample(t.documents,
          TextAnalysis.fingerprint(col("text")), col("lang"),
          Map("en" -> 0.5, "de" -> 0.125, "es" -> 0.125,
            "fr" -> 0.125, "zh" -> 0.125))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // The same mixture measured in TOKENS — the unit data cards state.
    // On this fixture en is ~58% of tokens at ~44% of documents, so the
    // token solve genuinely differs from q_mixture's document solve
    // (en binds here; the doc-count mixture binds elsewhere).
    "q_mixture_tokens" -> { (s, dir) =>
      val t = new Tables(s, dir)
      Sampling.mixtureByTokens(t.documents,
          TextAnalysis.fingerprint(col("text")), col("lang"),
          TextAnalysis.tokenCount(col("text")),
          Map("en" -> 0.5, "de" -> 0.125, "es" -> 0.125,
            "fr" -> 0.125, "zh" -> 0.125))
        .select(col("doc_id"), col("lang"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        .orderBy("doc_id")
    },

    // Per-group TOKEN budget: greedy prefix fill of each language in
    // content-hash order until 2000 tokens (crossing doc included —
    // overshoot bounded by one document).
    "q_token_quota" -> { (s, dir) =>
      val t = new Tables(s, dir)
      Sampling.tokenQuota(t.documents, col("lang"),
          TextAnalysis.fingerprint(col("text")), col("doc_id"),
          TextAnalysis.tokenCount(col("text")), budget = 2000L)
        .select(col("doc_id"), col("lang"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        .orderBy("doc_id")
    },

    // Leakage-safe split: near-dup clusters move into train/val/test as
    // ONE unit (split keyed on the cluster id, not the row's own bytes),
    // so a paraphrased pair can never straddle the eval boundary.
    // Deterministic 50% slice: the key gates the split-on-clusters
    // COMPOSITION; the cluster build's own full-corpus cost and scale
    // behavior are q_dedup_clusters' and the SCALE.md ladder's job.
    "q_split_leakproof" -> { (s, dir) =>
      val t = new Tables(s, dir)
      Dedup.nearDupClusters(t.documents.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", n = 3, threshold = 0.2, minCommon = 2)
        .select(col("doc_id"), col("cluster"),
          Sampling.assignSplitByGroup(col("cluster"), 0.9, 0.05).as("split"))
        .orderBy("doc_id")
    },

    // Top-500 bigram vocabulary with occurrence + document frequency —
    // the tokenizer-training / df-cap-calibration table.
    "q_vocab" -> { (s, dir) =>
      val t = new Tables(s, dir)
      val toks = Staging.widen(t.documents)
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        .stagePersist()
      TextAnalysis.vocabulary(toks,
          Dedup.ngramsFromTokens(col("toks"), 2), col("doc_id"), 500)
        .orderBy(col("n_occ").desc, col("gram"))
    },

    // RELEASE capstone: the full corpus-release path as ONE declarative
    // plan — exact dedup → benchmark decontamination → per-source quota →
    // mixture to target lang proportions → leakage-safe split keyed on
    // the released set's near-dup clusters → per-(split, shard) release
    // manifest. Every stage is one of the engine's own oracle-checked
    // operators; the output is the tiny manifest a release process signs.
    // Deterministic 50% slice, same rationale as q_split_leakproof: the
    // key gates the six-stage COMPOSITION end-to-end; each stage's
    // full-corpus scale story lives with its own operator key + ladder.
    "q_release" -> { (s, dir) =>
      val t = new Tables(s, dir)
      // the release path operates on the CANONICAL text (NFC + whitespace
      // collapse): every content identity downstream — the exact-dedup
      // keep list, shingles, quota/mixture/split hashes, the shard
      // checksum — must treat a re-encoded re-crawl as the same document
      val docs = t.documents.filter(col("doc_id") % 2 === 0)
        .withColumn("text", TextAnalysis.normalizeText(col("text")))
      def fp = TextAnalysis.fingerprint(col("text"))
      val deduped = docs.join(
        Dedup.exact(docs, "doc_id", "text").select("doc_id"),
        Seq("doc_id"), "left_semi")
      val bench = docs.filter(col("doc_id") % 97 === 0)
      val flags = Decontaminate.flagContaminated(deduped, "doc_id", "text",
        bench, "text", n = 3, minOverlap = 2)
      val clean = deduped.join(
        flags.filter(!col("contaminated")).select("doc_id"),
        Seq("doc_id"), "left_semi")
      val quotaed = Sampling.groupQuota(clean, col("source"), fp, col("doc_id"), 20)
      // the released set feeds BOTH the cluster build (itself multi-pass)
      // and the final manifest — stage it, or the dedup→decontam→quota→
      // mixture prefix re-executes per consumer
      val mixed = Staging.stage(
        Sampling.mixtureSample(quotaed, fp, col("lang"),
            Map("en" -> 0.5, "de" -> 0.125, "es" -> 0.125,
              "fr" -> 0.125, "zh" -> 0.125))
          .select("doc_id", "text"))
      val clusters = Dedup.nearDupClusters(mixed, "doc_id", "text",
        n = 3, threshold = 0.2, minCommon = 2)
      mixed.join(clusters.select(col("doc_id"), col("cluster")), Seq("doc_id"))
        .select(
          Sampling.assignSplitByGroup(col("cluster"), 0.9, 0.05).as("split"),
          Sharding.assignShard(fp, 8).as("shard"),
          fp.as("_fp"), col("doc_id"))
        .groupBy("split", "shard")
        .agg(count(lit(1)).as("n_rows"), expr("bit_xor(_fp)").as("checksum"),
          min("doc_id").as("min_id"), max("doc_id").as("max_id"))
        .orderBy("split", "shard")
    },

    // Sharded-export manifest: 8 content-addressed shards (CANONICAL
    // fingerprint — a re-encoded copy lands in the same shard), each row
    // a (count, xor-checksum, id-range) a loader can verify.
    "q_shard" -> { (s, dir) =>
      val t = new Tables(s, dir)
      Sharding.manifest(t.documents,
          TextAnalysis.canonicalFingerprint(col("text")), col("doc_id"), 8)
        .orderBy("shard")
    },

    // Domain capping: at most 12 docs per source, hash-ordered — trims
    // the head of a skewed source distribution, keeps the tail whole.
    "q_quota" -> { (s, dir) =>
      val t = new Tables(s, dir)
      Sampling.groupQuota(t.documents, col("source"),
          TextAnalysis.fingerprint(col("text")), col("doc_id"), 12)
        .select("doc_id", "source")
        .orderBy("doc_id")
    },

    // Per-document top-3 keywords by linear tf·idf (bit-exact cross-
    // engine: one integer product, one double division). No toks staging:
    // tokens feed a plain explode (computed once per row, no HOF lambda),
    // and the operator's N count prunes the projection away entirely —
    // the operator stages only the (doc, token, tf) frame it reuses.
    "q_keywords" -> { (s, dir) =>
      val t = new Tables(s, dir)
      val toks = Staging.widen(t.documents)
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      TextAnalysis.topKeywords(toks, col("toks"), col("doc_id"), 3)
        .orderBy("doc_id", "rank")
    },

    // Token-window chunking with overlap (window 24, stride 16): the
    // RAG/indexing preparation step — boundary content always appears
    // whole in at least one chunk; zero-token documents emit none.
    "q_chunk" -> { (s, dir) =>
      val t = new Tables(s, dir)
      TextAnalysis.chunkByTokens(Staging.widen(t.documents),
          "doc_id", "text", window = 24, stride = 16)
        .orderBy("doc_id", "chunk_id")
    },

    // Multi-epoch curriculum plan: 1.5 epochs of en, 2 of de, 0.25 of zh
    // — full copies per floor(e), fractional copy by per-epoch content
    // hash, deterministic interleaved read-order key.
    "q_epoch_plan" -> { (s, dir) =>
      val t = new Tables(s, dir)
      Sampling.epochPlan(t.documents,
          TextAnalysis.fingerprint(col("text")), col("lang"),
          Map("en" -> 1.5, "de" -> 2.0, "zh" -> 0.25))
        .select("doc_id", "lang", "epoch", "ord")
        .orderBy("doc_id", "epoch")
    },

    // TRAINING-SET EXPORT capstone: the composition a data card implies
    // but no single key exercised end-to-end — token-proportion mixture →
    // multi-epoch curriculum plan → shard-local sequence packing of the
    // epoch COPIES (packPlan: copies order by the curriculum `ord` key;
    // a copy packs in its document's shard, so bins never cross shards
    // by construction) → per-shard release manifest (copy count, bin
    // count, token total, order-independent copy-identity checksum).
    // Canonical (NFC) fingerprints throughout, like every identity seam.
    "q_trainset" -> { (s, dir) =>
      val t = new Tables(s, dir)
      val base = t.documents
        .withColumn("text", TextAnalysis.normalizeText(col("text")))
        .select(col("doc_id"), col("lang"),
          TextAnalysis.fingerprint(col("text")).as("fp"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      val mixed = Sampling.mixtureByTokens(base, col("fp"), col("lang"),
        col("n_tokens"),
        Map("en" -> 0.5, "de" -> 0.125, "es" -> 0.125,
          "fr" -> 0.125, "zh" -> 0.125))
      val plan = Sampling.epochPlan(mixed, col("fp"), col("lang"),
        Map("en" -> 1.5, "de" -> 2.0, "es" -> 1.0, "fr" -> 1.0, "zh" -> 0.25))
      graft.operators.Packing.packPlan(plan, col("fp"),
          Seq(col("ord"), col("doc_id"), col("epoch")), col("n_tokens"),
          budget = 512, shards = 8)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_copies"),
          count_distinct(col("bin")).as("n_bins"),
          sum("n_tokens").as("n_tokens"),
          expr("bit_xor(fp + epoch)").as("checksum"))
        .orderBy("shard")
    },

    // Corpus DATA CARD: the per-language release report a data card
    // states — documents, tokens, token share, exact-duplicate count,
    // mean quality, mean length — composed from the engine's own
    // oracle-checked signals in ONE plan. Mean quality is the
    // floor(q·1e9) integer-unit mean (partition-order-independent, the
    // LanguageModel rule); token share is one double division against a
    // broadcast one-row total.
    "q_datacard" -> { (s, dir) =>
      val t = new Tables(s, dir)
      val docs = Staging.widen(t.documents)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("text"),
          TextAnalysis.tokens(col("text")).as("toks"))
        .stagePersist()
      val keep = Dedup.exact(docs, "doc_id", "text")
        .select(col("doc_id"), lit(1L).as("_keep"))
      val perDoc = docs.select(col("doc_id"), col("lang"), col("n_chars"),
          TextAnalysis.tokenCountFromTokens(col("toks")).as("n_tok"),
          floor(TextAnalysis.qualityScore(col("text")) * lit(1e9d))
            .cast("long").as("_qu"))
        .join(keep, Seq("doc_id"), "left")
      // tiny (one row per language) but feeds both the total and the
      // report — stage it so the corpus scan runs once
      val grouped = Staging.stage(perDoc.groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"),
        (count(lit(1)) - count(col("_keep"))).as("n_exact_dup"),
        sum("_qu").as("_squ"),
        sum("n_chars").as("_sch")))
      val tot = grouped.agg(sum("n_tokens").as("_tt"))
      grouped.crossJoin(broadcast(tot))
        .select(col("lang"), col("n_docs"), col("n_tokens"),
          (col("n_tokens").cast("double") / col("_tt")).as("token_share"),
          col("n_exact_dup"),
          (col("_squ").cast("double") / col("n_docs") / lit(1e9d))
            .as("mean_quality"),
          (col("_sch").cast("double") / col("n_docs")).as("mean_chars"))
        .orderBy("lang")
    },

    // FineWeb-style SOURCE TRIAGE: per-source mean quality + corpus-wide
    // repeated-segment fraction (w=8 disjoint grid), flagging sources
    // that fail either bar — the domain-blocklist derivation that runs
    // before any per-document filter sees the source again.
    "q_source_triage" -> { (s, dir) =>
      val t = new Tables(s, dir)
      TextAnalysis.sourceTriage(t.documents, "source", "doc_id", "text",
          w = 8, minMeanQuality = 0.80, maxRepFraction = 0.15)
        .orderBy("source")
    },

    // CURATION capstone: the domain→segment→model curation ladder as ONE
    // declarative plan — source triage (drop flagged domains wholesale,
    // q_source_triage's bars) → keep-first segment dedup of the
    // survivors → self-trained LM scoring of the CLEANED text → CCNet
    // head/middle/tail bucket sampling gated on the cleaned text's
    // canonical fingerprint. Every stage is one of the engine's own
    // oracle-checked operators; thresholds are the cleaned-survivor
    // score terciles, pinned as literals like q_lm_buckets'.
    "q_curate" -> { (s, dir) =>
      val t = new Tables(s, dir)
      val docs = Staging.widen(t.documents)
      // ONE disjoint w=8 grid serves both stages (the From-pattern seam):
      // triage reads (id, fp) over all docs, the keep-first segment dedup
      // reads (id, chunk_id, fp) over the triage survivors — previously
      // each stage re-chunked and re-fingerprinted the corpus
      val gridAll = Staging.stage(
        TextAnalysis.chunkByTokens(docs, "doc_id", "text",
            window = 8, stride = 8)
          .select(col("doc_id").as("id"), col("chunk_id"),
            graft.functions.VectorFunctions.fingerprint64(col("chunk_text"))
              .as("fp")))
      val triage = TextAnalysis.sourceTriageFromGrid(docs, "source",
        "doc_id", "text", gridAll, minMeanQuality = 0.80,
        maxRepFraction = 0.15)
      val survivors = docs.join(
        triage.filter(!col("flagged")).select("source"),
        Seq("source"), "left_semi")
      // the shared grid filtered to the survivors — winners must be a
      // min over exactly the surviving documents
      val gridSurv = gridAll.join(
        survivors.select(col("doc_id").as("id")), Seq("id"), "left_semi")
      // the cleaned frame feeds the LM model, the scoring side, and the
      // fingerprint gate — stage it or the triage+dedup prefix re-runs
      val cleaned = Staging.stage(
        Dedup.dedupSegmentsKeepFirstFromGrid(survivors, "doc_id", "text",
            w = 8, grid = gridSurv)
          .select(col("doc_id"), col("n_kept"), col("clean")))
      val scored = graft.operators.LanguageModel
        .lmScore(cleaned, "doc_id", "clean")
      val fp = cleaned.select(col("doc_id"),
        TextAnalysis.canonicalFingerprint(col("clean")).as("_fp"))
      graft.operators.LanguageModel.bucketSample(
          scored.join(fp, Seq("doc_id"))
            .join(cleaned.select("doc_id", "n_kept"), Seq("doc_id")),
          col("lm_score"), col("_fp"),
          tTail = 0.0344, tHead = 0.0352,
          rates = Map("head" -> 1.0, "middle" -> 0.5, "tail" -> 0.1))
        .select("doc_id", "n_kept", "n_tok", "lm_score", "bucket", "kept")
        .orderBy("doc_id")
    }
  )

  /** The canonicalizer (NFC + explicit-whitespace-class collapse), as the
    * oracle replays `TextAnalysis.normalizeText`. */
  private val normSql =
    """trim(regexp_replace(nfc_normalize(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))"""

  /** The rolling-hash fingerprint fold, as the oracle replays it. */
  private val fpSql =
    """list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(list_filter(string_split(text, ''), c -> c <> ''),
             c -> CAST(ascii(c) AS BIGINT))),
         (acc, c) -> (acc * 31 + c) % 1000000007)"""

  def oracleSql: Map[String, String] = Map(

    "q_diff" ->
      """WITH nxt AS (
           SELECT c_custkey, c_name, c_nationkey,
             CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 10.0
                  ELSE c_acctbal END AS c_acctbal,
             c_mktsegment
           FROM customer WHERE c_custkey % 17 <> 3
           UNION ALL
           SELECT c_custkey + 1000000, c_name, c_nationkey, c_acctbal,
             c_mktsegment
           FROM customer WHERE c_custkey % 50 = 7),
         d AS (
           SELECT coalesce(p.c_custkey, n.c_custkey) AS c_custkey,
             CASE WHEN p.c_custkey IS NULL THEN 'added'
                  WHEN n.c_custkey IS NULL THEN 'removed'
                  ELSE 'changed' END AS change,
             CASE WHEN p.c_custkey IS NULL OR n.c_custkey IS NULL THEN ''
                  ELSE coalesce(list_aggregate(list_sort(list_filter(
                    [CASE WHEN p.c_acctbal    IS DISTINCT FROM n.c_acctbal    THEN 'c_acctbal'    END,
                     CASE WHEN p.c_mktsegment IS DISTINCT FROM n.c_mktsegment THEN 'c_mktsegment' END,
                     CASE WHEN p.c_name       IS DISTINCT FROM n.c_name       THEN 'c_name'       END,
                     CASE WHEN p.c_nationkey  IS DISTINCT FROM n.c_nationkey  THEN 'c_nationkey'  END],
                    x -> x IS NOT NULL)), 'string_agg', ','), '') END AS changed_cols
           FROM customer p FULL OUTER JOIN nxt n ON p.c_custkey = n.c_custkey)
         SELECT c_custkey, change, changed_cols FROM d
         WHERE change <> 'changed' OR changed_cols <> ''
         ORDER BY c_custkey""",

    "q_mixture" ->
      s"""WITH f AS (SELECT doc_id, lang, $fpSql AS fp FROM documents),
         c AS (
           SELECT lang, CAST(count(*) AS DOUBLE) AS n,
             CASE lang WHEN 'en' THEN CAST(0.5 AS DOUBLE)
                       WHEN 'de' THEN CAST(0.125 AS DOUBLE)
                       WHEN 'es' THEN CAST(0.125 AS DOUBLE)
                       WHEN 'fr' THEN CAST(0.125 AS DOUBLE)
                       WHEN 'zh' THEN CAST(0.125 AS DOUBLE) END AS w
           FROM documents GROUP BY lang),
         t AS (SELECT min(n / w) AS t FROM c WHERE w IS NOT NULL),
         r AS (
           SELECT lang,
             CASE WHEN (w * t.t) / n >= 1.0 THEN 1000000
                  ELSE CAST(trunc(((w * t.t) / n) * 1000000.0) AS BIGINT)
             END AS cut
           FROM c, t WHERE w IS NOT NULL)
         SELECT f.doc_id, f.lang FROM f JOIN r ON f.lang = r.lang
         WHERE (f.fp * 2654435761) % 1000000 < r.cut
         ORDER BY f.doc_id""",

    // identical solve with sum(n_tokens) as the stratum mass (integer-
    // valued double sums — order-independent, so cross-engine exact)
    "q_mixture_tokens" ->
      s"""WITH f AS (
           SELECT doc_id, lang, $fpSql AS fp,
             CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT)
               AS n_tokens
           FROM documents),
         c AS (
           SELECT lang, CAST(sum(n_tokens) AS DOUBLE) AS n,
             CASE lang WHEN 'en' THEN CAST(0.5 AS DOUBLE)
                       WHEN 'de' THEN CAST(0.125 AS DOUBLE)
                       WHEN 'es' THEN CAST(0.125 AS DOUBLE)
                       WHEN 'fr' THEN CAST(0.125 AS DOUBLE)
                       WHEN 'zh' THEN CAST(0.125 AS DOUBLE) END AS w
           FROM f GROUP BY lang),
         t AS (SELECT min(n / w) AS t FROM c WHERE w IS NOT NULL),
         r AS (
           SELECT lang,
             CASE WHEN (w * t.t) / n >= 1.0 THEN 1000000
                  ELSE CAST(trunc(((w * t.t) / n) * 1000000.0) AS BIGINT)
             END AS cut
           FROM c, t WHERE w IS NOT NULL)
         SELECT f.doc_id, f.lang, f.n_tokens FROM f JOIN r ON f.lang = r.lang
         WHERE (f.fp * 2654435761) % 1000000 < r.cut
         ORDER BY f.doc_id""",

    // greedy prefix fill: kept iff the budget wasn't exhausted BEFORE
    // the document (cum - n_tokens < budget), ties impossible (doc_id)
    "q_token_quota" ->
      s"""WITH f AS (
           SELECT doc_id, lang, $fpSql AS fp,
             CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT)
               AS n_tokens
           FROM documents),
         s AS (
           SELECT doc_id, lang, n_tokens,
             sum(n_tokens) OVER (
               PARTITION BY lang
               ORDER BY (fp * 2654435761) % 1000000, doc_id
               ROWS UNBOUNDED PRECEDING) AS cum
           FROM f)
         SELECT doc_id, lang, n_tokens FROM s
         WHERE cum - n_tokens < 2000 ORDER BY doc_id""",

    // Same shingle/pair/closure pipeline as the q_dedup_clusters oracle,
    // then the split CASE keyed on the CLUSTER id.
    "q_split_leakproof" ->
      """WITH RECURSIVE toks AS (
           SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
           FROM documents WHERE doc_id % 2 = 0),
         sh AS (
           SELECT doc_id, list_distinct(list_transform(
             range(1, greatest(len(t) - 2, 0) + 1),
             i -> list_aggregate(list_slice(t, i, i + 2), 'string_agg', ' '))) AS s
           FROM toks),
         inv AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS shingle FROM sh),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM inv a JOIN inv b
             ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
           HAVING count(*) >= 2
              AND CAST(count(*) AS DOUBLE)
                  / CAST(a.n_sh + b.n_sh - count(*) AS DOUBLE) >= 0.2),
         edges AS (
           SELECT id_a AS src, id_b AS dst FROM pairs
           UNION ALL SELECT id_b, id_a FROM pairs),
         reach(a, b) AS (
           SELECT src, dst FROM edges
           UNION
           SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
         comp AS (SELECT a AS id, least(a, min(b)) AS cluster FROM reach GROUP BY a),
         cl AS (
           SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS cluster
           FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
           WHERE d.doc_id % 2 = 0)
         SELECT doc_id, cluster,
           CASE WHEN ((cluster % 1000000007) * 2654435761) % 1000000 < 900000
                  THEN 'train'
                WHEN ((cluster % 1000000007) * 2654435761) % 1000000 < 950000
                  THEN 'val'
                ELSE 'test' END AS split
         FROM cl ORDER BY doc_id""",

    "q_vocab" ->
      """WITH toks AS (
           SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
           FROM documents),
         g AS (
           SELECT doc_id, unnest(list_transform(
             range(1, greatest(len(t) - 1, 0) + 1),
             i -> list_aggregate(list_slice(t, i, i + 1), 'string_agg', ' '))) AS gram
           FROM toks)
         SELECT gram, count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs
         FROM g WHERE gram <> ''
         GROUP BY gram
         ORDER BY n_occ DESC, gram LIMIT 500""",

    // The release capstone composes the already-proven oracle fragments:
    // exact-dedup keep-list, the decontamination overlap CTE, the quota
    // row_number, the mixture rate solve, the clusters recursive closure
    // (restricted to the released set), and the shard/checksum aggregate.
    "q_release" ->
      s"""WITH RECURSIVE d0 AS (
           SELECT doc_id, lang, source, $normSql AS text
           FROM documents WHERE doc_id % 2 = 0),
         toks AS (
           SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
           FROM d0),
         sh AS (
           SELECT doc_id, list_distinct(list_transform(
             range(1, greatest(len(t) - 2, 0) + 1),
             i -> list_aggregate(list_slice(t, i, i + 2), 'string_agg', ' '))) AS s
           FROM toks),
         f AS (SELECT doc_id, $fpSql AS fp FROM d0),
         keep AS (
           SELECT min(doc_id) AS doc_id FROM d0 GROUP BY lower(text)),
         bench AS (
           SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE doc_id % 97 = 0),
         inv0 AS (
           SELECT k.doc_id, unnest(sh.s) AS shingle
           FROM keep k JOIN sh ON k.doc_id = sh.doc_id),
         ov AS (
           SELECT i.doc_id, count(*) AS overlap
           FROM inv0 i JOIN bench b ON i.shingle = b.shingle
           GROUP BY i.doc_id),
         clean AS (
           SELECT k.doc_id FROM keep k LEFT JOIN ov ON k.doc_id = ov.doc_id
           WHERE coalesce(ov.overlap, 0) < 2),
         r AS (
           SELECT d.doc_id, d.lang, f.fp, row_number() OVER (
             PARTITION BY d.source
             ORDER BY (f.fp * 2654435761) % 1000000, d.doc_id) AS rk
           FROM d0 d
           JOIN clean ON d.doc_id = clean.doc_id
           JOIN f ON d.doc_id = f.doc_id),
         quota AS (SELECT doc_id, lang, fp FROM r WHERE rk <= 20),
         c2 AS (
           SELECT lang, CAST(count(*) AS DOUBLE) AS n,
             CASE lang WHEN 'en' THEN CAST(0.5 AS DOUBLE)
                       WHEN 'de' THEN CAST(0.125 AS DOUBLE)
                       WHEN 'es' THEN CAST(0.125 AS DOUBLE)
                       WHEN 'fr' THEN CAST(0.125 AS DOUBLE)
                       WHEN 'zh' THEN CAST(0.125 AS DOUBLE) END AS w
           FROM quota GROUP BY lang),
         tm AS (SELECT min(n / w) AS t FROM c2 WHERE w IS NOT NULL),
         rates AS (
           SELECT lang,
             CASE WHEN (w * tm.t) / n >= 1.0 THEN 1000000
                  ELSE CAST(trunc(((w * tm.t) / n) * 1000000.0) AS BIGINT)
             END AS cut
           FROM c2, tm WHERE w IS NOT NULL),
         mixed AS (
           SELECT q.doc_id, q.fp FROM quota q JOIN rates ON q.lang = rates.lang
           WHERE (q.fp * 2654435761) % 1000000 < rates.cut),
         minv AS (
           SELECT m.doc_id, len(sh.s) AS n_sh, unnest(sh.s) AS shingle
           FROM mixed m JOIN sh ON m.doc_id = sh.doc_id),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM minv a JOIN minv b
             ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
           HAVING count(*) >= 2
              AND CAST(count(*) AS DOUBLE)
                  / CAST(a.n_sh + b.n_sh - count(*) AS DOUBLE) >= 0.2),
         edges AS (
           SELECT id_a AS src, id_b AS dst FROM pairs
           UNION ALL SELECT id_b, id_a FROM pairs),
         reach(a, b) AS (
           SELECT src, dst FROM edges
           UNION
           SELECT r2.a, e.dst FROM reach r2 JOIN edges e ON r2.b = e.src),
         comp AS (SELECT a AS id, least(a, min(b)) AS cluster FROM reach GROUP BY a),
         final AS (
           SELECT m.doc_id, m.fp,
             CASE WHEN ((coalesce(c.cluster, m.doc_id) % 1000000007)
                        * 2654435761) % 1000000 < 900000 THEN 'train'
                  WHEN ((coalesce(c.cluster, m.doc_id) % 1000000007)
                        * 2654435761) % 1000000 < 950000 THEN 'val'
                  ELSE 'test' END AS split,
             ((m.fp % 1000000007) * 40503 + 2654435761) % 8 AS shard
           FROM mixed m LEFT JOIN comp c ON m.doc_id = c.id)
         SELECT split, shard, count(*) AS n_rows, bit_xor(fp) AS checksum,
           min(doc_id) AS min_id, max(doc_id) AS max_id
         FROM final GROUP BY split, shard ORDER BY split, shard""",

    "q_quota" ->
      s"""WITH f AS (SELECT doc_id, source, $fpSql AS fp FROM documents),
         r AS (
           SELECT doc_id, source, row_number() OVER (
             PARTITION BY source
             ORDER BY (fp * 2654435761) % 1000000, doc_id) AS rk
           FROM f)
         SELECT doc_id, source FROM r WHERE rk <= 12 ORDER BY doc_id""",

    "q_keywords" ->
      """WITH toks AS (
           SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
           FROM documents),
         occ AS (SELECT doc_id, unnest(t) AS token FROM toks),
         tf AS (
           SELECT doc_id, token, count(*) AS tf FROM occ
           WHERE token <> '' GROUP BY doc_id, token),
         dft AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
         n AS (SELECT count(*) AS n FROM documents),
         scored AS (
           SELECT tf.doc_id, tf.token, tf.tf, dft.df,
             CAST(tf.tf * (n.n + 1) AS DOUBLE) / (dft.df + 1) AS score
           FROM tf JOIN dft USING (token), n),
         ranked AS (
           SELECT *, row_number() OVER (
             PARTITION BY doc_id ORDER BY score DESC, token) AS rank
           FROM scored)
         SELECT doc_id, token, tf, df, score, rank FROM ranked
         WHERE rank <= 3 ORDER BY doc_id, rank""",

    "q_shard" ->
      s"""WITH nrm AS (SELECT doc_id, $normSql AS text FROM documents),
         f AS (SELECT doc_id, $fpSql AS fp FROM nrm),
         s AS (SELECT doc_id, fp,
           ((fp % 1000000007) * 40503 + 2654435761) % 8 AS shard FROM f)
         SELECT shard, count(*) AS n_rows, bit_xor(fp) AS checksum,
           min(doc_id) AS min_id, max(doc_id) AS max_id
         FROM s GROUP BY shard ORDER BY shard""",

    // same windows: non-empty tokens, ceil((n-W)/S)+1 chunks, 1-based
    // inclusive list_slice twin of Spark's (start, length) slice
    "q_chunk" ->
      """WITH toks AS (
           SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\s+'),
               x -> x <> '') AS t
           FROM documents),
         c AS (
           SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n FROM toks
           WHERE len(t) > 0),
         ch AS (
           SELECT doc_id, t, n,
             unnest(range(0, CASE WHEN n <= 24 THEN 1
               ELSE CAST(ceil(CAST(n - 24 AS DOUBLE) / 16) AS BIGINT) + 1
               END)) AS chunk_id
           FROM c)
         SELECT doc_id, chunk_id, chunk_id * 16 AS tok_start,
           least(24, n - chunk_id * 16) AS n_tok,
           array_to_string(list_slice(t, chunk_id * 16 + 1,
             least(chunk_id * 16 + 24, n)), ' ') AS chunk_text
         FROM ch ORDER BY doc_id, chunk_id""",

    // full copies per floor(e); the fractional epoch keeps by the same
    // scramble/truncated-cut rule as q_mixture, offset by the epoch
    // index; the read-order key remixes with a DIFFERENT multiplier
    "q_epoch_plan" ->
      s"""WITH f AS (SELECT doc_id, lang, $fpSql AS fp FROM documents),
         e AS (
           SELECT doc_id, lang, fp,
             CASE lang WHEN 'en' THEN CAST(1.5 AS DOUBLE)
                       WHEN 'de' THEN CAST(2.0 AS DOUBLE)
                       WHEN 'zh' THEN CAST(0.25 AS DOUBLE) END AS ef
           FROM f),
         x AS (
           SELECT doc_id, lang, fp, ef,
             unnest(range(0, CAST(floor(ef) AS BIGINT) + 1)) AS epoch
           FROM e WHERE ef IS NOT NULL)
         SELECT doc_id, lang, epoch,
           ((fp + epoch) * 2246822519) % 1000000 AS ord
         FROM x
         WHERE epoch < CAST(floor(ef) AS BIGINT)
            OR ((fp + epoch) * 2654435761) % 1000000
               < CAST(trunc((ef - floor(ef)) * 1000000.0) AS BIGINT)
         ORDER BY doc_id, epoch""",

    // the trainset capstone composes the proven oracle fragments: the
    // token-mixture solve (q_mixture_tokens), the epoch explode + two
    // scrambles (q_epoch_plan), the shard-local running-sum pack (q_pack),
    // and the manifest aggregate (q_shard) — over canonical text
    "q_trainset" ->
      s"""WITH nrm AS (SELECT doc_id, lang, $normSql AS text FROM documents),
         f AS (
           SELECT doc_id, lang, $fpSql AS fp,
             CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT)
               AS n_tokens
           FROM nrm),
         c AS (
           SELECT lang, CAST(sum(n_tokens) AS DOUBLE) AS n,
             CASE lang WHEN 'en' THEN CAST(0.5 AS DOUBLE)
                       WHEN 'de' THEN CAST(0.125 AS DOUBLE)
                       WHEN 'es' THEN CAST(0.125 AS DOUBLE)
                       WHEN 'fr' THEN CAST(0.125 AS DOUBLE)
                       WHEN 'zh' THEN CAST(0.125 AS DOUBLE) END AS w
           FROM f GROUP BY lang),
         t AS (SELECT min(n / w) AS t FROM c WHERE w IS NOT NULL),
         r AS (
           SELECT lang,
             CASE WHEN (w * t.t) / n >= 1.0 THEN 1000000
                  ELSE CAST(trunc(((w * t.t) / n) * 1000000.0) AS BIGINT)
             END AS cut
           FROM c, t WHERE w IS NOT NULL),
         mixed AS (
           SELECT f.* FROM f JOIN r ON f.lang = r.lang
           WHERE (f.fp * 2654435761) % 1000000 < r.cut),
         e AS (
           SELECT doc_id, fp, n_tokens,
             CASE lang WHEN 'en' THEN CAST(1.5 AS DOUBLE)
                       WHEN 'de' THEN CAST(2.0 AS DOUBLE)
                       WHEN 'es' THEN CAST(1.0 AS DOUBLE)
                       WHEN 'fr' THEN CAST(1.0 AS DOUBLE)
                       WHEN 'zh' THEN CAST(0.25 AS DOUBLE) END AS ef
           FROM mixed),
         x AS (
           SELECT doc_id, fp, n_tokens, ef,
             unnest(range(0, CAST(floor(ef) AS BIGINT) + 1)) AS epoch
           FROM e WHERE ef IS NOT NULL),
         plan AS (
           SELECT doc_id, fp, n_tokens, epoch,
             ((fp + epoch) * 2246822519) % 1000000 AS ord
           FROM x
           WHERE epoch < CAST(floor(ef) AS BIGINT)
              OR ((fp + epoch) * 2654435761) % 1000000
                 < CAST(trunc((ef - floor(ef)) * 1000000.0) AS BIGINT)),
         packed AS (
           SELECT shard, fp, epoch, n_tokens,
             sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY ord, doc_id, epoch
               ROWS UNBOUNDED PRECEDING) - n_tokens AS pos
           FROM (SELECT plan.*, fp % 8 AS shard FROM plan)),
         b AS (
           SELECT shard, fp, epoch, n_tokens,
             (pos // 512) * 8 + shard AS bin
           FROM packed)
         SELECT shard, count(*) AS n_copies,
           CAST(count(DISTINCT bin) AS BIGINT) AS n_bins,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           bit_xor(fp + epoch) AS checksum
         FROM b GROUP BY shard ORDER BY shard""",

    // per-language report: exact-dup count against the min-id keep list,
    // floor(q·1e9) quality units, one-division shares/means
    "q_datacard" ->
      s"""WITH base AS (
           SELECT doc_id, lang, n_chars, text,
             string_split_regex(trim(lower(text)), '\\s+') AS toks
           FROM documents),
         keepl AS (
           SELECT min(doc_id) AS doc_id FROM documents GROUP BY lower(text)),
         per AS (
           SELECT b.doc_id, b.lang, b.n_chars,
             CAST(len(b.toks) AS BIGINT) AS n_tok,
             CAST(floor((
               least(CAST(length(b.text) AS DOUBLE) / 500, 1.0) * 0.4
               + (CAST(length(regexp_replace(lower(b.text), '[^a-z ]', '', 'g')) AS DOUBLE)
                  / greatest(length(b.text), 1)) * 0.4
               + (CASE WHEN (CAST(len(list_filter(b.toks, t -> t IN $stopSql)) AS DOUBLE)
                             / greatest(len(b.toks), 1)) > 0.02
                       THEN 1.0
                       ELSE (CAST(len(list_filter(b.toks, t -> t IN $stopSql)) AS DOUBLE)
                             / greatest(len(b.toks), 1)) * 50 END) * 0.2
             ) * 1e9) AS BIGINT) AS qu,
             CASE WHEN k.doc_id IS NULL THEN 1 ELSE 0 END AS dup
           FROM base b LEFT JOIN keepl k ON b.doc_id = k.doc_id),
         g AS (
           SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             CAST(sum(dup) AS BIGINT) AS n_exact_dup,
             CAST(sum(qu) AS BIGINT) AS squ,
             CAST(sum(n_chars) AS BIGINT) AS sch
           FROM per GROUP BY lang),
         tt AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM g)
         SELECT lang, n_docs, n_tokens,
           CAST(n_tokens AS DOUBLE) / tt.t AS token_share,
           n_exact_dup,
           CAST(squ AS DOUBLE) / n_docs / 1e9 AS mean_quality,
           CAST(sch AS DOUBLE) / n_docs AS mean_chars
         FROM g CROSS JOIN tt ORDER BY lang""",
    // the datacard quality replay grouped by source + the q_dedup_segment
    // grid/fold for the repeated-segment leg; flagged re-derives both
    // means so the CASE sees the identical doubles
    "q_source_triage" ->
      s"""WITH base AS (
           SELECT doc_id, source, text,
             string_split_regex(trim(lower(text)), '\\s+') AS toks
           FROM documents),
         q AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CAST(floor((
               least(CAST(length(text) AS DOUBLE) / 500, 1.0) * 0.4
               + (CAST(length(regexp_replace(lower(text), '[^a-z ]', '', 'g')) AS DOUBLE)
                  / greatest(length(text), 1)) * 0.4
               + (CASE WHEN (CAST(len(list_filter(toks, t -> t IN $stopSql)) AS DOUBLE)
                             / greatest(len(toks), 1)) > 0.02
                       THEN 1.0
                       ELSE (CAST(len(list_filter(toks, t -> t IN $stopSql)) AS DOUBLE)
                             / greatest(len(toks), 1)) * 50 END) * 0.2
             ) * 1e9) AS BIGINT)) AS BIGINT) AS squ
           FROM base GROUP BY source),
         c AS (
           SELECT doc_id, source, list_filter(toks, x -> x <> '') AS t
           FROM base),
         c2 AS (
           SELECT doc_id, source, t, CAST(len(t) AS BIGINT) AS n FROM c
           WHERE len(t) > 0),
         ch AS (
           SELECT doc_id, source, t, n,
             unnest(range(0, CASE WHEN n <= 8 THEN 1
               ELSE CAST(ceil(CAST(n - 8 AS DOUBLE) / 8) AS BIGINT) + 1
               END)) AS ci
           FROM c2),
         f AS (
           SELECT source,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(
                   list_filter(string_split(
                     array_to_string(list_slice(t, ci * 8 + 1,
                       least(ci * 8 + 8, n)), ' '), ''), x -> x <> ''),
                   x -> CAST(ascii(x) AS BIGINT))),
               (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
           FROM ch),
         d AS (SELECT fp FROM f GROUP BY fp HAVING count(*) >= 2),
         sg AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_seg,
             CAST(sum(CASE WHEN f.fp IN (SELECT fp FROM d)
               THEN 1 ELSE 0 END) AS BIGINT) AS nrep
           FROM f GROUP BY source)
         SELECT q.source, q.n_docs,
           CAST(q.squ AS DOUBLE) / q.n_docs / 1e9 AS mean_quality,
           coalesce(sg.n_seg, 0) AS n_seg,
           CASE WHEN coalesce(sg.n_seg, 0) = 0 THEN 0.0
                ELSE CAST(sg.nrep AS DOUBLE) / sg.n_seg END AS rep_fraction,
           (CAST(q.squ AS DOUBLE) / q.n_docs / 1e9 < 0.80
            OR CASE WHEN coalesce(sg.n_seg, 0) = 0 THEN 0.0
                    ELSE CAST(sg.nrep AS DOUBLE) / sg.n_seg END > 0.15)
             AS flagged
         FROM q LEFT JOIN sg ON q.source = sg.source
         ORDER BY q.source""",
    // the q_source_triage, q_dedup_segment, q_lm_score, and q_lm_buckets
    // oracle fragments composed in stage order: flagged sources drop
    // wholesale, keep-first runs among the SURVIVORS' segments only, the
    // LM self-trains on the cleaned text, and the gate hashes the cleaned
    // text's canonical fingerprint
    "q_curate" -> {
      val fpSt = fpSql.replace("string_split(text", "string_split(st")
      val fpCt = fpSql.replace("string_split(text", "string_split(ctext")
      val normCt = normSql.replace("nfc_normalize(text)", "nfc_normalize(ct)")
      s"""WITH base AS (
           SELECT doc_id, source, text,
             string_split_regex(trim(lower(text)), '\\s+') AS toks
           FROM documents),
         q AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CAST(floor((
               least(CAST(length(text) AS DOUBLE) / 500, 1.0) * 0.4
               + (CAST(length(regexp_replace(lower(text), '[^a-z ]', '', 'g')) AS DOUBLE)
                  / greatest(length(text), 1)) * 0.4
               + (CASE WHEN (CAST(len(list_filter(toks, t -> t IN $stopSql)) AS DOUBLE)
                             / greatest(len(toks), 1)) > 0.02
                       THEN 1.0
                       ELSE (CAST(len(list_filter(toks, t -> t IN $stopSql)) AS DOUBLE)
                             / greatest(len(toks), 1)) * 50 END) * 0.2
             ) * 1e9) AS BIGINT)) AS BIGINT) AS squ
           FROM base GROUP BY source),
         c AS (
           SELECT doc_id, source, list_filter(toks, x -> x <> '') AS t
           FROM base),
         c2 AS (
           SELECT doc_id, source, t, CAST(len(t) AS BIGINT) AS n FROM c
           WHERE len(t) > 0),
         ch AS (
           SELECT doc_id, source, t, n,
             unnest(range(0, CASE WHEN n <= 8 THEN 1
               ELSE CAST(ceil(CAST(n - 8 AS DOUBLE) / 8) AS BIGINT) + 1
               END)) AS ci
           FROM c2),
         seg AS (
           SELECT doc_id, source, ci,
             array_to_string(list_slice(t, ci * 8 + 1,
               least(ci * 8 + 8, n)), ' ') AS st
           FROM ch),
         f AS (SELECT doc_id, source, ci, st, $fpSt AS fp FROM seg),
         d AS (SELECT fp FROM f GROUP BY fp HAVING count(*) >= 2),
         sg AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_seg,
             CAST(sum(CASE WHEN f.fp IN (SELECT fp FROM d)
               THEN 1 ELSE 0 END) AS BIGINT) AS nrep
           FROM f GROUP BY source),
         flag AS (
           SELECT q.source FROM q LEFT JOIN sg ON q.source = sg.source
           WHERE CAST(q.squ AS DOUBLE) / q.n_docs / 1e9 < 0.80
              OR (CASE WHEN coalesce(sg.n_seg, 0) = 0 THEN 0.0
                       ELSE CAST(sg.nrep AS DOUBLE) / sg.n_seg END) > 0.15),
         surv AS (
           SELECT * FROM f
           WHERE source NOT IN (SELECT source FROM flag)),
         k AS (
           SELECT doc_id, ci, st,
             row_number() OVER (PARTITION BY fp
               ORDER BY doc_id, ci) = 1 AS kept
           FROM surv),
         cl AS (
           SELECT doc_id,
             CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             coalesce(string_agg(CASE WHEN kept THEN st END, ' '
               ORDER BY ci), '') AS ct
           FROM k GROUP BY doc_id),
         ltoks AS (
           SELECT doc_id, string_split_regex(trim(lower(ct)), '\\s+') AS t
           FROM cl),
         lidx AS (
           SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i FROM ltoks),
         locc AS (
           SELECT doc_id, t[i] AS w,
                  CASE WHEN i > 1 THEN t[i - 1] END AS prev
           FROM lidx WHERE t[i] <> ''),
         oc AS (
           SELECT doc_id, prev, w, count(*) AS k2 FROM locc GROUP BY ALL),
         uni AS (SELECT w, CAST(sum(k2) AS BIGINT) AS cw FROM oc GROUP BY w),
         tot AS (SELECT CAST(sum(k2) AS BIGINT) AS tt FROM oc),
         big AS (
           SELECT prev, w, CAST(sum(k2) AS BIGINT) AS cbw FROM oc
           WHERE prev IS NOT NULL GROUP BY prev, w),
         sc AS (
           SELECT oc.doc_id, oc.k2,
             CASE WHEN oc.prev IS NULL
                    THEN CAST(uni.cw AS DOUBLE) / tot.tt
                  WHEN big.cbw IS NOT NULL
                    THEN CAST(big.cbw AS DOUBLE) / cu.cw
                  ELSE 0.4 * (CAST(uni.cw AS DOUBLE) / tot.tt) END AS p
           FROM oc
           JOIN uni ON oc.w = uni.w
           LEFT JOIN uni cu ON oc.prev = cu.w
           LEFT JOIN big ON oc.prev = big.prev AND oc.w = big.w
           CROSS JOIN tot),
         agg AS (
           SELECT doc_id, CAST(sum(k2) AS BIGINT) AS n_tok,
             CAST(sum(k2 * CAST(floor(p * 1e9) AS BIGINT)) AS BIGINT) AS su
           FROM sc GROUP BY doc_id),
         scr AS (
           SELECT cl.doc_id, cl.n_kept, coalesce(a.n_tok, 0) AS n_tok,
             CASE WHEN a.doc_id IS NULL THEN CAST(0 AS DOUBLE)
                  ELSE CAST(a.su AS DOUBLE) / a.n_tok / 1e9 END AS lm_score
           FROM cl LEFT JOIN agg a ON cl.doc_id = a.doc_id),
         nrm AS (SELECT doc_id, $normCt AS ctext FROM cl),
         fpd AS (SELECT doc_id, $fpCt AS fp2 FROM nrm)
         SELECT s2.doc_id, s2.n_kept, s2.n_tok, s2.lm_score,
           CASE WHEN s2.lm_score >= 0.0352 THEN 'head'
                WHEN s2.lm_score >= 0.0344 THEN 'middle'
                ELSE 'tail' END AS bucket,
           (fpd.fp2 * 2654435761) % 1000000 <
             CASE WHEN s2.lm_score >= 0.0352 THEN 1000000
                  WHEN s2.lm_score >= 0.0344 THEN 500000
                  ELSE 100000 END AS kept
         FROM scr s2 JOIN fpd ON s2.doc_id = fpd.doc_id
         ORDER BY s2.doc_id"""
    }
  )

  /** The any-language stopword marker IN-list, as the oracle replays the
    * `TextAnalysis.qualityScore` stopword term.
    */
  private val stopSql: String =
    TextAnalysis.markers.values.flatten.toSeq.distinct
      .map(w => s"'$w'").mkString("(", ", ", ")")
}
