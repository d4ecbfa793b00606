#!/usr/bin/env python3
"""Generate scale-study fixtures (documents/embeddings/events) at an
arbitrary row multiple of the driver's sf0.1 distributions.

Usage: python3 tools/gen_scale.py <outdir> <docs> <vecs> <events> [files] [--hot|--rare]

--hot plants a 60-token boilerplate block in 30% of documents (the
hot-shingle regime that should flip ngramJaccardPairsAuto to the
prefix-filtered path).
--rare uses the long-tail body vocabulary WITHOUT the hot boilerplate:
shingle df stays O(1) as the corpus grows (Heaps-law-like web corpus),
so pair work is honestly linear — the distribution for the 100x ladder
(the 30-word VOCAB saturates its 27k-shingle space past ~50k docs,
which measures the generator, not the engine).

Mirrors the observed sf0.1 shapes (vocab-limited token text with exact +
near-duplicate structure, 64-d clustered float32 embeddings, 30-day
nanosecond-timestamp event stream with 5 types and JSON props) so that
sf0.1→sf1 wall-time ratios measure the ENGINE's scaling, not a
distribution shift. Both ends of a ratio must come from THIS generator
(the driver's own corpora have different RNG details).

Deterministic: seed=42.
"""
import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ("batch part spark line column order small sort fast value scan hash "
         "slow group agg filter query big key window row table stream merge "
         "data join shuffle plan stage task").split()

def gen_documents(n, rng, hot=False, rare=False):
    langs = rng.choice(["en", "zh", "es", "de", "fr"], size=n, p=[0.7, 0.1, 0.08, 0.07, 0.05])
    sources = [f"src{i}" for i in rng.integers(0, 20, size=n)]
    texts = []
    base = []
    for i in range(n):
        ln = int(rng.integers(8, 100))
        if hot or rare:
            # rare long-tail body (body shingles have df≈1) — models a
            # REAL web corpus. The tiny shared VOCAB would instead
            # saturate the whole shingle space (df uniformly high), which
            # is a different regime (see Dedup.ngramJaccardPairsAutoChosen).
            toks = [f"t{k}" for k in rng.integers(0, 200000, size=ln)]
        else:
            toks = list(rng.choice(VOCAB, size=ln))
        texts.append(" ".join(toks))
        base.append(toks)
    # near-dup structure ~ sf0.1 (256 pairs / 5000 docs): mutate ~5% of docs
    # into a copy of an earlier doc with 1-2 token edits
    n_near = n // 20
    victims = rng.choice(np.arange(n // 10, n), size=n_near, replace=False)
    for v in victims:
        src = int(rng.integers(0, n // 10))
        toks = list(base[src])
        for _ in range(int(rng.integers(1, 3))):
            if len(toks) > 3:
                toks[int(rng.integers(0, len(toks)))] = str(rng.choice(VOCAB))
        texts[v] = " ".join(toks)
    # exact dups ~ 8 groups / 5000 docs
    for v in rng.choice(np.arange(n // 10, n), size=max(2, n // 600), replace=False):
        texts[v] = texts[int(rng.integers(0, n // 10))]
    # boilerplate phrase (repeated 10-token window) in ~1% of docs
    boiler = " ".join(VOCAB[:10])
    for v in rng.choice(n, size=n // 100, replace=False):
        texts[v] = texts[v] + " " + boiler
    if hot:
        # HOT-SHINGLE variant: a 60-token boilerplate block (license
        # header / site template archetype) in 30% of docs, so its
        # shingles' df ~ 0.3n and the plain inverted index's pair work
        # is quadratic in n — the regime the SSJoin prefix filter exists
        # for (Dedup.ngramJaccardPairsAutoChosen must flip paths here)
        hot_boiler = " ".join(str(rng.choice(VOCAB)) for _ in range(60))
        for v in rng.choice(n, size=(3 * n) // 10, replace=False):
            texts[v] = hot_boiler + " " + texts[v]
    return pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs),
        "source": pa.array(sources),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })

def gen_embeddings(n, rng, rare=False):
    # --rare holds cluster SIZE ~200 constant (cluster COUNT grows with the
    # corpus): real 100x corpora add more near-dup groups, they don't grow
    # each group 100x. A fixed k=32 makes the TRUE cos-threshold pair set
    # quadratic in n (in-cluster pairs ~ n^2/k) — at 500k vectors that is
    # ~625M genuine pairs, a fixture artifact no pair operator can emit
    # linearly.
    k, dim = (max(8, n // 200) if rare else 32), 64
    centers = rng.normal(size=(k, dim)).astype(np.float32)
    labels = rng.integers(0, k, size=n)
    vecs = centers[labels] + 0.6 * rng.normal(size=(n, dim)).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(vecs.astype(np.float32)),
                              pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32), pa.int32()),
    })

def gen_events(n, rng):
    t0 = np.datetime64("2024-01-01T00:00:00", "ns")
    span = np.timedelta64(30 * 24 * 3600 * 10**9, "ns")
    ts = t0 + (rng.random(size=n) * span.astype(np.int64)).astype("timedelta64[ns]")
    ts.sort()
    users = rng.integers(0, max(1500, n // 66), size=n)
    types = rng.choice(["click", "view", "purchase", "signup", "error"], size=n)
    value = np.round(rng.random(size=n) * 560, 2)
    props = [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, size=n)]
    return pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("ns")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(types),
        "value": pa.array(value, pa.float64()),
        "props": pa.array(props),
    })

def write_split(table, path, files, **kw):
    """Write a table as a DIRECTORY of `files` parquet parts — a single
    file reads as ONE input partition locally (no row-group splits at
    these sizes), which would serialize every map-side stage; real
    cluster tables are many files."""
    os.makedirs(path, exist_ok=True)
    n = table.num_rows
    step = (n + files - 1) // files
    for i in range(files):
        part = table.slice(i * step, step)
        if part.num_rows:
            pq.write_table(part, f"{path}/part-{i:04d}.parquet", **kw)

def main():
    hot = "--hot" in sys.argv
    rare = "--rare" in sys.argv
    argv = [a for a in sys.argv if a not in ("--hot", "--rare")]
    outdir, n_docs, n_vecs, n_events = argv[1], int(argv[2]), int(argv[3]), int(argv[4])
    files = int(argv[5]) if len(argv) > 5 else 16
    os.makedirs(outdir, exist_ok=True)
    # per-table rngs: regenerating with different table sizes (or changed
    # generation logic for one table) leaves the other tables bit-identical
    write_split(gen_documents(n_docs, np.random.default_rng(42), hot, rare),
                f"{outdir}/documents.parquet", files)
    write_split(gen_embeddings(n_vecs, np.random.default_rng(43), rare),
                f"{outdir}/embeddings.parquet", files)
    write_split(gen_events(n_events, np.random.default_rng(44)), f"{outdir}/events.parquet", files,
                coerce_timestamps=None, version="2.6")
    print(f"wrote {outdir}: docs={n_docs} vecs={n_vecs} events={n_events} files={files}")

if __name__ == "__main__":
    main()
