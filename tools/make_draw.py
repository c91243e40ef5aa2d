#!/usr/bin/env python3
"""Synthesize an INDEPENDENT draw of the round testdata (VERDICT r14 #6).

The driver re-rolls /root/testdata/sf* every round, so per-query bench
times move with draw-sensitive quantities (distinct value cardinality,
near-dup pair volume, vocabulary size) even when the code is identical.
A baseline recorded from ONE draw under-states that variance; this tool
generates a second draw from the same distribution family — fit by
inspection of the live testdata (documented per-column below) — so
tools/record_baseline.py --draw2 can fold an observed same-code
cross-draw spread into EVERY query's MAD in one refresh.

Distribution model (verified against the 2026-08-16 sf0.1 draw):
  customer   c_custkey 0..n; "Customer#%09d"; nationkey U{0..24};
             acctbal round(U(-1000,10000),2); mktsegment U{5}
  supplier   same shape, "Supplier#%09d"
  part       name = U{8 adj} + " " + U{8 noun}; Brand#U{1..25}; U{6 types};
             size U{1..50}; retailprice = 900+(key%1000)/10 (deterministic)
  orders     custkey U; status U{P,O,F}; totalprice round(U(1e3,5e5),2);
             orderdate uniform day 1995-01-01..2001-08-01; priority U{5}
  lineitem   orderkey U (independent per row -> Poisson(4) lines/order);
             partkey/suppkey U; linenumber U{1..7}; quantity U{1..50};
             extendedprice round(U(900,105000),2); discount {0..0.10};
             tax {0..0.08}; returnflag U{N,R,A}; linestatus U{F,O};
             shipdate uniform day 1995-01-02..2001-11-04
  events     ts = 2024-01-01 + cumsum(Exp(mean 30d/n)); user U{0..15000*sf};
             type U{5}; value round(Exp(50),2); props '{"k": U{0..99}}'
  documents  5% of positions are near-dups (random earlier doc + " dup",
             chains possible); fresh docs U{10..100} words from the fixed
             30-word vocab; lang {en:.4, zh/es/fr/de:.15}; source = id%20
  embeddings N(0,1,64) float32 L2-normalized; label U{0..9}
  region/nation copied from the live draw (fixed dimensions)

Usage: tools/make_draw.py <outDir> [seed] [sf] [srcDir] [flags]
  seed default 20260816, sf default 0.1,
  srcDir default /root/testdata/sf0.1 (region/nation source only).

Flags (measurement draws; VERDICT r16 #5/#6):
  --plant-parallel   plant TRUE cross-language parallel structure in the
      embeddings: every non-en doc with a vector is paired one-to-one
      with an en doc and its embedding becomes the en doc's plus N(0,
      0.05²) noise (cos ≈ 0.98 vs ≈ 0 background at dim 64) — the
      sharp-margin shape a real bitext corpus has and the synthetic
      default lacks. The planted truth is written to
      planted_pairs.parquet (src_id, tgt_id) for graded readouts.
  --vocab-mult=N     multiply the document vocabulary N× (each of the 30
      base words gets N numbered variants) — the vocabulary-heavy draw
      that prices type-bounded incremental operators (IncrementalTokens
      / IncrementalLm): per-increment cost should go ~flat as types
      saturate, not track corpus volume.
"""
import json
import os
import sys

import numpy as np
import pandas as pd


VOCAB = ("a agg batch big column customer data fast filter group hash join "
         "key line merge order part query row scan slow small sort spark "
         "stream table the value vector window").split()
ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["signup", "purchase", "view", "click", "error"]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]


def write(out_dir, name, df):
    df.to_parquet(os.path.join(out_dir, f"{name}.parquet"), index=False)
    print(f"  {name}: {len(df)} rows")


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    plant_parallel = "--plant-parallel" in flags
    vocab_mult = next((int(f.split("=", 1)[1]) for f in flags
                       if f.startswith("--vocab-mult=")), 1)
    out_dir = pos[0]
    seed = int(pos[1]) if len(pos) > 1 else 20260816
    sf = float(pos[2]) if len(pos) > 2 else 0.1
    src = pos[3] if len(pos) > 3 else "/root/testdata/sf0.1"
    # letter suffixes, not digits: the tokenizer faces segment per
    # LETTER-RUN type (Bpe.pieces), so "key17" would pre-tokenize back to
    # the base vocab + digits and multiply nothing — "keyab" is one run
    # two letters = 676 distinct suffixes; REFUSE anything past that
    # (ADVICE r17: the generator silently wrapped for N > 676, producing
    # duplicate words so the draw multiplied the vocab less than claimed;
    # asserting — rather than widening to 3 letters — keeps the committed
    # --vocab-mult=100 measurement draws byte-reproducible)
    assert vocab_mult <= 676, \
        f"--vocab-mult={vocab_mult} > 676: 2-letter suffixes would wrap"

    def sfx(j):
        return "" if vocab_mult <= 1 else \
            chr(97 + j // 26 % 26) + chr(97 + j % 26)
    vocab = (VOCAB if vocab_mult <= 1 else
             [f"{w}{sfx(j)}" for w in VOCAB for j in range(vocab_mult)])
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)

    n_cust = int(150000 * sf)
    n_supp = int(10000 * sf)
    n_part = int(200000 * sf)
    n_ord = int(1500000 * sf)
    n_li = int(6000000 * sf)
    n_ev = int(1000000 * sf)
    n_doc = int(50000 * sf)
    n_emb = max(500, int(20000 * sf))

    # fixed dimensions: copy from the live draw
    for t in ("region", "nation"):
        write(out_dir, t, pd.read_parquet(os.path.join(src, f"{t}.parquet")))

    k = np.arange(n_cust)
    write(out_dir, "customer", pd.DataFrame({
        "c_custkey": k,
        "c_name": [f"Customer#{i:09d}" for i in k],
        "c_nationkey": rng.integers(0, 25, n_cust, dtype=np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": rng.choice(SEGMENTS, n_cust)}))

    k = np.arange(n_supp)
    write(out_dir, "supplier", pd.DataFrame({
        "s_suppkey": k,
        "s_name": [f"Supplier#{i:09d}" for i in k],
        "s_nationkey": rng.integers(0, 25, n_supp, dtype=np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2)}))

    k = np.arange(n_part)
    write(out_dir, "part", pd.DataFrame({
        "p_partkey": k,
        "p_name": [f"{a} {n}" for a, n in zip(
            rng.choice(ADJ, n_part), rng.choice(NOUN, n_part))],
        "p_brand": [f"Brand#{b}" for b in rng.integers(1, 26, n_part)],
        "p_type": rng.choice(PTYPES, n_part),
        "p_size": rng.integers(1, 51, n_part, dtype=np.int32),
        "p_retailprice": 900.0 + (k % 1000) / 10.0}))

    k = np.arange(n_ord)
    odate = (np.datetime64("1995-01-01") +
             rng.integers(0, 2405, n_ord).astype("timedelta64[D]"))
    write(out_dir, "orders", pd.DataFrame({
        "o_orderkey": k,
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": rng.choice(["P", "O", "F"], n_ord),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": odate.astype("datetime64[us]"),
        "o_orderpriority": rng.choice(PRIORITIES, n_ord)}))

    sdate = (np.datetime64("1995-01-02") +
             rng.integers(0, 2499, n_li).astype("timedelta64[D]"))
    write(out_dir, "lineitem", pd.DataFrame({
        "l_orderkey": rng.integers(0, n_ord, n_li),
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": rng.integers(1, 8, n_li, dtype=np.int32),
        "l_quantity": rng.integers(1, 51, n_li).astype(float),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": rng.choice(["N", "R", "A"], n_li),
        "l_linestatus": rng.choice(["F", "O"], n_li),
        "l_shipdate": sdate.astype("datetime64[us]")}))

    mean_gap_us = 30 * 86400 * 1e6 / n_ev
    ts = (np.datetime64("2024-01-01") + np.cumsum(
        rng.exponential(mean_gap_us, n_ev)).astype("timedelta64[us]"))
    write(out_dir, "events", pd.DataFrame({
        "event_id": np.arange(n_ev),
        "ts": ts,
        "user_id": rng.integers(0, int(15000 * sf), n_ev),
        "event_type": rng.choice(ETYPES, n_ev),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [json.dumps({"k": int(x)})
                  for x in rng.integers(0, 100, n_ev)]}))

    texts = []
    dup_pos = set(rng.choice(np.arange(1, n_doc), int(0.05 * n_doc),
                             replace=False).tolist())
    for i in range(n_doc):
        if i in dup_pos:
            texts.append(texts[int(rng.integers(0, i))] + " dup")
        else:
            nw = int(rng.integers(10, 101))
            texts.append(" ".join(rng.choice(vocab, nw)))
    langs = rng.choice(LANGS, n_doc, p=LANG_P)
    write(out_dir, "documents", pd.DataFrame({
        "doc_id": np.arange(n_doc),
        "text": texts,
        "lang": langs,
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": [len(t) for t in texts]}))

    m = rng.standard_normal((n_emb, 64)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    if plant_parallel:
        # one-to-one en↔non-en pairing inside the vector range: the tgt
        # vector becomes its src's + small noise, renormalized — every
        # planted pair has cos ≈ 0.98 against a ≈ N(0, 1/64) background,
        # the sharp-margin structure bitext mining exists to find
        vec_langs = langs[:n_emb]
        en_ids = np.flatnonzero(vec_langs == "en")
        tgt_ids = np.flatnonzero(vec_langs != "en")
        n_pair = min(len(en_ids), len(tgt_ids))
        src_ids, tgt_ids = en_ids[:n_pair], tgt_ids[:n_pair]
        noise = 0.05 * rng.standard_normal((n_pair, 64)).astype(np.float32)
        m[tgt_ids] = m[src_ids] + noise
        m[tgt_ids] /= np.linalg.norm(m[tgt_ids], axis=1, keepdims=True)
        write(out_dir, "planted_pairs", pd.DataFrame({
            "src_id": src_ids.astype(np.int64),
            "tgt_id": tgt_ids.astype(np.int64)}))
    write(out_dir, "embeddings", pd.DataFrame({
        "vec_id": np.arange(n_emb),
        "embedding": list(m),
        "label": rng.integers(0, 10, n_emb).astype(np.int32)}))
    print(f"wrote draw seed={seed} sf={sf} to {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
