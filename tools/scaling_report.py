#!/usr/bin/env python3
"""Join two Bench subset records (one decade apart) into the SCALING.md
per-query table: t(big)/t(small) ratio and the implied scaling exponent
log_g(ratio), where g is the query's own INPUT growth between the two
records:

 - embeddings readers grow 4x per decade (the driver's observed law);
 - documents readers are normalized by the decade's measured BYTE
   growth (pass as argv[3]; the ScaleGen token perturbation adds ~16%
   chars per decade, so a byte-linear scan reads ~11.3x on a 10x-row
   decade — exponent 1.0 should mean byte-linear, not that artifact);
 - everything else (events, TPC-H) grows 10x in rows and bytes.

exponent 1.0 = linear in the input, <1 sublinear (fixed overheads
still amortizing), >1 super-linear. Dev tool only.

Usage: python3 tools/scaling_report.py <small.json> <big.json> [docByteGrowth=10]
"""
import json, math, sys

EMB_QUERIES = {
    "dedup_embed", "dedup_embed_blocked", "embed_kmeans", "ann_ivf",
    "ann_graph", "ann_recall_sq", "ann_lsh", "ann_bruteforce", "ann_pq",
    "ann_sq", "ann_ivf_pq", "ann_mmr", "sample_kcenter", "embed_pca",
    "embed_hubness", "embed_lof", "cluster_nmi", "cluster_db_index",
    "embed_silhouette", "embed_outliers",
}
DOC_QUERIES = {
    "dedup_containment", "dedup_substr", "dedup_minhash",
    "quality_fineweb", "quality_gopher", "search_substring",
    "corpus_funnel", "train_classifier", "tokenize_bpe", "dedup_exact_hash",
    "text_perplexity2", "train_dsir", "mm_phash",
}

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
doc_g = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
qa, qb = a["queries"], b["queries"]
print("| query | input growth | t(small) s | t(big) s | ratio | exponent |")
print("| --- | --- | --- | --- | --- | --- |")
rows = []
dropped = []
for q in sorted(qa, key=lambda q: -(qb.get(q) or 0)):
    ta, tb = qa[q], qb.get(q)
    g = 4.0 if q in EMB_QUERIES else (doc_g if q in DOC_QUERIES else 10.0)
    if tb is None or ta <= 0 or tb <= 0:
        # keep the distinction: absent from the big run vs present with
        # a non-positive (unusable) timing in either record
        why = "MISSING" if tb is None else "BAD-TIMING"
        rows.append((q, g, ta, tb, None, why))
        dropped.append((q, why, ta, tb))
        continue
    r = tb / ta
    rows.append((q, g, ta, tb, r, math.log(r) / math.log(g)))
for q, g, ta, tb, r, e in rows:
    if r is None:
        tb_cell = "MISSING" if e == "MISSING" else f"{tb:.2f}?"
        print(f"| {q} | {g:.2f}× | {ta:.2f} | {tb_cell} | — | — |")
    else:
        print(f"| {q} | {g:.2f}× | {ta:.2f} | {tb:.2f} | {r:.1f}× | {e:.2f} |")
ok = [x for x in rows if x[4]]
tot_a = sum(x[2] for x in ok)
tot_b = sum(x[3] for x in ok)
partial = f" [PARTIAL: {len(dropped)} rows dropped: " + \
    ", ".join(f"{q}({why})" for q, why, _, _ in dropped) + "]" if dropped else ""
print(f"\ntotals: {tot_a:.1f} s -> {tot_b:.1f} s "
      f"(ratio {tot_b/tot_a:.1f}x, exponent vs 10x {math.log10(tot_b/tot_a):.2f}){partial}")
print(f"calib small run: {a['calib_sec']:.3f}/{a['calib_par_sec']:.3f}  "
      f"big run: {b['calib_sec']:.3f}/{b['calib_par_sec']:.3f}  "
      f"boot {a['boot_id'][:8]}/{b['boot_id'][:8]}")
