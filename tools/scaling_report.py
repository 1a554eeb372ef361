#!/usr/bin/env python3
"""Join two Bench subset records (sf0.1 and sf1.0) into the SCALING.md
per-query table: t(sf1)/t(sf0.1) ratio and the implied scaling exponent
log_g(ratio), where g is the query's own INPUT growth between the two
records (the driver's law grows most tables 10x per decade but
embeddings only 4x). exponent 1.0 = linear in the input, <1 sublinear,
>1 superlinear. Dev tool only.

Usage: python3 tools/scaling_report.py target/scaling_sf01.json target/scaling_sf10.json
"""
import json, math, sys

# queries whose dominant input is the embeddings table (4x per decade
# under the driver's observed law); everything else reads a 10x table
EMB_QUERIES = {
    "dedup_embed", "dedup_embed_blocked", "embed_kmeans", "ann_ivf",
    "ann_graph", "ann_recall_sq", "ann_lsh", "ann_bruteforce", "ann_pq",
    "ann_sq", "ann_ivf_pq", "ann_mmr", "sample_kcenter", "embed_pca",
    "embed_hubness", "embed_lof", "cluster_nmi", "cluster_db_index",
    "embed_silhouette", "embed_outliers",
}

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
qa, qb = a["queries"], b["queries"]
print("| query | input growth | t(sf0.1) s | t(sf1.0) s | ratio | exponent |")
print("| --- | --- | --- | --- | --- | --- |")
rows = []
for q in sorted(qa, key=lambda q: -qb.get(q, 0)):
    ta, tb = qa[q], qb.get(q)
    g = 4.0 if q in EMB_QUERIES else 10.0
    if tb is None or ta <= 0 or tb <= 0:
        rows.append((q, g, ta, tb, None, None))
        continue
    r = tb / ta
    rows.append((q, g, ta, tb, r, math.log(r) / math.log(g)))
for q, g, ta, tb, r, e in rows:
    if r is None:
        print(f"| {q} | {g:.0f}× | {ta:.2f} | FAILED | — | — |")
    else:
        print(f"| {q} | {g:.0f}× | {ta:.2f} | {tb:.2f} | {r:.1f}× | {e:.2f} |")
ok = [x for x in rows if x[4]]
tot_a = sum(x[2] for x in ok)
tot_b = sum(x[3] for x in ok)
print(f"\ntotals: {tot_a:.1f} s -> {tot_b:.1f} s "
      f"(ratio {tot_b/tot_a:.1f}x, exponent vs 10x {math.log10(tot_b/tot_a):.2f})")
print(f"calib sf0.1 run: {a['calib_sec']:.3f}/{a['calib_par_sec']:.3f}  "
      f"sf1.0 run: {b['calib_sec']:.3f}/{b['calib_par_sec']:.3f}  "
      f"boot {a['boot_id'][:8]}/{b['boot_id'][:8]}")
