#!/usr/bin/env python3
"""Scale-rehearsal report (dev harness, driver-side python): reads two
bench_full.json artifacts (sf0.1 and sf1), calib-normalizes both, and
emits the per-query and per-family scaling exponents for docs/SCALE.md.

exponent = log(t_sf1 / t_sf0.1) / log(input ratio)

Input ratio is per table family: every table grows 10x from sf0.1 to sf1
except embeddings (2k -> 50k = 25x; gen_testdata floors the embedding
count at toy scale). e-queries read embeddings; everything else reads
the 10x tables. Exponent 1.0 = linear, <1 = amortizing fixed cost
(expected for sub-second queries dominated by per-job floor), >1 =
super-linear (a scale problem unless it is a documented worst-case
twin).

Usage: python3 tools/scale_report.py bench_sf01.json bench_sf1.json[,more_sf1.json...]

Either side may be a comma-separated list of quiet artifacts; the report
takes the per-query MIN of the calib-normalized values (min-of-runs — the
box oscillates +-45% day to day and a single 20-minute sweep can catch a
bad window on one heavy query).
"""
import json
import math
import sys


def norm_one(d):
    # value_norm when present; else rescale by calib (0.120 quiet ref)
    f = d.get("norm_factor") or (0.120 / d["calib_mt"] if d.get("calib_mt") else 1.0)
    qs = d.get("queries_norm") or {k: v * f for k, v in d["queries"].items()}
    return {k: v for k, v in qs.items() if v > 0}


def norm(paths):
    merged = {}
    for p in paths.split(","):
        for k, v in norm_one(json.load(open(p))).items():
            merged[k] = min(v, merged.get(k, float("inf")))
    return merged


RATIO_OVERRIDE = {
    # mixed-input queries dominated by their embeddings side (25x),
    # despite the d prefix: d30/d30b join the lexical pair surface with
    # e02/e07b's semantic one
    "d30_lexsem_audit": 25.0,
    "d30b_lexsem_audit_stored": 25.0,
}


def ratio_for(name):
    return RATIO_OVERRIDE.get(name, 25.0 if name.startswith("e") else 10.0)


# documented worst-case / from-scratch twins: super-linear or
# rebuild-priced BY DESIGN (their production twins are the b/stored ones)
WORST_CASE = {"d26_incr_minhash", "d30_lexsem_audit", "q48_dup_clusters",
              "d33_incr_clusters", "e12_incr_semclusters", "d04_ngram_jaccard",
              "e01_knn_brute", "e02_cosine_neardup", "e05_semantic_clusters",
              "e07_incr_neardup", "d06_minhash_dedup"}


def main(p01, p1):
    a, b = norm(p01), norm(p1)
    rows = []
    for k in sorted(set(a) & set(b)):
        r = ratio_for(k)
        exp = math.log(b[k] / a[k]) / math.log(r)
        rows.append((k, a[k], b[k], exp))
    fams = {}
    for k, t0, t1, e in rows:
        fam = k.split("_")[0][0]
        fams.setdefault(fam, []).append((k, t0, t1))
    print(f"{'query':32s} {'sf0.1':>8s} {'sf1':>8s} {'exp':>6s}")
    for k, t0, t1, e in sorted(rows, key=lambda x: -x[3]):
        flag = " WORST-CASE-TWIN" if k in WORST_CASE and e > 1.05 else (
            " <-- SUPER-LINEAR" if e > 1.05 else "")
        print(f"{k:32s} {t0:8.3f} {t1:8.3f} {e:6.2f}{flag}")
    print()
    for fam in sorted(fams):
        t0 = sum(x for _, x, _ in fams[fam])
        t1 = sum(y for _, _, y in fams[fam])
        # time-weighted mean of per-query ratios, so RATIO_OVERRIDE
        # members (e.g. d30* at 25x inside family d) keep their own
        # input ratio instead of inheriting the family letter's
        r = math.exp(sum(t * math.log(ratio_for(k)) for k, t, _ in fams[fam]) / t0)
        print(f"family {fam}: {t0:7.1f}s -> {t1:7.1f}s  "
              f"aggregate exp {math.log(t1 / t0) / math.log(r):.2f}")
    t0, t1 = sum(r[1] for r in rows), sum(r[2] for r in rows)
    print(f"TOTAL (common queries): {t0:.1f}s -> {t1:.1f}s  ({t1 / t0:.1f}x for 10x data)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
