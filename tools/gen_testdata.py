#!/usr/bin/env python3
"""Seed-variation testdata generator (dev/audit tool, driver-side only).

Regenerates the synthetic star schema of TESTDATA.md — same schemas,
same category sets, same ranges and row counts — from a DIFFERENT rng
seed, so the full verify cycle can prove no query or oracle is
overfit to the seed=42 drop (quantized planes, md5 thresholds, tie
rules). Near-duplicate structure is planted explicitly (mutated doc
copies; a few nudged embedding copies) so dedup queries stay
non-vacuous at any seed.

Usage: python3 tools/gen_testdata.py --seed 7 --out target/testdata-seed7/sf0.01
"""
import argparse
import datetime as dt
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ("a agg batch big column customer data dup fast filter group hash "
         "join key line merge order part query row scan slow small sort "
         "spark stream table the value vector window").split()
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "MACHINERY", "FURNITURE", "BUILDING", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "SMALL", "STANDARD", "LARGE", "PROMO"]
COLORS = ["small", "red", "blue", "green", "large", "shiny", "dull", "old"]
NOUNS = ["ring", "widget", "bolt", "gear", "cog", "pin", "cap", "rod"]
EVENT_TYPES = ["click", "view", "signup", "purchase", "error"]
LANGS = ["en", "de", "fr", "es", "zh"]


def write(out, name, cols, schema=None):
    tbl = pa.table(cols, schema=schema)
    pq.write_table(tbl, os.path.join(out, f"{name}.parquet"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--scale", type=float, default=0.01)
    ap.add_argument("--tables", default=None,
                    help="comma list to generate only a subset (e.g. "
                         "documents,embeddings for the sf10 rehearsal). "
                         "Subset mode derives a PER-TABLE rng stream "
                         "(seed, table-index) so the output is independent "
                         "of which other tables are skipped; full mode "
                         "keeps the original single stream and stays "
                         "byte-identical to earlier drops.")
    a = ap.parse_args()
    # seed 42 at the driver's scales would shadow the official drop; at other
    # scales (e.g. --scale 1.0 for the sf1 rehearsal) it is the canonical seed.
    assert not (a.seed == 42 and a.scale in (0.001, 0.01, 0.1)), \
        "seed 42 at a driver scale is the driver's drop — pick another seed"
    os.makedirs(a.out, exist_ok=True)
    want = set(a.tables.split(",")) if a.tables else None
    def gen(name):
        return want is None or name in want
    r = np.random.default_rng(a.seed)
    def rng(table_index):
        # subset mode: a stream per table; full mode: the shared stream
        return (np.random.default_rng([a.seed, table_index])
                if want is not None else r)
    k = a.scale / 0.01  # row counts below are the sf0.01 reference counts

    n_cust, n_supp, n_part = int(1500 * k), int(100 * k), int(2000 * k)
    n_ord, n_li, n_ev = int(15000 * k), int(60000 * k), int(10000 * k)
    n_doc, n_emb = int(500 * k), int(500 * k)

    if gen("region"):
        write(a.out, "region",
              {"r_regionkey": pa.array(range(5), pa.int32()),
               "r_name": REGIONS})
    if gen("nation"):
        write(a.out, "nation",
              {"n_nationkey": pa.array(range(25), pa.int32()),
               "n_name": [f"NATION_{i}" for i in range(25)],
               "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())})
    if gen("customer"):
        r = rng(2)
        write(a.out, "customer",
              {"c_custkey": pa.array(range(n_cust), pa.int64()),
               "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
               "c_nationkey": pa.array(r.integers(0, 25, n_cust), pa.int32()),
               "c_acctbal": np.round(r.uniform(-999.99, 9999.99, n_cust), 2),
               "c_mktsegment": [SEGMENTS[i] for i in r.integers(0, 5, n_cust)]})
    if gen("supplier"):
        r = rng(3)
        write(a.out, "supplier",
              {"s_suppkey": pa.array(range(n_supp), pa.int64()),
               "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
               "s_nationkey": pa.array(r.integers(0, 25, n_supp), pa.int32()),
               "s_acctbal": np.round(r.uniform(-999.99, 9999.99, n_supp), 2)})
    if gen("part"):
        r = rng(4)
        write(a.out, "part",
              {"p_partkey": pa.array(range(n_part), pa.int64()),
               "p_name": [f"{COLORS[int(x)]} {NOUNS[int(y)]}"
                          for x, y in zip(r.integers(0, 8, n_part),
                                          r.integers(0, 8, n_part))],
               "p_brand": [f"Brand#{i}" for i in r.integers(0, 25, n_part)],
               "p_type": [PTYPES[i] for i in r.integers(0, 5, n_part)],
               "p_size": pa.array(r.integers(1, 51, n_part), pa.int32()),
               "p_retailprice": np.round(900.0 + (np.arange(n_part) % 1000) * 0.1, 2)})

    day0 = dt.datetime(1995, 1, 1)
    if gen("orders"):
        r = rng(5)
        odate = [day0 + dt.timedelta(days=int(d)) for d in r.integers(0, 2405, n_ord)]
        write(a.out, "orders",
              {"o_orderkey": pa.array(range(n_ord), pa.int64()),
               "o_custkey": pa.array(r.integers(0, n_cust, n_ord), pa.int64()),
               "o_orderstatus": [["O", "F", "P"][i] for i in r.integers(0, 3, n_ord)],
               "o_totalprice": np.round(r.uniform(1000.0, 500000.0, n_ord), 2),
               "o_orderdate": pa.array(odate, pa.timestamp("us")),
               "o_orderpriority": [PRIORITIES[i] for i in r.integers(0, 5, n_ord)]})

    if not gen("lineitem"):
        lo = None  # skip the uniqueness walk entirely
    else:
        r = rng(6)
        lo = r.integers(0, n_ord, n_li)
        lq = r.integers(1, 51, n_li).astype(float)
        sdate = [day0 + dt.timedelta(days=int(d)) for d in r.integers(1, 2500, n_li)]
        # Keep (l_orderkey, l_linenumber) UNIQUE: an order holds at most 7 lines
        # (TPC-H convention; MetadataStar derives run_id = orderkey*8 + linenumber
        # from it). Overflow lineitems are deterministically reassigned to the
        # next order with spare capacity instead of clamping the linenumber.
        linenum = np.zeros(n_li, dtype=np.int64)
        seen = {}
        for i in range(n_li):
            o = int(lo[i])
            while seen.get(o, 0) >= 7:
                o = (o + 1) % n_ord
            lo[i] = o
            seen[o] = seen.get(o, 0) + 1
            linenum[i] = seen[o]
        write(a.out, "lineitem",
              {"l_orderkey": pa.array(lo, pa.int64()),
               "l_partkey": pa.array(r.integers(0, n_part, n_li), pa.int64()),
               "l_suppkey": pa.array(r.integers(0, n_supp, n_li), pa.int64()),
               "l_linenumber": pa.array(linenum, pa.int32()),
               "l_quantity": lq,
               "l_extendedprice": np.round(lq * r.uniform(900.0, 2100.0, n_li), 2),
               "l_discount": np.round(r.integers(0, 11, n_li) * 0.01, 2),
               "l_tax": np.round(r.integers(0, 9, n_li) * 0.01, 2),
               "l_returnflag": [["A", "N", "R"][i] for i in r.integers(0, 3, n_li)],
               "l_linestatus": [["O", "F"][i] for i in r.integers(0, 2, n_li)],
               "l_shipdate": pa.array(sdate, pa.timestamp("us"))})

    if gen("events"):
        r = rng(7)
        t0 = dt.datetime(2024, 1, 1)
        ets = sorted(int(x) for x in r.integers(0, 30 * 86400 * 10**6, n_ev))
        write(a.out, "events",
              {"event_id": pa.array(range(n_ev), pa.int64()),
               "ts": pa.array([t0 + dt.timedelta(microseconds=u) for u in ets],
                              pa.timestamp("us")),
               "user_id": pa.array(r.integers(0, 150, n_ev), pa.int64()),
               "event_type": [EVENT_TYPES[i] for i in r.integers(0, 5, n_ev)],
               "value": np.round(r.uniform(0.01, 500.0, n_ev), 2),
               "props": [json.dumps({"k": int(i)}) for i in r.integers(0, 100, n_ev)]})

    # documents: word bags over the 31-word vocab, 10-99 words; ~12% are
    # MUTATED COPIES of an earlier doc (1-3 word substitutions) so minhash /
    # segment / cluster dedup queries stay non-vacuous at any seed
    if not gen("documents"):
        texts = None
    else:
        r = rng(8)
        texts = []
        for i in range(n_doc):
            if i > 0 and r.random() < 0.12:
                words = texts[int(r.integers(0, i))].split()
                for _ in range(int(r.integers(1, 4))):
                    words[int(r.integers(0, len(words)))] = VOCAB[int(r.integers(0, len(VOCAB)))]
                texts.append(" ".join(words))
            else:
                n = int(r.integers(10, 100))
                texts.append(" ".join(VOCAB[j] for j in r.integers(0, len(VOCAB), n)))
        write(a.out, "documents",
              {"doc_id": pa.array(range(n_doc), pa.int64()),
               "text": texts,
               "lang": [LANGS[i] for i in r.integers(0, 5, n_doc)],
               "source": [f"src{i}" for i in r.integers(0, 20, n_doc)],
               "n_chars": pa.array([len(t) for t in texts], pa.int64())})

    # embeddings: unit 64-d gaussian directions; ~5% are nudged copies of an
    # earlier vector (cos ~0.95+) so near-dup / cluster queries fire
    if gen("embeddings"):
        r = rng(9)
        E = r.standard_normal((n_emb, 64)).astype(np.float32)
        for i in range(1, n_emb):
            if r.random() < 0.05:
                j = int(r.integers(0, i))
                E[i] = E[j] + 0.15 * r.standard_normal(64).astype(np.float32)
        E = E / np.linalg.norm(E, axis=1, keepdims=True)
        write(a.out, "embeddings",
              {"vec_id": pa.array(range(n_emb), pa.int64()),
               "embedding": pa.array([row.tolist() for row in E],
                                     pa.list_(pa.float32())),
               "label": pa.array(r.integers(0, 10, n_emb), pa.int32())})
    print(f"wrote seed={a.seed} scale={a.scale} testdata to {a.out}")


if __name__ == "__main__":
    main()
