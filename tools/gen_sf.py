"""Generate an sf1.0-scale copy of the driver's synthetic testdata
(round-11 ask #5: sf1.0 spot-sweep of the most expensive registry
rows).

The driver's `/root/testdata` is read-only and stops at sf0.1, so this
reproduces its distribution family — measured off the real sf0.01 /
sf0.1 tables, see the constants — at an arbitrary scale factor, under
a scratch dir (NEVER `/root/testdata`). Hash-correctness at sf1.0 is
Spark-vs-DuckDB on the SAME generated files, so the generator does not
need to be bit-identical to the driver's; only the SHAPE (cardinality
scaling, value ranges, key coverage, token vocabulary) must match for
timing exponents to be meaningful.

Measured shape (sf0.1 ground truth):
- customer 150k/sf, supplier 10k/sf, part 200k/sf, orders 1.5M/sf,
  lineitem ~6M/sf (uniform 1..7 lines per order, avg 4.07),
  events 1M/sf (users 15k/sf, 5 uniform event types, exp(mean 50)
  values, 30 days of Jan-2024 timestamps), documents 50k/sf
  (31-token vocabulary, 10..100 tokens, lang {en .41, de .14, es .15,
  fr .15, zh .15}, source = doc_id % 20), embeddings 20k/sf
  (64-d random unit vectors, labels independent of geometry).
- part names: 8 adjectives x 8 nouns; brands Brand#1..25; 6 types;
  sizes 1..50; retail 900..1000.
- orders: status P/O/F uniform, 5 priorities uniform, dates uniform
  1995-01-01..2001-08-01; l_shipdate independent over the same range.

Usage: python tools/gen_sf.py [sf] [outdir] [--zipf A]
       (defaults: 1.0  /tmp/sfgen/sf1.0  uniform keys)
       --zipf 1.2 skews the fact-side join keys (o_custkey,
       l_partkey, l_suppkey, user_id, doc tokens) for skew-stress
       runs; dimensions and row counts stay identical.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
ADJS = ["red", "new", "old", "hot", "large", "blue", "cold", "small"]
NOUNS = ["gear", "gizmo", "ring", "widget", "anvil", "bolt", "plate", "rod"]
TYPES = ["SMALL", "MEDIUM", "ECONOMY", "STANDARD", "LARGE", "PROMO"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.14, 0.15, 0.15, 0.15]

EPOCH_1995 = np.datetime64("1995-01-01")
ORDER_SPAN_DAYS = 2404  # 1995-01-01 .. 2001-08-01
EVENTS_T0 = np.datetime64("2024-01-01T00:00:00.000000")
EVENTS_SPAN_US = 30 * 86_400 * 1_000_000


def _write(outdir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"))
    print(f"  {name:10} {table.num_rows:>10,} rows")


def _zipf_keys(rng, n: int, size: int, a: float) -> np.ndarray:
    """Zipf(a)-distributed keys over [0, n): P(k) ∝ 1/(k+1)^a via
    inverse-CDF over the exact normalized weights — key 0 is the
    hottest (at a=1.2, n=150k it draws ~2% of all rows vs 1/n=7e-6
    uniform, the 'one celebrity customer' shape a real 100 TB join
    sees)."""
    w = 1.0 / np.power(np.arange(1, n + 1, dtype="float64"), a)
    cdf = np.cumsum(w)
    cdf /= cdf[-1]
    return np.searchsorted(cdf, rng.random(size)).astype("int64")


def generate(sf: float, outdir: str, seed: int = 42, zipf: float = 0.0) -> None:
    """``zipf`` > 0 skews every fact-side JOIN/GROUP-BY key —
    o_custkey, l_partkey, l_suppkey, events.user_id, and the document
    token draws — with exponent ``zipf`` while keeping dimensions and
    row counts identical, so skewed-vs-uniform timing ratios isolate
    the effect of hot keys on the blocked/salted join paths
    (round-11 VERDICT ask #6)."""
    rng = np.random.default_rng(seed)

    def keys(n: int, size: int) -> np.ndarray:
        if zipf > 0:
            return _zipf_keys(rng, n, size, zipf)
        return rng.integers(0, n, size)

    os.makedirs(outdir, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_doc = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    _write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    _write(outdir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    }))
    _write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(0, 10_000, n_supp), 2),
    }))
    _write(outdir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": np.char.add(
            np.char.add(np.array(ADJS)[rng.integers(0, 8, n_part)], " "),
            np.array(NOUNS)[rng.integers(0, 8, n_part)],
        ),
        "p_brand": np.array(
            [f"Brand#{b}" for b in range(1, 26)]
        )[rng.integers(0, 25, n_part)],
        "p_type": np.array(TYPES)[rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
    }))

    odate = EPOCH_1995 + rng.integers(0, ORDER_SPAN_DAYS, n_ord).astype(
        "timedelta64[D]"
    )
    _write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(keys(n_cust, n_ord), pa.int64()),
        "o_orderstatus": np.array(["P", "O", "F"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": pa.array(
            odate.astype("datetime64[us]"), pa.timestamp("us")
        ),
        "o_orderpriority": np.array([
            "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
        ])[rng.integers(0, 5, n_ord)],
    }))

    lines_per = rng.integers(1, 8, n_ord)
    lkey = np.repeat(np.arange(n_ord), lines_per)
    n_li = len(lkey)
    lnum = np.concatenate([np.arange(1, k + 1) for k in lines_per])
    sdate = EPOCH_1995 + rng.integers(0, ORDER_SPAN_DAYS + 100, n_li).astype(
        "timedelta64[D]"
    )
    _write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(lkey, pa.int64()),
        "l_partkey": pa.array(keys(n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(keys(n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(lnum, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": pa.array(
            sdate.astype("datetime64[us]"), pa.timestamp("us")
        ),
    }))

    ets = EVENTS_T0 + np.sort(
        rng.integers(0, EVENTS_SPAN_US, n_ev)
    ).astype("timedelta64[us]")
    _write(outdir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ets, pa.timestamp("us")),
        "user_id": pa.array(keys(n_users, n_ev), pa.int64()),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(
            np.minimum(rng.exponential(50.0, n_ev), 600.0) + 0.01, 2
        ),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    }))

    tok = np.array(VOCAB)
    lens = rng.integers(10, 101, n_doc)
    flat = tok[keys(len(tok), int(lens.sum()))]
    texts, pos = [], 0
    for length in lens:
        texts.append(" ".join(flat[pos : pos + length]))
        pos += length
    _write(outdir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": np.array(LANGS)[
            rng.choice(len(LANGS), n_doc, p=LANG_P)
        ],
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    emb = rng.standard_normal((n_emb, 64)).astype("float32")
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    _write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))


if __name__ == "__main__":
    args = sys.argv[1:]
    zipf = 0.0
    if "--zipf" in args:
        i = args.index("--zipf")
        zipf = float(args[i + 1])
        del args[i : i + 2]
    sf = float(args[0]) if args else 1.0
    outdir = args[1] if len(args) > 1 else "/tmp/sfgen/sf1.0"
    print(f"generating sf={sf} under {outdir} (zipf={zipf or 'uniform'})")
    generate(sf, outdir, zipf=zipf)
