"""Deterministic synthetic-data generator for LARGE-scale probes.

The driver testdata stops at sf0.1 and its `documents` corpus draws from
a 31-word vocabulary, so its 3-gram shingle space SATURATES (~30k
distinct shingles): by sf1.0 nearly every shingle would exceed the df=20
boilerplate cap and the pair joins would degenerate to empty — a probe
on that distribution measures the cap, not the operator. This generator
produces a self-consistent series (same generator, same seed, 100× row
span) with a scale-REALISTIC corpus instead:

- documents: a 31-word common core (60% of tokens — these saturate and
  get df-capped, like web boilerplate) + a Zipf long tail whose vocab
  grows with corpus size (Heaps-law-ish), so rare shingles stay rare at
  every SF — the regime the dedup pair operators are built for;
  a constant 5% planted near-dup fraction + 1% exact dups, so true-pair
  output scales LINEARLY in n_docs (as in real corpora).
- TPC-H-ish star tables with the driver's schemas/distributions
  (verified against /root/testdata/sf0.01 column stats) so the graph /
  join probes run unchanged.

Usage:
    python tools/gen_scale_data.py OUTDIR SF     # e.g. .scaledata/sfx1.0 1.0

Determinism: numpy default_rng(42 + table-specific offset); no time,
no os.urandom. Row counts scale linearly: sf=0.01 reproduces the driver
counts (500 docs, 60k lineitem, 10k events).

``--skew`` (VERDICT r10 task 4) switches every join/group key that the
base generator draws UNIFORMLY to a Zipf(s=1.2) rank draw — real
corpora and clickstreams are Zipfian, and uniform keys never exercise
AQE skew-join splitting, stragglers, or salting paths. Skewed columns:
events.user_id, orders.o_custkey, lineitem.l_partkey / l_suppkey, and
documents.source (one boilerplate-farm source emitting ~a third of the
corpus). The hottest key is rank 0 with P ~ 1/H_n ≈ 10-20% of all rows
at these cardinalities. Value/text distributions are untouched, so the
same DuckDB oracles stay valid on a skewed directory.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CORE_VOCAB = [
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "merge", "batch", "window", "spark", "order", "data", "column",
    "join", "small", "line", "customer", "query", "the", "a", "big",
    "stream", "filter", "sort", "index", "group", "plan",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.14, 0.15]
EVENT_TYPES = ["view", "click", "purchase", "error", "signup"]
SEGMENTS = ["AUTOMOBILE", "HOUSEHOLD", "FURNITURE", "MACHINERY", "BUILDING"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_NAMES_A = ["small", "red", "blue", "green", "large", "tiny", "shiny", "dull"]
P_NAMES_B = ["ring", "widget", "bolt", "gear", "cog", "pin", "nut", "washer"]
P_TYPES = ["ECONOMY", "SMALL", "STANDARD", "LARGE", "PROMO"]


def _write(outdir: str, name: str, table: pa.Table) -> None:
    # Bounded row groups (r12): pyarrow's 1M-row default wrote the
    # 500k-doc sfx10 corpus as ONE row group — Spark then scheduled 18
    # byte-range tasks of which 17 were empty (a parquet task only
    # materializes row groups whose midpoint lands in its range), and
    # the whole scan+explode serialized on one core. 50k-row groups
    # keep single-file stores scannable at real parallelism, like the
    # many-file layout a production store would have. (The engine-side
    # _widen guard also covers pathological single-group inputs.)
    pq.write_table(
        table,
        os.path.join(outdir, f"{name}.parquet"),
        version="2.6",
        row_group_size=50_000,
    )


def _zipf_keys(rng: np.random.Generator, n_keys: int, size: int, s: float = 1.2) -> np.ndarray:
    """Zipf(s) draw over [0, n_keys): key k has P ∝ 1/(k+1)^s, so key 0
    is the hot key. Exact rank probabilities (not numpy's unbounded
    rng.zipf), so the skew profile is identical at every SF."""
    ranks = np.arange(1, n_keys + 1, dtype=np.float64)
    p = 1.0 / ranks**s
    p /= p.sum()
    return rng.choice(n_keys, size=size, p=p)


def gen_documents(outdir: str, n_docs: int, skew: bool = False) -> None:
    rng = np.random.default_rng(42)
    tail_size = max(1000, n_docs)  # Heaps-law-ish vocab growth
    tail = np.array([f"t{i}" for i in range(tail_size)])
    # Zipf ranks for the tail: P(rank r) ∝ 1/r^1.1
    ranks = np.arange(1, tail_size + 1, dtype=np.float64)
    zipf_p = 1.0 / ranks**1.1
    zipf_p /= zipf_p.sum()
    core = np.array(CORE_VOCAB)

    lengths = rng.integers(10, 101, size=n_docs)
    texts: list[str] = []
    for i in range(n_docs):
        ln = int(lengths[i])
        is_core = rng.random(ln) < 0.6
        toks = np.where(
            is_core,
            core[rng.integers(0, len(core), size=ln)],
            tail[rng.choice(tail_size, size=ln, p=zipf_p)],
        )
        texts.append(" ".join(toks.tolist()))

    # plant near-dups (5%: copy an earlier doc, perturb ~10% of tokens)
    # and exact dups (1%) — constant FRACTION, so pair output is linear.
    n_near, n_exact = n_docs // 20, n_docs // 100
    victims = rng.choice(np.arange(n_docs // 2, n_docs), size=n_near + n_exact, replace=False)
    for j, v in enumerate(victims):
        src = int(rng.integers(0, n_docs // 2))
        if j < n_exact:
            texts[int(v)] = texts[src]
        else:
            toks = texts[src].split()
            n_mut = max(1, len(toks) // 10)
            for pos in rng.choice(len(toks), size=n_mut, replace=False):
                toks[int(pos)] = str(core[int(rng.integers(0, len(core)))])
            texts[int(v)] = " ".join(toks)

    langs = rng.choice(LANGS, size=n_docs, p=LANG_P)
    if skew:
        # one boilerplate-farm source dominates (Zipf over 20 sources:
        # src0 gets ~35% of docs) — the hot-document-class probe
        sources = np.array([f"src{i}" for i in _zipf_keys(rng, 20, n_docs)])
    else:
        sources = np.array([f"src{i}" for i in rng.integers(0, 20, size=n_docs)])
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs.tolist(), type=pa.string()),
            "source": pa.array(sources.tolist(), type=pa.string()),
            "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
        }
    )
    _write(outdir, "documents", tbl)


def gen_embeddings(outdir: str, n_vecs: int, dim: int = 64) -> None:
    rng = np.random.default_rng(43)
    # Cluster COUNT scales with corpus size (constant ~50-vector cluster
    # size): more data means more distinct items, not denser copies of
    # the same 8 items. Tight fixed-count clusters make every
    # within-cluster pair a near-duplicate, so threshold-pair output
    # grows quadratically — unrealistic for a real corpus, where
    # near-dup pairs are a constant fraction (linear). The `label`
    # column stays 8-ary (cluster id mod 8) to match the driver schema.
    n_clusters = max(8, n_vecs // 50)
    centers = rng.normal(0, 1, size=(n_clusters, dim))
    cluster_of = rng.integers(0, n_clusters, size=n_vecs)
    labels = (cluster_of % 8).astype(np.int64)
    # wide within-cluster spread: members share a region, not an identity
    vecs = 0.45 * centers[cluster_of] + rng.normal(0, 1.0, size=(n_vecs, dim))
    # plant near-identical pairs (2%) so cosine-threshold ops find pairs
    n_pairs = n_vecs // 50
    a = rng.choice(n_vecs // 2, size=n_pairs, replace=False)
    b = a + n_vecs // 2
    vecs[b] = vecs[a] + rng.normal(0, 0.01, size=(n_pairs, dim))
    flat = pa.array(vecs.astype(np.float32).ravel(), type=pa.float32())
    emb = pa.FixedSizeListArray.from_arrays(flat, dim).cast(pa.list_(pa.float32()))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n_vecs, dtype=np.int64)),
            "embedding": emb,
            "label": pa.array(labels.astype(np.int32)),
        }
    )
    _write(outdir, "embeddings", tbl)


def gen_events(outdir: str, n_events: int, skew: bool = False) -> None:
    rng = np.random.default_rng(44)
    n_users = max(50, n_events // 67)
    start_ns = np.datetime64("2024-01-01T00:00:00", "ns").astype(np.int64)
    span_ns = 30 * 24 * 3600 * 10**9  # 30 days regardless of SF
    ts = np.sort(start_ns + (rng.random(n_events) * span_ns).astype(np.int64))
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n_events, dtype=np.int64)),
            "ts": pa.array(ts).cast(pa.timestamp("ns")),
            "user_id": pa.array(
                _zipf_keys(rng, n_users, n_events)
                if skew
                else rng.integers(0, n_users, size=n_events)
            ),
            "event_type": pa.array(
                np.array(EVENT_TYPES)[rng.integers(0, 5, size=n_events)].tolist()
            ),
            "value": pa.array(np.round(rng.exponential(50.0, size=n_events), 2)),
            "props": pa.array(
                [f'{{"k": {k}}}' for k in rng.integers(0, 100, size=n_events)]
            ),
        }
    )
    _write(outdir, "events", tbl)


def gen_tpch(outdir: str, sf: float, skew: bool = False) -> None:
    rng = np.random.default_rng(45)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)

    _write(outdir, "region", pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": pa.array(["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]),
    }))
    _write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array((np.arange(25) % 5).astype(np.int32)),
    }))
    _write(outdir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, size=n_cust).astype(np.int32)),
        "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, size=n_cust), 2)),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, size=n_cust)].tolist()),
    }))
    _write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, size=n_supp).astype(np.int32)),
        "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, size=n_supp), 2)),
    }))
    _write(outdir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_name": pa.array([
            f"{P_NAMES_A[i % 8]} {P_NAMES_B[(i // 8) % 8]}" for i in range(n_part)
        ]),
        "p_brand": pa.array([f"Brand#{int(b)}" for b in rng.integers(1, 26, size=n_part)]),
        "p_type": pa.array(np.array(P_TYPES)[rng.integers(0, 5, size=n_part)].tolist()),
        "p_size": pa.array(rng.integers(1, 51, size=n_part).astype(np.int32)),
        "p_retailprice": pa.array(np.round(900.0 + 0.1 * np.arange(n_part), 2)),
    }))

    day_us = 24 * 3600 * 10**6
    o_date_start = np.datetime64("1995-01-01", "us").astype(np.int64)
    o_days = rng.integers(0, 2400, size=n_ord)
    _write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(
            _zipf_keys(rng, n_cust, n_ord) if skew else rng.integers(0, n_cust, size=n_ord)
        ),
        "o_orderstatus": pa.array(np.array(["F", "O", "P"])[rng.integers(0, 3, size=n_ord)].tolist()),
        "o_totalprice": pa.array(np.round(rng.uniform(1000, 500000, size=n_ord), 2)),
        "o_orderdate": pa.array(o_date_start + o_days * day_us).cast(pa.timestamp("us")),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, size=n_ord)].tolist()),
    }))

    # ~4 lines/order (1..7), l_shipdate = o_orderdate + 1..95 days
    n_lines = rng.integers(1, 8, size=n_ord)
    l_orderkey = np.repeat(np.arange(n_ord, dtype=np.int64), n_lines)
    n_li = len(l_orderkey)
    l_linenumber = np.concatenate([np.arange(1, k + 1) for k in n_lines]).astype(np.int32)
    ship = (
        np.repeat(o_date_start + o_days * day_us, n_lines)
        + rng.integers(1, 96, size=n_li) * day_us
    )
    _write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey),
        "l_partkey": pa.array(
            _zipf_keys(rng, n_part, n_li) if skew else rng.integers(0, n_part, size=n_li)
        ),
        "l_suppkey": pa.array(
            _zipf_keys(rng, n_supp, n_li) if skew else rng.integers(0, n_supp, size=n_li)
        ),
        "l_linenumber": pa.array(l_linenumber),
        "l_quantity": pa.array(rng.integers(1, 51, size=n_li).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(rng.uniform(900, 100000, size=n_li), 2)),
        "l_discount": pa.array(np.round(rng.integers(0, 11, size=n_li) / 100.0, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, size=n_li) / 100.0, 2)),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, size=n_li)].tolist()),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, size=n_li)].tolist()),
        "l_shipdate": pa.array(ship).cast(pa.timestamp("us")),
    }))


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--skew"]
    skew = "--skew" in sys.argv[1:]
    outdir = args[0]
    sf = float(args[1])
    os.makedirs(outdir, exist_ok=True)
    gen_documents(outdir, int(50_000 * sf), skew=skew)
    gen_embeddings(outdir, int(20_000 * sf))
    gen_events(outdir, int(1_000_000 * sf), skew=skew)
    gen_tpch(outdir, sf, skew=skew)
    print(f"wrote {outdir} at sf={sf} skew={skew}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
