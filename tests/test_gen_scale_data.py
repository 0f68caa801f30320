"""tools/gen_scale_data.py — the generator behind the SCALING_sf1
probe evidence. Pins determinism (identical bytes across runs),
schema parity with the driver tables, and the distribution properties
the probe's validity rests on (Heaps-law vocab growth, constant
planted-dup fraction, linear row counts)."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools import gen_scale_data as G  # noqa: E402


def _gen(tmp_path: Path, name: str, sf: float) -> Path:
    out = tmp_path / name
    out.mkdir()
    G.gen_documents(str(out), int(50_000 * sf))
    G.gen_embeddings(str(out), int(20_000 * sf))
    G.gen_events(str(out), int(1_000_000 * sf))
    G.gen_tpch(str(out), sf)
    return out


def test_generator_is_deterministic(tmp_path):
    a = _gen(tmp_path, "a", 0.002)
    b = _gen(tmp_path, "b", 0.002)
    for f in sorted(a.glob("*.parquet")):
        assert f.read_bytes() == (b / f.name).read_bytes(), f.name


def test_schemas_match_driver_tables(tmp_path):
    out = _gen(tmp_path, "s", 0.002)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        mine = con.execute(f"DESCRIBE SELECT * FROM '{out}/{t}.parquet'").df()
        ref = con.execute(
            f"DESCRIBE SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'"
        ).df()
        assert list(mine.column_name) == list(ref.column_name), t
        # events.ts storage differs by design (ns vs driver's per-SF
        # choice) — load_table normalizes both; all other types match
        for c, mt, rt in zip(ref.column_name, mine.column_type, ref.column_type):
            if t == "events" and c == "ts":
                continue
            assert mt == rt, (t, c, mt, rt)


def test_corpus_distribution_properties(tmp_path):
    # sizes past the 1000-word tail-vocab floor (tail = max(1000,
    # n_docs)), so Heaps-law growth is actually exercised
    small = _gen(tmp_path, "d1", 0.02)
    large = _gen(tmp_path, "d2", 0.08)
    con = duckdb.connect()

    def stats(d):
        return con.execute(f"""
          WITH t AS (SELECT regexp_split_to_array(trim(text), '\\s+') w
                     FROM '{d}/documents.parquet'),
          u AS (SELECT unnest(w) tok FROM t)
          SELECT (SELECT count(*) FROM t) AS docs,
                 count(DISTINCT tok) AS vocab FROM u""").fetchone()

    d1, v1 = stats(small)
    d2, v2 = stats(large)
    assert d2 == 4 * d1  # linear row counts
    assert v2 > 1.5 * v1  # Heaps-law-ish vocabulary growth with corpus size

    def dup_groups(d):
        return con.execute(f"""
          SELECT count(*) FROM (SELECT md5(text), count(*) c
          FROM '{d}/documents.parquet' GROUP BY 1 HAVING c > 1)""").fetchone()[0]

    # exact-dup GROUPS scale with the corpus (constant 1% planted rate)
    g1, g2 = dup_groups(small), dup_groups(large)
    assert g1 >= 1 and g2 >= 3 * g1
