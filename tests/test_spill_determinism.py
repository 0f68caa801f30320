"""CI pin of the r12 spill sweep (tools/spill_sweep.py): forcing the
window / sort-merge-join buffers through their external-spill merge
paths must not change a single output value.

The full sweep squeezes real executor memory on a local-cluster at the
100x store; this slice pins the regime per-commit with the
RUNTIME-settable SQL spill thresholds (1 row — every buffered window
frame and SMJ group round-trips through UnsafeExternalSorter /
ExternalAppendOnlyUnsafeRowArray spill files) on the ordinary test
session at sf0.01, comparing driver-style hashes against the
unforced run."""

from __future__ import annotations

import hashlib

from weather_tools_spark.queries import SPARK

# runtime-settable (SQL conf) spill knobs; the shuffle-level
# numElementsForceSpillThreshold is a static conf and lives only in the
# tool sweep
_KNOBS = {
    "spark.sql.windowExec.buffer.spill.threshold": "1",
    "spark.sql.sortMergeJoinExec.buffer.spill.threshold": "1",
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold": "1",
}

# window buffer, SMJ + anti-join, session window chain
_QUERIES = [
    "window_running_customer_spend",
    "q21_waiting_orders",
    "events_sessionization",
]


def _md5(df) -> str:
    cols = sorted(df.columns)
    rows = sorted(tuple(str(r[c]) for c in cols) for r in df.select(*cols).collect())
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def test_forced_buffer_spill_is_value_identical(spark, sf_dir):
    base = {n: _md5(SPARK[n](spark, sf_dir)) for n in _QUERIES}
    saved = {k: spark.conf.get(k, None) for k in _KNOBS}
    try:
        for k, v in _KNOBS.items():
            spark.conf.set(k, v)
        spilled = {n: _md5(SPARK[n](spark, sf_dir)) for n in _QUERIES}
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert spilled == base
