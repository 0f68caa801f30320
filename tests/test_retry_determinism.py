"""Task-retry determinism (VERDICT r10 task 3): a retried task must
reproduce its partition exactly, so query hashes are invariant under
fault injection.

Runs tools/retry_probe.py in a SUBPROCESS because retry survivability
is a session-construction property (master local[8,3] — the second
slot is task maxFailures, default 1 in local mode, unchangeable at
runtime) and the suite's shared session can't be rebuilt per-test.
The probe wraps every table scan in an attempt-aware Arrow pass-through
that raises on each task's first attempt, then compares driver-style
md5s with/without injection. Full query list in the tool; the CI gate
runs a 3-query representative subset (agg scan, ns-timestamp
sessionization, localCheckpoint'd prefix sum) to bound runtime."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_retry_injection_preserves_hashes():
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "retry_probe.py"),
            "/root/testdata/sf0.01",
            "q1_pricing_summary",
            "events_sessionization",
            "corpus_pack_sequences",
        ],
        capture_output=True,
        text=True,
        timeout=600,
    )
    out = proc.stdout
    assert proc.returncode == 0, f"stdout:\n{out}\nstderr:\n{proc.stderr[-2000:]}"
    assert out.count("RETRY_OK") == 3, out
    assert "RETRY_DIVERGED" not in out and "RETRY_FAILED" not in out, out
