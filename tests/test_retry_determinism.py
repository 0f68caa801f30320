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


def test_executor_loss_preserves_hashes():
    """Executor-LOSS recovery (the process-level failure mode, beyond
    task retries): tools/executor_loss_probe.py SIGKILLs a live
    executor JVM ~30% into each query on local-cluster[2,4,2048]; the
    worker relaunches it, the driver resubmits lost tasks, and the
    frame hash must be unchanged. Subprocess for the same reason as the
    retry probe: cluster topology is a session-construction property."""
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "executor_loss_probe.py"),
            "/root/testdata/sf0.01",
            "q1_pricing_summary",
            "dedup_minhash_lsh_pairs",
        ],
        capture_output=True,
        text=True,
        timeout=600,
    )
    out = proc.stdout
    assert proc.returncode == 0, f"stdout:\n{out}\nstderr:\n{proc.stderr[-2000:]}"
    assert out.count("LOSS_OK") == 2, out
    # the assassin must have actually killed an executor, not missed
    # its window — otherwise the test silently degrades to a re-run
    assert "killed_pid=" in out and "no_kill_window" not in out, out


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
