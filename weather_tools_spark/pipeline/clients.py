"""Download-client strategies (weather-dl parity, SURVEY.md §2.11).

The reference defines a Client ABC (retrieve / num_requests_per_key /
license_url — clients.py:41-74) with CDS, MARS, ECMWF-public and Fake
implementations and a registry (clients.py:430-436). Engine form: the
same strategy surface, used from ``pipeline.partition.run_fetches``
inside ``foreachPartition`` — network I/O stays out of the query layer.

Real ECMWF clients need credentials + network, so only the in-memory
test client ships here; the ABC and registry match the reference's
extension surface so real clients drop in.
"""

from __future__ import annotations

import time
from abc import ABC, abstractmethod
from dataclasses import dataclass, field


class Client(ABC):
    """Strategy: fetch one partition's dataset to a target location."""

    #: reference-documented per-key concurrency (clients.py:162-180,
    #: 350-363, 396-398): CDS 5 (hosted) / 2, MARS 2, public 5
    num_requests_per_key: int = 1

    @abstractmethod
    def retrieve(self, dataset: str | None, selection: dict, target: str) -> None: ...


@dataclass
class RetryPolicy:
    """Exponential backoff (sinks.py:46-49 constants: 10 retries, 1 s
    initial, 600 s cap)."""

    max_retries: int = 10
    initial_delay: float = 1.0
    max_delay: float = 600.0

    def delays(self):
        d = self.initial_delay
        for _ in range(self.max_retries):
            yield d
            d = min(d * 2, self.max_delay)


def with_retries(fn, policy: RetryPolicy | None = None, sleep=time.sleep):
    """Run ``fn`` with exponential backoff; re-raises after the budget."""
    policy = policy or RetryPolicy()
    last: Exception | None = None
    for delay in policy.delays():
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - strategy boundary
            last = e
            sleep(delay)
    if last is not None:
        raise last
    return fn()


@dataclass
class FakeClient(Client):
    """In-memory client for tests (reference FakeClient concept,
    clients.py:407-427): records every retrieve; optionally fails the
    first N calls per target to exercise retry paths."""

    num_requests_per_key: int = 5
    fail_first: int = 0
    calls: list[tuple[str | None, str]] = field(default_factory=list)
    _failures: dict[str, int] = field(default_factory=dict)

    def retrieve(self, dataset: str | None, selection: dict, target: str) -> None:
        seen = self._failures.get(target, 0)
        if seen < self.fail_first:
            self._failures[target] = seen + 1
            raise IOError(f"transient failure {seen + 1} for {target}")
        self.calls.append((dataset, target))
        # materialize the target like the reference's fake (it copies a
        # sample file into place) so skip-existing and downstream ingest
        # see a real artifact; deterministic payload = the selection.
        import json as _json
        import os as _os

        d = _os.path.dirname(target)
        if d:
            _os.makedirs(d, exist_ok=True)
        with open(target, "w") as fh:
            _json.dump({"dataset": dataset, "selection": selection}, fh, sort_keys=True)


CLIENTS: dict[str, type[Client]] = {
    "fake": FakeClient,
}


def get_client(name: str, **kwargs) -> Client:
    return CLIENTS[name](**kwargs)
