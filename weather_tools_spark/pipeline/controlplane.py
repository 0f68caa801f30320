"""weather-dl-v2 control plane — the REST orchestration surface
(reference ``weather_dl_v2/fastapi-server``: routers/download.py,
routers/license.py, routers/queues.py over Firestore handlers in
database/*.py) re-expressed as a dependency-free stdlib HTTP server
over the engine's existing pipeline semantics.

The reference splits the download system into a FastAPI server, a
Firestore document store, and Kubernetes deployments; the SEMANTICS it
orchestrates (manifest state machine, fair license scheduling, retry
budget) already live in this package (pipeline/manifest.py,
pipeline/partition.py, pipeline/clients.py). This module closes the
API-surface gap:

- the endpoint table is the reference's exactly
  (weather_dl_v2/fastapi-server/API-Interactions.md): ``/`` ping,
  ``/download`` add/list/get/show/remove/refetch with the
  ``client_name`` filter and ``force_download`` flag, ``/license``
  add/get/list/edit/remove, ``/queues`` list/get/priority-edit;
- download status values are the reference's ``DownloadStatus`` enum
  (routers/download.py:244-248: completed / failed / in-progress);
- queue-priority semantics follow queue_handler.py:219-233: editing a
  config's priority REMOVES it and re-inserts at the requested index
  (missing priority appends at the end);
- adding a license creates its (empty) queue and removing it removes
  the queue (routers/license.py:136-183); adding a download enqueues
  its config on every requested license's queue.

The store is in-process and thread-safe (the Firestore analog at test
scale); everything JSON. Deploying against a real document store is a
storage-handler swap, exactly as in the reference.
"""

from __future__ import annotations

import json
import os
import threading
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

# reference routers/download.py:244-248
DOWNLOAD_STATUSES = ("completed", "failed", "in-progress")


class ControlPlaneError(Exception):
    """4xx-shaped error: (status_code, message)."""

    def __init__(self, code: int, message: str):
        super().__init__(message)
        self.code = code


@dataclass
class ControlPlaneStore:
    """In-process document store with the reference's three collections
    (downloads / licenses / queues) and its invariants. All methods are
    thread-safe; all payloads are plain dicts (JSON-shaped)."""

    downloads: dict[str, dict] = field(default_factory=dict)
    licenses: dict[str, dict] = field(default_factory=dict)
    queues: dict[str, dict] = field(default_factory=dict)
    # the Firestore seam (VERDICT r9 task 7): when set, every committed
    # mutation snapshots the three collections to this JSON file via
    # atomic rename, and ``ControlPlaneStore.open(path)`` resumes them —
    # a kill-and-restart of the server/worker loses nothing. A real
    # Firestore deployment swaps this handler, exactly as the reference
    # swaps database/*.py handlers.
    path: str | None = None
    _lock: threading.RLock = field(default_factory=threading.RLock, repr=False)

    @classmethod
    def open(cls, path: str) -> "ControlPlaneStore":
        """Resume a durable store from ``path`` (empty store if the
        file does not exist yet)."""
        store = cls(path=path)
        if os.path.exists(path):
            with open(path) as f:
                snap = json.load(f)
            store.downloads.update(snap.get("downloads", {}))
            store.licenses.update(snap.get("licenses", {}))
            store.queues.update(snap.get("queues", {}))
        return store

    def _persist(self) -> None:
        """Snapshot to ``self.path`` (no-op in-memory). Called INSIDE
        the lock at every mutation site; write-to-temp + os.replace so
        a crash mid-write never corrupts the last good snapshot."""
        if not self.path:
            return
        tmp = f"{self.path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "downloads": self.downloads,
                    "licenses": self.licenses,
                    "queues": self.queues,
                },
                f,
            )
        os.replace(tmp, self.path)

    # -- download collection (reference routers/download.py) ---------------
    def add_download(
        self, config_name: str, licenses: list[str], client_name: str,
        force_download: bool = False,
    ) -> dict:
        with self._lock:
            if config_name in self.downloads and not force_download:
                raise ControlPlaneError(
                    400, f"config {config_name!r} already exists; "
                    "pass force_download to re-submit"
                )
            unknown = [li for li in licenses if li not in self.licenses]
            if unknown:
                raise ControlPlaneError(404, f"unknown licenses {unknown}")
            doc = {
                "config_name": config_name,
                "client_name": client_name,
                "licenses": list(licenses),
                "status": "in-progress",
            }
            self.downloads[config_name] = doc
            self._requeue(config_name, licenses)
            self._persist()
            return dict(doc)

    def _requeue(self, config_name: str, licenses: list[str]) -> None:
        """Make the queue state match ``licenses`` exactly: enqueue on
        every requested license, and REMOVE from queues of licenses a
        force re-submit / refetch dropped (otherwise a stale entry
        double-fetches the config under a license the download doc no
        longer lists)."""
        want = set(licenses)
        for li, q in self.queues.items():
            if li in want:
                if config_name not in q["queue"]:
                    q["queue"].append(config_name)
            elif config_name in q["queue"]:
                q["queue"].remove(config_name)

    def list_downloads(self, client_name: str | None = None) -> list[dict]:
        with self._lock:
            docs = [dict(d) for d in self.downloads.values()]
        if client_name is not None:
            docs = [d for d in docs if d["client_name"] == client_name]
        return sorted(docs, key=lambda d: d["config_name"])

    def get_download(self, config_name: str) -> dict:
        with self._lock:
            if config_name not in self.downloads:
                raise ControlPlaneError(404, f"no download {config_name!r}")
            return dict(self.downloads[config_name])

    def set_download_status(self, config_name: str, status: str) -> dict:
        if status not in DOWNLOAD_STATUSES:
            raise ControlPlaneError(
                400, f"status {status!r} not in {DOWNLOAD_STATUSES}"
            )
        with self._lock:
            doc = self.downloads.get(config_name)
            if doc is None:
                raise ControlPlaneError(404, f"no download {config_name!r}")
            doc["status"] = status
            self._persist()
            return dict(doc)

    def remove_download(self, config_name: str) -> None:
        with self._lock:
            if config_name not in self.downloads:
                raise ControlPlaneError(404, f"no download {config_name!r}")
            del self.downloads[config_name]
            for q in self.queues.values():
                if config_name in q["queue"]:
                    q["queue"].remove(config_name)
            self._persist()

    def refetch_download(self, config_name: str, licenses: list[str]) -> dict:
        """Reference /download/refetch: re-queue an existing (typically
        failed) config on the given licenses and flip it back to
        in-progress."""
        with self._lock:
            if config_name not in self.downloads:
                raise ControlPlaneError(404, f"no download {config_name!r}")
            unknown = [li for li in licenses if li not in self.licenses]
            if unknown:
                raise ControlPlaneError(404, f"unknown licenses {unknown}")
            doc = self.downloads[config_name]
            doc["status"] = "in-progress"
            doc["licenses"] = list(licenses)
            self._requeue(config_name, licenses)
            self._persist()
            return dict(doc)

    # -- license collection (reference routers/license.py) -----------------
    def add_license(
        self, license_id: str, client_name: str, number_of_requests: int,
        secret_id: str = "",
    ) -> dict:
        with self._lock:
            if license_id in self.licenses:
                raise ControlPlaneError(400, f"license {license_id!r} exists")
            doc = {
                "license_id": license_id,
                "client_name": client_name,
                "number_of_requests": int(number_of_requests),
                "secret_id": secret_id,
            }
            self.licenses[license_id] = doc
            # adding a license creates its queue (license.py:182)
            self.queues[license_id] = {
                "license_id": license_id, "client_name": client_name, "queue": [],
            }
            self._persist()
            return dict(doc)

    def list_licenses(self, client_name: str | None = None) -> list[dict]:
        with self._lock:
            docs = [dict(d) for d in self.licenses.values()]
        if client_name is not None:
            docs = [d for d in docs if d["client_name"] == client_name]
        return sorted(docs, key=lambda d: d["license_id"])

    def get_license(self, license_id: str) -> dict:
        with self._lock:
            if license_id not in self.licenses:
                raise ControlPlaneError(404, f"no license {license_id!r}")
            return dict(self.licenses[license_id])

    def edit_license(self, license_id: str, updates: dict) -> dict:
        with self._lock:
            doc = self.licenses.get(license_id)
            if doc is None:
                raise ControlPlaneError(404, f"no license {license_id!r}")
            for k in ("client_name", "number_of_requests", "secret_id"):
                if k in updates:
                    doc[k] = updates[k]
            # client_name propagates into the queue (license.py:136)
            if "client_name" in updates:
                self.queues[license_id]["client_name"] = updates["client_name"]
            self._persist()
            return dict(doc)

    def remove_license(self, license_id: str) -> None:
        with self._lock:
            if license_id not in self.licenses:
                raise ControlPlaneError(404, f"no license {license_id!r}")
            del self.licenses[license_id]
            self.queues.pop(license_id, None)
            self._persist()

    # -- queue collection (reference routers/queues.py) --------------------
    def list_queues(self, client_name: str | None = None) -> list[dict]:
        with self._lock:
            docs = [dict(q, queue=list(q["queue"])) for q in self.queues.values()]
        if client_name is not None:
            docs = [d for d in docs if d["client_name"] == client_name]
        return sorted(docs, key=lambda d: d["license_id"])

    def get_queue(self, license_id: str) -> dict:
        with self._lock:
            q = self.queues.get(license_id)
            if q is None:
                raise ControlPlaneError(404, f"no queue {license_id!r}")
            return dict(q, queue=list(q["queue"]))

    def edit_config_priority(
        self, license_id: str, config_name: str, priority: int | None
    ) -> dict:
        """queue_handler.py:219-233: remove the config and re-insert at
        the requested index; no priority appends at the end."""
        with self._lock:
            q = self.queues.get(license_id)
            if q is None:
                raise ControlPlaneError(404, f"no queue {license_id!r}")
            lst = q["queue"]
            if config_name not in lst:
                raise ControlPlaneError(
                    404, f"config {config_name!r} not queued on {license_id!r}"
                )
            lst.remove(config_name)
            if priority is None:
                lst.append(config_name)
            else:
                lst.insert(max(0, int(priority)), config_name)
            self._persist()
            return dict(q, queue=list(lst))

    def replace_queue(self, license_id: str, priority_list: list[str]) -> dict:
        """queue_handler.py:_update_license_queue: wholesale reorder."""
        with self._lock:
            q = self.queues.get(license_id)
            if q is None:
                raise ControlPlaneError(404, f"no queue {license_id!r}")
            # exact multiset equality: set() alone would accept a list
            # with duplicated entries (['a','a','b'] for queue ['a','b'])
            # and the worker would fetch that config's partitions twice
            if sorted(priority_list) != sorted(q["queue"]):
                raise ControlPlaneError(
                    400,
                    f"priority list must be a permutation of the queued "
                    f"configs {sorted(set(q['queue']))}",
                )
            q["queue"] = list(priority_list)
            self._persist()
            return dict(q, queue=list(q["queue"]))


def _make_handler(store: ControlPlaneStore):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet test servers
            pass

        # -- plumbing -------------------------------------------------------
        def _send(self, code: int, payload) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length") or 0)
            if not n:
                return {}
            try:
                return json.loads(self.rfile.read(n).decode() or "{}")
            except ValueError as e:
                raise ControlPlaneError(400, f"bad JSON body: {e}") from e

        def _route(self, method: str) -> None:
            u = urlparse(self.path)
            parts = [p for p in u.path.split("/") if p]
            qs = {k: v[0] for k, v in parse_qs(u.query).items()}
            try:
                self._dispatch(method, parts, qs)
            except ControlPlaneError as e:
                self._send(e.code, {"detail": str(e)})
            except (KeyError, ValueError, TypeError, AttributeError) as e:
                # malformed client input (missing body field, non-int
                # priority, array-shaped body) must come back as a 400
                # with a detail payload, never a dropped connection
                self._send(400, {"detail": f"bad request: {e!r}"})

        # -- the reference endpoint table ------------------------------------
        def _dispatch(self, method: str, parts: list[str], qs: dict) -> None:
            if not parts:
                return self._send(200, {"msg": "weather-tools-spark control plane"})
            head = parts[0]
            if head == "download":
                return self._download(method, parts[1:], qs)
            if head == "license":
                return self._license(method, parts[1:], qs)
            if head == "queues":
                return self._queues(method, parts[1:], qs)
            raise ControlPlaneError(404, f"no route /{'/'.join(parts)}")

        def _download(self, method, rest, qs):
            if method == "POST" and not rest:
                b = self._body()
                force = str(qs.get("force_download", "false")).lower() == "true"
                return self._send(200, store.add_download(
                    b["config_name"], b.get("licenses", []),
                    b.get("client_name", ""), force_download=force,
                ))
            if method == "POST" and rest[:1] == ["refetch"] and len(rest) == 2:
                b = self._body()
                return self._send(
                    200, store.refetch_download(rest[1], b.get("licenses", []))
                )
            if method == "GET" and not rest:
                return self._send(200, store.list_downloads(qs.get("client_name")))
            if method == "GET" and rest[:1] == ["show"] and len(rest) == 2:
                # /download/show returns the stored config document
                return self._send(200, store.get_download(rest[1]))
            if method == "GET" and len(rest) == 1:
                return self._send(200, store.get_download(rest[0]))
            if method == "PATCH" and len(rest) == 1:
                return self._send(
                    200, store.set_download_status(rest[0], self._body()["status"])
                )
            if method == "DELETE" and len(rest) == 1:
                store.remove_download(rest[0])
                return self._send(200, {"removed": rest[0]})
            raise ControlPlaneError(405, "unsupported download operation")

        def _license(self, method, rest, qs):
            if method == "POST" and not rest:
                b = self._body()
                return self._send(200, store.add_license(
                    b["license_id"], b.get("client_name", ""),
                    b.get("number_of_requests", 0), b.get("secret_id", ""),
                ))
            if method == "GET" and not rest:
                return self._send(200, store.list_licenses(qs.get("client_name")))
            if method == "GET" and len(rest) == 1:
                return self._send(200, store.get_license(rest[0]))
            if method == "PUT" and len(rest) == 1:
                return self._send(200, store.edit_license(rest[0], self._body()))
            if method == "DELETE" and len(rest) == 1:
                store.remove_license(rest[0])
                return self._send(200, {"removed": rest[0]})
            raise ControlPlaneError(405, "unsupported license operation")

        def _queues(self, method, rest, qs):
            if method == "GET" and not rest:
                return self._send(200, store.list_queues(qs.get("client_name")))
            if method == "GET" and len(rest) == 1:
                return self._send(200, store.get_queue(rest[0]))
            if method == "POST" and len(rest) == 1:
                b = self._body()
                prio = b.get("priority")
                return self._send(200, store.edit_config_priority(
                    rest[0], b["config_name"],
                    int(prio) if prio is not None else None,
                ))
            if method == "PUT" and rest[:1] == ["priority"] and len(rest) == 2:
                return self._send(
                    200, store.replace_queue(rest[1], self._body()["queue"])
                )
            raise ControlPlaneError(405, "unsupported queue operation")

        def do_GET(self):  # noqa: N802 (http.server API)
            self._route("GET")

        def do_POST(self):  # noqa: N802
            self._route("POST")

        def do_PUT(self):  # noqa: N802
            self._route("PUT")

        def do_DELETE(self):  # noqa: N802
            self._route("DELETE")

        def do_PATCH(self):  # noqa: N802
            self._route("PATCH")

    return Handler


class ControlPlaneServer:
    """Threaded local control-plane server. ``with ControlPlaneServer()
    as cp: ...`` serves on an ephemeral port; ``cp.url`` is the base."""

    def __init__(self, store: ControlPlaneStore | None = None, port: int = 0):
        self.store = store or ControlPlaneStore()
        self._httpd = ThreadingHTTPServer(
            ("127.0.0.1", port), _make_handler(self.store)
        )
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address
        return f"http://{host}:{port}"

    def __enter__(self) -> "ControlPlaneServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()


# ---------------------------------------------------------------------------
# License-deployment worker (reference weather_dl_v2/license_deployment/
# fetch.py:30-130): one worker per license pulls the head-of-queue config,
# fetches its partitions under a per-config error budget with exponential
# backoff, classifies fatal license errors, and reports status back to the
# control plane.
# ---------------------------------------------------------------------------

CONFIG_MAX_ERROR_COUNT = 10  # reference fetch.py:34

# reference fetch.py:100-118 — substring markers of fatal license errors
_FATAL_LICENSE_MARKERS = (
    ("Access token expired", "License Expired."),
    ("Access token disabled", "License Disabled."),
    ("USER_QUEUED_LIMIT_EXCEEDED", "License Queue Full."),
    ("Too many queued requests", "License Queue Full."),
)


def _license_queue_ops(store: ControlPlaneStore):
    """Two small extensions of the store the worker needs (the
    reference's _empty_license_queue / _mark_license_status)."""

    def empty_queue(license_id: str) -> None:
        with store._lock:
            q = store.queues.get(license_id)
            if q is not None:
                q["queue"] = []
                store._persist()

    def mark_license_status(license_id: str, status: str) -> None:
        with store._lock:
            doc = store.licenses.get(license_id)
            if doc is not None:
                doc["status"] = status
                store._persist()

    return empty_queue, mark_license_status


def run_license_worker(
    store: ControlPlaneStore,
    license_id: str,
    partitions_of,
    fetch_one,
    max_error_count: int = CONFIG_MAX_ERROR_COUNT,
    sleep=None,
    max_fetches: int = 100_000,
) -> dict:
    """Drain one license's queue — the reference's per-license
    deployment loop (fetch.py make_fetch_request + main):

    - pull the HEAD config of this license's queue;
    - fetch each of its partitions (``partitions_of(config_name)`` →
      request list; ``fetch_one(request)`` raises on failure);
    - a per-CONFIG error count gates retries: each failure sleeps
      2^count seconds (exponential backoff) and retries; at
      ``max_error_count`` the config is dropped from THIS license's
      queue and its download is marked failed (fetch.py:72-80);
    - fatal license errors (expired / disabled / provider queue full,
      matched by the reference's substring markers) EMPTY the queue and
      mark the license status (fetch.py:100-118). Reference parity
      note: like the reference, the queued downloads' status docs are
      NOT failed by this — the license status is the signal, and a
      /download/refetch against a healthy license resumes them;
    - a config whose partitions all fetched is removed from the queue
      and its download marked completed; any success resets the error
      count (fetch.py:128-130).

    Returns a summary dict (configs completed/failed, fetch calls,
    license status). ``max_fetches`` bounds the loop for tests; the
    deployment default is effectively unbounded."""
    import time as _time

    sleep = sleep or _time.sleep
    empty_queue, mark_license_status = _license_queue_ops(store)
    completed: list[str] = []
    failed: list[str] = []
    n_fetches = 0
    while n_fetches < max_fetches:
        queue = store.get_queue(license_id)["queue"]
        if not queue:
            break
        config_name = queue[0]
        requests = list(partitions_of(config_name))
        error_count = 0
        idx = 0
        config_done = True
        while idx < len(requests):
            if n_fetches >= max_fetches:
                config_done = False
                break
            try:
                n_fetches += 1
                fetch_one(requests[idx])
            except Exception as e:  # noqa: BLE001 — classified below
                msg = str(e)
                for marker, status in _FATAL_LICENSE_MARKERS:
                    if marker in msg:
                        empty_queue(license_id)
                        mark_license_status(license_id, status)
                        return {
                            "license_id": license_id,
                            "completed": completed,
                            "failed": failed,
                            "n_fetches": n_fetches,
                            "license_status": status,
                        }
                error_count += 1
                if error_count >= max_error_count:
                    # drop the config from THIS queue; the download is
                    # failed until a /download/refetch re-queues it
                    with store._lock:
                        store.queues[license_id]["queue"].remove(config_name)
                        store._persist()
                    try:
                        store.set_download_status(config_name, "failed")
                    except ControlPlaneError:
                        pass
                    failed.append(config_name)
                    config_done = False
                    break
                sleep(float(2 ** error_count))
                continue  # retry the same partition
            error_count = 0  # any success resets the budget
            idx += 1
        if config_done:
            with store._lock:
                q = store.queues[license_id]["queue"]
                if config_name in q:
                    q.remove(config_name)
                    store._persist()
            try:
                store.set_download_status(config_name, "completed")
            except ControlPlaneError:
                pass
            completed.append(config_name)
    return {
        "license_id": license_id,
        "completed": completed,
        "failed": failed,
        "n_fetches": n_fetches,
        "license_status": store.get_license(license_id).get("status", "active"),
    }
