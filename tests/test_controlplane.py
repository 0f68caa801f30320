"""weather-dl-v2 control-plane facade (pipeline/controlplane.py):
the reference's REST endpoint table (weather_dl_v2/fastapi-server/
API-Interactions.md) driven end-to-end over a live local HTTP server
with urllib — add/list/filter/edit/remove for downloads, licenses, and
queues, the queue-priority re-insert semantics
(queue_handler.py:219-233), and the refetch flow."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from weather_tools_spark.pipeline.controlplane import (
    ControlPlaneError,
    ControlPlaneServer,
    ControlPlaneStore,
)


def _req(url: str, method: str = "GET", body: dict | None = None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(
        url, data=data, method=method,
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=10) as resp:
        return json.loads(resp.read().decode())


def test_rest_surface_end_to_end():
    with ControlPlaneServer() as cp:
        u = cp.url
        assert "control plane" in _req(u + "/")["msg"]

        # licenses: add creates the queue; list filters by client_name
        _req(u + "/license/", "POST", {
            "license_id": "L1", "client_name": "cds", "number_of_requests": 5,
        })
        _req(u + "/license/", "POST", {
            "license_id": "L2", "client_name": "mars", "number_of_requests": 2,
        })
        assert [q["license_id"] for q in _req(u + "/queues/")] == ["L1", "L2"]
        assert [x["license_id"] for x in _req(u + "/license?client_name=cds")] == ["L1"]

        # downloads: add enqueues on every license; duplicate needs force
        _req(u + "/download", "POST", {
            "config_name": "era5.cfg", "licenses": ["L1", "L2"],
            "client_name": "cds",
        })
        _req(u + "/download", "POST", {
            "config_name": "gfs.cfg", "licenses": ["L1"], "client_name": "ncep",
        })
        with pytest.raises(urllib.error.HTTPError) as e:
            _req(u + "/download", "POST", {
                "config_name": "era5.cfg", "licenses": ["L1"], "client_name": "cds",
            })
        assert e.value.code == 400
        _req(u + "/download?force_download=true", "POST", {
            "config_name": "era5.cfg", "licenses": ["L1"], "client_name": "cds",
        })
        assert _req(u + "/queues/L1")["queue"] == ["era5.cfg", "gfs.cfg"]
        assert [d["config_name"] for d in _req(u + "/download?client_name=ncep")] == ["gfs.cfg"]
        assert _req(u + "/download/show/era5.cfg")["status"] == "in-progress"

        # queue priority edit: remove + re-insert at index
        # (queue_handler.py:219-233)
        _req(u + "/queues/L1", "POST", {"config_name": "gfs.cfg", "priority": 0})
        assert _req(u + "/queues/L1")["queue"] == ["gfs.cfg", "era5.cfg"]
        # wholesale reorder must be a permutation
        _req(u + "/queues/priority/L1", "PUT", {"queue": ["era5.cfg", "gfs.cfg"]})
        assert _req(u + "/queues/L1")["queue"] == ["era5.cfg", "gfs.cfg"]
        with pytest.raises(urllib.error.HTTPError) as e:
            _req(u + "/queues/priority/L1", "PUT", {"queue": ["era5.cfg"]})
        assert e.value.code == 400
        # ADVICE r9: a MULTISET check — duplicated entries share the
        # set signature but would make the worker fetch a config twice
        with pytest.raises(urllib.error.HTTPError) as e:
            _req(u + "/queues/priority/L1", "PUT",
                 {"queue": ["era5.cfg", "era5.cfg", "gfs.cfg"]})
        assert e.value.code == 400
        assert _req(u + "/queues/L1")["queue"] == ["era5.cfg", "gfs.cfg"]

        # status machine + refetch: failed -> refetch -> in-progress,
        # re-queued on the requested license
        _req(u + "/download/era5.cfg", "PATCH", {"status": "failed"})
        assert _req(u + "/download/era5.cfg")["status"] == "failed"
        _req(u + "/download/refetch/era5.cfg", "POST", {"licenses": ["L2"]})
        got = _req(u + "/download/era5.cfg")
        assert got["status"] == "in-progress" and got["licenses"] == ["L2"]
        assert "era5.cfg" in _req(u + "/queues/L2")["queue"]

        # license edit propagates client_name into its queue
        _req(u + "/license/L2", "PUT", {"client_name": "mars2"})
        assert _req(u + "/queues/L2")["client_name"] == "mars2"

        # removals clean up cross-references
        _req(u + "/download/gfs.cfg", "DELETE")
        assert "gfs.cfg" not in _req(u + "/queues/L1")["queue"]
        _req(u + "/license/L1", "DELETE")
        assert [q["license_id"] for q in _req(u + "/queues/")] == ["L2"]
        with pytest.raises(urllib.error.HTTPError) as e:
            _req(u + "/license/L1")
        assert e.value.code == 404


def test_store_invariants_unit():
    s = ControlPlaneStore()
    with pytest.raises(ControlPlaneError) as e:
        s.add_download("c", ["nope"], "x")
    assert e.value.code == 404
    s.add_license("L", "cds", 3)
    s.add_download("c", ["L"], "x")
    with pytest.raises(ControlPlaneError):
        s.set_download_status("c", "bogus-status")
    for status in ("in-progress", "failed", "completed"):
        assert s.set_download_status("c", status)["status"] == status
    # priority=None appends at the end (queue_handler.py:228-230)
    s.add_download("d", ["L"], "x")
    s.edit_config_priority("L", "c", None)
    assert s.get_queue("L")["queue"] == ["d", "c"]


def test_license_worker_drains_queue_with_error_budget():
    """run_license_worker (reference license_deployment/fetch.py):
    head-of-queue order, exponential backoff on transient errors with
    the per-config reset-on-success rule, config drop + failed status
    at the error budget, and completed statuses on full drains."""
    from weather_tools_spark.pipeline.controlplane import run_license_worker

    s = ControlPlaneStore()
    s.add_license("L", "cds", 2)
    s.add_download("good.cfg", ["L"], "cds")
    s.add_download("flaky.cfg", ["L"], "cds")
    s.add_download("bad.cfg", ["L"], "cds")

    parts = {
        "good.cfg": [{"p": i} for i in range(3)],
        "flaky.cfg": [{"p": 0}, {"p": 1}],
        "bad.cfg": [{"p": 0}],
    }
    flaky_failures = {"n": 2}  # first two attempts at flaky.cfg part 0 fail

    def fetch_one(req):
        head = s.get_queue("L")["queue"][0]
        if head == "flaky.cfg" and req == {"p": 0} and flaky_failures["n"] > 0:
            flaky_failures["n"] -= 1
            raise RuntimeError("transient provider hiccup")
        if head == "bad.cfg":
            raise RuntimeError("permanently broken partition")

    sleeps: list[float] = []
    out = run_license_worker(
        s, "L", lambda c: parts[c], fetch_one,
        max_error_count=4, sleep=sleeps.append,
    )
    assert out["completed"] == ["good.cfg", "flaky.cfg"]
    assert out["failed"] == ["bad.cfg"]
    assert s.get_download("good.cfg")["status"] == "completed"
    assert s.get_download("flaky.cfg")["status"] == "completed"
    assert s.get_download("bad.cfg")["status"] == "failed"
    assert s.get_queue("L")["queue"] == []
    # exponential backoff: flaky's two transient errors slept 2, 4;
    # bad's three pre-budget errors slept 2, 4, 8
    assert sleeps == [2.0, 4.0, 2.0, 4.0, 8.0]
    # refetch re-queues the failed config (the REST flow the server test
    # drives) and a now-healthy fetch completes it
    s.refetch_download("bad.cfg", ["L"])
    out2 = run_license_worker(s, "L", lambda c: parts[c], lambda r: None)
    assert out2["completed"] == ["bad.cfg"]
    assert s.get_download("bad.cfg")["status"] == "completed"


def test_license_worker_fatal_errors_empty_queue():
    """The reference's fatal markers (fetch.py:100-118) empty the
    license queue and stamp the license status."""
    from weather_tools_spark.pipeline.controlplane import run_license_worker

    for marker, want_status in (
        ("Access token expired", "License Expired."),
        ("Access token disabled", "License Disabled."),
        ("USER_QUEUED_LIMIT_EXCEEDED hit", "License Queue Full."),
        ("Too many queued requests", "License Queue Full."),
    ):
        s = ControlPlaneStore()
        s.add_license("L", "cds", 1)
        s.add_download("a.cfg", ["L"], "cds")
        s.add_download("b.cfg", ["L"], "cds")

        def fetch_one(req, _m=marker):
            raise RuntimeError(_m)

        out = run_license_worker(
            s, "L", lambda c: [{"p": 0}], fetch_one, sleep=lambda _s: None
        )
        assert out["license_status"] == want_status
        assert s.get_queue("L")["queue"] == []  # emptied, not drained
        assert s.get_license("L")["status"] == want_status
        # downloads stay in-progress: nothing completed or failed them
        assert s.get_download("a.cfg")["status"] == "in-progress"


def test_malformed_bodies_return_400_not_dropped_connection():
    """Review fix: a missing body field / bad priority type must come
    back as a JSON 400, never an aborted TCP connection."""
    with ControlPlaneServer() as cp:
        u = cp.url
        for path, method, body in (
            ("/download", "POST", {}),                      # no config_name
            ("/queues/priority/L", "PUT", {}),              # no queue
            ("/download/x", "PATCH", {}),                   # no status
        ):
            with pytest.raises(urllib.error.HTTPError) as e:
                _req(u + path, method, body)
            assert e.value.code in (400, 404)
            detail = json.loads(e.value.read().decode())
            assert "detail" in detail


def test_force_resubmit_and_refetch_clean_stale_queue_entries():
    """Review fix: re-submitting a config on a DIFFERENT license set
    must remove it from the dropped licenses' queues — a stale entry
    would double-fetch under a license the download doc no longer
    lists."""
    s = ControlPlaneStore()
    s.add_license("A", "cds", 1)
    s.add_license("B", "cds", 1)
    s.add_download("c1", ["A"], "cds")
    assert s.get_queue("A")["queue"] == ["c1"]
    s.add_download("c1", ["B"], "cds", force_download=True)
    assert s.get_queue("A")["queue"] == []  # stale entry gone
    assert s.get_queue("B")["queue"] == ["c1"]
    s.set_download_status("c1", "failed")
    s.refetch_download("c1", ["A"])
    assert s.get_queue("B")["queue"] == []  # refetch also re-homes
    assert s.get_queue("A")["queue"] == ["c1"]


def test_dlv2_cli_surfaces_http_errors(capsys):
    """Review fix: a 4xx from the server prints the JSON detail and
    returns exit code 1 instead of crashing with a traceback."""
    from weather_tools_spark.cli import main

    with ControlPlaneServer() as cp:
        rc = main(["dlv2", "--server", cp.url, "download", "get", "nope.cfg"])
        assert rc == 1
        err = capsys.readouterr().err
        assert "no download" in err


def test_concurrent_clients_keep_store_consistent():
    """ThreadingHTTPServer + the store's RLock: 8 concurrent clients
    adding licenses/downloads and editing priorities must leave a
    consistent store (every download present exactly once per queue,
    no lost updates)."""
    import threading

    with ControlPlaneServer() as cp:
        u = cp.url
        for i in range(4):
            _req(u + "/license/", "POST", {
                "license_id": f"L{i}", "client_name": "c", "number_of_requests": 1,
            })
        errors: list[str] = []

        def worker(w: int) -> None:
            try:
                for j in range(10):
                    name = f"cfg-{w}-{j}"
                    _req(u + "/download", "POST", {
                        "config_name": name, "licenses": [f"L{w % 4}"],
                        "client_name": "c",
                    })
                    _req(u + f"/queues/L{w % 4}", "POST",
                         {"config_name": name, "priority": 0})
            except Exception as e:  # noqa: BLE001
                errors.append(repr(e))

        threads = [threading.Thread(target=worker, args=(w,)) for w in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert not errors, errors
        downloads = _req(u + "/download/")
        assert len(downloads) == 80
        queues = _req(u + "/queues/")
        queued = [c for q in queues for c in q["queue"]]
        assert len(queued) == 80 and len(set(queued)) == 80  # exactly once


def test_durable_store_kill_and_restart(tmp_path):
    """VERDICT r9 task 7: the file-backed document store (the Firestore
    seam). Kill the process mid-drain (simulated by dropping the store
    object after a bounded number of fetches) and resume from the
    snapshot: license queue, download statuses, and manifest state all
    survive; re-running the worker completes the remaining configs
    without re-fetching completed ones."""
    from weather_tools_spark.pipeline.controlplane import run_license_worker

    db = str(tmp_path / "controlplane.json")
    s = ControlPlaneStore.open(db)
    s.add_license("L", "cds", 2)
    s.add_download("a.cfg", ["L"], "cds")
    s.add_download("b.cfg", ["L"], "cds")
    s.add_download("c.cfg", ["L"], "cds")

    parts = {n: [{"p": i} for i in range(3)] for n in ("a.cfg", "b.cfg", "c.cfg")}
    fetched: list[tuple[str, int]] = []

    def fetch_one(req):
        head = s.get_queue("L")["queue"][0]
        fetched.append((head, req["p"]))

    # crash after 4 fetches: a.cfg fully drained (3 parts, marked
    # completed), b.cfg mid-flight (1 of 3 parts fetched)
    out = run_license_worker(s, "L", lambda c: parts[c], fetch_one, max_fetches=4)
    assert out["completed"] == ["a.cfg"]
    del s  # "kill" — nothing in memory survives

    # restart: resume the snapshot and verify the committed state
    s2 = ControlPlaneStore.open(db)
    assert s2.get_download("a.cfg")["status"] == "completed"
    assert s2.get_download("b.cfg")["status"] == "in-progress"
    assert s2.get_queue("L")["queue"] == ["b.cfg", "c.cfg"]

    fetched2: list[tuple[str, int]] = []

    def fetch_one2(req):
        head = s2.get_queue("L")["queue"][0]
        fetched2.append((head, req["p"]))

    out2 = run_license_worker(s2, "L", lambda c: parts[c], fetch_one2)
    assert out2["completed"] == ["b.cfg", "c.cfg"]
    # at-least-once on the in-flight config (b.cfg restarts its
    # partition list), never on the completed one
    assert all(name != "a.cfg" for name, _ in fetched2)
    assert s2.get_download("b.cfg")["status"] == "completed"
    assert s2.get_download("c.cfg")["status"] == "completed"
    assert s2.get_queue("L")["queue"] == []

    # a third restart sees the terminal state
    s3 = ControlPlaneStore.open(db)
    assert [d["status"] for d in s3.list_downloads()] == ["completed"] * 3


def test_durable_store_server_restart(tmp_path):
    """The REST server over a durable store: add state through HTTP,
    stop the server, start a NEW server over a fresh store opened from
    the same file — all collections intact."""
    db = str(tmp_path / "cp.json")
    with ControlPlaneServer(ControlPlaneStore.open(db)) as srv:
        u = srv.url
        _req(u + "/license", "POST", {
            "license_id": "L1", "client_name": "cds", "number_of_requests": 5,
        })
        _req(u + "/download", "POST", {
            "config_name": "era5.cfg", "licenses": ["L1"], "client_name": "cds",
        })
    with ControlPlaneServer(ControlPlaneStore.open(db)) as srv2:
        u2 = srv2.url
        assert _req(u2 + "/queues/L1")["queue"] == ["era5.cfg"]
        got = _req(u2 + "/download/show/era5.cfg")
        assert got["status"] == "in-progress" and got["licenses"] == ["L1"]
