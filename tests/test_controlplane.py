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
