"""JPEG 2000 codec (sources/jpeg2000.py) — the GRIB2 template 5.40
subset. Layered roundtrip + golden evidence: MQ coder identity on
random context/bit streams, 5/3 DWT perfect reconstruction on arbitrary
shapes, Tier-1 code-block identity across all four band context
tables, tag-tree and packet-header inverses, full codestream
encode/decode, and (once wired) GRIB2 5.40 message roundtrips."""

from __future__ import annotations

import numpy as np
import pytest

from weather_tools_spark.sources import jpeg2000 as J


def test_mq_roundtrip_random_streams():
    rng = np.random.default_rng(0)
    for trial in range(60):
        n = int(rng.integers(1, 3000))
        ctxs = rng.integers(0, J.N_CTX, n)
        p = rng.uniform(0.01, 0.99)
        bits = (rng.random(n) < p).astype(int)
        enc = J.MQEncoder()
        for d, cx in zip(bits, ctxs):
            enc.encode(int(d), int(cx))
        data = enc.flush()
        dec = J.MQDecoder(data)
        assert [dec.decode(int(cx)) for cx in ctxs] == list(bits), trial


def test_mq_compresses_biased_streams():
    # 5000 highly-biased bits in one context must come out well under
    # 5000/8 bytes — evidence the adaptive states actually adapt.
    enc = J.MQEncoder()
    for i in range(5000):
        enc.encode(0 if i % 97 else 1, 0)
    assert len(enc.flush()) < 200


def test_mq_stuffing_after_ff():
    # streams containing 0xFF bytes still roundtrip (bit stuffing)
    rng = np.random.default_rng(7)
    for _ in range(20):
        bits = rng.integers(0, 2, 4000)
        enc = J.MQEncoder()
        for d in bits:
            enc.encode(int(d), J._CTX_UNI)  # near-uniform context
        data = enc.flush()
        dec = J.MQDecoder(data)
        assert [dec.decode(J._CTX_UNI) for _ in bits] == list(bits)


def test_dwt53_perfect_reconstruction():
    rng = np.random.default_rng(1)
    for trial in range(40):
        h = int(rng.integers(1, 70))
        w = int(rng.integers(1, 70))
        a = rng.integers(-100000, 100000, (h, w))
        lev = int(rng.integers(0, 6))
        back = J.idwt53(J.fdwt53(a, lev))
        assert np.array_equal(back, a), (h, w, lev)


def test_dwt53_subband_shapes():
    bands = J.fdwt53(np.zeros((13, 9), np.int64), 2)
    assert bands[0]["HL"].shape == (7, 4)   # level 1: ceil/floor split
    assert bands[0]["LH"].shape == (6, 5)
    assert bands[0]["HH"].shape == (6, 4)
    assert bands[1]["HL"].shape == (4, 2)
    assert bands[-1]["LL"].shape == (4, 3)


def test_tier1_roundtrip_all_bands():
    rng = np.random.default_rng(2)
    for trial in range(24):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        band = ["LL", "HL", "LH", "HH"][trial % 4]
        mag = rng.integers(0, 1 << int(rng.integers(1, 14)), (h, w)).astype(np.int64)
        sg = rng.integers(0, 2, (h, w)).astype(np.uint8)
        sg[mag == 0] = 0
        data, nbps, npasses = J.t1_encode(mag, sg, band)
        v2, s2 = J.t1_decode(data, h, w, band, nbps, npasses)
        assert np.array_equal(v2, mag), (trial, band)
        assert np.array_equal(s2[mag > 0], sg[mag > 0]), (trial, "signs")


def test_tier1_sparse_and_flat_blocks():
    # all-zero block: zero planes, zero passes, empty segment
    z = np.zeros((16, 16), np.int64)
    data, nbps, npasses = J.t1_encode(z, np.zeros((16, 16), np.uint8), "LL")
    assert (data, nbps, npasses) == (b"", 0, 0)
    v, s = J.t1_decode(b"", 16, 16, "LL", 0, 0)
    assert not v.any()
    # single significant coefficient exercises the run-length escape
    one = np.zeros((8, 8), np.int64)
    one[5, 3] = 9
    sg = np.zeros((8, 8), np.uint8)
    sg[5, 3] = 1
    data, nbps, npasses = J.t1_encode(one, sg, "HH")
    v, s = J.t1_decode(data, 8, 8, "HH", nbps, npasses)
    assert np.array_equal(v, one) and s[5, 3] == 1
