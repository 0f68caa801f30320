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


def test_tagtree_and_packet_primitives():
    rng = np.random.default_rng(3)
    for trial in range(15):
        ny, nx = int(rng.integers(1, 9)), int(rng.integers(1, 9))
        vals = rng.integers(0, 12, (ny, nx))
        enc, dec = J.TagTree(ny, nx), J.TagTree(ny, nx)
        enc.set_values(vals)
        w = J._BitWriter()
        for i in range(ny):
            for j in range(nx):
                enc.encode(i, j, int(vals[i, j]) + 1, w)
        r = J._BitReader(w.flush())
        for i in range(ny):
            for j in range(nx):
                t = 1
                while dec.decode(i, j, t, r) >= t:
                    t += 1
                assert dec.decode(i, j, t, r) == vals[i, j]
    # npasses code table
    w = J._BitWriter()
    cases = [1, 2, 3, 4, 5, 6, 17, 36, 37, 100, 164]
    for n in cases:
        J._put_npasses(n, w)
    r = J._BitReader(w.flush())
    assert [J._get_npasses(r) for _ in cases] == cases
    # stuffing invariant: a 0xFF header byte is never followed by MSB=1
    w = J._BitWriter()
    for _ in range(200):
        w.put(1)
    data = w.flush()
    for a, b in zip(data, data[1:]):
        if a == 0xFF:
            assert b < 0x80


def test_codestream_roundtrip_shapes_and_depths():
    rng = np.random.default_rng(5)
    for trial in range(8):
        h = int(rng.integers(1, 130))
        w = int(rng.integers(1, 130))
        depth = int(rng.integers(2, 20))
        img = rng.integers(0, 1 << depth, (h, w)).astype(np.int64)
        assert np.array_equal(J.decode_j2k(J.encode_j2k(img, depth)), img), (
            trial, h, w, depth,
        )


def test_codestream_smooth_field_compresses():
    y, x = np.mgrid[0:90, 0:180]
    img = (1000 * (np.sin(y / 20) * np.cos(x / 40) + 1.5)).astype(np.int64)
    buf = J.encode_j2k(img, 12)
    assert np.array_equal(J.decode_j2k(buf), img)
    assert len(buf) < img.size * 12 // 8 // 3  # beats raw by > 3x


def test_codestream_markers_and_gates():
    img = np.arange(64, dtype=np.int64).reshape(8, 8)
    buf = J.encode_j2k(img, 6)
    assert buf[:2] == b"\xff\x4f" and buf[-2:] == b"\xff\xd9"
    assert b"\xff\x51" in buf and b"\xff\x52" in buf and b"\xff\x5c" in buf
    # multi-component SIZ raises toward the library branch
    import struct as _s

    bad = bytearray(buf)
    siz_at = buf.index(b"\xff\x51") + 4
    _s.pack_into(">H", bad, siz_at + 34, 3)  # Csiz = 3
    with pytest.raises(NotImplementedError, match="component"):
        J.decode_j2k(bytes(bad))
    with pytest.raises(ValueError, match="SOC"):
        J.decode_j2k(b"\x00\x01\x02")


def test_grib2_jpeg2000_packing_roundtrip(tmp_path):
    from weather_tools_spark.sources.grib2 import read_grib2, write_grib2

    lats = np.linspace(50, 48, 9)
    lons = np.linspace(10, 13, 13)
    rng = np.random.default_rng(2)
    # dyadic multiples of 1/4 (exact in f64 and at decimal scale 2),
    # the same exactness convention as the simple/PNG packing goldens
    vals = rng.integers(1000, 1250, (9, 13)).astype("f8") / 4
    p = str(tmp_path / "t.grib2")
    write_grib2(
        p,
        [
            {"param": "d2m", "ref_time": "2024-01-01T00:00", "lats": lats,
             "lons": lons, "values": vals},
            {"param": "u10", "ref_time": "2024-01-01T00:00", "lats": lats,
             "lons": lons, "values": vals - 200},
        ],
        packing="jpeg2000",
        decimal_scale=2,
    )
    msgs = list(read_grib2(p))
    assert len(msgs) == 2
    for m, expect in zip(msgs, [vals, vals - 200]):
        assert np.array_equal(m["values"], expect)
    # section 5 carries template 40 with the lossless markers
    buf = open(p, "rb").read()
    s5_at = buf.index(_s5_sig(buf))
    tmpl, = np.frombuffer(buf[s5_at + 9 : s5_at + 11], ">u2")
    assert tmpl == 40


def _s5_sig(buf: bytes) -> bytes:
    # locate section 5 (length(4) + number 5) in the first message
    import struct as _s

    pos = 16  # after section 0
    while True:
        ln, num = _s.unpack_from(">IB", buf, pos)
        if num == 5:
            return buf[pos : pos + 11]
        pos += ln
