"""JPEG 2000 (ISO/IEC 15444-1) codec — stdlib + numpy, the subset GRIB2
data representation template 5.40 uses.

The reference decodes JPEG2000-packed GRIB through ecCodes (jasper/
openjpeg); those libraries are absent here, but the codestream format
is a public specification. This module implements the profile GRIB
encoders actually emit — single-component unsigned grayscale, one tile,
reversible 5/3 wavelet, no quantization, 64x64 code-blocks, default
(maximal) precincts, one quality layer, LRCP progression:

- MQ arithmetic coder (Annex C — the JBIG2/JPEG2000 coder, 47-state
  Qe table, byte-stuffed at 0xFF);
- EBCOT Tier-1 code-block coding (Annex D — significance propagation /
  magnitude refinement / cleanup passes, 19 contexts, stripe scan);
- tag trees and packet headers (Annex B.10 — inclusion + zero-bitplane
  trees, pass counts, Lblock length codes, bit stuffing);
- reversible 5/3 DWT with symmetric extension (Annex F);
- codestream markers: SOC/SIZ/COD/QCD/SOT/SOD/EOC.

Multi-component, multi-tile, irreversible 9/7, quantized, or
non-default-precinct streams raise a clear ``NotImplementedError``
naming the branch (ecCodes/openjpeg), mirroring the other codec gates.

Reference parity: GRIB2 template 5.40 handling in weather_mv's
ecCodes/cfgrib path (loader_pipeline/sinks.py engine dispatch).
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- MQ coder
# Annex C: the 47-row probability state table (Qe, NMPS, NLPS, SWITCH).

_QE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0), (0x0AC1, 4, 12, 0),
    (0x0521, 5, 29, 0), (0x0221, 38, 33, 0), (0x5601, 7, 6, 1), (0x5401, 8, 14, 0),
    (0x4801, 9, 14, 0), (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1), (0x5401, 16, 14, 0),
    (0x5101, 17, 15, 0), (0x4801, 18, 16, 0), (0x3801, 19, 17, 0), (0x3401, 20, 18, 0),
    (0x3001, 21, 19, 0), (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0), (0x1401, 28, 25, 0),
    (0x1201, 29, 26, 0), (0x1101, 30, 27, 0), (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0),
    (0x08A1, 33, 30, 0), (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0), (0x0085, 40, 37, 0),
    (0x0049, 41, 38, 0), (0x0025, 42, 39, 0), (0x0015, 43, 40, 0), (0x0009, 44, 41, 0),
    (0x0005, 45, 42, 0), (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]

# Tier-1 context indices (19 total): 0-8 zero coding, 9-13 sign coding,
# 14-16 magnitude refinement, 17 run-length, 18 UNIFORM.
N_CTX = 19
_CTX_RL = 17
_CTX_UNI = 18


class MQEncoder:
    """Annex C.2 software-convention MQ encoder. ``out[0]`` is a dummy
    prior byte (never 0xFF) absorbing the spec's BP-before-start
    convention; it is stripped at flush (a carry reaching it would be a
    coder invariant violation and raises)."""

    def __init__(self) -> None:
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.out = bytearray([0])  # dummy prior byte
        self.i = [0] * N_CTX
        self.mps = [0] * N_CTX
        # standard JPEG2000 initial states: UNIFORM=46, RL=3, ZC0=4
        self.i[_CTX_UNI] = 46
        self.i[_CTX_RL] = 3
        self.i[0] = 4

    def _byteout(self) -> None:
        if self.out[-1] == 0xFF:
            self.out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
            return
        if self.c >= 0x8000000:  # carry into the finished byte
            self.out[-1] += 1
            if self.out[-1] == 0xFF:
                self.c &= 0x7FFFFFF
                self.out.append((self.c >> 20) & 0xFF)
                self.c &= 0xFFFFF
                self.ct = 7
                return
            self.c &= 0x7FFFFFF
        self.out.append((self.c >> 19) & 0xFF)
        self.c &= 0x7FFFF
        self.ct = 8

    def _renorm(self) -> None:
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def encode(self, d: int, cx: int) -> None:
        i = self.i[cx]
        qe, nmps, nlps, switch = _QE[i]
        if d == self.mps[cx]:
            self.a -= qe
            if not (self.a & 0x8000):
                if self.a < qe:
                    self.a = qe
                else:
                    self.c += qe
                self.i[cx] = nmps
                self._renorm()
            else:
                self.c += qe
        else:
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                self.mps[cx] = 1 - self.mps[cx]
            self.i[cx] = nlps
            self._renorm()

    def flush(self) -> bytes:
        """Terminate by emitting the interval's lower bound C in full
        (four byteouts cover all 27 register bits). Always decodable by
        the marker-terminated decoder: the synthesized 0xFF tail adds
        less than one ulp at 24+ bits below the coding window while
        A >= 2^15, so the reconstructed value stays inside [C, C+A).
        The interval invariant c < 2^(15+s) (s = shifts since the last
        byteout) makes a carry into the pre-stream dummy impossible —
        asserted, not assumed."""
        for _ in range(4):
            self.c = (self.c << self.ct) & 0xFFFFFFFF
            self._byteout()
        if self.out[0] != 0:
            raise AssertionError("MQ encoder: carry reached the pre-stream byte")
        body = self.out[1:]
        # drop trailing 0xFF bytes (decoder synthesizes 1-bits past end)
        while body and body[-1] == 0xFF:
            body.pop()
        return bytes(body)


class MQDecoder:
    """Annex C.3 software-convention MQ decoder; reads past the end of
    the segment as 0xFF bytes (marker-terminated convention)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.bp = 0
        self.i = [0] * N_CTX
        self.mps = [0] * N_CTX
        self.i[_CTX_UNI] = 46
        self.i[_CTX_RL] = 3
        self.i[0] = 4
        b0 = self._byte(0)
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _byte(self, k: int) -> int:
        return self.data[k] if k < len(self.data) else 0xFF

    def _bytein(self) -> None:
        if self._byte(self.bp) == 0xFF:
            if self._byte(self.bp + 1) > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += self._byte(self.bp) << 9
                self.ct = 7
        else:
            self.bp += 1
            self.c += self._byte(self.bp) << 8
            self.ct = 8

    def _renorm(self) -> None:
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break

    def decode(self, cx: int) -> int:
        i = self.i[cx]
        qe, nmps, nlps, switch = _QE[i]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS exchange
            if self.a < qe:
                d = self.mps[cx]
                self.i[cx] = nmps
            else:
                d = 1 - self.mps[cx]
                if switch:
                    self.mps[cx] = 1 - self.mps[cx]
                self.i[cx] = nlps
            self.a = qe
            self._renorm()
        else:
            self.c -= qe << 16
            if not (self.a & 0x8000):
                # MPS exchange
                if self.a < qe:
                    d = 1 - self.mps[cx]
                    if switch:
                        self.mps[cx] = 1 - self.mps[cx]
                    self.i[cx] = nlps
                else:
                    d = self.mps[cx]
                    self.i[cx] = nmps
                self._renorm()
            else:
                d = self.mps[cx]
        return d


# ----------------------------------------------------- reversible 5/3 DWT
# Annex F: lifting with symmetric (whole-sample) boundary extension.


def _fwd53_1d(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One 5/3 analysis step → (low, high). Integer lifting with
    whole-sample symmetric extension; exact inverse in _inv53_1d."""
    n = len(x)
    if n == 1:
        return x.astype(np.int64).copy(), np.zeros(0, np.int64)
    even = x[0::2].astype(np.int64)
    odd = x[1::2].astype(np.int64)
    ne, no = len(even), len(odd)
    # predict: h[i] = odd[i] - floor((even[i] + even[i+1]) / 2),
    # even[ne] mirroring to even[ne-1] when n is even
    right = np.concatenate([even[1:], even[-1:]])[:no]
    h = odd - ((even[:no] + right) >> 1)
    # update: l[i] = even[i] + floor((h[i-1] + h[i] + 2) / 4),
    # h[-1] -> h[0] and h[no] -> h[no-1] by the same symmetry
    left = np.concatenate([h[:1], h])[:ne]
    rightu = np.concatenate([h, h[-1:]])[:ne]
    l = even + ((left + rightu + 2) >> 2)
    return l, h


def _inv53_1d(l: np.ndarray, h: np.ndarray) -> np.ndarray:
    n = len(l) + len(h)
    if n == 1:
        return l.copy()
    l = l.astype(np.int64)
    h = h.astype(np.int64)
    ne, no = len(l), len(h)
    if no:
        left = np.concatenate([h[:1], h])[:ne]
        rightu = np.concatenate([h, h[-1:]])[:ne]
        even = l - ((left + rightu + 2) >> 2)
    else:
        even = l
    if no:
        right = np.concatenate([even[1:], even[-1:]])[:no]
        odd = h + ((even[:no] + right) >> 1)
    else:
        odd = h
    out = np.empty(n, dtype=np.int64)
    out[0::2] = even
    out[1::2] = odd
    return out


def fdwt53(a: np.ndarray, levels: int) -> list[dict[str, np.ndarray]]:
    """Forward reversible 5/3 DWT: returns per-level subbands
    [{'HL','LH','HH'}...] coarsest-last plus the final 'LL' in the last
    dict. Vertical then horizontal per level (Annex F 2D_SD)."""
    ll = np.asarray(a, dtype=np.int64)
    out: list[dict[str, np.ndarray]] = []
    for _ in range(levels):
        h, w = ll.shape
        # vertical (columns)
        lo = np.empty(((h + 1) // 2, w), np.int64)
        hi = np.empty((h // 2, w), np.int64)
        for j in range(w):
            lo[:, j], hi[:, j] = _fwd53_1d(ll[:, j])
        # horizontal (rows) on both halves
        LL = np.empty(((h + 1) // 2, (w + 1) // 2), np.int64)
        HL = np.empty(((h + 1) // 2, w // 2), np.int64)
        LH = np.empty((h // 2, (w + 1) // 2), np.int64)
        HH = np.empty((h // 2, w // 2), np.int64)
        for i in range(lo.shape[0]):
            LL[i], HL[i] = _fwd53_1d(lo[i])
        for i in range(hi.shape[0]):
            LH[i], HH[i] = _fwd53_1d(hi[i])
        out.append({"HL": HL, "LH": LH, "HH": HH})
        ll = LL
    out.append({"LL": ll})
    return out


def idwt53(bands: list[dict[str, np.ndarray]]) -> np.ndarray:
    """Inverse of :func:`fdwt53`."""
    ll = bands[-1]["LL"]
    for lev in reversed(bands[:-1]):
        HL, LH, HH = lev["HL"], lev["LH"], lev["HH"]
        h = ll.shape[0] + LH.shape[0]
        w = ll.shape[1] + HL.shape[1]
        lo = np.empty(((h + 1) // 2, w), np.int64)
        hi = np.empty((h // 2, w), np.int64)
        for i in range(lo.shape[0]):
            lo[i] = _inv53_1d(ll[i], HL[i])
        for i in range(hi.shape[0]):
            hi[i] = _inv53_1d(LH[i], HH[i])
        out = np.empty((h, w), np.int64)
        for j in range(w):
            out[:, j] = _inv53_1d(lo[:, j], hi[:, j])
        ll = out
    return ll


# ------------------------------------------------------- EBCOT Tier-1
# Annex D: code-block bit-plane coding. Three passes per plane
# (significance propagation / magnitude refinement / cleanup), stripe
# scan (4-row stripes, column-major), 19 MQ contexts.

# Zero-coding context tables (Table D.1), keyed (h, v, d) neighbor
# significance counts. LL/LH table; HL swaps h/v; HH uses d + (h+v).


def _zc_context(band: str, h: int, v: int, d: int) -> int:
    if band == "HL":
        h, v = v, h
    if band != "HH":
        if h == 2:
            return 8
        if h == 1:
            return 7 if v >= 1 else (6 if d >= 1 else 5)
        if v == 2:
            return 4
        if v == 1:
            return 3
        return 2 if d >= 2 else (1 if d == 1 else 0)
    hv = h + v
    if d >= 3:
        return 8
    if d == 2:
        return 7 if hv >= 1 else 6
    if d == 1:
        return 5 if hv >= 2 else (4 if hv == 1 else 3)
    return 2 if hv >= 2 else (1 if hv == 1 else 0)


_SC_TABLE = {  # (h, v) -> (context, xor bit)   (Table D.3)
    (1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
    (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
    (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1),
}


class _BlockCoder:
    """Shared Tier-1 machinery: neighbor state for one code block."""

    def __init__(self, h: int, w: int, band: str) -> None:
        self.h, self.w, self.band = h, w, band
        self.sig = np.zeros((h + 2, w + 2), np.uint8)   # 1-padded borders
        self.sgn = np.zeros((h + 2, w + 2), np.uint8)
        self.pi = np.zeros((h, w), np.uint8)            # coded in SP this plane
        self.eta = np.zeros((h, w), np.uint8)           # refined before

    def _counts(self, y: int, x: int) -> tuple[int, int, int]:
        s = self.sig
        i, j = y + 1, x + 1
        hh = int(s[i, j - 1]) + int(s[i, j + 1])
        vv = int(s[i - 1, j]) + int(s[i + 1, j])
        dd = (
            int(s[i - 1, j - 1]) + int(s[i - 1, j + 1])
            + int(s[i + 1, j - 1]) + int(s[i + 1, j + 1])
        )
        return hh, vv, dd

    def _zc(self, y: int, x: int) -> int:
        return _zc_context(self.band, *self._counts(y, x))

    def _sc(self, y: int, x: int) -> tuple[int, int]:
        s, g = self.sig, self.sgn
        i, j = y + 1, x + 1

        def contrib(sa, ga, sb, gb):
            c = sa * (1 - 2 * ga) + sb * (1 - 2 * gb)
            return max(-1, min(1, c))

        hc = contrib(int(s[i, j - 1]), int(g[i, j - 1]), int(s[i, j + 1]), int(g[i, j + 1]))
        vc = contrib(int(s[i - 1, j]), int(g[i - 1, j]), int(s[i + 1, j]), int(g[i + 1, j]))
        return _SC_TABLE[(hc, vc)]

    def _mr(self, y: int, x: int) -> int:
        if self.eta[y, x]:
            return 16
        hh, vv, dd = self._counts(y, x)
        return 15 if hh + vv + dd > 0 else 14


def t1_encode(v: np.ndarray, sgn: np.ndarray, band: str) -> tuple[bytes, int, int]:
    """Encode one code block of magnitudes ``v`` (int64 >= 0) and signs
    ``sgn`` (1 = negative) → (MQ segment, number of bit planes, number
    of coding passes). Single codeword segment, no optional modes."""
    h, w = v.shape
    nbps = int(v.max()).bit_length() if v.size and v.max() > 0 else 0
    if nbps == 0:
        return b"", 0, 0
    st = _BlockCoder(h, w, band)
    mq = MQEncoder()

    def sp_pass(p: int) -> None:
        bit = 1 << p
        for y0 in range(0, h, 4):
            for x in range(w):
                for y in range(y0, min(y0 + 4, h)):
                    if st.sig[y + 1, x + 1]:
                        continue
                    if st._zc(y, x) == 0:
                        st.pi[y, x] = 0
                        continue
                    d = 1 if (int(v[y, x]) & bit) else 0
                    mq.encode(d, st._zc(y, x))
                    st.pi[y, x] = 1
                    if d:
                        ctx, xb = st._sc(y, x)
                        mq.encode(int(sgn[y, x]) ^ xb, ctx)
                        st.sig[y + 1, x + 1] = 1
                        st.sgn[y + 1, x + 1] = sgn[y, x]

    def mr_pass(p: int) -> None:
        bit = 1 << p
        for y0 in range(0, h, 4):
            for x in range(w):
                for y in range(y0, min(y0 + 4, h)):
                    if not st.sig[y + 1, x + 1] or st.pi[y, x]:
                        continue
                    mq.encode(1 if (int(v[y, x]) & bit) else 0, st._mr(y, x))
                    st.eta[y, x] = 1

    def cl_pass(p: int) -> None:
        bit = 1 << p
        for y0 in range(0, h, 4):
            for x in range(w):
                y = y0
                # run-length mode: full 4-column, all insignificant,
                # none coded this plane, all zero contexts
                if (
                    y0 + 4 <= h
                    and all(
                        not st.sig[y0 + k + 1, x + 1]
                        and not st.pi[y0 + k, x]
                        and st._zc(y0 + k, x) == 0
                        for k in range(4)
                    )
                ):
                    first = next(
                        (k for k in range(4) if int(v[y0 + k, x]) & bit), None
                    )
                    if first is None:
                        mq.encode(0, _CTX_RL)
                        continue
                    mq.encode(1, _CTX_RL)
                    mq.encode((first >> 1) & 1, _CTX_UNI)
                    mq.encode(first & 1, _CTX_UNI)
                    yk = y0 + first
                    ctx, xb = st._sc(yk, x)
                    mq.encode(int(sgn[yk, x]) ^ xb, ctx)
                    st.sig[yk + 1, x + 1] = 1
                    st.sgn[yk + 1, x + 1] = sgn[yk, x]
                    y = yk + 1
                for yy in range(y, min(y0 + 4, h)):
                    if st.sig[yy + 1, x + 1] or st.pi[yy, x]:
                        continue
                    d = 1 if (int(v[yy, x]) & bit) else 0
                    mq.encode(d, st._zc(yy, x))
                    if d:
                        ctx, xb = st._sc(yy, x)
                        mq.encode(int(sgn[yy, x]) ^ xb, ctx)
                        st.sig[yy + 1, x + 1] = 1
                        st.sgn[yy + 1, x + 1] = sgn[yy, x]

    npasses = 0
    for p in range(nbps - 1, -1, -1):
        if p < nbps - 1:
            sp_pass(p)
            mr_pass(p)
            npasses += 2
        cl_pass(p)
        npasses += 1
        st.pi[:] = 0
    return mq.flush(), nbps, npasses


def t1_decode(
    data: bytes, h: int, w: int, band: str, nbps: int, npasses: int
) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`t1_encode` → (magnitudes, signs)."""
    v = np.zeros((h, w), np.int64)
    sgn = np.zeros((h, w), np.uint8)
    if nbps == 0 or npasses == 0:
        return v, sgn
    st = _BlockCoder(h, w, band)
    mq = MQDecoder(data)

    def sp_pass(p: int) -> None:
        bit = 1 << p
        for y0 in range(0, h, 4):
            for x in range(w):
                for y in range(y0, min(y0 + 4, h)):
                    if st.sig[y + 1, x + 1]:
                        continue
                    if st._zc(y, x) == 0:
                        st.pi[y, x] = 0
                        continue
                    d = mq.decode(st._zc(y, x))
                    st.pi[y, x] = 1
                    if d:
                        v[y, x] |= bit
                        ctx, xb = st._sc(y, x)
                        s = mq.decode(ctx) ^ xb
                        sgn[y, x] = s
                        st.sig[y + 1, x + 1] = 1
                        st.sgn[y + 1, x + 1] = s

    def mr_pass(p: int) -> None:
        bit = 1 << p
        for y0 in range(0, h, 4):
            for x in range(w):
                for y in range(y0, min(y0 + 4, h)):
                    if not st.sig[y + 1, x + 1] or st.pi[y, x]:
                        continue
                    if mq.decode(st._mr(y, x)):
                        v[y, x] |= bit
                    st.eta[y, x] = 1

    def cl_pass(p: int) -> None:
        bit = 1 << p
        for y0 in range(0, h, 4):
            for x in range(w):
                y = y0
                if (
                    y0 + 4 <= h
                    and all(
                        not st.sig[y0 + k + 1, x + 1]
                        and not st.pi[y0 + k, x]
                        and st._zc(y0 + k, x) == 0
                        for k in range(4)
                    )
                ):
                    if not mq.decode(_CTX_RL):
                        continue
                    first = (mq.decode(_CTX_UNI) << 1) | mq.decode(_CTX_UNI)
                    yk = y0 + first
                    v[yk, x] |= bit
                    ctx, xb = st._sc(yk, x)
                    s = mq.decode(ctx) ^ xb
                    sgn[yk, x] = s
                    st.sig[yk + 1, x + 1] = 1
                    st.sgn[yk + 1, x + 1] = s
                    y = yk + 1
                for yy in range(y, min(y0 + 4, h)):
                    if st.sig[yy + 1, x + 1] or st.pi[yy, x]:
                        continue
                    if mq.decode(st._zc(yy, x)):
                        v[yy, x] |= bit
                        ctx, xb = st._sc(yy, x)
                        s = mq.decode(ctx) ^ xb
                        sgn[yy, x] = s
                        st.sig[yy + 1, x + 1] = 1
                        st.sgn[yy + 1, x + 1] = s

    done = 0
    for p in range(nbps - 1, -1, -1):
        if p < nbps - 1:
            if done >= npasses:
                break
            sp_pass(p)
            done += 1
            if done >= npasses:
                break
            mr_pass(p)
            done += 1
        if done >= npasses:
            break
        cl_pass(p)
        done += 1
        st.pi[:] = 0
    return v, sgn


# --------------------------------------------------- Tier-2: tag trees
# Annex B.10.2: quad-tree over the code-block grid; each node's value
# is the min over its subtree; encoder/decoder share incremental
# knowledge (low bound + exactly-known flag) across calls.


class TagTree:
    def __init__(self, ny: int, nx: int) -> None:
        self.levels: list[tuple[int, int]] = []
        y, x = ny, nx
        while True:
            self.levels.append((y, x))
            if y == 1 and x == 1:
                break
            y, x = (y + 1) // 2, (x + 1) // 2
        self.levels.reverse()  # root first
        self.value = [np.zeros(l, np.int64) for l in self.levels]
        self.low = [np.zeros(l, np.int64) for l in self.levels]
        self.known = [np.zeros(l, bool) for l in self.levels]

    def set_values(self, leaf_vals: np.ndarray) -> None:
        """Encoder side: populate node values as subtree minima."""
        self.value[-1][:] = leaf_vals
        for d in range(len(self.levels) - 2, -1, -1):
            child = self.value[d + 1]
            ny, nx = self.levels[d]
            for i in range(ny):
                for j in range(nx):
                    sub = child[2 * i : 2 * i + 2, 2 * j : 2 * j + 2]
                    self.value[d][i, j] = sub.min()

    def _path(self, y: int, x: int):
        out = []
        for d in range(len(self.levels)):
            shift = len(self.levels) - 1 - d
            out.append((d, y >> shift, x >> shift))
        return out

    def encode(self, y: int, x: int, threshold: int, bits: "_BitWriter") -> None:
        low = 0
        for d, i, j in self._path(y, x):
            low = max(low, int(self.low[d][i, j]))
            while True:
                if self.known[d][i, j]:
                    low = max(low, int(self.value[d][i, j]))
                    break
                if low >= threshold:
                    break
                if low == self.value[d][i, j]:
                    bits.put(1)
                    self.known[d][i, j] = True
                    break
                bits.put(0)
                low += 1
            self.low[d][i, j] = low
            if not self.known[d][i, j] and low >= threshold:
                return

    def decode(self, y: int, x: int, threshold: int, bits: "_BitReader") -> int:
        """Returns the leaf value if resolved below threshold, else
        ``threshold`` (meaning >= threshold)."""
        low = 0
        for d, i, j in self._path(y, x):
            low = max(low, int(self.low[d][i, j]))
            while True:
                if self.known[d][i, j]:
                    low = max(low, int(self.value[d][i, j]))
                    break
                if low >= threshold:
                    break
                if bits.get():
                    self.value[d][i, j] = low
                    self.known[d][i, j] = True
                    break
                low += 1
            self.low[d][i, j] = low
            if not self.known[d][i, j] and low >= threshold:
                return threshold
        d, i, j = self._path(y, x)[-1]
        return int(self.value[d][i, j]) if self.known[d][i, j] else low


class _BitWriter:
    """MSB-first packet-header bit packer with 0xFF stuffing: after an
    emitted 0xFF byte the next byte carries only 7 bits (its MSB is a
    stuffed 0). A header may not end with 0xFF (B.10.1)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def _limit(self) -> int:
        return 7 if self.out and self.out[-1] == 0xFF else 8

    def put(self, bit: int) -> None:
        self.acc = (self.acc << 1) | (bit & 1)
        self.nbits += 1
        if self.nbits == self._limit():
            self.out.append(self.acc)
            self.acc = 0
            self.nbits = 0

    def put_bits(self, val: int, n: int) -> None:
        for k in range(n - 1, -1, -1):
            self.put((val >> k) & 1)

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc << (self._limit() - self.nbits))
            self.acc = 0
            self.nbits = 0
        if self.out and self.out[-1] == 0xFF:
            self.out.append(0x00)
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.prev_ff = False

    def get(self) -> int:
        if self.nbits == 0:
            b = self.data[self.pos]
            self.pos += 1
            self.nbits = 7 if self.prev_ff else 8
            self.prev_ff = b == 0xFF
            self.acc = b & ((1 << self.nbits) - 1)
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def get_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get()
        return v

    def align(self) -> int:
        """Finish the current byte (and the stuffed byte after a
        trailing 0xFF) and return the next whole-byte position."""
        self.nbits = 0
        if self.prev_ff:
            # header ended on a 0xFF: the following stuffed byte
            # belongs to the header only if it was started; B.10.1
            # guarantees a 0x00 follows, consume it
            if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                self.pos += 1
            self.prev_ff = False
        return self.pos


def _put_npasses(n: int, bits: _BitWriter) -> None:
    if n == 1:
        bits.put(0)
    elif n == 2:
        bits.put_bits(0b10, 2)
    elif n <= 5:
        bits.put_bits(0b11, 2)
        bits.put_bits(n - 3, 2)
    elif n <= 36:
        bits.put_bits(0b1111, 4)
        bits.put_bits(n - 6, 5)
    elif n <= 164:
        bits.put_bits(0b111111111, 9)
        bits.put_bits(n - 37, 7)
    else:
        raise ValueError(f"{n} coding passes cannot be signalled")


def _get_npasses(bits: _BitReader) -> int:
    if not bits.get():
        return 1
    if not bits.get():
        return 2
    v = bits.get_bits(2)
    if v < 3:
        return 3 + v
    v = bits.get_bits(5)
    if v < 31:
        return 6 + v
    return 37 + bits.get_bits(7)


# ------------------------------------------------- codestream (Annex A/B)

_CB_LOG = 6  # 64x64 code-blocks
_GUARD = 2
_GAIN = {"LL": 0, "HL": 1, "LH": 1, "HH": 2}


def _band_shapes(h: int, w: int, levels: int) -> list[dict[str, tuple[int, int]]]:
    """Subband shapes per DWT level (finest-first, mirroring fdwt53)."""
    out = []
    for _ in range(levels):
        hl = ((h + 1) // 2, w // 2)
        lh = (h // 2, (w + 1) // 2)
        hh = (h // 2, w // 2)
        out.append({"HL": hl, "LH": lh, "HH": hh})
        h, w = (h + 1) // 2, (w + 1) // 2
    out.append({"LL": (h, w)})
    return out


def _resolution_bands(levels: int):
    """LRCP band iteration: resolution 0 -> [LL at coarsest]; resolution
    r>=1 -> HL/LH/HH of DWT level (levels - r), as indices into the
    fdwt53 output list."""
    yield 0, [("LL", levels)]
    for r in range(1, levels + 1):
        yield r, [("HL", levels - r), ("LH", levels - r), ("HH", levels - r)]


def _encode_packet(band_blocks: list[tuple[str, list[dict]]]) -> bytes:
    """One packet (single layer): header bits + aligned bodies.
    ``band_blocks``: per band, the list of code-block dicts with keys
    seg/nbps/npasses/zb and grid position iy/ix plus grid shape ny/nx."""
    anything = any(b["npasses"] > 0 for _nm, blocks in band_blocks for b in blocks)
    bw = _BitWriter()
    if not anything:
        bw.put(0)
        return bw.flush()
    bw.put(1)
    bodies = []
    for _nm, blocks in band_blocks:
        if not blocks:
            continue
        ny = max(b["iy"] for b in blocks) + 1
        nx = max(b["ix"] for b in blocks) + 1
        inc = TagTree(ny, nx)
        zbt = TagTree(ny, nx)
        incv = np.ones((ny, nx), np.int64)
        zbv = np.zeros((ny, nx), np.int64)
        for b in blocks:
            incv[b["iy"], b["ix"]] = 0 if b["npasses"] else 1
            zbv[b["iy"], b["ix"]] = b["zb"]
        inc.set_values(incv)
        zbt.set_values(zbv)
        for b in blocks:
            inc.encode(b["iy"], b["ix"], 1, bw)
            if not b["npasses"]:
                continue
            # zero bit-planes: encode to full resolution
            zbt.encode(b["iy"], b["ix"], int(zbv[b["iy"], b["ix"]]) + 1, bw)
            _put_npasses(b["npasses"], bw)
            lblock = 3
            nbits = lblock + int(b["npasses"]).bit_length() - 1
            while len(b["seg"]) >= (1 << nbits):
                bw.put(1)
                lblock += 1
                nbits += 1
            bw.put(0)
            bw.put_bits(len(b["seg"]), nbits)
            bodies.append(b["seg"])
    return bw.flush() + b"".join(bodies)


def _decode_packet(
    data: bytes, pos: int, grids: list[tuple[str, int, int]]
) -> tuple[int, list[list[dict]]]:
    """Parse one packet at ``pos``: returns (new pos, per-band list of
    included block dicts {iy, ix, zb, npasses, seg})."""
    br = _BitReader(data, pos)
    out: list[list[dict]] = [[] for _ in grids]
    if not br.get():
        return br.align(), out
    lens: list[tuple[int, int, int, int, int]] = []  # (band#, iy, ix, ...)
    for bi, (_nm, ny, nx) in enumerate(grids):
        if ny == 0 or nx == 0:
            continue
        inc = TagTree(ny, nx)
        zbt = TagTree(ny, nx)
        for iy in range(ny):
            for ix in range(nx):
                if inc.decode(iy, ix, 1, br) >= 1:
                    continue
                t = 1
                while zbt.decode(iy, ix, t, br) >= t:
                    t += 1
                zb = zbt.decode(iy, ix, t, br)
                npasses = _get_npasses(br)
                lblock = 3
                while br.get():
                    lblock += 1
                nbits = lblock + npasses.bit_length() - 1
                seglen = br.get_bits(nbits)
                out[bi].append(
                    {"iy": iy, "ix": ix, "zb": zb, "npasses": npasses, "len": seglen}
                )
    pos = br.align()
    for blocks in out:
        for b in blocks:
            b["seg"] = data[pos : pos + b["len"]]
            pos += b["len"]
    return pos, out


def encode_j2k(img: np.ndarray, depth: int, levels: int = 5) -> bytes:
    """Encode a 2-D unsigned integer image as a lossless single-tile
    JPEG 2000 codestream (the GRIB2 template 5.40 payload profile)."""
    h, w = img.shape
    if h < 1 or w < 1:
        raise ValueError("empty image")
    levels = max(0, min(levels, (min(h, w) - 1).bit_length()))
    shifted = img.astype(np.int64) - (1 << (depth - 1))
    bands = fdwt53(shifted, levels)
    packets = []
    for _r, blist in _resolution_bands(levels):
        band_blocks = []
        for nm, li in blist:
            arr = bands[li][nm]
            bh, bw_ = arr.shape
            blocks = []
            if bh and bw_:
                mb = depth + _GAIN[nm] + _GUARD - 1
                for iy in range((bh + 63) >> _CB_LOG):
                    for ix in range((bw_ + 63) >> _CB_LOG):
                        blk = arr[iy * 64 : iy * 64 + 64, ix * 64 : ix * 64 + 64]
                        mag = np.abs(blk)
                        sg = (blk < 0).astype(np.uint8)
                        seg, nbps, npasses = t1_encode(mag, sg, nm)
                        if nbps > mb:
                            raise ValueError(
                                f"{nm} coefficients need {nbps} planes > Mb={mb}"
                            )
                        blocks.append(
                            {
                                "iy": iy, "ix": ix, "seg": seg,
                                "nbps": nbps, "npasses": npasses,
                                "zb": mb - nbps if npasses else 0,
                            }
                        )
            band_blocks.append((nm, blocks))
        packets.append(_encode_packet(band_blocks))
    body = b"".join(packets)

    siz = struct.pack(
        ">HHIIIIIIIIHBBB",
        41, 0, w, h, 0, 0, w, h, 0, 0, 1, depth - 1, 1, 1,
    )
    cod = struct.pack(">HBBHBBBBBB", 12, 0, 0, 1, 0, levels, 4, 4, 0, 1)
    nb = 3 * levels + 1
    exps = [depth + _GAIN["LL"]]
    for r in range(1, levels + 1):
        for nm in ("HL", "LH", "HH"):
            exps.append(depth + _GAIN[nm])
    qcd = struct.pack(">HB", 3 + nb, (_GUARD << 5) | 0) + bytes(e << 3 for e in exps)
    sot_len = 12 + 2 + len(body)  # SOT segment + SOD marker + packets
    sot = struct.pack(">HHIBB", 10, 0, sot_len, 0, 1)
    return (
        b"\xff\x4f"
        + b"\xff\x51" + siz
        + b"\xff\x52" + cod
        + b"\xff\x5c" + qcd
        + b"\xff\x90" + sot
        + b"\xff\x93" + body
        + b"\xff\xd9"
    )


def decode_j2k(buf: bytes) -> np.ndarray:
    """Decode a codestream produced by the profile :func:`encode_j2k`
    writes (single tile/component, reversible 5/3, default precincts,
    one layer). Other streams raise NotImplementedError naming the
    openjpeg branch."""
    if buf[:2] != b"\xff\x4f":
        raise ValueError("not a JPEG 2000 codestream (no SOC)")
    pos = 2
    w = h = depth = levels = None
    while pos < len(buf):
        marker = buf[pos : pos + 2]
        pos += 2
        if marker == b"\xff\x93":  # SOD
            break
        (ln,) = struct.unpack_from(">H", buf, pos)
        seg = buf[pos + 2 : pos + ln]
        if marker == b"\xff\x51":  # SIZ
            (_rsiz, xs, ys, xo, yo, xt, yt, xto, yto, cs) = struct.unpack_from(
                ">HIIIIIIIIH", seg, 0
            )
            if cs != 1:
                raise NotImplementedError(
                    f"{cs}-component JPEG 2000 (openjpeg branch required)"
                )
            if (xo, yo, xto, yto) != (0, 0, 0, 0) or (xt, yt) != (xs, ys):
                raise NotImplementedError("multi-tile / offset JPEG 2000 grid")
            ssiz, xr, yr = seg[36], seg[37], seg[38]
            if ssiz & 0x80:
                raise NotImplementedError("signed-component JPEG 2000")
            if (xr, yr) != (1, 1):
                raise NotImplementedError("subsampled JPEG 2000 component")
            w, h, depth = xs, ys, (ssiz & 0x7F) + 1
        elif marker == b"\xff\x52":  # COD
            scod, prog, layers, mct = seg[0], seg[1], struct.unpack_from(">H", seg, 2)[0], seg[4]
            levels, cbw, cbh, cbstyle, transform = seg[5], seg[6], seg[7], seg[8], seg[9]
            if scod & 0x01:
                raise NotImplementedError("non-default JPEG 2000 precincts")
            if layers != 1:
                raise NotImplementedError(f"{layers}-layer JPEG 2000 stream")
            if prog != 0 and layers != 1:
                raise NotImplementedError(f"progression order {prog}")
            if mct:
                raise NotImplementedError("JPEG 2000 multi-component transform")
            if (cbw, cbh) != (4, 4):
                raise NotImplementedError(
                    f"code-block size 2^{cbw + 2}x2^{cbh + 2} (64x64 only)"
                )
            if cbstyle:
                raise NotImplementedError(f"code-block style {cbstyle:#x}")
            if transform != 1:
                raise NotImplementedError("irreversible 9/7 wavelet (openjpeg branch)")
        elif marker == b"\xff\x5c":  # QCD
            if seg[0] & 0x1F:
                raise NotImplementedError("quantized JPEG 2000 stream")
        elif marker == b"\xff\x90":  # SOT
            pass
        elif marker in (b"\xff\x64", b"\xff\x63", b"\xff\x55", b"\xff\x58"):
            pass  # COM / informational segments: skip
        else:
            raise NotImplementedError(f"JPEG 2000 marker {marker.hex()}")
        pos += ln
    if w is None or levels is None:
        raise ValueError("JPEG 2000 codestream missing SIZ/COD before SOD")

    shapes = _band_shapes(h, w, levels)
    bands: list[dict[str, np.ndarray]] = [
        {nm: np.zeros(s, np.int64) for nm, s in lev.items()} for lev in shapes
    ]
    for _r, blist in _resolution_bands(levels):
        grids = []
        for nm, li in blist:
            bh, bw_ = shapes[li][nm]
            grids.append(
                (nm, (bh + 63) >> _CB_LOG if bh else 0, (bw_ + 63) >> _CB_LOG if bw_ else 0)
            )
        pos, per_band = _decode_packet(buf, pos, grids)
        for (nm, li), blocks in zip(blist, per_band):
            arr = bands[li][nm]
            for b in blocks:
                y0, x0 = b["iy"] * 64, b["ix"] * 64
                bh = min(64, arr.shape[0] - y0)
                bw_ = min(64, arr.shape[1] - x0)
                mb = depth + _GAIN[nm] + _GUARD - 1
                nbps = mb - b["zb"]
                mag, sg = t1_decode(b["seg"], bh, bw_, nm, nbps, b["npasses"])
                arr[y0 : y0 + bh, x0 : x0 + bw_] = np.where(sg == 1, -mag, mag)
    out = idwt53(bands) + (1 << (depth - 1))
    return out
