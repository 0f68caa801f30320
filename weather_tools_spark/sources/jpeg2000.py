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
