#!/usr/bin/env python3
"""Minimal VP8 KEYFRAME codec in python — the independent fixture side for
graft.ops.Vp8 (the Scala decoder). Implements, from RFC 6386:

  - the boolean arithmetic coder (encoder AND decoder),
  - keyframe headers (segmentation, filter params, quantizers, token
    probability updates, multiple token partitions),
  - intra prediction (16x16 DC/V/H/TM, all ten 4x4 B_PRED submodes with the
    above-right quirk, chroma 8x8),
  - forward/inverse DCT + WHT (inverse = exact RFC integer transforms; the
    forward side is encoder-only and need not match any reference),
  - coefficient tokenization with contexts/bands/categories,
  - the loop filter (simple + normal profiles).

The ENCODER reconstructs every macroblock through the same inverse path a
decoder runs, so `encode(...)` returns both the bitstream and the exact
expected Y/U/V planes; WebpSpec pins the Scala decoder against those planes
byte-for-byte. All probability/constant tables come from tools/vp8_tables.py
(the single shared source — see its provenance notes).
"""
import vp8_tables as T


def clip255(v):
    return 0 if v < 0 else (255 if v > 255 else v)


def clamp_s(v, lo, hi):
    return lo if v < lo else (hi if v > hi else v)


# ---------------------------------------------------------------- bool coder

class BoolEncoder:
    """Exact arithmetic encoder for the RFC 6386 boolean decoder. Python's
    arbitrary-precision ints make the textbook carry-free formulation
    possible: `low` is the exact lower interval bound at the current scale
    (one renormalization = one binary digit), so the final stream is simply
    `low` zero-padded — no 24-bit window or carry propagation. Validated by
    round trip against BoolDecoder over randomized (bit, prob) sequences.
    """

    def __init__(self):
        self.low = 0
        self.range = 255
        self.bits = 0  # renormalization shifts so far

    def put(self, bit, prob):
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.low += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            self.low <<= 1
            self.bits += 1

    def literal(self, v, n):
        for i in range(n - 1, -1, -1):
            self.put((v >> i) & 1, 128)

    def signed_literal(self, v, n):
        self.literal(abs(v), n)
        self.put(1 if v < 0 else 0, 128)

    def flagged_signed(self, v, n):
        if v == 0:
            self.put(0, 128)
        else:
            self.put(1, 128)
            self.signed_literal(v, n)

    def tree(self, tree, probs, value):
        def dfs(i, acc):
            for b in (0, 1):
                t = tree[i + b]
                if t <= 0:
                    if -t == value:
                        return acc + [(i >> 1, b)]
                else:
                    r = dfs(t, acc + [(i >> 1, b)])
                    if r is not None:
                        return r
            return None
        path = dfs(0, [])
        assert path is not None, "leaf %d not in tree" % value
        for pi, b in path:
            self.put(b, probs[pi])

    def finish(self):
        # the stream is the binary fraction `low` at scale 2^-(8 + bits)
        # (the decoder's comparison window sits 8 bits below the scale);
        # pad to a byte boundary plus lookahead zeros for the final reads
        total = self.bits + 8
        nbytes = (total + 7) // 8
        v = self.low << (nbytes * 8 - total)
        out = v.to_bytes(nbytes, "big") if nbytes > 0 else b""
        return out + b"\x00" * 4


class BoolDecoder:
    def __init__(self, data):
        self.data = data
        self.pos = 2
        self.value = ((data[0] << 8) | data[1]) if len(data) >= 2 else 0
        self.range = 255
        self.bit_count = 0

    def get(self, prob):
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos]
                self.pos += 1
        return ret

    def literal(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get(128)
        return v

    def signed_literal(self, n):
        v = self.literal(n)
        return -v if self.get(128) else v

    def flagged_signed(self, n):
        return self.signed_literal(n) if self.get(128) else 0

    def tree(self, tree, probs):
        i = 0
        while True:
            b = self.get(probs[i >> 1])
            t = tree[i + b]
            if t <= 0:
                return -t
            i = t


# ------------------------------------------------------------- transforms

def idct4x4(coefs):
    """RFC 6386 §14.3 inverse DCT; coefs raster-order, returns 16 residuals."""
    c1 = 20091  # cospi8sqrt2 - 1, Q16
    c2 = 35468  # sinpi8sqrt2, Q16
    tmp = [0] * 16
    for i in range(4):
        a1 = coefs[i] + coefs[i + 8]
        b1 = coefs[i] - coefs[i + 8]
        t1 = (coefs[i + 4] * c2) >> 16
        t2 = coefs[i + 12] + ((coefs[i + 12] * c1) >> 16)
        cc = t1 - t2
        t1 = coefs[i + 4] + ((coefs[i + 4] * c1) >> 16)
        t2 = (coefs[i + 12] * c2) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[i + 12] = a1 - d1
        tmp[i + 4] = b1 + cc
        tmp[i + 8] = b1 - cc
    out = [0] * 16
    for i in range(4):
        r = i * 4
        a1 = tmp[r] + tmp[r + 2]
        b1 = tmp[r] - tmp[r + 2]
        t1 = (tmp[r + 1] * c2) >> 16
        t2 = tmp[r + 3] + ((tmp[r + 3] * c1) >> 16)
        cc = t1 - t2
        t1 = tmp[r + 1] + ((tmp[r + 1] * c1) >> 16)
        t2 = (tmp[r + 3] * c2) >> 16
        d1 = t1 + t2
        out[r] = (a1 + d1 + 4) >> 3
        out[r + 3] = (a1 - d1 + 4) >> 3
        out[r + 1] = (b1 + cc + 4) >> 3
        out[r + 2] = (b1 - cc + 4) >> 3
    return out


def iwht4x4(coefs):
    """RFC 6386 §14.3 inverse Walsh-Hadamard (Y2); returns the 16 DCs."""
    tmp = [0] * 16
    for i in range(4):
        a1 = coefs[i] + coefs[i + 12]
        b1 = coefs[i + 4] + coefs[i + 8]
        c1 = coefs[i + 4] - coefs[i + 8]
        d1 = coefs[i] - coefs[i + 12]
        tmp[i] = a1 + b1
        tmp[i + 4] = c1 + d1
        tmp[i + 8] = a1 - b1
        tmp[i + 12] = d1 - c1
    out = [0] * 16
    for i in range(4):
        r = i * 4
        a1 = tmp[r] + tmp[r + 3]
        b1 = tmp[r + 1] + tmp[r + 2]
        c1 = tmp[r + 1] - tmp[r + 2]
        d1 = tmp[r] - tmp[r + 3]
        out[r] = (a1 + b1 + 3) >> 3
        out[r + 1] = (c1 + d1 + 3) >> 3
        out[r + 2] = (a1 - b1 + 3) >> 3
        out[r + 3] = (d1 - c1 + 3) >> 3
    return out


def fdct4x4(res):
    """Encoder-side forward DCT (libvpx-style integer fdct); only needs to
    be an approximate inverse of idct4x4 — recon always goes through the
    exact inverse."""
    tmp = [0] * 16
    for i in range(4):
        r = i * 4
        a1 = (res[r] + res[r + 3]) * 8
        b1 = (res[r + 1] + res[r + 2]) * 8
        c1 = (res[r + 1] - res[r + 2]) * 8
        d1 = (res[r] - res[r + 3]) * 8
        tmp[r] = a1 + b1
        tmp[r + 2] = a1 - b1
        tmp[r + 1] = (c1 * 2217 + d1 * 5352 + 14500) >> 12
        tmp[r + 3] = (d1 * 2217 - c1 * 5352 + 7500) >> 12
    out = [0] * 16
    for i in range(4):
        a1 = tmp[i] + tmp[i + 12]
        b1 = tmp[i + 4] + tmp[i + 8]
        c1 = tmp[i + 4] - tmp[i + 8]
        d1 = tmp[i] - tmp[i + 12]
        out[i] = (a1 + b1 + 7) >> 4
        out[i + 8] = (a1 - b1 + 7) >> 4
        out[i + 4] = ((c1 * 2217 + d1 * 5352 + 12000) >> 16) + (1 if d1 != 0 else 0)
        out[i + 12] = (d1 * 2217 - c1 * 5352 + 51000) >> 16
    return out


def fwht4x4(dcs):
    """Encoder-side forward WHT for the 16 subblock DCs (approximate
    inverse of iwht4x4; calibrated so iwht(fwht(x)) ~= x)."""
    tmp = [0] * 16
    for i in range(4):
        r = i * 4
        a1 = dcs[r] + dcs[r + 3]
        b1 = dcs[r + 1] + dcs[r + 2]
        c1 = dcs[r + 1] - dcs[r + 2]
        d1 = dcs[r] - dcs[r + 3]
        tmp[r] = a1 + b1
        tmp[r + 1] = c1 + d1
        tmp[r + 2] = a1 - b1
        tmp[r + 3] = d1 - c1
    out = [0] * 16
    for i in range(4):
        a1 = tmp[i] + tmp[i + 12]
        b1 = tmp[i + 4] + tmp[i + 8]
        c1 = tmp[i + 4] - tmp[i + 8]
        d1 = tmp[i] - tmp[i + 12]
        # 2D gain is 16; iwht carries >>3 (gain 1/8): scale by 1/2 → identity
        out[i] = (a1 + b1) // 2
        out[i + 4] = (c1 + d1) // 2
        out[i + 8] = (a1 - b1) // 2
        out[i + 12] = (d1 - c1) // 2
    return out


# ------------------------------------------------------------- quantizers

def clampq(q):
    return clamp_s(q, 0, 127)


def dequant_factors(y_ac_qi, y_dc_d, y2_dc_d, y2_ac_d, uv_dc_d, uv_ac_d):
    y1dc = T.DC_QLOOKUP[clampq(y_ac_qi + y_dc_d)]
    y1ac = T.AC_QLOOKUP[clampq(y_ac_qi)]
    y2dc = T.DC_QLOOKUP[clampq(y_ac_qi + y2_dc_d)] * 2
    y2ac = T.AC_QLOOKUP[clampq(y_ac_qi + y2_ac_d)] * 155 // 100
    if y2ac < 8:
        y2ac = 8
    uvdc = T.DC_QLOOKUP[clampq(y_ac_qi + uv_dc_d)]
    if uvdc > 132:
        uvdc = 132
    uvac = T.AC_QLOOKUP[clampq(y_ac_qi + uv_ac_d)]
    return {"y1": (y1dc, y1ac), "y2": (y2dc, y2ac), "uv": (uvdc, uvac)}


# ------------------------------------------------------------- prediction

# round-12 numbering fix: the spec/libwebp intra_bmode order is RD=4, VR=5,
# LD=6 (verified against libwebp's compiled kVP8PredLuma4 dispatch and the
# context-indexed kf_bmode_probs rows); round 11 had LD=4,RD=5,VR=6, which
# mis-rowed the [above][left] prob lookups for exactly those three modes.
B_DC, B_TM, B_VE, B_HE, B_RD, B_VR, B_LD, B_VL, B_HD, B_HU = range(10)
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = range(5)


def avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def avg2(a, b):
    return (a + b + 1) >> 1


def predict_4x4(mode, A, L, P, AR):
    """A[0..3] above, L[0..3] left, P above-left, AR[0..3] above-right."""
    p = [[0] * 4 for _ in range(4)]
    if mode == B_DC:
        v = (sum(A) + sum(L) + 4) >> 3
        for r in range(4):
            for c in range(4):
                p[r][c] = v
    elif mode == B_TM:
        for r in range(4):
            for c in range(4):
                p[r][c] = clip255(L[r] + A[c] - P)
    elif mode == B_VE:
        e = [P] + A + [AR[0]]
        row = [avg3(e[i], e[i + 1], e[i + 2]) for i in range(4)]
        for r in range(4):
            p[r] = row[:]
    elif mode == B_HE:
        col = [avg3(P, L[0], L[1]), avg3(L[0], L[1], L[2]),
               avg3(L[1], L[2], L[3]), avg3(L[2], L[3], L[3])]
        for r in range(4):
            for c in range(4):
                p[r][c] = col[r]
    elif mode == B_LD:
        a = A + AR
        def v(i):
            return avg3(a[i], a[i + 1], a[i + 2]) if i < 6 else avg3(a[6], a[7], a[7])
        for r in range(4):
            for c in range(4):
                p[r][c] = v(r + c)
    elif mode == B_RD:
        e = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]]
        for r in range(4):
            for c in range(4):
                i = 3 + c - r  # diagonal start: (3,0) -> e[0..2], (0,3) -> e[6..8]
                p[r][c] = avg3(e[i], e[i + 1], e[i + 2])
    elif mode == B_VR:
        e = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]]
        p[0] = [avg2(e[4], e[5]), avg2(e[5], e[6]), avg2(e[6], e[7]), avg2(e[7], e[8])]
        p[1] = [avg3(e[3], e[4], e[5]), avg3(e[4], e[5], e[6]),
                avg3(e[5], e[6], e[7]), avg3(e[6], e[7], e[8])]
        p[2] = [avg3(e[2], e[3], e[4])] + p[0][:3]
        p[3] = [avg3(e[1], e[2], e[3])] + p[1][:3]
    elif mode == B_VL:
        a = A + AR
        p[0] = [avg2(a[0], a[1]), avg2(a[1], a[2]), avg2(a[2], a[3]), avg2(a[3], a[4])]
        p[1] = [avg3(a[0], a[1], a[2]), avg3(a[1], a[2], a[3]),
                avg3(a[2], a[3], a[4]), avg3(a[3], a[4], a[5])]
        p[2] = p[0][1:] + [avg3(a[4], a[5], a[6])]
        p[3] = p[1][1:] + [avg3(a[5], a[6], a[7])]
    elif mode == B_HD:
        e = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2]]
        p[3] = [avg2(e[0], e[1]), avg3(e[0], e[1], e[2]),
                avg2(e[1], e[2]), avg3(e[1], e[2], e[3])]
        p[2] = [avg2(e[1], e[2]), avg3(e[1], e[2], e[3]),
                avg2(e[2], e[3]), avg3(e[2], e[3], e[4])]
        p[1] = [avg2(e[2], e[3]), avg3(e[2], e[3], e[4]),
                avg2(e[3], e[4]), avg3(e[3], e[4], e[5])]
        p[0] = [avg2(e[3], e[4]), avg3(e[3], e[4], e[5]),
                avg3(e[4], e[5], e[6]), avg3(e[5], e[6], e[7])]
    elif mode == B_HU:
        l = L
        p[0] = [avg2(l[0], l[1]), avg3(l[0], l[1], l[2]), avg2(l[1], l[2]),
                avg3(l[1], l[2], l[3])]
        p[1] = [avg2(l[1], l[2]), avg3(l[1], l[2], l[3]), avg2(l[2], l[3]),
                avg3(l[2], l[3], l[3])]
        p[2] = [avg2(l[2], l[3]), avg3(l[2], l[3], l[3]), l[3], l[3]]
        p[3] = [l[3]] * 4
    else:
        raise ValueError(mode)
    return p


def predict_16x16(mode, A, L, P, up, left):
    """A[16] above, L[16] left, P corner; up/left availability flags."""
    p = [[0] * 16 for _ in range(16)]
    if mode == DC_PRED:
        if up and left:
            v = (sum(A) + sum(L) + 16) >> 5
        elif up:
            v = (sum(A) + 8) >> 4
        elif left:
            v = (sum(L) + 8) >> 4
        else:
            v = 128
        for r in range(16):
            for c in range(16):
                p[r][c] = v
    elif mode == V_PRED:
        for r in range(16):
            p[r] = list(A)
    elif mode == H_PRED:
        for r in range(16):
            for c in range(16):
                p[r][c] = L[r]
    elif mode == TM_PRED:
        for r in range(16):
            for c in range(16):
                p[r][c] = clip255(L[r] + A[c] - P)
    return p


def predict_8x8(mode, A, L, P, up, left):
    p = [[0] * 8 for _ in range(8)]
    if mode == DC_PRED:
        if up and left:
            v = (sum(A) + sum(L) + 8) >> 4
        elif up:
            v = (sum(A) + 4) >> 3
        elif left:
            v = (sum(L) + 4) >> 3
        else:
            v = 128
        for r in range(8):
            for c in range(8):
                p[r][c] = v
    elif mode == V_PRED:
        for r in range(8):
            p[r] = list(A)
    elif mode == H_PRED:
        for r in range(8):
            for c in range(8):
                p[r][c] = L[r]
    elif mode == TM_PRED:
        for r in range(8):
            for c in range(8):
                p[r][c] = clip255(L[r] + A[c] - P)
    return p


# ------------------------------------------------------------- loop filter

def _c128(v):
    return clamp_s(v, -128, 127)


def _u2s(v):
    return v - 128


def _s2u(v):
    return _c128(v) + 128


class Plane:
    def __init__(self, w, h, fill=0):
        self.w = w
        self.h = h
        self.d = bytearray([fill]) * (w * h) if fill else bytearray(w * h)

    def get(self, x, y):
        return self.d[y * self.w + x]

    def set(self, x, y, v):
        self.d[y * self.w + x] = v


def _filter_common(pix, use_outer):
    p1, p0, q0, q1 = (_u2s(v) for v in pix[2:6])
    a = 3 * (q0 - p0)
    if use_outer:
        a += _c128(p1 - q1)
    a = _c128(a)
    f = _c128(a + 4) >> 3
    e = _c128(a + 3) >> 3
    pix[3] = _s2u(p0 + e)
    pix[4] = _s2u(q0 - f)
    return f


def _hev(pix, thresh):
    return abs(pix[2] - pix[3]) > thresh or abs(pix[5] - pix[4]) > thresh


def _normal_mask(pix, interior, edge):
    p3, p2, p1, p0, q0, q1, q2, q3 = pix
    return (abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= edge and
            abs(p3 - p2) <= interior and abs(p2 - p1) <= interior and
            abs(p1 - p0) <= interior and abs(q1 - q0) <= interior and
            abs(q2 - q1) <= interior and abs(q3 - q2) <= interior)


def _subblock_filter(pix, hev_t, interior, edge):
    if _normal_mask(pix, interior, edge):
        if _hev(pix, hev_t):
            _filter_common(pix, True)
        else:
            f = _filter_common(pix, False)
            a = (f + 1) >> 1
            pix[5] = _s2u(_u2s(pix[5]) - a)
            pix[2] = _s2u(_u2s(pix[2]) + a)


def _mbloop_filter(pix, hev_t, interior, edge):
    if _normal_mask(pix, interior, edge):
        if _hev(pix, hev_t):
            _filter_common(pix, True)
        else:
            p2, p1, p0, q0, q1, q2 = (_u2s(v) for v in pix[1:7])
            w = _c128(_c128(p1 - q1) + 3 * (q0 - p0))
            a = _c128((27 * w + 63) >> 7)
            pix[4] = _s2u(q0 - a)
            pix[3] = _s2u(p0 + a)
            a = _c128((18 * w + 63) >> 7)
            pix[5] = _s2u(q1 - a)
            pix[2] = _s2u(p1 + a)
            a = _c128((9 * w + 63) >> 7)
            pix[6] = _s2u(q2 - a)
            pix[1] = _s2u(p2 + a)


def _simple_filter(pix, edge):
    if abs(pix[3] - pix[4]) * 2 + abs(pix[2] - pix[5]) // 2 <= edge:
        _filter_common(pix, True)


def _filter_edge(plane, x0, y0, n, vertical, fn):
    """Apply `fn` to n 8-pixel runs crossing the edge at x0 (vertical edge:
    pixels x0-4..x0+3 of rows y0..y0+n-1) or y0 (horizontal)."""
    for i in range(n):
        if vertical:
            xs = [(x0 - 4 + j, y0 + i) for j in range(8)]
        else:
            xs = [(x0 + i, y0 - 4 + j) for j in range(8)]
        pix = [plane.get(x, y) for x, y in xs]
        fn(pix)
        for (x, y), v in zip(xs, pix):
            plane.set(x, y, v)


def loop_filter_frame(y, u, v, mbW, mbH, mbinfo, filter_type, base_level,
                      sharpness, seg_lf, seg_abs, ref_delta, mode_delta,
                      lf_delta_on):
    """mbinfo[mby][mbx] = (ymode, skip_and_no_coeffs, segment)."""
    for mby in range(mbH):
        for mbx in range(mbW):
            ymode, skipped, seg = mbinfo[mby][mbx]
            lvl = base_level
            if seg_lf is not None:
                lvl = seg_lf[seg] if seg_abs else lvl + seg_lf[seg]
            if lf_delta_on:
                lvl += ref_delta[0]  # keyframes: INTRA_FRAME delta
                if ymode == B_PRED:
                    lvl += mode_delta[0]
            lvl = clamp_s(lvl, 0, 63)
            if lvl == 0:
                continue
            interior = lvl
            if sharpness > 0:
                interior >>= 2 if sharpness > 4 else 1
                if interior > 9 - sharpness:
                    interior = 9 - sharpness
            if interior < 1:
                interior = 1
            mb_edge = (lvl + 2) * 2 + interior
            sb_edge = lvl * 2 + interior
            hev_t = 2 if lvl >= 40 else (1 if lvl >= 15 else 0)
            inner = not skipped or ymode == B_PRED
            yx, yy = mbx * 16, mby * 16
            cx, cy = mbx * 8, mby * 8
            if filter_type == 1:  # simple: Y only
                def mbf(pix):
                    _simple_filter(pix, mb_edge)
                def sbf(pix):
                    _simple_filter(pix, sb_edge)
                if mbx > 0:
                    _filter_edge(y, yx, yy, 16, True, mbf)
                if inner:
                    for dx in (4, 8, 12):
                        _filter_edge(y, yx + dx, yy, 16, True, sbf)
                if mby > 0:
                    _filter_edge(y, yx, yy, 16, False, mbf)
                if inner:
                    for dy in (4, 8, 12):
                        _filter_edge(y, yx, yy + dy, 16, False, sbf)
            else:
                def mbf(pix):
                    _mbloop_filter(pix, hev_t, interior, mb_edge)
                def sbf(pix):
                    _subblock_filter(pix, hev_t, interior, sb_edge)
                if mbx > 0:
                    _filter_edge(y, yx, yy, 16, True, mbf)
                    _filter_edge(u, cx, cy, 8, True, mbf)
                    _filter_edge(v, cx, cy, 8, True, mbf)
                if inner:
                    for dx in (4, 8, 12):
                        _filter_edge(y, yx + dx, yy, 16, True, sbf)
                    _filter_edge(u, cx + 4, cy, 8, True, sbf)
                    _filter_edge(v, cx + 4, cy, 8, True, sbf)
                if mby > 0:
                    _filter_edge(y, yx, yy, 16, False, mbf)
                    _filter_edge(u, cx, cy, 8, False, mbf)
                    _filter_edge(v, cx, cy, 8, False, mbf)
                if inner:
                    for dy in (4, 8, 12):
                        _filter_edge(y, yx, yy + dy, 16, False, sbf)
                    _filter_edge(u, cx, cy + 4, 8, False, sbf)
                    _filter_edge(v, cx, cy + 4, 8, False, sbf)


# ------------------------------------------------------------- tokens

def quantize_block(coefs, dq, is_y2=False, first=0):
    """coefs raster-order → (levels raster-order for recon, zigzag levels
    for tokenization). dq = (dc, ac)."""
    levels = [0] * 16
    for i in range(first, 16):
        q = dq[0] if i == 0 else dq[1]
        levels[i] = int(coefs[i] / q)  # truncate toward zero, like libvpx
        levels[i] = clamp_s(levels[i], -2047, 2047)
    return levels


def dequant_block(levels, dq, first=0):
    out = [0] * 16
    for i in range(first, 16):
        q = dq[0] if i == 0 else dq[1]
        out[i] = levels[i] * q
    return out


def _token_for(v):
    a = abs(v)
    if a <= 4:
        return a, None
    for cat in range(1, 7):
        base = T.CAT_BASE[cat]
        nbits = len(T.CAT_PROBS[cat])
        if a < base + (1 << nbits):
            return 4 + cat, (cat, a - base)
    raise ValueError("coefficient out of range: %d" % v)


def encode_block_tokens(enc, levels_raster, plane, ctx, probs, first):
    """levels_raster: 16 raster-order levels; returns nz flag."""
    zz = [levels_raster[T.ZIGZAG[i]] for i in range(16)]
    eob = 0
    for i in range(first, 16):
        if zz[i] != 0:
            eob = i + 1
    if eob == 0:
        eob = first
    c = first
    prev_zero = False
    while c < 16:
        band = T.COEF_BANDS[c]
        p = probs[plane][band][ctx]
        start = 2 if prev_zero else 0
        if c >= eob:
            # EOB (only legal when prev token nonzero; guaranteed: the
            # token at eob-1 is nonzero, and eob==first comes with start=0)
            enc.tree_from(T.COEF_TREE, p, 11, start)
            break
        v = zz[c]
        tok, extra = _token_for(v)
        enc.tree_from(T.COEF_TREE, p, tok, start)
        if extra is not None:
            cat, rem = extra
            cp = T.CAT_PROBS[cat]
            for bi in range(len(cp)):
                enc.put((rem >> (len(cp) - 1 - bi)) & 1, cp[bi])
        if v != 0:
            enc.put(1 if v < 0 else 0, 128)
        # next context from this token's absolute value
        a = abs(v)
        ctx = 0 if a == 0 else (1 if a == 1 else 2)
        prev_zero = (v == 0)
        c += 1
    return 1 if eob > first else 0


def decode_block_tokens(dec, plane, ctx, probs, first):
    """Returns (levels raster-order, nz flag)."""
    levels = [0] * 16
    c = first
    prev_zero = False
    while c < 16:
        band = T.COEF_BANDS[c]
        p = probs[plane][band][ctx]
        start = 2 if prev_zero else 0
        tok = dec.tree_from(T.COEF_TREE, p, start)
        if tok == 11:  # EOB
            break
        if tok <= 4:
            v = tok
        else:
            cat = tok - 4
            cp = T.CAT_PROBS[cat]
            rem = 0
            for bi in range(len(cp)):
                rem = (rem << 1) | dec.get(cp[bi])
            v = T.CAT_BASE[cat] + rem
        if v != 0 and dec.get(128):
            v = -v
        levels[T.ZIGZAG[c]] = v
        a = abs(v)
        ctx = 0 if a == 0 else (1 if a == 1 else 2)
        prev_zero = (v == 0)
        c += 1
    return levels, (1 if any(levels[T.ZIGZAG[i]] for i in range(first, 16)) else 0)


def _tree_from_enc(self, tree, probs, value, start):
    def dfs(i, acc):
        for b in (0, 1):
            t = tree[i + b]
            if t <= 0:
                if -t == value:
                    return acc + [(i >> 1, b)]
            else:
                r = dfs(t, acc + [(i >> 1, b)])
                if r is not None:
                    return r
        return None
    path = dfs(start, [])
    assert path is not None
    for pi, b in path:
        self.put(b, probs[pi])


def _tree_from_dec(self, tree, probs, start):
    i = start
    while True:
        b = self.get(probs[i >> 1])
        t = tree[i + b]
        if t <= 0:
            return -t
        i = t


BoolEncoder.tree_from = _tree_from_enc
BoolDecoder.tree_from = _tree_from_dec


# --------------------------------------------------------- frame encoder

def _pad_plane(tgt, w, h, W, H):
    p = Plane(W, H)
    for y in range(H):
        for x in range(W):
            p.set(x, y, tgt[min(y, h - 1)][min(x, w - 1)])
    return p


def _deep_probs(t):
    return [[[list(c) for c in b] for b in p] for p in t]


class _MbCtx:
    """Per-frame prediction/token context state."""
    def __init__(self, mbW):
        self.y_nz_above = [0] * (mbW * 4)
        self.u_nz_above = [0] * (mbW * 2)
        self.v_nz_above = [0] * (mbW * 2)
        self.y2_nz_above = [0] * mbW
        self.reset_left()

    def reset_left(self):
        self.y_nz_left = [0] * 4
        self.u_nz_left = [0] * 2
        self.v_nz_left = [0] * 2
        self.y2_nz_left = [0]


def _sb_edges(recon, mbx, mby, sbr, sbc, mbW):
    """(A[4], L[4], P, AR[4]) for one 4x4 Y subblock, with frame borders
    127 above / 129 left and VP8's above-right rule (rightmost subblock
    column always reads the row above the MACROBLOCK)."""
    x0 = mbx * 16 + sbc * 4
    y0 = mby * 16 + sbr * 4
    W = recon.w
    def px(x, y):
        if y < 0:
            return 127
        if x < 0:
            return 129
        return recon.get(x, y)
    A = [px(x0 + i, y0 - 1) for i in range(4)]
    L = [px(x0 - 1, y0 + i) for i in range(4)]
    if y0 == 0:
        P = 127
    elif x0 == 0:
        P = 129
    else:
        P = recon.get(x0 - 1, y0 - 1)
    if sbc < 3:
        ytop = y0 - 1
        AR = [px(x0 + 4 + i, ytop) for i in range(4)]
    else:
        ytop = mby * 16 - 1
        if ytop < 0:
            AR = [127] * 4
        elif mbx == mbW - 1:
            AR = [recon.get(W - 1, ytop)] * 4
        else:
            AR = [recon.get(mbx * 16 + 16 + i, ytop) for i in range(4)]
    return A, L, P, AR


def _mb_edges(recon, mbx, mby, size):
    x0, y0 = mbx * size, mby * size
    def px(x, y):
        if y < 0:
            return 127
        if x < 0:
            return 129
        return recon.get(x, y)
    A = [px(x0 + i, y0 - 1) for i in range(size)]
    L = [px(x0 - 1, y0 + i) for i in range(size)]
    if y0 == 0:
        P = 127
    elif x0 == 0:
        P = 129
    else:
        P = recon.get(x0 - 1, y0 - 1)
    return A, L, P


BMODE_FROM_Y = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}


def encode_keyframe(w, h, tgt_y, tgt_u, tgt_v, mbspec,
                    y_ac_qi=40, q_deltas=(0, 0, 0, 0, 0),
                    filter_type=0, filter_level=0, sharpness=0, nparts=1,
                    seg=None, coef_overrides=None, no_skip=True,
                    lf_deltas=None):
    """Encode one keyframe; returns (vp8_payload_bytes, (exp_y, exp_u,
    exp_v) cropped expected planes as lists of rows).

    mbspec[mby*mbW+mbx] = {"ymode": m, "bmodes": [16] if m == B_PRED,
    "uvmode": m2, "seg": sid}. coef_overrides: None or a full [4][8][3][11]
    table transmitted via the per-frame update mechanism.
    """
    mbW, mbH = (w + 15) // 16, (h + 15) // 16
    W, H = mbW * 16, mbH * 16
    ty = _pad_plane(tgt_y, w, h, W, H)
    tu = _pad_plane(tgt_u, (w + 1) // 2, (h + 1) // 2, W // 2, H // 2)
    tv = _pad_plane(tgt_v, (w + 1) // 2, (h + 1) // 2, W // 2, H // 2)
    ry, ru, rv = Plane(W, H), Plane(W // 2, H // 2), Plane(W // 2, H // 2)

    probs = _deep_probs(T.default_coef_probs())
    upd = T.coef_update_probs()
    enc0 = BoolEncoder()
    # ---- header
    enc0.put(0, 128)  # color_space
    enc0.put(0, 128)  # clamping
    if seg is None:
        enc0.put(0, 128)
    else:
        enc0.put(1, 128)
        enc0.put(1, 128)  # update map
        enc0.put(1, 128)  # update data
        enc0.put(1 if seg["abs"] else 0, 128)
        for i in range(4):
            enc0.flagged_signed(seg["quant"][i], 7)
        for i in range(4):
            enc0.flagged_signed(seg["lf"][i], 6)
        for i in range(3):
            p = seg["probs"][i]
            if p == 255:
                enc0.put(0, 128)
            else:
                enc0.put(1, 128)
                enc0.literal(p, 8)
    enc0.put(filter_type, 128)
    enc0.literal(filter_level, 6)
    enc0.literal(sharpness, 3)
    if lf_deltas is None:
        enc0.put(0, 128)
        ref_delta, mode_delta = [0] * 4, [0] * 4
    else:
        ref_delta, mode_delta = lf_deltas
        enc0.put(1, 128)
        enc0.put(1, 128)  # update
        for i in range(4):
            enc0.flagged_signed(ref_delta[i], 6)
        for i in range(4):
            enc0.flagged_signed(mode_delta[i], 6)
    part_bits = {1: 0, 2: 1, 4: 2, 8: 3}[nparts]
    enc0.literal(part_bits, 2)
    enc0.literal(y_ac_qi, 7)
    for d in q_deltas:
        enc0.flagged_signed(d, 4)
    enc0.put(0, 128)  # refresh_entropy_probs
    for p in range(4):
        for b in range(8):
            for c in range(3):
                for i in range(11):
                    if coef_overrides is not None:
                        enc0.put(1, upd[p][b][c][i])
                    else:
                        enc0.put(0, upd[p][b][c][i])
                    if coef_overrides is not None:
                        enc0.literal(coef_overrides[p][b][c][i], 8)
                        probs[p][b][c][i] = coef_overrides[p][b][c][i]
    enc0.put(1 if no_skip else 0, 128)
    skip_prob = 200
    if no_skip:
        enc0.literal(skip_prob, 8)

    # ---- per-segment dequant factors
    def seg_q(sid):
        qi = y_ac_qi
        if seg is not None:
            qi = seg["quant"][sid] if seg["abs"] else qi + seg["quant"][sid]
        qi = clamp_s(qi, 0, 127)
        return dequant_factors(qi, *q_deltas)

    dqs = [seg_q(s) for s in range(4)]

    parts = [BoolEncoder() for _ in range(nparts)]
    ctx = _MbCtx(mbW)
    # bmode context arrays (above per MB column ×4, left ×4)
    bm_above = [[B_DC] * 4 for _ in range(mbW)]
    mbinfo = [[None] * mbW for _ in range(mbH)]

    for mby in range(mbH):
        ctx.reset_left()
        bm_left = [B_DC] * 4
        enc_t = parts[mby % nparts]
        for mbx in range(mbW):
            spec = mbspec[mby * mbW + mbx]
            ymode = spec["ymode"]
            uvmode = spec["uvmode"]
            sid = spec.get("seg", 0)
            dq = dqs[sid]
            has_y2 = ymode != B_PRED

            # ---------- transform + quantize against PREDICTION (two-pass:
            # compute everything, decide skip, then write modes + tokens)
            y_levels = [None] * 16
            y2_levels = None
            # predict Y
            if has_y2:
                A, L, P = _mb_edges(ry, mbx, mby, 16)
                pred = predict_16x16(ymode, A, L, P, mby > 0, mbx > 0)
                dc_in = [0] * 16
                block_coefs = [None] * 16
                for sb in range(16):
                    sbr, sbc = sb // 4, sb % 4
                    res = []
                    for rr in range(4):
                        for cc in range(4):
                            yy0 = sbr * 4 + rr
                            xx0 = sbc * 4 + cc
                            res.append(ty.get(mbx * 16 + xx0, mby * 16 + yy0) -
                                       pred[yy0][xx0])
                    co = fdct4x4(res)
                    block_coefs[sb] = co
                    dc_in[sb] = co[0]
                y2c = fwht4x4(dc_in)
                y2_levels = quantize_block(y2c, dq["y2"])
                y2_deq = dequant_block(y2_levels, dq["y2"])
                dcs = iwht4x4(y2_deq)
                for sb in range(16):
                    lv = quantize_block(block_coefs[sb], dq["y1"], first=1)
                    y_levels[sb] = lv
                    deq = dequant_block(lv, dq["y1"], first=1)
                    deq[0] = dcs[sb]
                    res = idct4x4(deq)
                    sbr, sbc = sb // 4, sb % 4
                    for rr in range(4):
                        for cc in range(4):
                            yy0 = sbr * 4 + rr
                            xx0 = sbc * 4 + cc
                            ry.set(mbx * 16 + xx0, mby * 16 + yy0,
                                   clip255(pred[yy0][xx0] + res[rr * 4 + cc]))
            else:
                for sb in range(16):
                    sbr, sbc = sb // 4, sb % 4
                    A, L, P, AR = _sb_edges(ry, mbx, mby, sbr, sbc, mbW)
                    pred = predict_4x4(spec["bmodes"][sb], A, L, P, AR)
                    res = []
                    for rr in range(4):
                        for cc in range(4):
                            res.append(
                                ty.get(mbx * 16 + sbc * 4 + cc,
                                       mby * 16 + sbr * 4 + rr) - pred[rr][cc])
                    co = fdct4x4(res)
                    lv = quantize_block(co, dq["y1"])
                    y_levels[sb] = lv
                    deq = dequant_block(lv, dq["y1"])
                    out = idct4x4(deq)
                    for rr in range(4):
                        for cc in range(4):
                            ry.set(mbx * 16 + sbc * 4 + cc,
                                   mby * 16 + sbr * 4 + rr,
                                   clip255(pred[rr][cc] + out[rr * 4 + cc]))
            # chroma
            uv_levels = {"u": [None] * 4, "v": [None] * 4}
            for plane_name, tgt, rec in (("u", tu, ru), ("v", tv, rv)):
                A, L, P = _mb_edges(rec, mbx, mby, 8)
                pred = predict_8x8(uvmode, A, L, P, mby > 0, mbx > 0)
                for sb in range(4):
                    sbr, sbc = sb // 2, sb % 2
                    res = []
                    for rr in range(4):
                        for cc in range(4):
                            res.append(tgt.get(mbx * 8 + sbc * 4 + cc,
                                               mby * 8 + sbr * 4 + rr) -
                                       pred[sbr * 4 + rr][sbc * 4 + cc])
                    co = fdct4x4(res)
                    lv = quantize_block(co, dq["uv"])
                    uv_levels[plane_name][sb] = lv
                    deq = dequant_block(lv, dq["uv"])
                    out = idct4x4(deq)
                    for rr in range(4):
                        for cc in range(4):
                            rec.set(mbx * 8 + sbc * 4 + cc,
                                    mby * 8 + sbr * 4 + rr,
                                    clip255(pred[sbr * 4 + rr][sbc * 4 + cc] +
                                            out[rr * 4 + cc]))

            all_zero = all(lv == 0 for b in y_levels for lv in b)
            if y2_levels is not None:
                all_zero = all_zero and all(lv == 0 for lv in y2_levels)
            all_zero = all_zero and all(
                lv == 0 for pn in ("u", "v") for b in uv_levels[pn] for lv in b)
            skip = no_skip and all_zero

            # ---------- modes into partition 0
            if seg is not None:
                enc0.tree(T.MB_SEGMENT_TREE, seg["probs"], sid)
            if no_skip:
                enc0.put(1 if skip else 0, skip_prob)
            enc0.tree(T.KF_YMODE_TREE, T.KF_YMODE_PROB, ymode)
            kfb = T.kf_bmode_probs()
            if ymode == B_PRED:
                for sb in range(16):
                    sbr, sbc = sb // 4, sb % 4
                    above = (bm_above[mbx][sbc] if sbr == 0
                             else spec["bmodes"][sb - 4])
                    left = (bm_left[sbr] if sbc == 0
                            else spec["bmodes"][sb - 1])
                    enc0.tree(T.BMODE_TREE, kfb[above][left], spec["bmodes"][sb])
                bm_above[mbx] = [spec["bmodes"][12 + i] for i in range(4)]
                bm_left = [spec["bmodes"][4 * i + 3] for i in range(4)]
            else:
                bb = BMODE_FROM_Y[ymode]
                bm_above[mbx] = [bb] * 4
                bm_left = [bb] * 4
            enc0.tree(T.UV_MODE_TREE, T.KF_UV_MODE_PROB, uvmode)

            # ---------- tokens
            if skip:
                for i in range(4):
                    ctx.y_nz_above[mbx * 4 + i] = 0
                    ctx.y_nz_left[i] = 0
                for i in range(2):
                    ctx.u_nz_above[mbx * 2 + i] = 0
                    ctx.u_nz_left[i] = 0
                    ctx.v_nz_above[mbx * 2 + i] = 0
                    ctx.v_nz_left[i] = 0
                if has_y2:
                    ctx.y2_nz_above[mbx] = 0
                    ctx.y2_nz_left[0] = 0
            else:
                if has_y2:
                    c0 = ctx.y2_nz_above[mbx] + ctx.y2_nz_left[0]
                    nz = encode_block_tokens(enc_t, y2_levels, 1, c0, probs, 0)
                    ctx.y2_nz_above[mbx] = nz
                    ctx.y2_nz_left[0] = nz
                plane = 0 if has_y2 else 3
                first = 1 if has_y2 else 0
                for sb in range(16):
                    sbr, sbc = sb // 4, sb % 4
                    c0 = ctx.y_nz_above[mbx * 4 + sbc] + ctx.y_nz_left[sbr]
                    nz = encode_block_tokens(enc_t, y_levels[sb], plane, c0,
                                             probs, first)
                    ctx.y_nz_above[mbx * 4 + sbc] = nz
                    ctx.y_nz_left[sbr] = nz
                for pn, above, left in (("u", ctx.u_nz_above, ctx.u_nz_left),
                                        ("v", ctx.v_nz_above, ctx.v_nz_left)):
                    for sb in range(4):
                        sbr, sbc = sb // 2, sb % 2
                        c0 = above[mbx * 2 + sbc] + left[sbr]
                        nz = encode_block_tokens(enc_t, uv_levels[pn][sb], 2,
                                                 c0, probs, 0)
                        above[mbx * 2 + sbc] = nz
                        left[sbr] = nz
            mbinfo[mby][mbx] = (ymode, skip, sid)

    # ---- loop filter on the recon (expected output)
    if filter_level > 0:
        loop_filter_frame(ry, ru, rv, mbW, mbH, mbinfo, filter_type,
                          filter_level, sharpness,
                          seg["lf"] if seg is not None else None,
                          seg["abs"] if seg is not None else False,
                          ref_delta, mode_delta, lf_deltas is not None)

    # ---- assemble payload
    p0 = enc0.finish()
    pdata = [e.finish() for e in parts]
    tag = (len(p0) << 5) | (1 << 4) | (0 << 1) | 0  # show_frame, ver 0, key
    head = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF,
                  0x9D, 0x01, 0x2A,
                  w & 0xFF, (w >> 8) & 0x3F,
                  h & 0xFF, (h >> 8) & 0x3F])
    out = bytearray(head)
    out += p0
    for pd in pdata[:-1]:
        out += bytes([len(pd) & 0xFF, (len(pd) >> 8) & 0xFF,
                      (len(pd) >> 16) & 0xFF])
    for pd in pdata:
        out += pd
    crop = lambda pl, ww, hh: [[pl.get(x, yy) for x in range(ww)]
                               for yy in range(hh)]
    return bytes(out), (crop(ry, w, h), crop(ru, (w + 1) // 2, (h + 1) // 2),
                        crop(rv, (w + 1) // 2, (h + 1) // 2))


# --------------------------------------------------------- frame decoder

def decode_keyframe(payload):
    """Full python mirror of the Scala decoder; returns (w, h, y, u, v)
    with planes as lists of rows (cropped)."""
    tag = payload[0] | (payload[1] << 8) | (payload[2] << 16)
    assert (tag & 1) == 0, "not a keyframe"
    first_size = tag >> 5
    assert payload[3:6] == b"\x9d\x01\x2a", "bad start code"
    w = payload[6] | ((payload[7] & 0x3F) << 8)
    h = payload[8] | ((payload[9] & 0x3F) << 8)
    mbW, mbH = (w + 15) // 16, (h + 15) // 16
    W, H = mbW * 16, mbH * 16
    d0 = BoolDecoder(payload[10:10 + first_size])

    d0.get(128)  # color_space
    d0.get(128)  # clamping
    seg_enabled = d0.get(128)
    seg_probs = [255, 255, 255]
    seg_quant = [0] * 4
    seg_lf = [0] * 4
    seg_abs = False
    update_map = False
    if seg_enabled:
        update_map = d0.get(128) == 1
        update_data = d0.get(128) == 1
        if update_data:
            seg_abs = d0.get(128) == 1
            for i in range(4):
                seg_quant[i] = d0.flagged_signed(7)
            for i in range(4):
                seg_lf[i] = d0.flagged_signed(6)
        if update_map:
            for i in range(3):
                if d0.get(128):
                    seg_probs[i] = d0.literal(8)
    filter_type = d0.get(128)
    filter_level = d0.literal(6)
    sharpness = d0.literal(3)
    lf_delta_on = d0.get(128) == 1
    ref_delta, mode_delta = [0] * 4, [0] * 4
    if lf_delta_on:
        if d0.get(128):
            for i in range(4):
                ref_delta[i] = d0.flagged_signed(6)
            for i in range(4):
                mode_delta[i] = d0.flagged_signed(6)
    nparts = 1 << d0.literal(2)
    y_ac_qi = d0.literal(7)
    q_deltas = [d0.flagged_signed(4) for _ in range(5)]
    d0.get(128)  # refresh_entropy
    probs = _deep_probs(T.default_coef_probs())
    upd = T.coef_update_probs()
    for p in range(4):
        for b in range(8):
            for c in range(3):
                for i in range(11):
                    if d0.get(upd[p][b][c][i]):
                        probs[p][b][c][i] = d0.literal(8)
    no_skip = d0.get(128) == 1
    skip_prob = d0.literal(8) if no_skip else 0

    # partitions
    pofs = 10 + first_size
    sizes = []
    for _ in range(nparts - 1):
        sizes.append(payload[pofs] | (payload[pofs + 1] << 8) |
                     (payload[pofs + 2] << 16))
        pofs += 3
    parts = []
    for i in range(nparts):
        if i < nparts - 1:
            parts.append(BoolDecoder(payload[pofs:pofs + sizes[i]]))
            pofs += sizes[i]
        else:
            parts.append(BoolDecoder(payload[pofs:]))

    def seg_q(sid):
        qi = seg_quant[sid] if seg_abs else y_ac_qi + seg_quant[sid]
        if not seg_enabled:
            qi = y_ac_qi
        return dequant_factors(clamp_s(qi, 0, 127), *q_deltas)

    dqs = [seg_q(s) for s in range(4)]
    ry, ru, rv = Plane(W, H), Plane(W // 2, H // 2), Plane(W // 2, H // 2)
    ctx = _MbCtx(mbW)
    bm_above = [[B_DC] * 4 for _ in range(mbW)]
    kfb = T.kf_bmode_probs()
    mbinfo = [[None] * mbW for _ in range(mbH)]

    for mby in range(mbH):
        ctx.reset_left()
        bm_left = [B_DC] * 4
        dec_t = parts[mby % nparts]
        for mbx in range(mbW):
            sid = 0
            if seg_enabled and update_map:
                sid = d0.tree(T.MB_SEGMENT_TREE, seg_probs)
            skip = bool(d0.get(skip_prob)) if no_skip else False
            ymode = d0.tree(T.KF_YMODE_TREE, T.KF_YMODE_PROB)
            bmodes = None
            if ymode == B_PRED:
                bmodes = [0] * 16
                for sb in range(16):
                    sbr, sbc = sb // 4, sb % 4
                    above = bm_above[mbx][sbc] if sbr == 0 else bmodes[sb - 4]
                    left = bm_left[sbr] if sbc == 0 else bmodes[sb - 1]
                    bmodes[sb] = d0.tree(T.BMODE_TREE, kfb[above][left])
                bm_above[mbx] = [bmodes[12 + i] for i in range(4)]
                bm_left = [bmodes[4 * i + 3] for i in range(4)]
            else:
                bb = BMODE_FROM_Y[ymode]
                bm_above[mbx] = [bb] * 4
                bm_left = [bb] * 4
            uvmode = d0.tree(T.UV_MODE_TREE, T.KF_UV_MODE_PROB)
            has_y2 = ymode != B_PRED
            dq = dqs[sid]

            y_res = [[0] * 16 for _ in range(16)]
            uv_res = {"u": [[0] * 16 for _ in range(4)],
                      "v": [[0] * 16 for _ in range(4)]}
            if skip:
                for i in range(4):
                    ctx.y_nz_above[mbx * 4 + i] = 0
                    ctx.y_nz_left[i] = 0
                for i in range(2):
                    ctx.u_nz_above[mbx * 2 + i] = 0
                    ctx.u_nz_left[i] = 0
                    ctx.v_nz_above[mbx * 2 + i] = 0
                    ctx.v_nz_left[i] = 0
                if has_y2:
                    ctx.y2_nz_above[mbx] = 0
                    ctx.y2_nz_left[0] = 0
            else:
                dcs = None
                if has_y2:
                    c0 = ctx.y2_nz_above[mbx] + ctx.y2_nz_left[0]
                    lv, nz = decode_block_tokens(dec_t, 1, c0, probs, 0)
                    ctx.y2_nz_above[mbx] = nz
                    ctx.y2_nz_left[0] = nz
                    dcs = iwht4x4(dequant_block(lv, dq["y2"]))
                plane = 0 if has_y2 else 3
                first = 1 if has_y2 else 0
                for sb in range(16):
                    sbr, sbc = sb // 4, sb % 4
                    c0 = ctx.y_nz_above[mbx * 4 + sbc] + ctx.y_nz_left[sbr]
                    lv, nz = decode_block_tokens(dec_t, plane, c0, probs, first)
                    ctx.y_nz_above[mbx * 4 + sbc] = nz
                    ctx.y_nz_left[sbr] = nz
                    deq = dequant_block(lv, dq["y1"], first=first)
                    if has_y2:
                        deq[0] = dcs[sb]
                    y_res[sb] = idct4x4(deq)
                for pn, above, left in (("u", ctx.u_nz_above, ctx.u_nz_left),
                                        ("v", ctx.v_nz_above, ctx.v_nz_left)):
                    for sb in range(4):
                        sbr, sbc = sb // 2, sb % 2
                        c0 = above[mbx * 2 + sbc] + left[sbr]
                        lv, nz = decode_block_tokens(dec_t, 2, c0, probs, 0)
                        above[mbx * 2 + sbc] = nz
                        left[sbr] = nz
                        uv_res[pn][sb] = idct4x4(dequant_block(lv, dq["uv"]))

            # reconstruction
            if has_y2:
                A, L, P = _mb_edges(ry, mbx, mby, 16)
                pred = predict_16x16(ymode, A, L, P, mby > 0, mbx > 0)
                for sb in range(16):
                    sbr, sbc = sb // 4, sb % 4
                    for rr in range(4):
                        for cc in range(4):
                            yy0 = sbr * 4 + rr
                            xx0 = sbc * 4 + cc
                            ry.set(mbx * 16 + xx0, mby * 16 + yy0,
                                   clip255(pred[yy0][xx0] +
                                           y_res[sb][rr * 4 + cc]))
            else:
                for sb in range(16):
                    sbr, sbc = sb // 4, sb % 4
                    A, L, P, AR = _sb_edges(ry, mbx, mby, sbr, sbc, mbW)
                    pred = predict_4x4(bmodes[sb], A, L, P, AR)
                    for rr in range(4):
                        for cc in range(4):
                            ry.set(mbx * 16 + sbc * 4 + cc,
                                   mby * 16 + sbr * 4 + rr,
                                   clip255(pred[rr][cc] +
                                           y_res[sb][rr * 4 + cc]))
            for pn, rec in (("u", ru), ("v", rv)):
                A, L, P = _mb_edges(rec, mbx, mby, 8)
                pred = predict_8x8(uvmode, A, L, P, mby > 0, mbx > 0)
                for sb in range(4):
                    sbr, sbc = sb // 2, sb % 2
                    for rr in range(4):
                        for cc in range(4):
                            rec.set(mbx * 8 + sbc * 4 + cc,
                                    mby * 8 + sbr * 4 + rr,
                                    clip255(pred[sbr * 4 + rr][sbc * 4 + cc] +
                                            uv_res[pn][sb][rr * 4 + cc]))
            mbinfo[mby][mbx] = (ymode, skip, sid)

    if filter_level > 0:
        loop_filter_frame(ry, ru, rv, mbW, mbH, mbinfo, filter_type,
                          filter_level, sharpness,
                          seg_lf if seg_enabled else None, seg_abs,
                          ref_delta, mode_delta, lf_delta_on)
    crop = lambda pl, ww, hh: [[pl.get(x, yy) for x in range(ww)]
                               for yy in range(hh)]
    return (w, h, crop(ry, w, h), crop(ru, (w + 1) // 2, (h + 1) // 2),
            crop(rv, (w + 1) // 2, (h + 1) // 2))
