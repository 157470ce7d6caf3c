#!/usr/bin/env python3
"""Baseline-JPEG fixture maker + independent decode-contract mirror.

Generates legal ITU-T T.81 baseline streams straight from chosen QUANTIZED
COEFFICIENTS (no forward DCT needed: the fixtures exist to pin the DECODER,
so the image is whatever the coefficients decode to), Huffman-encoded with
the Annex K tables, then computes the EXPECTED pixels through a Python
mirror of graft's deterministic decode contract (ops/Jpeg.scala):

 - dequantize, integer IDCT over the shared 14-bit basis table
   (round(c(u)/2*cos((2x+1)u*pi/16)*2^14), two integer passes, one
   round-half-up >>28 at the end, +128, clamp);
 - nearest-neighbor chroma upsample (cx = x*hs//hmax);
 - JFIF fixed-point YCbCr->RGB (91881/22554/46802/116130 >>16).

Because both sides are pure integer arithmetic, JpegSpec asserts decoded
pixels BYTE-FOR-BYTE equal to these goldens. The Scala entropy decoder is
covered transitively: it must recover exactly the coefficient arrays this
script encoded for the pixels to match.

Usage: python3 tools/make_jpeg_fixture.py src/test/resources/fixtures
Writes jpeg_*.jpg plus jpeg_goldens.json (pixels base64).
"""
import base64
import json
import os
import sys

# ---- shared integer-IDCT basis (identical literals in ops/Jpeg.scala) ----
BASIS = [
    [5793, 5793, 5793, 5793, 5793, 5793, 5793, 5793],
    [8035, 6811, 4551, 1598, -1598, -4551, -6811, -8035],
    [7568, 3135, -3135, -7568, -7568, -3135, 3135, 7568],
    [6811, -1598, -8035, -4551, 4551, 8035, 1598, -6811],
    [5793, -5793, -5793, 5793, 5793, -5793, -5793, 5793],
    [4551, -8035, 1598, 6811, -6811, -1598, 8035, -4551],
    [3135, -7568, 7568, -3135, -3135, 7568, -7568, 3135],
    [1598, -4551, 6811, -8035, 8035, -6811, 4551, -1598],
]

ZIGZAG = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
          12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
          35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
          58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]

# ---- Annex K Huffman tables (public standard data) ----
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa]
AC_LUMA = (AC_LUMA_BITS, AC_LUMA_VALS)


def canonical(bits, vals):
    codes = {}
    code = 0
    k = 0
    for l in range(1, 17):
        for _ in range(bits[l - 1]):
            codes[vals[k]] = (code, l)
            code += 1
            k += 1
        code <<= 1
    return codes


class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.cnt = 0

    def put(self, v, n):
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.cnt += 1
            if self.cnt == 8:
                self.out.append(self.acc & 0xff)
                if (self.acc & 0xff) == 0xff:
                    self.out.append(0x00)
                self.acc = 0
                self.cnt = 0

    def pad(self):
        if self.cnt:
            self.put((1 << (8 - self.cnt)) - 1, 8 - self.cnt)

    def align_marker(self, m):
        self.pad()
        self.out.append(0xff)
        self.out.append(m)


def category(v):
    return v.bit_length() if v >= 0 else (-v).bit_length()


def encode_block(bw, coefs_zz, pred, dc_codes, ac_codes):
    """coefs_zz: 64 quantized coefficients in ZIGZAG order."""
    diff = coefs_zz[0] - pred
    cat = category(diff)
    c, l = dc_codes[cat]
    bw.put(c, l)
    if cat:
        bw.put(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
    run = 0
    last_nz = max((i for i in range(1, 64) if coefs_zz[i]), default=0)
    for k in range(1, 64):
        v = coefs_zz[k]
        if k > last_nz:
            c, l = ac_codes[0x00]  # EOB
            bw.put(c, l)
            break
        if v == 0:
            run += 1
            continue
        while run >= 16:
            c, l = ac_codes[0xf0]  # ZRL
            bw.put(c, l)
            run -= 16
        sz = category(v)
        c, l = ac_codes[(run << 4) | sz]
        bw.put(c, l)
        bw.put(v if v >= 0 else v + (1 << sz) - 1, sz)
        run = 0
    return coefs_zz[0]


# ---------------------------------------------------------------- mirror --

def idct_block(coef_nat):
    """integer IDCT, the shared contract; coef_nat: 64 dequantized, natural
    order. Returns 64 clamped pixels."""
    t = [0] * 64
    for x in range(8):
        for v in range(8):
            t[x * 8 + v] = sum(coef_nat[u * 8 + v] * BASIS[u][x] for u in range(8))
    out = [0] * 64
    for y in range(8):
        for x in range(8):
            acc = sum(t[x * 8 + v] * BASIS[v][y] for v in range(8))
            s = ((acc + (1 << 27)) >> 28) + 128
            out[y * 8 + x] = 0 if s < 0 else 255 if s > 255 else s
    return out


def decode_mirror(w, h, comps, quant):
    """comps: list of dicts {hs, vs, q, blocks: {(bx,by): zz coeffs}}.
    Returns interleaved RGB (3 comps) or gray bytes, per the contract."""
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        pw, ph = mcus_x * c["hs"] * 8, mcus_y * c["vs"] * 8
        plane = [[0] * pw for _ in range(ph)]
        q = quant[c["q"]]
        for (bx, by), zz in c["blocks"].items():
            nat = [0] * 64
            for k in range(64):
                nat[ZIGZAG[k]] = zz[k] * q[ZIGZAG[k]]
            px = idct_block(nat)
            for y in range(8):
                for x in range(8):
                    plane[by * 8 + y][bx * 8 + x] = px[y * 8 + x]
        planes.append((plane, pw))
    if len(comps) == 1:
        plane, pw = planes[0]
        return bytes(plane[y][x] for y in range(h) for x in range(w))
    out = bytearray()
    for y in range(h):
        for x in range(w):
            yy = planes[0][0][y][x]
            cbx, cby = x * comps[1]["hs"] // hmax, y * comps[1]["vs"] // vmax
            crx, cry = x * comps[2]["hs"] // hmax, y * comps[2]["vs"] // vmax
            cb = planes[1][0][cby][cbx] - 128
            cr = planes[2][0][cry][crx] - 128
            r = yy + ((91881 * cr + 32768) >> 16)
            g = yy - ((22554 * cb + 46802 * cr + 32768) >> 16)
            b = yy + ((116130 * cb + 32768) >> 16)
            out += bytes((max(0, min(255, r)), max(0, min(255, g)),
                          max(0, min(255, b))))
    return bytes(out)


# ------------------------------------------------- progressive encoding --
# Scan encoders mirroring libjpeg's jcphuff.c semantics (the de-facto
# interop standard for T.81 Annex G): DC first/refine with point
# transform, AC first with EOB runs, AC refine with buffered correction
# bits. The progressive fixtures carry the SAME quantized coefficients as
# their baseline twins, so the decoder must produce IDENTICAL pixels
# through a completely different bitstream path.

# Progressive AC table: Annex K has no EOBn symbols (baseline uses only
# EOB0), so progressive streams need a custom table — libjpeg always
# generates optimized tables for SOF2. Flat 8-bit canonical table over
# every symbol a progressive AC scan can emit: EOBn (n 0..14), ZRL, and
# (run, size) pairs with size 1..10. 176 codes < 255, no all-ones code.
AC_PROG_VALS = ([n << 4 for n in range(15)] + [0xf0] +
                [(r << 4) | s for r in range(16) for s in range(1, 11)])
AC_PROG_BITS = [0, 0, 0, 0, 0, 0, 0, len(AC_PROG_VALS), 0, 0, 0, 0, 0, 0, 0, 0]
AC_PROG = (AC_PROG_BITS, AC_PROG_VALS)


class ProgWriter(BitWriter):
    """BitWriter + EOB-run and correction-bit buffering for AC scans."""

    def __init__(self, ac_codes=None):
        super().__init__()
        self.ac_codes = ac_codes
        self.eobrun = 0
        self.corr = []  # buffered correction bits (AC refine)

    def emit_eobrun(self):
        if self.eobrun > 0:
            n = self.eobrun.bit_length() - 1
            c, l = self.ac_codes[n << 4]
            self.put(c, l)
            if n:
                self.put(self.eobrun - (1 << n), n)
            self.eobrun = 0
        for b in self.corr:
            self.put(b, 1)
        self.corr = []


def encode_dc_scan(bw, units, preds, al, ah, dc_codes):
    """units: list of (ci, dc_value); preds per component (shifted domain)."""
    for ci, dc in units:
        if ah == 0:
            v = dc >> al  # arithmetic shift: DC point transform
            diff = v - preds[ci]
            preds[ci] = v
            cat = category(diff)
            c, l = dc_codes[ci][cat]
            bw.put(c, l)
            if cat:
                bw.put(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
        else:
            bw.put((dc >> al) & 1, 1)


def encode_ac_first(bw, zz, ss, se, al):
    """one block of an AC first scan (Ah == 0)."""
    r = 0
    any_emit = False
    for k in range(ss, se + 1):
        t = zz[k]
        if t < 0:
            t = (-t) >> al
            t = -t
        else:
            t >>= al
        if t == 0:
            r += 1
            continue
        bw.emit_eobrun()
        while r > 15:
            c, l = bw.ac_codes[0xf0]
            bw.put(c, l)
            r -= 16
        sz = category(t)
        c, l = bw.ac_codes[(r << 4) | sz]
        bw.put(c, l)
        bw.put(t if t >= 0 else t + (1 << sz) - 1, sz)
        r = 0
        any_emit = True
    if r > 0 or not any_emit:
        bw.eobrun += 1
        if bw.eobrun == 0x7fff:
            bw.emit_eobrun()


def encode_ac_refine(bw, zz, ss, se, al):
    """one block of an AC refinement scan (Ah == Al + 1) — the EXACT
    jcphuff.c control flow: ZRLs are emitted at the FIRST nonzero
    coefficient encountered with r > 15 (history or new), because the
    decoder consumes correction bits positionally during each code's
    zero-run advance; buffering them past a pending ZRL desyncs the
    stream (a bug this mirror had and the Scala decoder caught)."""
    absv = [0] * 64
    eob = ss - 1
    for k in range(ss, se + 1):
        t = abs(zz[k]) >> al
        absv[k] = t
        if t == 1:
            eob = k  # last NEWLY-nonzero coefficient
    r = 0
    pending = []  # correction bits owed to the NEXT emitted code
    for k in range(ss, se + 1):
        t = absv[k]
        if t == 0:
            r += 1
            continue
        # emit required ZRLs unless they can fold into the EOB run
        while r > 15 and k <= eob:
            bw.emit_eobrun()
            c, l = bw.ac_codes[0xf0]
            bw.put(c, l)
            r -= 16
            for b in pending:
                bw.put(b, 1)
            pending = []
        if t > 1:
            pending.append(t & 1)  # history coefficient: correction bit
            continue
        # t == 1: newly nonzero
        bw.emit_eobrun()
        c, l = bw.ac_codes[(r << 4) | 1]
        bw.put(c, l)
        bw.put(0 if zz[k] < 0 else 1, 1)
        for b in pending:
            bw.put(b, 1)
        pending = []
        r = 0
    if r > 0 or pending:
        bw.eobrun += 1
        bw.corr.extend(pending)
        if bw.eobrun == 0x7fff or len(bw.corr) > 900:
            bw.emit_eobrun()


def build_progressive(name, w, h, comp_spec, quant_tables, seed=1, density=6,
                      dri=0):
    """SOF2 twin of build(): same deterministic coefficients, a
    libjpeg-shaped scan script (interleaved DC first at Al=1, banded AC
    first scans, DC refine, AC refinement passes down to Al=0)."""
    hmax = max(c[1] for c in comp_spec)
    vmax = max(c[2] for c in comp_spec)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    comps = []
    for ci, (cid, hs, vs, qid, dslot, aslot) in enumerate(comp_spec):
        blocks = {}
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for v in range(vs):
                    for u in range(hs):
                        bx, by = mx * hs + u, my * vs + v
                        blocks[(bx, by)] = coeffs_for(bx, by, ci, seed, density)
        comps.append({"id": cid, "hs": hs, "vs": vs, "q": qid,
                      "dc": dslot, "ac": aslot, "blocks": blocks})

    # non-interleaved (per-component) block grids
    def ni_dims(c):
        cw = (w * c["hs"] + hmax - 1) // hmax
        ch = (h * c["vs"] + vmax - 1) // vmax
        return (cw + 7) // 8, (ch + 7) // 8

    out = bytearray()
    def u16(v): out.extend((v >> 8 & 0xff, v & 0xff))
    def marker(m): out.extend((0xff, m))
    marker(0xd8)
    for qid, (prec, tab) in quant_tables.items():
        marker(0xdb)
        u16(2 + 1 + (128 if prec else 64))
        out.append((prec << 4) | qid)
        for k in range(64):
            v = tab[ZIGZAG[k]]
            if prec:
                u16(v)
            else:
                out.append(v)
    marker(0xc2)  # SOF2
    u16(8 + 3 * len(comps))
    out.append(8)
    u16(h)
    u16(w)
    out.append(len(comps))
    for c in comps:
        out.extend((c["id"], (c["hs"] << 4) | c["vs"], c["q"]))
    tables = []
    for slot in sorted({c["dc"] for c in comps}):
        tables.append((0, slot, DC_LUMA if slot == 0 else DC_CHROMA))
    for slot in sorted({c["ac"] for c in comps}):
        tables.append((1, slot, AC_PROG))
    marker(0xc4)
    u16(2 + sum(1 + 16 + len(t[2][1]) for t in tables))
    for cls, slot, (bits, vals) in tables:
        out.append((cls << 4) | slot)
        out.extend(bits)
        out.extend(vals)
    if dri:
        marker(0xdd); u16(4); u16(dri)

    codes_dc = {c["dc"]: canonical(*(DC_LUMA if c["dc"] == 0 else DC_CHROMA))
                for c in comps}
    codes_ac = canonical(*AC_PROG)

    def sos_header(scan_cis, ss, se, ah, al):
        marker(0xda)
        u16(6 + 2 * len(scan_cis))
        out.append(len(scan_cis))
        for ci in scan_cis:
            c = comps[ci]
            out.append(c["id"])
            out.append((c["dc"] << 4) | c["ac"])
        out.extend((ss, se, (ah << 4) | al))

    rst_state = [0]

    def dc_scan(ah, al):
        sos_header(list(range(len(comps))), 0, 0, ah, al)
        bw = BitWriter()
        preds = [0] * len(comps)
        dcc = {ci: codes_dc[comps[ci]["dc"]] for ci in range(len(comps))}
        unit = 0
        def restart():
            nonlocal preds
            bw.align_marker(0xd0 + (rst_state[0] % 8))
            rst_state[0] += 1
            preds = [0] * len(comps)
        if len(comps) > 1:
            for m in range(mcus_x * mcus_y):
                if dri and m and m % dri == 0:
                    restart()
                mx, my = m % mcus_x, m // mcus_x
                units = []
                for ci, c in enumerate(comps):
                    for v in range(c["vs"]):
                        for u in range(c["hs"]):
                            units.append(
                                (ci, c["blocks"][(mx * c["hs"] + u, my * c["vs"] + v)][0]))
                encode_dc_scan(bw, units, preds, al, ah, dcc)
        else:
            bwk, bhk = ni_dims(comps[0])
            for by in range(bhk):
                for bx in range(bwk):
                    if dri and unit and unit % dri == 0:
                        restart()
                    encode_dc_scan(bw, [(0, comps[0]["blocks"][(bx, by)][0])],
                                   preds, al, ah, dcc)
                    unit += 1
        bw.pad()
        out.extend(bw.out)
        rst_state[0] = 0

    def ac_scan(ci, ss, se, ah, al):
        sos_header([ci], ss, se, ah, al)
        bw = ProgWriter(codes_ac)
        bwk, bhk = ni_dims(comps[ci])
        unit = 0
        for by in range(bhk):
            for bx in range(bwk):
                if dri and unit and unit % dri == 0:
                    # restart: flush the EOB run + buffered bits first
                    bw.emit_eobrun()
                    bw.align_marker(0xd0 + (rst_state[0] % 8))
                    rst_state[0] += 1
                zz = comps[ci]["blocks"][(bx, by)]
                if ah == 0:
                    encode_ac_first(bw, zz, ss, se, al)
                else:
                    encode_ac_refine(bw, zz, ss, se, al)
                unit += 1
        bw.emit_eobrun()
        bw.pad()
        out.extend(bw.out)
        rst_state[0] = 0

    # libjpeg-shaped scan script
    dc_scan(0, 1)
    ac_scan(0, 1, 5, 0, 2)
    for ci in range(1, len(comps)):
        ac_scan(ci, 1, 63, 0, 1)
    ac_scan(0, 6, 63, 0, 2)
    dc_scan(1, 0)
    ac_scan(0, 1, 63, 2, 1)
    ac_scan(0, 1, 63, 1, 0)
    for ci in range(1, len(comps)):
        ac_scan(ci, 1, 63, 1, 0)
    marker(0xd9)

    quant_nat = {qid: tab for qid, (_, tab) in quant_tables.items()}
    pixels = decode_mirror(w, h, comps, quant_nat)
    return bytes(out), {"name": name, "w": w, "h": h,
                        "channels": 1 if len(comps) == 1 else 3,
                        "pixels": base64.b64encode(pixels).decode()}


# --------------------------------------------------------------- builder --

def coeffs_for(bx, by, ci, seed, density):
    """deterministic pseudo-random quantized coefficients, zigzag order"""
    zz = [0] * 64
    state = (bx * 7919 + by * 104729 + ci * 1299709 + seed) & 0x7fffffff
    def nxt():
        nonlocal state
        state = (state * 1103515245 + 12345) & 0x7fffffff
        return state
    zz[0] = (nxt() % 256) - 128  # DC in a modest range
    for _ in range(density):
        pos = 1 + nxt() % 40
        zz[pos] = (nxt() % 31) - 15 or 7
    return zz


def build(name, w, h, comp_spec, quant_tables, dri=0, seed=1, density=6):
    """comp_spec: list of (comp_id, hs, vs, quant_id, dc_slot, ac_slot).
    Every huffman slot uses Annex-K contents (DC luma/chroma per slot,
    AC luma for both AC slots) — distinct SLOTS exercise table plumbing."""
    hmax = max(c[1] for c in comp_spec)
    vmax = max(c[2] for c in comp_spec)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    comps = []
    for ci, (cid, hs, vs, qid, dslot, aslot) in enumerate(comp_spec):
        blocks = {}
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for v in range(vs):
                    for u in range(hs):
                        bx, by = mx * hs + u, my * vs + v
                        blocks[(bx, by)] = coeffs_for(bx, by, ci, seed, density)
        comps.append({"id": cid, "hs": hs, "vs": vs, "q": qid,
                      "dc": dslot, "ac": aslot, "blocks": blocks})

    out = bytearray()
    def u16(v): out.extend((v >> 8 & 0xff, v & 0xff))
    def marker(m): out.extend((0xff, m))
    marker(0xd8)
    out.extend(b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for qid, (prec, tab) in quant_tables.items():
        marker(0xdb)
        u16(2 + 1 + (128 if prec else 64))
        out.append((prec << 4) | qid)
        for k in range(64):
            v = tab[ZIGZAG[k]]
            if prec:
                u16(v)
            else:
                out.append(v)
    marker(0xc0)
    u16(8 + 3 * len(comps))
    out.append(8)
    u16(h)
    u16(w)
    out.append(len(comps))
    for c in comps:
        out.extend((c["id"], (c["hs"] << 4) | c["vs"], c["q"]))
    # DHT: one segment carrying all referenced tables
    tables = []
    for slot in sorted({c["dc"] for c in comps}):
        tables.append((0, slot, DC_LUMA if slot == 0 else DC_CHROMA))
    for slot in sorted({c["ac"] for c in comps}):
        tables.append((1, slot, AC_LUMA))
    marker(0xc4)
    u16(2 + sum(1 + 16 + len(t[2][1]) for t in tables))
    for cls, slot, (bits, vals) in tables:
        out.append((cls << 4) | slot)
        out.extend(bits)
        out.extend(vals)
    if dri:
        marker(0xdd)
        u16(4)
        u16(dri)
    marker(0xda)
    u16(6 + 2 * len(comps))
    out.append(len(comps))
    for c in comps:
        out.extend((c["id"], (c["dc"] << 4) | c["ac"]))
    out.extend((0, 63, 0))

    codes = {(0, 0): canonical(*DC_LUMA), (0, 1): canonical(*DC_CHROMA),
             (1, 0): canonical(AC_LUMA_BITS, AC_LUMA_VALS),
             (1, 1): canonical(AC_LUMA_BITS, AC_LUMA_VALS)}
    bw = BitWriter()
    preds = [0] * len(comps)
    rst = 0
    for m in range(mcus_x * mcus_y):
        if dri and m and m % dri == 0:
            bw.align_marker(0xd0 + (rst % 8))
            rst += 1
            preds = [0] * len(comps)
        mx, my = m % mcus_x, m // mcus_x
        for ci, c in enumerate(comps):
            for v in range(c["vs"]):
                for u in range(c["hs"]):
                    zz = c["blocks"][(mx * c["hs"] + u, my * c["vs"] + v)]
                    preds[ci] = encode_block(
                        bw, zz, preds[ci], codes[(0, c["dc"])], codes[(1, c["ac"])])
    bw.pad()
    out.extend(bw.out)
    marker(0xd9)

    quant_nat = {qid: tab for qid, (_, tab) in quant_tables.items()}
    pixels = decode_mirror(w, h, comps, quant_nat)
    return bytes(out), {"name": name, "w": w, "h": h,
                        "channels": 1 if len(comps) == 1 else 3,
                        "pixels": base64.b64encode(pixels).decode()}


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/fixtures"
    os.makedirs(outdir, exist_ok=True)
    flat = [1] * 64
    luma_q = [3 + ((i * 5) % 13) for i in range(64)]       # 8-bit table
    chroma_q = [40 + ((i * 11) % 300) for i in range(64)]  # needs 16-bit
    goldens = []

    cases = [
        build("jpeg_gray", 16, 16, [(1, 1, 1, 0, 0, 0)],
              {0: (0, luma_q)}, seed=3),
        build("jpeg_rgb444", 24, 16,
              [(1, 1, 1, 0, 0, 0), (2, 1, 1, 1, 1, 1), (3, 1, 1, 1, 1, 1)],
              {0: (0, luma_q), 1: (1, chroma_q)}, seed=5),
        build("jpeg_rgb420", 32, 32,
              [(1, 2, 2, 0, 0, 0), (2, 1, 1, 1, 1, 1), (3, 1, 1, 1, 1, 1)],
              {0: (0, luma_q), 1: (1, chroma_q)}, dri=2, seed=8),
        build("jpeg_odd420", 19, 13,
              [(1, 2, 2, 0, 0, 0), (2, 1, 1, 1, 1, 1), (3, 1, 1, 1, 1, 1)],
              {0: (0, luma_q), 1: (1, chroma_q)}, seed=13),
        build("jpeg_flat_dc", 16, 16, [(1, 1, 1, 0, 0, 0)],
              {0: (0, flat)}, seed=21, density=0),
        # ---- SOF2 progressive twins (round 9): SAME coefficients as the
        # baseline fixtures above (same seed), so the decoder must produce
        # byte-identical pixels through the Annex-G scan script ----
        build_progressive("jpeg_prog_gray", 16, 16, [(1, 1, 1, 0, 0, 0)],
                          {0: (0, luma_q)}, seed=3, dri=2),
        build_progressive("jpeg_prog_rgb444", 24, 16,
                          [(1, 1, 1, 0, 0, 0), (2, 1, 1, 1, 1, 1), (3, 1, 1, 1, 1, 1)],
                          {0: (0, luma_q), 1: (1, chroma_q)}, seed=5),
        build_progressive("jpeg_prog_odd420", 19, 13,
                          [(1, 2, 2, 0, 0, 0), (2, 1, 1, 1, 1, 1), (3, 1, 1, 1, 1, 1)],
                          {0: (0, luma_q), 1: (1, chroma_q)}, seed=13),
        build_progressive("jpeg_prog_dense", 16, 24, [(1, 1, 1, 0, 0, 0)],
                          {0: (0, luma_q)}, seed=34, density=20),
    ]
    for data, g in cases:
        with open(os.path.join(outdir, g["name"] + ".jpg"), "wb") as f:
            f.write(data)
        goldens.append(g)
        print(f"{g['name']}: {len(data)} bytes, {g['w']}x{g['h']}x{g['channels']}")

    # refusal fixtures: arithmetic coding (SOF9) and truncated entropy data
    rgb444, _ = cases[1]
    arith = bytearray(rgb444)
    sof = arith.find(b"\xff\xc0")
    arith[sof + 1] = 0xc9
    with open(os.path.join(outdir, "jpeg_arith.jpg"), "wb") as f:
        f.write(bytes(arith))
    with open(os.path.join(outdir, "jpeg_trunc.jpg"), "wb") as f:
        f.write(rgb444[: len(rgb444) * 2 // 3])
    print("refusal fixtures: jpeg_arith.jpg jpeg_trunc.jpg")

    with open(os.path.join(outdir, "jpeg_goldens.json"), "w") as f:
        json.dump(goldens, f, separators=(",", ":"))
    print(f"goldens -> {os.path.join(outdir, 'jpeg_goldens.json')}")


if __name__ == "__main__":
    main()
