#!/usr/bin/env python3
"""WebP (VP8L lossless) fixtures for WebpSpec — an INDEPENDENT Python
encoder written from the public "WebP Lossless Bitstream Specification"
(LSB-first bit packing, canonical prefix codes emitted MSB-of-code
first, the code-length code with order table, LZ77 prefix coding, the
120-entry plane-code table, color cache hash 0x1e35a7bd, and the
predictor / subtract-green / color-indexing transforms).

Fixtures (src/test/resources/fixtures/):
  webp_rgb.webp      8x5 RGB, literal pixels, full Huffman trees
  webp_sg.webp       same raster through the subtract-green transform
  webp_simple2.webp  4x3 two-value channels via 2-symbol SIMPLE codes with
                     symbols in DESCENDING value order (pins the
                     read-order — not canonical-order — code assignment)
  webp_cache.webp    8x6 with a 16-entry color cache, repeated colors hit
  webp_lz77.webp     8x4: row 1 literal, rows 2-4 one backward reference
                     (dist = width via the dist+120 form), plus a
                     3-pixel dist-1 run through plane code 2
  webp_palette.webp  12x5, 4-color palette -> color-indexing transform
                     with 2-bit bundling (4 indices per green byte)
  webp_pred.webp     8x5, predictor transform, 4x4 blocks with modes
                     [[1,2],[7,11]]
  webp_lossy.webp    a minimal lossy VP8 frame header (metadata parse
                     only: 24x10, keyframe tag + sync code)

Pixel formulas (asserted by WebpSpec):
  rgb(x,y)   = R=(7x+13y)%256, G=(3x+5y)%256, B=(11x+y)%256, A=255
  cache: 4-color cycle c[(x+y)%4] with c[i]=(A=255, R=40i+5, G=80i+3, B=20i+7)
  palette: idx(x,y)=(x+2y)%4, pal[i]=(A=255, R=60i+9, G=50i+2, B=30i+4)
  pred: base raster R=(5x+y)%256, G=(2x+3y)%256, B=(x+7y)%256, A=255
"""
import os
import heapq

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")

# ---------------------------------------------------------------- bits --


class Bw:
    def __init__(self):
        self.bytes_ = bytearray()
        self.cur = 0
        self.n = 0

    def write(self, v, nbits):
        for i in range(nbits):
            self.cur |= ((v >> i) & 1) << self.n
            self.n += 1
            if self.n == 8:
                self.bytes_.append(self.cur)
                self.cur = 0
                self.n = 0

    def write_code_msb(self, code, length):
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def done(self):
        if self.n:
            self.bytes_.append(self.cur)
            self.cur = 0
            self.n = 0
        return bytes(self.bytes_)


# ------------------------------------------------------------- huffman --

CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def huffman_lengths(freq):
    """code lengths via pairing; freq: dict sym->count"""
    items = sorted(freq.items())
    if not items:
        return {}
    if len(items) == 1:
        return {items[0][0]: 1}
    heap = [(c, i, [s]) for i, (s, c) in enumerate(items)]
    heapq.heapify(heap)
    lengths = {s: 0 for s, _ in items}
    tie = len(items)
    while len(heap) > 1:
        c1, _, m1 = heapq.heappop(heap)
        c2, _, m2 = heapq.heappop(heap)
        for s in m1 + m2:
            lengths[s] += 1
        heapq.heappush(heap, (c1 + c2, tie, m1 + m2))
        tie += 1
    assert max(lengths.values()) <= 15
    return lengths


def canonical_codes(lengths):
    """sym->(code,len), canonical (by length then symbol)."""
    out = {}
    code = 0
    prev_len = 0
    for s in sorted(lengths, key=lambda s: (lengths[s], s)):
        l = lengths[s]
        if l == 0:
            continue
        code <<= (l - prev_len)
        out[s] = (code, l)
        code += 1
        prev_len = l
    return out


def write_huffman_code(bw, lengths, alphabet_size, simple_order=None):
    """Emit a prefix-code header; return sym->(code,len).
    simple_order: force the simple form with symbols in this exact order."""
    used = sorted(s for s, l in lengths.items() if l > 0)
    if simple_order is not None or (len(used) <= 2 and all(s < 256 for s in used)):
        syms = simple_order if simple_order is not None else used
        assert 1 <= len(syms) <= 2 and all(s < 256 for s in syms)
        bw.write(1, 1)                       # simple
        bw.write(len(syms) - 1, 1)           # num_symbols - 1
        if syms[0] >= 2:
            bw.write(1, 1)
            bw.write(syms[0], 8)
        else:
            bw.write(0, 1)
            bw.write(syms[0], 1)
        if len(syms) == 2:
            bw.write(syms[1], 8)
            return {syms[0]: (0, 1), syms[1]: (1, 1)}
        return {syms[0]: (0, 0)}
    bw.write(0, 1)                           # full code
    lens = [lengths.get(s, 0) for s in range(alphabet_size)]
    clc_freq = {}
    for l in lens:
        clc_freq[l] = clc_freq.get(l, 0) + 1
    clc_lengths = huffman_lengths(clc_freq)
    assert max(clc_lengths.values()) <= 7
    bw.write(15, 4)                          # num_code_lengths = 19
    for sym in CLC_ORDER:
        bw.write(clc_lengths.get(sym, 0), 3)
    bw.write(0, 1)                           # no max-symbol cap
    clc_codes = canonical_codes(clc_lengths)
    for l in lens:
        c, n = clc_codes[l]
        bw.write_code_msb(c, n)
    return canonical_codes(lengths)


# --------------------------------------------------------------- lz77 ---

def lz77_code(value):
    """value -> (prefix_code, extra_bits, extra_val)"""
    if value <= 4:
        return value - 1, 0, 0
    for code in range(4, 24):
        extra = (code - 2) >> 1
        offset = (2 + (code & 1)) << extra
        if offset + 1 <= value <= offset + (1 << extra):
            return code, extra, value - offset - 1
    raise ValueError(value)


def plane_codes():
    cand = [(dx, dy) for dy in range(1, 8) for dx in range(-7, 9)]
    cand += [(dx, 0) for dx in range(1, 9)]
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1],
                             0 if p[0] > 0 else 1))
    assert len(cand) == 120
    return cand


PLANE = plane_codes()


def cache_hash(argb, bits):
    return ((0x1e35a7bd * argb) & 0xffffffff) >> (32 - bits)


# -------------------------------------------------------- image stream --

def emit_image(bw, ops, cache_bits, simple_orders=None, level0=False):
    """ops: list of ('lit', a, r, g, b) | ('copy', length, dist_value)
    | ('cache', idx). Writes cache flag + (level0 only) the no-meta bit
    + 5 trees + symbols — auxiliary images carry NO meta bit."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if level0:
        bw.write(0, 1)                       # no meta prefix
    cache_size = (1 << cache_bits) if cache_bits else 0
    gf, rf, bf, af, df = {}, {}, {}, {}, {}
    for op in ops:
        if op[0] == 'lit':
            _, a, r, g, b = op
            gf[g] = gf.get(g, 0) + 1
            rf[r] = rf.get(r, 0) + 1
            bf[b] = bf.get(b, 0) + 1
            af[a] = af.get(a, 0) + 1
        elif op[0] == 'copy':
            lc, _, _ = lz77_code(op[1])
            gf[256 + lc] = gf.get(256 + lc, 0) + 1
            dc, _, _ = lz77_code(op[2])
            df[dc] = df.get(dc, 0) + 1
        else:
            gf[256 + 24 + op[2]] = gf.get(256 + 24 + op[2], 0) + 1
    if not df:
        df = {0: 1}                          # legal unused 1-symbol tree
    so = simple_orders or {}
    gc = write_huffman_code(bw, huffman_lengths(gf), 256 + 24 + cache_size, so.get('g'))
    rc = write_huffman_code(bw, huffman_lengths(rf), 256, so.get('r'))
    bc = write_huffman_code(bw, huffman_lengths(bf), 256, so.get('b'))
    ac = write_huffman_code(bw, huffman_lengths(af), 256, so.get('a'))
    dc_ = write_huffman_code(bw, huffman_lengths(df), 40, so.get('d'))
    for op in ops:
        if op[0] == 'lit':
            _, a, r, g, b = op
            bw.write_code_msb(*gc[g])
            bw.write_code_msb(*rc[r])
            bw.write_code_msb(*bc[b])
            bw.write_code_msb(*ac[a])
        elif op[0] == 'copy':
            code, extra, ev = lz77_code(op[1])
            bw.write_code_msb(*gc[256 + code])
            bw.write(ev, extra)
            code, extra, ev = lz77_code(op[2])
            bw.write_code_msb(*dc_[code])
            bw.write(ev, extra)
        else:
            _, _, idx = op
            bw.write_code_msb(*gc[256 + 24 + idx])


def ops_for_pixels(pixels, cache_bits=0):
    """literal ops with greedy cache hits; pixels = ARGB ints."""
    ops = []
    cache = [0] * (1 << cache_bits) if cache_bits else None
    for p in pixels:
        if cache is not None:
            h = cache_hash(p, cache_bits)
            if cache[h] == p:
                ops.append(('cache', p, h))
                continue
        a, r, g, b = (p >> 24) & 255, (p >> 16) & 255, (p >> 8) & 255, p & 255
        ops.append(('lit', a, r, g, b))
        if cache is not None:
            cache[cache_hash(p, cache_bits)] = p
    return ops


def riff_vp8l(payload_bits_done):
    vp8l = b'\x2f' + payload_bits_done
    pad = b'\x00' if len(vp8l) % 2 else b''
    riff_size = 4 + 8 + len(vp8l) + len(pad)
    return (b'RIFF' + riff_size.to_bytes(4, 'little') + b'WEBP'
            + b'VP8L' + len(vp8l).to_bytes(4, 'little') + vp8l + pad)


def header_bits(bw, w, h, alpha=0):
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(alpha, 1)
    bw.write(0, 3)


def argb(a, r, g, b):
    return (a << 24) | (r << 16) | (g << 8) | b


# ------------------------------------------------------------ fixtures --

def fx_rgb(subtract_green):
    w, h = 8, 5
    bw = Bw()
    header_bits(bw, w, h)
    px = []
    for y in range(h):
        for x in range(w):
            r, g, b = (7 * x + 13 * y) % 256, (3 * x + 5 * y) % 256, (11 * x + y) % 256
            if subtract_green:
                r, b = (r - g) % 256, (b - g) % 256
            px.append(argb(255, r, g, b))
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)                       # subtract-green
    bw.write(0, 1)                           # no (more) transforms
    emit_image(bw, ops_for_pixels(px), 0, level0=True)
    return riff_vp8l(bw.done())


def fx_simple2():
    # two-value channels, simple codes with DESCENDING symbol order:
    # G in {200, 10} (order [200, 10] -> code 0 = 200), R in {99, 1},
    # B single {7}, A single {255}
    w, h = 4, 3
    bw = Bw()
    header_bits(bw, w, h)
    bw.write(0, 1)
    ops = []
    for y in range(h):
        for x in range(w):
            g = 200 if (x + y) % 2 == 0 else 10
            r = 99 if x % 2 == 0 else 1
            ops.append(('lit', 255, r, g, 7))
    emit_image(bw, ops, 0, level0=True,
               simple_orders={'g': [200, 10], 'r': [99, 1], 'b': [7],
                              'a': [255], 'd': [0]})
    return riff_vp8l(bw.done())


def fx_cache():
    w, h = 8, 6
    bw = Bw()
    header_bits(bw, w, h)
    bw.write(0, 1)
    colors = [argb(255, 40 * i + 5, 80 * i + 3, 20 * i + 7) for i in range(4)]
    px = [colors[(x + y) % 4] for y in range(h) for x in range(w)]
    emit_image(bw, ops_for_pixels(px, cache_bits=4), 4, level0=True)
    return riff_vp8l(bw.done())


def fx_lz77():
    w, h = 8, 4
    bw = Bw()
    header_bits(bw, w, h)
    bw.write(0, 1)
    # row 0: literals; rows 1-3 minus last 3 px: one copy (dist=w) of
    # length 2*w+5; final 3 px: copy dist 1 (plane code 2 -> (1,0))
    ops = []
    for x in range(w):
        r, g, b = (7 * x) % 256, (3 * x) % 256, (11 * x) % 256
        ops.append(('lit', 255, r, g, b))
    ops.append(('copy', 2 * w + 5, w + 120))  # dist value w via +120 form
    ops.append(('copy', 3, 2))                # plane code 2 = (dx 1, dy 0)
    emit_image(bw, ops, 0, level0=True)
    return riff_vp8l(bw.done())


def fx_palette():
    w, h = 12, 5
    bw = Bw()
    header_bits(bw, w, h)
    pal = [argb(255, 60 * i + 9, 50 * i + 2, 30 * i + 4) for i in range(4)]
    # transform: color indexing
    bw.write(1, 1)
    bw.write(3, 2)
    bw.write(len(pal) - 1, 8)
    # palette as an entropy-coded image of component DELTAS
    deltas = []
    prev = 0
    for p in pal:
        d = argb(((p >> 24) - (prev >> 24)) & 255,
                 ((p >> 16) - (prev >> 16)) & 255,
                 ((p >> 8) - (prev >> 8)) & 255,
                 (p - prev) & 255)
        deltas.append(d)
        prev = p
    emit_image(bw, ops_for_pixels(deltas), 0)
    bw.write(0, 1)                           # no more transforms
    # bundled main image: width_bits=2 (4 indices/byte), packed width 3
    packed_w = (w + 3) // 4
    px = []
    for y in range(h):
        for bx in range(packed_w):
            byte = 0
            for sub in range(4):
                x = bx * 4 + sub
                idx = (x + 2 * y) % 4 if x < w else 0
                byte |= idx << (sub * 2)
            px.append(argb(0, 0, byte, 0))
    emit_image(bw, ops_for_pixels(px), 0, level0=True)
    return riff_vp8l(bw.done())


# predictor helpers (encoder side mirrors the spec's reconstruction)
def _avg2(a, b):
    return argb(((a >> 24 & 255) + (b >> 24 & 255)) >> 1,
                ((a >> 16 & 255) + (b >> 16 & 255)) >> 1,
                ((a >> 8 & 255) + (b >> 8 & 255)) >> 1,
                ((a & 255) + (b & 255)) >> 1)


def _select(l, t, tl):
    pa = pb = 0
    for s in (24, 16, 8, 0):
        pred = (l >> s & 255) + (t >> s & 255) - (tl >> s & 255)
        pa += abs(pred - (l >> s & 255))
        pb += abs(pred - (t >> s & 255))
    # libwebp returns TOP on ties (Select(top, left, tl): pa_minus_pb <= 0
    # picks top); strict < keeps the fixture aligned with real encoders.
    return l if pa < pb else t


def fx_pred():
    w, h = 8, 5
    bits = 2                                  # 4x4 blocks -> 2x2 block grid
    modes = [[1, 2], [7, 11]]
    px = [argb(255, (5 * x + y) % 256, (2 * x + 3 * y) % 256, (x + 7 * y) % 256)
          for y in range(h) for x in range(w)]
    res = []
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xff000000
            elif y == 0:
                pred = px[i - 1]
            elif x == 0:
                pred = px[i - w]
            else:
                mode = modes[y >> bits][x >> bits]
                l, t, tl = px[i - 1], px[i - w], px[i - w - 1]
                tr = px[i - w + 1]
                pred = {1: l, 2: t, 7: _avg2(l, t),
                        11: _select(l, t, tl)}[mode]
            res.append(argb(((px[i] >> 24) - (pred >> 24)) & 255,
                            ((px[i] >> 16) - (pred >> 16)) & 255,
                            ((px[i] >> 8) - (pred >> 8)) & 255,
                            (px[i] - pred) & 255))
    bw = Bw()
    header_bits(bw, w, h)
    bw.write(1, 1)
    bw.write(0, 2)                           # predictor transform
    bw.write(bits - 2, 3)
    mode_px = [argb(0, 0, modes[by][bx], 0)
               for by in range(2) for bx in range(2)]
    emit_image(bw, ops_for_pixels(mode_px), 0)
    bw.write(0, 1)                           # no more transforms
    emit_image(bw, ops_for_pixels(res), 0, level0=True)
    return riff_vp8l(bw.done())


def fx_pred_tie():
    """Select (mode 11) TIE-BREAK pin: at (1,1), L=(255,5,5,5),
    T=(255,15,15,15), TL=(255,10,10,10) -> pa == pb == 15 with L != T.
    libwebp picks T on the tie; a decoder that picks L produces
    (255,10,10,10) instead of the true (255,20,20,20)."""
    w, h = 2, 2
    bits = 2                                  # one 4x4 block -> whole image
    px = [argb(255, 10, 10, 10), argb(255, 15, 15, 15),
          argb(255, 5, 5, 5), argb(255, 20, 20, 20)]
    res = []
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xff000000
            elif y == 0:
                pred = px[i - 1]
            elif x == 0:
                pred = px[i - w]
            else:
                pred = _select(px[i - 1], px[i - w], px[i - w - 1])
            res.append(argb(((px[i] >> 24) - (pred >> 24)) & 255,
                            ((px[i] >> 16) - (pred >> 16)) & 255,
                            ((px[i] >> 8) - (pred >> 8)) & 255,
                            (px[i] - pred) & 255))
    bw = Bw()
    header_bits(bw, w, h)
    bw.write(1, 1)
    bw.write(0, 2)                           # predictor transform
    bw.write(bits - 2, 3)
    emit_image(bw, ops_for_pixels([argb(0, 0, 11, 0)]), 0)
    bw.write(0, 1)                           # no more transforms
    emit_image(bw, ops_for_pixels(res), 0, level0=True)
    return riff_vp8l(bw.done())


def fx_lossy():
    w, h = 24, 10
    tag = (0).to_bytes(3, 'little')          # keyframe, version 0
    body = tag + b'\x9d\x01\x2a' + w.to_bytes(2, 'little') + h.to_bytes(2, 'little')
    body += b'\x00' * 8                      # enough bytes past the header
    pad = b'\x00' if len(body) % 2 else b''
    riff_size = 4 + 8 + len(body) + len(pad)
    return (b'RIFF' + riff_size.to_bytes(4, 'little') + b'WEBP'
            + b'VP8 ' + len(body).to_bytes(4, 'little') + body + pad)


def main():
    os.makedirs(OUT, exist_ok=True)
    out = {
        'webp_rgb.webp': fx_rgb(False),
        'webp_sg.webp': fx_rgb(True),
        'webp_simple2.webp': fx_simple2(),
        'webp_cache.webp': fx_cache(),
        'webp_lz77.webp': fx_lz77(),
        'webp_palette.webp': fx_palette(),
        'webp_pred.webp': fx_pred(),
        'webp_pred_tie.webp': fx_pred_tie(),
        'webp_lossy.webp': fx_lossy(),
    }
    for name, data in out.items():
        with open(os.path.join(OUT, name), 'wb') as f:
            f.write(data)
        print(name, len(data), 'bytes')


if __name__ == '__main__':
    main()
