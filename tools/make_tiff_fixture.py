#!/usr/bin/env python3
"""Independent TIFF fixture writer (TIFF 6.0 spec, written against the
public Adobe spec — NOT a port of the Scala encoder): II and MM byte
orders, 8-bit gray/RGB, strips, Compression 1/5/32773, Predictor 2.
LZW comes from tools/make_pdf_fixture.py's encoder (fixture-proven
against the shared PDF/TIFF decoder). Pixel formulas mirror the other
codec fixtures so TiffSpec can assert exact rasters.

Run from repo root: python3 tools/make_tiff_fixture.py
"""
import struct, sys, os
sys.path.insert(0, os.path.dirname(__file__))
from make_pdf_fixture import lzw_encode

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")


def packbits(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        run = 1
        while i + run < len(data) and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 3:
            out.append(256 + 1 - run)  # two's complement of 1-run
            out.append(data[i])
            i += run
        else:
            lit = i + run
            while (lit < len(data) and lit - i < 128 and
                   not (lit + 2 < len(data) and
                        data[lit] == data[lit + 1] == data[lit + 2])):
                lit += 1
            n = min(lit - i, 128)
            out.append(n - 1)
            out += data[i:i + n]
            i += n
    return bytes(out)


def hdiff(px: bytes, w: int, h: int, ch: int) -> bytes:
    out = bytearray(px)
    for y in range(h):
        r0 = y * w * ch
        for i in range(w * ch - 1, ch - 1, -1):
            out[r0 + i] = (px[r0 + i] - px[r0 + i - ch]) & 0xFF
    return bytes(out)


def write_tiff(path, w, h, ch, px, comp=1, big=False, pred=1, rps=0):
    rps = rps if rps > 0 else h
    e = ">" if big else "<"
    data = hdiff(px, w, h, ch) if pred == 2 else px
    strips = []
    for s0 in range(0, h, rps):
        rows = min(rps, h - s0)
        raw = data[s0 * w * ch:(s0 + rows) * w * ch]
        strips.append({1: raw, 5: lzw_encode(raw),
                       32773: packbits(raw)}[comp])
    n_str = len(strips)
    offs = [8]
    for s in strips[:-1]:
        offs.append(offs[-1] + len(s))
    after = offs[-1] + len(strips[-1])
    bits_off = after
    bits_extra = 6 if ch == 3 else 0
    tab_off = bits_off + bits_extra
    tab_extra = n_str * 8 if n_str > 1 else 0
    ifd = tab_off + tab_extra
    out = bytearray()
    out += b"MM" if big else b"II"
    out += struct.pack(e + "H", 42) + struct.pack(e + "I", ifd)
    for s in strips:
        out += s
    if ch == 3:
        out += struct.pack(e + "HHH", 8, 8, 8)
    if n_str > 1:
        for o in offs:
            out += struct.pack(e + "I", o)
        for s in strips:
            out += struct.pack(e + "I", len(s))
    tags = []

    def t(tid, tpe, cnt, val):
        tags.append((tid, tpe, cnt, val))

    def inline16(v):
        return struct.pack(e + "HH", v, 0)

    def inline32(v):
        return struct.pack(e + "I", v)

    t(256, 4, 1, inline32(w))
    t(257, 4, 1, inline32(h))
    t(258, 3, 3, inline32(bits_off)) if ch == 3 else t(258, 3, 1, inline16(8))
    t(259, 3, 1, inline16(comp))
    t(262, 3, 1, inline16(2 if ch == 3 else 1))
    t(273, 4, n_str, inline32(tab_off) if n_str > 1 else inline32(8))
    t(277, 3, 1, inline16(ch))
    t(278, 4, 1, inline32(rps))
    t(279, 4, n_str, inline32(tab_off + 4 * n_str) if n_str > 1
      else inline32(len(strips[0])))
    if pred == 2:
        t(317, 3, 1, inline16(2))
    out += struct.pack(e + "H", len(tags))
    for tid, tpe, cnt, val in sorted(tags):
        out += struct.pack(e + "HHI", tid, tpe, cnt) + val
    out += struct.pack(e + "I", 0)
    with open(os.path.join(OUT, path), "wb") as f:
        f.write(out)
    print(f"{path}: {len(out)} bytes")


def gray(w, h):
    return bytes(((7 * x + 13 * y) % 256) for y in range(h) for x in range(w))


def rgb(w, h):
    return bytes(v for y in range(h) for x in range(w)
                 for v in ((7 * x + 13 * y) % 256, (3 * x + 5 * y) % 256,
                           (11 * x + y) % 256))


if __name__ == "__main__":
    write_tiff("tiff_gray_none.tiff", 8, 5, 1, gray(8, 5), comp=1)
    write_tiff("tiff_rgb_packbits.tiff", 6, 4, 3, rgb(6, 4), comp=32773, rps=2)
    write_tiff("tiff_gray_lzw_pred.tiff", 9, 7, 1, gray(9, 7), comp=5, pred=2,
               rps=3)
    write_tiff("tiff_mm_rgb_lzw.tiff", 5, 5, 3, rgb(5, 5), comp=5, big=True)
    # a constant-color image exercises PackBits long runs + LZW repeats
    write_tiff("tiff_gray_flat_packbits.tiff", 200, 3, 1, bytes([77] * 600),
               comp=32773)
