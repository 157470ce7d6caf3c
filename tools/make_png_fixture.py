#!/usr/bin/env python3
"""PNG fixtures for PngSpec/MultimodalSpec, built with python's zlib/struct —
an implementation independent of the JDK codec under test. Pixels are a
deterministic function of (x, y, channel) so the Scala spec can assert the
decoded raster byte-for-byte without a sidecar file.

Fixtures (src/test/resources/fixtures/):
  png_rgb.png      6x5  color type 2, filters cycling 0..4 per row
  png_gray.png     7x4  color type 0, all-Paeth filtering
  png_rgba.png     5x5  color type 6, filters cycling 4..0 (reverse)
  png_ga.png       4x6  color type 4, Up/Average alternating
  png_multi_idat.png  same pixels as png_rgb but IDAT split in 3 chunks
                      and an ancillary tEXt chunk between them
  png_badcrc.png   png_rgb with one flipped bit in the IDAT CRC
  png_trunc.png    png_rgb cut mid-IDAT
  png_interlace.png  9x9 color type 2, Adam7 (all 7 passes non-empty)
  png_pal.png      6x5 color type 3 depth 8, 16-entry palette
  png_pal4.png     7x5 color type 3 depth 4 (sub-byte index packing)
  png_pal_interlace.png  9x6 color type 3 depth 4, Adam7
  png_gray1.png    10x3 color type 0 depth 1 (decoder scales to 0/255)
  png_gray16.png   4x3 color type 0 depth 16 (decoder keeps the MSB)
  png_rgb16.png    3x3 color type 2 depth 16

Pixel formula (the spec mirrors it): sample(x, y, c) = (x*31 + y*17 + c*11 + 7) % 256
Palette fixtures: palette[i] = ((7i+3)%256, (13i+5)%256, (29i+11)%256),
index(x, y) = (3x + 5y) % 16.  16-bit: v16 per-fixture formula in the spec.
"""
import os, struct, zlib

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "fixtures")

def px(x, y, c):
    return (x * 31 + y * 17 + c * 11 + 7) % 256

def raster(w, h, ch):
    return [[bytes(px(x, y, c) for x in range(w) for c in range(ch))][0] for y in range(h)]

def paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

def filt(ftype, row, prior, bpp):
    out = bytearray([ftype])
    for i, x in enumerate(row):
        left = row[i - bpp] if i >= bpp else 0
        up = prior[i] if prior else 0
        ul = prior[i - bpp] if prior and i >= bpp else 0
        if ftype == 0: v = x
        elif ftype == 1: v = x - left
        elif ftype == 2: v = x - up
        elif ftype == 3: v = x - ((left + up) >> 1)
        else: v = x - paeth(left, up, ul)
        out.append(v % 256)
    return bytes(out)

def chunk(typ, data):
    return (struct.pack(">I", len(data)) + typ + data +
            struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

def build(w, h, color_type, filters, idat_split=1, with_text=False):
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    rows = raster(w, h, ch)
    raw = b""
    for y, row in enumerate(rows):
        prior = rows[y - 1] if y > 0 else None
        raw += filt(filters[y % len(filters)], row, prior, ch)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    comp = zlib.compress(raw)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    n = idat_split
    step = (len(comp) + n - 1) // n
    parts = [comp[i:i + step] for i in range(0, len(comp), step)]
    for i, part in enumerate(parts):
        out += chunk(b"IDAT", part)
        if with_text and i == 0:
            out += chunk(b"tEXt", b"Comment\x00fixture")
    return out + chunk(b"IEND", b"")

os.makedirs(OUT, exist_ok=True)

def write(name, data):
    with open(os.path.join(OUT, name), "wb") as f:
        f.write(data)
    print(name, len(data), "bytes")

rgb = build(6, 5, 2, [0, 1, 2, 3, 4])
write("png_rgb.png", rgb)
write("png_gray.png", build(7, 4, 0, [4]))
write("png_rgba.png", build(5, 5, 6, [4, 3, 2, 1, 0]))
write("png_ga.png", build(4, 6, 4, [2, 3]))
write("png_multi_idat.png", build(6, 5, 2, [0, 1, 2, 3, 4], idat_split=3, with_text=True))

# corrupt: flip one bit in the IDAT chunk's CRC (last 4 bytes before IEND)
bad = bytearray(rgb)
iend = bad.rfind(b"IEND")
bad[iend - 8] ^= 0x01  # inside IDAT's CRC field
write("png_badcrc.png", bytes(bad))

write("png_trunc.png", rgb[: len(rgb) - 20])

# ---- round 9: every legal IHDR shape as REAL decodable fixtures --------
A7 = [(0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
      (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2)]

def build2(w, h, depth, color_type, filters, sample, interlace=0, palette=None):
    """General builder: any depth/color/interlace; sample(x,y,c) -> int
    (a palette INDEX when color_type == 3)."""
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    bitspp = depth * ch

    def pack_row(pixels):
        if depth == 8:
            return bytes(v for t in pixels for v in t)
        if depth == 16:
            return b"".join(struct.pack(">H", v) for t in pixels for v in t)
        out = bytearray((len(pixels) * depth + 7) // 8)  # sub-byte, ch == 1
        for i, (v,) in enumerate(pixels):
            bit = i * depth
            out[bit >> 3] |= v << (8 - depth - (bit & 7))
        return bytes(out)

    passes = [(0, 1, 0, 1)] if interlace == 0 else A7
    raw = b""
    fi = 0
    for (x0, dx, y0, dy) in passes:
        pw = (w - x0 + dx - 1) // dx if w > x0 else 0
        ph = (h - y0 + dy - 1) // dy if h > y0 else 0
        if pw == 0 or ph == 0:
            continue
        bpp = max(1, bitspp // 8)
        prior = None
        for py in range(ph):
            y = y0 + py * dy
            row = pack_row([tuple(sample(x0 + pxi * dx, y, c) for c in range(ch))
                            for pxi in range(pw)])
            raw += filt(filters[fi % len(filters)], row, prior, bpp)
            fi += 1
            prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", bytes(v for rgb in palette for v in rgb))
    return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")

PAL16 = [((7 * i + 3) % 256, (13 * i + 5) % 256, (29 * i + 11) % 256)
         for i in range(16)]
def pal_idx(x, y, c):
    return (3 * x + 5 * y) % 16

write("png_interlace.png",
      build2(9, 9, 8, 2, [0, 1, 2, 3, 4], px, interlace=1))
write("png_pal.png", build2(6, 5, 8, 3, [0, 1, 2, 3, 4], pal_idx, palette=PAL16))
write("png_pal4.png", build2(7, 5, 4, 3, [1, 4], pal_idx, palette=PAL16))
write("png_pal_interlace.png",
      build2(9, 6, 4, 3, [4, 2], pal_idx, interlace=1, palette=PAL16))
write("png_gray1.png", build2(10, 3, 1, 0, [0, 2], lambda x, y, c: (x + y) % 2))
write("png_gray16.png",
      build2(4, 3, 16, 0, [1, 3], lambda x, y, c: (x * 9973 + y * 4369 + 12345) % 65536))
write("png_rgb16.png",
      build2(3, 3, 16, 2, [4], lambda x, y, c: (x * 9973 + y * 4373 + c * 1571 + 777) % 65536))
