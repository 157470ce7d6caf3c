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
  png_interlace.png  1x1 Adam7-flagged (decoder must refuse)
  png_pal.png      1x1 color type 3 (palette — decoder must refuse)

Pixel formula (the spec mirrors it): sample(x, y, c) = (x*31 + y*17 + c*11 + 7) % 256
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

onepx = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 1)  # interlace=1
write("png_interlace.png",
      b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", onepx) +
      chunk(b"IDAT", zlib.compress(b"\x00\x00")) + chunk(b"IEND", b""))

pal = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)  # color type 3
write("png_pal.png",
      b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", pal) +
      chunk(b"PLTE", b"\xff\x00\x00") +
      chunk(b"IDAT", zlib.compress(b"\x00\x00")) + chunk(b"IEND", b""))
