#!/usr/bin/env python3
"""Lossy-with-alpha WebP fixtures: VP8X + ALPH + VP8 stills encoded by the
real libwebp (ctypes against the system shared object). The alpha plane in
this layout is LOSSLESS (raw or headerless-VP8L-compressed, plus the ALPH
filter methods), so graft.ops.Webp.decodeAlpha must reproduce libwebp's
decoded alpha channel byte-for-byte — that is the differential gate; the
RGB side goes through our nearest-neighbor upsampler (a renderer choice,
pinned separately by the YUV fixtures of make_libwebp_fixture.py).

Outputs:
  webp_alpha_<name>.webp   the container
  webp_alpha_<name>.alpha  libwebp's decoded alpha plane (w*h bytes,
                           preceded by one 8-byte LE header: w, h as u32)
"""
import ctypes
import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPEncodeRGBA.restype = ctypes.c_size_t
lib.WebPEncodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPDecodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPFree.argtypes = [ctypes.c_void_p]


def encode_rgba(rgba, w, h, quality):
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = lib.WebPEncodeRGBA(bytes(rgba), w, h, 4 * w, float(quality),
                           ctypes.byref(out))
    assert n > 0, "libwebp encode failed"
    data = bytes(out[:n])
    lib.WebPFree(out)
    return data


def decode_alpha(data):
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    assert p, "libwebp decode failed"
    W, H = w.value, h.value
    alpha = bytes(p[4 * i + 3] for i in range(W * H))
    lib.WebPFree(p)
    return W, H, alpha


def chunk_fourccs(data):
    assert data[:4] == b"RIFF" and data[8:12] == b"WEBP"
    ccs = []
    p = 12
    while p + 8 <= len(data):
        cc = data[p:p + 4].decode("latin1")
        n = struct.unpack("<I", data[p + 4:p + 8])[0]
        ccs.append(cc)
        p += 8 + n + (n & 1)
    return ccs


def images():
    out = {}
    # smooth radial alpha gradient: exercises the gradient/horizontal filters
    w, h = 40, 28
    rgba = bytearray()
    for y in range(h):
        for x in range(w):
            d2 = (x - w // 2) ** 2 + (y - h // 2) ** 2
            a = max(0, 255 - d2 * 2)
            rgba += bytes(((x * 9) % 256, (y * 13) % 256, (x * y) % 256, a))
    out["gradient"] = (bytes(rgba), w, h)
    # hard-edged sprite alpha (0/255 regions): the common cutout case
    w, h = 33, 17
    rgba = bytearray()
    for y in range(h):
        for x in range(w):
            a = 255 if (4 <= x < 29 and 3 <= y < 14 and (x + y) % 7 != 0) else 0
            rgba += bytes(((x * 31) % 256, 200, (y * 57) % 256, a))
    out["sprite"] = (bytes(rgba), w, h)
    # noisy alpha (incompressible): pushes the encoder toward raw/None filter
    w, h = 24, 24
    rgba = bytearray()
    s = 12345
    for i in range(w * h):
        s = (s * 1103515245 + 12345) & 0x7FFFFFFF
        rgba += bytes((s % 256, (s >> 8) % 256, (s >> 16) % 128, (s >> 7) % 256))
    out["noise"] = (bytes(rgba), w, h)
    # fully opaque control: encoder may drop ALPH entirely
    w, h = 20, 12
    rgba = bytes(b for i in range(w * h)
                 for b in ((i * 3) % 256, (i * 5) % 256, (i * 7) % 256, 255))
    out["opaque"] = (rgba, w, h)
    return out


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, (rgba, w, h) in images().items():
        for q in (30, 75, 95):
            data = encode_rgba(rgba, w, h, q)
            ccs = chunk_fourccs(data)
            W, H, alpha = decode_alpha(data)
            assert (W, H) == (w, h)
            fn = f"webp_alpha_{name}_q{q}"
            with open(os.path.join(OUT, fn + ".webp"), "wb") as f:
                f.write(data)
            with open(os.path.join(OUT, fn + ".alpha"), "wb") as f:
                f.write(struct.pack("<II", W, H) + alpha)
            print(fn, ccs, len(data), "bytes")


if __name__ == "__main__":
    main()
