#!/usr/bin/env python3
"""Build THIRD-PARTY lossy-WebP fixtures: bitstreams encoded by the real
libwebp (via ctypes against the system shared object), with expected Y/U/V
planes produced by libwebp's OWN decoder (WebPDecodeYUV).

This is the independence gate the round-11 advisor asked for: the in-repo
python encoder and the Scala decoder share tools/vp8_tables.py, so their
round trips can't detect wrong table values — a libwebp-encoded stream can.
VP8 decode is bit-exact by spec (bool decoder, dequant, IDCT, prediction,
loop filter are all integer-specified), so graft.ops.Vp8.decodeKeyframe must
reproduce libwebp's decoded planes byte-for-byte.

Outputs (same .planes format as make_vp8_fixture.py):
  vp8_libwebp_<name>.webp / .planes
"""
import ctypes
import os

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPEncodeRGB.restype = ctypes.c_size_t
lib.WebPEncodeRGB.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPDecodeYUV.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPFree.argtypes = [ctypes.c_void_p]


def encode_rgb(rgb, w, h, quality):
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = lib.WebPEncodeRGB(bytes(rgb), w, h, 3 * w, float(quality),
                          ctypes.byref(out))
    assert n > 0, "libwebp encode failed"
    data = bytes(out[:n])
    lib.WebPFree(out)
    return data


def decode_yuv(data):
    w = ctypes.c_int()
    h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_ubyte)()
    v = ctypes.POINTER(ctypes.c_ubyte)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    y = lib.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(u), ctypes.byref(v),
                          ctypes.byref(stride), ctypes.byref(uv_stride))
    assert y, "libwebp decode failed"
    W, H = w.value, h.value
    uvw, uvh = (W + 1) // 2, (H + 1) // 2
    ys = [[y[r * stride.value + c] for c in range(W)] for r in range(H)]
    us = [[u[r * uv_stride.value + c] for c in range(uvw)] for r in range(uvh)]
    vs = [[v[r * uv_stride.value + c] for c in range(uvw)] for r in range(uvh)]
    lib.WebPFree(y)
    return ys, us, vs


def write_fixture(name, webp, planes):
    with open(os.path.join(OUT, "vp8_libwebp_%s.webp" % name), "wb") as f:
        f.write(webp)
    y, u, v = planes
    with open(os.path.join(OUT, "vp8_libwebp_%s.planes" % name), "w") as f:
        f.write("%d %d\n" % (len(y[0]), len(y)))
        for plane in (y, u, v):
            for row in plane:
                f.write(" ".join(str(p) for p in row))
                f.write("\n")
    print("wrote vp8_libwebp_%s (%d bytes)" % (name, len(webp)))


def img(w, h, f):
    rgb = bytearray(w * h * 3)
    for yy in range(h):
        for xx in range(w):
            r, g, b = f(xx, yy)
            i = (yy * w + xx) * 3
            rgb[i], rgb[i + 1], rgb[i + 2] = r & 255, g & 255, b & 255
    return rgb


def main():
    cases = [
        # gradient: smooth content, exercises 16x16 intra + DC/TM modes
        ("grad_q75_32x24", 32, 24, 75,
         lambda x, y: (x * 8, y * 10, (x + y) * 5)),
        # checker: hard edges → B_PRED 4x4 modes + big coefficients
        ("check_q50_48x32", 48, 32, 50,
         lambda x, y: ((255, 32, 16) if (x // 4 + y // 4) % 2 else (8, 240, 224))),
        # odd dims: partial macroblocks on both edges
        ("tex_q90_21x13", 21, 13, 90,
         lambda x, y: ((x * x + y * 37) % 251, (x * 7 ^ y * 13) % 251, (x + y * y) % 251)),
        # low quality: strong quantization, segment/filter header paths
        ("noise_q20_64x48", 64, 48, 20,
         lambda x, y: ((x * 97 + y * 31) % 255, (x * 13 + y * 71) % 255, (x * 41 ^ y) % 255)),
        # extreme quantization floor: q5 random-ish content
        ("rand_q5_40x28", 40, 28, 5,
         lambda x, y: ((x * 193 + y * 89) % 256, (x * 57 ^ y * 101) % 256, (x * 11 + y * 149) % 256)),
        # q100 fine quantization over many macroblocks (8x6 MB grid)
        ("grad_q100_128x96", 128, 96, 100,
         lambda x, y: (x * 2, y * 2, (x + y))),
    ]
    for name, w, h, q, f in cases:
        webp = encode_rgb(img(w, h, f), w, h, q)
        planes = decode_yuv(webp)
        assert len(planes[0]) == h and len(planes[0][0]) == w
        write_fixture(name, webp, planes)


if __name__ == "__main__":
    main()
