#!/usr/bin/env python3
"""Animated-WebP fixture: frame bitstreams encoded by the REAL libwebp
(ctypes against the system shared object — WebPEncodeLosslessRGBA for the
lossless frames, WebPEncodeRGB for the lossy one), wrapped in VP8X/ANIM/
ANMF container framing assembled here from the public WebP Container
Specification (libwebpmux is not shipped in this image, but the framing
is plain byte packing; the codec payloads are genuinely third-party).

Expected values: composed canvas states. Lossless frames decode to exact
RGBA by spec (libwebp's own WebPDecodeRGBA is used as the source of
truth). The lossy frame's YUV planes come from libwebp's decoder; the
YUV→RGB step replicates graft's documented renderer choice (JFIF
fixed-point + nearest-neighbor chroma — mm13's contract is that the YUV
planes are the spec-exact output, RGB conversion is a renderer choice).
Canvas-state MD5s land in webp_anim_expected.json.

Run from repo root: python3 tools/make_webp_anim_fixture.py
"""
import ctypes
import hashlib
import json
import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPEncodeRGB.restype = ctypes.c_size_t
lib.WebPEncodeRGB.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
lib.WebPEncodeLosslessRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPDecodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPDecodeYUV.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPFree.argtypes = [ctypes.c_void_p]


def enc_lossless_rgba(rgba, w, h):
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = lib.WebPEncodeLosslessRGBA(bytes(rgba), w, h, 4 * w, ctypes.byref(out))
    assert n > 0
    data = bytes(out[:n]); lib.WebPFree(out)
    return data


def enc_rgb(rgb, w, h, q):
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = lib.WebPEncodeRGB(bytes(rgb), w, h, 3 * w, float(q), ctypes.byref(out))
    assert n > 0
    data = bytes(out[:n]); lib.WebPFree(out)
    return data


def dec_rgba(data):
    w = ctypes.c_int(); h = ctypes.c_int()
    p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    assert p
    out = bytes(p[:w.value * h.value * 4]); lib.WebPFree(p)
    return out, w.value, h.value


def dec_lossy_rgba_jfif(data):
    """libwebp YUV planes + graft's documented JFIF/nearest renderer."""
    w = ctypes.c_int(); h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_ubyte)(); v = ctypes.POINTER(ctypes.c_ubyte)()
    stride = ctypes.c_int(); uvs = ctypes.c_int()
    y = lib.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(u), ctypes.byref(v),
                          ctypes.byref(stride), ctypes.byref(uvs))
    assert y
    W, H = w.value, h.value

    def clamp(x):
        return 0 if x < 0 else (255 if x > 255 else x)
    out = bytearray(W * H * 4)
    for yy in range(H):
        for xx in range(W):
            Y = y[yy * stride.value + xx]
            cb = u[(yy // 2) * uvs.value + xx // 2] - 128
            cr = v[(yy // 2) * uvs.value + xx // 2] - 128
            i = (yy * W + xx) * 4
            out[i] = clamp(Y + ((91881 * cr + 32768) >> 16))
            out[i + 1] = clamp(Y - ((22554 * cb + 46802 * cr + 32768) >> 16))
            out[i + 2] = clamp(Y + ((116130 * cb + 32768) >> 16))
            out[i + 3] = 255
    lib.WebPFree(y)
    return bytes(out), W, H


def chunk_payload(webp, want):
    """Extract (fourcc, payload) of the first `want` chunk in a RIFF."""
    assert webp[:4] == b"RIFF" and webp[8:12] == b"WEBP"
    off = 12
    while off + 8 <= len(webp):
        cc = webp[off:off + 4]
        ln = struct.unpack("<I", webp[off + 4:off + 8])[0]
        if cc == want:
            return webp[off + 8:off + 8 + ln]
        off += 8 + ln + (ln & 1)
    raise AssertionError("chunk %s not found" % want)


def le24(v):
    return struct.pack("<I", v)[:3]


def main():
    os.makedirs(OUT, exist_ok=True)
    CW, CH = 32, 24
    BG = (16, 32, 64, 255)  # R,G,B,A

    # frame 0: full-canvas lossless gradient with some translucency kept
    # OPAQUE (alpha 255) so both blend modes compose exactly
    f0 = bytearray(CW * CH * 4)
    for yy in range(CH):
        for xx in range(CW):
            i = (yy * CW + xx) * 4
            f0[i], f0[i + 1], f0[i + 2], f0[i + 3] = \
                (xx * 8) % 256, (yy * 10) % 256, (xx * 3 + yy * 5) % 256, 255
    w0 = enc_lossless_rgba(f0, CW, CH)

    # frame 1: 16x12 lossless checker at (8,4), disposed to background
    FW1, FH1 = 16, 12
    f1 = bytearray(FW1 * FH1 * 4)
    for yy in range(FH1):
        for xx in range(FW1):
            i = (yy * FW1 + xx) * 4
            c = (255, 40, 20) if (xx // 2 + yy // 2) % 2 else (10, 230, 210)
            f1[i], f1[i + 1], f1[i + 2], f1[i + 3] = c[0], c[1], c[2], 255
    w1 = enc_lossless_rgba(f1, FW1, FH1)

    # frame 2: 16x16 LOSSY texture at (16,8)
    FW2, FH2 = 16, 16
    f2rgb = bytearray(FW2 * FH2 * 3)
    for yy in range(FH2):
        for xx in range(FW2):
            i = (yy * FW2 + xx) * 3
            f2rgb[i] = (xx * xx + yy * 37) % 251
            f2rgb[i + 1] = (xx * 7 ^ yy * 13) % 251
            f2rgb[i + 2] = (xx + yy * yy) % 251
    w2 = enc_rgb(f2rgb, FW2, FH2, 80)

    # assemble VP8X + ANIM + ANMF framing (public container spec)
    body = bytearray(b"WEBP")
    body += b"VP8X" + struct.pack("<I", 10)
    body += bytes([0x02, 0, 0, 0]) + le24(CW - 1) + le24(CH - 1)
    body += b"ANIM" + struct.pack("<I", 6)
    body += bytes([BG[2], BG[1], BG[0], BG[3]])  # B,G,R,A
    body += struct.pack("<H", 3)  # loop count

    frames = [
        (0, 0, CW, CH, 100, 0, chunk_payload(w0, b"VP8L"), b"VP8L"),
        (8, 4, FW1, FH1, 80, 1, chunk_payload(w1, b"VP8L"), b"VP8L"),
        (16, 8, FW2, FH2, 120, 0, chunk_payload(w2, b"VP8 "), b"VP8 "),
    ]
    for (fx, fy, fw, fh, dur, disp, payload, cc) in frames:
        anmf = le24(fx // 2) + le24(fy // 2) + le24(fw - 1) + le24(fh - 1)
        anmf += le24(dur) + bytes([0x02 | disp])  # no-blend | disposal
        anmf += cc + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            anmf += b"\x00"
        body += b"ANMF" + struct.pack("<I", len(anmf)) + anmf
        if len(anmf) & 1:
            body += b"\x00"
    webp = b"RIFF" + struct.pack("<I", len(body)) + bytes(body)
    with open(os.path.join(OUT, "webp_anim.webp"), "wb") as f:
        f.write(webp)

    # expected composition: transparent canvas; draw; snapshot; dispose
    canvas = bytearray(CW * CH * 4)
    states = []
    decoded = [dec_rgba(w0), dec_rgba(w1), dec_lossy_rgba_jfif(w2)]
    for (fx, fy, fw, fh, dur, disp, _, _), (px, dw, dh) in zip(frames, decoded):
        assert (dw, dh) == (fw, fh)
        for yy in range(fh):
            a = ((fy + yy) * CW + fx) * 4
            canvas[a:a + fw * 4] = px[yy * fw * 4:(yy + 1) * fw * 4]
        states.append(hashlib.md5(bytes(canvas)).hexdigest())
        if disp:
            for yy in range(fh):
                for xx in range(fw):
                    i = ((fy + yy) * CW + fx + xx) * 4
                    canvas[i:i + 4] = bytes([BG[0], BG[1], BG[2], BG[3]])

    exp = {"canvas_w": CW, "canvas_h": CH, "loop": 3,
           "bg": list(BG), "n_frames": 3,
           "durations": [100, 80, 120],
           "lossless": [True, True, False],
           "dispose": [False, True, False],
           "canvas_md5": states}
    with open(os.path.join(OUT, "webp_anim_expected.json"), "w") as f:
        json.dump(exp, f, indent=1)
    print("webp anim fixture: %d bytes, states %s" % (len(webp), states))


if __name__ == "__main__":
    main()
