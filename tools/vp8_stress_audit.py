#!/usr/bin/env python3
"""One-shot stress differential of the VP8 keyframe decoder against the
real libwebp: encode N random images (random size 4..120 x 4..96, quality
in {5,15,30,50,70,85,95,100}, four content classes — gradient, hard-edge
checker, texture, uniform noise) with libwebp via ctypes, decode each with
BOTH libwebp (WebPDecodeYUV) and tools/vp8_codec.py (the python mirror of
graft.ops.Vp8), and demand bit-exact Y/U/V planes.

This is the audit behind the round-12 COVERAGE claim; the four
vp8_libwebp_* fixtures pin a sample of it in CI (Vp8Spec), this script
re-runs the whole battery on demand. Round-12 result: 50/50 bit-exact.

Usage: python3 tools/vp8_stress_audit.py [n_trials] [seed]
"""
import ctypes
import random
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import vp8_codec as V  # noqa: E402

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


def vp8_payload(webp):
    i = 12
    while i + 8 <= len(webp):
        tag = webp[i:i + 4]
        ln = int.from_bytes(webp[i + 4:i + 8], "little")
        if tag == b"VP8 ":
            return webp[i + 8:i + 8 + ln]
        i += 8 + ln + (ln & 1)
    raise SystemExit("no VP8 chunk")


def main():
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    rnd = random.Random(int(sys.argv[2]) if len(sys.argv) > 2 else 42)
    fails = 0
    for trial in range(trials):
        w = rnd.randint(4, 120)
        h = rnd.randint(4, 96)
        q = rnd.choice([5, 15, 30, 50, 70, 85, 95, 100])
        mode = rnd.randint(0, 3)
        rgb = bytearray()
        for yy in range(h):
            for xx in range(w):
                if mode == 0:
                    px = (xx * 255 // max(1, w - 1), yy * 255 // max(1, h - 1),
                          (xx ^ yy) & 255)
                elif mode == 1:
                    px = (255, 0, 0) if (xx // 3 + yy // 3) % 2 else (0, 0, 255)
                elif mode == 2:
                    px = ((xx * xx + yy * 37) % 256, (xx * 7 ^ yy * 13) & 255,
                          (xx + yy * yy) % 256)
                else:
                    px = (rnd.randint(0, 255), rnd.randint(0, 255), rnd.randint(0, 255))
                rgb += bytes(px)
        out = ctypes.POINTER(ctypes.c_ubyte)()
        nb = lib.WebPEncodeRGB(bytes(rgb), w, h, 3 * w, float(q), ctypes.byref(out))
        webp = bytes(out[:nb])
        lib.WebPFree(out)
        ww = ctypes.c_int(); hh = ctypes.c_int()
        u = ctypes.POINTER(ctypes.c_ubyte)(); v = ctypes.POINTER(ctypes.c_ubyte)()
        st = ctypes.c_int(); ust = ctypes.c_int()
        yp = lib.WebPDecodeYUV(webp, nb, ctypes.byref(ww), ctypes.byref(hh),
                               ctypes.byref(u), ctypes.byref(v),
                               ctypes.byref(st), ctypes.byref(ust))
        try:
            _, _, gy, gu, gv = V.decode_keyframe(vp8_payload(webp))
            uvw, uvh = (w + 1) // 2, (h + 1) // 2
            dy = max(abs(gy[r][c] - yp[r * st.value + c])
                     for r in range(h) for c in range(w))
            du = max(abs(gu[r][c] - u[r * ust.value + c])
                     for r in range(uvh) for c in range(uvw))
            dv = max(abs(gv[r][c] - v[r * ust.value + c])
                     for r in range(uvh) for c in range(uvw))
            if dy or du or dv:
                fails += 1
                print(f"MISMATCH trial {trial}: {w}x{h} q{q} mode{mode}: "
                      f"Y={dy} U={du} V={dv}")
        except Exception as e:  # noqa: BLE001 — report, keep auditing
            fails += 1
            print(f"THROW trial {trial}: {w}x{h} q{q} mode{mode}: {e}")
        finally:
            lib.WebPFree(yp)
    print(f"{trials - fails}/{trials} bit-exact vs libwebp")
    if fails:
        sys.exit(1)


if __name__ == "__main__":
    main()
