#!/usr/bin/env python3
"""Build the lossy-WebP (VP8 keyframe) fixtures for Vp8Spec/WebpSpec.

Each fixture is a genuine RIFF/WEBP file containing a VP8 keyframe encoded
by the independent python encoder (tools/vp8_codec.py), plus the EXPECTED
decoded Y/U/V planes (the encoder's reconstruction run through the same
inverse-transform + loop-filter path a decoder executes). The Scala decoder
must reproduce the planes byte-for-byte.

Outputs (src/test/resources/fixtures/):
  vp8_<name>.webp       the bitstream
  vp8_<name>.planes     "w h\n" + Y rows + U rows + V rows, space-separated
  vp8_interframe.webp   a NON-keyframe stream (decode must refuse, typed)

Run from repo root: python3 tools/make_vp8_fixture.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
import vp8_codec as V
import vp8_tables as T

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")


def riff(payload):
    chunk = b"VP8 " + len(payload).to_bytes(4, "little") + bytes(payload)
    if len(chunk) % 2:
        chunk += b"\x00"
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk


def mk_img(w, h, f):
    return [[f(x, y) & 0xFF for x in range(w)] for y in range(h)]


def write_fixture(name, payload, planes):
    with open(os.path.join(OUT, "vp8_%s.webp" % name), "wb") as f:
        f.write(riff(payload))
    y, u, v = planes
    with open(os.path.join(OUT, "vp8_%s.planes" % name), "w") as f:
        f.write("%d %d\n" % (len(y[0]), len(y)))
        for plane in (y, u, v):
            for row in plane:
                f.write(" ".join(str(p) for p in row))
                f.write("\n")
    print("wrote vp8_%s (%d bytes)" % (name, len(payload)))


def main():
    os.makedirs(OUT, exist_ok=True)
    mbW, mbH = 3, 2
    w, h = 48, 32
    y = mk_img(w, h, lambda x, yy: x * 5 + yy * 11 + (x * yy) // 3)
    u = mk_img(w // 2, h // 2, lambda x, yy: 120 + x * 2 - yy)
    v = mk_img(w // 2, h // 2, lambda x, yy: 130 - x + yy * 3)

    spec16 = [{"ymode": [0, 1, 2, 3, 0, 1][i % 6], "uvmode": [0, 1, 2, 3][i % 4]}
              for i in range(mbW * mbH)]
    specb = [{"ymode": 4, "bmodes": [(i + j) % 10 for j in range(16)],
              "uvmode": i % 4} for i in range(mbW * mbH)]
    mixed = [dict(s) for s in (spec16[:3] + specb[3:])]

    cases = [
        ("modes16", w, h, y, u, v, spec16, dict(y_ac_qi=40)),
        ("bpred", w, h, y, u, v, specb, dict(y_ac_qi=18)),
        ("lf_normal", w, h, y, u, v, mixed,
         dict(y_ac_qi=30, filter_type=0, filter_level=33, sharpness=2)),
        ("lf_simple", w, h, y, u, v, spec16,
         dict(y_ac_qi=30, filter_type=1, filter_level=21)),
        ("multipart", w, h, y, u, v, specb, dict(y_ac_qi=25, nparts=4)),
        ("segmented", w, h, y, u, v,
         [dict(s, seg=i % 4) for i, s in enumerate(specb)],
         dict(y_ac_qi=60, filter_level=25,
              seg={"abs": False, "quant": [0, 12, -12, 30],
                   "lf": [0, 6, -4, 12], "probs": [200, 160, 128]})),
        ("odd_21x13", 21, 13,
         mk_img(21, 13, lambda x, yy: 40 + x * 9 + yy * 4),
         mk_img(11, 7, lambda x, yy: 100 + x * 5),
         mk_img(11, 7, lambda x, yy: 150 - yy * 7),
         [{"ymode": (i % 4), "uvmode": (i + 1) % 4} for i in range(4)],
         dict(y_ac_qi=50, filter_level=15)),
        ("qdeltas", w, h, y, u, v, mixed,
         dict(y_ac_qi=45, q_deltas=(3, -2, 4, -5, 6), lf_deltas=([5, 0, 0, 0],
              [-3, 0, 0, 0]), filter_level=28)),
        ("prob_updates", w, h, y, u, v, specb,
         dict(y_ac_qi=22, coef_overrides=T.default_coef_probs())),
    ]
    for name, ww, hh, ty, tu, tv, spec, kw in cases:
        payload, planes = V.encode_keyframe(ww, hh, ty, tu, tv, spec, **kw)
        # self-check with the python mirror decoder before writing
        got = V.decode_keyframe(payload)
        assert got[2:] == planes, "python round trip failed for %s" % name
        write_fixture(name, payload, planes)

    # the lossless DC-only construction (the mm13 oracle shape): flat 4x4
    # tiles at qindex 0 reconstruct EXACTLY (dc level = 2*residual)
    tiles = [(i * 37 + 11) % 256 for i in range(16)]
    flat_y = mk_img(16, 16, lambda x, yy: tiles[(yy // 4) * 4 + x // 4])
    flat_u = mk_img(8, 8, lambda x, yy: 128)
    flat_v = mk_img(8, 8, lambda x, yy: 128)
    spec_flat = [{"ymode": 4, "bmodes": [0] * 16, "uvmode": 0}]
    payload, planes = V.encode_keyframe(16, 16, flat_y, flat_u, flat_v,
                                        spec_flat, y_ac_qi=0)
    assert planes[0] == flat_y, "DC-lossless construction is not lossless"
    assert planes[1] == flat_u and planes[2] == flat_v
    write_fixture("dc_lossless", payload, planes)

    # non-keyframe: decode must refuse with the typed inter-frame error
    inter = bytearray(payload)
    inter[0] |= 1  # frame_type = inter
    with open(os.path.join(OUT, "vp8_interframe.webp"), "wb") as f:
        f.write(riff(bytes(inter)))
    print("wrote vp8_interframe")


if __name__ == "__main__":
    main()
