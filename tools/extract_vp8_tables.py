#!/usr/bin/env python3
"""Extract the three large VP8 keyframe probability tables from the system
libwebp shared object's read-only data, and emit them as python literals for
tools/vp8_tables.py.

PROVENANCE: libwebp (BSD-licensed, public) compiles the RFC 6386 constant
tables verbatim as uint8 arrays:

  - VP8CoeffsProba0      [4][8][3][11]  = default_coef_probs  (1056 bytes)
  - VP8CoeffsUpdateProba [4][8][3][11]  = coef_update_probs   (1056 bytes)
  - kBModesProba         [10][10][9]    = kf_bmode_probs      ( 900 bytes)

We locate them by anchoring on spec rows that are independently known (and
were already transcribed in this repo's round-11 head): coef[0][1][0] =
253,136,254,..., bmode[0][0] = 231,120,48,... .  In the .so the three arrays
are laid out contiguously (update | bmode | pad | coef), and the decoder and
encoder sections carry two identical copies — the extractor cross-checks the
copies byte-for-byte and validates several independently-known interior rows
(coef[1][0][0] = 198,35,237,223,193,187,162,160,145,155,62 and
upd[0][1][0] = 176,246,255,...) before accepting.

Run: python3 tools/extract_vp8_tables.py [path-to-libwebp.so]
Prints the three tables as python lists; tools/vp8_tables.py embeds the
output (so the repo does not depend on the .so at build/test time).
"""
import sys

SO = sys.argv[1] if len(sys.argv) > 1 else \
    "/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5"

COEF_ANCHOR = bytes([253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128,
                     189, 129, 242, 255, 227, 213, 255, 219, 128, 128, 128])
BMODE_ANCHOR = bytes([231, 120, 48, 89, 115, 113, 120, 152, 112,
                      152, 179, 64, 126, 170, 118, 46, 70, 95])


def find_all(data, pat):
    out, i = [], data.find(pat)
    while i != -1:
        out.append(i)
        i = data.find(pat, i + 1)
    return out


def main():
    data = open(SO, "rb").read()
    coef_offs = [o - 33 for o in find_all(data, COEF_ANCHOR)]  # [0][0] is all-128
    bmode_offs = find_all(data, BMODE_ANCHOR)
    assert len(coef_offs) >= 2 and len(bmode_offs) >= 2, "anchors not found"

    coef = data[coef_offs[0]:coef_offs[0] + 1056]
    bmode = data[bmode_offs[0]:bmode_offs[0] + 900]
    # coef_update_probs sits immediately before kBModesProba in dec/tree.c
    upd = data[bmode_offs[0] - 1056:bmode_offs[0]]

    # cross-checks
    assert coef == data[coef_offs[1]:coef_offs[1] + 1056], "coef copies differ"
    assert bmode == data[bmode_offs[1]:bmode_offs[1] + 900], "bmode copies differ"
    assert list(coef[:11]) == [128] * 11
    assert list(coef[(8 * 3) * 11:(8 * 3) * 11 + 11]) == \
        [198, 35, 237, 223, 193, 187, 162, 160, 145, 155, 62], "coef[1][0][0]"
    assert list(upd[33:35]) == [176, 246], "upd[0][1][0] head"
    assert upd.count(255) > 800 and upd.count(0) == 0, "upd shape"
    assert all(1 <= b <= 255 for b in coef[33:]) and all(
        1 <= b <= 255 for b in bmode), "illegal probability byte"

    def emit(name, b, per):
        vals = list(b)
        print("%s = [" % name)
        for i in range(0, len(vals), per):
            print("    " + ", ".join(str(v) for v in vals[i:i + per]) + ",")
        print("]")

    emit("KF_BMODE_PROBS_FLAT", bmode, 9)
    emit("DEFAULT_COEF_PROBS_FLAT", coef, 11)
    emit("COEF_UPDATE_PROBS_FLAT", upd, 11)


if __name__ == "__main__":
    main()
