#!/usr/bin/env python3
"""VP8 keyframe constant tables — the SINGLE source of truth shared by the
Scala decoder (graft.ops.Vp8 loads src/main/resources/vp8_tables.txt, which
this script writes) and the python fixture encoder (imports this module), so
the two sides can never drift on table data.

PROVENANCE (disclosed per table): the structural tables — trees, coefficient
bands, zigzag order, quantizer lookups, token category probabilities, mode
probabilities — are transcribed from RFC 6386 (public spec). The two LARGE
probability tables (`kf_bmode_probs` 10*10*9 and `default_coef_probs` +
`coef_update_probs` 4*8*3*11 each) are PARTIALLY transcribed: the leading
entries follow the RFC reference code; the tail is a deterministic fill
(documented below), because this build environment is fully offline and has
no second copy of the spec to verify a from-memory transcription against —
a wrong-but-plausible 900-byte table would be worse than a disclosed
placeholder. Every fixture bitstream and the mm13 construction READ AND
WRITE through this one file, so the round-trip gates are exact regardless;
decoding third-party B_PRED keyframes additionally requires restoring the
spec values here (a mechanical task with spec access — the decoder logic
does not change).
"""
import os

# ---- quantizer lookups (RFC 6386 §14.1), 128 entries each ----
DC_QLOOKUP = [
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17,
    18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
    44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
    75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
    91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114, 116, 118,
    122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143, 145, 148, 151, 154, 157,
]
AC_QLOOKUP = [
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
    36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
    52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76,
    78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106, 108,
    110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140, 143, 146, 149, 152,
    155, 158, 161, 164, 167, 170, 173, 177, 181, 185, 189, 193, 197, 201, 205, 209,
    213, 217, 221, 225, 229, 234, 239, 245, 249, 254, 259, 264, 269, 274, 279, 284,
]

# ---- zigzag + coefficient bands (RFC 6386 §13) ----
ZIGZAG = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]
COEF_BANDS = [0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7]

# ---- token trees (RFC 6386 §8.2, §11.2, §13.2) ----
# Y modes: DC=0 V=1 H=2 TM=3 B_PRED=4; B modes: DC,TM,VE,HE,LD,RD,VR,VL,HD,HU
KF_YMODE_TREE = [-4, 2, 4, 6, -0, -1, -2, -3]
KF_YMODE_PROB = [145, 156, 163, 128]
UV_MODE_TREE = [-0, 2, -1, 4, -2, -3]
KF_UV_MODE_PROB = [142, 114, 183]
BMODE_TREE = [
    -0, 2,   # B_DC_PRED
    -1, 4,   # B_TM_PRED
    -2, 6,   # B_VE_PRED
    8, 12,
    -3, 10,  # B_HE_PRED
    -5, -6,  # B_RD_PRED, B_VR_PRED
    -4, 14,  # B_LD_PRED
    -7, 16,  # B_VL_PRED
    -8, -9,  # B_HD_PRED, B_HU_PRED
]
# tokens: 0..4 literal, 5..10 cat1..cat6, 11 EOB
COEF_TREE = [
    -11, 2,
    -0, 4,
    -1, 6,
    8, 12,
    -2, 10,
    -3, -4,
    14, 16,
    -5, -6,
    18, 20,
    -7, -8,
    -9, -10,
]
CAT_PROBS = {
    1: [159],
    2: [165, 145],
    3: [173, 148, 140],
    4: [176, 155, 140, 135],
    5: [180, 157, 141, 134, 130],
    6: [254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129],
}
CAT_BASE = {1: 5, 2: 7, 3: 11, 4: 19, 5: 35, 6: 67}

MB_SEGMENT_TREE = [2, 4, -0, -1, -2, -3]


def _fill(seed, n):
    """Deterministic placeholder fill for non-transcribed probability table
    tails: a fixed LCG over (seed, index), mapped into [1, 254] so every
    value is a legal probability. NOT spec values — see module docstring.
    """
    out = []
    x = seed & 0x7FFFFFFF
    for _ in range(n):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        out.append(1 + (x >> 16) % 254)
    return out


# ---- kf B-mode probabilities [above][left][9] (RFC 6386 §11.3) ----
# First ABOVE-row transcribed from the RFC reference code; remaining 810
# entries are the deterministic fill (disclosed above).
KF_BMODE_PROBS_HEAD = [
    [231, 120, 48, 89, 115, 113, 120, 152, 112],
    [152, 179, 64, 126, 170, 118, 46, 70, 95],
    [175, 69, 143, 80, 85, 82, 72, 155, 103],
    [56, 58, 10, 171, 218, 189, 17, 13, 152],
    [144, 71, 10, 38, 171, 213, 144, 34, 26],
    [114, 26, 17, 163, 44, 195, 21, 10, 173],
    [121, 24, 80, 195, 26, 62, 44, 64, 85],
    [170, 46, 55, 19, 136, 160, 33, 206, 71],
    [63, 20, 8, 114, 114, 208, 12, 9, 226],
    [81, 40, 11, 96, 182, 84, 29, 16, 36],
]


def kf_bmode_probs():
    flat = []
    for row in KF_BMODE_PROBS_HEAD:
        flat.extend(row)
    flat.extend(_fill(0x5F8A, 10 * 10 * 9 - len(flat)))
    return [[[flat[(a * 10 + l) * 9 + i] for i in range(9)]
             for l in range(10)] for a in range(10)]


# ---- coefficient probabilities [plane4][band8][ctx3][11] ----
# First (plane 0, band 0) block transcribed; the rest is the deterministic
# fill. Fixture bitstreams SEND explicit per-frame probability updates for
# every position they rely on, so the gates never depend on these values.
DEFAULT_COEF_HEAD = [
    [253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128],
    [189, 129, 242, 255, 227, 213, 255, 219, 128, 128, 128],
    [106, 126, 227, 252, 214, 209, 255, 255, 128, 128, 128],
]


def default_coef_probs():
    flat = []
    for row in DEFAULT_COEF_HEAD:
        flat.extend(row)
    flat.extend(_fill(0x2C11, 4 * 8 * 3 * 11 - len(flat)))
    return [[[[flat[((p * 8 + b) * 3 + c) * 11 + i] for i in range(11)]
              for c in range(3)] for b in range(8)] for p in range(4)]


def coef_update_probs():
    # predominantly 255 in the spec; placeholder = all 255 (disclosed)
    return [[[[255] * 11 for _ in range(3)] for _ in range(8)] for _ in range(4)]


def write_resource(path=None):
    if path is None:
        path = os.path.join(os.path.dirname(__file__), "..",
                            "src", "main", "resources", "vp8_tables.txt")
    def flat4(t):
        return [v for p in t for b in p for c in b for v in c]
    def flat3(t):
        return [v for a in t for l in a for v in l]
    lines = [
        ("dc_qlookup", DC_QLOOKUP),
        ("ac_qlookup", AC_QLOOKUP),
        ("zigzag", ZIGZAG),
        ("coef_bands", COEF_BANDS),
        ("kf_ymode_tree", KF_YMODE_TREE),
        ("kf_ymode_prob", KF_YMODE_PROB),
        ("uv_mode_tree", UV_MODE_TREE),
        ("kf_uv_mode_prob", KF_UV_MODE_PROB),
        ("bmode_tree", BMODE_TREE),
        ("coef_tree", COEF_TREE),
        ("cat1", CAT_PROBS[1]), ("cat2", CAT_PROBS[2]), ("cat3", CAT_PROBS[3]),
        ("cat4", CAT_PROBS[4]), ("cat5", CAT_PROBS[5]), ("cat6", CAT_PROBS[6]),
        ("mb_segment_tree", MB_SEGMENT_TREE),
        ("kf_bmode_probs", flat3(kf_bmode_probs())),
        ("default_coef_probs", flat4(default_coef_probs())),
        ("coef_update_probs", flat4(coef_update_probs())),
    ]
    with open(path, "w") as f:
        f.write("# VP8 keyframe tables — generated by tools/vp8_tables.py; "
                "see that file for per-table provenance.\n")
        for name, vals in lines:
            f.write("%s: %s\n" % (name, " ".join(str(v) for v in vals)))
    print("wrote %s" % path)


if __name__ == "__main__":
    write_resource()
