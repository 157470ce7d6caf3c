#!/usr/bin/env python3
"""Extract the UTS #39 confusables-skeleton and Unicode NFKC_Casefold
per-codepoint tables from the system ICU (libicui18n/libicuuc 72.1,
Unicode 15.0) via ctypes — the same provenance-safe pattern as the brotli
dictionary and VP8 tables: the data is public Unicode Character Database
content (confusables.txt, DerivedNormalizationProps NFKC_CF), ICU is only
the offline carrier; SHA-256 of each emitted table is asserted by the
Scala loader.

Tables:
  src/main/resources/graft/uts39_skeleton.tsv  cp-hex TAB space-joined cp-hexes
  src/main/resources/graft/nfkc_casefold.tsv   cp-hex TAB space-joined cp-hexes
                                               (second field empty = deletion)

Composition contract (validated below against direct ICU calls):
  nfkcCasefold(X) = NFC( concat per-cp NFKC_CF mapping over chars of X )
  skeleton(X)     = NFD( concat per-cp skeleton  over chars of NFD(X) )

Run from repo root: python3 tools/extract_uts39_tables.py
"""
import ctypes
import hashlib
import json
import os
import sys
import unicodedata
from ctypes import c_void_p, c_int, c_uint, byref, create_string_buffer

HERE = os.path.dirname(__file__)
RES = os.path.join(HERE, "..", "src", "main", "resources", "graft")
FIX = os.path.join(HERE, "..", "src", "test", "resources", "fixtures")

i18n = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libicui18n.so.72")
uc = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libicuuc.so.72")
i18n.uspoof_open_72.restype = c_void_p
i18n.uspoof_getSkeleton_72.restype = c_int
i18n.uspoof_getSkeleton_72.argtypes = [c_void_p, c_uint, c_void_p, c_int,
                                       c_void_p, c_int, c_void_p]
uc.unorm2_getNFKCCasefoldInstance_72.restype = c_void_p
uc.unorm2_normalize_72.restype = c_int
uc.unorm2_normalize_72.argtypes = [c_void_p, c_void_p, c_int, c_void_p,
                                   c_int, c_void_p]

err = c_int(0)
SC = i18n.uspoof_open_72(byref(err))
assert err.value == 0, err.value
NFKCCF = uc.unorm2_getNFKCCasefoldInstance_72(byref(err))
assert err.value == 0, err.value


def _utf16(s):
    b = s.encode("utf-16-le")
    return create_string_buffer(b + b"\x00\x00"), len(b) // 2


def skeleton(s):
    src, n = _utf16(s)
    dest = create_string_buffer(4096)
    e = c_int(0)
    m = i18n.uspoof_getSkeleton_72(SC, 0, src, n, dest, 2048, byref(e))
    assert e.value <= 0, (e.value, repr(s))
    return dest.raw[:m * 2].decode("utf-16-le")


def nfkc_cf(s):
    src, n = _utf16(s)
    dest = create_string_buffer(4096)
    e = c_int(0)
    m = uc.unorm2_normalize_72(NFKCCF, src, n, dest, 2048, byref(e))
    assert e.value <= 0, (e.value, repr(s))
    return dest.raw[:m * 2].decode("utf-16-le")


def cps(s):
    return " ".join(f"{ord(c):X}" for c in s)


def main():
    skel_rows = []
    cf_rows = []
    for cp in range(0x110000):
        if 0xD800 <= cp <= 0xDFFF:
            continue
        ch = chr(cp)
        k = skeleton(ch)
        if k != ch:
            skel_rows.append((cp, k))
        f = nfkc_cf(ch)
        if f != ch:
            cf_rows.append((cp, f))
    os.makedirs(RES, exist_ok=True)
    with open(os.path.join(RES, "uts39_skeleton.tsv"), "w") as fh:
        for cp, k in skel_rows:
            fh.write(f"{cp:X}\t{cps(k)}\n")
    with open(os.path.join(RES, "nfkc_casefold.tsv"), "w") as fh:
        for cp, f in cf_rows:
            fh.write(f"{cp:X}\t{cps(f)}\n")
    print(f"skeleton rows: {len(skel_rows)}, nfkc_cf rows: {len(cf_rows)}")
    for name in ("uts39_skeleton.tsv", "nfkc_casefold.tsv"):
        h = hashlib.sha256(open(os.path.join(RES, name), "rb").read()).hexdigest()
        print(f"sha256 {name}: {h}")

    # validate the composition contract against direct ICU on a battery,
    # and dump the direct outputs for the Scala spec to pin against
    skel_map = {cp: k for cp, k in skel_rows}
    cf_map = {cp: f for cp, f in cf_rows}

    def composed_cf(s):
        return unicodedata.normalize(
            "NFC", "".join(cf_map.get(ord(c), c) for c in s))

    def composed_skel(s):
        d = unicodedata.normalize("NFD", s)
        return unicodedata.normalize(
            "NFD", "".join(skel_map.get(ord(c), c) for c in d))

    battery = [
        "paypal", "раураl", "ρaypal", "ＨeＬＬo ß Ⅷ", "ljеt",
        "m1x 0f l|I", 'quo"te % `x`', "Ꮲaypal", "ﬁnance ﬀ",
        "ΣΊΣΥΦΟΣ", "İstanbul", "ẞß", "ᴠɪᴘ club", "ᏚᏱᏞ",
        "áè", "éè", "so­ft",  # soft hyphen deleted
        "①② steps", "⑩x", "𝐇𝐞𝐥𝐥𝐨", "ℂool ℕumber",
        "н̆ breve", "different 𝔣onts", "ｆｕｌｌwidth",
        "ＡＢＣ mix а-cyr", "䉂 cjk", "ڪ arabic", "ᅀ hangul jamo",
    ]
    fixtures = []
    for s in battery:
        direct_s, direct_f = skeleton(s), nfkc_cf(s)
        assert composed_skel(s) == direct_s, (repr(s), repr(composed_skel(s)),
                                              repr(direct_s))
        assert composed_cf(s) == direct_f, (repr(s), repr(composed_cf(s)),
                                            repr(direct_f))
        # the full text20 pipeline key, pinned directly from ICU
        key = skeleton(nfkc_cf(s))
        fixtures.append({"input": s, "skeleton": direct_s,
                         "nfkc_cf": direct_f, "key": key})
    # randomized cross-check over mixed planes (deterministic seed)
    import random
    rng = random.Random(3915)
    pool = [cp for cp, _ in skel_rows[::17]] + [cp for cp, _ in cf_rows[::29]] \
        + list(range(0x61, 0x7B)) + [0x20]
    for _ in range(500):
        s = "".join(chr(rng.choice(pool)) for _ in range(rng.randint(1, 24)))
        assert composed_skel(s) == skeleton(s), repr(s)
        assert composed_cf(s) == nfkc_cf(s), repr(s)
    os.makedirs(FIX, exist_ok=True)
    with open(os.path.join(FIX, "uts39_expected.json"), "w") as fh:
        json.dump(fixtures, fh, ensure_ascii=False, indent=1)
    print(f"battery: {len(battery)} pinned + 500 randomized composition checks OK")


if __name__ == "__main__":
    sys.exit(main())
