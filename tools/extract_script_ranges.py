#!/usr/bin/env python3
"""Extract the Unicode Script property as contiguous ranges from the
system ICU 72.1 (Unicode 15.0) via ctypes — public UCD data
(Scripts.txt), ICU is only the offline carrier; SHA-256 asserted by the
Scala loader (the brotli-dictionary provenance pattern).

Output: src/main/resources/graft/unicode_scripts.tsv
  <startHex> <endHex> <4-letter script code>   (runs; Zzzz omitted)

Run from repo root: python3 tools/extract_script_ranges.py
"""
import ctypes
import hashlib
import os
from ctypes import c_int, c_void_p, byref

uc = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libicuuc.so.72")
uc.u_getIntPropertyValue_72.restype = c_int
uc.u_getIntPropertyValue_72.argtypes = [c_int, c_int]
uc.uscript_getShortName_72.restype = ctypes.c_char_p
uc.uscript_getShortName_72.argtypes = [c_int]
UCHAR_SCRIPT = 0x100A

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "main", "resources", "graft", "unicode_scripts.tsv")


def main():
    runs = []
    cur = None  # (start, code)
    prev_cp = -1
    for cp in range(0x110000):
        if 0xD800 <= cp <= 0xDFFF:
            code = -1
        else:
            code = uc.u_getIntPropertyValue_72(cp, UCHAR_SCRIPT)
        if cur is None or code != cur[1] or cp != prev_cp + 1:
            if cur is not None:
                runs.append((cur[0], prev_cp, cur[1]))
            cur = (cp, code)
        prev_cp = cp
    runs.append((cur[0], prev_cp, cur[1]))
    names = {}
    lines = []
    for a, b, code in runs:
        if code < 0:
            continue
        if code not in names:
            names[code] = uc.uscript_getShortName_72(code).decode()
        name = names[code]
        if name == "Zzzz":  # Unknown — omit, the loader defaults to it
            continue
        lines.append(f"{a:X}\t{b:X}\t{name}")
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    data = open(OUT, "rb").read()
    print(f"{len(lines)} runs, {len(names)} scripts, {len(data)} bytes")
    print("sha256:", hashlib.sha256(data).hexdigest())
    # sanity anchors
    import unicodedata  # noqa: F401
    probe = {0x61: "Latn", 0x430: "Cyrl", 0x3BF: "Grek", 0x4E00: "Hani",
             0x30: "Zyyy", 0x20: "Zyyy", 0x301: "Zinh", 0x5D0: "Hebr"}
    for cp, want in probe.items():
        code = uc.u_getIntPropertyValue_72(cp, UCHAR_SCRIPT)
        got = uc.uscript_getShortName_72(code).decode()
        assert got == want, (hex(cp), got, want)
    print("anchors OK")


if __name__ == "__main__":
    main()
