#!/usr/bin/env python3
"""Extract bzip2's randomization table (BZ2_rNums, 512 ints — public
bzip2-1.0 randtable.c content) from the system libbz2 via ctypes, the
brotli-dictionary provenance pattern; SHA-256 asserted by the Scala
loader. Needed to DECODE the deprecated `randomized` blocks bzip2
< 0.9.0 emitted — the reference library still decodes them, so a scan
parity requires it (round-15 differential parity find).

Run from repo root: python3 tools/extract_bz2_randtable.py
"""
import ctypes
import hashlib
import os

lib = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libbz2.so.1.0")
t = ctypes.cast(lib.BZ2_rNums, ctypes.POINTER(ctypes.c_int32))
vals = [t[i] for i in range(512)]
assert vals[0] == 619 and vals[1] == 720 and vals[511] == 638  # known anchors
assert all(0 < v < 1000 for v in vals)

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "main", "resources", "graft", "bz2_randtable.tsv")
with open(OUT, "w") as f:
    f.write("\n".join(str(v) for v in vals) + "\n")
print("sha256:", hashlib.sha256(open(OUT, "rb").read()).hexdigest())
