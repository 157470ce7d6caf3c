#!/usr/bin/env python3
"""Differential mutant-parity oracle for the hand-rolled msgpack decoder
(graft.ops.Msgpack) against msgpack-python (miniconda): for every
single-byte XOR mutant of a grid of streams (reference-encoded and
ours), record the reference verdict — decodes → sha256 of a canonical
tree serialization, or refuses. graft.tools.MsgpackParity mirrors the
canonicalization and must agree wherever both sides' MODELS overlap
(our decoder deliberately refuses bin/ext/float32/uint64>2^63/non-string
map keys — the JSON-cell model — so those land in a policy class).

Outputs: /tmp/msgpack_parity/{mp_<i>.bin, mp.tsv}

Run: /root/miniconda/bin/python3 tools/msgpack_mutant_parity.py
then: sbt "runMain graft.tools.MsgpackParity /tmp/msgpack_parity"
"""
import hashlib
import os
import struct
import sys

sys.path.insert(0, "/root/miniconda/lib/python3.13/site-packages")
import msgpack  # noqa: E402

OUT = "/tmp/msgpack_parity"
XORS = [0x01, 0x10, 0x80, 0xFF]

DOCS = [
    [None, True, False, 0, 127, -32, 255, 65535, -129, 2**31, 2**62, -(2**40)],
    {"k": 1, "nested": {"a": [1.5, -0.25, 2.0**-40], "b": "text"},
     "empty": [], "z": None},
    ["unicode: é中文", "", "x" * 300, {"m": [True, None]}],
    [[[1, [2, [3, [4]]]]], {"deep": {"deeper": {"deepest": 7}}}],
    [3.141592653589793, 1e300, -0.0, float("inf")],
]


def canon(v, h):
    if isinstance(v, tuple):  # a map PAIR from object_pairs_hook
        canon(v[0], h)
        canon(v[1], h)
        return
    if v is None:
        h.update(b"n;")
    elif isinstance(v, bool):
        h.update(b"1;" if v else b"0;")
    elif isinstance(v, int):
        h.update(b"i" + str(v).encode() + b";")
    elif isinstance(v, float):
        # NaN payload bits may normalize differently across runtimes —
        # canonize every NaN to one token (both sides)
        if v != v:
            h.update(b"dNAN;")
        else:
            h.update(b"d" + struct.pack("<d", v).hex().encode() + b";")
    elif isinstance(v, str):
        h.update(b"s" + v.encode("utf-8").hex().encode() + b";")
    elif isinstance(v, list) and v and isinstance(v[0], tuple):
        h.update(b"{")
        for p in v:
            canon(p, h)
        h.update(b"}")
    elif isinstance(v, list):
        h.update(b"[")
        for x in v:
            canon(x, h)
        h.update(b"]")
    else:
        raise TypeError(type(v))  # bytes / ExtType -> unmodeled


def has_unmodeled(v):
    if isinstance(v, (bytes, bytearray, msgpack.ExtType)):
        return True
    if isinstance(v, tuple):
        return any(has_unmodeled(x) for x in v)
    if isinstance(v, list):
        return any(has_unmodeled(x) for x in v)
    return False


def verdict(data):
    try:
        up = msgpack.Unpacker(None, raw=False, strict_map_key=False,
                              object_pairs_hook=list)
        up.feed(data)
        vals = list(up)
        if not vals:
            return "fail", None
        if any(has_unmodeled(v) for v in vals):
            return "ok_unmodeled", None
        # an empty map decodes to [] via pairs hook — same shape as an
        # empty array; canonize both as [] (scala mirrors this)
        h = hashlib.sha256()
        for v in vals:
            canon(v, h)
            h.update(b"#")
        return "ok", h.hexdigest()
    except Exception:
        return "fail", None


def main():
    os.makedirs(OUT, exist_ok=True)
    streams = [b"".join(msgpack.packb(d, use_bin_type=True) for d in [doc])
               for doc in DOCS]
    # a multi-value stream
    streams.append(b"".join(msgpack.packb(d) for d in DOCS[:3]))
    rows = []
    counts = {"ok": 0, "ok_unmodeled": 0, "fail": 0}
    for i, base in enumerate(streams):
        with open(os.path.join(OUT, f"mp_{i}.bin"), "wb") as f:
            f.write(base)
        v, _ = verdict(base)
        assert v == "ok", (i, v)
        for pos in range(len(base)):
            for x in XORS:
                m = bytearray(base)
                m[pos] ^= x
                v, hh = verdict(bytes(m))
                counts[v] += 1
                rows.append(f"{i}\t{pos}\t{x}\t{v}\t{hh or ''}")
    with open(os.path.join(OUT, "mp.tsv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"{len(streams)} streams, {len(rows)} mutants: {counts}")


if __name__ == "__main__":
    main()
