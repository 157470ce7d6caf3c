#!/usr/bin/env python3
"""Brotli (RFC 7932) resources + fixtures for the hand-rolled Scala codec.

PROVENANCE: brotli's reference library (MIT-licensed, public — installed
at /root/miniconda/lib/libbrotlicommon.so) compiles the RFC 7932 constant
data verbatim and exports it:

  - BrotliGetDictionary()      → the Appendix-A static dictionary
                                 (122,784 bytes; the RFC quotes its
                                 SHA-256, asserted below)
  - _kBrotliContextLookupTable → the §7.1 context-mode lookup tables
                                 ([4 modes][p1:256 | p2:256] = 2048 bytes)
  - BrotliGetTransforms()      → the §8 word-transform table (121 rows;
                                 transcribed into Brotli.scala as source,
                                 cross-checked here)

This writes the two binary tables as main resources (the decoder needs
them at runtime) and generates differential fixtures: libbrotli-compressed
streams at several quality/window settings whose exact decode the Scala
reader must reproduce, plus a python-built uncompressed-meta-block stream
(validated through libbrotli) that the Scala WRITER must reproduce
byte-for-byte. No independent JVM brotli implementation exists in this
environment, so the writer emits only uncompressed meta-blocks — valid
per §9.2 and verified against the reference decoder here.

Run from repo root: python3 tools/make_brotli_fixture.py
(uses /root/miniconda/bin/python3's brotlicffi — re-exec'd below)
"""
import ctypes
import hashlib
import json
import os
import struct
import sys

MINICONDA = "/root/miniconda/bin/python3"
if sys.executable != MINICONDA and os.path.exists(MINICONDA):
    os.execv(MINICONDA, [MINICONDA] + sys.argv)

import brotlicffi  # noqa: E402

LIB = "/root/miniconda/lib/libbrotlicommon.so"
ROOT = os.path.join(os.path.dirname(__file__), "..")
RES = os.path.join(ROOT, "src", "main", "resources", "graft")
FIX = os.path.join(ROOT, "src", "test", "resources", "fixtures")

# the RFC 7932 Appendix-A dictionary hash, quoted in the RFC itself
DICT_SHA256 = "20e42eb1b511c21806d4d227d07e5dd06877d8ce7b3a817f378f313653f35c70"


def extract_dictionary():
    lib = ctypes.CDLL(LIB)
    lib.BrotliGetDictionary.restype = ctypes.c_void_p

    class Dict(ctypes.Structure):
        _fields_ = [("size_bits_by_length", ctypes.c_uint8 * 32),
                    ("offsets_by_length", ctypes.c_uint32 * 32),
                    ("data_size", ctypes.c_size_t),
                    ("data", ctypes.POINTER(ctypes.c_uint8))]

    d = Dict.from_address(lib.BrotliGetDictionary())
    data = bytes(ctypes.cast(
        d.data, ctypes.POINTER(ctypes.c_uint8 * d.data_size)).contents)
    assert hashlib.sha256(data).hexdigest() == DICT_SHA256, \
        "dictionary does not match the RFC 7932 hash"
    assert list(d.size_bits_by_length)[4:25] == \
        [10, 10, 11, 11, 10, 10, 10, 10, 10, 9, 9, 8, 7, 7, 8, 7, 7, 6, 6, 5, 5]
    return data


def extract_context_lut():
    lib = ctypes.CDLL(LIB)
    t = bytes((ctypes.c_uint8 * 2048).in_dll(lib, "_kBrotliContextLookupTable"))
    # sanity anchors: LSB6 p1 table is i & 0x3f, MSB6 is i >> 2
    assert all(t[i] == (i & 0x3F) for i in range(256))
    assert all(t[512 + i] == (i >> 2) for i in range(256))
    return t


def extract_transforms():
    lib = ctypes.CDLL(LIB)
    lib.BrotliGetTransforms.restype = ctypes.c_void_p

    class T(ctypes.Structure):
        _fields_ = [("prefix_suffix_size", ctypes.c_uint16),
                    ("prefix_suffix", ctypes.POINTER(ctypes.c_uint8)),
                    ("prefix_suffix_map", ctypes.POINTER(ctypes.c_uint16)),
                    ("num_transforms", ctypes.c_uint32),
                    ("transforms", ctypes.POINTER(ctypes.c_uint8)),
                    ("params", ctypes.POINTER(ctypes.c_uint8)),
                    ("cutOffTransforms", ctypes.c_int16 * 10)]

    t = T.from_address(lib.BrotliGetTransforms())
    assert t.num_transforms == 121
    ps = bytes(ctypes.cast(t.prefix_suffix,
                           ctypes.POINTER(ctypes.c_uint8 * t.prefix_suffix_size)).contents)
    pmap = list(ctypes.cast(t.prefix_suffix_map,
                            ctypes.POINTER(ctypes.c_uint16 * 256)).contents)
    trip = bytes(ctypes.cast(t.transforms,
                             ctypes.POINTER(ctypes.c_uint8 * (121 * 3))).contents)

    def s(idx):
        off = pmap[idx]
        return ps[off + 1:off + 1 + ps[off]]

    return [(s(trip[3 * i]), trip[3 * i + 1], s(trip[3 * i + 2]))
            for i in range(121)]


# ------------------------------------------------------------- payloads

def lcg_bytes(seed, n):
    out = bytearray()
    x = seed
    while len(out) < n:
        x = (x * 6364136223846793005 + 1442695040888963407) & (2**64 - 1)
        out += struct.pack("<Q", x)
    return bytes(out[:n])


def payloads():
    text = (" ".join(
        f"the quick document {i} describes information about the public "
        f"data pipeline, with free text and code from the working site"
        for i in range(400))).encode()
    jsonl = "\n".join(
        json.dumps({"doc_id": i, "lang": "en" if i % 3 else "de",
                    "text": f"shard body {i} " * (i % 7 + 1)},
                   sort_keys=True)
        for i in range(500)).encode()
    utf8 = ("Größe naïve café — 日本語のテキスト, кириллица; "
            "mixed UTF-8 content for the context modes. " * 150).encode()
    rnd = lcg_bytes(0x5EED, 40000)  # incompressible → uncompressed blocks
    runs = b"a" * 30000 + b"b" * 100 + b"a" * 30000
    tiny = b"x"
    empty = b""
    return {"text": text, "jsonl": jsonl, "utf8": utf8, "rnd": rnd,
            "runs": runs, "tiny": tiny, "empty": empty}


def build_uncompressed_stream(data):
    """A brotli stream of uncompressed meta-blocks, bit-exact to what the
    Scala writer (Brotli.compress) emits: WBITS=16 header ('0' bit), then
    per <= 65536-byte chunk: ISLAST=0, MNIBBLES=4, MLEN-1, ISUNCOMPRESSED=1,
    byte-align, raw bytes; closed by ISLAST=1 ISLASTEMPTY=1.
    """
    bits = []  # (value, nbits) LSB-first

    def w(v, n):
        bits.append((v, n))

    out = bytearray()
    cur = 0
    ncur = 0

    def flush_byte_align():
        nonlocal cur, ncur
        if ncur:
            out.append(cur)
            cur = 0
            ncur = 0

    def emit(v, n):
        nonlocal cur, ncur
        for i in range(n):
            cur |= ((v >> i) & 1) << ncur
            ncur += 1
            if ncur == 8:
                flush_byte_align()

    emit(0, 1)  # WBITS = 16
    pos = 0
    while pos < len(data):
        chunk = min(65536, len(data) - pos)
        emit(0, 1)            # ISLAST
        emit(0, 2)            # MNIBBLES code 0 → 4 nibbles
        emit(chunk - 1, 16)   # MLEN - 1
        emit(1, 1)            # ISUNCOMPRESSED
        flush_byte_align()
        out += data[pos:pos + chunk]
        pos += chunk
    emit(1, 1)  # ISLAST
    emit(1, 1)  # ISLASTEMPTY
    flush_byte_align()
    return bytes(out)


def main():
    os.makedirs(RES, exist_ok=True)
    os.makedirs(FIX, exist_ok=True)

    data = extract_dictionary()
    with open(os.path.join(RES, "brotli_dict.bin"), "wb") as f:
        f.write(data)
    lut = extract_context_lut()
    with open(os.path.join(RES, "brotli_ctx.bin"), "wb") as f:
        f.write(lut)

    # dump the transform table for BrotliSpec's differential check
    # against the table transcribed in Brotli.scala (latin1-faithful)
    tr = extract_transforms()
    with open(os.path.join(FIX, "brotli_transforms.json"), "w") as f:
        json.dump([[p.decode("latin1"), ty, sfx.decode("latin1")]
                   for p, ty, sfx in tr], f)

    manifest = {}
    for name, p in payloads().items():
        for q, w in ((1, 18), (5, 22), (9, 22), (11, 24), (11, 10)):
            if name in ("tiny", "empty") and q not in (1, 11):
                continue
            comp = brotlicffi.compress(p, quality=q, lgwin=w)
            assert brotlicffi.decompress(comp) == p
            fn = f"brotli_{name}_q{q}_w{w}.br"
            with open(os.path.join(FIX, fn), "wb") as f:
                f.write(comp)
            manifest[fn] = {"sha256": hashlib.sha256(p).hexdigest(),
                            "len": len(p)}

    # the writer-pinning stream: python-built, libbrotli-validated
    wp = payloads()["jsonl"] + lcg_bytes(7, 70001)
    stream = build_uncompressed_stream(wp)
    assert brotlicffi.decompress(stream) == wp, \
        "uncompressed-meta-block construction rejected by libbrotli"
    with open(os.path.join(FIX, "brotli_uncompressed_writer.br"), "wb") as f:
        f.write(stream)
    with open(os.path.join(FIX, "brotli_uncompressed_writer.raw"), "wb") as f:
        f.write(wp)
    manifest["brotli_uncompressed_writer.br"] = {
        "sha256": hashlib.sha256(wp).hexdigest(), "len": len(wp)}

    # inflate bomb: ~50 MB of zeros in a few hundred bytes — the reader
    # must refuse at the budget, not at OOM
    bomb_plain = b"\x00" * 50_000_000
    bomb = brotlicffi.compress(bomb_plain, quality=5)
    assert brotlicffi.decompress(bomb) == bomb_plain
    with open(os.path.join(FIX, "brotli_bomb.br"), "wb") as f:
        f.write(bomb)

    with open(os.path.join(FIX, "brotli_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    print("wrote", len(manifest), "fixtures +",
          "brotli_dict.bin/brotli_ctx.bin resources")


if __name__ == "__main__":
    main()
