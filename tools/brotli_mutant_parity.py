#!/usr/bin/env python3
"""Differential mutant-parity oracle for the from-scratch brotli reader:
for every single-byte XOR mutation of a set of libbrotli streams, record
libbrotli's verdict (decodes → sha256 of the output, or refuses). The
Scala side (BrotliMutantParitySpec) regenerates the same mutants from
the base fixtures and must AGREE with libbrotli on every one — accept vs
refuse AND the decoded bytes. This is a far stronger check than the
"typed or decodes" sweep: a decoder bug that silently accepts garbage
(or produces wrong bytes on a valid mutant) is caught byte-exactly.

Uses the miniconda libbrotlidec via ctypes (the raw streaming API is the
only one that reports leftover input). Large-window (w24) fixtures are
included: the decoder handles them without a flag.

Output: /tmp/brotli_mutant_parity.tsv (~135 MB — a tool-run artifact,
deliberately NOT a committed fixture)
  <fixture-name> <pos> <xor> <ok|fail> [<sha256>]

Run from repo root with the miniconda python (has brotlicffi):
  /root/miniconda/bin/python3 tools/brotli_mutant_parity.py
then check parity with:
  sbt "runMain graft.tools.BrotliParity /tmp/brotli_mutant_parity.tsv"
"""
import ctypes
import hashlib
import os
from ctypes import (POINTER, byref, c_char_p, c_size_t, c_void_p,
                    create_string_buffer)

_dec = ctypes.CDLL("/root/miniconda/lib/libbrotlidec.so")
_dec.BrotliDecoderCreateInstance.restype = c_void_p
_dec.BrotliDecoderCreateInstance.argtypes = [c_void_p, c_void_p, c_void_p]
_dec.BrotliDecoderDestroyInstance.argtypes = [c_void_p]
_dec.BrotliDecoderDecompressStream.restype = ctypes.c_int
_dec.BrotliDecoderDecompressStream.argtypes = [
    c_void_p, POINTER(c_size_t), POINTER(c_char_p),
    POINTER(c_size_t), POINTER(c_char_p), POINTER(c_size_t)]
# BrotliDecoderResult
_ERROR, _SUCCESS, _NEEDS_MORE_INPUT, _NEEDS_MORE_OUTPUT = 0, 1, 2, 3

HERE = os.path.dirname(__file__)
FIX = os.path.join(HERE, "..", "src", "test", "resources", "fixtures")
XORS = [0x01, 0x10, 0x80, 0xFF]

# the full quality/window/content grid the reader is already pinned on
NAMES = [n for n in sorted(os.listdir(FIX))
         if n.startswith("brotli_") and n.endswith(".br")
         and n != "brotli_bomb.br"]


MAX_OUT = 256 << 20  # = graft.core.Budget.maxInflatedBytes default


def verdict(data):
    # raw streaming API so trailing bytes are visible: libbrotli's one-shot
    # decompress silently IGNORES garbage after the final meta-block; our
    # reader refuses it by policy (BrotliSpec pins that), so the verdict
    # distinguishes ok (stream consumed the whole input) from ok_trailing
    # (the decoder reported SUCCESS with input bytes left over)
    st = _dec.BrotliDecoderCreateInstance(None, None, None)
    try:
        avail_in = c_size_t(len(data))
        next_in = c_char_p(data)
        h = hashlib.sha256()
        total = 0
        while True:
            buf = create_string_buffer(1 << 20)
            avail_out = c_size_t(len(buf))
            next_out = ctypes.cast(buf, c_char_p)
            r = _dec.BrotliDecoderDecompressStream(
                st, byref(avail_in), byref(next_in),
                byref(avail_out), byref(next_out), None)
            n = len(buf) - avail_out.value
            if n:
                h.update(buf.raw[:n])
                total += n
                if total > MAX_OUT:
                    return "fail", None  # bomb guard, same as our budget
            if r == _SUCCESS:
                kind = "ok_trailing" if avail_in.value else "ok"
                return kind, h.hexdigest()
            if r == _NEEDS_MORE_OUTPUT:
                continue
            return "fail", None  # ERROR, or NEEDS_MORE_INPUT at stream end
    finally:
        _dec.BrotliDecoderDestroyInstance(st)


def main():
    rows = []
    n_ok = n_fail = 0
    for name in NAMES:
        base = open(os.path.join(FIX, name), "rb").read()
        # sanity: the base stream itself must decode
        v, _ = verdict(base)
        assert v == "ok", name
        for pos in range(len(base)):
            for x in XORS:
                m = bytearray(base)
                m[pos] ^= x
                v, h = verdict(bytes(m))
                if v.startswith("ok"):
                    n_ok += 1
                    rows.append(f"{name}\t{pos}\t{x}\t{v}\t{h}")
                else:
                    n_fail += 1
                    rows.append(f"{name}\t{pos}\t{x}\tfail\t")
    out = "/tmp/brotli_mutant_parity.tsv"
    with open(out, "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"{len(NAMES)} streams, {len(rows)} mutants: "
          f"{n_ok} decode, {n_fail} refuse -> {out} "
          f"({os.path.getsize(out)} bytes)")


if __name__ == "__main__":
    main()
