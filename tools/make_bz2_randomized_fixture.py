#!/usr/bin/env python3
"""Synthesize a VALID `randomized` bzip2 stream (the deprecated
bzip2 < 0.9.0 block form) and pin libbz2's decode of it as a fixture.

No modern encoder emits the bit, so the fixture is built by surgery on a
normal single-block stream of an incompressible payload (post-BWT length
far past BZ2_rNums[0]=619, so derandomization actually flips bytes):

  1. flip the `randomized` bit (MSB of byte 14 — the first block header
     is byte-aligned after the 4-byte stream header: 6B magic + 4B CRC);
  2. stream-decode through libbz2 ctypes, COLLECTING output despite the
     final BZ_DATA_ERROR (output is emitted before the CRC verdict) —
     that output IS the derandomized payload libbz2 computes;
  3. recompute the block CRC (bzip2's MSB-first CRC-32) over that
     payload and patch it (bytes 10..13, byte-aligned for block 1);
  4. recompute the stream's combined CRC (= block CRC for one block) and
     patch it: it sits 48 bits after the end-of-stream magic, located by
     bit-scanning for 0x177245385090;
  5. verify libbz2 now decodes the patched stream CLEANLY to the same
     bytes, and write fixture + expected sha256.

Run from repo root: python3 tools/make_bz2_randomized_fixture.py
"""
import bz2
import ctypes
import hashlib
import json
import os

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")


def incompressible(n):
    x = 0x2468ACE1
    out = bytearray()
    while len(out) < n:
        x ^= (x << 13) & 0xFFFFFFFF
        x ^= x >> 17
        x ^= (x << 5) & 0xFFFFFFFF
        out.append(x & 0xFF)
    return bytes(out)


def bz_crc32(data):
    # bzip2's CRC: poly 0x04C11DB7, MSB-first, init/xorout 0xFFFFFFFF
    crc = 0xFFFFFFFF
    for b in data:
        crc ^= b << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if crc & 0x80000000 \
                else (crc << 1) & 0xFFFFFFFF
    return crc ^ 0xFFFFFFFF


def decode_collect(data):
    """libbz2 streaming decode; returns (output, clean) where clean means
    BZ_STREAM_END with no error."""
    lib = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libbz2.so.1.0")

    class BzStream(ctypes.Structure):
        _fields_ = [("next_in", ctypes.c_char_p), ("avail_in", ctypes.c_uint),
                    ("total_in_lo32", ctypes.c_uint), ("total_in_hi32", ctypes.c_uint),
                    ("next_out", ctypes.c_void_p), ("avail_out", ctypes.c_uint),
                    ("total_out_lo32", ctypes.c_uint), ("total_out_hi32", ctypes.c_uint),
                    ("state", ctypes.c_void_p),
                    ("bzalloc", ctypes.c_void_p), ("bzfree", ctypes.c_void_p),
                    ("opaque", ctypes.c_void_p)]

    s = BzStream()
    assert lib.BZ2_bzDecompressInit(ctypes.byref(s), 0, 0) == 0
    s.next_in = data
    s.avail_in = len(data)
    out = bytearray()
    clean = False
    try:
        while True:
            buf = ctypes.create_string_buffer(1 << 16)
            s.next_out = ctypes.cast(buf, ctypes.c_void_p)
            s.avail_out = len(buf)
            r = lib.BZ2_bzDecompress(ctypes.byref(s))
            out += buf.raw[:len(buf) - s.avail_out]
            if r == 4:  # BZ_STREAM_END
                clean = True
                break
            if r != 0:  # BZ_OK
                break
            if s.avail_in == 0 and len(buf) == s.avail_out:
                break
    finally:
        lib.BZ2_bzDecompressEnd(ctypes.byref(s))
    return bytes(out), clean


def find_bits(data, pattern, nbits):
    """bit offset (MSB-first) of `pattern` (int of nbits) in data."""
    total = len(data) * 8
    for off in range(total - nbits + 1):
        v = 0
        for k in range(nbits):
            byte = data[(off + k) // 8]
            bit = (byte >> (7 - (off + k) % 8)) & 1
            v = (v << 1) | bit
        if v == pattern:
            yield off


def set_bits(data, off, value, nbits):
    for k in range(nbits):
        bit = (value >> (nbits - 1 - k)) & 1
        i = (off + k) // 8
        sh = 7 - (off + k) % 8
        data[i] = (data[i] & ~(1 << sh)) | (bit << sh)


def main():
    payload = incompressible(4096) + b" tail text " * 40
    base = bz2.compress(payload, 9)
    m = bytearray(base)
    assert m[:3] == b"BZh"
    m[14] ^= 0x80  # the randomized bit (block 1 header is byte-aligned)

    derand, clean = decode_collect(bytes(m))
    assert not clean and len(derand) == len(payload)
    assert derand != payload, "derandomization must actually flip bytes"
    blk_crc = bz_crc32(derand)
    # patch block CRC (bytes 10..13) and the combined CRC after the
    # 48-bit end magic (single block: combined == block CRC)
    m[10:14] = blk_crc.to_bytes(4, "big")
    ends = list(find_bits(m, 0x177245385090, 48))
    assert ends, "end magic not found"
    set_bits(m, ends[-1] + 48, blk_crc, 32)

    out2, clean2 = decode_collect(bytes(m))
    assert clean2 and out2 == derand, "libbz2 must decode the patched stream"

    with open(os.path.join(OUT, "bzip2_randomized.bz2"), "wb") as f:
        f.write(m)
    with open(os.path.join(OUT, "bzip2_randomized_expected.json"), "w") as f:
        json.dump({"len": len(derand),
                   "sha256": hashlib.sha256(derand).hexdigest(),
                   "differs_from_plain": True}, f, indent=1)
    print(f"randomized fixture: {len(m)}B stream -> {len(derand)}B payload, "
          f"sha256 {hashlib.sha256(derand).hexdigest()[:16]}…")


if __name__ == "__main__":
    main()
