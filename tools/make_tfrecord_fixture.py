#!/usr/bin/env python3
"""Independent TFRecord fixture writer (framing from the public TFRecord
docs — NOT a port of the Scala codec): uint64-LE length, masked
CRC32-Castagnoli over the length bytes, payload, masked CRC32C over the
payload. The CRC32C below is the table-driven software implementation of
the Castagnoli polynomial (reflected 0x82F63B78), so no library is
shared with the JVM side.

Run from repo root: python3 tools/make_tfrecord_fixture.py
"""
import json, os, struct

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")

_TABLE = []
for n in range(256):
    c = n
    for _ in range(8):
        c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
    _TABLE.append(c)


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def masked(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def record(payload: bytes) -> bytes:
    length = struct.pack("<Q", len(payload))
    return (length + struct.pack("<I", masked(length)) +
            payload + struct.pack("<I", masked(payload)))


def main():
    payloads = [
        b"",                                      # empty record is legal
        b"a",
        json.dumps({"id": 7, "text": "doc body7"}).encode(),
        bytes(range(256)) * 5,                    # binary payload
        ("x" * 70000).encode(),                   # multi-64KB record
    ]
    shard = b"".join(record(p) for p in payloads)
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "shard.tfrecord"), "wb") as f:
        f.write(shard)
    with open(os.path.join(OUT, "tfrecord_expected.json"), "w") as f:
        json.dump({"lengths": [len(p) for p in payloads],
                   "crcs": [crc32c(p) for p in payloads]}, f)
    print("shard.tfrecord", len(shard))


if __name__ == "__main__":
    main()
