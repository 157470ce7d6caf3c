#!/usr/bin/env python3
"""Independent tf.Example fixture writer — a direct transcription of the
public protobuf wire format (varints, tags, length-delimited nesting,
packed repeated scalars) and the public feature.proto schema (the
protobuf/tensorflow libraries are not in this container, so this is the
sibling-encoder pattern used for avro/tar/msgpack).

Fixtures:
  - tfexample_basic.pb      canonical packed form: bytes/float/int64
                            features incl. negatives (10-byte varints),
                            multi-value lists, utf8 keys and bytes
  - tfexample_unpacked.pb   the same EXAMPLE with UNPACKED float/int64
                            lists (what old writers emit) + an unknown
                            field the reader must skip at every level
  - tfexample_expected.json the decoded values

Run from repo root: python3 tools/make_tfexample_fixture.py
"""
import json, os, struct

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")


def varint(v):
    v &= (1 << 64) - 1
    out = bytearray()
    while v & ~0x7F:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def tag(field, wire):
    return varint((field << 3) | wire)


def ld(field, payload):
    return tag(field, 2) + varint(len(payload)) + payload


def feature(kind, inner):
    return ld(kind, inner)


def bytes_list(vals):
    return feature(1, b"".join(ld(1, v) for v in vals))


def float_list_packed(vals):
    return feature(2, ld(1, b"".join(struct.pack("<f", v) for v in vals)))


def float_list_unpacked(vals):
    return feature(2, b"".join(tag(1, 5) + struct.pack("<f", v) for v in vals))


def int64_list_packed(vals):
    return feature(3, ld(1, b"".join(varint(v) for v in vals)))


def int64_list_unpacked(vals):
    return feature(3, b"".join(tag(1, 0) + varint(v) for v in vals))


def example(entries, junk=b""):
    feats = b"".join(
        ld(1, ld(1, k.encode()) + ld(2, f) + junk) for k, f in entries)
    return ld(1, feats + junk) + junk


def main():
    os.makedirs(OUT, exist_ok=True)
    floats = [1.5, -0.25, 3.14159265358979, 0.0]
    ints = [0, 1, -1, 2**62, -(2**62), 127, 128]
    entries_packed = [
        ("text", bytes_list([b"hello world", "γδ".encode(), b""])),
        ("score", float_list_packed(floats)),
        ("ids", int64_list_packed(ints)),
    ]
    with open(os.path.join(OUT, "tfexample_basic.pb"), "wb") as f:
        f.write(example(entries_packed))

    # unknown field 99 (varint) spliced at every nesting level
    junk = tag(99, 0) + varint(42)
    entries_unpacked = [
        ("text", bytes_list([b"hello world", "γδ".encode(), b""])),
        ("score", float_list_unpacked(floats)),
        ("ids", int64_list_unpacked(ints)),
    ]
    with open(os.path.join(OUT, "tfexample_unpacked.pb"), "wb") as f:
        f.write(example(entries_unpacked, junk=junk))

    exp = {
        "text": ["hello world", "γδ", ""],
        "score_bits": [struct.unpack("<I", struct.pack("<f", v))[0]
                       for v in floats],
        "ids": ints,
        "basic_hex": open(os.path.join(OUT, "tfexample_basic.pb"), "rb")
                     .read().hex(),
    }
    with open(os.path.join(OUT, "tfexample_expected.json"), "w") as f:
        json.dump(exp, f, indent=1)
    print("tf.Example fixtures written to", OUT)


if __name__ == "__main__":
    main()
