#!/usr/bin/env python3
"""Independent Avro object-container fixture writer (Apache Avro 1.11
spec, written against the public "Object Container Files" + "Binary
Encoding" sections — NOT a port of the Scala codec): zigzag varints,
length-prefixed UTF-8 strings/bytes, little-endian IEEE doubles/floats,
Obj\\x01 magic, metadata map, sync-framed blocks, null + raw-deflate
codecs. A negative-count metadata block (the spec's size-prefixed map
variant that writers rarely emit) is exercised in one fixture so the
reader's map grammar is pinned beyond what round-trips cover.

Run from repo root: python3 tools/make_avro_fixture.py
"""
import json, os, struct, zlib

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")


def zigzag(v: int) -> bytes:
    z = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    z &= (1 << 64) - 1
    out = bytearray()
    while z & ~0x7F:
        out.append((z & 0x7F) | 0x80)
        z >>= 7
    out.append(z)
    return bytes(out)


def avro_str(s: str) -> bytes:
    b = s.encode("utf-8")
    return zigzag(len(b)) + b


def avro_bytes(b: bytes) -> bytes:
    return zigzag(len(b)) + b


def encode_value(t, v):
    if isinstance(t, list):  # ["null", T] nullable union
        if v is None:
            return zigzag(0)
        return zigzag(1) + encode_value(t[1], v)
    if t in ("long", "int"):
        return zigzag(v)
    if t == "string":
        return avro_str(v)
    if t == "bytes":
        return avro_bytes(v)
    if t == "boolean":
        return b"\x01" if v else b"\x00"
    if t == "double":
        return struct.pack("<d", v)
    if t == "float":
        return struct.pack("<f", v)
    raise ValueError(t)


def container(schema: dict, rows, codec="null", block=3, sync=None,
              neg_meta=False):
    sjson = json.dumps(schema, separators=(",", ":"))
    if sync is None:
        sync = bytes(range(16))
    out = bytearray(b"Obj\x01")
    meta = avro_str("avro.schema") + avro_bytes(sjson.encode())
    meta += avro_str("avro.codec") + avro_bytes(codec.encode())
    if neg_meta:
        # negative count: -2 entries, then the byte size of the entries
        out += zigzag(-2) + zigzag(len(meta)) + meta + zigzag(0)
    else:
        out += zigzag(2) + meta + zigzag(0)
    out += sync
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    for i in range(0, len(rows), block):
        grp = rows[i:i + block]
        body = b"".join(encode_value(t, r[j]) for r in grp
                        for j, (_, t) in enumerate(fields))
        data = zlib.compress(body, 6)[2:-4] if codec == "deflate" else body
        out += zigzag(len(grp)) + zigzag(len(data)) + data + sync
    return bytes(out)


DOC_SCHEMA = {
    "type": "record", "name": "doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "lang", "type": "string"},
        {"name": "text", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "keep", "type": "boolean"},
        {"name": "tag", "type": "bytes"},
        {"name": "rank", "type": "int"},
    ],
}


def doc_rows(n):
    rows = []
    for i in range(n):
        rows.append((
            i * 7 - 3,                                # negative + positive longs
            ["en", "de", "fr"][i % 3],
            f"doc-{i} body é中" * (1 + i % 4),  # multi-byte UTF-8
            i * 0.125 - 1.5,                          # exact binary fractions
            i % 2 == 0,
            bytes([i % 256, 255 - i % 256, 0x80]),
            -i if i % 2 else i,
        ))
    return rows


def main():
    rows = doc_rows(10)
    cases = {
        "avro_null.avro": container(DOC_SCHEMA, rows, "null", block=3),
        "avro_deflate.avro": container(DOC_SCHEMA, rows, "deflate", block=4),
        "avro_negmeta.avro": container(DOC_SCHEMA, rows, "null", block=10,
                                       neg_meta=True),
        # single-field record, one record per block, empty tail block legal
        "avro_minimal.avro": container(
            {"type": "record", "name": "k",
             "fields": [{"name": "v", "type": "long"}]},
            [(x,) for x in (0, -1, 1, 63, -64, 64, 2 ** 40, -(2 ** 40))],
            "null", block=1),
        # nullable-union fields (the ubiquitous optional-column form)
        "avro_optional.avro": container(
            {"type": "record", "name": "o",
             "fields": [{"name": "id", "type": "long"},
                        {"name": "note", "type": ["null", "string"]},
                        {"name": "w", "type": ["null", "double"]}]},
            [(i,
              None if i % 3 == 0 else f"note-{i}",
              None if i % 2 == 0 else i * 0.25)
             for i in range(9)],
            "deflate", block=4),
    }
    expected = {
        "rows": [[r[0], r[1], r[2], r[3], r[4], r[5].hex(), r[6]]
                 for r in rows],
        "minimal": [0, -1, 1, 63, -64, 64, 2 ** 40, -(2 ** 40)],
        "optional": [[i,
                      None if i % 3 == 0 else f"note-{i}",
                      None if i % 2 == 0 else i * 0.25]
                     for i in range(9)],
    }
    os.makedirs(OUT, exist_ok=True)
    for name, data in cases.items():
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(data)
        print(name, len(data))
    with open(os.path.join(OUT, "avro_expected.json"), "w") as f:
        json.dump(expected, f, indent=1)
    print("avro_expected.json")


if __name__ == "__main__":
    main()
