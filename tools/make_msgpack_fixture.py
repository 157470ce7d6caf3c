#!/usr/bin/env python3
"""Independent MessagePack fixture writer — a direct transcription of the
public msgpack spec's format-byte table (msgpack-python is not in this
container, so this is the sibling-encoder pattern used for avro/tar:
written from the spec, NOT ported from the Scala codec). Emits canonical
smallest encodings, which is also what msgpack-python produces.

Fixtures:
  - msgpack_basic.msgpack    one record exercising every modeled form
                             (fixint boundaries, int8-64/uint8-64,
                             float64, fixstr/str8/str16, fixarray,
                             array16, fixmap, map16, nil, bools,
                             multi-byte UTF-8)
  - msgpack_stream.msgpack   3 records back to back (shard layout)
  - msgpack_expected.json    the same values as JSON for the spec

Run from repo root: python3 tools/make_msgpack_fixture.py
"""
import json, os, struct

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")


def enc(v):
    if v is None:
        return b"\xc0"
    if v is True:
        return b"\xc3"
    if v is False:
        return b"\xc2"
    if isinstance(v, int):
        if v >= 0:
            if v < 0x80:
                return bytes([v])
            if v < 0x100:
                return b"\xcc" + bytes([v])
            if v < 0x10000:
                return b"\xcd" + struct.pack(">H", v)
            if v < 0x100000000:
                return b"\xce" + struct.pack(">I", v)
            return b"\xcf" + struct.pack(">Q", v)
        if v >= -32:
            return struct.pack("b", v)
        if v >= -128:
            return b"\xd0" + struct.pack(">b", v)
        if v >= -32768:
            return b"\xd1" + struct.pack(">h", v)
        if v >= -(2 ** 31):
            return b"\xd2" + struct.pack(">i", v)
        return b"\xd3" + struct.pack(">q", v)
    if isinstance(v, float):
        return b"\xcb" + struct.pack(">d", v)
    if isinstance(v, str):
        b = v.encode("utf-8")
        if len(b) < 32:
            return bytes([0xA0 | len(b)]) + b
        if len(b) < 0x100:
            return b"\xd9" + bytes([len(b)]) + b
        if len(b) < 0x10000:
            return b"\xda" + struct.pack(">H", len(b)) + b
        return b"\xdb" + struct.pack(">I", len(b)) + b
    if isinstance(v, list):
        if len(v) < 16:
            head = bytes([0x90 | len(v)])
        elif len(v) < 0x10000:
            head = b"\xdc" + struct.pack(">H", len(v))
        else:
            head = b"\xdd" + struct.pack(">I", len(v))
        return head + b"".join(enc(x) for x in v)
    if isinstance(v, dict):
        if len(v) < 16:
            head = bytes([0x80 | len(v)])
        elif len(v) < 0x10000:
            head = b"\xde" + struct.pack(">H", len(v))
        else:
            head = b"\xdf" + struct.pack(">I", len(v))
        return head + b"".join(enc(k) + enc(x) for k, x in v.items())
    raise TypeError(type(v))


def main():
    os.makedirs(OUT, exist_ok=True)

    basic = {
        "fix0": 0, "fix127": 127, "u8": 200, "u16": 40000,
        "u32": 3000000000, "u64": 2 ** 62, "nfix": -32, "i8": -100,
        "i16": -30000, "i32": -2000000000, "i64": -(2 ** 62),
        "f": -1.5, "big": 2.0 ** 53, "pi": 3.141592653589793,
        "s_fix": "short", "s_utf8": "héllo γδ",
        "s8": "x" * 40, "s16": "y" * 300,
        "nil": None, "yes": True, "no": False,
        "arr": [1, "two", None, [3.5, False]],
        "arr16": list(range(20)),
        "map16": {f"k{i}": i for i in range(20)},
    }
    with open(os.path.join(OUT, "msgpack_basic.msgpack"), "wb") as f:
        f.write(enc(basic))

    stream = [
        {"id": 1, "lang": "en", "text": "alpha beta"},
        {"id": 2, "lang": "de", "text": ""},
        {"id": 3, "lang": "fr", "text": "gamma"},
    ]
    with open(os.path.join(OUT, "msgpack_stream.msgpack"), "wb") as f:
        for r in stream:
            f.write(enc(r))

    with open(os.path.join(OUT, "msgpack_expected.json"), "w") as f:
        json.dump({"basic": basic, "stream": stream}, f, indent=1)
    print("msgpack fixtures written to", OUT)


if __name__ == "__main__":
    main()
