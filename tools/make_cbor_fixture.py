#!/usr/bin/env python3
"""Independent CBOR fixture writer — a direct transcription of RFC 8949's
major-type / additional-info table (cbor2 is not in this container, so
this is the sibling-encoder pattern used for msgpack/avro: written from
the spec, NOT ported from the Scala codec). Emits preferred serialization
(shortest argument forms, definite lengths, binary64 floats), which is
also what canonical CBOR encoders produce.

Fixtures:
  - cbor_basic.cbor     one record exercising every modeled form
                        (argument-width boundaries 23/24/255/256/65535/
                        65536/2^32, negatives at the same boundaries,
                        float64, short/long text incl. multi-byte UTF-8,
                        nested arrays/maps, null, bools)
  - cbor_stream.cbor    3 records back to back (CBOR sequence shard layout)
  - cbor_tagged.cbor    a record wrapped in tags (epoch datetime tag 1,
                        an arbitrary high tag) — decoders may skip tags
  - cbor_expected.json  the same values as JSON for the spec

Run from repo root: python3 tools/make_cbor_fixture.py
"""
import json, os, struct

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")


def head(major, arg):
    m = major << 5
    if arg < 24:
        return bytes([m | arg])
    if arg < 0x100:
        return bytes([m | 24, arg])
    if arg < 0x10000:
        return bytes([m | 25]) + struct.pack(">H", arg)
    if arg < 0x100000000:
        return bytes([m | 26]) + struct.pack(">I", arg)
    return bytes([m | 27]) + struct.pack(">Q", arg)


def enc(v, tag=None):
    out = b""
    if tag is not None:
        out += head(6, tag)
    if v is None:
        return out + b"\xf6"
    if v is True:
        return out + b"\xf5"
    if v is False:
        return out + b"\xf4"
    if isinstance(v, int):
        if v >= 0:
            return out + head(0, v)
        return out + head(1, -1 - v)
    if isinstance(v, float):
        return out + b"\xfb" + struct.pack(">d", v)
    if isinstance(v, str):
        b = v.encode("utf-8")
        return out + head(3, len(b)) + b
    if isinstance(v, list):
        return out + head(4, len(v)) + b"".join(enc(x) for x in v)
    if isinstance(v, dict):
        body = b""
        for k, x in v.items():
            kb = k.encode("utf-8")
            body += head(3, len(kb)) + kb + enc(x)
        return out + head(5, len(v)) + body
    raise TypeError(type(v))


basic = {
    "u_bounds": [0, 23, 24, 255, 256, 65535, 65536, 4294967295, 4294967296,
                 9223372036854775807],
    "n_bounds": [-1, -24, -25, -256, -257, -65536, -65537, -4294967296,
                 -4294967297, -9223372036854775808],
    "pi": 3.141592653589793,
    "neg_float": -0.5,
    "s_short": "hi",
    "s_long": "x" * 300,
    "s_utf8": "héllo wörld — ¡ünïcode! 漢字",
    "nested": {"a": [1, [2, [3, {"deep": True}]]], "b": None},
    "flags": [True, False, None],
}
with open(os.path.join(OUT, "cbor_basic.cbor"), "wb") as f:
    f.write(enc(basic))

recs = [{"id": i, "lang": ["en", "de", "fr"][i % 3], "text": f"cbor doc body {i}"}
        for i in range(3)]
with open(os.path.join(OUT, "cbor_stream.cbor"), "wb") as f:
    f.write(b"".join(enc(r) for r in recs))

# tags: epoch datetime (tag 1) on a number, a high tag on the record
tagged = head(6, 55799) + enc({"t": None, "when": None})[:0]  # build manually below
tagged = head(6, 55799)  # self-described CBOR tag wraps the record
inner = {"when": 1700000000, "note": "tagged"}
body = head(5, 2)
kb = b"when"; body += head(3, 4) + kb + head(6, 1) + head(0, 1700000000)
kb = b"note"; body += head(3, 4) + kb + enc("tagged")
with open(os.path.join(OUT, "cbor_tagged.cbor"), "wb") as f:
    f.write(tagged + body)

with open(os.path.join(OUT, "cbor_expected.json"), "w") as f:
    json.dump({"basic": basic, "stream": recs,
               "tagged": {"when": 1700000000, "note": "tagged"}}, f, indent=1,
              ensure_ascii=False)
print("cbor fixtures written")
