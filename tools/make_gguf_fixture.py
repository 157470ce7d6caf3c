#!/usr/bin/env python3
"""GGUF v3 fixtures — an independent python transcription of the public
spec (ggml docs/gguf.md) pinning graft.ops.Gguf: every metadata value
type, F32 and F16 tensors, non-default alignment, and expected values as
JSON. The Scala reader must recover metadata and tensor contents exactly.

Run from repo root: python3 tools/make_gguf_fixture.py
"""
import json
import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")


def f16_bits(x: float) -> int:
    # struct supports binary16 ('e') since py3.6
    return struct.unpack("<H", struct.pack("<e", x))[0]


def gguf(metadata, tensors, alignment=32):
    """metadata: list of (key, type_id, value); tensors: (name, dims,
    type_id, payload_bytes)."""
    out = bytearray(b"GGUF")
    out += struct.pack("<I", 3)
    out += struct.pack("<Q", len(tensors))
    out += struct.pack("<Q", len(metadata))

    def s(v):
        b = v.encode("utf-8")
        return struct.pack("<Q", len(b)) + b

    def scalar(t, v):
        return {0: lambda: struct.pack("<B", v),
                1: lambda: struct.pack("<b", v),
                2: lambda: struct.pack("<H", v),
                3: lambda: struct.pack("<h", v),
                4: lambda: struct.pack("<I", v),
                5: lambda: struct.pack("<i", v),
                6: lambda: struct.pack("<f", v),
                7: lambda: struct.pack("<B", 1 if v else 0),
                8: lambda: s(v),
                10: lambda: struct.pack("<Q", v),
                11: lambda: struct.pack("<q", v),
                12: lambda: struct.pack("<d", v)}[t]()

    for key, t, v in metadata:
        out += s(key)
        out += struct.pack("<I", t)
        if t == 9:
            et, items = v
            out += struct.pack("<I", et) + struct.pack("<Q", len(items))
            for it in items:
                out += scalar(et, it)
        else:
            out += scalar(t, v)

    off = 0
    for name, dims, t, payload in tensors:
        out += s(name)
        out += struct.pack("<I", len(dims))
        for d in dims:
            out += struct.pack("<Q", d)
        out += struct.pack("<I", t)
        out += struct.pack("<Q", off)
        padded = (len(payload) + alignment - 1) // alignment * alignment
        off += padded
    while len(out) % alignment:
        out += b"\x00"
    for _, _, _, payload in tensors:
        out += payload
        while len(out) % alignment:
            out += b"\x00"
    return bytes(out)


def main():
    os.makedirs(OUT, exist_ok=True)
    f32 = [1.5, -2.25, 0.0, 3.14159265, 1e-20, -65504.0]
    f16 = [0.5, -1.0, 2.0, 0.099976]  # exactly representable-ish halves
    f16b = [f16_bits(x) for x in f16]
    meta = [
        ("general.alignment", 4, 64),
        ("general.name", 8, "graft fixture"),
        ("general.file_type", 4, 0),
        ("m.u8", 0, 200), ("m.i8", 1, -7), ("m.u16", 2, 60000),
        ("m.i16", 3, -12345), ("m.u32", 4, 4000000000),
        ("m.i32", 5, -2000000000), ("m.f32", 6, 0.25),
        ("m.bool", 7, True), ("m.u64", 10, 2**40), ("m.i64", 11, -(2**40)),
        ("m.f64", 12, 2.718281828),
        ("m.strs", 9, (8, ["alpha", "beta"])),
        ("m.ints", 9, (11, [1, -2, 3])),
    ]
    tensors = [
        ("emb.weight", [2, 3], 0, b"".join(struct.pack("<f", x) for x in f32)),
        ("half.bias", [4], 1, b"".join(struct.pack("<H", h) for h in f16b)),
    ]
    data = gguf(meta, tensors, alignment=64)
    with open(os.path.join(OUT, "gguf_v3_full.gguf"), "wb") as f:
        f.write(data)

    # a k-quant tensor file the reader must still refuse `unsupported`
    # (Q8_0 is now decoded, so the refusal pin uses Q4_K, type 12)
    q = gguf([("general.alignment", 4, 32)],
             [("q.weight", [256], 12, b"\x00" * 144)])  # Q4_K
    with open(os.path.join(OUT, "gguf_quantized.gguf"), "wb") as f:
        f.write(q)

    # a Q8_0 file built by this independent transcription: 2 rows x 32
    # elements, per-block f16 scale + 32 int8 quants (34-byte blocks).
    # Expected dequant d*q recorded as exact f64 (dyadic scales).
    q8_scales = [0.5, -0.25]
    q8_quants = [((7 * i + 3) % 255) - 127 for i in range(64)]
    q8_payload = b"".join(
        struct.pack("<e", q8_scales[b]) +
        struct.pack("<32b", *q8_quants[b * 32:(b + 1) * 32])
        for b in range(2))
    q8 = gguf([("general.alignment", 4, 32)],
              [("q8.weight", [32, 2], 8, q8_payload)])
    with open(os.path.join(OUT, "gguf_q8.gguf"), "wb") as f:
        f.write(q8)

    # a Q4_0 file (type 2): 2 rows x 32 elements, per-block f16 scale +
    # 16 nibble-packed bytes (element j low nibble, element j+16 high);
    # dequant x = d * (q - 8)
    q4_scales = [0.25, -0.5]
    q4_quants = [(5 * i + 2) % 16 for i in range(64)]
    q4_payload = b"".join(
        struct.pack("<e", q4_scales[b]) +
        bytes((q4_quants[b * 32 + j] & 0xF) |
              ((q4_quants[b * 32 + 16 + j] & 0xF) << 4) for j in range(16))
        for b in range(2))
    q4 = gguf([("general.alignment", 4, 32)],
              [("q4.weight", [32, 2], 2, q4_payload)])
    with open(os.path.join(OUT, "gguf_q4.gguf"), "wb") as f:
        f.write(q4)

    # expected values (f32 exact via bit pattern, f16 dequantized)
    expected = {
        "alignment": 64,
        "meta": {"general.name": "graft fixture", "m.u8": 200, "m.i8": -7,
                 "m.u16": 60000, "m.i16": -12345, "m.u32": 4000000000,
                 "m.i32": -2000000000, "m.f32": 0.25, "m.bool": True,
                 "m.u64": 2**40, "m.i64": -(2**40), "m.f64": 2.718281828,
                 "m.strs": ["alpha", "beta"], "m.ints": [1, -2, 3]},
        "emb_bits": [struct.unpack("<I", struct.pack("<f", x))[0] for x in f32],
        "emb_dims": [2, 3],
        "half_bits": f16b,
        "half_vals": [struct.unpack("<e", struct.pack("<H", h))[0] for h in f16b],
        "q8_vals": [q8_scales[i // 32] * q8_quants[i] for i in range(64)],
        "q4_vals": [q4_scales[i // 32] * (q4_quants[i] - 8) for i in range(64)],
    }
    with open(os.path.join(OUT, "gguf_expected.json"), "w") as f:
        json.dump(expected, f, indent=1)
    print("gguf fixtures written")


if __name__ == "__main__":
    main()
