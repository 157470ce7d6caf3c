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

    # a quantized tensor file the reader must still refuse `unsupported`
    # (Q8_0/Q4_0/Q4_K/Q6_K are now decoded, so the refusal pin uses
    # IQ2_XXS, type 16 — no published stable layout here)
    q = gguf([("general.alignment", 4, 32)],
             [("q.weight", [256], 16, b"\x00" * 66)])  # IQ2_XXS
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

    # Q4_K (type 12): 2 super-blocks of 256. Independent packing of the
    # public block_q4_K layout: f16 d + f16 dmin + 12 bytes of packed
    # 6-bit sub-scales/mins (get_scale_min_k4 inverse) + 128 nibble
    # bytes (per 64-chunk: element l low nibble, l+32 high). Dequant
    # x = d*sc*q - dmin*m, all dyadic-exact choices.
    q4k_d = [0.25, -0.125]
    q4k_dmin = [1.5, 0.5]
    q4k_sc = [(11 * j + 3) % 64 for j in range(16)]   # 8 per block
    q4k_mn = [(7 * j + 5) % 64 for j in range(16)]
    q4k_q = [(3 * i + 1) % 16 for i in range(512)]
    def pack_scales_k4(sc, mn):
        b = bytearray(12)
        for j in range(4):
            b[j] = (sc[j] & 63) | (((sc[j + 4] >> 4) & 3) << 6)
            b[j + 4] = (mn[j] & 63) | (((mn[j + 4] >> 4) & 3) << 6)
            b[j + 8] = (sc[j + 4] & 0x0F) | ((mn[j + 4] & 0x0F) << 4)
        return bytes(b)
    q4k_payload = b""
    for b in range(2):
        q4k_payload += struct.pack("<e", q4k_d[b])
        q4k_payload += struct.pack("<e", q4k_dmin[b])
        q4k_payload += pack_scales_k4(q4k_sc[b*8:(b+1)*8], q4k_mn[b*8:(b+1)*8])
        for c in range(4):
            base = b * 256 + c * 64
            q4k_payload += bytes((q4k_q[base + l] & 0xF) |
                                 ((q4k_q[base + 32 + l] & 0xF) << 4)
                                 for l in range(32))
    assert len(q4k_payload) == 288
    q4k = gguf([("general.alignment", 4, 32)],
               [("q4k.weight", [256, 2], 12, q4k_payload)])
    with open(os.path.join(OUT, "gguf_q4k.gguf"), "wb") as f:
        f.write(q4k)
    q4k_vals = [q4k_d[i // 256] * q4k_sc[i // 32] * q4k_q[i] -
                q4k_dmin[i // 256] * q4k_mn[i // 32] for i in range(512)]

    # Q5_K (type 13): 2 super-blocks. block_q5_K layout: f16 d + f16
    # dmin + 12 packed scale bytes (same field as Q4_K) + 32 qh bytes
    # (fifth quant bit at bit pair 2c / 2c+1 of qh[l] for chunk c's
    # low / high nibble element) + 128 nibble bytes. Dequant
    # x = d*sc*(q_lo + 16*hbit) - dmin*m.
    q5k_d = [0.25, -0.125]
    q5k_dmin = [0.5, 1.5]
    q5k_sc = [(13 * j + 2) % 64 for j in range(16)]
    q5k_mn = [(9 * j + 1) % 64 for j in range(16)]
    q5k_q = [(11 * i + 3) % 32 for i in range(512)]
    q5k_payload = b""
    for b in range(2):
        q5k_payload += struct.pack("<e", q5k_d[b])
        q5k_payload += struct.pack("<e", q5k_dmin[b])
        q5k_payload += pack_scales_k4(q5k_sc[b*8:(b+1)*8], q5k_mn[b*8:(b+1)*8])
        qh = bytearray(32)
        for l in range(32):
            for c in range(4):
                base = b * 256 + c * 64
                qh[l] |= ((q5k_q[base + l] >> 4) & 1) << (2 * c)
                qh[l] |= ((q5k_q[base + 32 + l] >> 4) & 1) << (2 * c + 1)
        q5k_payload += bytes(qh)
        for c in range(4):
            base = b * 256 + c * 64
            q5k_payload += bytes((q5k_q[base + l] & 0xF) |
                                 ((q5k_q[base + 32 + l] & 0xF) << 4)
                                 for l in range(32))
    assert len(q5k_payload) == 352
    q5k = gguf([("general.alignment", 4, 32)],
               [("q5k.weight", [256, 2], 13, q5k_payload)])
    with open(os.path.join(OUT, "gguf_q5k.gguf"), "wb") as f:
        f.write(q5k)
    q5k_vals = [q5k_d[i // 256] * q5k_sc[i // 32] * q5k_q[i] -
                q5k_dmin[i // 256] * q5k_mn[i // 32] for i in range(512)]

    # Q6_K (type 14): 2 super-blocks. block_q6_K layout: 128 ql + 64 qh
    # + 16 int8 sub-scales + f16 d; per 128-half, elements l/l+32/l+64/
    # l+96 carry their two high bits at qh[l] bit pairs 0/2/4/6 and low
    # nibbles at ql[l] / ql[l+32] (low then high nibble). Dequant
    # x = d * sc[e/16] * (code - 32).
    q6k_d = [0.25, -0.5]
    q6k_sc = [((5 * j + 2) % 256) - 128 for j in range(32)]  # 16 per blk
    q6k_code = [(7 * i + 4) % 64 for i in range(512)]
    q6k_payload = b""
    for b in range(2):
        ql = bytearray(128)
        qh = bytearray(64)
        for half in range(2):
            base = b * 256 + half * 128
            for l in range(32):
                c1, c2 = q6k_code[base + l], q6k_code[base + 32 + l]
                c3, c4 = q6k_code[base + 64 + l], q6k_code[base + 96 + l]
                ql[half * 64 + l] = (c1 & 0xF) | ((c3 & 0xF) << 4)
                ql[half * 64 + 32 + l] = (c2 & 0xF) | ((c4 & 0xF) << 4)
                qh[half * 32 + l] = ((c1 >> 4) | ((c2 >> 4) << 2) |
                                     ((c3 >> 4) << 4) | ((c4 >> 4) << 6))
        q6k_payload += bytes(ql) + bytes(qh)
        q6k_payload += struct.pack("<16b", *q6k_sc[b*16:(b+1)*16])
        q6k_payload += struct.pack("<e", q6k_d[b])
    assert len(q6k_payload) == 420
    q6k = gguf([("general.alignment", 4, 32)],
               [("q6k.weight", [256, 2], 14, q6k_payload)])
    with open(os.path.join(OUT, "gguf_q6k.gguf"), "wb") as f:
        f.write(q6k)
    q6k_vals = [q6k_d[i // 256] * q6k_sc[i // 16] * (q6k_code[i] - 32)
                for i in range(512)]

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
        "q4k_vals": q4k_vals,
        "q5k_vals": q5k_vals,
        "q6k_vals": q6k_vals,
    }
    with open(os.path.join(OUT, "gguf_expected.json"), "w") as f:
        json.dump(expected, f, indent=1)
    print("gguf fixtures written")


if __name__ == "__main__":
    main()
