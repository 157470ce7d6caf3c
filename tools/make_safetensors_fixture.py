#!/usr/bin/env python3
"""Independent safetensors fixture writer — transcribed from the public
format description (the safetensors library is not in this container, so
this is the sibling-encoder pattern: u64 LE header length, JSON header
of {name: {dtype, shape, data_offsets}} (+ __metadata__), then the raw
LE buffer; numpy supplies the reference byte layouts for every dtype).

Fixtures:
  - st_basic.safetensors    F32 [2,3] + I64 [4] + __metadata__
  - st_exotic.safetensors   F64 extremes + I32 negatives + 0-d scalar +
                            zero-size tensor
  - st_expected.json        values and metadata

Run from repo root: python3 tools/make_safetensors_fixture.py
"""
import json, os, struct
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")


def write_st(path, tensors, metadata=None):
    header = {}
    if metadata:
        header["__metadata__"] = metadata
    off = 0
    bufs = []
    for name, arr in tensors:
        dt = {"float32": "F32", "float64": "F64", "float16": "F16",
              "int32": "I32", "int64": "I64"}[str(arr.dtype)]
        b = arr.tobytes()  # C-order little-endian on this platform
        header[name] = {"dtype": dt, "shape": list(arr.shape),
                        "data_offsets": [off, off + len(b)]}
        off += len(b)
        bufs.append(b)
    hj = json.dumps(header, separators=(",", ":")).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hj)))
        f.write(hj)
        for b in bufs:
            f.write(b)


def main():
    os.makedirs(OUT, exist_ok=True)
    exp = {}

    f32 = (np.arange(6, dtype=np.float32).reshape(2, 3) - 2.5)
    i64 = np.array([1, -1, 2**62, -(2**62)], dtype=np.int64)
    write_st(os.path.join(OUT, "st_basic.safetensors"),
             [("emb", f32), ("ids", i64)],
             metadata={"source": "graft-fixture", "note": "héllo"})
    exp["st_basic"] = {
        "emb": {"shape": [2, 3], "values": [float(x) for x in f32.ravel()]},
        "ids": [int(x) for x in i64],
        "metadata": {"source": "graft-fixture", "note": "héllo"},
    }

    f64 = np.array([0.5, -1e300, 2.0**53, -0.0])
    i32 = np.array([-2**31, 2**31 - 1, 0], dtype=np.int32)
    scalar = np.float32(42.5).reshape(())
    empty = np.zeros((0, 8), dtype=np.float32)
    write_st(os.path.join(OUT, "st_exotic.safetensors"),
             [("f64", f64), ("i32", i32), ("scalar", np.asarray(scalar)),
              ("empty", empty)])
    exp["st_exotic"] = {
        "f64": [float(x) for x in f64],
        "i32": [int(x) for x in i32],
        "scalar": 42.5,
        "empty_shape": [0, 8],
    }

    # F16: numpy is the conversion reference — tricky f32 inputs and the
    # bit patterns astype(float16) (RN-even) produces for them, plus a
    # fixture file whose F16 payload the Scala reader must dequantize
    # bit-exactly.
    tricky = np.array([
        0.0, -0.0, 1.0, -2.5, 65504.0, 65519.9, 65520.0, -65520.0,
        6.103515625e-05,            # smallest normal half
        5.960464477539063e-08,      # smallest subnormal half
        2.980232238769531e-08,      # half of it: tie -> even -> 0
        8.940696716308594e-08,      # 1.5 subnormal units: tie -> even -> 2
        6.097555160522461e-05,      # just below smallest normal
        1.0009765625, 1.00048828125,  # 1 + ulp, 1 + ulp/2 (tie -> even)
        1.0014648438,               # between: rounds up
        3.14159265, -0.33333333, 1e-7, -1e-7, 1234.5678,
    ], dtype=np.float32)
    h = tricky.astype(np.float16)
    exp["f16_conv"] = {
        "f32_bits": [int(x) for x in tricky.view(np.uint32)],
        "f16_bits": [int(x) for x in h.view(np.uint16)],
        "back_f32_bits": [int(x) for x in h.astype(np.float32).view(np.uint32)],
    }
    write_st(os.path.join(OUT, "st_half.safetensors"),
             [("h", h), ("ids", np.array([1, 2], dtype=np.int64))])
    exp["st_half"] = {"h_bits": [int(x) for x in h.view(np.uint16)]}

    with open(os.path.join(OUT, "st_expected.json"), "w") as f:
        json.dump(exp, f, indent=1)
    print("safetensors fixtures written to", OUT)


if __name__ == "__main__":
    main()
