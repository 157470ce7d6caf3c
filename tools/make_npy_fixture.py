#!/usr/bin/env python3
"""NumPy .npy/.npz fixtures written by REAL numpy (np.save / np.savez —
the reference implementation of the format), so the Scala reader is
pinned against the actual producer, not a sibling reimplementation:

  - npy_f4.npy      2-D float32 (3, 5) C-order
  - npy_f8.npy      1-D float64 (7,)
  - npy_i8.npy      1-D int64 (6,)
  - npy_i4.npy      2-D int32 (2, 3)
  - npy_scalar.npy  0-d float64 ()
  - npy_fortran.npy 2-D float32 (3, 5) FORTRAN-order (reader must refuse)
  - npy_big.npy     1-D int64 (1000,) — header-length + bulk check
  - bundle.npz      np.savez (STORED) of ids:int64 + vecs:float32(4, 8)
  - bundle_c.npz    np.savez_compressed (DEFLATE) of the same arrays
  - npy_expected.json  flattened values for every fixture

Run from repo root: python3 tools/make_npy_fixture.py
"""
import json, os
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")


def main():
    os.makedirs(OUT, exist_ok=True)
    exp = {}

    f4 = (np.arange(15, dtype=np.float32).reshape(3, 5) * 0.25) - 1.5
    np.save(os.path.join(OUT, "npy_f4.npy"), f4)
    exp["npy_f4"] = {"descr": "<f4", "shape": [3, 5],
                     "values": [float(x) for x in f4.ravel()]}

    f8 = np.array([0.0, -1.5, 3.14159265358979, 2**53 + 0.0,
                   -0.0078125, 1e300, -1e-300])
    np.save(os.path.join(OUT, "npy_f8.npy"), f8)
    exp["npy_f8"] = {"descr": "<f8", "shape": [7],
                     "values": [float(x) for x in f8]}

    i8 = np.array([0, 1, -1, 2**62, -(2**62), 123456789012345], dtype=np.int64)
    np.save(os.path.join(OUT, "npy_i8.npy"), i8)
    exp["npy_i8"] = {"descr": "<i8", "shape": [6],
                     "values": [int(x) for x in i8]}

    i4 = np.array([[1, -2, 3], [2**31 - 1, -(2**31), 0]], dtype=np.int32)
    np.save(os.path.join(OUT, "npy_i4.npy"), i4)
    exp["npy_i4"] = {"descr": "<i4", "shape": [2, 3],
                     "values": [int(x) for x in i4.ravel()]}

    sc = np.float64(42.125)
    np.save(os.path.join(OUT, "npy_scalar.npy"), sc)
    exp["npy_scalar"] = {"descr": "<f8", "shape": [], "values": [42.125]}

    np.save(os.path.join(OUT, "npy_fortran.npy"), np.asfortranarray(f4))

    big = np.arange(1000, dtype=np.int64) * 7 - 3500
    np.save(os.path.join(OUT, "npy_big.npy"), big)
    exp["npy_big"] = {"descr": "<i8", "shape": [1000],
                      "values_head": [int(x) for x in big[:5]],
                      "sum": int(big.sum())}

    ids = np.array([10, 20, 30, 40], dtype=np.int64)
    vecs = (np.arange(32, dtype=np.float32).reshape(4, 8) - 16.0) * 0.125
    np.savez(os.path.join(OUT, "bundle.npz"), ids=ids, vecs=vecs)
    np.savez_compressed(os.path.join(OUT, "bundle_c.npz"), ids=ids, vecs=vecs)
    exp["bundle"] = {
        "ids": [int(x) for x in ids],
        "vecs_shape": [4, 8],
        "vecs": [float(x) for x in vecs.ravel()],
    }

    # byte-level writer parity: the exact bytes np.save produces for one
    # small array, so the Scala WRITER can assert byte equality
    exp["writer_parity"] = {
        "f4_3x5_hex": open(os.path.join(OUT, "npy_f4.npy"), "rb").read().hex(),
        "i8_6_hex": open(os.path.join(OUT, "npy_i8.npy"), "rb").read().hex(),
    }

    with open(os.path.join(OUT, "npy_expected.json"), "w") as f:
        json.dump(exp, f, indent=1)
    print("numpy", np.__version__, "fixtures written to", OUT)


if __name__ == "__main__":
    main()
