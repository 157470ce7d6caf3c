#!/usr/bin/env python3
"""Differential mutant-parity oracle for the hand-rolled NumPy .npy/.npz
reader (graft.ops.Npy) against numpy itself: for every single-byte XOR
mutant of a grid of np.savez-built archives, record numpy's verdict —
decodes → sha256 of a canonical serialization (name|dtype|shape|bytes
per member, file order), or refuses. graft.tools.NpzParity mirrors it.
Members with dtypes/orders outside the reader's supported set
(<f4/<f8/<i4/<i8, C-order) are recorded `ok_unmodeled`; our typed
refusals of those are policy agreement.

Outputs: /tmp/npz_parity/{npz_<i>.bin, npz.tsv}

Run: python3 tools/npz_mutant_parity.py
then: sbt "runMain graft.tools.NpzParity /tmp/npz_parity"
"""
import hashlib
import io
import os

import numpy as np

OUT = "/tmp/npz_parity"
XORS = [0x01, 0x10, 0x80, 0xFF]
SUPPORTED = {"<f4", "<f8", "<i4", "<i8"}


def streams():
    out = []

    def savez(**arrs):
        buf = io.BytesIO()
        np.savez(buf, **arrs)
        return buf.getvalue()

    out.append(savez(ids=np.arange(20, dtype=np.int64),
                     vecs=np.arange(60, dtype=np.float32).reshape(20, 3) / 7))
    out.append(savez(a=np.array([], dtype=np.float64),
                     b=np.array([[1.5, -2.5], [3.5, 4.5]], dtype=np.float64),
                     c=np.array([7], dtype=np.int32)))
    out.append(savez(big=(np.arange(997, dtype=np.int64) * 2654435761) % 1000003))
    return out


def verdict(data):
    try:
        with np.load(io.BytesIO(data), allow_pickle=False) as z:
            h = hashlib.sha256()
            other = False
            for name in z.files:
                a = z[name]
                t = a.dtype.str
                h.update(name.encode() + b"|" + t.encode() + b"|")
                h.update(",".join(str(d) for d in a.shape).encode() + b"|")
                if t in SUPPORTED and a.flags["C_CONTIGUOUS"]:
                    h.update(hashlib.sha256(a.tobytes()).hexdigest().encode())
                else:
                    other = True
                h.update(b"#")
            return ("ok_unmodeled" if other else "ok"), h.hexdigest()
    except Exception:
        return "fail", None


def main():
    os.makedirs(OUT, exist_ok=True)
    rows = []
    counts = {"ok": 0, "ok_unmodeled": 0, "fail": 0}
    for i, base in enumerate(streams()):
        with open(os.path.join(OUT, f"npz_{i}.bin"), "wb") as f:
            f.write(base)
        v, _ = verdict(base)
        assert v == "ok", (i, v)
        for pos in range(len(base)):
            for x in XORS:
                m = bytearray(base)
                m[pos] ^= x
                v, hh = verdict(bytes(m))
                counts[v] += 1
                rows.append(f"{i}\t{pos}\t{x}\t{v}\t{hh or ''}")
    with open(os.path.join(OUT, "npz.tsv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"{counts} -> {os.path.join(OUT, 'npz.tsv')}")


if __name__ == "__main__":
    main()
