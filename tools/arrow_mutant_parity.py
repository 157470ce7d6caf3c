#!/usr/bin/env python3
"""Differential mutant-parity oracle for the hand-rolled Arrow IPC
stream reader (graft.ops.ArrowIpc) against pyarrow: for every
single-byte XOR mutant of a grid of pyarrow-encoded streams, record
pyarrow's verdict — decodes → sha256 of a CANONICAL value serialization
(floats as raw little-endian bit patterns so exactness is testable), or
refuses. graft.tools.ArrowParity regenerates the mutants and must agree.

A mutant may morph a column into a type outside the reader's supported
set (i64/i32/f64/f32/bool/utf8/list<f32>/list<f64>); those are recorded
as `ok_othertype` and the Scala side's typed `unsupported_*` refusal
counts as policy agreement.

Outputs (tool-run artifacts, NOT committed):
  /tmp/arrow_parity/arrow_<i>.bin, /tmp/arrow_parity/arrow.tsv

Run: python3 tools/arrow_mutant_parity.py
then: sbt "runMain graft.tools.ArrowParity /tmp/arrow_parity"
"""
import hashlib
import os
import struct

import pyarrow as pa

OUT = "/tmp/arrow_parity"
XORS = [0x01, 0x10, 0x80, 0xFF]

SUPPORTED = {"int64", "int32", "double", "float", "bool", "string"}


def streams():
    out = []
    t1 = pa.table({
        "id": pa.array([1, 2, None, 4], pa.int64()),
        "txt": pa.array(["a", None, "ccc", ""], pa.string()),
        "x": pa.array([1.5, -0.25, None, 3.25], pa.float64()),
        "ok": pa.array([True, None, False, True], pa.bool_()),
    })
    out.append(t1)
    t2 = pa.table({
        "v32": pa.array([7, -9, 100000, None, 0], pa.int32()),
        "f32": pa.array([0.5, None, -2.75, 1e10, 0.0], pa.float32()),
    })
    out.append(t2)
    t3 = pa.table({
        "emb": pa.array([[0.5, 1.5], None, [2.5], []],
                        pa.list_(pa.float32())),
        "emb64": pa.array([[1.25], [2.5, -3.5], None, []],
                          pa.list_(pa.float64())),
    })
    out.append(t3)
    # multi-batch stream
    t4 = pa.Table.from_batches([
        pa.record_batch({"n": pa.array(list(range(50)), pa.int64())}),
        pa.record_batch({"n": pa.array(list(range(50, 90)), pa.int64())}),
    ])
    out.append(t4)
    bins = []
    for t in out:
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, t.schema) as w:
            for b in t.to_batches():
                w.write_batch(b)
        bins.append(sink.getvalue().to_pybytes())
    return bins


def canon_value(typ, v):
    if v is None:
        return b"\xff"
    if typ == "int64" or typ == "int32":
        return str(int(v)).encode()
    if typ == "double":
        return struct.pack("<d", float(v)).hex().encode()
    if typ == "float":
        return struct.pack("<f", float(v)).hex().encode()
    if typ == "bool":
        return b"1" if v else b"0"
    if typ == "string":
        return v.encode("utf-8").hex().encode()
    raise ValueError(typ)


def canon(reader_batches, schema):
    h = hashlib.sha256()
    other = False
    for batch in reader_batches:
        for col, field in zip(batch.columns, schema):
            t = str(field.type)
            h.update(field.name.encode() + b"|" + t.encode() + b"|")
            if t in SUPPORTED:
                for v in col.to_pylist():
                    h.update(canon_value(t, v) + b";")
            elif t in ("list<item: float>", "list<item: double>"):
                inner = "float" if "float>" in t else "double"
                for lst in col.to_pylist():
                    if lst is None:
                        h.update(b"\xff;")
                    else:
                        for v in lst:
                            h.update(canon_value(inner, v) + b",")
                        h.update(b";")
            else:
                other = True
        h.update(b"#")
    return h.hexdigest(), other


def verdict_raw(data):
    try:
        with pa.ipc.open_stream(pa.BufferReader(data)) as r:
            batches = list(r)
            hh, other = canon(batches, r.schema)
        return ("ok_othertype" if other else "ok"), hh
    except Exception:
        return "fail", None


def verdict(data):
    # pyarrow SEGFAULTS on some corrupt inputs (the C++ reader trusts
    # flatbuffers offsets) — run each decode in a fork so a crash is a
    # recorded verdict (`crash`) instead of a dead harness
    r, w = os.pipe()
    pid = os.fork()
    if pid == 0:
        os.close(r)
        try:
            v, hh = verdict_raw(data)
            os.write(w, (v + "\t" + (hh or "")).encode())
        except Exception:
            pass
        finally:
            os._exit(0)
    os.close(w)
    chunks = b""
    while True:
        c = os.read(r, 65536)
        if not c:
            break
        chunks += c
    os.close(r)
    _, status = os.waitpid(pid, 0)
    if not chunks or (os.WIFSIGNALED(status)):
        return "crash", None
    v, _, hh = chunks.decode().partition("\t")
    return v, (hh or None)


def main():
    os.makedirs(OUT, exist_ok=True)
    rows = []
    counts = {"ok": 0, "ok_othertype": 0, "fail": 0, "crash": 0}
    for i, base in enumerate(streams()):
        with open(os.path.join(OUT, f"arrow_{i}.bin"), "wb") as f:
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
    with open(os.path.join(OUT, "arrow.tsv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"{len(rows)} mutants: {counts}")


if __name__ == "__main__":
    main()
