#!/usr/bin/env python3
"""Arrow IPC *stream*-format fixtures written by REAL pyarrow (the
reference implementation), so the Scala reader is pinned against the
actual producer:

  - arrow_basic.arrows   2 record batches; int64 / float64 / float32 /
                         bool / utf8 / list<float32> columns, no nulls
  - arrow_nulls.arrows   1 batch with nulls in every nullable column
                         (validity bitmaps + null slots in offsets)
  - arrow_empty.arrows   schema + one 0-row batch + EOS
  - arrow_expected.json  values for every fixture

Run from repo root: python3 tools/make_arrow_fixture.py
"""
import json, os
import pyarrow as pa

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")


def write_stream(path, schema, batches):
    with pa.ipc.new_stream(path, schema) as w:
        for b in batches:
            w.write_batch(b)


def main():
    os.makedirs(OUT, exist_ok=True)
    exp = {}

    schema = pa.schema([
        pa.field("id", pa.int64(), nullable=False),
        pa.field("score", pa.float64()),
        pa.field("w32", pa.float32()),
        pa.field("keep", pa.bool_()),
        pa.field("name", pa.utf8()),
        pa.field("vec", pa.list_(pa.float32())),
    ])

    def batch(ids, scores, w32s, keeps, names, vecs):
        return pa.record_batch([
            pa.array(ids, pa.int64()),
            pa.array(scores, pa.float64()),
            pa.array(w32s, pa.float32()),
            pa.array(keeps, pa.bool_()),
            pa.array(names, pa.utf8()),
            pa.array(vecs, pa.list_(pa.float32())),
        ], schema=schema)

    b1 = batch([1, 2, 3],
               [0.5, -1.25, 3.75],
               [1.5, -2.5, 0.125],
               [True, False, True],
               ["alpha", "", "γδ"],          # include multi-byte utf8
               [[1.0, 2.0], [], [0.5, -0.5, 4.0]])
    b2 = batch([10, 11],
               [2.0 ** 53, -1e300],
               [3.0, -0.0],
               [False, False],
               ["tail", "x" * 40],
               [[9.0], [1.0, 2.0, 3.0, 4.0]])
    write_stream(os.path.join(OUT, "arrow_basic.arrows"), schema, [b1, b2])
    exp["arrow_basic"] = {
        "id": [1, 2, 3, 10, 11],
        "score": [0.5, -1.25, 3.75, 2.0 ** 53, -1e300],
        "w32": [1.5, -2.5, 0.125, 3.0, -0.0],
        "keep": [True, False, True, False, False],
        "name": ["alpha", "", "γδ", "tail", "x" * 40],
        "vec": [[1.0, 2.0], [], [0.5, -0.5, 4.0], [9.0],
                [1.0, 2.0, 3.0, 4.0]],
        "n_batches": 2,
    }

    nb = pa.record_batch([
        pa.array([None, 7, None, 9], pa.int64()),
        pa.array([1.5, None, None, -2.5], pa.float64()),
        pa.array([None, 1.0, 2.0, None], pa.float32()),
        pa.array([True, None, False, None], pa.bool_()),
        pa.array(["a", None, "", None], pa.utf8()),
        pa.array([[1.0], None, [], [2.0, None]], pa.list_(pa.float32())),
    ], schema=pa.schema([
        pa.field("id", pa.int64()),
        pa.field("score", pa.float64()),
        pa.field("w32", pa.float32()),
        pa.field("keep", pa.bool_()),
        pa.field("name", pa.utf8()),
        pa.field("vec", pa.list_(pa.float32())),
    ]))
    write_stream(os.path.join(OUT, "arrow_nulls.arrows"), nb.schema, [nb])
    exp["arrow_nulls"] = {
        "id": [None, 7, None, 9],
        "score": [1.5, None, None, -2.5],
        "w32": [None, 1.0, 2.0, None],
        "keep": [True, None, False, None],
        "name": ["a", None, "", None],
        "vec": [[1.0], None, [], [2.0, None]],
    }

    f64s = pa.schema([
        pa.field("id", pa.int64(), nullable=False),
        pa.field("rvec", pa.list_(pa.float64())),
    ])
    fb = pa.record_batch([
        pa.array([1, 2], pa.int64()),
        pa.array([[0.5, -1e300, 2.0 ** 53], []], pa.list_(pa.float64())),
    ], schema=f64s)
    write_stream(os.path.join(OUT, "arrow_f64.arrows"), f64s, [fb])
    exp["arrow_f64"] = {
        "id": [1, 2],
        "rvec": [[0.5, -1e300, 2.0 ** 53], []],
    }

    es = pa.schema([pa.field("id", pa.int64()), pa.field("t", pa.utf8())])
    write_stream(os.path.join(OUT, "arrow_empty.arrows"), es,
                 [pa.record_batch([pa.array([], pa.int64()),
                                   pa.array([], pa.utf8())], schema=es)])
    exp["arrow_empty"] = {"n_rows": 0, "fields": ["id", "t"]}

    with open(os.path.join(OUT, "arrow_expected.json"), "w") as f:
        json.dump(exp, f, indent=1)
    print("pyarrow", pa.__version__, "fixtures written to", OUT)


if __name__ == "__main__":
    main()
