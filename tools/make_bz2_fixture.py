#!/usr/bin/env python3
"""bzip2 fixtures compressed by CPython's `bz2` module (real libbz2) — the
independent third-party producer the hand-rolled graft.ops.Bzip2 decoder is
pinned against (the sibling of the pyarrow/numpy/msgpack fixture tools).

Fixtures (each <name>.bz2 pairs with <name>.raw, the exact plain bytes):
  - bz2_basic     ~60 KB of JSONL-ish text, level 9 (single block)
  - bz2_level1    ~250 KB at level 1 (100 kB blocks -> MULTIPLE blocks)
  - bz2_multi     two independent streams concatenated (the pbzip2 /
                  flush-point layout; first-stream-only readers truncate)
  - bz2_runs      long byte runs (exercises RLE1 counts incl. 255-runs)
  - bz2_rand      seeded pseudo-random bytes (incompressible path)
  - bz2_tiny      1 byte
  - bz2_empty     empty payload

Run from repo root: python3 tools/make_bz2_fixture.py
"""
import bz2, os, random

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")


def jsonlish(n):
    rnd = random.Random(1311)
    words = ["corpus", "shard", "tokenizer", "dedup", "bzip2", "burrows",
             "wheeler", "huffman", "spark", "parquet", "lineitem", "window"]
    lines = []
    for i in range(n):
        body = " ".join(rnd.choice(words) for _ in range(rnd.randrange(5, 25)))
        lines.append('{"id":%d,"lang":"%s","text":"%s"}'
                     % (i, rnd.choice(["en", "de", "fr"]), body))
    return ("\n".join(lines)).encode("ascii")


def runs():
    rnd = random.Random(7)
    out = bytearray()
    for _ in range(400):
        b = rnd.randrange(256)
        out += bytes([b]) * rnd.choice([1, 2, 3, 4, 5, 6, 250, 255, 259, 300, 1000])
    return bytes(out)


def rand(n):
    rnd = random.Random(42)
    return bytes(rnd.randrange(256) for _ in range(n))


def write(name, raw, comp):
    with open(os.path.join(OUT, name + ".raw"), "wb") as f:
        f.write(raw)
    with open(os.path.join(OUT, name + ".bz2"), "wb") as f:
        f.write(comp)
    # sanity: python round trip
    assert bz2.decompress(comp) == raw, name
    print(f"{name}: raw {len(raw)} -> bz2 {len(comp)}")


basic = jsonlish(700)
write("bz2_basic", basic, bz2.compress(basic, 9))

big = jsonlish(3000)
write("bz2_level1", big, bz2.compress(big, 1))

a, b = jsonlish(80), runs()[:40000]
write("bz2_multi", a + b, bz2.compress(a, 5) + bz2.compress(b, 1))

r = runs()
write("bz2_runs", r, bz2.compress(r, 1))

rb = rand(30000)
write("bz2_rand", rb, bz2.compress(rb, 9))

write("bz2_tiny", b"x", bz2.compress(b"x", 1))
write("bz2_empty", b"", bz2.compress(b"", 9))
