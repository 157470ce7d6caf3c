#!/usr/bin/env python3
"""XZ fixtures compressed by CPython's `lzma` module (real liblzma) — the
independent third-party producer the hand-rolled graft.ops.Xz decoder is
pinned against. Covers every check type the reader supports, multi-block
and multi-stream layouts, stream padding, presets 0/6/9e (different
lc/lp/pb never appear via presets, so two custom-filter fixtures force
them), and an incompressible payload (uncompressed LZMA2 chunks).

Each <name>.xz pairs with <name>.raw (the exact plain bytes).

Run from repo root: python3 tools/make_xz_fixture.py
"""
import lzma, os, random

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")


def jsonlish(n, seed=2026):
    rnd = random.Random(seed)
    words = ["xz", "lzma", "range", "coder", "spark", "shard", "corpus",
             "tokenizer", "probability", "bittree", "dictionary", "window"]
    lines = []
    for i in range(n):
        body = " ".join(rnd.choice(words) for _ in range(rnd.randrange(4, 28)))
        lines.append('{"id":%d,"lang":"%s","text":"%s"}'
                     % (i, rnd.choice(["en", "de", "fr"]), body))
    return ("\n".join(lines)).encode("ascii")


def rand(n, seed=99):
    rnd = random.Random(seed)
    return bytes(rnd.randrange(256) for _ in range(n))


def write(name, raw, comp):
    with open(os.path.join(OUT, name + ".raw"), "wb") as f:
        f.write(raw)
    with open(os.path.join(OUT, name + ".xz"), "wb") as f:
        f.write(comp)
    assert lzma.decompress(comp) == raw, name
    print(f"{name}: raw {len(raw)} -> xz {len(comp)}")


basic = jsonlish(800)
write("xz_crc32", basic, lzma.compress(basic, check=lzma.CHECK_CRC32, preset=6))
write("xz_crc64", basic, lzma.compress(basic, check=lzma.CHECK_CRC64, preset=9 | lzma.PRESET_EXTREME))
write("xz_sha256", basic, lzma.compress(basic, check=lzma.CHECK_SHA256, preset=0))
write("xz_nocheck", basic, lzma.compress(basic, check=lzma.CHECK_NONE, preset=1))

# custom filter chains: exotic lc/lp/pb and a small dict
lit0 = jsonlish(500, seed=7)
write("xz_lc0lp2", lit0, lzma.compress(lit0, check=lzma.CHECK_CRC32, filters=[
    {"id": lzma.FILTER_LZMA2, "dict_size": 1 << 16, "lc": 0, "lp": 2, "pb": 1}]))
write("xz_lc1lp1pb0", lit0, lzma.compress(lit0, check=lzma.CHECK_CRC64, filters=[
    {"id": lzma.FILTER_LZMA2, "dict_size": 1 << 20, "lc": 1, "lp": 1, "pb": 0}]))

# incompressible: forces uncompressed LZMA2 chunks
rb = rand(40000)
write("xz_rand", rb, lzma.compress(rb, check=lzma.CHECK_CRC32, preset=6))

# long runs: maximal match lengths / rep machinery
runs = b"".join(bytes([b]) * n for b, n in
                [(65, 5000), (66, 3), (65, 7000), (0, 10000), (65, 273), (90, 1)] * 6)
write("xz_runs", runs, lzma.compress(runs, check=lzma.CHECK_CRC64, preset=9))

# big payload -> multiple 2 MiB-ish LZMA2 chunks within one block
big = jsonlish(24000, seed=13)
assert len(big) > 3 * (1 << 20), len(big)
write("xz_chunks", big, lzma.compress(big, check=lzma.CHECK_CRC32, preset=6))

# two concatenated streams with 4-byte stream padding between (legal per
# spec §2 and accepted by the xz tool; python's one-shot decompress does
# NOT accept padding, so assert the parts)
a, b = jsonlish(60, seed=3), jsonlish(60, seed=4)
ca, cb = lzma.compress(a, check=lzma.CHECK_CRC32), lzma.compress(b, check=lzma.CHECK_SHA256)
assert lzma.decompress(ca) == a and lzma.decompress(cb) == b
with open(os.path.join(OUT, "xz_multi.raw"), "wb") as f:
    f.write(a + b)
with open(os.path.join(OUT, "xz_multi.xz"), "wb") as f:
    f.write(ca + b"\x00" * 4 + cb)
print(f"xz_multi: raw {len(a+b)} -> xz {len(ca) + 4 + len(cb)}")

write("xz_empty", b"", lzma.compress(b"", check=lzma.CHECK_CRC32))
write("xz_tiny", b"q", lzma.compress(b"q", check=lzma.CHECK_CRC64))

# delta + lzma2 chain (`xz --delta=dist=4` layout for binary dumps)
wav_ish = bytes((i * 7 + (i // 4) * 13) % 256 for i in range(50000))
write("xz_delta", wav_ish, lzma.compress(wav_ish, check=lzma.CHECK_CRC32, filters=[
    {"id": lzma.FILTER_DELTA, "dist": 4},
    {"id": lzma.FILTER_LZMA2, "preset": 6}]))

# legacy .lzma (FORMAT_ALONE): CPython always writes the unknown-size
# header terminated by the end marker
alone = jsonlish(400, seed=21)
for name, comp in [
        ("lzma_alone", lzma.compress(alone, format=lzma.FORMAT_ALONE, preset=6)),
        ("lzma_alone_lp2", lzma.compress(alone, format=lzma.FORMAT_ALONE, filters=[
            {"id": lzma.FILTER_LZMA1, "preset": 1, "lc": 2, "lp": 2, "pb": 1,
             "dict_size": 1 << 16}]))]:
    with open(os.path.join(OUT, name + ".raw"), "wb") as f:
        f.write(alone)
    with open(os.path.join(OUT, name + ".lzma"), "wb") as f:
        f.write(comp)
    assert lzma.decompress(comp, format=lzma.FORMAT_ALONE) == alone, name
    print(f"{name}: raw {len(alone)} -> lzma {len(comp)}")
