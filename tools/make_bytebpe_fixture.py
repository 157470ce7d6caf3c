#!/usr/bin/env python3
"""Byte-level BPE front-end fixtures: the GENUINE GPT-2 pretokenizer
regex run under the python `regex` engine (the one the published GPT-2
encoder uses) + the published bytes_to_unicode table, over a battery of
adversarial strings. graft.ops.ByteBpe must reproduce both the piece
boundaries and the byte-unicode mapping exactly (ByteBpeSpec).

Run from repo root: python3 tools/make_bytebpe_fixture.py
"""
import json
import os

import regex

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")

PAT = regex.compile(
    r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")


def bytes_to_unicode():
    bs = (list(range(ord("!"), ord("~") + 1)) +
          list(range(ord("¡"), ord("¬") + 1)) +
          list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(2 ** 8):
        if b not in bs:
            bs.append(b)
            cs.append(2 ** 8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


B2U = bytes_to_unicode()

BATTERY = [
    "hello world",
    "Hello, World! It's 2024.",
    "I've they'll we're can't don'T",            # contraction casing
    "  leading and   multiple    spaces ",        # whitespace runs + tail
    "tabs\tand\nnewlines\r\nmixed",
    "numbers 123 mixed42 42mixed 3.14 1,000,000",
    "punct!!! ...---... (nested [brackets]) #tag @user",
    "unicode: café naïve über straße",
    "CJK 漢字かなカタカナ mixed",
    "emoji \U0001f600 \U0001f9d1‍\U0001f4bb end",
    "nbsp and em-space thin",
    "quotes “curly” and 'straight' op's",
    "", " ", "a", "'", "''", "x'y",
    "key agg row scan slow fast table value part hash v",
]


def main():
    os.makedirs(OUT, exist_ok=True)
    cases = []
    for text in BATTERY:
        toks = PAT.findall(text)
        mapped = ["".join(B2U[b] for b in t.encode("utf-8")) for t in toks]
        cases.append({"text": text, "pieces": toks, "mapped": mapped})
    out = {
        "table": ["".join(B2U[b] for b in range(256))],
        "cases": cases,
    }
    with open(os.path.join(OUT, "bytebpe_expected.json"), "w") as f:
        json.dump(out, f, indent=1, ensure_ascii=False)
    print(f"wrote {len(cases)} pretokenizer cases + the 256-entry table")


if __name__ == "__main__":
    main()
