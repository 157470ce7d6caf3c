#!/usr/bin/env python3
"""Differential mutant-parity oracle for the SRT/WebVTT cue parsers:
independent python readers of the same public grammars vs
graft.ops.Subtitles. Unlike the binary containers (where CRCs kill
nearly every mutant), TEXT formats keep most single-byte mutants
parseable — so this harness exercises VALUE agreement (timings, cue
text, ordering) on thousands of accepted mutants, the silent-wrong
class a typed-or-ok sweep can't see.

For every single-byte substitution mutant of a battery of generated
caption files (printable replacement chars, so the mutant stays text),
record: parses -> sha256 of the canonical cue list, else fail. The
Scala side (graft.tools.SubsParity) regenerates the same mutants and
must agree on accept/refuse and hash.

Outputs (tool-run artifacts, NOT committed):
  /tmp/subs_parity/{srt,vtt}_<i>.txt   base files
  /tmp/subs_parity/{srt,vtt}.tsv       <i> <pos> <ord> <ok|fail> [<sha>]

Run: python3 tools/subs_mutant_parity.py
then: sbt "runMain graft.tools.SubsParity /tmp/subs_parity"
"""
import hashlib
import os
import re

OUT = "/tmp/subs_parity"
# replacement chars chosen to flip digits/punct/letters meaningfully
SUBS = [ord("0"), ord("9"), ord(":"), ord(" "), ord("x"), ord("\n")]

SRT_TIMING = re.compile(
    r"^(\d{2,}):(\d{2}):(\d{2}),(\d{3})\s*-->\s*(\d{2,}):(\d{2}):(\d{2}),(\d{3})$")
VTT_TIMING = re.compile(
    r"^(?:(\d+):)?(\d{2}):(\d{2})\.(\d{3})\s*-->\s*"
    r"(?:(\d+):)?(\d{2}):(\d{2})\.(\d{3})([ \t].*)?$")


def _ms(h, m, s, f):
    hh = int(h) if h else 0
    mm, ss = int(m), int(s)
    if mm >= 60 or ss >= 60:
        raise ValueError("range")
    return hh * 3600000 + mm * 60000 + ss * 1000 + int(f)


def _blocks(text):
    out, cur = [], []
    for line in re.split(r"\r\n|\n|\r", text):
        if line.strip() == "":
            if cur:
                out.append(cur)
                cur = []
        else:
            cur.append(line)
    if cur:
        out.append(cur)
    return out


def parse_srt(text):
    cues = []
    for b in _blocks(text):
        if len(b) < 3:
            raise ValueError("short block")
        idx = b[0].strip()
        if not idx or not idx.isascii() or not idx.isdigit():
            raise ValueError("index")
        m = SRT_TIMING.match(b[1].strip())
        if not m:
            raise ValueError("timing")
        s0 = _ms(m.group(1), m.group(2), m.group(3), m.group(4))
        e0 = _ms(m.group(5), m.group(6), m.group(7), m.group(8))
        if e0 <= s0:
            raise ValueError("backwards")
        cues.append((s0, e0, "\n".join(b[2:])))
    return cues


def parse_vtt(text):
    if text.startswith("﻿"):
        text = text[1:]
    bs = _blocks(text)
    if not bs or not (bs[0][0] == "WEBVTT" or bs[0][0].startswith("WEBVTT ")
                      or bs[0][0].startswith("WEBVTT\t")):
        raise ValueError("header")
    cues = []
    for b in bs[1:]:
        if (b[0] == "NOTE" or b[0].startswith("NOTE ") or
                b[0].startswith("NOTE\t") or b[0] in ("STYLE", "REGION")):
            continue
        if "-->" in b[0]:
            timing, rest = b[0], b[1:]
        else:
            if len(b) < 2:
                raise ValueError("id only")
            timing, rest = b[1], b[2:]
        m = VTT_TIMING.match(timing.strip())
        if not m:
            raise ValueError("timing")
        s0 = _ms(m.group(1), m.group(2), m.group(3), m.group(4))
        e0 = _ms(m.group(5), m.group(6), m.group(7), m.group(8))
        if e0 <= s0:
            raise ValueError("backwards")
        if not rest:
            raise ValueError("no text")
        cues.append((s0, e0, "\n".join(rest)))
    return cues


def canon(cues):
    h = hashlib.sha256()
    for s0, e0, t in cues:
        h.update(f"{s0}|{e0}|".encode())
        h.update(t.encode())
        h.update(b"#")
    return h.hexdigest()


def bases_srt():
    out = []
    out.append("1\n00:00:01,500 --> 00:00:03,000\nhello world\n\n"
               "2\n00:01:00,000 --> 00:01:02,250\nline one\nline two\n")
    out.append("1\r\n00:00:00,001 --> 00:00:00,999\r\ncrlf cue\r\n\r\n"
               "2\r\n11:59:59,000 --> 12:00:00,000\r\nnoon\r\n")
    out.append("\n".join(f"{k}\n00:00:{k:02d},000 --> 00:00:{k:02d},900\n"
                         f"cue number {k}\n" for k in range(1, 8)))
    return out


def bases_vtt():
    out = []
    out.append("WEBVTT\n\n00:05.000 --> 00:07.500 align:start\nhi there\n\n"
               "01:00:00.000 --> 01:00:01.000\nhour mark\n")
    out.append("﻿WEBVTT - title\nKind: captions\n\n"
               "NOTE a comment\n\n"
               "cue-1\n00:01.000 --> 00:02.000\nfirst\n\n"
               "STYLE\n::cue { }\n\n"
               "00:03.000 --> 00:04.000\nsecond\nline\n")
    return out


def main():
    os.makedirs(OUT, exist_ok=True)
    for kind, bases, parse in [("srt", bases_srt(), parse_srt),
                               ("vtt", bases_vtt(), parse_vtt)]:
        rows = []
        n_ok = n_fail = 0
        for i, base in enumerate(bases):
            with open(os.path.join(OUT, f"{kind}_{i}.txt"), "w",
                      encoding="utf-8") as f:
                f.write(base)
            rows.append((i, -1, 0, "ok", canon(parse(base))))
            for pos in range(len(base)):
                for o in SUBS:
                    if ord(base[pos]) == o:
                        continue
                    m = base[:pos] + chr(o) + base[pos + 1:]
                    try:
                        rows.append((i, pos, o, "ok", canon(parse(m))))
                        n_ok += 1
                    except Exception:
                        rows.append((i, pos, o, "fail", ""))
                        n_fail += 1
        with open(os.path.join(OUT, f"{kind}.tsv"), "w") as f:
            for r in rows:
                f.write("\t".join(str(c) for c in r).rstrip() + "\n")
        print(f"{kind}: {len(rows)} rows ({n_ok} ok, {n_fail} fail)")


if __name__ == "__main__":
    main()
