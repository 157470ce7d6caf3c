#!/usr/bin/env python3
"""Differential mutant-parity oracles for the remaining stdlib-referenced
hand-rolled readers: USTAR (graft.ops.Tar vs python tarfile) and WAV
(graft.ops.Wav vs python wave). Same harness family as
codec_mutant_parity.py.

Canonical forms:
  tar: per REGULAR member in order, name|sha256(content)|#  (tarfile's
       m.isfile(); ours keeps typeflag '0'/NUL)
  wav: channels|rate|sampwidth*8|nframes|sha256(frames)

Outputs: /tmp/tarwav_parity/{tar_<i>.bin, wav_<i>.bin, tar.tsv, wav.tsv}

Run: python3 tools/tarwav_mutant_parity.py
then: sbt "runMain graft.tools.TarWavParity /tmp/tarwav_parity tar"
     sbt "runMain graft.tools.TarWavParity /tmp/tarwav_parity wav"
"""
import hashlib
import io
import os
import struct
import tarfile
import wave

OUT = "/tmp/tarwav_parity"
XORS = [0x01, 0x10, 0x80, 0xFF]


def incompressible(n, seed=0x1F2E3D4C):
    x = seed
    out = bytearray()
    while len(out) < n:
        x ^= (x << 13) & 0xFFFFFFFF
        x ^= x >> 17
        x ^= (x << 5) & 0xFFFFFFFF
        out.append(x & 0xFF)
    return bytes(out)


def tar_streams():
    out = []

    def build(members, fmt=tarfile.USTAR_FORMAT):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w", format=fmt) as t:
            for name, body in members:
                info = tarfile.TarInfo(name)
                info.size = len(body)
                info.mtime = 0
                t.addfile(info, io.BytesIO(body))
        return buf.getvalue()

    out.append(build([("a.txt", b"hello tar"), ("dir/b.bin", incompressible(700)),
                      ("empty", b"")]))
    out.append(build([("one", b"x" * 511), ("two", b"y" * 512),
                      ("three", b"z" * 513)]))
    # round 16: the long/unicode-name forms modern tars actually emit —
    # PAX `path=` extended headers and GNU 'L' long-name members
    long_name = "deep/" + "d" * 60 + "/" + "n" * 80 + ".bin"
    out.append(build([(long_name, b"pax body"),
                      ("plain.txt", b"short"),
                      ("uni/n\u00e4me-\u540d.txt", b"uni body")],
                     fmt=tarfile.PAX_FORMAT))
    out.append(build([(long_name, b"gnu body"), ("g.txt", b"g")],
                     fmt=tarfile.GNU_FORMAT))
    return out


def tar_verdict(data):
    try:
        h = hashlib.sha256()
        with tarfile.open(fileobj=io.BytesIO(data), mode="r:") as t:
            for m in t:
                if m.isfile():
                    body = t.extractfile(m).read()
                    if len(body) != m.size:
                        return "fail", None
                    h.update(m.name.encode() + b"|" +
                             hashlib.sha256(body).hexdigest().encode() + b"|#")
        return "ok", h.hexdigest()
    except Exception:
        return "fail", None


def wav_streams():
    out = []
    for (ch, rate, width, n, seed) in [
            (1, 8000, 2, 300, 1), (2, 44100, 2, 257, 2), (1, 16000, 1, 400, 3),
            (2, 48000, 3, 120, 4)]:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(ch)
            w.setsampwidth(width)
            w.setframerate(rate)
            w.writeframes(incompressible(n * ch * width, seed))
        out.append(buf.getvalue())
    return out


def wav_verdict(data):
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            ch, width, rate, n = (w.getnchannels(), w.getsampwidth(),
                                  w.getframerate(), w.getnframes())
            frames = w.readframes(n)
            if len(frames) != n * ch * width:
                return "fail", None
            h = hashlib.sha256()
            h.update(f"{ch}|{rate}|{width * 8}|{n}|".encode())
            h.update(hashlib.sha256(frames).hexdigest().encode())
            return "ok", h.hexdigest()
    except Exception:
        return "fail", None


def run(name, streams, verdict):
    rows = []
    counts = {"ok": 0, "fail": 0}
    for i, base in enumerate(streams):
        with open(os.path.join(OUT, f"{name}_{i}.bin"), "wb") as f:
            f.write(base)
        v, _ = verdict(base)
        assert v == "ok", (name, i)
        for pos in range(len(base)):
            for x in XORS:
                m = bytearray(base)
                m[pos] ^= x
                v, hh = verdict(bytes(m))
                counts[v] += 1
                rows.append(f"{i}\t{pos}\t{x}\t{v}\t{hh or ''}")
    with open(os.path.join(OUT, f"{name}.tsv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"{name}: {len(streams)} streams, {len(rows)} mutants {counts}")


def main():
    os.makedirs(OUT, exist_ok=True)
    run("tar", tar_streams(), tar_verdict)
    run("wav", wav_streams(), wav_verdict)


if __name__ == "__main__":
    main()
