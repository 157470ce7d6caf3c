#!/usr/bin/env python3
"""Differential mutant-parity oracle for the ZIP reader/writers against
python zipfile (round 16, the harness family that caught 10 real
conformance bugs in round 15). Two directions in one run:

  1. graft-written bases (classic JDK-stream zips AND forced-zip64
     archives from Zip.writeZip64) must be readable by python zipfile —
     writer conformance.
  2. For every single-byte XOR mutant (x4 values) of every base, python
     zipfile records a verdict: all members readable -> canonical sha256
     over sorted (name, member-sha), else refuse. The Scala side
     (graft.tools.ZipParity) regenerates the same mutants and must agree
     on accept/refuse and bytes, with two documented policy classes:
       - policy_central_meta: the two readers trust DIFFERENT copies of
         the redundant metadata (python resolves members via the central
         directory and checks the central CRC; our streamed read trusts
         the local headers and cross-checks only membership), so a mutant
         inside the central-directory/tail region may flip exactly one of
         them. Never silent-wrong bytes: both sides CRC the payload.
       - policy_stream_strict: the JDK stream refuses local-header shapes
         python's central-driven reader never looks at.

  3. zip_big.bin: a genuine >65535-entry archive, which forces python
     zipfile to emit the REAL zip64 EOCD record + locator (not our
     forced-sentinel writer) — the Scala reader must walk it and agree on
     the canonical hash. No mutants (6 MB base).

Run (after `sbt "runMain graft.tools.ZipParity --dump /tmp/zip_parity"`):
  python3 tools/zip_mutant_parity.py
then: sbt "runMain graft.tools.ZipParity /tmp/zip_parity"

Outputs (tool-run artifacts, NOT committed):
  /tmp/zip_parity/zip_<i>.bin   bases (written by the Scala dump step)
  /tmp/zip_parity/zip_big.bin   python-written zip64-EOCD archive
  /tmp/zip_parity/zip.tsv       <i> <pos> <xor> <ok|fail> [<canon-sha>]
  /tmp/zip_parity/zip_big.tsv   big <ok> <canon-sha>
"""
import glob
import hashlib
import io
import os
import zipfile

OUT = "/tmp/zip_parity"
XORS = [0x01, 0x10, 0x80, 0xFF]


def canon(items):
    h = hashlib.sha256()
    for n, body in sorted(items, key=lambda t: (t[0], t[1])):
        h.update(n.encode("utf-8", "surrogatepass"))
        h.update(b"|")
        h.update(hashlib.sha256(body).digest())
        h.update(b"#")
    return h.hexdigest()


def verdict(data):
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
        items = [(n, zf.read(n)) for n in zf.namelist()
                 if not n.endswith("/")]
        return "ok", canon(items)
    except Exception:
        return "fail", None


def main():
    bases = sorted(glob.glob(os.path.join(OUT, "zip_[0-9]*.bin")))
    assert bases, "run the Scala dump step first: " \
        "sbt 'runMain graft.tools.ZipParity --dump /tmp/zip_parity'"
    rows = []
    n_ok = n_fail = 0
    for path in bases:
        i = int(os.path.basename(path)[4:-4])
        base = open(path, "rb").read()
        v, h = verdict(base)
        # writer conformance: every graft-written base (incl. forced
        # zip64) must be a valid archive to python zipfile
        assert v == "ok", ("base unreadable by zipfile", i)
        rows.append((i, -1, 0, v, h))
        for pos in range(len(base)):
            for x in XORS:
                m = bytearray(base)
                m[pos] ^= x
                v, h = verdict(bytes(m))
                if v == "ok":
                    n_ok += 1
                    rows.append((i, pos, x, "ok", h))
                else:
                    n_fail += 1
                    rows.append((i, pos, x, "fail", ""))
    with open(os.path.join(OUT, "zip.tsv"), "w") as f:
        for r in rows:
            f.write("\t".join(str(c) for c in r).rstrip() + "\n")
    print(f"zip: {len(rows)} rows ({n_ok} ok, {n_fail} fail) from "
          f"{len(bases)} bases")

    # the genuine zip64-EOCD direction: >65535 entries forces zipfile to
    # write the real zip64 record+locator
    big = io.BytesIO()
    with zipfile.ZipFile(big, "w", zipfile.ZIP_DEFLATED) as zf:
        for k in range(65600):
            zi = zipfile.ZipInfo(f"d{k:05d}", (1980, 1, 1, 0, 0, 0))
            zf.writestr(zi, b"v%d" % (k % 97))
    data = big.getvalue()
    v, h = verdict(data)
    assert v == "ok"
    with open(os.path.join(OUT, "zip_big.bin"), "wb") as f:
        f.write(data)
    with open(os.path.join(OUT, "zip_big.tsv"), "w") as f:
        f.write(f"big\tok\t{h}\n")
    print(f"zip_big: {len(data)} bytes, 65600 entries, canon {h[:16]}…")


if __name__ == "__main__":
    main()
