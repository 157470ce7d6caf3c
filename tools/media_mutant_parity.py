#!/usr/bin/env python3
"""Differential mutant-parity oracles for the round-16 media containers:

  ogg — an INDEPENDENT python reader of RFC 3533 + RFC 7845 §5 +
        Vorbis I §4.2.2 (page CRC, lacing/continuation, chained and
        multiplexed streams, ID headers) vs graft.ops.Ogg.parseSafe
  mkv — an INDEPENDENT python reader of RFC 8794 + the Matroska
        registry (VINT grammar, nesting, unknown-size segment/cluster,
        tracks, cluster/block shape) vs graft.ops.Matroska.parseSafe

Both sides are clean-room transcriptions of the same public specs; the
harness catches ASYMMETRIC bugs — one side accepting what the other
refuses, or both accepting with different metadata (the silent-wrong
class no typed-or-ok sweep can see). For every single-byte XOR mutant
(x4 values) of every committed fixture, record verdict: ok -> sha256 of
the canonical metadata string, else fail.

Outputs (tool-run artifacts, NOT committed):
  /tmp/media_parity/{ogg,mkv}.tsv   <file> <pos> <xor> <ok|fail> [<sha>]

Run: python3 tools/media_mutant_parity.py
then: sbt "runMain graft.tools.MediaParity /tmp/media_parity"
"""
import hashlib
import os
import struct

FIX = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")
OUT = "/tmp/media_parity"
XORS = [0x01, 0x10, 0x80, 0xFF]

# --------------------------------------------------------------- ogg --


def ogg_crc(data):
    r = 0
    for b in data:
        r ^= b << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if r & 0x80000000 \
                else (r << 1) & 0xFFFFFFFF
    return r


_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if _r & 0x80000000 \
            else (_r << 1) & 0xFFFFFFFF
    _CRC_TABLE.append(_r)


def ogg_crc_fast(data):
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((r >> 24) ^ b) & 0xFF]
    return r


def ogg_parse(data):
    """mirror of graft.ops.Ogg.parse: returns list of stream dicts."""
    if len(data) < 4 or data[:4] != b"OggS":
        raise ValueError("bad_magic")
    pos = 0
    pages = []
    while pos < len(data):
        if pos + 27 > len(data):
            raise ValueError("truncated")
        if data[pos:pos + 4] != b"OggS":
            raise ValueError("bad_frame")
        if data[pos + 4] != 0:
            raise ValueError("bad_frame")
        ht = data[pos + 5]
        granule = struct.unpack("<q", data[pos + 6:pos + 14])[0]
        serial, seq, crc = struct.unpack("<III", data[pos + 14:pos + 26])
        nseg = data[pos + 26]
        if pos + 27 + nseg > len(data):
            raise ValueError("truncated")
        lacing = data[pos + 27:pos + 27 + nseg]
        body_len = sum(lacing)
        end = pos + 27 + nseg + body_len
        if end > len(data):
            raise ValueError("truncated")
        zeroed = bytearray(data[pos:end])
        zeroed[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc_fast(bytes(zeroed)) != crc:
            raise ValueError("bad_frame")
        packets = []
        off = pos + 27 + nseg
        cur = bytearray()
        for l in lacing:
            cur += data[off:off + l]
            off += l
            if l < 255:
                packets.append(bytes(cur))
                cur = bytearray()
        ends_open = nseg > 0 and lacing[-1] == 255
        if ends_open:
            packets.append(bytes(cur))
        pages.append(dict(ht=ht, granule=granule, serial=serial, seq=seq,
                          packets=packets, cont=(ht & 1) != 0,
                          open=ends_open))
        pos = end
    open_streams = {}
    done = []

    def close(st):
        if st["frag"] is not None:
            raise ValueError("bad_frame")
        if st["lastg"] > (2**63 - 1) // 1000:
            raise ValueError("bad_frame")
        done.append(st)

    for pg in pages:
        st = open_streams.get(pg["serial"])
        if st is not None:
            if (pg["ht"] & 2) or pg["seq"] != st["seq"] + 1:
                raise ValueError("bad_frame")
        else:
            if not (pg["ht"] & 2) or pg["seq"] != 0:
                raise ValueError("bad_frame")
            st = dict(serial=pg["serial"], codec="unknown", ch=0, rate=0,
                      preskip=0, lastg=0, npages=0, npkts=0, frag=None,
                      seq=-1, first=True)
            open_streams[pg["serial"]] = st
        st["seq"] = pg["seq"]
        st["npages"] += 1
        if pg["granule"] != -1:
            st["lastg"] = pg["granule"]
        pkts = list(pg["packets"])
        if st["frag"] is not None:
            if not pg["cont"] or not pkts:
                raise ValueError("bad_frame")
            pkts[0] = st["frag"] + pkts[0]
            st["frag"] = None
        elif pg["cont"]:
            raise ValueError("bad_frame")
        if pg["open"]:
            st["frag"] = pkts.pop()
        for pkt in pkts:
            st["npkts"] += 1
            if st["first"]:
                st["first"] = False
                if len(pkt) >= 19 and pkt[:8] == b"OpusHead":
                    if pkt[8] & 0xF0:
                        raise ValueError("bad_frame")
                    st["codec"] = "opus"
                    st["ch"] = pkt[9]
                    st["preskip"] = struct.unpack("<H", pkt[10:12])[0]
                    st["rate"] = struct.unpack("<I", pkt[12:16])[0]
                    if st["ch"] == 0:
                        raise ValueError("bad_frame")
                elif len(pkt) >= 30 and pkt[0] == 1 and pkt[1:7] == b"vorbis":
                    if struct.unpack("<I", pkt[7:11])[0] != 0:
                        raise ValueError("bad_frame")
                    st["codec"] = "vorbis"
                    st["ch"] = pkt[11]
                    st["rate"] = struct.unpack("<I", pkt[12:16])[0]
                    if not (pkt[29] & 1):
                        raise ValueError("bad_frame")
                    if st["ch"] == 0 or st["rate"] == 0:
                        raise ValueError("bad_frame")
        if pg["ht"] & 4:
            close(st)
            del open_streams[pg["serial"]]
    if open_streams:
        raise ValueError("bad_frame")
    return done, len(pages)


def ogg_canon(data):
    streams, npages = ogg_parse(data)
    parts = [f"{npages}"]
    for s in streams:
        parts.append("|".join(str(s[k]) for k in
                              ("serial", "codec", "ch", "rate", "preskip",
                               "lastg", "npages", "npkts")))
    return hashlib.sha256("#".join(parts).encode()).hexdigest()


# --------------------------------------------------------------- mkv --


def mkv_parse(data):
    """mirror of graft.ops.Matroska.parse: returns the meta dict."""
    if len(data) < 4 or data[:4] != bytes([0x1A, 0x45, 0xDF, 0xA3]):
        raise ValueError("bad_magic")
    pos = 0
    n_elements = 0

    def read_id():
        nonlocal pos
        if pos >= len(data):
            raise ValueError("truncated")
        first = data[pos]
        if first == 0:
            raise ValueError("bad_frame")
        ln = 1
        while not (first & (0x80 >> (ln - 1))):
            ln += 1
        if ln > 4:
            raise ValueError("bad_frame")
        if pos + ln > len(data):
            raise ValueError("truncated")
        v = int.from_bytes(data[pos:pos + ln], "big")
        pos += ln
        return v

    def read_size():
        nonlocal pos
        if pos >= len(data):
            raise ValueError("truncated")
        first = data[pos]
        if first == 0:
            raise ValueError("bad_frame")
        ln = 1
        while not (first & (0x80 >> (ln - 1))):
            ln += 1
        if ln > 8:
            raise ValueError("bad_frame")
        if pos + ln > len(data):
            raise ValueError("truncated")
        v = first & (0xFF >> ln)
        for i in range(1, ln):
            v = (v << 8) | data[pos + i]
        pos += ln
        return -1 if v == (1 << (7 * ln)) - 1 else v

    def uint(ln):
        nonlocal pos
        if ln > 8:
            raise ValueError("bad_frame")
        if pos + ln > len(data):
            raise ValueError("truncated")
        v = int.from_bytes(data[pos:pos + ln], "big")
        pos += ln
        return v

    def flt(ln):
        nonlocal pos
        if ln == 0:
            return 0.0
        if pos + ln > len(data):
            raise ValueError("truncated")
        if ln == 4:
            v = struct.unpack(">f", data[pos:pos + 4])[0]
        elif ln == 8:
            v = struct.unpack(">d", data[pos:pos + 8])[0]
        else:
            raise ValueError("bad_frame")
        pos += ln
        return v

    def string(ln):
        nonlocal pos
        if pos + ln > len(data):
            raise ValueError("truncated")
        s = data[pos:pos + ln].decode("utf-8")  # strict, like the reader
        pos += ln
        return s.split("\x00")[0]

    meta = dict(doc_type="", version=1, scale=1000000, duration=-1.0,
                tracks=[], nclusters=0, first_ts=-1, last_ts=-1,
                nblocks=0, block_bytes=0)

    MAX_DEPTH = 16

    def children(end, depth, stop_ids=()):
        nonlocal pos, n_elements
        if depth > MAX_DEPTH:
            raise ValueError("bad_frame")
        bound = len(data) if end < 0 else end
        out = []
        while pos < bound:
            if end < 0 and stop_ids:
                save = pos
                i = read_id()
                pos = save
                if i in stop_ids:
                    return out
            n_elements += 1
            if n_elements > (1 << 20):
                raise ValueError("bad_frame")
            i = read_id()
            size = read_size()
            if size < 0 and i != 0x1F43B675:
                raise ValueError("bad_frame")
            if size >= 0 and pos + size > bound:
                raise ValueError("bad_frame")
            out.append((i, size))
            yield_visit(i, size, depth)
        if end >= 0 and pos != end:
            raise ValueError("bad_frame")
        return out

    def skip(n):
        nonlocal pos
        pos += n

    def yield_visit(i, size, depth):
        # dispatched by the caller's closure via visit stack
        visit_stack[-1](i, size, depth)

    visit_stack = []

    def walk(end, depth, visit, stop_ids=()):
        visit_stack.append(visit)
        try:
            children(end, depth, stop_ids)
        finally:
            visit_stack.pop()

    def track_entry(end, depth):
        t = dict(number=0, type=0, codec="", w=0, h=0, rate=0.0, ch=0)

        def v(i, size, d):
            if i == 0xD7:
                t["number"] = uint(size)
            elif i == 0x83:
                t["type"] = uint(size)
            elif i == 0x86:
                t["codec"] = string(size)
            elif i == 0xE0:
                def vv(j, sz, _):
                    if j == 0xB0:
                        t["w"] = uint(sz)
                    elif j == 0xBA:
                        t["h"] = uint(sz)
                    else:
                        skip(sz)
                walk(pos + size, d + 1, vv)
            elif i == 0xE1:
                def va(j, sz, _):
                    if j == 0xB5:
                        t["rate"] = flt(sz)
                    elif j == 0x9F:
                        t["ch"] = uint(sz)
                    else:
                        skip(sz)
                walk(pos + size, d + 1, va)
            else:
                skip(size)
        walk(end, depth, v)
        import math
        if (not math.isfinite(t["rate"])) or t["rate"] < 0 or \
                t["rate"] > 1.0e9:
            raise ValueError("bad_frame")
        return t

    def cluster(end, depth):
        meta["nclusters"] += 1
        ts = [-1]

        def v(i, size, _):
            if i == 0xE7:
                ts[0] = uint(size)
            elif i == 0xA3:
                if size < 4:
                    raise ValueError("bad_frame")
                meta["nblocks"] += 1
                meta["block_bytes"] += size
                skip(size)
            else:
                skip(size)
        # RFC 8794: an unknown-size cluster ends at ANY valid level-1
        # sibling, incl. trailing SeekHead/Cues/Chapters/Tags/Attachments
        walk(end, depth, v, stop_ids=(0x1F43B675, 0x1654AE6B, 0x1549A966,
                                      0x114D9B74, 0x1C53BB6B, 0x1043A770,
                                      0x1254C367, 0x1941A469))
        if ts[0] >= 0:
            if meta["first_ts"] < 0:
                meta["first_ts"] = ts[0]
            meta["last_ts"] = ts[0]

    n_elements += 1
    hid = read_id()
    hsize = read_size()
    if hid != 0x1A45DFA3 or hsize < 0:
        raise ValueError("bad_frame")
    if pos + hsize > len(data):
        raise ValueError("truncated")

    def vh(i, size, _):
        if i == 0x4282:
            meta["doc_type"] = string(size)
        elif i == 0x4287:
            meta["version"] = uint(size)
        else:
            skip(size)
    walk(pos + hsize, 1, vh)
    if meta["doc_type"] not in ("matroska", "webm"):
        raise ValueError("unsupported")

    if pos >= len(data):
        raise ValueError("truncated")
    n_elements += 1
    sid = read_id()
    ssize = read_size()
    if sid != 0x18538067:
        raise ValueError("bad_frame")
    seg_end = -1 if ssize < 0 else pos + ssize
    if seg_end > len(data):
        raise ValueError("truncated")

    def vs(i, size, d):
        if i == 0x1549A966:
            if size < 0:
                raise ValueError("bad_frame")

            def vi(j, sz, _):
                if j == 0x2AD7B1:
                    meta["scale"] = uint(sz)
                elif j == 0x4489:
                    meta["duration"] = flt(sz)
                    meta["duration_seen"] = True
                else:
                    skip(sz)
            walk(pos + size, d + 1, vi)
        elif i == 0x1654AE6B:
            if size < 0:
                raise ValueError("bad_frame")

            def vt(j, sz, dd):
                if j == 0xAE:
                    meta["tracks"].append(track_entry(pos + sz, dd + 1))
                else:
                    skip(sz)
            walk(pos + size, d + 1, vt)
        elif i == 0x1F43B675:
            cluster(-1 if size < 0 else pos + size, d + 1)
        else:
            if size < 0:
                raise ValueError("bad_frame")
            skip(size)
    walk(seg_end, 1, vs)
    if pos != len(data):
        raise ValueError("bad_frame")
    import math
    if meta.get("duration_seen") and (
            not math.isfinite(meta["duration"]) or meta["duration"] < 0 or
            meta["duration"] * meta["scale"] > 4.0e18):
        raise ValueError("bad_frame")
    dur_ms = 0 if meta["duration"] < 0 else \
        int(meta["duration"] * meta["scale"]) // 1000000
    meta["dur_ms"] = dur_ms
    return meta


def mkv_canon(data):
    m = mkv_parse(data)
    parts = [m["doc_type"], str(m["version"]), str(m["scale"]),
             str(m["dur_ms"]), str(m["nclusters"]), str(m["first_ts"]),
             str(m["last_ts"]), str(m["nblocks"]), str(m["block_bytes"])]
    for t in m["tracks"]:
        parts.append("|".join([str(t["number"]), str(t["type"]), t["codec"],
                               str(t["w"]), str(t["h"]),
                               str(int(t["rate"])), str(t["ch"])]))
    return hashlib.sha256("#".join(parts).encode()).hexdigest()


# ------------------------------------------------------------- main --


def run(kind, files, canon):
    rows = []
    n_ok = n_fail = 0
    for name in files:
        base = open(os.path.join(FIX, name), "rb").read()
        h = canon(base)  # fixture itself must parse
        rows.append((name, -1, 0, "ok", h))
        for p in range(len(base)):
            for x in XORS:
                m = bytearray(base)
                m[p] ^= x
                try:
                    h = canon(bytes(m))
                    rows.append((name, p, x, "ok", h))
                    n_ok += 1
                except Exception:
                    rows.append((name, p, x, "fail", ""))
                    n_fail += 1
    with open(os.path.join(OUT, f"{kind}.tsv"), "w") as f:
        for r in rows:
            f.write("\t".join(str(c) for c in r).rstrip() + "\n")
    print(f"{kind}: {len(rows)} rows ({n_ok} ok, {n_fail} fail)")


def main():
    os.makedirs(OUT, exist_ok=True)
    run("ogg", ["ogg_opus.ogg", "ogg_vorbis.ogg", "ogg_span.ogg",
                "ogg_chain.ogg", "ogg_mux.ogg"], ogg_canon)
    run("mkv", ["mkv_webm.webm", "mkv_matroska.mkv", "mkv_stream.webm",
                "mkv_padded.webm"], mkv_canon)


if __name__ == "__main__":
    main()
