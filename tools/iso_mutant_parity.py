#!/usr/bin/env python3
"""Differential mutant-parity oracle for the ISOBMFF walk: an
INDEPENDENT python reader of ISO 14496-12 (box framing incl. largesize
and size-0, moov/mvhd/trak/tkhd/mdhd/hdlr/stsd/stts/stsz, the HEIF
meta/iinf/infe/iprp/ipco/ispe item walk, and the fMP4
moof/mfhd/traf/tfhd/trun chain with §8.8 trex/tfhd default resolution)
vs graft.ops.Isobmff.parseSafe. No third-party mp4 parser exists in
this container, so both sides are clean-room transcriptions of the same
spec — the harness catches asymmetric drift: one side accepting what
the other refuses, or both accepting with different metadata.

Bases come from the Scala dump step (the mm23/25/26 fixture shapes).
For every single-byte XOR mutant (x4 values): ok -> sha256 of the
canonical metadata string, else fail.

Run (after `sbt "runMain graft.tools.IsoParity --dump /tmp/iso_parity"`):
  python3 tools/iso_mutant_parity.py
then: sbt "runMain graft.tools.IsoParity /tmp/iso_parity"
"""
import glob
import hashlib
import os

OUT = "/tmp/iso_parity"
XORS = [0x01, 0x10, 0x80, 0xFF]
MAX_DEPTH = 16
MAX_BOXES = 1 << 16


class Bad(Exception):
    pass


def parse(b):
    if len(b) < 8:
        raise Bad("truncated")
    if b[4:8] != b"ftyp":
        raise Bad("bad_magic")
    state = dict(major="", compat=[], timescale=0, duration=0, tracks=[],
                 item_codec="", item_w=0, item_h=0, fragments=[],
                 trex_dur={}, trex_size={}, boxes=0)

    def u16(i):
        return (b[i] << 8) | b[i + 1]

    def u32(i):
        return int.from_bytes(b[i:i + 4], "big")

    def u64(i):
        return int.from_bytes(b[i:i + 8], "big")

    def fourcc(i):
        for k in range(i, i + 4):
            if b[k] < 0x20 or b[k] > 0x7E:
                raise Bad("bad_frame")
        return b[i:i + 4].decode("ascii")

    def fullbox(off, end):
        if end - off < 4:
            raise Bad("truncated")
        return b[off]

    def children(off, end, depth, visit):
        if depth > MAX_DEPTH:
            raise Bad("bad_frame")
        p = off
        while p < end:
            if end - p < 8:
                raise Bad("truncated")
            state["boxes"] += 1
            if state["boxes"] > MAX_BOXES:
                raise Bad("too_large")
            size0 = u32(p)
            tpe = fourcc(p + 4)
            hdr = 8
            if size0 == 1:
                if end - p < 16:
                    raise Bad("truncated")
                hdr = 16
                size = u64(p + 8)
            elif size0 == 0:
                size = end - p
            else:
                size = size0
            if size < hdr:
                raise Bad("bad_frame")
            if size > end - p:
                raise Bad("truncated")
            visit(tpe, p + hdr, p + size)
            p += size

    def visual_dims(off, end):
        if end - off < 28:
            raise Bad("truncated")
        return u16(off + 24), u16(off + 26)

    def stsd(off, end, handler, depth):
        if fullbox(off, end) != 0:
            raise Bad("bad_frame")
        if end - off < 8:
            raise Bad("truncated")
        n = u32(off + 4)
        if n < 1 or n > 64:
            raise Bad("bad_frame")
        out = {"codec": "", "w": 0, "h": 0}

        def v(tpe, po, pe):
            if not out["codec"]:
                out["codec"] = tpe
                if handler == "vide":
                    out["w"], out["h"] = visual_dims(po, pe)
        children(off + 8, end, depth + 1, v)
        if not out["codec"]:
            raise Bad("bad_frame")
        return out["codec"], out["w"], out["h"]

    def trak(off, end, depth):
        t = dict(id=0, tw=0, th=0, tdur=0, handler="", codec="",
                 media_ts=0, n_samples=0, sample_bytes=0, media_dur=0)

        def v(tpe, po, pe):
            if tpe == "tkhd":
                ver = fullbox(po, pe)
                body = po + 4
                need = 92 if ver == 1 else 80 if ver == 0 else None
                if need is None:
                    raise Bad("bad_frame")
                if pe - body < need:
                    raise Bad("truncated")
                if ver == 1:
                    t["id"] = u32(body + 16)
                    t["tdur"] = u64(body + 24)
                    t["tw"] = u32(body + 84) >> 16
                    t["th"] = u32(body + 88) >> 16
                else:
                    t["id"] = u32(body + 8)
                    t["tdur"] = u32(body + 16)
                    t["tw"] = u32(body + 72) >> 16
                    t["th"] = u32(body + 76) >> 16
            elif tpe == "mdia":
                def vm(tm, mo, me):
                    if tm == "hdlr":
                        if me - mo < 12:
                            raise Bad("truncated")
                        t["handler"] = fourcc(mo + 8)
                    elif tm == "mdhd":
                        ver = fullbox(mo, me)
                        body = mo + 4
                        if ver == 1:
                            if me - body < 28:
                                raise Bad("truncated")
                            t["media_ts"] = u32(body + 16)
                        elif ver == 0:
                            if me - body < 16:
                                raise Bad("truncated")
                            t["media_ts"] = u32(body + 8)
                        else:
                            raise Bad("bad_frame")
                    elif tm == "minf":
                        def vf(ts_, so, se):
                            if ts_ == "stbl":
                                def vs(tx, xo, xe):
                                    if tx == "stsd":
                                        c, cw, ch = stsd(xo, xe,
                                                         t["handler"],
                                                         depth + 5)
                                        t["codec"] = c
                                        if t["handler"] == "vide":
                                            t["tw"], t["th"] = cw, ch
                                    elif tx == "stts":
                                        if fullbox(xo, xe) != 0:
                                            raise Bad("bad_frame")
                                        if xe - xo < 8:
                                            raise Bad("truncated")
                                        n_ent = u32(xo + 4)
                                        if n_ent > (xe - xo - 8) // 8:
                                            raise Bad("truncated")
                                        for e in range(n_ent):
                                            cnt = u32(xo + 8 + e * 8)
                                            delta = u32(xo + 12 + e * 8)
                                            if cnt and delta > (1 << 62) // cnt:
                                                raise Bad("bad_frame")
                                            t["n_samples"] += cnt
                                            t["media_dur"] += cnt * delta
                                            if (t["n_samples"] > 1 << 48 or
                                                    t["media_dur"] > 1 << 62):
                                                raise Bad("bad_frame")
                                    elif tx == "stsz":
                                        if fullbox(xo, xe) != 0:
                                            raise Bad("bad_frame")
                                        if xe - xo < 12:
                                            raise Bad("truncated")
                                        fixed = u32(xo + 4)
                                        cnt = u32(xo + 8)
                                        if fixed:
                                            if cnt and fixed > (1 << 62) // cnt:
                                                raise Bad("bad_frame")
                                            t["sample_bytes"] = fixed * cnt
                                        else:
                                            if cnt > (xe - xo - 12) // 4:
                                                raise Bad("truncated")
                                            for e in range(cnt):
                                                t["sample_bytes"] += \
                                                    u32(xo + 12 + e * 4)
                                children(so, se, depth + 4, vs)
                        children(mo, me, depth + 3, vf)
                children(po, pe, depth + 2, vm)
        children(off, end, depth + 1, v)
        if t["id"] == 0:
            raise Bad("bad_frame")
        if not t["handler"]:
            raise Bad("bad_frame")
        state["tracks"].append(t)

    def meta_box(off, end, depth):
        if fullbox(off, end) != 0:
            raise Bad("bad_frame")

        def v(tpe, po, pe):
            if tpe == "hdlr":
                if pe - po < 12:
                    raise Bad("truncated")
                if fourcc(po + 8) != "pict":
                    raise Bad("bad_frame")
            elif tpe == "iinf":
                ver = fullbox(po, pe)
                skip = 2 if ver == 0 else 4

                def vi(ti, io, ie):
                    if ti == "infe":
                        iv = fullbox(io, ie)
                        if iv < 2:
                            raise Bad("bad_frame")
                        at = io + 4 + (4 if iv == 2 else 6)
                        if ie - at < 4:
                            raise Bad("truncated")
                        if not state["item_codec"]:
                            state["item_codec"] = fourcc(at)
                children(po + 4 + skip, pe, depth + 2, vi)
            elif tpe == "iprp":
                def vp(tp, co, ce):
                    if tp == "ipco":
                        def vc(tc, so, se):
                            if tc == "ispe":
                                if fullbox(so, se) != 0:
                                    raise Bad("bad_frame")
                                if se - so < 12:
                                    raise Bad("truncated")
                                iw, ih = u32(so + 4), u32(so + 8)
                                if iw > 0x7FFFFFFF or ih > 0x7FFFFFFF:
                                    raise Bad("bad_frame")
                                state["item_w"] = iw
                                state["item_h"] = ih
                        children(co, ce, depth + 3, vc)
                children(po, pe, depth + 2, vp)
        children(off + 4, end, depth + 1, v)

    def moof(off, end, depth):
        seq = [0]

        def v(tpe, po, pe):
            if tpe == "mfhd":
                if fullbox(po, pe) != 0:
                    raise Bad("bad_frame")
                if pe - po < 8:
                    raise Bad("truncated")
                seq[0] = u32(po + 4)
            elif tpe == "traf":
                tr = dict(track=0, def_dur=-1, def_size=-1,
                          n=0, bytes=0, dur=0)

                def vt(tt, to, te):
                    if tt == "tfhd":
                        if fullbox(to, te) != 0:
                            raise Bad("bad_frame")
                        flags = u32(to) & 0xFFFFFF
                        if te - to < 8:
                            raise Bad("truncated")
                        tr["track"] = u32(to + 4)
                        p = [to + 8]

                        def take(n):
                            if te - p[0] < n:
                                raise Bad("truncated")
                            at = p[0]
                            p[0] += n
                            return at
                        if flags & 0x01:
                            take(8)
                        if flags & 0x02:
                            take(4)
                        if flags & 0x08:
                            tr["def_dur"] = u32(take(4))
                        if flags & 0x10:
                            tr["def_size"] = u32(take(4))
                        if flags & 0x20:
                            take(4)
                    elif tt == "trun":
                        ver = fullbox(to, te)
                        if ver > 1:
                            raise Bad("bad_frame")
                        flags = u32(to) & 0xFFFFFF
                        if te - to < 8:
                            raise Bad("truncated")
                        cnt = u32(to + 4)
                        p = to + 8
                        if flags & 0x01:
                            p += 4
                        if flags & 0x04:
                            p += 4
                        per_dur = bool(flags & 0x100)
                        per_size = bool(flags & 0x200)
                        per_flags = bool(flags & 0x400)
                        per_cts = bool(flags & 0x800)
                        entry = 4 * sum([per_dur, per_size, per_flags,
                                         per_cts])
                        if entry > 0 and cnt > (te - p) // max(1, entry) + 1:
                            raise Bad("truncated")
                        if entry > 0 and p + cnt * entry > te:
                            raise Bad("truncated")
                        d_dur = tr["def_dur"] if tr["def_dur"] >= 0 else \
                            state["trex_dur"].get(tr["track"], -1)
                        d_size = tr["def_size"] if tr["def_size"] >= 0 else \
                            state["trex_size"].get(tr["track"], -1)
                        if not per_dur and d_dur < 0:
                            raise Bad("bad_frame")
                        if not per_size and d_size < 0:
                            raise Bad("bad_frame")
                        if entry == 0:
                            if d_dur > 0 and cnt > (1 << 62) // max(1, d_dur):
                                raise Bad("bad_frame")
                            if d_size > 0 and cnt > (1 << 62) // max(1, d_size):
                                raise Bad("bad_frame")
                            tr["dur"] += d_dur * cnt
                            tr["bytes"] += d_size * cnt
                        else:
                            for _ in range(cnt):
                                if per_dur:
                                    tr["dur"] += u32(p)
                                    p += 4
                                else:
                                    tr["dur"] += d_dur
                                if per_size:
                                    tr["bytes"] += u32(p)
                                    p += 4
                                else:
                                    tr["bytes"] += d_size
                                if per_flags:
                                    p += 4
                                if per_cts:
                                    p += 4
                                if tr["dur"] > 1 << 62 or \
                                        tr["bytes"] > 1 << 62:
                                    raise Bad("bad_frame")
                        tr["n"] += cnt
                        if tr["n"] > 1 << 48:
                            raise Bad("bad_frame")
                children(po, pe, depth + 2, vt)
                if tr["track"] == 0:
                    raise Bad("bad_frame")
                state["fragments"].append(
                    (seq[0], tr["track"], tr["n"], tr["bytes"], tr["dur"]))
        children(off, end, depth + 1, v)

    def top(tpe, po, pe):
        if tpe == "ftyp":
            if pe - po < 8:
                raise Bad("truncated")
            state["major"] = fourcc(po)
            p = po + 8
            while p + 4 <= pe:
                state["compat"].append(fourcc(p))
                p += 4
        elif tpe == "moof":
            moof(po, pe, 1)
        elif tpe == "moov":
            def vm(tm, xo, xe):
                if tm == "mvex":
                    def vx(tx, to, te):
                        if tx == "trex":
                            if fullbox(to, te) != 0:
                                raise Bad("bad_frame")
                            if te - to < 24:
                                raise Bad("truncated")
                            tid = u32(to + 4)
                            state["trex_dur"][tid] = u32(to + 12)
                            state["trex_size"][tid] = u32(to + 16)
                    children(xo, xe, 2, vx)
                elif tm == "mvhd":
                    ver = fullbox(xo, xe)
                    body = xo + 4
                    if ver == 1:
                        if xe - body < 28:
                            raise Bad("truncated")
                        state["timescale"] = u32(body + 16)
                        state["duration"] = u64(body + 20)
                    elif ver == 0:
                        if xe - body < 16:
                            raise Bad("truncated")
                        state["timescale"] = u32(body + 8)
                        state["duration"] = u32(body + 12)
                    else:
                        raise Bad("bad_frame")
                elif tm == "trak":
                    trak(xo, xe, 2)
            children(po, pe, 1, vm)
        elif tpe == "meta":
            meta_box(po, pe, 1)
    children(0, len(b), 0, top)
    if not state["major"]:
        raise Bad("bad_magic")
    return state


def canon(b):
    s = parse(b)
    parts = [s["major"], ",".join(s["compat"]), str(s["timescale"]),
             str(s["duration"]), s["item_codec"], str(s["item_w"]),
             str(s["item_h"])]
    for t in s["tracks"]:
        parts.append("|".join(str(t[k]) for k in
                              ("id", "handler", "codec", "tw", "th", "tdur",
                               "media_ts", "n_samples", "sample_bytes",
                               "media_dur")))
    for f in s["fragments"]:
        parts.append("|".join(str(x) for x in f))
    return hashlib.sha256("#".join(parts).encode()).hexdigest()


def main():
    bases = sorted(glob.glob(os.path.join(OUT, "iso_[0-9]*.bin")))
    assert bases, "run the Scala dump first: " \
        "sbt 'runMain graft.tools.IsoParity --dump /tmp/iso_parity'"
    rows = []
    n_ok = n_fail = 0
    for path in bases:
        i = int(os.path.basename(path)[4:-4])
        base = open(path, "rb").read()
        rows.append((i, -1, 0, "ok", canon(base)))
        for pos in range(len(base)):
            for x in XORS:
                m = bytearray(base)
                m[pos] ^= x
                try:
                    rows.append((i, pos, x, "ok", canon(bytes(m))))
                    n_ok += 1
                except Exception:
                    rows.append((i, pos, x, "fail", ""))
                    n_fail += 1
    with open(os.path.join(OUT, "iso.tsv"), "w") as f:
        for r in rows:
            f.write("\t".join(str(c) for c in r).rstrip() + "\n")
    print(f"iso: {len(rows)} rows ({n_ok} ok, {n_fail} fail) from "
          f"{len(bases)} bases")


if __name__ == "__main__":
    main()
