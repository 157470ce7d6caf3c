#!/usr/bin/env python3
"""ISOBMFF fixtures — an independent python transcription of the public
box layout (ISO/IEC 14496-12 §4.2/8.2/8.3/8.4/12.1; HEIF items per
ISO/IEC 23008-12) pinning graft.ops.Isobmff: an MP4 with video+audio
tracks (v0 and v1 full boxes, a 64-bit largesize box, unknown boxes to
skip), a HEIF/AVIF still (meta/hdlr/iinf/infe/iprp/ipco/ispe), and
expected metadata as JSON. The Scala reader must recover every field.

Run from repo root: python3 tools/make_isobmff_fixture.py
"""
import json
import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")


def box(tpe, *payload, largesize=False):
    body = b"".join(payload)
    if largesize:
        return struct.pack(">I", 1) + tpe.encode() + \
            struct.pack(">Q", 16 + len(body)) + body
    return struct.pack(">I", 8 + len(body)) + tpe.encode() + body


def full(tpe, version, flags, *payload):
    return box(tpe, struct.pack(">B", version) + struct.pack(">I", flags)[1:],
               *payload)


def u16(v):
    return struct.pack(">H", v)


def u32(v):
    return struct.pack(">I", v)


def u64(v):
    return struct.pack(">Q", v)


def matrix():
    return u32(0x10000) + u32(0) + u32(0) + u32(0) + u32(0x10000) + u32(0) \
        + u32(0) + u32(0) + u32(0x40000000)


def hdlr(handler):
    return full("hdlr", 0, 0, u32(0), handler.encode(), b"\x00" * 12, b"\x00")


def mp4():
    ftyp = box("ftyp", b"isom", u32(512), b"isom", b"avc1", b"mp41")
    # v1 mvhd (64-bit times) — exercises the version-1 arm
    mvhd = full("mvhd", 1, 0, u64(0), u64(0), u32(90000), u64(5400000),
                u32(0x10000), u16(0x100), u16(0), u32(0), u32(0), matrix(),
                b"\x00" * 24, u32(0xFFFFFFFF))
    # video track: v0 tkhd, avc1 sample entry 1920x1080
    tkhd_v = full("tkhd", 0, 7, u32(0), u32(0), u32(1), u32(0), u32(5400000),
                  b"\x00" * 8, u16(0), u16(0), u16(0), u16(0), matrix(),
                  u32(1920 << 16), u32(1080 << 16))
    avc1 = box("avc1", b"\x00" * 6, u16(1), b"\x00" * 16, u16(1920), u16(1080),
               u32(0x480000), u32(0x480000), u32(0), u16(1), b"\x00" * 32,
               u16(0x18), u16(0xFFFF))
    stsd_v = full("stsd", 0, 0, u32(1), avc1)
    # sample tables: mdhd media timescale, two stts runs, per-sample stsz
    mdhd_v = full("mdhd", 0, 0, u32(0), u32(0), u32(12800), u32(768000),
                  u16(0x55C4), u16(0))
    stts_v = full("stts", 0, 0, u32(2), u32(100), u32(512), u32(50), u32(256))
    sizes = [800 + (7 * k) % 31 for k in range(150)]
    stsz_v = full("stsz", 0, 0, u32(0), u32(len(sizes)),
                  b"".join(u32(s) for s in sizes))
    stco_v = full("stco", 0, 0, u32(1), u32(0))
    trak_v = box("trak", tkhd_v,
                 box("mdia", mdhd_v, hdlr("vide"),
                     box("minf", box("stbl", stsd_v, stts_v, stsz_v, stco_v))))
    # audio track: v1 tkhd, mp4a entry
    tkhd_a = full("tkhd", 1, 7, u64(0), u64(0), u32(2), u32(0), u64(5390000),
                  b"\x00" * 8, u16(0), u16(0), u16(0x100), u16(0), matrix(),
                  u32(0), u32(0))
    mp4a = box("mp4a", b"\x00" * 6, u16(1), b"\x00" * 8, u16(2), u16(16),
               u32(0), u32(48000 << 16))
    stsd_a = full("stsd", 0, 0, u32(1), mp4a)
    trak_a = box("trak", tkhd_a,
                 box("mdia", hdlr("soun"),
                     box("minf", box("stbl", stsd_a))))
    moov = box("moov", mvhd, trak_v, trak_a)
    free = box("free", b"skip me")
    # mdat with a 64-bit largesize header — the size==1 arm
    mdat = box("mdat", b"\x00" * 32, largesize=True)
    return ftyp + free + moov + mdat


def fmp4():
    # fragmented (CMAF) form: moov carries trex defaults and an EMPTY
    # stbl; two moofs — one with per-sample dur+size trun (flags 0x300),
    # one defaults-driven (flags 0) — exercise both §8.8 arms
    ftyp = box("ftyp", b"cmfc", u32(0), b"iso6", b"cmfc")
    mvhd = full("mvhd", 0, 0, u32(0), u32(0), u32(24000), u32(0),
                u32(0x10000), u16(0x100), u16(0), u32(0), u32(0), matrix(),
                b"\x00" * 24, u32(0xFFFFFFFF))
    tkhd = full("tkhd", 0, 7, u32(0), u32(0), u32(5), u32(0), u32(0),
                b"\x00" * 8, u16(0), u16(0), u16(0), u16(0), matrix(),
                u32(1280 << 16), u32(720 << 16))
    avc1 = box("avc1", b"\x00" * 6, u16(1), b"\x00" * 16, u16(1280), u16(720),
               u32(0x480000), u32(0x480000), u32(0), u16(1), b"\x00" * 32,
               u16(0x18), u16(0xFFFF))
    stbl = box("stbl", full("stsd", 0, 0, u32(1), avc1))
    mdia = box("mdia",
               full("mdhd", 0, 0, u32(0), u32(0), u32(24000), u32(0),
                    u16(0x55C4), u16(0)),
               hdlr("vide"), box("minf", stbl))
    trex = full("trex", 0, 0, u32(5), u32(1), u32(1001), u32(4096), u32(0))
    moov = box("moov", mvhd, box("trak", tkhd, mdia), box("mvex", trex))
    samples = [(1001, 5000 + 13 * k) for k in range(24)]
    trun1 = full("trun", 0, 0x300, u32(len(samples)),
                 b"".join(u32(d) + u32(s) for d, s in samples))
    moof1 = box("moof", full("mfhd", 0, 0, u32(1)),
                box("traf", full("tfhd", 0, 0, u32(5)), trun1))
    trun2 = full("trun", 0, 0, u32(48))
    moof2 = box("moof", full("mfhd", 0, 0, u32(2)),
                box("traf", full("tfhd", 0, 0, u32(5)), trun2))
    data = ftyp + moov + moof1 + box("mdat") + moof2 + box("mdat")
    expected = [
        {"seq": 1, "track": 5, "n": 24,
         "bytes": sum(s for _, s in samples),
         "dur": sum(d for d, _ in samples)},
        {"seq": 2, "track": 5, "n": 48, "bytes": 48 * 4096, "dur": 48 * 1001},
    ]
    return data, expected


def avif():
    ftyp = box("ftyp", b"avif", u32(0), b"avif", b"mif1", b"miaf")
    infe = full("infe", 2, 0, u16(1), u16(0), b"av01", b"\x00")
    iinf = full("iinf", 0, 0, u16(1), infe)
    ispe = full("ispe", 0, 0, u32(800), u32(600))
    # an unknown property the walk must skip without complaint
    pixi = full("pixi", 0, 0, b"\x03\x08\x08\x08")
    ipco = box("ipco", ispe, pixi)
    iprp = box("iprp", ipco)
    meta = full("meta", 0, 0, hdlr("pict"), iinf, iprp)
    return ftyp + meta + box("mdat", b"\x00" * 8)


def main():
    os.makedirs(OUT, exist_ok=True)
    m = mp4()
    a = avif()
    fm, fexp = fmp4()
    with open(os.path.join(OUT, "isobmff_video.mp4"), "wb") as f:
        f.write(m)
    with open(os.path.join(OUT, "isobmff_still.avif"), "wb") as f:
        f.write(a)
    with open(os.path.join(OUT, "isobmff_frag.mp4"), "wb") as f:
        f.write(fm)
    expected = {
        "mp4": {
            "major": "isom", "compat": ["isom", "avc1", "mp41"],
            "timescale": 90000, "duration": 5400000,
            "tracks": [
                {"id": 1, "handler": "vide", "codec": "avc1",
                 "w": 1920, "h": 1080, "duration": 5400000,
                 "media_ts": 12800, "n_samples": 150,
                 "sample_bytes": sum(800 + (7 * k) % 31 for k in range(150)),
                 "media_dur": 100 * 512 + 50 * 256},
                {"id": 2, "handler": "soun", "codec": "mp4a",
                 "w": 0, "h": 0, "duration": 5390000,
                 "media_ts": 0, "n_samples": 0, "sample_bytes": 0,
                 "media_dur": 0}],
        },
        "avif": {
            "major": "avif", "compat": ["avif", "mif1", "miaf"],
            "item_type": "av01", "w": 800, "h": 600,
        },
        "fmp4": {"major": "cmfc", "track": 5, "w": 1280, "h": 720,
                 "fragments": fexp},
    }
    with open(os.path.join(OUT, "isobmff_expected.json"), "w") as f:
        json.dump(expected, f, indent=1)
    print(f"isobmff fixtures written: mp4 {len(m)}B, avif {len(a)}B")


if __name__ == "__main__":
    main()
