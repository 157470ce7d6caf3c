#!/usr/bin/env python3
"""Independent FLAC metadata fixture writer — transcribed from the public
FLAC format spec (NOT ported from the Scala codec): `fLaC` magic, block
headers of is-last(1)|type(7)|length(24 BE), the 34-byte bit-packed
STREAMINFO, and the Vorbis-comment block's LITTLE-endian strings.

Fixtures:
  - flac_basic.flac     STREAMINFO only (44.1k stereo 16-bit, known md5)
  - flac_tagged.flac    STREAMINFO + VORBIS_COMMENT (utf8 values) + PADDING
  - flac_exotic.flac    20-bit 8-channel 96k with a SEEKTABLE-typed block
                        (type 3, opaque to the reader) between the two
  - flac_expected.json  the parsed fields

Run from repo root: python3 tools/make_flac_fixture.py
"""
import json, os, struct

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")


def streaminfo(rate, ch, bps, samples, md5hex):
    packed = (rate << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | samples
    return (struct.pack(">HH", 4096, 4096) + b"\x00" * 6 +
            struct.pack(">Q", packed) + bytes.fromhex(md5hex))


def block(typ, body, last):
    return bytes([(0x80 if last else 0) | typ]) + struct.pack(">I", len(body))[1:] + body


def vorbis(vendor, comments):
    out = struct.pack("<I", len(vendor.encode())) + vendor.encode()
    out += struct.pack("<I", len(comments))
    for k, v in comments:
        c = f"{k}={v}".encode()
        out += struct.pack("<I", len(c)) + c
    return out


def main():
    os.makedirs(OUT, exist_ok=True)
    exp = {}

    md5a = "0123456789abcdef0123456789abcdef"
    basic = b"fLaC" + block(0, streaminfo(44100, 2, 16, 1234567, md5a), True)
    open(os.path.join(OUT, "flac_basic.flac"), "wb").write(basic)
    exp["flac_basic"] = {"rate": 44100, "ch": 2, "bps": 16,
                         "samples": 1234567, "md5": md5a, "blocks": 1}

    md5b = "ffeeddccbbaa99887766554433221100"
    tagged = (b"fLaC"
              + block(0, streaminfo(16000, 1, 24, 99, md5b), False)
              + block(4, vorbis("ref-enc 1.0",
                                [("TITLE", "héllo γδ"), ("ARTIST", "x"),
                                 ("title", "lower-key folds up")]), False)
              + block(1, b"\x00" * 64, True))
    open(os.path.join(OUT, "flac_tagged.flac"), "wb").write(tagged)
    exp["flac_tagged"] = {
        "rate": 16000, "ch": 1, "bps": 24, "samples": 99, "md5": md5b,
        "vendor": "ref-enc 1.0", "blocks": 3, "padding": 64,
        "comments": [["TITLE", "héllo γδ"], ["ARTIST", "x"],
                     ["TITLE", "lower-key folds up"]]}

    md5c = "00" * 16
    exotic = (b"fLaC"
              + block(0, streaminfo(96000, 8, 20, (1 << 36) - 1, md5c), False)
              + block(3, b"\x00" * 18, False)   # seektable: opaque
              + block(4, vorbis("", []), True))
    open(os.path.join(OUT, "flac_exotic.flac"), "wb").write(exotic)
    exp["flac_exotic"] = {"rate": 96000, "ch": 8, "bps": 20,
                          "samples": (1 << 36) - 1, "md5": md5c, "blocks": 3}

    with open(os.path.join(OUT, "flac_expected.json"), "w") as f:
        json.dump(exp, f, indent=1)
    print("flac fixtures written to", OUT)


if __name__ == "__main__":
    main()
