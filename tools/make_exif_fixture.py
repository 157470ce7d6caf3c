#!/usr/bin/env python3
"""Independent EXIF-in-JPEG fixture writer — a direct transcription of the
JPEG marker grammar (ITU-T T.81 §B) and the EXIF TIFF-IFD layout (TIFF 6.0
/ EXIF 2.3). PIL is not in this container, so this is the sibling-encoder
pattern: written from the specs, NOT ported from the Scala codec. Layouts
deliberately differ from graft's writer (entry order permutations within
the ascending-tag rule, value placement choices, an EXIF sub-IFD, extra
unknown tags, padding between value blocks) so the READER is pinned, not
the writer's framing habits.

Fixtures:
  - exif_le.jpg / exif_be.jpg   II and MM byte orders; orientation 6/3,
                                DateTime, Make/Model, GPS sub-IFD,
                                EXIF sub-IFD, unknown tags, value padding
  - exif_nogps.jpg              no GPS pointer
  - exif_none.jpg               JPEG with APP0+COM but NO EXIF at all
  - exif_expected.json          the fields the reader must surface

Run from repo root: python3 tools/make_exif_fixture.py
"""
import json, os, struct

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")


def tiff(le, orientation, datetime, make, model, gps, exif_ifd, pad=6):
    e = "<" if le else ">"
    order = b"II" if le else b"MM"

    def u16(v): return struct.pack(e + "H", v)
    def u32(v): return struct.pack(e + "I", v)

    # strings (NUL-terminated)
    dt = datetime.encode() + b"\x00"
    mk = make.encode() + b"\x00"
    md = model.encode() + b"\x00"

    entries = []  # (tag, type, count, inline_or_none, data_or_none)
    entries.append((0x010F, 2, len(mk), None, mk))
    entries.append((0x0110, 2, len(md), None, md))
    entries.append((0x0112, 3, 1, u16(orientation) + b"\x00\x00", None))
    entries.append((0x011A, 5, 1, None, u32(72) + u32(1)))  # XResolution, unknown-to-reader
    entries.append((0x0132, 2, len(dt), None, dt))
    ifd0_extra = []
    if exif_ifd:
        entries.append((0x8769, 4, 1, "EXIFPTR", None))
    if gps:
        entries.append((0x8825, 4, 1, "GPSPTR", None))

    n = len(entries)
    ifd0_size = 2 + 12 * n + 4
    data_off = 8 + ifd0_size + pad  # deliberate padding gap
    blobs = b""
    fixed = []
    for tag, tp, cnt, inline, data in entries:
        if inline is not None and inline not in ("EXIFPTR", "GPSPTR"):
            fixed.append((tag, tp, cnt, inline))
        elif inline in ("EXIFPTR", "GPSPTR"):
            fixed.append((tag, tp, cnt, inline))
        else:
            fixed.append((tag, tp, cnt, u32(data_off + len(blobs))))
            blobs += data

    # sub-IFDs after the value blobs
    sub_off = data_off + len(blobs)
    exif_bytes = b""
    if exif_ifd:
        # one entry: ExifVersion (tag 0x9000, UNDEFINED, inline "0230")
        exif_bytes = u16(1) + u16(0x9000) + u16(7) + u32(4) + b"0230" + u32(0)
    gps_off = sub_off + len(exif_bytes)
    gps_bytes = b""
    if gps:
        # two entries: GPSLatitudeRef "N\0", GPSLatitude (1 rational, offset)
        rat_off = gps_off + 2 + 12 * 2 + 4
        gps_bytes = (u16(2) +
                     u16(0x0001) + u16(2) + u32(2) + b"N\x00\x00\x00" +
                     u16(0x0002) + u16(5) + u32(1) + u32(rat_off) +
                     u32(0) +
                     u32(gps[0]) + u32(gps[1]))

    out = order + u16(42) + u32(8)
    out += u16(n)
    for tag, tp, cnt, inline in fixed:
        if inline == "EXIFPTR":
            out += u16(tag) + u16(tp) + u32(cnt) + u32(sub_off)
        elif inline == "GPSPTR":
            out += u16(tag) + u16(tp) + u32(cnt) + u32(gps_off)
        else:
            out += u16(tag) + u16(tp) + u32(cnt) + inline
    out += u32(0)  # next IFD
    out += b"\x00" * pad
    out += blobs + exif_bytes + gps_bytes
    return out


def jpeg(segments):
    out = b"\xff\xd8"
    for marker, payload in segments:
        out += bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload
    return out + b"\xff\xd9"


app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"

le = jpeg([(0xE0, app0),
           (0xE1, b"Exif\x00\x00" + tiff(True, 6, "2023:05:17 08:30:00",
                                         "FixtureCam", "ModelX",
                                         (4530, 100), True))])
be = jpeg([(0xE1, b"Exif\x00\x00" + tiff(False, 3, "2021:12:31 23:59:59",
                                         "BigEndianWorks", "MM-1",
                                         (1, 3), True)),
           (0xFE, b"a comment after the exif block")])
nogps = jpeg([(0xE0, app0),
              (0xE1, b"Exif\x00\x00" + tiff(True, 1, "2020:01:01 00:00:00",
                                            "NoGps", "Zero", None, False))])
none = jpeg([(0xE0, app0), (0xFE, b"no exif here at all")])

for name, data in [("exif_le.jpg", le), ("exif_be.jpg", be),
                   ("exif_nogps.jpg", nogps), ("exif_none.jpg", none)]:
    with open(os.path.join(OUT, name), "wb") as f:
        f.write(data)

with open(os.path.join(OUT, "exif_expected.json"), "w") as f:
    json.dump({
        "exif_le": {"orientation": 6, "dateTime": "2023:05:17 08:30:00",
                    "make": "FixtureCam", "model": "ModelX",
                    "hasGps": True, "hasExifIfd": True},
        "exif_be": {"orientation": 3, "dateTime": "2021:12:31 23:59:59",
                    "make": "BigEndianWorks", "model": "MM-1",
                    "hasGps": True, "hasExifIfd": True},
        "exif_nogps": {"orientation": 1, "dateTime": "2020:01:01 00:00:00",
                       "make": "NoGps", "model": "Zero",
                       "hasGps": False, "hasExifIfd": False},
        "exif_none": {"orientation": None, "dateTime": None, "make": None,
                      "model": None, "hasGps": False, "hasExifIfd": False},
    }, f, indent=1)
print("exif fixtures written")
