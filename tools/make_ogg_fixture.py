#!/usr/bin/env python3
"""Ogg/Opus/Vorbis fixtures — an independent python transcription of
RFC 3533 (page layer, Ogg CRC-32), RFC 7845 §5 (OpusHead) and Vorbis I
§4.2.2 (ID header), pinning graft.ops.Ogg. Covers: a plain Opus stream,
a Vorbis stream, a packet spanning pages (255-lacing continuation with
granule -1 on unfinished pages), a chained file (EOS then a fresh BOS
serial) and a multiplexed file (interleaved serials). Expected stream
metadata goes to ogg_expected.json.

Run from repo root: python3 tools/make_ogg_fixture.py
"""
import json
import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")


def ogg_crc(data: bytes) -> int:
    # forward CRC-32, poly 0x04C11DB7, init 0, no reflection, xorout 0
    r = 0
    for b in data:
        r ^= b << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if r & 0x80000000 \
                else (r << 1) & 0xFFFFFFFF
    return r


def page(header_type, granule, serial, seq, segments, body):
    h = (b"OggS" + bytes([0, header_type]) +
         struct.pack("<q", granule) + struct.pack("<I", serial) +
         struct.pack("<I", seq) + b"\x00\x00\x00\x00" +
         bytes([len(segments)]) + bytes(segments))
    full = bytearray(h + body)
    crc = ogg_crc(bytes(full))
    full[22:26] = struct.pack("<I", crc)
    return bytes(full)


def lay_stream(serial, packets, max_segs=16):
    """packets: [(bytes, granule)]; first packet alone on the BOS page,
    long packets span pages (granule -1 on unfinished pages)."""
    out = b""
    seq = 0
    last = len(packets) - 1
    for idx, (data, granule) in enumerate(packets):
        lacing = [255] * (len(data) // 255) + [len(data) % 255]
        off = 0
        continued = False
        li = 0
        while li < len(lacing):
            segs = lacing[li:li + max_segs]
            body_len = sum(segs)
            last_page = li + len(segs) == len(lacing)
            ht = ((1 if continued else 0) | (2 if idx == 0 else 0) |
                  (4 if idx == last and last_page else 0))
            g = granule if last_page else -1
            out += page(ht, g, serial, seq, segs, data[off:off + body_len])
            seq += 1
            off += body_len
            li += len(segs)
            continued = True
    return out


def opus_head(ch, preskip, rate):
    return (b"OpusHead" + bytes([1, ch]) + struct.pack("<H", preskip) +
            struct.pack("<I", rate) + struct.pack("<h", 0) + bytes([0]))


def opus_tags(vendor=b"graft-fixture"):
    return b"OpusTags" + struct.pack("<I", len(vendor)) + vendor + \
        struct.pack("<I", 0)


def vorbis_id(ch, rate):
    return (bytes([1]) + b"vorbis" + struct.pack("<I", 0) + bytes([ch]) +
            struct.pack("<I", rate) + struct.pack("<iii", 0, 0, 0) +
            bytes([(11 << 4) | 8, 1]))


def vorbis_comment(vendor=b"graft-fixture"):
    return (bytes([3]) + b"vorbis" + struct.pack("<I", len(vendor)) +
            vendor + struct.pack("<I", 0) + bytes([1]))


def audio(n, seed):
    return bytes((seed * 31 + i * 7) % 256 for i in range(n))


def main():
    os.makedirs(OUT, exist_ok=True)
    expected = {}

    def exp(serial, codec, ch, rate, preskip, lastg, npages, npkts):
        dur = (max(0, lastg - preskip) * 1000 // 48000 if codec == "opus"
               else lastg * 1000 // rate if codec == "vorbis" else 0)
        return {"serial": serial, "codec": codec, "channels": ch,
                "rate": rate, "preskip": preskip, "last_granule": lastg,
                "n_pages": npages, "n_packets": npkts, "duration_ms": dur}

    # 1. plain opus: head page, tags page, 3 audio pages
    pk = [(opus_head(2, 312, 44100), 0), (opus_tags(), 0),
          (audio(100, 1), 312 + 960), (audio(120, 2), 312 + 1920),
          (audio(80, 3), 312 + 2880)]
    data = lay_stream(0x1001, pk)
    open(os.path.join(OUT, "ogg_opus.ogg"), "wb").write(data)
    expected["ogg_opus.ogg"] = {
        "streams": [exp(0x1001, "opus", 2, 44100, 312, 312 + 2880, 5, 5)],
        "n_pages": 5}

    # 2. plain vorbis: id, comment, 2 audio pages (200 ms at 44100)
    pk = [(vorbis_id(2, 44100), 0), (vorbis_comment(), 0),
          (audio(90, 4), 4410), (audio(95, 5), 8820)]
    data = lay_stream(0x2002, pk)
    open(os.path.join(OUT, "ogg_vorbis.ogg"), "wb").write(data)
    expected["ogg_vorbis.ogg"] = {
        "streams": [exp(0x2002, "vorbis", 2, 44100, 0, 8820, 4, 4)],
        "n_pages": 4}

    # 3. spanning packet: one 9000-byte audio packet -> lacing 35x255 +
    # final, max 16 segs/page -> 3 pages, first two granule -1
    pk = [(opus_head(1, 0, 48000), 0), (opus_tags(), 0),
          (audio(9000, 6), 4800)]
    data = lay_stream(0x3003, pk)
    open(os.path.join(OUT, "ogg_span.ogg"), "wb").write(data)
    expected["ogg_span.ogg"] = {
        "streams": [exp(0x3003, "opus", 1, 48000, 0, 4800, 5, 3)],
        "n_pages": 5}

    # 4. chained: opus stream then vorbis stream, concatenated
    a = lay_stream(0x4004, [(opus_head(1, 120, 16000), 0),
                            (opus_tags(), 0), (audio(64, 7), 120 + 960)])
    b = lay_stream(0x5005, [(vorbis_id(1, 8000), 0), (vorbis_comment(), 0),
                            (audio(64, 8), 1600)])
    open(os.path.join(OUT, "ogg_chain.ogg"), "wb").write(a + b)
    expected["ogg_chain.ogg"] = {
        "streams": [exp(0x4004, "opus", 1, 16000, 120, 1080, 3, 3),
                    exp(0x5005, "vorbis", 1, 8000, 0, 1600, 3, 3)],
        "n_pages": 6}

    # 5. multiplexed: the two streams' pages interleaved (both BOS first,
    # per RFC 3533 grouped-at-start rule)
    pa = lay_stream(0x6006, [(opus_head(2, 0, 48000), 0),
                             (opus_tags(), 0), (audio(32, 9), 960)])
    pb = lay_stream(0x7007, [(vorbis_id(2, 22050), 0),
                             (vorbis_comment(), 0), (audio(32, 10), 2205)])
    # split back into pages to interleave
    def split_pages(blob):
        pages_, p = [], 0
        while p < len(blob):
            nseg = blob[p + 26]
            body = sum(blob[p + 27:p + 27 + nseg])
            end = p + 27 + nseg + body
            pages_.append(blob[p:end])
            p = end
        return pages_
    A, B = split_pages(pa), split_pages(pb)
    mux = A[0] + B[0] + A[1] + B[1] + A[2] + B[2]
    open(os.path.join(OUT, "ogg_mux.ogg"), "wb").write(mux)
    expected["ogg_mux.ogg"] = {
        "streams": [exp(0x6006, "opus", 2, 48000, 0, 960, 3, 3),
                    exp(0x7007, "vorbis", 2, 22050, 0, 2205, 3, 3)],
        "n_pages": 6}

    # CRC known-answer for the table pin
    expected["crc_oggs_123"] = ogg_crc(b"OggS123")

    with open(os.path.join(OUT, "ogg_expected.json"), "w") as f:
        json.dump(expected, f, indent=1, sort_keys=True)
    print(f"wrote {len(expected) - 1} ogg fixtures")


if __name__ == "__main__":
    main()
