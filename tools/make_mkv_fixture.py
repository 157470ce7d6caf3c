#!/usr/bin/env python3
"""Matroska/WebM (EBML) fixtures — an independent python transcription
of RFC 8794 + the public Matroska element registry, pinning
graft.ops.Matroska: definite-size and unknown-size (streaming) segment
and cluster forms, video+audio tracks, NUL-padded strings, 4- and
8-byte float durations. Expected metadata goes to mkv_expected.json.

Run from repo root: python3 tools/make_mkv_fixture.py
"""
import json
import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")


def vint_id(i):
    n = 1 if i <= 0xFF else 2 if i <= 0xFFFF else 3 if i <= 0xFFFFFF else 4
    return i.to_bytes(n, "big")


def vint_size(v):
    n = 1
    while n < 8 and v >= (1 << (7 * n)) - 1:  # all-ones reserved
        n += 1
    b = bytearray(v.to_bytes(n, "big"))
    b[0] |= 0x80 >> (n - 1)
    return bytes(b)


def el(i, payload):
    return vint_id(i) + vint_size(len(payload)) + payload


def el_unknown(i, payload):
    return vint_id(i) + b"\xff" + payload


def uint(i, v):
    n = max(1, (v.bit_length() + 7) // 8)
    return el(i, v.to_bytes(n, "big"))


def f64(i, v):
    return el(i, struct.pack(">d", v))


def f32(i, v):
    return el(i, struct.pack(">f", v))


def s(i, v):
    return el(i, v.encode("utf-8"))


def header(doc_type, version, pad=0):
    dt = s(0x4282, doc_type) if pad == 0 else \
        el(0x4282, doc_type.encode() + b"\x00" * pad)
    return el(0x1A45DFA3,
              uint(0x4286, 1) + uint(0x42F7, 1) + uint(0x42F2, 4) +
              uint(0x42F3, 8) + dt + uint(0x4287, version) + uint(0x4285, 2))


def info(scale, duration, four_byte=False):
    d = f32(0x4489, duration) if four_byte else f64(0x4489, duration)
    return el(0x1549A966, uint(0x2AD7B1, scale) + d +
              s(0x4D80, "graft") + s(0x5741, "graft"))


def video_track(num, codec, w, h):
    return el(0xAE, uint(0xD7, num) + uint(0x73C5, 0x1000 + num) +
              uint(0x83, 1) + s(0x86, codec) +
              el(0xE0, uint(0xB0, w) + uint(0xBA, h)))


def audio_track(num, codec, rate, ch):
    return el(0xAE, uint(0xD7, num) + uint(0x73C5, 0x1000 + num) +
              uint(0x83, 2) + s(0x86, codec) +
              el(0xE1, f64(0xB5, rate) + uint(0x9F, ch)))


def simple_block(ts, k, n):
    body = bytes([0x81, 0, k & 0xFF, 0x80]) + \
        bytes((ts + k + i) % 256 for i in range(n))
    return el(0xA3, body)


def cluster(ts, sizes, unknown=False):
    payload = uint(0xE7, ts) + b"".join(
        simple_block(ts, k, n) for k, n in enumerate(sizes))
    return el_unknown(0x1F43B675, payload) if unknown else \
        el(0x1F43B675, payload)


def main():
    os.makedirs(OUT, exist_ok=True)
    expected = {}

    def track(num, t, codec, w=0, h=0, rate=0, ch=0):
        return {"number": num, "type": t, "codec": codec, "w": w, "h": h,
                "rate": int(rate), "ch": ch}

    # 1. definite-size webm: VP9 video + Opus audio, 3 clusters
    sizes = [[20, 30], [25], [40, 10, 15]]
    seg = info(1000000, 5000.0) + \
        el(0x1654AE6B, video_track(1, "V_VP9", 1280, 720) +
           audio_track(2, "A_OPUS", 48000.0, 2)) + \
        b"".join(cluster(1000 * (i + 1), sz) for i, sz in enumerate(sizes))
    data = header("webm", 4) + el(0x18538067, seg)
    open(os.path.join(OUT, "mkv_webm.webm"), "wb").write(data)
    expected["mkv_webm.webm"] = {
        "doc_type": "webm", "doc_type_version": 4,
        "timestamp_scale": 1000000, "duration_ms": 5000,
        "tracks": [track(1, 1, "V_VP9", w=1280, h=720),
                   track(2, 2, "A_OPUS", rate=48000, ch=2)],
        "n_clusters": 3, "first_ts": 1000, "last_ts": 3000,
        "n_blocks": 6, "block_bytes": sum(4 + n for z in sizes for n in z)}

    # 2. matroska with AVC+AAC, non-default timestamp scale (0.5 ms)
    seg = info(500000, 24000.0) + \
        el(0x1654AE6B, video_track(1, "V_MPEG4/ISO/AVC", 1920, 1080) +
           audio_track(2, "A_AAC", 44100.0, 6)) + \
        cluster(0, [100]) + cluster(5000, [60, 60])
    data = header("matroska", 4) + el(0x18538067, seg)
    open(os.path.join(OUT, "mkv_matroska.mkv"), "wb").write(data)
    expected["mkv_matroska.mkv"] = {
        "doc_type": "matroska", "doc_type_version": 4,
        "timestamp_scale": 500000, "duration_ms": 12000,
        "tracks": [track(1, 1, "V_MPEG4/ISO/AVC", w=1920, h=1080),
                   track(2, 2, "A_AAC", rate=44100, ch=6)],
        "n_clusters": 2, "first_ts": 0, "last_ts": 5000,
        "n_blocks": 3, "block_bytes": 104 + 64 + 64}

    # 3. streaming form: unknown-size segment AND unknown-size clusters
    # (what a live webm muxer emits mid-stream)
    seg = info(1000000, 2000.0) + \
        el(0x1654AE6B, video_track(1, "V_AV1", 640, 360)) + \
        cluster(0, [32, 16], unknown=True) + \
        cluster(1000, [24], unknown=True)
    data = header("webm", 2) + el_unknown(0x18538067, seg)
    open(os.path.join(OUT, "mkv_stream.webm"), "wb").write(data)
    expected["mkv_stream.webm"] = {
        "doc_type": "webm", "doc_type_version": 2,
        "timestamp_scale": 1000000, "duration_ms": 2000,
        "tracks": [track(1, 1, "V_AV1", w=640, h=360)],
        "n_clusters": 2, "first_ts": 0, "last_ts": 1000,
        "n_blocks": 3, "block_bytes": 36 + 20 + 28}

    # 4. NUL-padded DocType + 4-byte float duration + default scale
    # (TimestampScale element omitted entirely)
    seg = el(0x1549A966, f32(0x4489, 1500.0) + s(0x4D80, "graft")) + \
        el(0x1654AE6B, audio_track(1, "A_VORBIS", 22050.0, 1)) + \
        cluster(700, [8])
    data = header("webm", 4, pad=3) + el(0x18538067, seg)
    open(os.path.join(OUT, "mkv_padded.webm"), "wb").write(data)
    expected["mkv_padded.webm"] = {
        "doc_type": "webm", "doc_type_version": 4,
        "timestamp_scale": 1000000, "duration_ms": 1500,
        "tracks": [track(1, 2, "A_VORBIS", rate=22050, ch=1)],
        "n_clusters": 1, "first_ts": 700, "last_ts": 700,
        "n_blocks": 1, "block_bytes": 12}

    with open(os.path.join(OUT, "mkv_expected.json"), "w") as f:
        json.dump(expected, f, indent=1, sort_keys=True)
    print(f"wrote {len(expected)} mkv fixtures")


if __name__ == "__main__":
    main()
