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

    exp["flac_audio1"], audio1 = make_audio1()
    open(os.path.join(OUT, "flac_audio1.flac"), "wb").write(audio1)
    exp["flac_audio2"], audio2 = make_audio2()
    open(os.path.join(OUT, "flac_audio2.flac"), "wb").write(audio2)

    with open(os.path.join(OUT, "flac_expected.json"), "w") as f:
        json.dump(exp, f, indent=1)
    print("flac fixtures written to", OUT)


# --------------------------------------------------------------------------
# Audio-frame fixtures: a from-scratch frame encoder off the FLAC spec
# (frame headers + CRC-8/16, LPC/FIXED/VERBATIM/CONSTANT subframes,
# Rice/Rice2 partitioned residuals incl. escape codes, wasted bits,
# left/side / right/side / mid/side stereo) — deliberately exercising the
# shapes the Scala ENCODER never emits, so the Scala DECODER is pinned
# against an independent implementation, not its own writer.

class BW:
    def __init__(self):
        self.buf = bytearray(); self.cur = 0; self.nb = 0
    def bit(self, b):
        self.cur = (self.cur << 1) | (b & 1); self.nb += 1
        if self.nb == 8:
            self.buf.append(self.cur); self.cur = 0; self.nb = 0
    def bits(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bit((v >> i) & 1)
    def sbits(self, v, n):
        self.bits(v & ((1 << n) - 1), n)
    def align(self):
        while self.nb:
            self.bit(0)


def crc8(data):
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xff if crc & 0x80 else (crc << 1) & 0xff
    return crc


def crc16(data):
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xffff if crc & 0x8000 else (crc << 1) & 0xffff
    return crc


def coded_number(v):
    if v < 0x80:
        return bytes([v])
    k = 2
    while k < 7 and v >= (1 << (5 * k + 1)):
        k += 1
    out = [((0xff << (8 - k)) & 0xff) | ((v >> (6 * (k - 1))) & (0x7f >> k))]
    for i in range(k - 2, -1, -1):
        out.append(0x80 | ((v >> (6 * i)) & 0x3f))
    return bytes(out)


def zigzag(v):
    return (v << 1) if v >= 0 else ((-v) << 1) - 1


def write_partitions(bw, res, n, order, method, part_order, params, raws):
    bw.bits(method, 2)
    bw.bits(part_order, 4)
    pbits = 4 if method == 0 else 5
    escape = 0xF if method == 0 else 0x1F
    per = n >> part_order
    idx = 0
    for p in range(1 << part_order):
        cnt = (per - order) if p == 0 else per
        vals = res[idx:idx + cnt]; idx += cnt
        if raws is not None and raws[p] is not None:
            bw.bits(escape, pbits)
            bw.bits(raws[p], 5)
            for v in vals:
                if raws[p]:
                    bw.sbits(v, raws[p])
        else:
            param = params[p]
            bw.bits(param, pbits)
            for v in vals:
                u = zigzag(v)
                for _ in range(u >> param):
                    bw.bit(0)
                bw.bit(1)
                if param:
                    bw.bits(u & ((1 << param) - 1), param)
    assert idx == len(res)


def wasted_header(bw, wasted):
    if wasted:
        bw.bit(1)
        for _ in range(wasted - 1):
            bw.bit(0)
        bw.bit(1)
    else:
        bw.bit(0)


def sf_constant(bw, v, bps):
    bw.bit(0); bw.bits(0, 6); bw.bit(0); bw.sbits(v, bps)


def sf_verbatim(bw, s, bps):
    bw.bit(0); bw.bits(1, 6); bw.bit(0)
    for v in s:
        bw.sbits(v, bps)


FIXED_RES = {
    0: lambda s, i: s[i],
    1: lambda s, i: s[i] - s[i - 1],
    2: lambda s, i: s[i] - 2 * s[i - 1] + s[i - 2],
    3: lambda s, i: s[i] - 3 * s[i - 1] + 3 * s[i - 2] - s[i - 3],
    4: lambda s, i: s[i] - 4 * s[i - 1] + 6 * s[i - 2] - 4 * s[i - 3] + s[i - 4],
}


def sf_fixed(bw, s, order, bps, method=0, part_order=0, params=(0,),
             raws=None, wasted=0):
    bw.bit(0); bw.bits(0x08 | order, 6)
    wasted_header(bw, wasted)
    ss = [v >> wasted for v in s]
    assert all(v << wasted == orig for v, orig in zip(ss, s))
    for v in ss[:order]:
        bw.sbits(v, bps - wasted)
    res = [FIXED_RES[order](ss, i) for i in range(order, len(ss))]
    write_partitions(bw, res, len(ss), order, method, part_order, params, raws)


def sf_lpc(bw, s, coefs, shift, precision, bps, method=0, part_order=0,
           params=(0,), raws=None, wasted=0):
    order = len(coefs)
    bw.bit(0); bw.bits(0x20 | (order - 1), 6)
    wasted_header(bw, wasted)
    ss = [v >> wasted for v in s]
    assert all(v << wasted == orig for v, orig in zip(ss, s))
    for v in ss[:order]:
        bw.sbits(v, bps - wasted)
    bw.bits(precision - 1, 4)
    bw.sbits(shift, 5)
    for c in coefs:
        bw.sbits(c, precision)
    res = []
    for i in range(order, len(ss)):
        pred = sum(coefs[j] * ss[i - 1 - j] for j in range(order)) >> shift
        res.append(ss[i] - pred)
    write_partitions(bw, res, len(ss), order, method, part_order, params, raws)


BS_EXACT = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5, 256: 8, 512: 9,
            1024: 10, 2048: 11, 4096: 12, 8192: 13, 16384: 14, 32768: 15}


def frame(idx, n, ch_assign, ss_bits, rate_bits, rate_extra, body_fn):
    bw = BW()
    bw.bits(0x3FFE, 14); bw.bit(0); bw.bit(0)
    code = BS_EXACT.get(n, 6 if n <= 256 else 7)
    bw.bits(code, 4)
    bw.bits(rate_bits, 4)
    bw.bits(ch_assign, 4)
    bw.bits(ss_bits, 3)
    bw.bit(0)
    for b in coded_number(idx):
        bw.bits(b, 8)
    if code == 6:
        bw.bits(n - 1, 8)
    elif code == 7:
        bw.bits(n - 1, 16)
    if rate_bits == 12:
        bw.bits(rate_extra, 8)
    elif rate_bits in (13, 14):
        bw.bits(rate_extra, 16)
    bw.align()
    bw.buf.append(crc8(bytes(bw.buf)))
    body_fn(bw)
    bw.align()
    c = crc16(bytes(bw.buf))
    return bytes(bw.buf) + bytes([c >> 8, c & 0xff])


def pcm_md5(chans, width):
    import hashlib
    h = hashlib.md5()
    n = len(chans[0])
    for i in range(n):
        for c in chans:
            h.update((c[i] & ((1 << (8 * width)) - 1)).to_bytes(width, "little"))
    return h.hexdigest()


def make_audio1():
    """Mono 16-bit, 200 samples, block 64: LPC w/ 4 rice partitions, FIXED
    order 3 w/ rice2 + wasted bits, VERBATIM, short CONSTANT tail."""
    import math
    pcm = [int(1000 * math.sin(i / 7.0)) + (i * 13) % 101 for i in range(64)]
    pcm += [4 * (((i * 29) % 500) - 250) for i in range(64)]      # multiples of 4
    pcm += [((i * i * 7) % 30011) - 15005 for i in range(64)]
    pcm += [77] * 8
    md5 = pcm_md5([pcm], 2)
    out = b"fLaC" + block(0, streaminfo(16000, 1, 16, 200, md5), True)
    out += frame(0, 64, 0, 4, 5, 0,          # rate code 5 = 16k table entry
                 lambda bw: sf_lpc(bw, pcm[0:64], [3, -1], 1, 5, 16,
                                   method=0, part_order=2,
                                   params=(4, 5, 3, 6)))
    out += frame(1, 64, 0, 4, 0, 0,
                 lambda bw: sf_fixed(bw, pcm[64:128], 3, 16, method=1,
                                     part_order=0, params=(7,), wasted=2))
    out += frame(2, 64, 0, 4, 13, 16000,     # 16-bit Hz-verbatim rate field
                 lambda bw: sf_verbatim(bw, pcm[128:192], 16))
    out += frame(3, 8, 0, 4, 0, 0,
                 lambda bw: sf_constant(bw, 77, 16))
    return {"rate": 16000, "ch": 1, "bps": 16, "samples": 200, "md5": md5,
            "blocks": 1, "pcm": [pcm]}, out


def make_audio2():
    """Stereo 16-bit, 3×192 samples: left/side, right/side, mid/side (the
    last with an escape-coded raw partition on the side channel)."""
    L, R = [], []
    for i in range(384):
        l = ((i * 97) % 20001) - 10000
        L.append(l)
        R.append(l - (((i * 31) % 199) - 99))  # small side for rice params
    for i in range(384, 576):
        l = ((i * 53) % 8191) - 4095
        L.append(l)
        R.append(l - (((i * 7) % 200) - 100))  # |side| <= 100: fits escape raw 8
    md5 = pcm_md5([L, R], 2)
    side = [L[i] - R[i] for i in range(576)]
    mid = [(L[i] + R[i]) >> 1 for i in range(576)]
    out = b"fLaC" + block(0, streaminfo(44100, 2, 16, 576, md5), True)
    out += frame(0, 192, 8, 4, 9, 0,  # left/side
                 lambda bw: (sf_fixed(bw, L[0:192], 2, 16, params=(9,)),
                             sf_fixed(bw, side[0:192], 1, 17, params=(5,)))[-1])
    out += frame(1, 192, 9, 4, 13, 44100,  # right/side
                 lambda bw: (sf_lpc(bw, side[192:384], [1], 0, 2, 17,
                                    method=1, part_order=1, params=(5, 5)),
                             sf_fixed(bw, R[192:384], 2, 16, params=(9,)))[-1])
    out += frame(2, 192, 10, 0, 0, 0,  # mid/side; sample size from STREAMINFO
                 lambda bw: (sf_fixed(bw, mid[384:576], 1, 16, params=(6,)),
                             sf_fixed(bw, side[384:576], 0, 17, method=0,
                                      part_order=1, params=(8, None),
                                      raws=(None, 8)))[-1])
    return {"rate": 44100, "ch": 2, "bps": 16, "samples": 576, "md5": md5,
            "blocks": 1, "pcm": [L, R]}, out


if __name__ == "__main__":
    main()
