#!/usr/bin/env python3
"""7z fixtures whose payloads are compressed by CPython's `lzma` (real
liblzma raw LZMA1/LZMA2 streams), `zlib` (raw deflate) and `bz2` — the
independent third-party producers the hand-rolled graft.ops.SevenZip
reader is pinned against. The container itself is built byte-by-byte
from the published 7zFormat.txt grammar: REAL_UINT64 numbers, bit
vectors, PackInfo/UnpackInfo/SubStreamsInfo/FilesInfo, encoded headers.

Covers: LZMA2 solid multi-file folders, liblzma raw LZMA1 (end-marker
terminated — the layout 7-zip itself never writes but liblzma must),
Copy folders, one-folder-per-file archives without SubStreamsInfo,
kEncodedHeader archives, empty files + directory entries, skippable
kMTime/kWinAttributes properties, and refusal twins (BCJ chain ->
unsupported, AES -> encrypted).

Writes <name>.7z plus 7z_manifest.json:
  name TAB refusal-or-"-" TAB n_members TAB name=md5,name=md5,...

Run from repo root: python3 tools/make_7z_fixture.py
"""
import bz2, hashlib, lzma, os, struct, zlib

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")

K_HEADER, K_MAIN_STREAMS, K_FILES = 0x01, 0x04, 0x05
K_PACK, K_UNPACK, K_SUBSTREAMS = 0x06, 0x07, 0x08
K_SIZE, K_CRC, K_FOLDER, K_OUTSIZE = 0x09, 0x0A, 0x0B, 0x0C
K_NUM_UNPACK, K_EMPTY_STREAM, K_EMPTY_FILE = 0x0D, 0x0E, 0x0F
K_NAME, K_MTIME, K_ATTR, K_ENCODED = 0x11, 0x14, 0x15, 0x17
K_END = 0x00


def number(v):
    """7z REAL_UINT64: mask-prefixed first byte + LE extension bytes."""
    out = bytearray()
    first = 0
    mask = 0x80
    i = 0
    while i < 8:
        if v < (1 << (7 * (i + 1))):
            first |= v >> (8 * i)
            break
        first |= mask
        mask >>= 1
        i += 1
    out.append(first)
    for j in range(i):
        out.append((v >> (8 * j)) & 0xFF)
    return bytes(out)


def bits(flags):
    out = bytearray()
    acc, mask = 0, 0x80
    for f in flags:
        if f:
            acc |= mask
        mask >>= 1
        if mask == 0:
            out.append(acc)
            acc, mask = 0, 0x80
    if mask != 0x80:
        out.append(acc)
    return bytes(out)


def lzma2_props_byte(dict_size):
    for p in range(41):
        if ((2 | (p & 1)) << (p // 2 + 11)) >= dict_size:
            return p
    return 40


def lzma2_raw(data, dict_size=1 << 16):
    f = [{"id": lzma.FILTER_LZMA2, "preset": 6, "dict_size": dict_size}]
    c = lzma.LZMACompressor(format=lzma.FORMAT_RAW, filters=f)
    return c.compress(data) + c.flush(), bytes([lzma2_props_byte(dict_size)])


def lzma1_raw(data, dict_size=1 << 16):
    f = [{"id": lzma.FILTER_LZMA1, "dict_size": dict_size,
          "lc": 3, "lp": 0, "pb": 2}]
    c = lzma.LZMACompressor(format=lzma.FORMAT_RAW, filters=f)
    props = bytes([(2 * 5 + 0) * 9 + 3]) + struct.pack("<I", dict_size)
    return c.compress(data) + c.flush(), props


def coder(ident, props=b"", num_in=1, num_out=1):
    flags = len(ident)
    complex_ = num_in != 1 or num_out != 1
    if complex_:
        flags |= 0x10
    if props:
        flags |= 0x20
    out = bytes([flags]) + ident
    if complex_:
        out += number(num_in) + number(num_out)
    if props:
        out += number(len(props)) + props
    return out


def folder1(c):
    """a single-coder folder: NumCoders prefix + the coder."""
    return number(1) + c


def pack_info(pack_pos, sizes):
    out = bytes([K_PACK]) + number(pack_pos) + number(len(sizes))
    out += bytes([K_SIZE]) + b"".join(number(s) for s in sizes)
    return out + bytes([K_END])


def unpack_info(folders, out_sizes, folder_crcs=None):
    """folders: list of folder bytes; out_sizes: flat unpack sizes."""
    out = bytes([K_UNPACK, K_FOLDER]) + number(len(folders)) + b"\x00"
    out += b"".join(folders)
    out += bytes([K_OUTSIZE]) + b"".join(number(s) for s in out_sizes)
    if folder_crcs is not None:
        out += bytes([K_CRC, 0x01])
        out += b"".join(struct.pack("<I", c) for c in folder_crcs)
    return out + bytes([K_END])


def substreams_info(nums, sizes_all_but_last, crcs):
    out = bytes([K_SUBSTREAMS])
    out += bytes([K_NUM_UNPACK]) + b"".join(number(n) for n in nums)
    if sizes_all_but_last:
        out += bytes([K_SIZE]) + b"".join(number(s) for s in sizes_all_but_last)
    if crcs:
        out += bytes([K_CRC, 0x01]) + b"".join(struct.pack("<I", c) for c in crcs)
    return out + bytes([K_END])


def files_info(names, empty_stream=None, empty_file=None, extra=b""):
    out = bytes([K_FILES]) + number(len(names))
    if empty_stream and any(empty_stream):
        b = bits(empty_stream)
        out += bytes([K_EMPTY_STREAM]) + number(len(b)) + b
        if empty_file and any(empty_file):
            b2 = bits(empty_file)
            out += bytes([K_EMPTY_FILE]) + number(len(b2)) + b2
    name_blob = b"\x00" + b"".join((n + "\x00").encode("utf-16-le") for n in names)
    out += bytes([K_NAME]) + number(len(name_blob)) + name_blob
    out += extra
    return out + bytes([K_END])


def archive(header, pack_bytes, encode_header=False):
    if encode_header:
        hpacked, hprops = lzma2_raw(header)
        si = pack_info(len(pack_bytes), [len(hpacked)])
        si += unpack_info([folder1(coder(b"\x21", hprops))], [len(header)],
                          [zlib.crc32(header)])
        next_hdr = bytes([K_ENCODED]) + si + bytes([K_END])
        pack_bytes = pack_bytes + hpacked
        header = next_hdr
    start = struct.pack("<QQI", len(pack_bytes), len(header),
                        zlib.crc32(header))
    return (b"7z\xbc\xaf\x27\x1c\x00\x04"
            + struct.pack("<I", zlib.crc32(start)) + start
            + pack_bytes + header)


def manifest_row(name, refusal, members):
    digests = ",".join("%s=%s" % (n, hashlib.md5(b).hexdigest())
                       for n, b in members)
    return "%s\t%s\t%d\t%s" % (name, refusal or "-", len(members), digests)


def text(i, reps):
    return (("shard %d: the seven zip container holds solid folders " % i)
            * reps).encode("utf-8")


def main():
    rows = []

    def emit(fname, blob, refusal, members):
        with open(os.path.join(OUT, fname), "wb") as f:
            f.write(blob)
        rows.append(manifest_row(fname, refusal, members))

    # --- LZMA2 solid folder, several files, substream CRCs -------------
    files = [("a/%d.txt" % i, text(i, i % 5 + 1)) for i in range(8)]
    solid = b"".join(b for _, b in files)
    packed, props = lzma2_raw(solid)
    hdr = bytes([K_HEADER, K_MAIN_STREAMS])
    hdr += pack_info(0, [len(packed)])
    hdr += unpack_info([folder1(coder(b"\x21", props))], [len(solid)])
    hdr += substreams_info([len(files)],
                           [len(b) for _, b in files[:-1]],
                           [zlib.crc32(b) for _, b in files])
    hdr += bytes([K_END])
    hdr += files_info([n for n, _ in files])
    hdr += bytes([K_END])
    emit("7z_lzma2_solid.7z", archive(hdr, packed), None, files)

    # --- same archive, kEncodedHeader ----------------------------------
    emit("7z_encoded_header.7z", archive(hdr, packed, encode_header=True),
         None, files)

    # --- raw LZMA1 from liblzma (end-marker stream), one file ----------
    body = text(99, 30)
    packed1, props1 = lzma1_raw(body)
    hdr = bytes([K_HEADER, K_MAIN_STREAMS])
    hdr += pack_info(0, [len(packed1)])
    hdr += unpack_info([folder1(coder(b"\x03\x01\x01", props1))], [len(body)],
                       [zlib.crc32(body)])
    hdr += bytes([K_END])
    hdr += files_info(["lzma1.txt"])
    hdr += bytes([K_END])
    emit("7z_lzma1_marker.7z", archive(hdr, packed1), None,
         [("lzma1.txt", body)])

    # --- Copy / deflate / bzip2 folders, one per file, no substreams ---
    trip = [("copy.bin", bytes(range(256)) * 3),
            ("defl.txt", text(7, 12)),
            ("bz.txt", text(8, 15))]
    cobj = zlib.compressobj(6, zlib.DEFLATED, -15)
    packs = [trip[0][1],
             cobj.compress(trip[1][1]) + cobj.flush(),
             bz2.compress(trip[2][1])]
    folders = [folder1(coder(b"\x00")), folder1(coder(b"\x04\x01\x08")),
               folder1(coder(b"\x04\x02\x02"))]
    hdr = bytes([K_HEADER, K_MAIN_STREAMS])
    hdr += pack_info(0, [len(p) for p in packs])
    hdr += unpack_info(folders, [len(b) for _, b in trip],
                       [zlib.crc32(b) for _, b in trip])
    hdr += bytes([K_END])
    hdr += files_info([n for n, _ in trip])
    hdr += bytes([K_END])
    emit("7z_copy_deflate_bzip2.7z", archive(hdr, b"".join(packs)), None, trip)

    # --- empty files + directory entries + skippable time/attr props ---
    names = ["dir", "dir/real.txt", "dir/empty.txt", "dir/sub"]
    real = text(3, 4)
    packed, props = lzma2_raw(real)
    empty_stream = [True, False, True, True]   # dirs + empty file
    empty_file = [False, True, False]          # of the 3 empty-stream rows
    n = len(names)
    mtime = bytes([0x01, 0x00]) + b"".join(struct.pack("<Q", 116444736000000000 + i)
                                           for i in range(n))
    attrs = bytes([0x01, 0x00]) + b"".join(struct.pack("<I", 0x20) for _ in range(n))
    extra = (bytes([K_MTIME]) + number(len(mtime)) + mtime
             + bytes([K_ATTR]) + number(len(attrs)) + attrs)
    hdr = bytes([K_HEADER, K_MAIN_STREAMS])
    hdr += pack_info(0, [len(packed)])
    hdr += unpack_info([folder1(coder(b"\x21", props))], [len(real)], [zlib.crc32(real)])
    hdr += bytes([K_END])
    hdr += files_info(names, empty_stream, empty_file, extra)
    hdr += bytes([K_END])
    emit("7z_empty_and_dirs.7z", archive(hdr, packed), None,
         [("dir/real.txt", real), ("dir/empty.txt", b"")])

    # --- refusal twins --------------------------------------------------
    body = text(5, 6)
    packed, props = lzma2_raw(body)
    # BCJ x86 + LZMA2 chain: 2 coders, one bind pair
    chain = (number(2) + coder(b"\x21", props) + coder(b"\x03\x03\x01\x03")
             + number(1) + number(0))  # bind pair: BCJ in#1 <- LZMA2 out#0
    hdr = bytes([K_HEADER, K_MAIN_STREAMS])
    hdr += pack_info(0, [len(packed)])
    hdr += unpack_info([chain], [len(body), len(body)], None)
    hdr += bytes([K_END])
    hdr += files_info(["prog.exe"])
    hdr += bytes([K_END])
    emit("7z_bcj_chain.7z", archive(hdr, packed), "unsupported", [])

    # AES-256+SHA256 (0x06F10701) + LZMA2 chain
    aes = (number(2) + coder(b"\x21", props) + coder(b"\x06\xf1\x07\x01", b"\x53\x07")
           + number(1) + number(0))
    hdr = bytes([K_HEADER, K_MAIN_STREAMS])
    hdr += pack_info(0, [len(packed)])
    hdr += unpack_info([aes], [len(body), len(body)], None)
    hdr += bytes([K_END])
    hdr += files_info(["secret.txt"])
    hdr += bytes([K_END])
    emit("7z_aes.7z", archive(hdr, packed), "encrypted", [])

    # substream CRC lie: solid LZMA2, one CRC off by one bit
    files2 = [("x.txt", text(1, 3)), ("y.txt", text(2, 3))]
    solid2 = b"".join(b for _, b in files2)
    packed2, props2 = lzma2_raw(solid2)
    hdr = bytes([K_HEADER, K_MAIN_STREAMS])
    hdr += pack_info(0, [len(packed2)])
    hdr += unpack_info([folder1(coder(b"\x21", props2))], [len(solid2)])
    hdr += substreams_info([2], [len(files2[0][1])],
                           [zlib.crc32(files2[0][1]) ^ 1,
                            zlib.crc32(files2[1][1])])
    hdr += bytes([K_END])
    hdr += files_info([n for n, _ in files2])
    hdr += bytes([K_END])
    emit("7z_crc_lie.7z", archive(hdr, packed2), "bad_crc", [])

    # canonical empty archive: bare signature header
    start = struct.pack("<QQI", 0, 0, 0)
    blob = (b"7z\xbc\xaf\x27\x1c\x00\x04"
            + struct.pack("<I", zlib.crc32(start)) + start)
    emit("7z_empty.7z", blob, None, [])

    with open(os.path.join(OUT, "7z_manifest.json"), "w") as f:
        f.write("\n".join(rows) + "\n")
    print("wrote %d fixtures" % len(rows))


if __name__ == "__main__":
    main()
