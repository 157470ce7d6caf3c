#!/usr/bin/env python3
"""Generate the PDF golden fixture for PdfTextSpec (no PDF library needed —
the file is assembled byte-by-byte with a correct xref table).

Exercises every code path of graft.etl.PdfText:
  page 1: uncompressed stream, Tj + Td line moves, escaped parens, hex string
  page 2: FlateDecode stream, T* and ' show operators, octal escape
  page 3: uncompressed stream with an INDIRECT /Length, TJ kerning array
  page 4: CID/Type0 font with a FlateDecode ToUnicode CMap — bfchar
          (incl. a multi-unit destination), bfrange with hex-increment and
          array destinations, 2-byte codes shown via hex AND literal
          strings, font selected with Tf through /Resources

Run from the repo root:  python3 tools/make_pdf_fixture.py
"""
import os
import zlib

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")

page1 = b"""BT
/F1 12 Tf
72 720 Td
({"id": 1, "name": "Alice \\(admin\\)", "score": 95}) Tj
0 -14 Td
(second line with ) Tj
<4A534F4E> Tj
ET"""

page2_raw = b"""BT
72 720 Td
([2024-01-01 00:00:00] INFO startup complete) Tj
T*
([2024-01-01 00:00:05] WARN retry \\101ttempt) '
ET"""
page2 = zlib.compress(page2_raw)

page3 = b"""BT
72 720 Td
[(kerned) -250 (words) -90 (join)] TJ
ET"""

# CID page: 2-byte codes 0001..0006 via bfchar/bfrange-hex, 0010..0012 via
# bfrange-array; shown once as a hex string and once as a literal string
page4 = b"""BT
/F9 12 Tf
72 720 Td
<000100020003000400050006> Tj
T*
(\x00\x10\x00\x11\x00\x12) Tj
ET"""

cmap_raw = b"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CMapName /Adobe-Identity-UCS def
/CMapType 2 def
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
3 beginbfchar
<0001> <0043>
<0002> <00490044>
<0003> <0020>
endbfchar
2 beginbfrange
<0004> <0006> <0074>
<0010> <0012> [<0078> <0079> <007A>]
endbfrange
endcmap
CMapName currentdict /CMap defineresource pop
end
end"""
cmap = zlib.compress(cmap_raw)

expected = "\n".join([
    '{"id": 1, "name": "Alice (admin)", "score": 95}',
    "second line with JSON",
    "[2024-01-01 00:00:00] INFO startup complete",
    "[2024-01-01 00:00:05] WARN retry Attempt",
    "kerned wordsjoin",
    "CID tuv",
    "xyz",
])


def build():
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R 5 0 R 7 0 R 10 0 R] /Count 4 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >>",
        4: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(page1), page1),
        5: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 6 0 R >>",
        6: b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
           % (len(page2), page2),
        7: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 8 0 R >>",
        8: b"<< /Length 9 0 R >>\nstream\n%s\nendstream" % page3,
        9: b"%d" % len(page3),
        10: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F9 11 0 R >> >> /Contents 12 0 R >>",
        11: b"<< /Type /Font /Subtype /Type0 /BaseFont /Graft-CID "
            b"/Encoding /Identity-H /DescendantFonts [14 0 R] /ToUnicode 13 0 R >>",
        12: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(page4), page4),
        13: b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
            % (len(cmap), cmap),
        14: b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Graft-CID >>",
    }
    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for n in sorted(objs):
        offsets[n] = len(buf)
        buf += b"%d 0 obj\n%s\nendobj\n" % (n, objs[n])
    xref_at = len(buf)
    buf += b"xref\n0 %d\n" % (len(objs) + 1)
    buf += b"0000000000 65535 f \n"
    for n in sorted(objs):
        buf += b"%010d 00000 n \n" % offsets[n]
    buf += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, xref_at))
    return bytes(buf)


def build_encrypted():
    """Minimal RC4-style encrypted PDF: valid structure, /Encrypt in the
    trailer, string/stream bytes replaced by ciphertext-looking garbage.
    PdfText must refuse it with the reference's empty-text error rather
    than walk the garbage."""
    garbage = bytes((i * 37 + 11) % 256 for i in range(48))
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >>",
        4: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(garbage), garbage),
        5: b"<< /Filter /Standard /V 1 /R 2 /O <0102030405060708090a0b0c0d0e0f10"
           b"1112131415161718191a1b1c1d1e1f20> /U <0102030405060708090a0b0c0d0e0f10"
           b"1112131415161718191a1b1c1d1e1f20> /P -44 >>",
    }
    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for n in sorted(objs):
        offsets[n] = len(buf)
        buf += b"%d 0 obj\n%s\nendobj\n" % (n, objs[n])
    xref_at = len(buf)
    buf += b"xref\n0 %d\n" % (len(objs) + 1)
    buf += b"0000000000 65535 f \n"
    for n in sorted(objs):
        buf += b"%010d 00000 n \n" % offsets[n]
    buf += (b"trailer\n<< /Size %d /Root 1 0 R /Encrypt 5 0 R "
            b"/ID [<deadbeef> <deadbeef>] >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, xref_at))
    return bytes(buf)


# ---------------------------------------------------------- stream filters
# Independent encoders for the ISO 32000-1 §7.4 filters graft decodes
# (LZW with EarlyChange, ASCII85, ASCIIHex, RunLength, PNG predictors) —
# written from the spec, NOT mirrored from the Scala decoder, so a
# round-trip bug on either side garbles the fixture text and fails the spec.

def lzw_encode(data):
    """PDF LZWDecode inverse, EarlyChange=1, with a leading CLEAR."""
    codes = []          # (code, width)
    width = 9
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    codes.append((256, width))
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in table:
            w += c
            continue
        codes.append((table[w], width))
        if next_code < 4096:
            table[w + c] = next_code
            next_code += 1
            # EarlyChange=1: the decoder's table lags one entry, so the
            # encoder bumps exactly when its next_code hits 2^width
            if next_code >= (1 << width) and width < 12:
                width += 1
        w = c
    if w:
        codes.append((table[w], width))
    codes.append((257, width))
    buf = 0
    nbits = 0
    out = bytearray()
    for code, cw in codes:
        buf = (buf << cw) | code
        nbits += cw
        while nbits >= 8:
            out.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def a85_encode(data):
    out = bytearray()
    for i in range(0, len(data), 4):
        grp = data[i:i + 4]
        n = len(grp)
        v = int.from_bytes(grp + b"\0" * (4 - n), "big")
        if v == 0 and n == 4:
            out += b"z"
            continue
        chars = bytearray(5)
        for j in range(4, -1, -1):
            chars[j] = 33 + v % 85
            v //= 85
        out += chars[:n + 1]
    return bytes(out) + b"~>"


def rle_encode(data):
    out = bytearray()
    i = 0
    while i < len(data):
        run = 1
        while i + run < len(data) and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
        else:
            j = i + 1
            while (j < len(data) and j - i < 128 and
                   not (j + 1 < len(data) and data[j] == data[j + 1])):
                j += 1
            out += bytes([j - i - 1]) + data[i:j]
            i = j
    out.append(128)
    return bytes(out)


def png_predict(data, columns, tags):
    """Apply PNG row filters (bpp=1) so the decoder has to undo them."""
    rows = [data[i:i + columns] for i in range(0, len(data), columns)]
    rows = [r + b" " * (columns - len(r)) for r in rows]
    out = bytearray()
    prev = b"\0" * columns
    for r, row in enumerate(rows):
        tag = tags[r % len(tags)]
        out.append(tag)
        for i, x in enumerate(row):
            a = row[i - 1] if i >= 1 else 0
            b = prev[i]
            c = prev[i - 1] if i >= 1 else 0
            if tag == 0:
                out.append(x)
            elif tag == 1:
                out.append((x - a) & 0xFF)
            elif tag == 2:
                out.append((x - b) & 0xFF)
            elif tag == 3:
                out.append((x - (a + b) // 2) & 0xFF)
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                out.append((x - pred) & 0xFF)
        prev = row
    return bytes(out)


def page_stream(lines):
    body = b"BT\n72 720 Td\n"
    for li in lines:
        body += b"(%s) Tj\nT*\n" % li
    return body + b"ET"


def build_filters():
    """filters.pdf: one page per decode path. Page text is long and varied
    enough to push LZW past the 9->10 bit boundary (>253 table entries)."""
    lzw_lines = [b"LZW page line %03d with mixed payload %s" %
                 (i, bytes(range(33 + i % 20, 33 + i % 20 + 40))
                  .replace(b"(", b"[").replace(b")", b"]")
                  .replace(b"\\", b"/")) for i in range(12)]
    a85_lines = [b"ascii85 page: compact binary-safe text encoding"]
    ahx_lines = [b"asciihex page: nibbles with whitespace"]
    rle_lines = [b"rle page: aaaaaaaaaaaaaaaaaaaa bbbbbbbbbb c"]
    chain_lines = [b"chained page: ascii85 wrapping flate"]
    pred_lines = [b"predictor page: png up/sub/paeth rows over flate"]
    lzw_raw = page_stream(lzw_lines)
    a85_raw = page_stream(a85_lines)
    ahx_raw = page_stream(ahx_lines)
    rle_raw = page_stream(rle_lines)
    chain_raw = page_stream(chain_lines)
    pred_raw = page_stream(pred_lines)
    all_lines = (lzw_lines + a85_lines + ahx_lines + rle_lines +
                 chain_lines + pred_lines)
    pred_cols = 24
    pred_body = zlib.compress(png_predict(pred_raw, pred_cols, [2, 1, 4, 3, 0]))
    streams = {
        "lzw": (lzw_encode(lzw_raw), b"/Filter /LZWDecode"),
        "a85": (a85_encode(a85_raw), b"/Filter /ASCII85Decode"),
        "ahx": (b" ".join(b"%02x" % b for b in ahx_raw) + b" >",
                b"/Filter /ASCIIHexDecode"),
        "rle": (rle_encode(rle_raw), b"/Filter /RunLengthDecode"),
        "chain": (a85_encode(zlib.compress(chain_raw)),
                  b"/Filter [/ASCII85Decode /FlateDecode]"),
        "pred": (pred_body,
                 b"/Filter /FlateDecode /DecodeParms << /Predictor 12 "
                 b"/Columns %d >>" % pred_cols),
    }
    order = ["lzw", "a85", "ahx", "rle", "chain", "pred"]
    objs = {1: b"<< /Type /Catalog /Pages 2 0 R >>"}
    kids = []
    num = 3
    for key in order:
        body, filt = streams[key]
        kids.append(b"%d 0 R" % num)
        objs[num] = (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                     b"/Contents %d 0 R >>" % (num + 1))
        objs[num + 1] = (b"<< /Length %d %s >>\nstream\n%s\nendstream"
                         % (len(body), filt, body))
        num += 2
    objs[2] = (b"<< /Type /Pages /Kids [%s] /Count %d >>"
               % (b" ".join(kids), len(order)))
    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for n in sorted(objs):
        offsets[n] = len(buf)
        buf += b"%d 0 obj\n%s\nendobj\n" % (n, objs[n])
    xref_at = len(buf)
    buf += b"xref\n0 %d\n" % (len(objs) + 1)
    buf += b"0000000000 65535 f \n"
    for n in sorted(objs):
        buf += b"%010d 00000 n \n" % offsets[n]
    buf += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, xref_at))
    expected_text = b"\n".join(all_lines).decode("latin-1")
    return bytes(buf), expected_text


def build_unsupported():
    """A content stream behind /DCTDecode: must be REFUSED (typed error),
    never walked raw."""
    garbage = bytes((i * 193 + 7) % 256 for i in range(64))
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >>",
        4: b"<< /Length %d /Filter /DCTDecode >>\nstream\n%s\nendstream"
           % (len(garbage), garbage),
    }
    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for n in sorted(objs):
        offsets[n] = len(buf)
        buf += b"%d 0 obj\n%s\nendobj\n" % (n, objs[n])
    xref_at = len(buf)
    buf += b"xref\n0 %d\n" % (len(objs) + 1)
    buf += b"0000000000 65535 f \n"
    for n in sorted(objs):
        buf += b"%010d 00000 n \n" % offsets[n]
    buf += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, xref_at))
    return bytes(buf)


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    pdf = build()
    with open(os.path.join(OUT, "sample.pdf"), "wb") as f:
        f.write(pdf)
    with open(os.path.join(OUT, "sample_pdf_expected.txt"), "w") as f:
        f.write(expected + "\n")
    with open(os.path.join(OUT, "encrypted.pdf"), "wb") as f:
        f.write(build_encrypted())
    filt_pdf, filt_expected = build_filters()
    with open(os.path.join(OUT, "filters.pdf"), "wb") as f:
        f.write(filt_pdf)
    with open(os.path.join(OUT, "filters_pdf_expected.txt"), "w") as f:
        f.write(filt_expected + "\n")
    with open(os.path.join(OUT, "unsupported_filter.pdf"), "wb") as f:
        f.write(build_unsupported())
    print("wrote %d-byte fixture + expected text + encrypted.pdf + "
          "filters.pdf (%d bytes) + unsupported_filter.pdf to %s"
          % (len(pdf), len(filt_pdf), OUT))
