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


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    pdf = build()
    with open(os.path.join(OUT, "sample.pdf"), "wb") as f:
        f.write(pdf)
    with open(os.path.join(OUT, "sample_pdf_expected.txt"), "w") as f:
        f.write(expected + "\n")
    with open(os.path.join(OUT, "encrypted.pdf"), "wb") as f:
        f.write(build_encrypted())
    print("wrote %d-byte fixture + expected text + encrypted.pdf to %s"
          % (len(pdf), OUT))
