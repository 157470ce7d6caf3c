#!/usr/bin/env python3
"""DOCX fixtures for DocxSpec (python-docx is not installed in this
container, so the packages are hand-assembled WordprocessingML — the
same XML python-docx emits, cross-checked against the published OOXML
spec ISO/IEC 29500-1 §17). Each fixture gets an expected-text entry in
docx_expected.json encoding python-docx's
`"\n".join(p.text for p in document.paragraphs)` semantics:

  - body <w:p> only (table-cell and textbox paragraphs excluded)
  - run <w:t> concatenated; <w:tab/> -> \t; <w:br/>, <w:cr/> -> \n
  - formatting (rPr/pPr), bookmarks, proofing marks contribute nothing

Writes src/test/resources/fixtures/docx_*.docx + docx_expected.json.
"""
import json
import os
import zipfile

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/test/resources/fixtures")

W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
W_STRICT = "http://purl.oclc.org/ooxml/wordprocessingml/main"

CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    '</Types>')

RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
    '</Relationships>')


def pack(name, document_xml, extra_members=()):
    path = os.path.join(OUT, name)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for n, data in [("[Content_Types].xml", CONTENT_TYPES),
                        ("_rels/.rels", RELS),
                        ("word/document.xml", document_xml),
                        *extra_members]:
            zi = zipfile.ZipInfo(n, (1980, 1, 1, 0, 0, 0))
            zf.writestr(zi, data)
    return name


def doc(body, ns=W):
    return ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<w:document xmlns:w="{ns}"><w:body>{body}</w:body></w:document>')


expected = {}

# 1. multi-paragraph, split runs, formatting that contributes nothing
body = (
    '<w:p><w:pPr><w:jc w:val="center"/></w:pPr>'
    '<w:r><w:rPr><w:b/></w:rPr><w:t>Hel</w:t></w:r>'
    '<w:r><w:t xml:space="preserve">lo </w:t></w:r>'
    '<w:r><w:t>world</w:t></w:r></w:p>'
    '<w:p><w:r><w:t>second paragraph</w:t></w:r></w:p>'
    '<w:p/>'  # empty paragraph contributes an empty line
    '<w:p><w:r><w:t>after empty</w:t></w:r></w:p>')
expected[pack("docx_basic.docx", doc(body))] = \
    "Hello world\nsecond paragraph\n\nafter empty"

# 2. tabs, breaks, carriage returns, XML entities, unicode
body = (
    '<w:p><w:r><w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/>'
    '<w:t>c</w:t><w:cr/><w:t>d</w:t></w:r></w:p>'
    '<w:p><w:r><w:t>&amp;lt; &lt;tag&gt; &amp; ünïcode ✓</w:t></w:r></w:p>')
expected[pack("docx_breaks.docx", doc(body))] = \
    "a\tb\nc\nd\n&lt; <tag> & ünïcode ✓"

# 3. table paragraphs excluded; body paragraphs around the table kept
body = (
    '<w:p><w:r><w:t>before table</w:t></w:r></w:p>'
    '<w:tbl><w:tr><w:tc>'
    '<w:p><w:r><w:t>CELL TEXT MUST NOT APPEAR</w:t></w:r></w:p>'
    '</w:tc></w:tr></w:tbl>'
    '<w:p><w:r><w:t>after table</w:t></w:r></w:p>')
expected[pack("docx_table.docx", doc(body))] = "before table\nafter table"

# 4. textbox paragraph nested inside a body paragraph's run: python-docx
# paragraph.text reads only the paragraph's own runs
body = (
    '<w:p><w:r><w:t>host para</w:t></w:r>'
    '<w:r><w:pict><w:txbxContent>'
    '<w:p><w:r><w:t>TEXTBOX MUST NOT APPEAR</w:t></w:r></w:p>'
    '</w:txbxContent></w:pict></w:r>'
    '<w:r><w:t xml:space="preserve"> tail</w:t></w:r></w:p>')
expected[pack("docx_textbox.docx", doc(body))] = "host para tail"

# 5. ISO strict namespace spelling (real-world docx ships both)
body = '<w:p><w:r><w:t>strict namespace</w:t></w:r></w:p>'
expected[pack("docx_strict_ns.docx", doc(body, ns=W_STRICT))] = \
    "strict namespace"

# 6. foreign-namespace p/t elements must NOT contribute
body = (
    '<w:p><w:r><w:t>real</w:t></w:r></w:p>'
    '<x:p xmlns:x="urn:other"><x:t>FOREIGN MUST NOT APPEAR</x:t></x:p>')
expected[pack("docx_foreign_ns.docx", doc(body))] = "real"

# 7. refusals: no document.xml part / malformed XML / DOCTYPE (XXE)
with zipfile.ZipFile(os.path.join(OUT, "docx_no_part.docx"), "w") as zf:
    zf.writestr(zipfile.ZipInfo("[Content_Types].xml", (1980, 1, 1, 0, 0, 0)),
                CONTENT_TYPES)
pack("docx_malformed.docx", '<w:document><w:body><w:p><<<garbage')
pack("docx_doctype.docx",
     '<?xml version="1.0"?><!DOCTYPE w:document [<!ENTITY x "y">]>' +
     doc('<w:p><w:r><w:t>&x;</w:t></w:r></w:p>'))

with open(os.path.join(OUT, "docx_expected.json"), "w") as f:
    json.dump(expected, f, indent=1, ensure_ascii=False, sort_keys=True)
print(f"wrote {len(expected)} parse fixtures + 3 refusal fixtures")
