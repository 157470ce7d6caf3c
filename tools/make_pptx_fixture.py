#!/usr/bin/env python3
"""PPTX fixtures for PptxSpec (python-pptx is not installed in this
container, so the packages are hand-assembled PresentationML — the same
XML PowerPoint/python-pptx emit, cross-checked against ISO/IEC 29500-1
§19). Each fixture gets an expected-text entry in pptx_expected.json
encoding the extractor's documented python-pptx-aligned semantics:

  - slides in sldIdLst order, resolved through presentation rels
  - per slide: shape-tree document order, <a:p> paragraphs joined \n,
    runs' <a:t> concatenated, <a:br/> -> \n, a:fld keeps its cached
    <a:t>, notes/layout/master parts contribute nothing
  - slides joined with \n

Writes src/test/resources/fixtures/pptx_*.pptx + pptx_expected.json.
Deliberately INDEPENDENT of the Scala writer (python zipfile + hand
XML) so the spec is a differential check, not an echo.
"""
import json
import os
import zipfile

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/test/resources/fixtures")

P = "http://schemas.openxmlformats.org/presentationml/2006/main"
A = "http://schemas.openxmlformats.org/drawingml/2006/main"
R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/ppt/presentation.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/>'
    '</Types>')

ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    f'<Relationship Id="rId1" Type="{R}/officeDocument" Target="ppt/presentation.xml"/>'
    '</Relationships>')


def presentation(rids):
    ids = "".join(f'<p:sldId id="{256+i}" r:id="{rid}"/>'
                  for i, rid in enumerate(rids))
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<p:presentation xmlns:p="{P}" xmlns:r="{R}">'
        f'<p:sldMasterIdLst/><p:sldIdLst>{ids}</p:sldIdLst>'
        '<p:sldSz cx="9144000" cy="6858000"/></p:presentation>')


def rels(pairs, extra=""):
    body = "".join(
        f'<Relationship Id="{rid}" Type="{R}/slide" Target="{t}"/>'
        for rid, t in pairs)
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        f'{body}{extra}</Relationships>')


def slide(body):
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<p:sld xmlns:p="{P}" xmlns:a="{A}">'
        f'<p:cSld><p:spTree>{body}</p:spTree></p:cSld></p:sld>')


def pack(path, members):
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for name, data in members:
            z.writestr(zipfile.ZipInfo(name, (1980, 1, 1, 0, 0, 0)),
                       data.encode("utf-8") if isinstance(data, str) else data)


def main():
    expected = {}

    # basic: two slides out of filename order, runs/breaks/fields,
    # formatting ignored, foreign-namespace shapes contribute nothing
    s_one = slide(
        '<p:sp><p:nvSpPr><p:cNvPr id="2" name="Title"/></p:nvSpPr>'
        '<p:txBody><a:bodyPr/>'
        '<a:p><a:r><a:rPr b="1"/><a:t>Deck Title</a:t></a:r></a:p>'
        '<a:p><a:r><a:t>line one</a:t></a:r><a:br/>'
        '<a:r><a:t xml:space="preserve">line two &amp; more</a:t></a:r></a:p>'
        '</p:txBody></p:sp>'
        '<p:sp><p:txBody><a:bodyPr/>'
        '<a:p><a:fld id="{X}" type="slidenum"><a:t>1</a:t></a:fld></a:p>'
        '</p:txBody></p:sp>')
    s_two = slide(
        '<p:graphicFrame><a:graphic><a:graphicData>'
        '<a:tbl><a:tr><a:tc><a:txBody><a:bodyPr/>'
        '<a:p><a:r><a:t>cell téxt</a:t></a:r></a:p>'
        '</a:txBody></a:tc></a:tr></a:tbl>'
        '</a:graphicData></a:graphic></p:graphicFrame>')
    pack(os.path.join(OUT, "pptx_basic.pptx"), [
        ("[Content_Types].xml", CONTENT_TYPES),
        ("_rels/.rels", ROOT_RELS),
        ("ppt/presentation.xml", presentation(["rId5", "rId6"])),
        # slide parts named in reverse: order must come from the rels
        ("ppt/_rels/presentation.xml.rels",
         rels([("rId5", "slides/slide2.xml"), ("rId6", "slides/slide1.xml")])),
        ("ppt/slides/slide2.xml", s_one),
        ("ppt/slides/slide1.xml", s_two),
    ])
    expected["pptx_basic"] = (
        "Deck Title\nline one\nline two & more\n1\ncell téxt")

    # empty slide between two others keeps the separator structure
    pack(os.path.join(OUT, "pptx_empty_mid.pptx"), [
        ("[Content_Types].xml", CONTENT_TYPES),
        ("_rels/.rels", ROOT_RELS),
        ("ppt/presentation.xml", presentation(["rId1", "rId2", "rId3"])),
        ("ppt/_rels/presentation.xml.rels",
         rels([("rId1", "slides/slide1.xml"), ("rId2", "slides/slide2.xml"),
               ("rId3", "slides/slide3.xml")])),
        ("ppt/slides/slide1.xml",
         slide('<p:sp><p:txBody><a:p><a:r><a:t>first</a:t></a:r></a:p>'
               '</p:txBody></p:sp>')),
        ("ppt/slides/slide2.xml", slide('')),
        ("ppt/slides/slide3.xml",
         slide('<p:sp><p:txBody><a:p><a:r><a:t>third</a:t></a:r></a:p>'
               '</p:txBody></p:sp>')),
    ])
    expected["pptx_empty_mid"] = "first\n\nthird"

    # malformed twins
    pack(os.path.join(OUT, "pptx_no_part.pptx"), [
        ("[Content_Types].xml", CONTENT_TYPES),
        ("_rels/.rels", ROOT_RELS),
    ])
    pack(os.path.join(OUT, "pptx_dangling_rel.pptx"), [
        ("[Content_Types].xml", CONTENT_TYPES),
        ("_rels/.rels", ROOT_RELS),
        ("ppt/presentation.xml", presentation(["rId1"])),
        ("ppt/_rels/presentation.xml.rels",
         rels([("rId1", "slides/slide1.xml")])),
        # slide part missing entirely
    ])
    pack(os.path.join(OUT, "pptx_malformed.pptx"), [
        ("[Content_Types].xml", CONTENT_TYPES),
        ("_rels/.rels", ROOT_RELS),
        ("ppt/presentation.xml", presentation(["rId1"])),
        ("ppt/_rels/presentation.xml.rels",
         rels([("rId1", "slides/slide1.xml")])),
        ("ppt/slides/slide1.xml", "<p:sld><p:cSld><<<"),
    ])
    pack(os.path.join(OUT, "pptx_doctype.pptx"), [
        ("[Content_Types].xml", CONTENT_TYPES),
        ("_rels/.rels", ROOT_RELS),
        ("ppt/presentation.xml",
         '<!DOCTYPE d [<!ENTITY x "y">]>' + presentation(["rId1"])),
        ("ppt/_rels/presentation.xml.rels",
         rels([("rId1", "slides/slide1.xml")])),
        ("ppt/slides/slide1.xml", slide('')),
    ])

    with open(os.path.join(OUT, "pptx_expected.json"), "w") as f:
        json.dump(expected, f, ensure_ascii=False, indent=1, sort_keys=True)
    print("wrote", len(expected), "expected entries + 6 fixtures")


if __name__ == "__main__":
    main()
