#!/usr/bin/env python3
"""ODT fixtures for OdtSpec (odfpy is not installed in this container,
so the packages are hand-assembled ODF 1.2 XML — the same structure
LibreOffice emits, cross-checked against OASIS OpenDocument v1.2 §3
and §6). The spec-correct package shape is used: `mimetype` FIRST and
STORED (uncompressed), then manifest and content.xml deflated.

Each fixture gets an expected-text entry in odt_expected.json encoding
the linear teletype walk (odfpy extractText semantics): every text:p /
text:h under office:body starts a new line; text:s -> text:c spaces;
text:tab -> TAB; text:line-break -> LF; nested frame/list/annotation
paragraphs contribute their own lines inline.

Writes src/test/resources/fixtures/odt_*.odt + odt_expected.json.
Run from repo root: python3 tools/make_odt_fixture.py
"""
import json
import os
import zipfile

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/test/resources/fixtures")

MIME_ODT = "application/vnd.oasis.opendocument.text"
OFFICE = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
TEXT = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
DRAW = "urn:oasis:names:tc:opendocument:xmlns:drawing:1.0"

MANIFEST = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<manifest:manifest xmlns:manifest='
    '"urn:oasis:names:tc:opendocument:xmlns:manifest:1.0" '
    'manifest:version="1.2">'
    '<manifest:file-entry manifest:full-path="/" manifest:media-type="%s"/>'
    '<manifest:file-entry manifest:full-path="content.xml" '
    'manifest:media-type="text/xml"/>'
    '</manifest:manifest>' % MIME_ODT)


def content(body_xml):
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<office:document-content xmlns:office="%s" xmlns:text="%s" '
        'xmlns:draw="%s" office:version="1.2">'
        '<office:automatic-styles/>'
        '<office:body><office:text>%s</office:text></office:body>'
        '</office:document-content>' % (OFFICE, TEXT, DRAW, body_xml))


def package(content_xml, mime=MIME_ODT, drop_content=False):
    import io
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(zipfile.ZipInfo("mimetype"), mime,
                   compress_type=zipfile.ZIP_STORED)
        z.writestr("META-INF/manifest.xml", MANIFEST,
                   compress_type=zipfile.ZIP_DEFLATED)
        if not drop_content:
            z.writestr("content.xml", content_xml,
                       compress_type=zipfile.ZIP_DEFLATED)
    return buf.getvalue()


expected = {}


def emit(name, blob, want):
    with open(os.path.join(OUT, "odt_%s.odt" % name), "wb") as f:
        f.write(blob)
    if want is not None:
        expected[name] = want


def main():
    # plain paragraphs + a heading + an empty paragraph
    emit("basic", package(content(
        "<text:h text:outline-level=\"1\">The Heading</text:h>"
        "<text:p>first paragraph</text:p>"
        "<text:p/>"
        "<text:p>third one</text:p>")),
        "The Heading\nfirst paragraph\n\nthird one")

    # whitespace markup: text:s counts, tabs, line breaks
    emit("spaces", package(content(
        "<text:p>a <text:s text:c=\"3\"/>b<text:tab/>c<text:line-break/>d</text:p>"
        "<text:p>default<text:s/>s</text:p>")),
        "a    b\tc\nd\ndefault s")

    # spans, lists, and a frame with a nested paragraph (linear walk)
    emit("nested", package(content(
        "<text:p>before <text:span text:style-name=\"T1\">styled</text:span> after</text:p>"
        "<text:list><text:list-item><text:p>item one</text:p></text:list-item>"
        "<text:list-item><text:p>item two</text:p></text:list-item></text:list>"
        "<text:p>host <draw:frame><draw:text-box>"
        "<text:p>boxed para</text:p></draw:text-box></draw:frame> tail</text:p>")),
        "before styled after\nitem one\nitem two\nhost \nboxed para tail")

    # unicode + xml escapes
    emit("unicode", package(content(
        ("<text:p>caf\xc3\xa9 &amp; r\xc3\xb8d &lt;tag&gt; \xe2\x82\xac"
         "</text:p>").encode("latin-1").decode("utf-8"))),
        "caf\xe9 & r\xf8d <tag> €")

    # an opendocument SPREADSHEET mimetype still extracts (generic ODF)
    emit("ods_mime", package(content("<text:p>spreadsheetish</text:p>"),
                             mime="application/vnd.oasis.opendocument.spreadsheet"),
         "spreadsheetish")

    # refusal twins (expected = None marks them; spec checks kinds)
    emit("foreign_mime", package(content("<text:p>x</text:p>"),
                                 mime="application/zip"), None)
    emit("no_content", package("", drop_content=True), None)
    emit("bad_xml", package("<office:document-content><<<"), None)
    emit("doctype", package(
        '<?xml version="1.0"?><!DOCTYPE lol [<!ENTITY a "b">]>' +
        content("<text:p>&a;</text:p>")[38:]), None)

    with open(os.path.join(OUT, "odt_expected.json"), "w") as f:
        json.dump(expected, f, indent=1, ensure_ascii=True, sort_keys=True)
    print("wrote %d odt fixtures (+4 refusal twins)" % len(expected))


if __name__ == "__main__":
    main()
