#!/usr/bin/env python3
"""EPUB fixtures for EpubSpec — independently assembled OCF containers
(python zipfile; the structures follow the public IDPF OCF/OPF specs):
DOCTYPE-laden XHTML chapters, inline markup, script/style exclusion,
entities, an OPF in a nested directory with ../ hrefs, spine reordering,
plus refusal fixtures. Expected text goes to epub_expected.json.

Run from repo root: python3 tools/make_epub_fixture.py
"""
import json
import os
import zipfile

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/test/resources/fixtures")

CONTAINER = ('<?xml version="1.0" encoding="UTF-8"?>'
             '<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
             '<rootfiles><rootfile full-path="{opf}" media-type="application/oebps-package+xml"/></rootfiles>'
             '</container>')


def esc(s):
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def opf(title, lang, items, spine):
    m = "".join(f'<item id="{i}" href="{h}" media-type="application/xhtml+xml"/>'
                for i, h in items)
    s = "".join(f'<itemref idref="{i}"/>' for i in spine)
    return ('<?xml version="1.0" encoding="UTF-8"?>'
            '<package xmlns="http://www.idpf.org/2007/opf" '
            'xmlns:dc="http://purl.org/dc/elements/1.1/" version="3.0" '
            'unique-identifier="uid">'
            f'<metadata><dc:title>{esc(title)}</dc:title>'
            f'<dc:language>{lang}</dc:language>'
            '<dc:identifier id="uid">fx</dc:identifier></metadata>'
            f'<manifest>{m}</manifest><spine>{s}</spine></package>')


def pack(name, members):
    path = os.path.join(OUT, name)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zi = zipfile.ZipInfo("mimetype", (1980, 1, 1, 0, 0, 0))
        zf.writestr(zi, "application/epub+zip",
                    compress_type=zipfile.ZIP_STORED)
        for n, data in members:
            zi = zipfile.ZipInfo(n, (1980, 1, 1, 0, 0, 0))
            zf.writestr(zi, data)
    return name


XHTML1 = ('<?xml version="1.0" encoding="UTF-8"?>'
          '<!DOCTYPE html>'
          '<html xmlns="http://www.w3.org/1999/xhtml"><head>'
          '<title>HEAD TITLE MUST NOT APPEAR</title>'
          '<style>body { color: red }</style></head><body>'
          '<h1>Chapter One</h1>'
          '<p>It was a <em>bright</em> cold day in April.</p>'
          '<p>Clocks were striking &lt;thirteen&gt; &amp; more.</p>'
          '<script>alert("MUST NOT APPEAR")</script>'
          '<div>last<br/>lines</div>'
          '</body></html>')
XHTML1_TEXT = ("Chapter One\nIt was a bright cold day in April.\n"
               "Clocks were striking <thirteen> & more.\nlast\nlines")

XHTML2 = ('<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.1//EN" '
          '"http://www.w3.org/TR/xhtml11/DTD/xhtml11.dtd">'
          '<html xmlns="http://www.w3.org/1999/xhtml"><head>'
          '<title>t</title></head><body>'
          '<ul><li>alpha</li><li>beta</li></ul>'
          '<table><tr><td>c1</td><td>c2</td></tr></table>'
          '</body></html>')
XHTML2_TEXT = "alpha\nbeta\nc1c2"

expected = {}

# 1. two chapters, nested OPF dir with ../ href for chapter 2
members = [
    ("META-INF/container.xml", CONTAINER.format(opf="book/pkg/content.opf")),
    ("book/pkg/content.opf",
     opf("A Fixture & Title", "en",
         [("c1", "../text/one.xhtml"), ("c2", "../text/two.xhtml")],
         ["c1", "c2"])),
    ("book/text/one.xhtml", XHTML1),
    ("book/text/two.xhtml", XHTML2),
]
expected[pack("epub_basic.epub", members)] = {
    "title": "A Fixture & Title", "language": "en",
    "chapters": [XHTML1_TEXT, XHTML2_TEXT]}

# 2. spine REORDERS the manifest (two items, reversed)
members = [
    ("META-INF/container.xml", CONTAINER.format(opf="content.opf")),
    ("content.opf",
     opf("Reordered", "fr",
         [("a", "one.xhtml"), ("b", "two.xhtml")], ["b", "a"])),
    ("one.xhtml", XHTML1),
    ("two.xhtml", XHTML2),
]
expected[pack("epub_reordered.epub", members)] = {
    "title": "Reordered", "language": "fr",
    "chapters": [XHTML2_TEXT, XHTML1_TEXT]}

# 3. refusals
pack("epub_bad_mimetype.epub", [
    ("META-INF/container.xml", CONTAINER.format(opf="content.opf")),
    ("content.opf", opf("x", "en", [("a", "one.xhtml")], ["a"])),
    ("one.xhtml", XHTML1)])
# overwrite the mimetype with the wrong value
path = os.path.join(OUT, "epub_bad_mimetype.epub")
with zipfile.ZipFile(path, "w") as zf:
    zf.writestr(zipfile.ZipInfo("mimetype", (1980, 1, 1, 0, 0, 0)),
                "application/zip")
    zf.writestr(zipfile.ZipInfo("META-INF/container.xml",
                                (1980, 1, 1, 0, 0, 0)),
                CONTAINER.format(opf="content.opf"))

pack("epub_missing_chapter.epub", [
    ("META-INF/container.xml", CONTAINER.format(opf="content.opf")),
    ("content.opf", opf("x", "en", [("a", "gone.xhtml")], ["a"]))])

pack("epub_dangling_idref.epub", [
    ("META-INF/container.xml", CONTAINER.format(opf="content.opf")),
    ("content.opf", opf("x", "en", [("a", "one.xhtml")], ["a", "ghost"])),
    ("one.xhtml", XHTML1)])

pack("epub_escape_href.epub", [
    ("META-INF/container.xml", CONTAINER.format(opf="content.opf")),
    ("content.opf", opf("x", "en", [("a", "../../etc/passwd")], ["a"])),
    ("one.xhtml", XHTML1)])

with open(os.path.join(OUT, "epub_expected.json"), "w") as f:
    json.dump(expected, f, indent=1, ensure_ascii=False, sort_keys=True)
print(f"wrote {len(expected)} parse fixtures + 4 refusal fixtures")
