#!/usr/bin/env python3
"""Differential parity for the office/book extractors (round 17, the
round-16 verdict's task 5): random-structure DOCX / EPUB / XLSX / PPTX
packages generated and READ BACK by independent python code (zipfile +
xml.etree — none of the Scala writer/reader logic), then byte-level
mutants swept for verdict agreement.

For each format:
  - R random packages (seeded RNG) exercising the documented semantics:
    docx  — body-vs-table-vs-textbox paragraphs, tab/br/cr runs,
            strict/transitional/absent namespaces, xml:space, foreign-ns
            elements that must contribute nothing
    epub  — OPF directory layouts with ../ hrefs, spine order/subset,
            block-end newlines, script/style muting, br, blank-line
            collapse + trim
    xlsx  — all cell types, rich/phonetic shared strings, builtin+custom
            date formats, 1900-shift serials, 1904 epoch, reordered
            sheets, dyadic fractions (so JDK/CPython float repr agree)
    pptx  — sldIdLst+rels order vs reversed filenames, runs/breaks/fld,
            table text bodies, foreign-ns shapes
  - the python reader computes canon = sha256 over the extracted text
    (epub: title|lang|text) — the Scala side must match it exactly;
  - per base, byte-flip and truncation mutants with python verdicts.

TSV rows: fmt  base_idx  kind  pos  xor  verdict  hash
  kind: base | flip | cut.  verdict: ok | fail.

Checked by `sbt "runMain graft.tools.DocParity /tmp/doc_parity"`:
both-ok ⇒ hashes must match; we-accept-python-refuses ⇒ forbidden;
we-refuse-python-accepts ⇒ allowed strict-side residual (printed, and
each one message-classified).
"""
import hashlib
import io
import os
import random
import sys
import zipfile
import xml.etree.ElementTree as ET
import datetime

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/doc_parity"
R_BASES = 40
N_FLIPS = 60
N_CUTS = 8

WML = {"http://schemas.openxmlformats.org/wordprocessingml/2006/main",
       "http://purl.oclc.org/ooxml/wordprocessingml/main",
       ""}
SML = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
AML = "http://schemas.openxmlformats.org/drawingml/2006/main"


def local(tag):
    return tag.rsplit('}', 1)[-1] if tag.startswith('{') else tag


def nsof(tag):
    return tag[1:].split('}', 1)[0] if tag.startswith('{') else ""


# ===================================================================
# independent READERS (python transcriptions of the documented rules)
# ===================================================================

def read_docx(data):
    zf = zipfile.ZipFile(io.BytesIO(data))
    names = zf.namelist()
    if "word/document.xml" not in names:
        raise ValueError("no document part")
    root = ET.fromstring(zf.read("word/document.xml"))
    if local(root.tag) != "document" or nsof(root.tag) not in WML:
        # DocxText only walks wml elements; a non-wml root yields no text
        pass
    paras = []

    def run_walk(el, buf):
        for ch in el:
            l, ns = local(ch.tag), nsof(ch.tag)
            wml = ns in WML and (ns != "" or ch.tag.startswith("w:") or True)
            # ElementTree keeps prefixes only via ns URIs; the "" ns case
            # (no xmlns declared) matches DocxText's w:-prefix acceptance
            # only when the generator emits w:-prefixed tags — ours does.
            if wml and l == "p":
                continue  # nested paragraph (textbox): contributes nothing
            if wml and l == "t":
                buf.append(ch.text or "")
            elif wml and l == "tab":
                buf.append("\t")
            elif wml and l in ("br", "cr"):
                buf.append("\n")
            else:
                run_walk(ch, buf)
            if ch.tail:
                pass  # character data outside w:t is ignored by the walk

    for body in root:
        if local(body.tag) != "body" or nsof(body.tag) not in WML:
            continue
        for p in body:
            if local(p.tag) == "p" and nsof(p.tag) in WML:
                buf = []
                run_walk(p, buf)
                paras.append("".join(buf))
    return "\n".join(paras)


def read_epub(data):
    zf = zipfile.ZipFile(io.BytesIO(data))
    if zf.read("mimetype").decode("ascii").strip() != "application/epub+zip":
        raise ValueError("bad mimetype")
    croot = ET.fromstring(zf.read("META-INF/container.xml"))
    opf_path = None
    for el in croot.iter():
        if local(el.tag) == "rootfile" and opf_path is None:
            opf_path = el.get("full-path")
    if opf_path is None:
        raise ValueError("no rootfile")
    opf = ET.fromstring(zf.read(opf_path))
    title = lang = ""
    manifest = {}
    spine = []
    for el in opf.iter():
        l = local(el.tag)
        if l == "title" and not title:
            title = "".join(el.itertext())
        elif l == "language" and not lang:
            lang = "".join(el.itertext())
        elif l == "item" and el.get("id") and el.get("href"):
            manifest[el.get("id")] = el.get("href")
        elif l == "itemref" and el.get("idref"):
            spine.append(el.get("idref"))
    opf_dir = opf_path.rsplit("/", 1)[0] + "/" if "/" in opf_path else ""
    chapters = []
    for idref in spine:
        if idref not in manifest:
            raise ValueError("dangling idref")
        href = manifest[idref]
        if href.startswith("/") or "://" in href:
            raise ValueError("escaping href")
        parts, out = (opf_dir + href).split("/"), []
        for p in parts:
            if p in ("", "."):
                continue
            if p == "..":
                if not out:
                    raise ValueError("escaping href")
                out.pop()
            else:
                out.append(p)
        chapters.append(chapter_text(zf.read("/".join(out))))
    return title, lang, "\n\n".join(chapters)


BLOCK_ENDS = {"p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "tr"}


def chapter_text(xml):
    root = ET.fromstring(xml)
    buf = []

    def walk(el, in_body, muted):
        l = local(el.tag)
        if l == "body":
            in_body = True
        elif in_body and l in ("script", "style"):
            muted = True
        elif in_body and not muted and l == "br":
            buf.append("\n")
        if in_body and not muted and l not in ("script", "style") and el.text:
            # character data inside body (but body's own direct text only
            # counts once we're IN body — the body element's text counts)
            buf.append(el.text)
        elif in_body and not muted and l in ("script", "style"):
            pass
        for ch in el:
            walk(ch, in_body, muted)
            if in_body and not muted and ch.tail:
                buf.append(ch.tail)
        if in_body and not muted and l in BLOCK_ENDS:
            buf.append("\n")
    # find html root children; walk whole tree (body gate does the work)
    walk(root, False, False)
    text = "".join(buf)
    return "\n".join(s.strip() for s in text.split("\n") if s.strip())


def read_xlsx(data):
    zf = zipfile.ZipFile(io.BytesIO(data))
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    date1904 = False
    sheets = []
    RNS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
    for el in wb.iter():
        l = local(el.tag)
        if l == "workbookPr":
            date1904 = el.get("date1904") in ("1", "true")
        elif l == "sheet":
            rid = el.get(RNS)
            if rid is None:
                for k, v in el.attrib.items():
                    if local(k) == "id" and k.startswith("{"):
                        rid = v
            if el.get("name") is None or rid is None:
                raise ValueError("sheet without name/rid")
            sheets.append((el.get("name"), rid))
    rels = {}
    for el in ET.fromstring(zf.read("xl/_rels/workbook.xml.rels")).iter():
        if local(el.tag) == "Relationship":
            rels[el.get("Id")] = el.get("Target")
    shared = []
    if "xl/sharedStrings.xml" in zf.namelist():
        for si in ET.fromstring(zf.read("xl/sharedStrings.xml")):
            if local(si.tag) != "si":
                continue
            buf = []

            def tw(el, in_phonetic):
                l = local(el.tag)
                if l == "rPh":
                    in_phonetic = True
                if l == "t" and not in_phonetic:
                    buf.append(el.text or "")
                for ch in el:
                    tw(ch, in_phonetic)
            tw(si, False)
            shared.append("".join(buf))
    date_styles = set()
    if "xl/styles.xml" in zf.namelist():
        st = ET.fromstring(zf.read("xl/styles.xml"))
        custom = {}
        for el in st.iter():
            if local(el.tag) == "numFmt":
                custom[int(el.get("numFmtId"))] = el.get("formatCode")
        xfs = []
        for el in st.iter():
            if local(el.tag) == "cellXfs":
                for xf in el:
                    if local(xf.tag) == "xf":
                        xfs.append(int(xf.get("numFmtId") or 0))
        for i, fid in enumerate(xfs):
            if is_date_fmt(fid, custom.get(fid)):
                date_styles.add(i)
    out = []
    for name, rid in sheets:
        target = rels[rid]
        path = target[1:] if target.startswith("/") else "xl/" + target
        out.append("sheet\t" + name)
        ws = ET.fromstring(zf.read(path))
        for row in ws.iter():
            if local(row.tag) != "row":
                continue
            cells = []
            for c in row:
                if local(c.tag) != "c":
                    continue
                cells.append(cell_value(c, shared, date_styles, date1904))
            out.append("\t".join(cells))
    return "\n".join(out)


def is_date_fmt(fid, custom):
    if 14 <= fid <= 22 or 45 <= fid <= 47:
        return True
    if custom is None:
        return False
    buf, i, q, b = [], 0, False, False
    while i < len(custom):
        ch = custom[i]
        if q:
            if ch == '"':
                q = False
        elif b:
            if ch == ']':
                b = False
        elif ch == '"':
            q = True
        elif ch == '[':
            b = True
        elif ch == '\\':
            i += 1
        else:
            buf.append(ch)
        i += 1
    return any(c in "dmyhs" for c in "".join(buf).lower())


def cell_value(c, shared, date_styles, date1904):
    t = c.get("t", "n")
    s = int(c.get("s", "0"))
    v = None
    inline = []
    for ch in c.iter():
        if local(ch.tag) == "v":
            v = ch.text or ""
        elif local(ch.tag) == "is":
            for t2 in ch.iter():
                if local(t2.tag) == "t":
                    inline.append(t2.text or "")
    if t == "s":
        idx = int(v.strip())
        if idx < 0 or idx >= len(shared):
            raise ValueError("bad shared index")
        return shared[idx]
    if t == "inlineStr":
        return "".join(inline)
    if t in ("str", "e"):
        return v or ""
    if t == "b":
        return "TRUE" if (v or "").strip() == "1" else "FALSE"
    if t == "n":
        if v is None or v == "":
            return ""
        d = float(v.strip())
        if s in date_styles:
            return render_date(d, date1904)
        return render_num(d)
    raise ValueError("unknown cell type " + t)


def render_num(d):
    if d == int(d) and abs(d) < 1e15:
        return str(int(d))
    return repr(d)


def render_date(serial, date1904):
    adj = serial + 1 if (not date1904 and 0 < serial < 60) else serial
    epoch = datetime.date(1904, 1, 1) if date1904 else datetime.date(1899, 12, 30)
    days = int(adj // 1)
    if days < -693594 or days > 2958465:
        raise ValueError("date out of range")
    frac = adj - days
    d = epoch + datetime.timedelta(days=days)
    if frac == 0:
        return d.isoformat()
    secs = min(round(frac * 86400), 86399)
    t = (datetime.datetime.min + datetime.timedelta(seconds=secs)).time()
    return f"{d.isoformat()} {t.strftime('%H:%M:%S')}"


def read_pptx(data):
    zf = zipfile.ZipFile(io.BytesIO(data))
    pres = ET.fromstring(zf.read("ppt/presentation.xml"))
    rids = []
    in_lst = False
    for el in pres.iter():
        l = local(el.tag)
        if l == "sldIdLst":
            in_lst = True
            for sld in el:
                if local(sld.tag) == "sldId":
                    rid = None
                    for k, v in sld.attrib.items():
                        if local(k) == "id" and k.startswith("{"):
                            rid = v
                    if rid is None:
                        raise ValueError("sldId without r:id")
                    rids.append(rid)
    rels = {}
    for el in ET.fromstring(zf.read("ppt/_rels/presentation.xml.rels")).iter():
        if local(el.tag) == "Relationship":
            rels[el.get("Id")] = el.get("Target")
    slides = []
    for rid in rids:
        target = rels[rid]
        path = target[1:] if target.startswith("/") else "ppt/" + target
        root = ET.fromstring(zf.read(path))
        buf = []
        first = [True]

        def walk(el):
            if nsof(el.tag) == AML:
                l = local(el.tag)
                if l == "p":
                    if first[0]:
                        first[0] = False
                    else:
                        buf.append("\n")
                elif l == "t":
                    buf.append(el.text or "")
                elif l == "br":
                    buf.append("\n")
            for ch in el:
                walk(ch)
        walk(root)
        slides.append("".join(buf))
    return "\n".join(slides)


# ===================================================================
# random GENERATORS (independent of the Scala writers: zipfile + f-str)
# ===================================================================

# --------------------------------------------------------------- odt

ODT_OFFICE = "{urn:oasis:names:tc:opendocument:xmlns:office:1.0}"
ODT_TEXT = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"


def read_odt(data):
    """reference ODT reader: the linear teletype walk OdtText mirrors
    (text:p/text:h under office:body each start a line; text:s/tab/
    line-break expand; nested frame/list/annotation paragraphs inline).
    """
    zf = zipfile.ZipFile(io.BytesIO(data))
    names = {i.filename for i in zf.infolist()}
    if "mimetype" in names:
        mt = zf.read("mimetype").decode("ascii", "strict")
        if not mt.startswith("application/vnd.oasis.opendocument"):
            raise ValueError("foreign mimetype")
    if "content.xml" not in names:
        raise ValueError("no content.xml")
    root = ET.fromstring(zf.read("content.xml"))
    out = []
    state = {"first": True, "para": 0}

    def walk(e, in_body):
        tag = e.tag
        in_body2 = in_body or tag == ODT_OFFICE + "body"
        is_para = in_body and tag in (ODT_TEXT + "p", ODT_TEXT + "h")
        if is_para:
            if not state["first"]:
                out.append("\n")
            state["first"] = False
            state["para"] += 1
        if in_body and state["para"] > 0:
            if tag == ODT_TEXT + "s":
                c = int(e.get(ODT_TEXT + "c", "1"))
                if c < 0 or c > 1000000:
                    raise ValueError("text:s count")
                out.append(" " * c)
            elif tag == ODT_TEXT + "tab":
                out.append("\t")
            elif tag == ODT_TEXT + "line-break":
                out.append("\n")
        if in_body2 and state["para"] > 0 and e.text:
            out.append(e.text)
        for ch in e:
            walk(ch, in_body2)
            if in_body2 and state["para"] > 0 and ch.tail:
                out.append(ch.tail)
        if is_para:
            state["para"] -= 1

    walk(root, False)
    return "".join(out)


ODT_MANIFEST = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<manifest:manifest xmlns:manifest='
    '"urn:oasis:names:tc:opendocument:xmlns:manifest:1.0" '
    'manifest:version="1.2">'
    '<manifest:file-entry manifest:full-path="/" manifest:media-type='
    '"application/vnd.oasis.opendocument.text"/>'
    '<manifest:file-entry manifest:full-path="content.xml" '
    'manifest:media-type="text/xml"/></manifest:manifest>')


def gen_odt(rng):
    """random ODF text documents mixing the walk's feature surface."""
    paras = []
    for _ in range(rng.randint(2, 7)):
        kind = rng.randrange(8)
        body = esc(rnd_text(rng))
        if kind == 0:
            paras.append('<text:h text:outline-level="%d">%s</text:h>'
                         % (rng.randint(1, 3), body))
        elif kind == 1:
            paras.append("<text:p>%s<text:s text:c=\"%d\"/>%s</text:p>"
                         % (body, rng.randint(1, 5), esc(rnd_text(rng))))
        elif kind == 2:
            paras.append("<text:p>%s<text:tab/>%s<text:line-break/>%s</text:p>"
                         % (body, esc(rnd_text(rng)), esc(rnd_text(rng))))
        elif kind == 3:
            items = "".join("<text:list-item><text:p>%s</text:p></text:list-item>"
                            % esc(rnd_text(rng)) for _ in range(rng.randint(1, 3)))
            paras.append("<text:list>%s</text:list>" % items)
        elif kind == 4:
            paras.append('<text:p>%s<draw:frame><draw:text-box><text:p>%s'
                         "</text:p></draw:text-box></draw:frame>%s</text:p>"
                         % (body, esc(rnd_text(rng)), esc(rnd_text(rng))))
        elif kind == 5:
            paras.append('<text:p>pre <text:span text:style-name="T%d">%s'
                         "</text:span> post</text:p>" % (rng.randrange(9), body))
        elif kind == 6:
            paras.append("<text:p/>")
        else:
            paras.append("<text:p>%s</text:p>" % body)
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<office:document-content'
        ' xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"'
        ' xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"'
        ' xmlns:draw="urn:oasis:names:tc:opendocument:xmlns:drawing:1.0"'
        ' office:version="1.2"><office:automatic-styles/>'
        "<office:body><office:text>%s</office:text></office:body>"
        "</office:document-content>" % "".join(paras))
    members = [("mimetype", "application/vnd.oasis.opendocument.text"),
               ("META-INF/manifest.xml", ODT_MANIFEST),
               ("content.xml", content)]
    return pack(members, stored_first="mimetype")


# --------------------------------------------------------------- ods

ODS_TABLE = "{urn:oasis:names:tc:opendocument:xmlns:table:1.0}"
ODS_MAX_REPEAT = 100000


def _ods_cell(c):
    vt = c.get(ODT_OFFICE + "value-type", "")
    if c.tag == ODS_TABLE + "covered-table-cell":
        vt = ""
    if vt in ("", "string", "void"):
        parts = []
        for p in c.iter(ODT_TEXT + "p"):
            txt = []
            if p.text:
                txt.append(p.text)
            for ch in p:
                if ch.tag == ODT_TEXT + "s":
                    n = int(ch.get(ODT_TEXT + "c", "1"))
                    if n < 0 or n > 1000000:
                        raise ValueError("text:s")
                    txt.append(" " * n)
                elif ch.tag == ODT_TEXT + "tab":
                    txt.append("\t")
                elif ch.tag == ODT_TEXT + "line-break":
                    txt.append("\n")
                if ch.tail:
                    txt.append(ch.tail)
            parts.append("".join(txt))
        return "\n".join(parts)
    if vt in ("float", "percentage", "currency"):
        d = float(c.get(ODT_OFFICE + "value"))
        if d == int(d) and abs(d) < 1e15:
            return str(int(d))
        return repr(d)
    if vt == "boolean":
        bv = c.get(ODT_OFFICE + "boolean-value")
        if bv == "true":
            return "TRUE"
        if bv == "false":
            return "FALSE"
        raise ValueError("boolean-value")
    if vt == "date":
        v = c.get(ODT_OFFICE + "date-value")
    elif vt == "time":
        v = c.get(ODT_OFFICE + "time-value")
    else:
        raise ValueError("value-type " + vt)
    if not v:
        raise ValueError("missing value attr")
    return v


def read_ods(data):
    """reference ODS reader mirroring OdsText: XlsxText layout, ODF
    repeat expansion with trailing-empty trimming and the bomb cap."""
    zf = zipfile.ZipFile(io.BytesIO(data))
    names = {i.filename for i in zf.infolist()}
    if "mimetype" in names:
        mt = zf.read("mimetype").decode("ascii", "strict")
        if not mt.startswith("application/vnd.oasis.opendocument"):
            raise ValueError("foreign mimetype")
    if "content.xml" not in names:
        raise ValueError("no content.xml")
    root = ET.fromstring(zf.read("content.xml"))
    out = []
    for sheet in root.iter(ODS_TABLE + "table"):
        rows = []
        for tr in sheet.iter(ODS_TABLE + "table-row"):
            rrep = int(tr.get(ODS_TABLE + "number-rows-repeated", "1"))
            if rrep < 1:
                raise ValueError("rows-repeated")
            row = []
            for c in tr:
                if c.tag not in (ODS_TABLE + "table-cell",
                                 ODS_TABLE + "covered-table-cell"):
                    continue
                crep = int(c.get(ODS_TABLE + "number-columns-repeated", "1"))
                if crep < 1:
                    raise ValueError("columns-repeated")
                val = _ods_cell(c)
                if crep > ODS_MAX_REPEAT and val != "":
                    raise ValueError("cell repeat bomb")
                row.extend([val] * (min(crep, ODS_MAX_REPEAT) if val == "" else crep))
            while row and row[-1] == "":
                row.pop()
            if rrep > ODS_MAX_REPEAT and row:
                raise ValueError("row repeat bomb")
            rows.extend([row] * (min(rrep, ODS_MAX_REPEAT) if not row else rrep))
        while rows and not rows[-1]:
            rows.pop()
        out.append("sheet\t" + sheet.get(ODS_TABLE + "name", "")
                   + "".join("\n" + "\t".join(r) for r in rows))
    return "\n".join(out)


def gen_ods(rng):
    """random ODS mixing typed cells, repeats, padding, covered cells."""
    sheets = []
    for si in range(rng.randint(1, 3)):
        rows = []
        for _ in range(rng.randint(1, 5)):
            cells = []
            for _ in range(rng.randint(1, 4)):
                kind = rng.randrange(7)
                if kind == 0:
                    cells.append('<table:table-cell office:value-type="string">'
                                 "<text:p>%s</text:p></table:table-cell>"
                                 % esc(rnd_text(rng)))
                elif kind == 1:
                    cells.append('<table:table-cell office:value-type="float" '
                                 'office:value="%d"/>' % rng.randint(-999, 9999))
                elif kind == 2:
                    cells.append('<table:table-cell office:value-type="boolean" '
                                 'office:boolean-value="%s"/>'
                                 % rng.choice(["true", "false"]))
                elif kind == 3:
                    cells.append('<table:table-cell office:value-type="date" '
                                 'office:date-value="20%02d-0%d-1%d"/>'
                                 % (rng.randrange(30), rng.randint(1, 9),
                                    rng.randrange(10)))
                elif kind == 4:
                    cells.append('<table:table-cell office:value-type="string" '
                                 'table:number-columns-repeated="%d">'
                                 "<text:p>%s</text:p></table:table-cell>"
                                 % (rng.randint(2, 4), esc(rnd_text(rng, 1, 2))))
                elif kind == 5:
                    cells.append("<table:covered-table-cell/>")
                else:
                    cells.append('<table:table-cell table:number-columns-repeated'
                                 '="%d"/>' % rng.choice([1, 3, 4000]))
            rep = rng.choice([1, 1, 1, 2])
            rows.append('<table:table-row table:number-rows-repeated="%d">%s'
                        "</table:table-row>" % (rep, "".join(cells)))
        sheets.append('<table:table table:name="sh%d">%s</table:table>'
                      % (si, "".join(rows)))
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<office:document-content'
        ' xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"'
        ' xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"'
        ' xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"'
        ' office:version="1.2"><office:body><office:spreadsheet>%s'
        "</office:spreadsheet></office:body></office:document-content>"
        % "".join(sheets))
    members = [("mimetype", "application/vnd.oasis.opendocument.spreadsheet"),
               ("META-INF/manifest.xml", ODT_MANIFEST),
               ("content.xml", content)]
    return pack(members, stored_first="mimetype")


def pack(members, stored_first=None):
    out = io.BytesIO()
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for name, data in members:
            zi = zipfile.ZipInfo(name, (1980, 1, 1, 0, 0, 0))
            if stored_first and name == stored_first:
                zi.compress_type = zipfile.ZIP_STORED
            else:
                zi.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(zi, data.encode("utf-8") if isinstance(data, str) else data)
    return out.getvalue()


WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau upsilon träum 文字 "
         "phrase&clause <tag> quo\"te").split()


def rnd_text(rng, lo=1, hi=6):
    return " ".join(rng.choice(WORDS) for _ in range(rng.randint(lo, hi)))


def esc(s):
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def gen_docx(rng):
    strict = rng.random() < 0.2
    W = ("http://purl.oclc.org/ooxml/wordprocessingml/main" if strict
         else "http://schemas.openxmlformats.org/wordprocessingml/2006/main")
    paras = []
    for _ in range(rng.randint(1, 6)):
        runs = []
        for _ in range(rng.randint(1, 4)):
            k = rng.random()
            if k < 0.6:
                runs.append(f'<w:t xml:space="preserve">{esc(rnd_text(rng))}</w:t>')
            elif k < 0.7:
                runs.append('<w:tab/>')
            elif k < 0.8:
                runs.append('<w:br/>' if rng.random() < 0.5 else '<w:cr/>')
            elif k < 0.9:
                # foreign-ns element with text that must NOT leak
                runs.append(f'<m:t xmlns:m="http://x/math">{esc(rnd_text(rng))}</m:t>')
            else:
                runs.append('<w:bookmarkStart w:id="0" w:name="b"/>'
                            '<w:bookmarkEnd w:id="0"/>')
        body = f'<w:r><w:rPr><w:b/></w:rPr>{"".join(runs)}</w:r>'
        if rng.random() < 0.25:
            # textbox with a nested paragraph: contributes nothing
            body += ('<w:pict><w:txbxContent><w:p><w:r>'
                     f'<w:t>{esc(rnd_text(rng))}</w:t></w:r></w:p>'
                     '</w:txbxContent></w:pict>')
        paras.append(f'<w:p><w:pPr/>{body}</w:p>')
    extras = ""
    if rng.random() < 0.4:
        # table paragraphs: excluded from document.paragraphs
        extras = ('<w:tbl><w:tr><w:tc><w:p><w:r>'
                  f'<w:t>{esc(rnd_text(rng))}</w:t></w:r></w:p>'
                  '</w:tc></w:tr></w:tbl>')
    doc = (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
           f'<w:document xmlns:w="{W}"><w:body>'
           f'{"".join(paras[:max(1, len(paras)//2)])}{extras}'
           f'{"".join(paras[max(1, len(paras)//2):])}</w:body></w:document>')
    return pack([
        ("[Content_Types].xml",
         '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
         '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
         '<Default Extension="xml" ContentType="application/xml"/>'
         '<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/></Types>'),
        ("_rels/.rels",
         '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
         '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/></Relationships>'),
        ("word/document.xml", doc)])


def gen_epub(rng):
    opf_dir = rng.choice(["OEBPS", "OPS", "content", ""])
    n_ch = rng.randint(1, 4)
    chapters = []
    for ci in range(n_ch):
        blocks = []
        for _ in range(rng.randint(1, 5)):
            k = rng.random()
            tag = rng.choice(["p", "div", "h2", "li"])
            inner = esc(rnd_text(rng))
            if k < 0.2:
                inner += "<br/>" + esc(rnd_text(rng))
            if k < 0.1:
                inner += f"<script>var x = 1; // {esc(rnd_text(rng))}</script>"
            if 0.1 <= k < 0.15:
                inner += f"<span>{esc(rnd_text(rng))}</span>"
            blocks.append(f"<{tag}>{inner}</{tag}>")
        chapters.append(
            '<?xml version="1.0" encoding="UTF-8"?><!DOCTYPE html>'
            '<html xmlns="http://www.w3.org/1999/xhtml"><head>'
            '<title>c</title><style>p { color: red }</style></head>'
            f'<body>{"".join(blocks)}</body></html>')
    # spine order: shuffled subset (>=1)
    order = list(range(n_ch))
    rng.shuffle(order)
    order = order[:rng.randint(1, n_ch)]
    dirp = opf_dir + "/" if opf_dir else ""
    # chapter files live beside the opf; hrefs sometimes take a ../ path
    use_dotdot = bool(opf_dir) and rng.random() < 0.3
    href = (lambda i: f"../{dirp}ch{i}.xhtml") if use_dotdot else (lambda i: f"ch{i}.xhtml")
    manifest = "".join(
        f'<item id="c{i}" href="{href(i)}" media-type="application/xhtml+xml"/>'
        for i in range(n_ch))
    spine = "".join(f'<itemref idref="c{i}"/>' for i in order)
    title, lang = rnd_text(rng, 1, 3), rng.choice(["en", "fr", "ja"])
    opf = ('<?xml version="1.0"?>'
           '<package xmlns="http://www.idpf.org/2007/opf" xmlns:dc="http://purl.org/dc/elements/1.1/" version="3.0">'
           f'<metadata><dc:title>{esc(title)}</dc:title>'
           f'<dc:language>{lang}</dc:language></metadata>'
           f'<manifest>{manifest}</manifest><spine>{spine}</spine></package>')
    members = [("mimetype", "application/epub+zip"),
               ("META-INF/container.xml",
                '<?xml version="1.0"?><container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
                f'<rootfiles><rootfile full-path="{dirp}content.opf" media-type="application/oebps-package+xml"/></rootfiles></container>'),
               (f"{dirp}content.opf", opf)]
    for i, ch in enumerate(chapters):
        members.append((f"{dirp}ch{i}.xhtml", ch))
    return pack(members, stored_first="mimetype")


def gen_xlsx(rng):
    date1904 = rng.random() < 0.2
    shared = []

    def sid(s):
        if s not in shared:
            shared.append(s)
        return shared.index(s)

    n_sheets = rng.randint(1, 3)
    sheet_xml = []
    for _ in range(n_sheets):
        rows = []
        for ri in range(rng.randint(1, 5)):
            cells = []
            for ci in range(rng.randint(1, 5)):
                k = rng.random()
                if k < 0.3:
                    key = ("richA richB" if rng.random() < 0.15
                           else rnd_text(rng, 1, 3))
                    cells.append(f'<c t="s"><v>{sid(key)}</v></c>')
                elif k < 0.45:
                    cells.append(f'<c t="inlineStr"><is><t xml:space="preserve">{esc(rnd_text(rng, 1, 3))}</t></is></c>')
                elif k < 0.6:
                    iv = rng.randint(-10**6, 10**6)
                    fr = rng.choice([0, 0, 0.25, 0.5, 0.75])
                    v = iv + fr
                    cells.append(f'<c><v>{v}</v></c>')
                elif k < 0.7:
                    cells.append(f'<c t="b"><v>{rng.randint(0, 1)}</v></c>')
                elif k < 0.85:
                    serial = rng.choice([rng.randint(1, 59), 60,
                                         rng.randint(61, 60000)])
                    fr = rng.choice([0, 0, 0.5, 0.25])
                    style = rng.choice([1, 3])  # builtin 14 or custom date
                    cells.append(f'<c s="{style}"><v>{serial + fr}</v></c>')
                elif k < 0.95:
                    cells.append(f'<c t="str"><f>SUM()</f><v>{esc(rnd_text(rng, 1, 2))}</v></c>')
                else:
                    cells.append('<c/>')
            rows.append(f'<row r="{ri + 1}">{"".join(cells)}</row>')
        sheet_xml.append(
            '<?xml version="1.0"?>'
            f'<worksheet xmlns="{SML}"><sheetData>{"".join(rows)}</sheetData></worksheet>')
    order = list(range(n_sheets))
    rng.shuffle(order)
    R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    sheets_el = "".join(
        f'<sheet name="sh{i}" sheetId="{k + 1}" r:id="rId{i + 1}"/>'
        for k, i in enumerate(order))
    rels = "".join(
        f'<Relationship Id="rId{i + 1}" Type="{R}/worksheet" Target="worksheets/sheet{i + 1}.xml"/>'
        for i in range(n_sheets))
    pr = '<workbookPr date1904="true"/>' if date1904 else ''
    members = [
        ("[Content_Types].xml",
         '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
         '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
         '<Default Extension="xml" ContentType="application/xml"/>'
         '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/></Types>'),
        ("_rels/.rels",
         '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
         f'<Relationship Id="rId1" Type="{R}/officeDocument" Target="xl/workbook.xml"/></Relationships>'),
        ("xl/workbook.xml",
         f'<?xml version="1.0"?><workbook xmlns="{SML}" xmlns:r="{R}">{pr}<sheets>{sheets_el}</sheets></workbook>'),
        ("xl/_rels/workbook.xml.rels",
         '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
         f'{rels}</Relationships>'),
        ("xl/styles.xml",
         f'<?xml version="1.0"?><styleSheet xmlns="{SML}">'
         '<numFmts count="2"><numFmt numFmtId="164" formatCode="yyyy\\-mm\\-dd"/>'
         '<numFmt numFmtId="165" formatCode="&quot;d-quoted&quot;0.00"/></numFmts>'
         '<cellXfs count="4"><xf numFmtId="0"/><xf numFmtId="14"/>'
         '<xf numFmtId="165"/><xf numFmtId="164"/></cellXfs></styleSheet>'),
    ]
    if shared:
        sis = []
        for i, s in enumerate(shared):
            if s == "richA richB":
                sis.append('<si><r><rPr><b/></rPr><t>richA</t></r>'
                           '<r><t xml:space="preserve"> richB</t></r>'
                           '<rPh sb="0" eb="1"><t>phon</t></rPh></si>')
            else:
                sis.append(f'<si><t xml:space="preserve">{esc(s)}</t></si>')
        members.append(("xl/sharedStrings.xml",
                        f'<?xml version="1.0"?><sst xmlns="{SML}" count="{len(shared)}" uniqueCount="{len(shared)}">{"".join(sis)}</sst>'))
    for i, sx in enumerate(sheet_xml):
        members.append((f"xl/worksheets/sheet{i + 1}.xml", sx))
    return pack(members)


def gen_pptx(rng):
    P = "http://schemas.openxmlformats.org/presentationml/2006/main"
    R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    n = rng.randint(1, 4)
    slides = []
    for _ in range(n):
        shapes = []
        for _ in range(rng.randint(0, 3)):
            paras = []
            for _ in range(rng.randint(1, 3)):
                runs = []
                for _ in range(rng.randint(1, 3)):
                    k = rng.random()
                    if k < 0.7:
                        runs.append(f'<a:r><a:rPr b="1"/><a:t>{esc(rnd_text(rng, 1, 4))}</a:t></a:r>')
                    elif k < 0.8:
                        runs.append('<a:br/>')
                    else:
                        runs.append(f'<a:fld id="{{F}}" type="slidenum"><a:t>{rng.randint(1, 9)}</a:t></a:fld>')
                paras.append(f'<a:p><a:pPr/>{"".join(runs)}</a:p>')
            if rng.random() < 0.25:
                shapes.append('<p:graphicFrame><a:graphic><a:graphicData><a:tbl><a:tr><a:tc>'
                              f'<a:txBody>{"".join(paras)}</a:txBody>'
                              '</a:tc></a:tr></a:tbl></a:graphicData></a:graphic></p:graphicFrame>')
            else:
                shapes.append(f'<p:sp><p:txBody><a:bodyPr/>{"".join(paras)}</p:txBody></p:sp>')
        slides.append(f'<?xml version="1.0"?><p:sld xmlns:p="{P}" xmlns:a="{AML}">'
                      f'<p:cSld><p:spTree>{"".join(shapes)}</p:spTree></p:cSld></p:sld>')
    order = list(range(n))
    rng.shuffle(order)
    sldids = "".join(f'<p:sldId id="{256 + k}" r:id="rId{i + 1}"/>'
                     for k, i in enumerate(order))
    rels = "".join(
        f'<Relationship Id="rId{i + 1}" Type="{R}/slide" Target="slides/slide{i + 1}.xml"/>'
        for i in range(n))
    members = [
        ("[Content_Types].xml",
         '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
         '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
         '<Default Extension="xml" ContentType="application/xml"/>'
         '<Override PartName="/ppt/presentation.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/></Types>'),
        ("_rels/.rels",
         '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
         f'<Relationship Id="rId1" Type="{R}/officeDocument" Target="ppt/presentation.xml"/></Relationships>'),
        ("ppt/presentation.xml",
         f'<?xml version="1.0"?><p:presentation xmlns:p="{P}" xmlns:r="{R}">'
         f'<p:sldIdLst>{sldids}</p:sldIdLst></p:presentation>'),
        ("ppt/_rels/presentation.xml.rels",
         '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
         f'{rels}</Relationships>'),
    ]
    for i, s in enumerate(slides):
        members.append((f"ppt/slides/slide{i + 1}.xml", s))
    return pack(members)


# ===================================================================
# sweep
# ===================================================================

def canon(fmt, data):
    if fmt == "docx":
        text = read_docx(data)
    elif fmt == "epub":
        t, l, x = read_epub(data)
        text = t + "\x01" + l + "\x01" + x
    elif fmt == "xlsx":
        text = read_xlsx(data)
    elif fmt == "odt":
        text = read_odt(data)
    elif fmt == "ods":
        text = read_ods(data)
    else:
        text = read_pptx(data)
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def main():
    os.makedirs(OUT, exist_ok=True)
    gens = {"docx": gen_docx, "epub": gen_epub,
            "xlsx": gen_xlsx, "pptx": gen_pptx, "odt": gen_odt,
            "ods": gen_ods}
    for fmt, gen in gens.items():
        rng = random.Random(0xD0C + len(fmt))
        rows = []
        stats = {"ok": 0, "fail": 0}
        for bi in range(R_BASES):
            data = gen(rng)
            with open(os.path.join(OUT, f"{fmt}_{bi}.bin"), "wb") as f:
                f.write(data)
            h = canon(fmt, data)  # bases must parse: crash = generator bug
            rows.append((fmt, bi, "base", 0, 0, "ok", h))
            for _ in range(N_FLIPS):
                pos = rng.randrange(len(data))
                x = rng.choice([1, 16, 128, 255])
                m = bytearray(data)
                m[pos] ^= x
                try:
                    h = canon(fmt, bytes(m))
                    v = "ok"
                    stats["ok"] += 1
                except Exception:
                    h, v = "", "fail"
                    stats["fail"] += 1
                rows.append((fmt, bi, "flip", pos, x, v, h))
            for _ in range(N_CUTS):
                pos = rng.randrange(1, len(data))
                try:
                    h = canon(fmt, data[:pos])
                    v = "ok"
                    stats["ok"] += 1
                except Exception:
                    h, v = "", "fail"
                    stats["fail"] += 1
                rows.append((fmt, bi, "cut", pos, 0, v, h))
        with open(os.path.join(OUT, f"{fmt}.tsv"), "w") as f:
            for r in rows:
                f.write("\t".join(str(x) for x in r) + "\n")
        print(f"{fmt}: {len(rows)} rows {stats}")


if __name__ == "__main__":
    main()
