#!/usr/bin/env python3
"""XLSX fixtures for XlsxSpec (openpyxl is not installed in this
container, so the packages are hand-assembled SpreadsheetML — the same
XML Excel/openpyxl emit, cross-checked against ISO/IEC 29500-1 §18).
Each fixture gets an expected-text entry in xlsx_expected.json encoding
the extractor's documented openpyxl-aligned semantics:

  - sheets in workbook.xml order, resolved through workbook rels
  - per sheet: a "sheet\t<name>" line then one line per row, cells
    tab-joined in document order
  - t="s" -> sharedStrings si (concatenated t runs, rPh skipped);
    t="inlineStr" -> is/t; t="str"/"e" -> v; t="b" -> TRUE/FALSE
  - numeric: integral without decimal point; date-styled (builtin
    14-22/45-47 or custom code with unquoted dmyhs) -> ISO date via the
    1900 (phantom-leap-day shift for serials < 60) or 1904 epoch

Writes src/test/resources/fixtures/xlsx_*.xlsx + xlsx_expected.json.
This generator is deliberately INDEPENDENT of the Scala writer (python
zipfile + hand XML) so the spec is a differential check, not an echo.
"""
import datetime
import json
import os
import zipfile

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/test/resources/fixtures")

NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"


def content_types(n_sheets):
    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i+1}.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.'
        'spreadsheetml.worksheet+xml"/>' for i in range(n_sheets))
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        f'{overrides}</Types>')


ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    f'<Relationship Id="rId1" Type="{R}/officeDocument" Target="xl/workbook.xml"/>'
    '</Relationships>')


def workbook(sheets, date1904=False):
    pr = '<workbookPr date1904="true"/>' if date1904 else '<workbookPr/>'
    body = "".join(
        f'<sheet name="{name}" sheetId="{i+1}" r:id="{rid}"/>'
        for i, (name, rid, _target) in enumerate(sheets))
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{NS}" xmlns:r="{R}">{pr}'
        f'<sheets>{body}</sheets></workbook>')


def wb_rels(sheets, extra=""):
    body = "".join(
        f'<Relationship Id="{rid}" Type="{R}/worksheet" Target="{target}"/>'
        for (_name, rid, target) in sheets)
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        f'{body}{extra}</Relationships>')


def styles(custom_fmts=(), xf_fmt_ids=(0, 14)):
    fmts = "".join(
        f'<numFmt numFmtId="{i}" formatCode="{c}"/>' for i, c in custom_fmts)
    num_fmts = f'<numFmts count="{len(custom_fmts)}">{fmts}</numFmts>' if custom_fmts else ''
    xfs = "".join(f'<xf numFmtId="{i}" applyNumberFormat="1"/>' for i in xf_fmt_ids)
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<styleSheet xmlns="{NS}">{num_fmts}'
        f'<cellXfs count="{len(xf_fmt_ids)}">{xfs}</cellXfs></styleSheet>')


def sst(items):
    """items: list of si inner XML strings"""
    body = "".join(f'<si>{x}</si>' for x in items)
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<sst xmlns="{NS}" count="{len(items)}" uniqueCount="{len(items)}">'
        f'{body}</sst>')


def sheet(rows):
    """rows: list of row-inner-XML strings"""
    body = "".join(f'<row r="{i+1}">{r}</row>' for i, r in enumerate(rows))
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{NS}"><sheetData>{body}</sheetData></worksheet>')


def pack(path, members):
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for name, data in members:
            z.writestr(zipfile.ZipInfo(name, (1980, 1, 1, 0, 0, 0)),
                       data.encode("utf-8") if isinstance(data, str) else data)


def excel_date(serial, date1904=False):
    if date1904:
        epoch = datetime.date(1904, 1, 1)
        adj = serial
    else:
        epoch = datetime.date(1899, 12, 30)
        adj = serial + 1 if 0 < serial < 60 else serial
    days = int(adj // 1)
    frac = adj - days
    d = epoch + datetime.timedelta(days=days)
    if frac == 0:
        return d.isoformat()
    secs = round(frac * 86400)
    t = (datetime.datetime.min + datetime.timedelta(seconds=min(secs, 86399))).time()
    return f"{d.isoformat()} {t.strftime('%H:%M:%S')}"


def main():
    expected = {}

    # ---------------------------------------------------------- basic --
    sheets = [("data", "rId1", "worksheets/sheet1.xml"),
              ("Résumé stats", "rId2", "worksheets/sheet2.xml")]
    s1 = sheet([
        '<c r="A1" t="s"><v>0</v></c>'
        '<c r="B1" t="inlineStr"><is><t xml:space="preserve">in&amp;line</t></is></c>'
        '<c r="C1"><v>42</v></c>',
        '<c r="A2"><v>3.5</v></c>'
        '<c r="B2" t="b"><v>1</v></c>'
        '<c r="C2" t="b"><v>0</v></c>'
        '<c r="D2" s="1"><v>45123</v></c>',
        '<c r="A3" t="str"><f>A1&amp;B1</f><v>cached result</v></c>'
        '<c r="B3" t="e"><v>#DIV/0!</v></c>'
        '<c r="C3"/>',
    ])
    s2 = sheet(['<c r="A1" t="s"><v>1</v></c><c r="B1"><v>-7</v></c>'])
    pack(os.path.join(OUT, "xlsx_basic.xlsx"), [
        ("[Content_Types].xml", content_types(2)),
        ("_rels/.rels", ROOT_RELS),
        ("xl/workbook.xml", workbook(sheets)),
        ("xl/_rels/workbook.xml.rels", wb_rels(sheets)),
        ("xl/styles.xml", styles()),
        ("xl/sharedStrings.xml",
         sst(['<t xml:space="preserve">héllo wörld</t>',
              '<t>second</t>'])),
        ("xl/worksheets/sheet1.xml", s1),
        ("xl/worksheets/sheet2.xml", s2),
    ])
    expected["xlsx_basic"] = "\n".join([
        "sheet\tdata",
        "héllo wörld\tin&line\t42",
        "3.5\tTRUE\tFALSE\t" + excel_date(45123),
        "cached result\t#DIV/0!\t",
        "sheet\tRésumé stats",
        "second\t-7",
    ])

    # ----------------------------------------------- rich text + rPh --
    sheets = [("r", "rId1", "worksheets/sheet1.xml")]
    pack(os.path.join(OUT, "xlsx_rich.xlsx"), [
        ("[Content_Types].xml", content_types(1)),
        ("_rels/.rels", ROOT_RELS),
        ("xl/workbook.xml", workbook(sheets)),
        ("xl/_rels/workbook.xml.rels", wb_rels(sheets)),
        ("xl/sharedStrings.xml", sst([
            # rich text: concatenated runs
            '<r><rPr><b/></rPr><t>bold</t></r><r><t xml:space="preserve"> plain</t></r>',
            # phonetic runs must NOT leak into the text
            '<t>漢字</t><rPh sb="0" eb="2"><t>かんじ</t></rPh>'
            '<phoneticPr fontId="1"/>',
        ])),
        ("xl/worksheets/sheet1.xml", sheet([
            '<c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>'])),
    ])
    expected["xlsx_rich"] = "sheet\tr\nbold plain\t漢字"

    # ------------------------------------- custom formats, date or not --
    sheets = [("f", "rId1", "worksheets/sheet1.xml")]
    pack(os.path.join(OUT, "xlsx_custom_fmt.xlsx"), [
        ("[Content_Types].xml", content_types(1)),
        ("_rels/.rels", ROOT_RELS),
        ("xl/workbook.xml", workbook(sheets)),
        ("xl/_rels/workbook.xml.rels", wb_rels(sheets)),
        # style 1: custom date code; style 2: "d" only inside quotes/
        # brackets or escaped -> NOT a date; style 3: builtin 47 (time)
        ("xl/styles.xml", styles(
            custom_fmts=[(164, 'yyyy\\-mm\\-dd;@'),
                         (165, '&quot;days:&quot;0.00 [Red]'),
                         (166, '0.0\\d')],
            xf_fmt_ids=(0, 164, 165, 47, 166))),
        ("xl/worksheets/sheet1.xml", sheet([
            '<c r="A1" s="1"><v>45000</v></c>'
            '<c r="B1" s="2"><v>45000</v></c>'
            '<c r="C1" s="3"><v>45000.5</v></c>'
            '<c r="D1" s="4"><v>45000</v></c>'])),
    ])
    expected["xlsx_custom_fmt"] = ("sheet\tf\n" +
                                   excel_date(45000) + "\t45000\t" +
                                   excel_date(45000.5) + "\t45000")

    # ------------------------------------------------ 1904 date system --
    sheets = [("d", "rId1", "worksheets/sheet1.xml")]
    pack(os.path.join(OUT, "xlsx_1904.xlsx"), [
        ("[Content_Types].xml", content_types(1)),
        ("_rels/.rels", ROOT_RELS),
        ("xl/workbook.xml", workbook(sheets, date1904=True)),
        ("xl/_rels/workbook.xml.rels", wb_rels(sheets)),
        ("xl/styles.xml", styles()),
        ("xl/worksheets/sheet1.xml", sheet([
            '<c r="A1" s="1"><v>10000</v></c><c r="B1" s="1"><v>30</v></c>'])),
    ])
    expected["xlsx_1904"] = ("sheet\td\n" +
                             excel_date(10000, date1904=True) + "\t" +
                             excel_date(30, date1904=True))

    # --------------------------- 1900 phantom-leap-day shift + fraction --
    sheets = [("s", "rId1", "worksheets/sheet1.xml")]
    pack(os.path.join(OUT, "xlsx_shift.xlsx"), [
        ("[Content_Types].xml", content_types(1)),
        ("_rels/.rels", ROOT_RELS),
        ("xl/workbook.xml", workbook(sheets)),
        ("xl/_rels/workbook.xml.rels", wb_rels(sheets)),
        ("xl/styles.xml", styles()),
        ("xl/worksheets/sheet1.xml", sheet([
            '<c r="A1" s="1"><v>1</v></c>'      # 1900-01-01 (shifted)
            '<c r="B1" s="1"><v>59</v></c>'     # 1900-02-28 (shifted)
            '<c r="C1" s="1"><v>61</v></c>'     # 1900-03-01 (no shift)
            '<c r="D1" s="1"><v>45123.75</v></c>'])),  # datetime 18:00:00
    ])
    expected["xlsx_shift"] = ("sheet\ts\n" +
                              "\t".join([excel_date(1), excel_date(59),
                                         excel_date(61),
                                         excel_date(45123.75)]))

    # --------------- sheets out of filename order + absolute rels target --
    sheets = [("zlast", "rId9", "worksheets/sheet2.xml"),
              ("afirst", "rId3", "/xl/worksheets/sheet1.xml")]
    pack(os.path.join(OUT, "xlsx_reordered.xlsx"), [
        ("[Content_Types].xml", content_types(2)),
        ("_rels/.rels", ROOT_RELS),
        ("xl/workbook.xml", workbook(sheets)),
        ("xl/_rels/workbook.xml.rels", wb_rels(sheets)),
        ("xl/worksheets/sheet1.xml", sheet(['<c r="A1"><v>1</v></c>'])),
        ("xl/worksheets/sheet2.xml", sheet(['<c r="A1"><v>2</v></c>'])),
    ])
    expected["xlsx_reordered"] = "sheet\tzlast\n2\nsheet\tafirst\n1"

    # ------------------------------------------------- malformed twins --
    # missing workbook part (structurally a fine zip)
    pack(os.path.join(OUT, "xlsx_no_workbook.xlsx"), [
        ("[Content_Types].xml", content_types(0)),
        ("_rels/.rels", ROOT_RELS),
    ])
    # shared index out of range
    sheets = [("x", "rId1", "worksheets/sheet1.xml")]
    pack(os.path.join(OUT, "xlsx_bad_sharedref.xlsx"), [
        ("[Content_Types].xml", content_types(1)),
        ("_rels/.rels", ROOT_RELS),
        ("xl/workbook.xml", workbook(sheets)),
        ("xl/_rels/workbook.xml.rels", wb_rels(sheets)),
        ("xl/sharedStrings.xml", sst(['<t>only</t>'])),
        ("xl/worksheets/sheet1.xml", sheet(['<c r="A1" t="s"><v>5</v></c>'])),
    ])
    # malformed sheet XML
    pack(os.path.join(OUT, "xlsx_malformed.xlsx"), [
        ("[Content_Types].xml", content_types(1)),
        ("_rels/.rels", ROOT_RELS),
        ("xl/workbook.xml", workbook(sheets)),
        ("xl/_rels/workbook.xml.rels", wb_rels(sheets)),
        ("xl/worksheets/sheet1.xml", "<worksheet><sheetData><row><<<"),
    ])
    # DOCTYPE smuggled into the workbook (XXE probe): must refuse
    pack(os.path.join(OUT, "xlsx_doctype.xlsx"), [
        ("[Content_Types].xml", content_types(1)),
        ("_rels/.rels", ROOT_RELS),
        ("xl/workbook.xml",
         '<!DOCTYPE d [<!ENTITY x "y">]>' + workbook(sheets)),
        ("xl/_rels/workbook.xml.rels", wb_rels(sheets)),
        ("xl/worksheets/sheet1.xml", sheet(['<c r="A1"><v>1</v></c>'])),
    ])

    with open(os.path.join(OUT, "xlsx_expected.json"), "w") as f:
        json.dump(expected, f, ensure_ascii=False, indent=1, sort_keys=True)
    print("wrote", len(expected), "expected entries +",
          len(expected) + 4, "fixtures")


if __name__ == "__main__":
    main()
