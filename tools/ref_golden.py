#!/usr/bin/env python3
"""Capture golden outputs from the reference pipeline (/root/reference) for
fixture inputs, WITHOUT copying reference code. bs4/deepdiff are unavailable
offline; bs4 is substituted with tools/bs4_shim.py — an emulation of
bs4 >= 4.9 built on the SAME stdlib html.parser backend real bs4 wraps
(entity conversion, CDATA script/style handling, tolerant tag parsing all
come from the stdlib parser itself; the shim re-implements only the tree
building + get_text/attrs layer, with its fidelity notes in its docstring).
On text without markup the shim yields no tags, exactly like real bs4, so
the f1–f5 goldens are bit-identical to the old no-op stub's.

Outputs JSON goldens under src/test/resources/goldens/.
"""
import sys, os, json, types

# --- substitute bs4 (shim) / stub deepdiff before importing the reference ---
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import bs4_shim

bs4 = types.ModuleType("bs4")
bs4.BeautifulSoup = bs4_shim.BeautifulSoup
sys.modules["bs4"] = bs4
dd = types.ModuleType("deepdiff")
class _DD(dict):
    def __init__(self, a, b, **kw): super().__init__()
    def to_dict(self): return {}
dd.DeepDiff = _DD
sys.modules["deepdiff"] = dd

sys.path.insert(0, "/root/reference/backend")
import etl_pipeline as ref  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "goldens")
os.makedirs(OUT, exist_ok=True)


def jval(x):
    """JSON-able rendering that preserves type info."""
    import math
    if x is None:
        return None
    if isinstance(x, float) and math.isnan(x):
        return {"__nan__": True}
    return x


# ---- 1. normalize_value battery ----
battery = [
    "NA", "n/a", "NULL", "none", "", "  ", "nan", "NaN",
    "true", "True", "YES", "1", "false", "no", "0",
    "45%", "12.5%", "100%", "0.5%", "45.%",
    "John.Doe+tag@Example.COM", "user@domain.co", "bad@@x.com",
    "+1 (555) 123-4567", "555 123", "123", "0042", "  77  ",
    "$1,234", "$1,234.56", "₹99", "1,000,000", "$12",
    "12.5", "-12.5", "-5", "+7", "3.14159", "1e5", ".5",
    "2025-11-01", "2025-11-11T20:30:00Z", "2025-11-11T20:30:00",
    "2025-11-11 20:30:00", "11/05/2024", "Jan 5, 2024", "5 Jan 2024",
    "January 15, 2024", "2024-13-45", "13/45/2024",
    "Hello World", "MiXeD CaSe", "a,b,c", "x" * 10,
    "$abc", "12abc", "abc123",
]
norm = {s: jval(ref.normalize_value(s)) for s in battery}
infer = {s: ref.infer_type(s) for s in battery}
with open(f"{OUT}/normalize_value.json", "w") as f:
    json.dump({"normalize": norm, "infer": infer}, f, indent=1)

# ---- 2. pipeline-level goldens on fixtures (no-HTML fixtures are exact) ----
import pandas as pd

FIXTURES = {
    "f1_flat_json": '[ {"id": 1, "name": "Alice", "score": 95},\n  {"id": 2, "name": "Bob",   "score": 88} ]\n',
    "f2_nested_json": json.dumps({
        "users": [
            {"id": 1, "name": "Ann Lee", "email": "Ann@Ex.COM", "age": 34,
             "preferences": {"notifications": True, "theme": "dark", "languages": ["en", "fr"]},
             "transactions": [{"date": "2024-01-05", "amount": 120.5, "currency": "USD", "items": ["a", "b"]}],
             "active": True, "lastLogin": "2024-02-01T10:00:00Z"},
            {"user_id": "u-77", "full_name": "Bo Chen",
             "contact": {"email": "bo@x.io", "phone": "+1234567890"},
             "membership": "gold", "points": 1500, "preferences": None,
             "lastPurchase": {"item": "widget", "price": 9.99, "currency": "USD", "purchaseDate": "2024-03-10"},
             "isActive": False},
            {"id": 3, "username": "zed", "profile": {"bio": "hi there", "social": {"twitter": "@zed", "twitch": "zedtv"}},
             "stats": {"gamesPlayed": 42, "highestScore": 9001}, "active": True},
        ],
        "metadata": {"generatedAt": "2024-04-01T12:00:00Z", "source": "unit-test"},
    }, indent=1),
    "f3_mixed_no_html": (
        'Report intro text.\n\n'
        '{"metric": "latency", "p50": 12.5, "ok": true}\n\n'
        'name,qty,price\nbolt,4,0.25\nnut,8,0.10\n\n'
        'service: api\nreplicas: 3\n\n'
        'def add(a, b):\n    return a + b\n\n'
        'print("done")\n'
        '[2024-05-01 10:00:00] started worker\n'
        '[2024-05-02 11:30:15] stopped worker\n'
    ),
    "f4_norm_torture": json.dumps([
        {"nulls": "NA", "bools": "yes", "pct": "45%", "email": "A@B.COM", "phone": "+1 (555) 123",
         "ints": "123", "cur": "$1,234", "flt": "12.5", "date": "2025-11-01",
         "dt": "2025-11-11T20:30:00Z", "neg": "-5", "txt": "Free TEXT here"},
        {"nulls": "none", "bools": "0", "pct": "7.5%", "email": "x.y+z@mail.org", "phone": "555 123",
         "ints": "77", "cur": "₹99", "flt": "3.25", "date": "2025-01-31",
         "dt": "2025-01-01 09:15:00", "neg": "-12.5", "txt": "Another, value"},
    ]),
    "f5_empty": "",
}

goldens = {}
for name, text in FIXTURES.items():
    path = f"/tmp/refrun/{name}.txt"
    os.makedirs("/tmp/refrun", exist_ok=True)
    with open(path, "w") as f:
        f.write(text)
    df = ref.extract_structured_blocks(path)
    df = ref.normalize_data(df)
    df = ref.flatten_dataframe(df)
    schema = ref.generate_schema(df)
    # strip time-dependent bits
    schema.pop("schema_id"); schema.pop("generated_at")
    rows = [{k: jval(v) for k, v in rec.items()} for rec in df.to_dict(orient="records")]
    goldens[name] = {
        "input": text,
        "columns": list(df.columns),
        "rows": rows,
        "schema": schema,
    }

with open(f"{OUT}/pipeline_goldens.json", "w") as f:
    json.dump(goldens, f, indent=1, default=str)
print("wrote goldens:", list(goldens), "cols:", {k: len(v["columns"]) for k, v in goldens.items()})

# ---- 3. adversarial HTML goldens (bs4-shim-backed reference run) ----
HTML_FIXTURES = {
    # well-formed basics: nesting, multi-valued class/rel, the >3 text filter
    "f6_html_basic": (
        '<div class="box main" id="d1">Hello <b>world</b> and <i>friends</i></div>\n'
        '<p>abc</p>\n'
        '<a href="/x?a=1&amp;b=2" rel="nofollow noopener">Link text here</a>\n'
        '<ul><li>item one</li><li>item two</li></ul>\n'
    ),
    # malformed: uppercase tags, unclosed <p>s, attr values with embedded >,
    # bare attrs, unquoted values, misnesting, unclosed element at EOF
    "f7_html_malformed": (
        '<DIV CLASS="A B"><p>first para<p>second para</DIV>\n'
        "<span title=\"a > b\" data-x='1 > 2'>compare values</span>\n"
        '<input disabled value=unquoted>\n'
        '<b><i>misnested bold italic</b></i>\n'
        '<section>unclosed section with <em>emphasis\n'
    ),
    # hidden strings: doctype, style/script CDATA bodies, comments,
    # template subtrees, processing instructions — none visible to get_text
    "f8_html_hidden": (
        '<!DOCTYPE html>\n'
        '<html><head><style>body { color: red; }</style>\n'
        '<script type="text/javascript">if (a < b && c > d) { go("x&amp;y"); }</script>\n'
        '</head><body>\n'
        '<!-- a comment longer than three chars -->\n'
        '<template><span>ghost content</span></template>\n'
        '<div>visible text<?php echo "server"; ?></div>\n'
        '</body></html>\n'
    ),
    # HTML inside JSON: the strict-JSON, embedded-JSON and HTML extractors
    # all fire on the same text (composition check)
    "f9_html_in_json": (
        '{"title": "Report", '
        '"body": "<div class=\'x\'>embedded markup text</div>", "n": 5}\n'
    ),
    # entities: core named + numeric dec/hex decode on both sides; the
    # second paragraph needs the full HTML5 named table (&eacute;) — a
    # DOCUMENTED deviation (engine keeps it literal)
    "f10_html_entities": (
        '<p>5 &lt; 6 &amp;&amp; 7 &gt; 3, &quot;q&quot; &#65;&#x42; ok</p>\n'
        '<p>caf&eacute; needs the full table</p>\n'
    ),
}

html_goldens = {}
for name, text in HTML_FIXTURES.items():
    path = f"/tmp/refrun/{name}.txt"
    with open(path, "w") as f:
        f.write(text)
    df = ref.extract_structured_blocks(path)
    df = ref.normalize_data(df)
    df = ref.flatten_dataframe(df)
    schema = ref.generate_schema(df)
    schema.pop("schema_id"); schema.pop("generated_at")
    rows = [{k: jval(v) for k, v in rec.items()} for rec in df.to_dict(orient="records")]
    html_goldens[name] = {
        "input": text,
        "columns": list(df.columns),
        "rows": rows,
        "schema": schema,
    }

with open(f"{OUT}/html_goldens.json", "w") as f:
    json.dump(html_goldens, f, indent=1, default=str)
print("wrote html goldens:", {k: (len(v["columns"]), len(v["rows"])) for k, v in html_goldens.items()})
