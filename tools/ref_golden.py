#!/usr/bin/env python3
"""Capture golden outputs from the reference pipeline (/root/reference) for
fixture inputs, WITHOUT copying reference code. bs4/deepdiff are unavailable
offline; they're stubbed — the BeautifulSoup stub returns no tags, which is
exactly what real bs4 does on non-HTML text, so goldens are exact for
fixtures that contain no '<tag>' markup.

Outputs JSON goldens under src/test/resources/goldens/.
"""
import sys, os, json, types

# --- stub bs4 / deepdiff before importing the reference module ---
bs4 = types.ModuleType("bs4")
class _Soup:
    def __init__(self, text, parser): pass
    def find_all(self, x): return []
bs4.BeautifulSoup = _Soup
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
