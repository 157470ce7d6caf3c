#!/usr/bin/env python3
"""Fuzz the multi-comma date-vote model against live dateutil.

Enumerates all-digit comma chains ("a,b,c", "a,b,c,d", merge-heavy widths,
empty segments) and writes each shape's dateutil verdict (parses at the
CURRENT run date → True/False) to stdout alongside the expected verdict
from a python mirror of graft's Dates.multiCommaVote. Exit 1 on any
mismatch between dateutil and the mirror.

The Scala side is checked separately: MultiCommaFuzzSpec replays the same
enumeration through Dates.multiCommaVote and compares against the golden
dumped here (goldens/comma_vote.json), pinned at this script's run date.

Usage: python3 tools/fuzz_comma.py [golden_out.json]
"""
import itertools
import json
import sys
from calendar import monthrange
from datetime import datetime

from dateutil.parser import parse as dp

TODAY = datetime.now()


def dateutil_votes(s):
    try:
        dp(s, default=TODAY).isoformat()
        return True
    except Exception:
        return False


# ---- python mirror of Dates.multiCommaVote (independent reimplementation
# from the dateutil source, used to cross-check the Scala model's logic
# before the golden pins it) ----
def mirror(s, today):
    segs = s.split(",")
    toks = []
    i = 0
    while i < len(segs):
        if segs[i] == "":
            i += 1
        elif len(segs[i]) >= 2 and i + 1 < len(segs) and segs[i + 1] != "":
            toks.append(segs[i] + "." + segs[i + 1])
            i += 2
        else:
            toks.append(segs[i])
            i += 1

    ymd = []
    ystr = -1
    century = False
    hour = minute = second = -1

    def append_val(v, frac_pos):
        nonlocal ystr, century
        if v > 100 or (v == 100 and frac_pos):
            if ystr >= 0:
                return False
            century = True
            ystr = len(ymd)
        ymd.append(v)
        return True

    def append_str(t, label):
        nonlocal ystr, century
        if len(t) > 2:
            if ystr >= 0:
                return False
            century = True
            ystr = len(ymd)
        elif label == "Y":
            if ystr >= 0:
                return False
            ystr = len(ymd)
        ymd.append(int(t))
        return True

    def pint(x):
        return int(x) if x and x.isdigit() and len(x) <= 9 else None

    ok = True
    for t in toks:
        if not ok:
            break
        li = len(t)
        dot = t.find(".")
        if len(ymd) == 3 and li in (2, 4) and hour < 0:
            h = pint(t[:2])
            m = pint(t[2:4]) if li == 4 else 0
            if h is None or m is None:
                ok = False
            else:
                hour, minute = h, m
        elif li == 6 or (li > 6 and dot == 6):
            if not ymd and dot < 0:
                ok = (append_str(t[:2], " ") and append_str(t[2:4], " ")
                      and append_str(t[4:], " "))
            else:
                rest = t[4:]
                if "." in rest:
                    sec_str, frac = rest.split(".", 1)
                    frac_ok = frac.isdigit() or frac == ""
                    # python int('') raises inside _parsems; empty frac
                    # means trailing '.', which merged tokens never have
                else:
                    sec_str, frac_ok = rest, True
                h, m, sec = pint(t[:2]), pint(t[2:4]), pint(sec_str)
                if h is None or m is None or sec is None or not frac_ok:
                    ok = False
                else:
                    hour, minute, second = h, m, sec
        elif li in (8, 12, 14) and dot < 0:
            ok = (append_str(t[:4], "Y") and append_str(t[4:6], " ")
                  and append_str(t[6:8], " "))
            if ok and li > 8:
                h, m = pint(t[8:10]), pint(t[10:12])
                if h is None or m is None:
                    ok = False
                else:
                    hour, minute = h, m
                if ok and li > 12:
                    sec = pint(t[12:14])
                    if sec is None:
                        ok = False
                    else:
                        second = sec
        elif li in (8, 12, 14):
            ok = False
        else:
            int_part = t if dot < 0 else t[:dot]
            frac_pos = dot >= 0 and any(c != "0" for c in t[dot + 1:])
            if int_part == "":
                ok = False
            else:
                v = int(int_part) if len(int_part) <= 18 else 10**18
                ok = append_val(v, frac_pos)

    if not ok or len(ymd) > 3:
        return False

    yearv = monthv = dayv = -1
    n = len(ymd)
    if n == 1:
        if ystr == 0 or ymd[0] > 31:
            yearv = ymd[0]
        else:
            dayv = ymd[0]
    elif n == 2:
        if ymd[0] > 31:
            yearv, monthv = ymd
        elif ymd[1] > 31:
            monthv, yearv = ymd
        else:
            monthv, dayv = ymd
    elif n == 3:
        if ymd[0] > 31 or ystr == 0:
            yearv, monthv, dayv = ymd
        elif ymd[0] > 12:
            dayv, monthv, yearv = ymd
        else:
            monthv, dayv, yearv = ymd

    def convert2(y):
        t0 = today.year
        y += t0 // 100 * 100
        if y >= t0 + 50:
            y -= 100
        elif y < t0 - 50:
            y += 100
        return y

    yy = today.year if yearv < 0 else (
        convert2(yearv) if yearv < 100 and not century else yearv)
    if yy < 1 or yy > 9999:
        return False
    mm = today.month if monthv < 0 else monthv
    if mm < 1 or mm > 12:
        return False
    if dayv >= 0:
        if dayv < 1 or dayv > monthrange(yy, mm)[1]:
            return False
    if hour > 23 or minute > 59 or second > 59:
        return False
    return True


def shapes():
    vals2 = ["0", "1", "5", "9", "00", "05", "12", "13", "28", "29", "30",
             "31", "32", "45", "99", "000", "100", "999", "0024", "2024",
             "9999", "12345", "123456", "235959", "246060", "20240105",
             "1000000"]
    # full 3-member product over a compact value set
    small = ["0", "1", "5", "12", "13", "29", "31", "32", "99", "100",
             "999", "2024", "05", "06", "123456"]
    for a, b, c in itertools.product(small, small, small):
        yield f"{a},{b},{c}"
    # boundary singles with wide members
    for a in vals2:
        for b in vals2:
            yield f"{a},{b},7"
            yield f"1,{a},{b}"
    # 4+ members, empty segments, merged-tails
    for s in ["1,2,3,4", "1,2,3,12", "1,2,3,45", "1,2,3,05", "1,2,3,0512",
              "1,2,3,2459", "5,,6,2024", "1,000,000", "12,34,56,78",
              "1,2,123456", "1,2,235959", "1,2,246060", "5,6,20240105",
              "1,,2,,3", "00,00,00", "0,0,0", "2024,1,5", "999,1,5",
              "100,5,6", "101,5,6", "1,100,5", "1,101,5", "5,100,1000",
              "123,45,67", "1234,5,6", "12345,6,7", "1,23456,7",
              "9,9,9,9,9", "31,1,2024", "1,31,2024", "29,2,2024",
              "2,29,2024", "1,2,10000", "1,2,99999",
              "5,,6", "05,,06", "123,,456", "1,,,2,,,3", "00,,2024,,5"]:
        yield s


def main():
    mismatches = []
    golden = []
    n = 0
    today_d = TODAY.date()
    for s in shapes():
        n += 1
        du = dateutil_votes(s)
        mi = mirror(s, today_d)
        golden.append([s, du])
        if du != mi:
            mismatches.append((s, du, mi))
    print(f"{n} shapes, {len(mismatches)} dateutil/mirror mismatches")
    for s, du, mi in mismatches[:40]:
        print(f"  MISMATCH {s!r}: dateutil={du} mirror={mi}")
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump({"run_date": today_d.isoformat(), "entries": golden},
                      f, separators=(",", ":"))
        print(f"wrote {len(golden)} verdicts -> {sys.argv[1]}")
    sys.exit(1 if mismatches else 0)


if __name__ == "__main__":
    main()
