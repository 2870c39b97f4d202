#!/usr/bin/env python3
"""Coverage-contract drift check: every SparkEntry.queries key must be
cited (backticked) in a SURVEY.md §2 table row. Rounds 10 and 11 both
shipped passing keys with no §2 row; this makes the check mechanical.

Usage: python3 tools/survey_sync.py   (exit 1 on drift)
"""
import re
import sys
import pathlib

root = pathlib.Path(__file__).resolve().parent.parent
src = (root / "src/main/scala/graft/SparkEntry.scala").read_text()
m = re.search(r"def queries.*?=\s*Map\(", src)
depth, i = 1, m.end()
while depth:
    depth += (src[i] == "(") - (src[i] == ")")
    i += 1
keys = re.findall(r'"([a-z0-9_]+)"\s*->', src[m.end():i])

survey = (root / "SURVEY.md").read_text()
rows = "\n".join(l for l in survey.splitlines() if l.startswith("| "))
missing = [k for k in keys if f"`{k}`" not in rows]

print(f"{len(keys)} registry keys; {len(missing)} missing from SURVEY §2 rows")
if missing:
    for k in missing:
        print(f"  MISSING ROW: {k}")
    sys.exit(1)
