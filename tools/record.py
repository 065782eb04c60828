#!/usr/bin/env python3
"""Turn check.py stdout into the committed CORRECTNESS_*.json shape.

Usage: check.py SF OUT | record.py SF ROUND > CORRECTNESS_x.json
(reads check.py lines on stdin; exits 1 if any FAIL row is present)
"""
import json
import re
import sys

sf = float(sys.argv[1])
rnd = int(sys.argv[2])
queries = {}
for line in sys.stdin:
    m = re.match(r"(OK|ROWS|FAIL)\s+(\S+?):?\s+\((\d+) rows", line)
    if m:
        st, name, rows = m.group(1), m.group(2), int(m.group(3))
        queries[name] = {"status": st, "rows": rows}
        continue
    m = re.match(r"FAIL\s+(\S+?):?\s", line)
    if m:
        queries[m.group(1)] = {"status": "FAIL", "rows": 0}
rec = {
    "sf": sf,
    "round": rnd,
    "ok": sum(1 for q in queries.values() if q["status"] == "OK"),
    "rows_only": sum(1 for q in queries.values() if q["status"] == "ROWS"),
    "fail": sum(1 for q in queries.values() if q["status"] == "FAIL"),
    "queries": dict(sorted(queries.items())),
}
json.dump(rec, sys.stdout, indent=1)
sys.stdout.write("\n")
sys.exit(1 if rec["fail"] else 0)
