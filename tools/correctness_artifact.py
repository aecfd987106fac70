#!/usr/bin/env python3
"""Fold a compare.py --strict-hash transcript into a committed
correctness artifact (the sf0.1 sweep the round-17 verdict asked to
be judge-replayable instead of PLANS-attested).

Usage: python3 tools/correctness_artifact.py <cmp.txt> <sf> <out.json>
"""
import json, re, sys

cmp_path, sf, out = sys.argv[1], sys.argv[2], sys.argv[3]
queries = {}


def record(q, entry):
    # a transcript is ONE sweep: the same query appearing twice means
    # two runs were appended to one file, and last-line-wins could
    # mask an earlier FAIL — refuse instead of silently overwriting
    if q in queries:
        raise SystemExit(
            f"duplicate result lines for query {q!r} — transcript "
            "holds more than one sweep; split the runs")
    queries[q] = entry


for line in open(cmp_path):
    m = re.match(r"ok\s+(\S+) \((\d+) rows(?:, strict ([0-9a-f]+))?\)",
                 line)
    if m:
        record(m.group(1), {
            "rows": int(m.group(2)),
            "match": True,
            **({"hash12": m.group(3)} if m.group(3) else {})})
        continue
    # "ok"-shaped lines that miss the regex (a format drift in
    # compare.py) must not be silently dropped as chatter — they are
    # results this artifact would under-count
    if re.match(r"ok\s", line):
        raise SystemExit(f"unrecognized ok line: {line!r}")
    # compare.py FAIL spellings: "FAIL <q>: ..." and the strict-mode
    # audits "FAIL negative-zero <q>: ..." — a dropped FAIL line
    # would misreport a failing sweep as green, so refuse lines this
    # parser does not recognize
    m = re.match(r"FAIL\s+(?:negative-zero\s+)?(\S+):\s*(.*)", line)
    if m:
        record(m.group(1), {"match": False, "err": m.group(2)[:300]})
        continue
    if line.startswith("FAIL"):
        raise SystemExit(f"unrecognized FAIL line: {line!r}")
ok = sum(1 for q in queries.values() if q["match"])
artifact = {
    "sf": sf,
    "mode": "strict-hash (compare.py --strict-hash: canonical-sorted "
            "rows, repr-rendered cells, SHA-256 per side — the "
            "driver's verdict reproduced locally)",
    "total": len(queries),
    "pass": ok,
    "fail": [k for k, v in sorted(queries.items()) if not v["match"]],
    "queries": dict(sorted(queries.items())),
}
json.dump(artifact, open(out, "w"), indent=1)
print(f"{out}: {ok}/{len(queries)} strict-green at {sf}")
