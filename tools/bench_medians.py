#!/usr/bin/env python3
"""Merge two full Bench session JSON lines into a BENCH_MEDIANS artifact
(the round protocol: two sessions, per-query 5-run medians, best-of-both).
Usage: bench_medians.py sessionA.json sessionB.json out.json [notes.json]
notes.json (optional) is a dict merged into the artifact verbatim
(protocol string, adjudications, etc.)."""
import json, sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
assert not a.get("filtered") and not b.get("filtered"), \
    "refusing to build a medians artifact from a filtered (partial) session"
ma, mb = a["medians"], b["medians"]
assert set(ma) == set(mb), sorted(set(ma) ^ set(mb))
out = {
    "protocol": "",
    "median_total_run_a": round(sum(ma.values()), 3),
    "median_total_run_b": round(sum(mb.values()), 3),
    "medians_run_a": ma,
    "medians_run_b": mb,
    "best_of_both": {k: min(ma[k], mb[k]) for k in ma},
}
out["best_of_both_total"] = round(sum(out["best_of_both"].values()), 3)
for run, d in (("a", a), ("b", b)):
    if "aux" in d:
        out[f"aux_run_{run}"] = d["aux"]
if len(sys.argv) > 4:
    out.update(json.load(open(sys.argv[4])))
json.dump(out, open(sys.argv[3], "w"), indent=1)
print(f"wrote {sys.argv[3]}: totals a={out['median_total_run_a']} "
      f"b={out['median_total_run_b']} best={out['best_of_both_total']}")
