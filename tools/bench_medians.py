#!/usr/bin/env python3
"""Merge two full Bench session JSON lines into a BENCH_MEDIANS artifact
(the round protocol: two sessions, per-query 5-run medians, best-of-both).
Usage: bench_medians.py sessionA.json sessionB.json out.json [notes.json]
notes.json (optional) is a dict merged into the artifact verbatim
(protocol string, adjudications, etc.)."""
import json, sys

# The drift-probe reference epoch, pinned in round 14: Bench's pinned
# spark.range probe (CPU sum + 64k-key shuffle agg + broadcast join,
# median of 5 after warmup) measured 0.64-0.74s across the two round-14
# full sessions (mean 0.68).
# A future session's probe far off this value means the ENVIRONMENT
# moved; per-query medians are reported both raw and probe-normalized
# (median * PROBE_REF_SEC / session_probe) so a 1.2x wall shift with a
# 1.2x probe shift reads as flat normalized — adjudicated by the
# artifact instead of a worktree-rebuild A/B (three of those in r13).
PROBE_REF_SEC = 0.68
# EPOCH RE-BASELINE (round-19 verdict task 2): when the machine epoch
# has durably moved (idle-machine session-start probes persistently far
# from 0.68), cross-epoch normalization stops being evidence — set
# GRAFT_PROBE_REF to the NEW epoch's idle reference and the artifact
# records both the reference used and that it is a re-baseline, so the
# headline is explicitly within-epoch instead of silently translated
# across epochs. Comparisons against artifacts normalized to a
# DIFFERENT reference are then ratio-only (each side to its own epoch).
import os
_env_ref = os.environ.get("GRAFT_PROBE_REF")
PROBE_REF_USED = float(_env_ref) if _env_ref else PROBE_REF_SEC

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
assert not a.get("filtered") and not b.get("filtered"), \
    "refusing to build a medians artifact from a filtered (partial) session"
ma, mb = a["medians"], b["medians"]
assert set(ma) == set(mb), sorted(set(ma) ^ set(mb))
# HEADLINE (round-15 verdict task 5): the probe-NORMALIZED totals lead the
# artifact — raw totals stay alongside, but the number the round quotes is
# median_total * PROBE_REF_SEC / session_probe, so an environment epoch
# can't masquerade as a code movement (or vice versa).
out = {
    "protocol": "",
    "headline_normalized_totals": None,  # filled below when probes present
    "median_total_run_a": round(sum(ma.values()), 3),
    "median_total_run_b": round(sum(mb.values()), 3),
    "medians_run_a": ma,
    "medians_run_b": mb,
    "best_of_both": {k: min(ma[k], mb[k]) for k in ma},
}
# ABBA / order-randomized design (round-18 verdict task 3): when the two
# sessions ran DIFFERENT query orders (query_order_seed in each Bench
# artifact), a query's position — and so its exposure to intra-session
# drift — decorrelates between the pair; best-of-both and cross-run
# medians become a paired-sample design and probe normalization stops
# being load-bearing for the comparison. The artifact states which
# design it carries so a reader never has to infer it.
seeds = (a.get("query_order_seed"), b.get("query_order_seed"))
orders_differ = list(ma) != list(mb)
out["design"] = {
    "query_order_seeds": list(seeds),
    "orders_differ": orders_differ,
    "paired_sample": ("order-randomized (ABBA): per-query position "
                      "decorrelated between sessions") if orders_differ
                     else "same-order back-to-back sessions",
}
out["best_of_both_total"] = round(sum(out["best_of_both"].values()), 3)
out["probe_ref_sec"] = PROBE_REF_USED
out["probe_ref_provenance"] = (
    "re-baselined epoch reference via GRAFT_PROBE_REF (round-20 "
    "protocol: idle-machine session-start probe median of the new "
    "epoch; normalized totals are WITHIN-epoch only)" if _env_ref
    else "round-14 pinned reference (0.68s)")
def probe_at(points, x):
    """Linear interpolation of the session probe at query position x
    (points = [[after_n_queries, probe_sec], ...], sorted by position).
    Round-16 verdict task 3: start/end probes alone can't resolve
    intra-session drift; with mid-session points each query normalizes
    against its OWN segment's epoch."""
    if x <= points[0][0]:
        return points[0][1]
    for (x0, p0), (x1, p1) in zip(points, points[1:]):
        if x <= x1:
            return p0 + (p1 - p0) * (x - x0) / (x1 - x0) if x1 > x0 else p1
    return points[-1][1]

for run, d in (("a", a), ("b", b)):
    if "probe_start_sec" in d:
        probe = (d["probe_start_sec"] + d["probe_end_sec"]) / 2
        out[f"probe_run_{run}"] = {
            "start_sec": d["probe_start_sec"], "end_sec": d["probe_end_sec"],
            "vs_ref": round(probe / PROBE_REF_USED, 3)}
        m = d["medians"]
        pts = d.get("probe_points")
        if pts and len(pts) >= 2:
            # per-segment normalization: query at position i (0-based in
            # the session's execution order, which the medians dict
            # preserves) ran between probe points; normalize by the probe
            # interpolated at its midpoint i+0.5
            out[f"probe_run_{run}"]["points"] = pts
            norm = {k: round(v * PROBE_REF_USED / probe_at(pts, i + 0.5), 3)
                    for i, (k, v) in enumerate(m.items())}
        else:
            scale = PROBE_REF_USED / probe
            norm = {k: round(v * scale, 3) for k, v in m.items()}
        out[f"medians_normalized_run_{run}"] = norm
        out[f"median_total_normalized_run_{run}"] = round(
            sum(norm.values()), 3)
    # per-query run spread [min, max] of the 5 timed executions (verdict
    # task 5): "session variance" adjudications cite this in-artifact
    # spread instead of cross-round precedent
    if "maxs" in d:
        out[f"spread_run_{run}"] = {
            k: [d["queries"][k], d["maxs"][k]] for k in d["maxs"]}
    # direct environment counters (round-18 verdict task 2): carry each
    # session's per-segment /proc deltas and FLAG segments outside the
    # healthy band instead of silently normalizing over them. Bands:
    # foreign CPU (busy jiffies not burned by the bench JVM) > 10% of the
    # segment, hypervisor steal > 2%, iowait > 10%.
    if "env_segments" in d:
        out[f"env_run_{run}"] = d["env_segments"]
        flagged = [s for s in d["env_segments"]
                   if s.get("foreign_cpu_frac", 0) > 0.10
                   or s.get("steal_frac", 0) > 0.02
                   or s.get("iowait_frac", 0) > 0.10]
        out[f"env_flagged_segments_run_{run}"] = flagged
        if flagged:
            print(f"[bench-medians] WARNING run_{run}: "
                  f"{len(flagged)} probe segment(s) outside the healthy "
                  f"environment band: {flagged}")
if "median_total_normalized_run_a" in out and \
        "median_total_normalized_run_b" in out:
    out["headline_normalized_totals"] = {
        "run_a": out["median_total_normalized_run_a"],
        "run_b": out["median_total_normalized_run_b"],
        "best_of_both_normalized": round(sum(
            min(out["medians_normalized_run_a"][k],
                out["medians_normalized_run_b"][k]) for k in ma), 3)}
else:
    del out["headline_normalized_totals"]
for run, d in (("a", a), ("b", b)):
    if "aux" in d:
        out[f"aux_run_{run}"] = d["aux"]
if len(sys.argv) > 4:
    out.update(json.load(open(sys.argv[4])))
json.dump(out, open(sys.argv[3], "w"), indent=1)
hn = out.get("headline_normalized_totals")
print(f"wrote {sys.argv[3]}: totals a={out['median_total_run_a']} "
      f"b={out['median_total_run_b']} best={out['best_of_both_total']}"
      + (f" | NORMALIZED a={hn['run_a']} b={hn['run_b']} "
         f"best={hn['best_of_both_normalized']}" if hn else ""))
