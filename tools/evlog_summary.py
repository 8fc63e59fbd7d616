#!/usr/bin/env python3
"""Summarize a Spark event log: per job-description (bench query name),
job wall-time, and driver gaps between jobs. Dev tool for the
optimization rounds; not part of the driver contract.

Usage: evlog_summary.py <eventlog-file> [description-filter]
"""
import json, sys, collections

path = sys.argv[1]
filt = sys.argv[2] if len(sys.argv) > 2 else None

jobs = {}        # jobId -> dict
order = []
with open(path) as f:
    for line in f:
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            jid = e["Job ID"]
            desc = e.get("Properties", {}).get("spark.job.description", "")
            jobs[jid] = {"desc": desc, "start": e["Submission Time"],
                         "stages": len(e.get("Stage Infos", [])),
                         "tasks": sum(s.get("Number of Tasks", 0) for s in e.get("Stage Infos", []))}
            order.append(jid)
        elif ev == "SparkListenerJobEnd":
            jid = e["Job ID"]
            if jid in jobs:
                jobs[jid]["end"] = e["Completion Time"]

# per description: total job time, gaps between consecutive jobs of same desc
by_desc = collections.defaultdict(lambda: {"n": 0, "job_ms": 0, "gap_ms": 0,
                                           "stages": 0, "tasks": 0,
                                           "first": None, "last": None})
prev_end = None
prev_desc = None
for jid in order:
    j = jobs[jid]
    if "end" not in j:
        continue
    d = j["desc"]
    rec = by_desc[d]
    rec["n"] += 1
    rec["job_ms"] += j["end"] - j["start"]
    rec["stages"] += j["stages"]
    rec["tasks"] += j["tasks"]
    if rec["first"] is None:
        rec["first"] = j["start"]
    rec["last"] = j["end"]
    if prev_end is not None and prev_desc == d:
        rec["gap_ms"] += max(0, j["start"] - prev_end)
    prev_end = j["end"]
    prev_desc = d

rows = sorted(by_desc.items(), key=lambda kv: -(kv[1]["last"] - kv[1]["first"]))
print(f"{'span_s':>7} {'jobs_s':>7} {'gaps_s':>7} {'njobs':>5} {'stages':>6} {'tasks':>6}  description")
for d, r in rows:
    if filt and filt not in d:
        continue
    span = (r["last"] - r["first"]) / 1000
    print(f"{span:7.2f} {r['job_ms']/1000:7.2f} {r['gap_ms']/1000:7.2f} "
          f"{r['n']:5d} {r['stages']:6d} {r['tasks']:6d}  {d[:60]}")
