#!/usr/bin/env python3
"""Parse a Spark event log into per-job wall times with call sites.
Usage: evlog_jobs.py <eventlog-file> [min_ms]"""
import json
import sys
from collections import defaultdict


def main():
    path = sys.argv[1]
    min_ms = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    jobs = {}
    order = []
    for line in open(path):
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            jid = e["Job ID"]
            props = e.get("Properties") or {}
            infos = e.get("Stage Infos") or []
            stage_name = infos[-1]["Stage Name"] if infos else ""
            desc = (props.get("spark.job.description")
                    or props.get("callSite.short") or stage_name)
            jobs[jid] = {"start": e["Submission Time"], "desc": desc,
                         "stages": len(e.get("Stage IDs", []))}
            order.append(jid)
        elif ev == "SparkListenerJobEnd":
            jid = e["Job ID"]
            if jid in jobs:
                jobs[jid]["end"] = e["Completion Time"]
    total = 0
    by_desc = defaultdict(lambda: [0, 0])
    rows = []
    for jid in order:
        j = jobs[jid]
        if "end" not in j:
            continue
        ms = j["end"] - j["start"]
        total += ms
        by_desc[j["desc"]][0] += ms
        by_desc[j["desc"]][1] += 1
        rows.append((jid, ms, j["stages"], j["desc"]))
    print(f"{len(rows)} jobs, {total/1000:.2f}s total job wall time")
    print("--- jobs >= %dms (execution order) ---" % min_ms)
    for jid, ms, nst, desc in rows:
        if ms >= min_ms:
            print(f"  job {jid:4d} {ms:7d}ms {nst:2d}st  {desc[:110]}")
    print("--- by description ---")
    for desc, (ms, n) in sorted(by_desc.items(), key=lambda x: -x[1][0]):
        print(f"  {ms:7d}ms  n={n:3d}  {desc[:100]}")


if __name__ == "__main__":
    main()
