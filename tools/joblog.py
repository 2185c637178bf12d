"""Aggregate a Spark event log into per-job-description cost rows.

Usage: python tools/joblog.py /tmp/spark-events/<app-id> [top_n]

Run the producer with
  PYSPARK_SUBMIT_ARGS="--conf spark.eventLog.enabled=true \
      --conf spark.eventLog.dir=file:///tmp/spark-events pyspark-shell"
(bench.py labels every key's jobs "bench:<key>", so the rows group by
bench key).  Reports, per description: job count, wall (submit->end),
task time, shuffle read/write bytes, and peak stage task counts —
the §1 "where does the time go" breakdown without the live UI.
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def main() -> int:
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    jobs: dict[int, dict] = {}
    stage_job: dict[int, int] = {}
    agg = defaultdict(lambda: {"jobs": 0, "wall_ms": 0, "task_ms": 0,
                               "tasks": 0, "sh_read": 0, "sh_write": 0,
                               "stages": 0})
    with open(path, encoding="utf-8") as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description") or "(none)"
                jobs[jid] = {"desc": desc, "t0": ev.get("Submission Time", 0)}
                for sid in ev.get("Stage IDs", []):
                    stage_job[sid] = jid
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    j = jobs[jid]
                    a = agg[j["desc"]]
                    a["jobs"] += 1
                    a["wall_ms"] += max(0, ev.get("Completion Time", 0)
                                        - j["t0"])
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                jid = stage_job.get(si["Stage ID"])
                if jid is None or jid not in jobs:
                    continue
                a = agg[jobs[jid]["desc"]]
                a["stages"] += 1
                a["tasks"] += si.get("Number of Tasks", 0)
            elif e == "SparkListenerTaskEnd":
                jid = stage_job.get(ev.get("Stage ID"))
                if jid is None or jid not in jobs:
                    continue
                a = agg[jobs[jid]["desc"]]
                ti = ev.get("Task Info", {})
                a["task_ms"] += max(0, ti.get("Finish Time", 0)
                                    - ti.get("Launch Time", 0))
                m = ev.get("Task Metrics") or {}
                srm = m.get("Shuffle Read Metrics") or {}
                swm = m.get("Shuffle Write Metrics") or {}
                a["sh_read"] += (srm.get("Remote Bytes Read", 0)
                                 + srm.get("Local Bytes Read", 0))
                a["sh_write"] += swm.get("Shuffle Bytes Written", 0)
    rows = sorted(agg.items(), key=lambda kv: -kv[1]["wall_ms"])
    print(f"{'description':<42}{'jobs':>5}{'stages':>7}{'tasks':>7}"
          f"{'wall_s':>8}{'task_s':>8}{'shW_MB':>8}")
    for desc, a in rows[:top_n]:
        print(f"{desc[:41]:<42}{a['jobs']:>5}{a['stages']:>7}"
              f"{a['tasks']:>7}{a['wall_ms']/1e3:>8.2f}"
              f"{a['task_ms']/1e3:>8.2f}{a['sh_write']/1e6:>8.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
