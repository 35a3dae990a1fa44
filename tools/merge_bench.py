#!/usr/bin/env python3
"""Merge per-shard Bench detail files (tools/bench_sharded.sh) into one
BENCH_FULL.json-shaped record: per-query medians union, total = sum of
successful medians, failed = union. Reps taken from the first shard."""
import json
import sys

out, shards = sys.argv[1], sys.argv[2:]
queries, failed, reps, sf = {}, [], None, None
for path in shards:
    with open(path) as f:
        rec = json.load(f)
    reps = reps if reps is not None else rec.get("reps")
    sf = sf if sf is not None else rec.get("sf")
    failed.extend(rec.get("failed", []))
    for name, sec in rec["queries"].items():
        assert name not in queries, f"duplicate entry across shards: {name}"
        queries[name] = sec
total = sum(v for v in queries.values() if v >= 0)
rec = {"metric": "total", "value": total, "unit": "sec", "reps": reps,
       "sharded": len(shards), "failed": sorted(set(failed)),
       "queries": queries, "sf": sf}
with open(out, "w") as f:
    json.dump(rec, f)
print(f"{len(queries)} queries, total {total:.1f}s, {len(set(failed))} failed")
