"""Measured shuffle audit: run each bench headline query and report
its executed-plan Exchange metrics (count, records, bytes written) —
turning SCALE.md's shuffle inventory from claims into measurements.

Usage: python tools/shuffle_audit.py [sf_dir] [query ...]
Prints one line per query plus a JSON tail for archival.

Only batch queries appear (streaming queries execute inside their own
writeStream query executions, whose stages aren't reachable from the
returned DataFrame's plan)."""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def exchange_metrics(jplan) -> list[dict]:
    """Walk an executed (possibly adaptive) plan; collect per-Exchange
    shuffle metrics."""
    out: list[dict] = []

    def walk(node):
        name = node.nodeName()
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan())
            return
        if name.endswith("QueryStage"):
            walk(node.plan())
            return
        if name == "Exchange":
            m = {}
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                m[kv._1()] = kv._2().value()
            out.append(
                {
                    "records": int(m.get("shuffleRecordsWritten", 0)),
                    "bytes": int(m.get("shuffleBytesWritten", 0)),
                    "partitions": int(m.get("numPartitions", 0)),
                }
            )
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(jplan)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])

    from bench import HEADLINE

    from lakehouse_poc_spark.plans import QUERIES
    from lakehouse_poc_spark.session import get_spark

    spark = get_spark("shuffle_audit", cpus=8)
    report = {}
    for name in HEADLINE:
        if only and name not in only:
            continue
        if name.startswith("stream_"):
            continue
        fn = QUERIES[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.collect()
        wall = time.time() - t0
        exes = exchange_metrics(df._jdf.queryExecution().executedPlan())
        total_b = sum(e["bytes"] for e in exes)
        total_r = sum(e["records"] for e in exes)
        report[name] = {
            "n_exchanges": len(exes),
            "shuffle_records": total_r,
            "shuffle_mb": round(total_b / 1e6, 2),
            "sec": round(wall, 2),
        }
        print(
            f"{name:32s} exchanges={len(exes):2d} "
            f"records={total_r:>10,d} bytes={total_b/1e6:8.2f} MB "
            f"({wall:.1f}s)"
        )
    print()
    print(json.dumps({"sf_dir": sf_dir, "queries": report}))


if __name__ == "__main__":
    main()
