"""Isolated per-query optimization probe (r10 optimization round).

For each named query: median-of-N wall time (clearCache + System.gc
between reps — the bench's isolated-retiming discipline), Spark job
count and total task count per execution (load-independent plan-shape
evidence), and optionally the formatted physical plan of the returned
DataFrame written to plans/r10/<query>_<tag>.txt.

Usage:
  python tools/opt_probe.py [--reps N] [--tag before|after|none] q1 q2 ...
Prints one JSON line per query.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lakehouse_poc_spark import plans  # noqa: E402
from lakehouse_poc_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    reps = 5
    tag = "none"
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif args[i] == "--tag":
            tag = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("opt_probe")
    sc = spark.sparkContext
    spark.range(1).count()

    # same Python-worker warmups as bench.py so rep 1 isn't charged
    # one-time runner setup
    cores = sc.defaultParallelism

    def _noop(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from batches

    spark.range(cores).repartition(cores).mapInPandas(_noop, "id long").count()

    def _noop2(batches):
        yield from batches

    (
        spark.range(cores)
        .repartition(cores)
        .mapInPandas(_noop2, "id long")
        .mapInPandas(_noop2, "id long")
        .count()
    )
    spark.range(cores).groupBy("id").applyInPandas(
        lambda pdf: pdf, "id long"
    ).count()

    plans_dir = (
        Path(__file__).resolve().parent.parent
        / "plans"
        / os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r11")
    )
    plans_dir.mkdir(parents=True, exist_ok=True)

    for name in names:
        fn = plans.QUERIES.get(name)
        if fn is None:
            print(json.dumps({"query": name, "error": "not registered"}))
            continue
        runs: list[float] = []
        job_counts: list[int] = []
        for rep in range(reps):
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            group = f"probe_{name}_{rep}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.count()
            runs.append(time.perf_counter() - t0)
            st = sc.statusTracker()
            job_counts.append(len(st.getJobIdsForGroup(group)))
            sc.setJobGroup(None, None)
        if tag != "none":
            try:
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                (plans_dir / f"{name}_{tag}.txt").write_text(buf.getvalue())
            except Exception as e:  # plan capture must never fail the probe
                print(f"plan capture failed for {name}: {e}", file=sys.stderr)
        srt = sorted(runs)
        print(
            json.dumps(
                {
                    "query": name,
                    "median": round(srt[len(srt) // 2], 3),
                    "min": round(srt[0], 3),
                    "runs": [round(r, 2) for r in runs],
                    "jobs": job_counts[-1],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
