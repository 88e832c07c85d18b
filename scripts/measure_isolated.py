#!/usr/bin/env python3
"""Record ISOLATED per-query minimums for the straggler baseline
(VERDICT r09 #6): run the named queries min-of-2 in an otherwise-idle
session with bench.py's exact methodology (same warmup, same noop-sink
materialization, same cache release between measurements) and merge the
results into BENCH_ISOLATED.json — which bench.py's suspect_stragglers
check overlays as the lowest credible recorded cost per query.

Run this ALONE: an isolated number taken while another Spark job is
active is the co-tenancy artifact this file exists to remove.

Usage:  python scripts/measure_isolated.py q_a q_b ...
        python scripts/measure_isolated.py --slowest N   (N slowest from
        the last recorded bench artifacts; default 10)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "BENCH_ISOLATED.json")


def select_slowest(n: int, registered) -> list[str]:
    """The N highest recorded per-query timings that are still registered
    queries — renamed/retired names in old bench artifacts never select."""
    import bench

    last = bench._last_recorded_timings()
    return [
        q for q, _ in sorted(last.items(), key=lambda kv: -kv[1])
        if q in registered
    ][:n]


def main() -> None:
    from pipeline_calculator_v3_spark import release_caches
    from pipeline_calculator_v3_spark.queries import QUERIES
    from pipeline_calculator_v3_spark.session import get_spark

    args = sys.argv[1:]
    if args and args[0] == "--slowest":
        n = int(args[1]) if len(args) > 1 else 10
        names = select_slowest(n, QUERIES)
    else:
        names = args
    unknown = [q for q in names if q not in QUERIES]
    if unknown or not names:
        sys.exit(f"unknown or empty query list: {unknown or names}")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("pcv3-isolated")
    spark.sparkContext.setLogLevel("ERROR")
    # bench.py's session warmup, verbatim in effect: fact-table touch,
    # window codegen, pandas-UDF worker fork
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    w = Window.partitionBy("o_orderstatus").orderBy("o_orderkey")
    spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.lag("o_totalprice").over(w)).limit(1).collect()
    import pandas as pd
    spark.createDataFrame(pd.DataFrame({"g": [0, 1] * 16, "x": range(32)})) \
        .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))) \
        .groupBy("g").applyInPandas(lambda p: p, "g long, x long").count()

    measured: dict[str, float] = {}
    for _ in range(2):
        for name in names:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = round(time.perf_counter() - t0, 3)
            measured[name] = min(measured.get(name, dt), dt)
            release_caches(spark)

    try:
        record = json.load(open(OUT))
    except (OSError, json.JSONDecodeError):
        record = {"queries": {}, "note": ""}
    qs = record.setdefault("queries", {})
    for name, dt in measured.items():
        qs[name] = min(float(qs.get(name, dt)), dt)
    record["note"] = (
        "isolated min-of-2 per query (scripts/measure_isolated.py, bench "
        "methodology, idle machine); bench.py overlays these as the "
        "straggler baseline — merge-min on update, delete a key to reset "
        "after an intentional cost change"
    )
    record["sf_dir"] = sf_dir
    with open(OUT, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    print(json.dumps({"measured": measured}))


if __name__ == "__main__":
    main()
