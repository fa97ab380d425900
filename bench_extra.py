"""Per-query isolation bench (guide §1.4): times a SUBSET of declared
queries with exactly bench.py's methodology (same session confs, same
noop sink, same sf dir) so optimization iterations don't need a full
bench run. bench.py stays the frozen driver artifact; numbers cited in
OPTIMIZATION_r08.md name which harness produced them.

Usage: python bench_extra.py [-r repeats] query [query ...]
Prints one JSON line {"queries": {name: [sec, ...]}, ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from anomaly_detection_spark.session import get_spark


def main() -> None:
    loadavg = [round(x, 2) for x in os.getloadavg()]
    args = sys.argv[1:]
    repeats = 1
    if args and args[0] == "-r":
        repeats = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="adspark-bench-extra", master=f"local[{cpus}]", shuffle_partitions=2 * cpus)
    spark.range(1000).selectExpr("sum(id)").collect()
    qs = entrymod.all_queries()
    timings: dict[str, list[float]] = {n: [] for n in args}
    for _ in range(repeats):
        for name in args:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    spark.stop()
    print(json.dumps({"queries": timings, "sf_dir": sf_dir, "cpus": cpus, "loadavg_at_start": loadavg}))


if __name__ == "__main__":
    main()
