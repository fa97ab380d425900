"""Capture .explain("formatted") for declared queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <out_dir> [query ...]
Defaults to every declared query at $SPARK_GRAFT_SF_DIR (sf0.1).
Planning only — no execution — so it is cheap and does not disturb
bench timings.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from anomaly_detection_spark.session import get_spark


def main() -> None:
    out_dir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="adspark-plans", master=f"local[{cpus}]", shuffle_partitions=2 * cpus)
    qs = entrymod.all_queries()
    if not names:
        names = list(qs)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # streaming harnesses execute on build; skip cleanly
            plan = f"<plan capture failed: {exc}>\n"
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        print(name, "ok" if not plan.startswith("<plan capture failed") else "SKIP")
    spark.stop()


if __name__ == "__main__":
    main()
