"""Round-21 measurement helper: capture .explain('formatted') for every
registry query into plans/r22/<name>_<tag>.txt and (optionally) time each
query with the bench's noop-sink methodology.

Usage: python tools_r22_capture_plans.py [before|after] [--time] [names...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

from thisishappening_spark.queries import REGISTRY
from thisishappening_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(__file__), "plans", "r22")


def main() -> None:
    args = [a for a in sys.argv[1:]]
    tag = args.pop(0) if args and not args[0].startswith("--") else "before"
    do_time = "--time" in args
    args = [a for a in args if not a.startswith("--")]
    names = args or sorted(REGISTRY)

    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name=f"tih-plans-{tag}")
    spark.sparkContext.setLogLevel("ERROR")

    if do_time:  # same warmup as bench.py
        REGISTRY["q01_pricing_summary"].fn(spark, SF_DIR).count()

    timings = {}
    for name in names:
        df = REGISTRY[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(OUT_DIR, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        if do_time:
            samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                d = REGISTRY[name].fn(spark, SF_DIR)
                d.write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
            timings[name] = round(statistics.median(samples), 4)
            print(f"{name}: {timings[name]}s")
    if do_time:
        print("TOTAL:", round(sum(timings.values()), 4))
    spark.stop()


if __name__ == "__main__":
    main()
