"""VERDICT r21 item 7 probe: does spark.sql.join.preferSortMergeJoin=false
(session.py) actually pick a shuffled-hash join when its size conditions
bind, and does it regress?

At bench SFs every eligible join broadcasts (64 MB threshold), so the
config is a declared no-op locally. This probe disables auto-broadcast so
the orders ⋈ lineitem join must choose SMJ vs SHJ, captures both plans to
plans/r22/probe_shj_{off,on}.txt, and times both interleaved.
"""

from __future__ import annotations

import statistics
import time

from pyspark.sql import functions as F

from thisishappening_spark.session import get_spark
from thisishappening_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.1"


def run(prefer_smj: bool, tag: str) -> list[float]:
    spark = get_spark(
        app_name=f"tih-probe-shj-{tag}",
        # 512 KB: too small to broadcast the 1-column orders side
        # (~0.6 MB estimate), but SHJ's canBuildLocalHashMap bound is
        # threshold × shuffle.partitions (16 MB here), so shuffled-hash
        # stays eligible — a -1 threshold would disable BOTH broadcast
        # and SHJ (found empirically; first probe attempt).
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": str(512 * 1024),
            "spark.sql.adaptive.autoBroadcastJoinThreshold": str(512 * 1024),
            "spark.sql.join.preferSortMergeJoin": str(prefer_smj).lower(),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # Build side (orders, 1 col ≈ 0.6 MB estimate) must be ≥3× smaller than
    # the pruned stream side (3 lineitem cols ≈ 3.3 MB) for SHJ's muchSmaller
    # test, and above the 512 KB broadcast threshold but under threshold×32
    # for canBuildLocalHashMap.
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey")
    li = load_table(spark, SF_DIR, "lineitem")
    df = (
        o.join(li, F.expr("o_orderkey = l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.expr("count(1) AS n"),
            F.expr("sum(l_quantity) AS q"),
            F.expr("sum(l_extendedprice) AS p"),
        )
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(f"plans/r22/probe_shj_{tag}.txt", "w") as f:
        f.write(plan)
    df.write.format("noop").mode("overwrite").save()  # warm
    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    spark.stop()
    return samples


def main() -> None:
    shj, smj = [], []
    for _ in range(3):  # interleave sessions
        shj += run(False, "on")   # repo default: allow SHJ
        smj += run(True, "off")   # Spark default: prefer SMJ
    for name, s in (("SHJ-allowed (repo conf)", shj), ("SMJ-preferred", smj)):
        print(f"{name}: median={statistics.median(s):.4f} min={min(s):.4f} all={[round(x,3) for x in s]}")
    for tag in ("on", "off"):
        plan = open(f"plans/r22/probe_shj_{tag}.txt").read()
        kinds = [k for k in ("ShuffledHashJoin", "SortMergeJoin", "BroadcastHashJoin") if k in plan]
        print(f"probe_shj_{tag}.txt join:", kinds)


if __name__ == "__main__":
    main()
