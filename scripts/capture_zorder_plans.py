#!/usr/bin/env python
"""Capture the CLUSTERED-WRITE dataflow plans for the zorder/hilbert
queries (the returned band-aggregate plan does not show the key
derivation — the interesting plan is the one feeding the write)."""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TAG = sys.argv[1] if len(sys.argv) > 1 else "after"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    from pyspark.sql import functions as F

    from hive_apache_ci_spark.helpers import T
    from hive_apache_ci_spark.session import get_spark
    from hive_apache_ci_spark.sources import zorder

    spark = get_spark("capture_zorder_plans")
    li = T(spark, SF_DIR, "lineitem")
    pmin, pmax, smin, smax = zorder._key_bounds(li)

    def dump(df, name):
        raw = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # elide the (fixed, content-free in plan terms) LUT literal bytes
        raw = re.sub(r"0x[0-9A-Fa-f]{64,}", "0x<LUT-BYTES>", raw)
        path = os.path.join(REPO, "plans", "r13", f"{name}_{TAG}.txt")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            fh.write(raw)
        print(path)

    hz = zorder.with_hilbert(
        li,
        zorder.bucketize(F.col("l_partkey"), pmin, pmax),
        zorder.bucketize(F.col("l_suppkey"), smin, smax),
    )
    dump(
        hz.repartitionByRange(zorder._N_FILES, "h").sortWithinPartitions("h"),
        "io_hilbert_write_path",
    )
    zz = li.withColumn(
        "z",
        zorder.zvalue(
            zorder.bucketize(F.col("l_partkey"), pmin, pmax),
            zorder.bucketize(F.col("l_suppkey"), smin, smax),
        ),
    )
    dump(
        zz.repartitionByRange(zorder._N_FILES, "z").sortWithinPartitions("z"),
        "io_zorder_write_path",
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
