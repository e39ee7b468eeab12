"""Hive-native legacy formats through the REAL Hive SerDe path (SURVEY
§2.2): STORED AS SEQUENCEFILE and STORED AS RCFILE, exercised in a
subprocess with a Hive-enabled SparkSession (catalogImplementation is a
static conf, so the shared test session cannot flip it). The registry op
io_sequencefile_roundtrip covers the non-Hive-session bridge; this covers
the JVM SerDe write+read that a fact-scale migration would use."""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = r"""
import sys, uuid
from pyspark.sql import SparkSession
tag = uuid.uuid4().hex[:8]
s = (SparkSession.builder.master("local[4]")
     .config("spark.sql.warehouse.dir", f"/tmp/hive_apache_ci_spark_legacy/wh_{tag}")
     .config("javax.jdo.option.ConnectionURL",
             f"jdbc:derby:;databaseName=/tmp/hive_apache_ci_spark_legacy/ms_{tag};create=true")
     .config("spark.sql.session.timeZone", "UTC")
     .enableHiveSupport().getOrCreate())
src = s.read.parquet(sys.argv[1] + "/supplier.parquet") \
       .selectExpr("s_suppkey", "s_nationkey", "round(s_acctbal, 2) AS bal")
expect = sorted(map(tuple, src.groupBy("s_nationkey").count().collect()))
for fmt in ("SEQUENCEFILE", "RCFILE"):
    t = f"sup_{fmt.lower()}_{tag}"
    src.createOrReplaceTempView("srcv")
    s.sql(f"CREATE TABLE {t} STORED AS {fmt} AS SELECT * FROM srcv")
    got = sorted(map(tuple, s.sql(
        f"SELECT s_nationkey, count(*) AS count FROM {t} GROUP BY s_nationkey"
    ).collect()))
    assert got == expect, (fmt, got[:3], expect[:3])
    full = sorted(map(tuple, s.sql(f"SELECT * FROM {t}").collect()))
    assert full == sorted(map(tuple, src.collect())), fmt
print("LEGACY_FORMATS_OK")
"""


def test_hive_sequencefile_rcfile_serde_roundtrip():
    from .conftest import SF_DIR

    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT, SF_DIR],
        capture_output=True, text=True, timeout=300,
    )
    assert "LEGACY_FORMATS_OK" in proc.stdout, (
        proc.stdout[-2000:], proc.stderr[-2000:],
    )
