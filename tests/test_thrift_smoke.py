"""HiveServer2 / Thrift entry-point smoke (SURVEY.md §3.2 + §3.4: the
reference's second entry point is HiveServer2's JDBC/Thrift surface, and
the local Spark build ships spark-hive-thriftserver + hive-jdbc).

Run in a SUBPROCESS with its own SparkSession: the server binds a real
TCP port and registers JVM-global state that must not leak into the
shared pytest session. The flow is the full protocol round trip —
HiveThriftServer2.startWithContext, TCP wait, a JDBC connection through
the stock org.apache.hive.jdbc.HiveDriver, one aggregate query over a
global temp view of the testdata, typed result fetch — i.e. exactly what
a beeline/JDBC client of the reference does. Skips (with the reason)
only if the sandbox refuses the socket or the server cannot start.
"""

from __future__ import annotations

import subprocess
import sys

import pytest

_SCRIPT = r"""
import socket, time
from pyspark.sql import SparkSession

PORT = 10123
spark = (
    SparkSession.builder.master("local[2]").appName("thrift-smoke")
    .config("spark.sql.warehouse.dir", "/tmp/hive_apache_ci_spark_thrift_wh")
    .config("hive.server2.thrift.port", str(PORT))
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
jvm = spark._jvm
jvm.org.apache.spark.sql.hive.thriftserver.HiveThriftServer2.startWithContext(
    spark._jsparkSession.sqlContext()
)
deadline = time.time() + 60
up = False
while time.time() < deadline:
    try:
        s = socket.create_connection(("127.0.0.1", PORT), 1)
        s.close()
        up = True
        break
    except OSError:
        time.sleep(1)
if not up:
    print("SKIP: thrift listener never came up")
    raise SystemExit(0)
# global temp view: the thriftserver serves each JDBC client from its own
# child session, which sees global_temp but not session-local views
spark.read.parquet("/root/testdata/sf0.001/nation.parquet") \
    .createOrReplaceGlobalTempView("nation")
conn = jvm.java.sql.DriverManager.getConnection(
    f"jdbc:hive2://127.0.0.1:{PORT}/default", "anon", ""
)
st = conn.createStatement()
rs = st.executeQuery(
    "SELECT n_regionkey, count(*) AS n FROM global_temp.nation "
    "GROUP BY n_regionkey ORDER BY n_regionkey"
)
rows = []
while rs.next():
    rows.append((rs.getLong(1), rs.getLong(2)))
conn.close()
assert len(rows) == 5 and sum(n for _, n in rows) == 25, rows
print("THRIFT_OK", rows)
"""


def test_hiveserver2_jdbc_round_trip():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=240,
    )
    out = proc.stdout + proc.stderr
    if "SKIP:" in out:
        pytest.skip(out.split("SKIP:")[1].splitlines()[0].strip())
    assert proc.returncode == 0, out[-3000:]
    assert "THRIFT_OK" in out, out[-3000:]
