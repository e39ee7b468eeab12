"""Avro codec tests — spec compliance + JVM interop.

The decisive evidence that sources/avro_codec.py implements the real
public Avro 1.12 container format (and not a private serialization) is
bidirectional interop with the STOCK Avro library bundled in the Spark
JVM (avro-1.12.1.jar): files we write must read back through
``org.apache.avro.file.DataFileReader``, and files written by
``DataFileWriter`` must decode to identical values here.
"""

from __future__ import annotations

import hashlib
import io
import json
import os

import pytest

from hive_apache_ci_spark.sources.avro_codec import (
    _Cursor,
    avro_schema_for,
    decode_long,
    encode_long,
    read_container,
    write_container,
)

SCHEMA = {
    "type": "record",
    "name": "row",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "v", "type": ["null", "double"]},
        {"name": "s", "type": ["null", "string"]},
        {"name": "flag", "type": "boolean"},
        {"name": "small", "type": "int"},
    ],
}

ROWS = [
    (0, 1.5, "alpha", True, -1),
    (-(2**62), None, "", False, 2**31 - 1),
    (2**62, -0.0, "üñïçôdé ☃", True, -(2**31)),
    (7, 3.141592653589793, None, False, 0),
    (-1, float("inf"), "quote\"comma,nl\n", True, 42),
]


def _write_bytes(rows=ROWS, schema=SCHEMA, block_rows=2):
    buf = io.BytesIO()
    sync = hashlib.md5(b"test").digest()
    n = write_container(buf, schema, iter(rows), sync, block_rows=block_rows)
    assert n == len(rows)
    return buf.getvalue()


def test_zigzag_long_roundtrip_edges():
    for v in (0, -1, 1, 63, -64, 64, 2**31, -(2**31), 2**63 - 1, -(2**63)):
        buf = bytearray()
        encode_long(buf, v)
        assert decode_long(_Cursor(bytes(buf))) == v


def test_container_roundtrip_multiblock():
    data = _write_bytes(block_rows=2)  # 5 rows -> 3 blocks
    schema, rows = read_container(data)
    assert schema == SCHEMA
    assert rows == ROWS


def test_container_rejects_torn_sync():
    data = bytearray(_write_bytes())
    data[-1] ^= 0xFF  # corrupt the final sync marker
    with pytest.raises(ValueError, match="sync"):
        read_container(bytes(data))


def test_container_rejects_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        read_container(b"PAR1" + _write_bytes()[4:])


def test_avro_schema_for_maps_nullables(spark):
    df = spark.range(1).selectExpr(
        "id AS a", "CAST(id AS int) AS b", "CAST(id AS string) AS c"
    )
    sch = avro_schema_for(df.schema)
    types = {f["name"]: f["type"] for f in sch["fields"]}
    assert types["a"] in ("long", ["null", "long"])
    assert "int" in (types["b"] if isinstance(types["b"], list) else [types["b"]])


def test_jvm_reads_our_file(spark, tmp_path):
    """Stock org.apache.avro DataFileReader parses a python-written file."""
    path = str(tmp_path / "ours.avro")
    with open(path, "wb") as fh:
        write_container(
            fh, SCHEMA, iter(ROWS), hashlib.md5(path.encode()).digest()
        )
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.org.apache.avro.file.SeekableFileInput(jvm.java.io.File(path)),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    got = []
    while reader.hasNext():
        rec = reader.next()
        s = rec.get("s")
        got.append(
            (
                rec.get("k"),
                rec.get("v"),
                None if s is None else s.toString(),
                rec.get("flag"),
                rec.get("small"),
            )
        )
    reader.close()
    assert got == ROWS


def test_we_read_jvm_file(spark, tmp_path):
    """Files produced by stock DataFileWriter decode identically here."""
    path = str(tmp_path / "jvm.avro")
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(SCHEMA))
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    writer.create(schema, jvm.java.io.File(path))
    for k, v, s, flag, small in ROWS:
        if v in (float("inf"), float("-inf")):
            continue  # py4j can't pass IEEE inf literally; covered python-side
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        rec.put("k", jvm.java.lang.Long.valueOf(k))
        rec.put("v", None if v is None else jvm.java.lang.Double.valueOf(v))
        rec.put("s", s)
        rec.put("flag", jvm.java.lang.Boolean.valueOf(flag))
        rec.put("small", jvm.java.lang.Integer.valueOf(small))
        writer.append(rec)
    writer.close()
    schema_back, rows = read_container(open(path, "rb").read())
    expected = [r for r in ROWS if r[1] not in (float("inf"),)]
    assert [f["name"] for f in schema_back["fields"]] == [
        f["name"] for f in SCHEMA["fields"]
    ]
    assert rows == expected


def test_distributed_roundtrip_matches_source(spark, tmp_path):
    """write_avro/read_avro across >1 partition preserves every row."""
    from hive_apache_ci_spark.sources.avro_codec import read_avro, write_avro

    df = (
        spark.range(1000)
        .repartition(4)
        .selectExpr(
            "id",
            "CASE WHEN id % 7 = 0 THEN NULL ELSE CAST(id AS double)/3 END AS x",
            "concat('s', id) AS s",
        )
    )
    out = str(tmp_path / "dist")
    os.makedirs(out, exist_ok=True)
    write_avro(df, out).write.mode("overwrite").parquet(str(tmp_path / "m"))
    back = read_avro(spark, out, df.schema)
    assert back.count() == 1000
    a = df.exceptAll(back)
    b = back.exceptAll(df)
    assert a.isEmpty() and b.isEmpty()
    # one container file per partition
    assert len([f for f in os.listdir(out) if f.endswith(".avro")]) == 4
