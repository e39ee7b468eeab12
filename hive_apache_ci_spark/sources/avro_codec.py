"""Avro Object Container File codec + distributed Spark read/write.

The reference ships Avro tables via ``AvroSerDe`` (SURVEY.md §2.2:
``[jar(serde): avro/AvroSerDe.class]``, ``STORED AS AVRO``). This Spark
distribution bundles the Avro *library* jars (avro-1.12.1) but not the
``spark-avro`` datasource module, and ``STORED AS AVRO`` needs a
Hive-catalog session the driver harness doesn't guarantee — so the engine
carries its own implementation of the PUBLIC Avro 1.12 Object Container
File spec (https://avro.apache.org/docs/1.12.0/specification/ — magic
``Obj\\x01``, metadata map with ``avro.schema``/``avro.codec``, 16-byte
sync marker, blocks of ``count, byte-size, data, sync``; primitives:
zigzag-varint long/int, IEEE-LE double/float, length-prefixed utf8,
1-byte boolean, tagged unions).

Distribution model (the part that must survive 100 TB):

- **write**: ``write_avro(df, path)`` runs an Arrow-batched ``mapInPandas``
  over the input — every task encodes its partition into ONE container
  file and commits it task-side via atomic rename (tmp name -> final name
  keyed by partitionId, so speculative retries are idempotent). The tiny
  per-task manifest (path, rows) is then written as parquet through
  Spark's committer, whose ``_SUCCESS`` gates readback exactly like every
  other sink here. File count == partition count, so the producer sizes
  files with an ordinary ``repartition(n)`` — same small-files lever as
  the parquet sinks.
- **read**: ``read_avro(spark, path, schema)`` lists ``*.avro`` through
  the ``binaryFile`` datasource (file-parallel: one task per container
  file, which is the right granularity when the writer keeps files at
  64-256 MB) and decodes blocks in ``mapInPandas`` — Arrow-batched out,
  no driver involvement.

Interop is proven in tests/test_avro.py BOTH directions against the
bundled JVM Avro library (org.apache.avro.file.DataFileReader /
DataFileWriter via py4j): files we write are readable by stock Avro, and
files stock Avro writes decode to identical values here.

Supported logical types cover the engine catalog surface: long, int,
double, float, boolean, string, bytes, and nullable unions
``["null", T]``. Timestamps/dates travel as their Hive AvroSerDe
representation is exercised at the query layer (cast to string/epoch
before the sink, as io_avro_roundtrip does).
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import struct
from collections.abc import Iterator

import pandas as pd

MAGIC = b"Obj\x01"
SYNC_SIZE = 16

# ---------------------------------------------------------------------------
# primitive encoders (Avro binary encoding, public spec §Binary Encoding)
# ---------------------------------------------------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def encode_long(buf: bytearray, n: int) -> None:
    z = _zigzag(int(n)) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def encode_double(buf: bytearray, x: float) -> None:
    buf += struct.pack("<d", float(x))


def encode_float(buf: bytearray, x: float) -> None:
    buf += struct.pack("<f", float(x))


def encode_string(buf: bytearray, s: str) -> None:
    raw = s.encode("utf-8") if not isinstance(s, bytes) else s
    encode_long(buf, len(raw))
    buf += raw


def encode_bytes(buf: bytearray, b: bytes) -> None:
    encode_long(buf, len(b))
    buf += bytes(b)


def encode_boolean(buf: bytearray, v: bool) -> None:
    buf.append(1 if v else 0)


class _Cursor:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos


def decode_long(cur: _Cursor) -> int:
    data, pos = cur.data, cur.pos
    shift = 0
    acc = 0
    while True:
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    cur.pos = pos
    return _unzigzag(acc)


def decode_double(cur: _Cursor) -> float:
    (v,) = struct.unpack_from("<d", cur.data, cur.pos)
    cur.pos += 8
    return v


def decode_float(cur: _Cursor) -> float:
    (v,) = struct.unpack_from("<f", cur.data, cur.pos)
    cur.pos += 4
    return v


def decode_string(cur: _Cursor) -> str:
    n = decode_long(cur)
    s = cur.data[cur.pos : cur.pos + n].decode("utf-8")
    cur.pos += n
    return s


def decode_bytes(cur: _Cursor) -> bytes:
    n = decode_long(cur)
    b = cur.data[cur.pos : cur.pos + n]
    cur.pos += n
    return b


def decode_boolean(cur: _Cursor) -> bool:
    v = cur.data[cur.pos] != 0
    cur.pos += 1
    return v


_ENCODERS = {
    "long": encode_long,
    "int": encode_long,  # int shares the varint wire format (spec)
    "double": encode_double,
    "float": encode_float,
    "string": encode_string,
    "bytes": encode_bytes,
    "boolean": encode_boolean,
}
_DECODERS = {
    "long": decode_long,
    "int": decode_long,
    "double": decode_double,
    "float": decode_float,
    "string": decode_string,
    "bytes": decode_bytes,
    "boolean": decode_boolean,
}

# ---------------------------------------------------------------------------
# schema mapping (Spark <-> Avro record of primitives / nullable unions)
# ---------------------------------------------------------------------------

_SPARK_TO_AVRO = {
    "long": "long",
    "bigint": "long",
    "int": "int",
    "integer": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "binary": "bytes",
    "boolean": "boolean",
}


def avro_schema_for(spark_schema, name: str = "row") -> dict:
    """Translate a flat Spark StructType to an Avro record schema dict.
    Nullable fields become ``["null", T]`` unions (AvroSerDe does the same
    for Hive nullable columns)."""
    fields = []
    for f in spark_schema.fields:
        t = _SPARK_TO_AVRO.get(f.dataType.simpleString())
        if t is None:
            raise TypeError(
                f"avro_codec: unsupported type {f.dataType.simpleString()} "
                f"for field {f.name} (cast before the sink)"
            )
        fields.append(
            {"name": f.name, "type": ["null", t] if f.nullable else t}
        )
    return {"type": "record", "name": name, "fields": fields}


def _field_specs(schema: dict) -> list[tuple[str, str, bool]]:
    """-> [(name, primitive_type, nullable)] from an Avro record schema."""
    specs = []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, list):
            prims = [x for x in t if x != "null"]
            if len(prims) != 1 or not isinstance(prims[0], str):
                raise TypeError(f"unsupported union {t} for {f['name']}")
            specs.append((f["name"], prims[0], True))
        else:
            specs.append((f["name"], t, False))
    return specs


# ---------------------------------------------------------------------------
# container file write / read (bytes level)
# ---------------------------------------------------------------------------


def _encode_meta_map(schema_json: str) -> bytes:
    buf = bytearray()
    meta = {"avro.schema": schema_json.encode(), "avro.codec": b"null"}
    encode_long(buf, len(meta))
    for k, v in meta.items():
        encode_string(buf, k)
        encode_bytes(buf, v)
    encode_long(buf, 0)  # map terminator
    return bytes(buf)


def write_container(
    out: io.BufferedIOBase,
    schema: dict,
    rows: Iterator[tuple],
    sync: bytes,
    block_rows: int = 8192,
) -> int:
    """Encode ``rows`` (tuples aligned with schema fields) into an Avro
    container stream. Returns the row count."""
    specs = _field_specs(schema)
    encs = [(_ENCODERS[t], nullable) for _, t, nullable in specs]
    out.write(MAGIC)
    out.write(_encode_meta_map(json.dumps(schema)))
    out.write(sync)
    total = 0
    block = bytearray()
    in_block = 0

    def flush():
        nonlocal block, in_block
        if not in_block:
            return
        head = bytearray()
        encode_long(head, in_block)
        encode_long(head, len(block))
        out.write(head)
        out.write(block)
        out.write(sync)
        block = bytearray()
        in_block = 0

    for row in rows:
        for (enc, nullable), v in zip(encs, row):
            if nullable:
                if v is None:
                    encode_long(block, 0)  # union branch 0 = null
                    continue
                encode_long(block, 1)
            enc(block, v)
        in_block += 1
        total += 1
        if in_block >= block_rows:
            flush()
    flush()
    return total


def read_container(data: bytes) -> tuple[dict, list[tuple]]:
    """Decode a whole Avro container file -> (schema, rows). Validates
    magic, codec, and every block's sync marker."""
    if data[:4] != MAGIC:
        raise ValueError("not an Avro container file (bad magic)")
    cur = _Cursor(data, 4)
    meta: dict[str, bytes] = {}
    while True:
        n = decode_long(cur)
        if n == 0:
            break
        if n < 0:  # negative block count => abs count + byte size (spec)
            n = -n
            decode_long(cur)
        for _ in range(n):
            k = decode_string(cur)
            meta[k] = bytes(decode_bytes(cur))
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b""):
        raise ValueError(f"unsupported avro codec {codec!r} (null only)")
    schema = json.loads(meta["avro.schema"].decode())
    sync = data[cur.pos : cur.pos + SYNC_SIZE]
    cur.pos += SYNC_SIZE
    specs = _field_specs(schema)
    decs = [(_DECODERS[t], nullable) for _, t, nullable in specs]
    rows: list[tuple] = []
    end = len(data)
    while cur.pos < end:
        count = decode_long(cur)
        size = decode_long(cur)
        block_end = cur.pos + size
        for _ in range(count):
            vals = []
            for dec, nullable in decs:
                if nullable and decode_long(cur) == 0:
                    vals.append(None)
                    continue
                vals.append(dec(cur))
            rows.append(tuple(vals))
        if cur.pos != block_end:
            raise ValueError("avro block length mismatch (corrupt block)")
        if data[cur.pos : cur.pos + SYNC_SIZE] != sync:
            raise ValueError("avro sync marker mismatch (torn file)")
        cur.pos += SYNC_SIZE
    return schema, rows


# ---------------------------------------------------------------------------
# distributed Spark write / read
# ---------------------------------------------------------------------------


def write_avro(df, out_dir: str):
    """Distributed Avro sink: one container file per input partition,
    committed task-side via atomic rename; returns the manifest DataFrame
    (path, rows) — callers persist it through Spark's committer so its
    ``_SUCCESS`` transitively gates the avro files."""
    from pyspark import TaskContext

    schema = avro_schema_for(df.schema)
    schema_json = json.dumps(schema)

    def write_parts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        final = os.path.join(out_dir, f"part-{pid:05d}.avro")
        tmp = final + f".tmp-{os.getpid()}"
        # Deterministic-but-unique sync marker (spec only needs opaque
        # 16 bytes; hashing the path keeps retries byte-identical).
        sync = hashlib.md5(final.encode()).digest()
        sch = json.loads(schema_json)
        n = 0
        with open(tmp, "wb") as fh:
            n = write_container(
                fh,
                sch,
                (t for b in batches for t in b.itertuples(index=False, name=None)),
                sync,
            )
        os.replace(tmp, final)  # atomic commit; retry overwrites same target
        yield pd.DataFrame({"path": [final], "rows": [n]})

    return df.mapInPandas(write_parts, schema="path string, rows long")


def read_avro(spark, in_dir: str, spark_schema):
    """Distributed Avro scan: binaryFile-parallel (a task per container
    file) + in-task block decode, Arrow-batched back out."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(in_dir)
        .select("content")
    )
    names = [f.name for f in spark_schema.fields]

    def decode_parts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for raw in b["content"]:
                schema, rows = read_container(bytes(raw))
                got = [f["name"] for f in schema["fields"]]
                if got != names:
                    raise ValueError(f"avro field mismatch: {got} != {names}")
                yield pd.DataFrame(rows or None, columns=names)

    return files.mapInPandas(decode_parts, schema=spark_schema)
