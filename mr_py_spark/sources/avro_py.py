"""Pure-Python Avro Object Container File source (SURVEY.md §2 A7).

Spark's own avro support lives in the EXTERNAL spark-avro module whose
jar is not part of the core distribution (and is absent from this
container). Rather than capability-gate the format away, this module
implements the public Apache Avro 1.x container spec directly:

- ``read_avro(spark, path)`` — the engine path: a ``binaryFile`` scan
  distributes whole container files across tasks, and an Arrow-batched
  ``mapInPandas`` decodes blocks into typed rows. Parallelism is
  per-file (the writer below and every sane producer bounds file
  sizes); finer-than-file splitting would seek to sync markers exactly
  like avro-mapred's input format — documented extension, not needed
  while files are bounded.
- ``write_avro(path, schema, rows)`` — a driver-side writer (null
  codec) used to produce round-trip fixtures from bounded dimension
  tables in tests and the A7 driver query. It is NOT the 100 TB write
  path (that stays parquet via the catalog sinks); it exists so the
  READ path can be proven end-to-end without the external jar.

Supported schema subset: records of null / boolean / int / long /
float / double / string / bytes fields, plus ["null", T] unions
(nullable columns). Codecs: null and deflate. That covers the
interchange shapes a Kafka/stream ingest actually lands.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"

_SPARK_TYPE = {
    "boolean": "boolean",
    "int": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "bytes": "binary",
    "null": "void",
}


# ---------------------------------------------------------------- encoding


def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: io.BytesIO) -> int:
    shift, u = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated avro varint")
        u |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1)


def _write_value(out: bytearray, typ, v) -> None:
    if isinstance(typ, list):  # union: index then value
        idx = 0 if v is None else next(
            i for i, t in enumerate(typ) if t != "null"
        )
        out += _zigzag_encode(idx)
        if v is not None:
            _write_value(out, typ[idx], v)
        return
    if typ == "null":
        return
    if typ == "boolean":
        out.append(1 if v else 0)
    elif typ in ("int", "long"):
        out += _zigzag_encode(int(v))
    elif typ == "float":
        out += struct.pack("<f", float(v))
    elif typ == "double":
        out += struct.pack("<d", float(v))
    elif typ == "string":
        b = str(v).encode("utf-8")
        out += _zigzag_encode(len(b)) + b
    elif typ == "bytes":
        out += _zigzag_encode(len(v)) + bytes(v)
    else:
        raise NotImplementedError(f"avro type {typ!r}")


def _read_value(buf: io.BytesIO, typ):
    if isinstance(typ, list):
        return _read_value(buf, typ[_zigzag_decode(buf)])
    if typ == "null":
        return None
    if typ == "boolean":
        return buf.read(1) == b"\x01"
    if typ in ("int", "long"):
        return _zigzag_decode(buf)
    if typ == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if typ == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if typ == "string":
        return buf.read(_zigzag_decode(buf)).decode("utf-8")
    if typ == "bytes":
        return buf.read(_zigzag_decode(buf))
    raise NotImplementedError(f"avro type {typ!r}")


# ------------------------------------------------------------------ writer


def write_avro(
    path: str,
    schema: dict,
    rows,
    sync: bytes = b"\x00" * 16,
    tmp_suffix: str = ".tmp",
) -> None:
    """Write one Avro container file (null codec). ``schema`` is the
    record schema as a dict; ``rows`` an iterable of dicts.
    ``tmp_suffix`` names the private staging file this writer owns
    before the atomic publish rename — concurrent writers of the SAME
    target must pass distinct suffixes (see write_avro_distributed)."""
    fields = schema["fields"]
    body = bytearray()
    n = 0
    for row in rows:
        for f in fields:
            _write_value(body, f["type"], row[f["name"]])
        n += 1
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": b"null",
    }
    out = bytearray(_MAGIC)
    out += _zigzag_encode(len(meta))
    for k, v in meta.items():
        kb = k.encode()
        out += _zigzag_encode(len(kb)) + kb
        out += _zigzag_encode(len(v)) + v
    out += _zigzag_encode(0)  # map terminator
    out += sync
    if n:
        out += _zigzag_encode(n)
        out += _zigzag_encode(len(body))
        out += body
        out += sync
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + tmp_suffix
    with open(tmp, "wb") as f:
        f.write(out)
    os.replace(tmp, path)


def write_avro_distributed(df, path: str, schema: dict) -> int:
    """Distributed avro write: each DataFrame partition encodes its own
    rows and writes ONE container file from the executor (the classic
    one-file-per-task layout every distributed writer uses) — no
    driver-side materialization at any size. ``path`` must be storage
    every executor can reach (true in local mode and on any cluster
    with shared/object storage — the same requirement as every Spark
    file sink). Files land via an attempt-private tmp (suffix carries
    the unique task attempt id) + atomic rename to the partition-keyed
    name, so a retried or SPECULATIVE duplicate attempt stages without
    interleaving and the last complete rename wins — no duplication,
    no torn container (a full job-commit protocol is what the
    parquet sink is for — avro here is the interchange format, not the
    100 TB sink). Returns the number of rows written. Empty partitions
    write nothing."""
    import pandas as pd

    os.makedirs(path, exist_ok=True)
    names = [f["name"] for f in schema["fields"]]

    def encode(batches):
        from pyspark import TaskContext

        rows = []
        for pdf in batches:
            rows.extend(
                {
                    n: (v.item() if hasattr(v, "item") else v)
                    for n, v in zip(names, tup)
                }
                for tup in pdf[names].itertuples(index=False, name=None)
            )
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        # The tmp file carries the globally-unique task attempt id:
        # two attempts for one partition (speculative execution, a
        # zombie retry racing its replacement) each stage privately
        # and the LAST atomic rename wins with a complete file —
        # a shared fixed tmp name could interleave into a corrupt
        # container before the rename.
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        if rows:
            write_avro(
                os.path.join(path, f"part-{pid:05d}.avro"),
                schema,
                rows,
                tmp_suffix=f".tmp-{attempt}",
            )
        yield pd.DataFrame({"n": [len(rows)]})

    counts = df.select(*names).mapInPandas(encode, "n long")
    return sum(r.n for r in counts.collect())


# ------------------------------------------------------------------ reader


def _decode_container(data: bytes):
    """Yield row dicts from one container file's bytes."""
    buf = io.BytesIO(data)
    if buf.read(4) != _MAGIC:
        raise ValueError("not an avro object container file")
    meta = {}
    while True:
        n = _zigzag_decode(buf)
        if n == 0:
            break
        if n < 0:  # negative map-block count is followed by a byte size
            _zigzag_decode(buf)
            n = -n
        for _ in range(n):
            k = buf.read(_zigzag_decode(buf)).decode()
            meta[k] = buf.read(_zigzag_decode(buf))
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = buf.read(16)
    fields = schema["fields"]
    while True:
        head = buf.read(1)
        if not head:
            return
        buf.seek(-1, io.SEEK_CUR)
        n_rows = _zigzag_decode(buf)
        n_bytes = _zigzag_decode(buf)
        block = buf.read(n_bytes)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise NotImplementedError(f"avro codec {codec!r}")
        bbuf = io.BytesIO(block)
        for _ in range(n_rows):
            yield {f["name"]: _read_value(bbuf, f["type"]) for f in fields}
        if buf.read(16) != sync:
            raise ValueError("avro block sync mismatch")


def spark_schema_of(schema: dict) -> str:
    """DDL string for an avro record schema (supported subset)."""
    cols = []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, list):
            t = next(x for x in t if x != "null")
        cols.append(f"{f['name']} {_SPARK_TYPE[t]}")
    return ", ".join(cols)


def read_avro(spark, path: str, schema: dict):
    """Distributed avro scan: binaryFile lists+ships container files
    (one task per file), mapInPandas decodes. ``schema`` must be the
    writer's record schema (explicit-schema discipline, same as the
    CSV/JSON sources — no inference pass)."""
    import pandas as pd

    ddl = spark_schema_of(schema)
    names = [f["name"] for f in schema["fields"]]

    def decode(batches):
        for pdf in batches:
            for content in pdf["content"]:
                rows = list(_decode_container(bytes(content)))
                yield pd.DataFrame(
                    {n: [r[n] for r in rows] for n in names}
                    if rows
                    else {n: [] for n in names}
                )

    files = spark.read.format("binaryFile").load(
        os.path.join(path, "*.avro") if os.path.isdir(path) else path
    )
    return files.select("content").mapInPandas(decode, ddl)
