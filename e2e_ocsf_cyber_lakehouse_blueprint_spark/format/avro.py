"""Pure-Python Avro Object Container File (OCF) writer/reader.

The manifest/manifest-list layer of the table format is Avro (Iceberg-style;
the reference's Delta tables keep the same metadata in JSON+parquet checkpoints,
`_resources/PIPELINE_OVERVIEW.md:319`). No spark-avro DataSource jar ships in
this environment, and manifest volume is tiny relative to data, so metadata
encode/decode is driver-side pure Python per the public Avro 1.12 spec
(https://avro.apache.org/docs/1.12.0/specification/): zigzag-varint primitives,
null codec, deterministic sync markers.

Supported schema subset (all the manifest schemas need): null, boolean, int,
long, float, double, string, bytes, record, array, map, union of [null, X].
"""

from __future__ import annotations

import hashlib
import io
import json
import struct
from typing import Any, BinaryIO

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------- encoding

def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: BinaryIO, n: int) -> None:
    n = _zigzag_encode(n)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def read_long(buf: BinaryIO) -> int:
    shift = 0
    acc = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("unexpected EOF in varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _zigzag_decode(acc)
        shift += 7


def write_bytes(buf: BinaryIO, b: bytes) -> None:
    write_long(buf, len(b))
    buf.write(b)


def read_bytes(buf: BinaryIO) -> bytes:
    n = read_long(buf)
    out = buf.read(n)
    if len(out) != n:
        raise EOFError("unexpected EOF in bytes")
    return out


def write_string(buf: BinaryIO, s: str) -> None:
    write_bytes(buf, s.encode("utf-8"))


def read_string(buf: BinaryIO) -> str:
    return read_bytes(buf).decode("utf-8")


# ------------------------------------------------------------ datum codec

def _write_datum(buf: BinaryIO, schema: Any, datum: Any) -> None:
    if isinstance(schema, list):  # union; only [null, X] shapes used
        if datum is None:
            idx = schema.index("null")
            write_long(buf, idx)
            return
        idx = 0 if schema[0] != "null" else 1
        write_long(buf, idx)
        _write_datum(buf, schema[idx], datum)
        return
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for field in schema["fields"]:
                if field["name"] not in datum and "default" in field:
                    _write_datum(buf, field["type"], field["default"])
                else:
                    _write_datum(buf, field["type"], datum[field["name"]])
            return
        if t == "array":
            items = schema["items"]
            if datum:
                write_long(buf, len(datum))
                for item in datum:
                    _write_datum(buf, items, item)
            write_long(buf, 0)
            return
        if t == "map":
            values = schema["values"]
            if datum:
                write_long(buf, len(datum))
                for k in sorted(datum):  # sorted => byte-deterministic files
                    write_string(buf, k)
                    _write_datum(buf, values, datum[k])
            write_long(buf, 0)
            return
        t_inner = t  # e.g. {"type": "string"}
        _write_datum(buf, t_inner, datum)
        return
    # primitive
    if schema == "null":
        return
    if schema == "boolean":
        buf.write(b"\x01" if datum else b"\x00")
    elif schema in ("int", "long"):
        write_long(buf, int(datum))
    elif schema == "float":
        buf.write(struct.pack("<f", datum))
    elif schema == "double":
        buf.write(struct.pack("<d", datum))
    elif schema == "string":
        write_string(buf, datum)
    elif schema == "bytes":
        write_bytes(buf, datum)
    else:
        raise ValueError(f"unsupported avro type: {schema!r}")


def _read_datum(buf: BinaryIO, schema: Any) -> Any:
    if isinstance(schema, list):
        idx = read_long(buf)
        return _read_datum(buf, schema[idx])
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {f["name"]: _read_datum(buf, f["type"]) for f in schema["fields"]}
        if t == "array":
            out = []
            while True:
                n = read_long(buf)
                if n == 0:
                    return out
                if n < 0:  # block with byte size prefix
                    read_long(buf)
                    n = -n
                for _ in range(n):
                    out.append(_read_datum(buf, schema["items"]))
        if t == "map":
            out = {}
            while True:
                n = read_long(buf)
                if n == 0:
                    return out
                if n < 0:
                    read_long(buf)
                    n = -n
                for _ in range(n):
                    k = read_string(buf)
                    out[k] = _read_datum(buf, schema["values"])
        return _read_datum(buf, t)
    if schema == "null":
        return None
    if schema == "boolean":
        return buf.read(1) == b"\x01"
    if schema in ("int", "long"):
        return read_long(buf)
    if schema == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if schema == "string":
        return read_string(buf)
    if schema == "bytes":
        return read_bytes(buf)
    raise ValueError(f"unsupported avro type: {schema!r}")


# --------------------------------------------------------------- OCF layer

def write_ocf(path: str, schema: dict, records: list[dict], *, block_size: int = 1000) -> None:
    """Write an Avro OCF. Sync marker derived from the file name => deterministic bytes."""
    sync = hashlib.md5(path.rsplit("/", 1)[-1].encode()).digest()
    with open(path, "wb") as f:
        f.write(MAGIC)
        meta = {
            "avro.schema": json.dumps(schema, sort_keys=True, separators=(",", ":")),
            "avro.codec": "null",
        }
        write_long(f, len(meta))
        for k in sorted(meta):
            write_string(f, k)
            write_bytes(f, meta[k].encode("utf-8"))
        write_long(f, 0)
        f.write(sync)
        for start in range(0, len(records), block_size):
            block = records[start : start + block_size]
            body = io.BytesIO()
            for rec in block:
                _write_datum(body, schema, rec)
            payload = body.getvalue()
            write_long(f, len(block))
            write_long(f, len(payload))
            f.write(payload)
            f.write(sync)


def read_ocf(path: str) -> tuple[dict, list[dict]]:
    """Read an Avro OCF written by any conforming writer (null codec only)."""
    with open(path, "rb") as f:
        if f.read(4) != MAGIC:
            raise ValueError(f"not an Avro OCF: {path}")
        meta: dict[str, bytes] = {}
        while True:
            n = read_long(f)
            if n == 0:
                break
            if n < 0:
                read_long(f)
                n = -n
            for _ in range(n):
                k = read_string(f)
                meta[k] = read_bytes(f)
        codec = meta.get("avro.codec", b"null").decode()
        if codec not in ("null", ""):
            raise ValueError(f"unsupported avro codec: {codec}")
        schema = json.loads(meta["avro.schema"].decode())
        sync = f.read(16)
        records: list[dict] = []
        while True:
            try:
                count = read_long(f)
            except EOFError:
                break
            read_long(f)  # payload byte length (unused with null codec)
            for _ in range(count):
                records.append(_read_datum(f, schema))
            if f.read(16) != sync:
                raise ValueError(f"sync marker mismatch in {path}")
        return schema, records
