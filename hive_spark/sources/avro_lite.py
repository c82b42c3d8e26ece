"""Minimal Avro Object Container File reader (pure Python).

The engine stores natively in parquet; Avro appears only on the ingest
edge (LOAD DATA of the reference's .avro test files — ref: serde/src/
java/org/apache/hadoop/hive/serde2/avro/AvroSerDe.java). The runtime
ships no spark-avro datasource jar and no Python avro package, so this
module implements the container spec (null/deflate codecs, the complete
type system) directly. Files are parsed driver-side — correct for the
ingest-edge use (LOAD DATA of bounded files); a 100 TB Avro lake would
instead mount through the Hive-catalog session in sources/hive_formats
or a real spark-avro jar.

Spec: https://avro.apache.org/docs/current/specification/ (container
files + binary encoding).
"""

from __future__ import annotations

import io
import json
import struct
import zlib

_MAGIC = b"Obj\x01"


def _read_long(buf: io.BytesIO) -> int:
    """Zigzag varint."""
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        acc |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _decimal_value(raw: bytes, scale: int):
    """Avro decimal logical type: big-endian two's-complement unscaled
    int (ref: serde/.../avro/AvroDeserializer decimal handling)."""
    import decimal

    return decimal.Decimal(
        int.from_bytes(raw, "big", signed=True)
    ).scaleb(-int(scale))  # old writers emit scale as a STRING


def _read_bytes(buf: io.BytesIO) -> bytes:
    return buf.read(_read_long(buf))


def _skip_to_named(schema):
    """Union/named-type normalization: resolve {'type': X} wrappers."""
    while isinstance(schema, dict) and set(schema) == {"type"}:
        schema = schema["type"]
    return schema


def _decode(schema, buf: io.BytesIO, names: dict):
    schema = _skip_to_named(schema)
    if isinstance(schema, list):  # union: branch index then value
        idx = _read_long(buf)
        return _decode(schema[idx], buf, names)
    if isinstance(schema, str):
        if schema in names:
            return _decode(names[schema], buf, names)
        t = schema
    else:
        t = schema["type"]
        if t in ("record", "enum", "fixed") and "name" in schema:
            names.setdefault(schema["name"], schema)
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        v = _read_long(buf)
        if isinstance(schema, dict):
            lt = schema.get("logicalType")
            if lt == "date":
                import datetime

                return datetime.date(1970, 1, 1) + datetime.timedelta(days=v)
            if lt in ("timestamp-millis", "timestamp-micros"):
                import datetime

                # exact integer arithmetic: float division rounds the
                # microsecond for large/negative epochs (f64 mantissa)
                delta = (
                    datetime.timedelta(milliseconds=v)
                    if lt == "timestamp-millis"
                    else datetime.timedelta(microseconds=v)
                )
                return datetime.datetime(1970, 1, 1) + delta
        return v
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        raw = _read_bytes(buf)
        if isinstance(schema, dict) and schema.get("logicalType") == "decimal":
            return _decimal_value(raw, schema.get("scale", 0))
        return raw
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "enum":
        return schema["symbols"][_read_long(buf)]
    if t == "fixed":
        raw = buf.read(schema["size"])
        if schema.get("logicalType") == "decimal":
            return _decimal_value(raw, schema.get("scale", 0))
        return raw
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix
                n = -n
                _read_long(buf)
            for _ in range(n):
                out.append(_decode(schema["items"], buf, names))
        return out
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode(schema["values"], buf, names)
        return out
    if t == "record":
        return tuple(
            _decode(f["type"], buf, names) for f in schema["fields"]
        )
    raise ValueError(f"unsupported avro type: {t!r}")


def spark_type(schema, names: dict | None = None) -> str:
    """Avro schema -> Spark DDL type string (AvroSerDe's type mapping,
    ref: serde/.../avro/SchemaToTypeInfo.java)."""
    names = names if names is not None else {}
    schema = _skip_to_named(schema)
    if isinstance(schema, list):
        non_null = [s for s in schema if s != "null"]
        if len(non_null) > 1:
            # multi-branch union -> Hive UNIONTYPE (SchemaToTypeInfo
            # generateUnionTypeInfo), emitted in the engine's
            # tagged-struct emulation (avro_nullable_union.q)
            fields = ", ".join(
                f"field{i}:{spark_type(s, names)}"
                for i, s in enumerate(non_null)
            )
            return f"struct<tag:int, {fields}>"
        return spark_type(non_null[0] if non_null else "string", names)
    if isinstance(schema, str):
        if schema in names:
            return spark_type(names[schema], names)
        return {
            "null": "string", "boolean": "boolean", "int": "int",
            "long": "bigint", "float": "float", "double": "double",
            "bytes": "binary", "string": "string",
        }[schema]
    t = schema["type"]
    if t in ("record", "enum", "fixed") and "name" in schema:
        names.setdefault(schema["name"], schema)
    if t in ("bytes", "fixed") and schema.get("logicalType") == "decimal":
        return (
            f"decimal({int(schema.get('precision', 38))},"
            f"{int(schema.get('scale', 0))})"
        )
    if t in ("int", "long") and schema.get("logicalType") == "date":
        return "date"
    if t == "long" and str(schema.get("logicalType", "")).startswith(
        "timestamp-"
    ):
        return "timestamp"
    if t == "enum":
        return "string"
    if t == "fixed":
        return "binary"
    if t == "array":
        return f"array<{spark_type(schema['items'], names)}>"
    if t == "map":
        return f"map<string,{spark_type(schema['values'], names)}>"
    if t == "record":
        inner = ",".join(
            f"{f['name']}:{spark_type(f['type'], names)}"
            for f in schema["fields"]
        )
        return f"struct<{inner}>"
    return spark_type(t, names)


def ddl_from_schema_json(schema_json: str) -> str:
    """avro.schema.literal text -> 'name type, ...' DDL columns.

    AvroSerDe derives the Hive schema from the table property when no
    column list is given (ref: serde/.../avro/AvroSerdeUtils.java
    determineSchemaOrThrowException); same derivation here so SQL-text
    CREATEs get real columns instead of a schema-less datasource table.
    """
    schema = _skip_to_named(json.loads(schema_json))
    names: dict = {}
    if isinstance(schema, dict) and schema.get("type") == "record":
        return ", ".join(
            f"`{f['name']}` {spark_type(f['type'], names)}"
            for f in schema["fields"]
        )
    return f"value {spark_type(schema, names)}"


def ddl_schema(path: str) -> str:
    """Top-level record -> 'name type, ...' DDL string for createDataFrame."""
    raw = open(path, "rb").read()
    buf = io.BytesIO(raw)
    if buf.read(4) != _MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            n = -n
            _read_long(buf)
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    schema = _skip_to_named(json.loads(meta["avro.schema"]))
    names: dict = {}
    if isinstance(schema, dict) and schema.get("type") == "record":
        return ", ".join(
            f"`{f['name']}` {spark_type(f['type'], names)}"
            for f in schema["fields"]
        )
    return f"value {spark_type(schema, names)}"


def read_container(path: str) -> tuple[list[str], list[tuple]]:
    """Read one .avro container file -> (top-level field names, rows).
    Non-record top-level schemas come back as single-column rows."""
    raw = open(path, "rb").read()
    buf = io.BytesIO(raw)
    if buf.read(4) != _MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            n = -n
            _read_long(buf)
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(
            f"{path}: avro codec {codec!r} needs an external library "
            "(only null/deflate decode here)"
        )
    schema = json.loads(meta["avro.schema"])
    sync = buf.read(16)
    names: dict = {}
    top = _skip_to_named(schema)
    if isinstance(top, dict) and top.get("type") == "record":
        fields = [f["name"] for f in top["fields"]]
    else:
        fields = ["value"]
    rows: list[tuple] = []
    while buf.tell() < len(raw):
        count = _read_long(buf)
        size = _read_long(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        bbuf = io.BytesIO(block)
        for _ in range(count):
            v = _decode(schema, bbuf, dict(names))
            rows.append(v if isinstance(v, tuple) else (v,))
        marker = buf.read(16)
        if marker != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    return fields, rows
