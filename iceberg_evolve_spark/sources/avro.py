"""From-scratch Apache Avro object-container reader/writer.

Plain PySpark bundles no ``spark-avro`` connector (only parquet/ORC/CSV/JSON/
text are native), yet Avro is the third-most-common pipeline interchange
format. This module implements the Avro 1.11 **Object Container File** format
(spec: https://avro.apache.org/docs/1.11.1/specification/) from first
principles — the same from-scratch discipline as the PNG/JPEG/GIF decoders —
so the repo can read and write real ``.avro`` files with zero external jars:

- header: 4-byte magic ``Obj\\x01``, a file-metadata map carrying
  ``avro.schema`` (JSON) and ``avro.codec``, and a 16-byte sync marker;
- data blocks: record count (zigzag varint long), serialized byte size
  (varint), the encoded records (optionally raw-DEFLATE compressed), then the
  sync marker again — a corrupt marker fails loudly with the file offset;
- binary encoding: zigzag base-128 varints for int/long, little-endian IEEE
  for float/double, length-prefixed UTF-8/bytes, unions as branch-index +
  value, arrays as count-delimited blocks, records as field concatenation.

Type coverage maps the Spark types the testdata and the schema model use:
null/boolean/int/long/float/double/string/bytes, records (nested structs),
arrays, **maps** (string-keyed, as the spec requires — non-string Spark map
keys are rejected loudly), **enums** (decode to their symbol strings; Spark
has no enum type, so the Spark→Avro direction never emits one), **fixed**
(size-checked raw bytes → Spark binary), nullable-as-``["null", T]`` unions,
and the logical types ``date`` (int days), ``timestamp-micros`` /
``local-timestamp-micros`` (long), and ``decimal`` (bytes, two's-complement
unscaled big-endian).

Scale shape: the WRITER runs as ``mapInArrow`` — each input partition
serializes its Arrow batches executor-side and writes one container file, so
encode work is distributed and the driver sees only per-file stats rows (one
per partition). The READER pairs Spark's native ``binaryFile`` source with a
``mapInArrow`` decoder at per-file granularity — and for the one-giant-file
shape, ``read_avro(..., split_bytes=N)`` plans SYNC-MARKER BYTE-RANGE SPLITS
instead (the reason the container format has sync markers at all): the
driver stats each file and emits (file, lo, hi) split rows; each task seeks
to its range, scans forward to the first VALIDATED sync boundary (a
candidate marker must be followed by a well-formed block whose trailing
marker matches — false in-payload matches self-correct), and decodes exactly
the blocks that START inside its range, reading past ``hi`` only to finish
its last block (Hadoop input-split ownership semantics). Decoded columns are
rebuilt as Arrow arrays directly — no pandas object-dtype round-trip, and
nulls stay nulls (never NaN-conflated).

The reference system (anatol-ju/iceberg-evolve) has no file-format layer at
all (SURVEY.md §2.2); this is north-star extension work.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from decimal import Decimal
from typing import Any, Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"
SYNC_SIZE = 16
_CODECS = ("null", "deflate")


# --------------------------------------------------------------------------
# primitive binary codec (Avro spec §"Binary encoding")
# --------------------------------------------------------------------------


def zigzag_encode(n: int) -> int:
    """Map a signed 64-bit int to the unsigned zigzag space (spec: 0→0,
    -1→1, 1→2, -2→3 …). Python's arbitrary-precision arithmetic shift makes
    ``n >> 63`` the sign smear (-1 for negatives, 0 otherwise)."""
    return (n << 1) ^ (n >> 63)


def zigzag_decode(z: int) -> int:
    return (z >> 1) ^ -(z & 1)


def write_long(out: bytearray, n: int) -> None:
    """Zigzag + base-128 varint, little-endian 7-bit groups, MSB=continue."""
    z = zigzag_encode(n)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def read_long(buf, pos: int) -> tuple[int, int]:
    z = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not (b & 0x80):
            return zigzag_decode(z), pos
        shift += 7
        if shift > 70:
            raise ValueError("varint longer than 10 bytes — corrupt stream")


def _write_bytes(out: bytearray, b: bytes) -> None:
    write_long(out, len(b))
    out.extend(b)


def _read_bytes(buf, pos: int) -> tuple[bytes, int]:
    n, pos = read_long(buf, pos)
    if n < 0:
        raise ValueError("negative byte-length — corrupt stream")
    return bytes(buf[pos : pos + n]), pos + n


# --------------------------------------------------------------------------
# Spark schema ⟷ Avro schema JSON
# --------------------------------------------------------------------------


def avro_schema_of_struct(schema: T.StructType, name: str = "spark_record") -> dict:
    """Derive the Avro record schema (JSON-able dict) for a Spark struct.
    Nullable fields become ``["null", T]`` unions with a null default."""
    counter = [0]

    def conv(dt: T.DataType) -> Any:
        if isinstance(dt, T.LongType):
            return "long"
        if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
            return "int"
        if isinstance(dt, T.DoubleType):
            return "double"
        if isinstance(dt, T.FloatType):
            return "float"
        if isinstance(dt, T.StringType):
            return "string"
        if isinstance(dt, T.BinaryType):
            return "bytes"
        if isinstance(dt, T.BooleanType):
            return "boolean"
        if isinstance(dt, T.DateType):
            return {"type": "int", "logicalType": "date"}
        if isinstance(dt, T.TimestampNTZType):
            return {"type": "long", "logicalType": "local-timestamp-micros"}
        if isinstance(dt, T.TimestampType):
            return {"type": "long", "logicalType": "timestamp-micros"}
        if isinstance(dt, T.DecimalType):
            return {
                "type": "bytes",
                "logicalType": "decimal",
                "precision": dt.precision,
                "scale": dt.scale,
            }
        if isinstance(dt, T.ArrayType):
            items = conv(dt.elementType)
            if dt.containsNull:
                items = ["null", items]
            return {"type": "array", "items": items}
        if isinstance(dt, T.MapType):
            if not isinstance(dt.keyType, T.StringType):
                raise TypeError(
                    "Avro maps are string-keyed by spec; got map key type "
                    f"{dt.keyType.simpleString()} — restructure as an array "
                    "of (key, value) records"
                )
            values = conv(dt.valueType)
            if dt.valueContainsNull:
                values = ["null", values]
            return {"type": "map", "values": values}
        if isinstance(dt, T.StructType):
            counter[0] += 1
            return {
                "type": "record",
                "name": f"{name}_r{counter[0]}",
                "fields": [
                    {
                        "name": f.name,
                        "type": ["null", conv(f.dataType)] if f.nullable else conv(f.dataType),
                        **({"default": None} if f.nullable else {}),
                    }
                    for f in dt.fields
                ],
            }
        raise TypeError(f"unsupported Spark type for Avro: {dt.simpleString()}")

    rec = conv(schema)
    rec["name"] = name
    return rec


def spark_struct_of_avro(schema: Any) -> T.DataType:
    """Inverse mapping: parsed Avro schema (dict/list/str) → Spark type.
    A ``["null", T]`` union maps to nullable T; other unions are rejected."""

    def conv(s: Any) -> T.DataType:
        s = _strip_union(s)[0]
        if isinstance(s, str):
            prim = {
                "long": T.LongType(),
                "int": T.IntegerType(),
                "double": T.DoubleType(),
                "float": T.FloatType(),
                "string": T.StringType(),
                "bytes": T.BinaryType(),
                "boolean": T.BooleanType(),
            }
            if s in prim:
                return prim[s]
            raise TypeError(f"unsupported Avro type: {s!r}")
        lt = s.get("logicalType")
        if lt == "date":
            return T.DateType()
        if lt == "local-timestamp-micros":
            return T.TimestampNTZType()
        if lt == "timestamp-micros":
            return T.TimestampType()
        if lt == "decimal":
            return T.DecimalType(s["precision"], s["scale"])
        if s["type"] == "array":
            item, nullable = _strip_union(s["items"])
            return T.ArrayType(conv(item), containsNull=nullable)
        if s["type"] == "map":
            value, nullable = _strip_union(s["values"])
            return T.MapType(
                T.StringType(), conv(value), valueContainsNull=nullable
            )
        if s["type"] == "enum":
            return T.StringType()  # symbols surface as their string names
        if s["type"] == "fixed":
            return T.BinaryType()
        if s["type"] == "record":
            return T.StructType(
                [
                    T.StructField(
                        f["name"], conv(f["type"]), nullable=_strip_union(f["type"])[1]
                    )
                    for f in s["fields"]
                ]
            )
        raise TypeError(f"unsupported Avro type: {s!r}")

    return conv(schema)


def _strip_union(s: Any) -> tuple[Any, bool]:
    """Reduce ``["null", T]`` (either order) to (T, nullable=True)."""
    if not isinstance(s, list):
        return s, False
    branches = [b for b in s if b != "null"]
    if len(s) > 2 or len(branches) != 1:
        raise TypeError(f"only ['null', T] unions are supported, got {s!r}")
    return branches[0], "null" in s


# --------------------------------------------------------------------------
# value encoder / decoder compiled from the Avro schema
# --------------------------------------------------------------------------


def _encoder(s: Any) -> Callable[[bytearray, Any], None]:
    base, nullable = _strip_union(s)
    enc = _encoder_nonnull(base)
    if not nullable:
        return enc

    def enc_union(out: bytearray, v: Any) -> None:
        # branch order is ["null", T]: index 0 = null, 1 = value
        if v is None:
            out.append(0x00)  # varint(zigzag(0))
        else:
            out.append(0x02)  # varint(zigzag(1))
            enc(out, v)

    return enc_union


def _encoder_nonnull(s: Any) -> Callable[[bytearray, Any], None]:
    if isinstance(s, str):
        if s in ("long", "int"):
            return lambda out, v: write_long(out, int(v))
        if s == "double":
            return lambda out, v: out.extend(struct.pack("<d", float(v)))
        if s == "float":
            return lambda out, v: out.extend(struct.pack("<f", float(v)))
        if s == "string":
            return lambda out, v: _write_bytes(out, v.encode("utf-8"))
        if s == "bytes":
            return lambda out, v: _write_bytes(out, bytes(v))
        if s == "boolean":
            return lambda out, v: out.append(1 if v else 0)
        if s == "null":
            return lambda out, v: None
        raise TypeError(f"unsupported Avro type: {s!r}")
    lt = s.get("logicalType")
    if lt == "date":
        # binaryFile+Arrow hands datetime.date; spec stores days since epoch
        def enc_date(out: bytearray, v: Any) -> None:
            write_long(out, v.toordinal() - 719163 if hasattr(v, "toordinal") else int(v))

        return enc_date
    if lt in ("timestamp-micros", "local-timestamp-micros"):
        def enc_ts(out: bytearray, v: Any) -> None:
            if isinstance(v, int):
                write_long(out, v)
            else:  # datetime.datetime from Arrow to_pylist
                if v.tzinfo is not None:
                    # tz-aware values (Spark attaches the session tz to
                    # TimestampType Arrow arrays) store UTC epoch micros per
                    # the Avro spec — normalize BEFORE the component math, or
                    # the stored value would depend on the session timezone
                    # (and diverge from the columnar path, ADVICE r13)
                    import datetime as _dt

                    v = v.astimezone(_dt.timezone.utc)
                epoch_days = v.toordinal() - 719163
                micros = (
                    epoch_days * 86_400_000_000
                    + v.hour * 3_600_000_000
                    + v.minute * 60_000_000
                    + v.second * 1_000_000
                    + v.microsecond
                )
                write_long(out, micros)

        return enc_ts
    if lt == "decimal":
        scale = s["scale"]

        def enc_dec(out: bytearray, v: Any) -> None:
            unscaled = int(Decimal(v).scaleb(scale))
            nbytes = max(1, (unscaled.bit_length() + 8) // 8)
            _write_bytes(out, unscaled.to_bytes(nbytes, "big", signed=True))

        return enc_dec
    if s["type"] == "array":
        item_enc = _encoder(s["items"])

        def enc_arr(out: bytearray, v: Any) -> None:
            n = len(v)
            if n:
                write_long(out, n)
                for item in v:
                    item_enc(out, item)
            write_long(out, 0)

        return enc_arr
    if s["type"] == "map":
        val_enc = _encoder(s["values"])

        def enc_map(out: bytearray, v: Any) -> None:
            items = list(v.items()) if isinstance(v, dict) else list(v)
            if items:
                write_long(out, len(items))
                for k, item in items:
                    _write_bytes(out, k.encode("utf-8"))
                    val_enc(out, item)
            write_long(out, 0)

        return enc_map
    if s["type"] == "enum":
        index = {sym: i for i, sym in enumerate(s["symbols"])}

        def enc_enum(out: bytearray, v: Any) -> None:
            try:
                write_long(out, index[v])
            except KeyError:
                raise ValueError(
                    f"{v!r} is not a symbol of enum {s.get('name')!r} "
                    f"(symbols: {s['symbols']})"
                ) from None

        return enc_enum
    if s["type"] == "fixed":
        size = int(s["size"])

        def enc_fixed(out: bytearray, v: Any) -> None:
            b = bytes(v)
            if len(b) != size:
                raise ValueError(
                    f"fixed {s.get('name')!r} expects exactly {size} bytes, "
                    f"got {len(b)}"
                )
            out.extend(b)

        return enc_fixed
    if s["type"] == "record":
        field_encs = [(f["name"], _encoder(f["type"])) for f in s["fields"]]

        def enc_rec(out: bytearray, v: Any) -> None:
            for fname, fe in field_encs:
                fe(out, v[fname])

        return enc_rec
    raise TypeError(f"unsupported Avro type: {s!r}")


def _decoder(s: Any) -> Callable[[Any, int], tuple[Any, int]]:
    base, nullable = _strip_union(s)
    dec = _decoder_nonnull(base)
    if not nullable:
        return dec

    def dec_union(buf, pos: int) -> tuple[Any, int]:
        idx, pos = read_long(buf, pos)
        if idx == 0:
            return None, pos
        if idx != 1:
            raise ValueError(f"union branch {idx} out of range — corrupt stream")
        return dec(buf, pos)

    return dec_union


def _decoder_nonnull(s: Any) -> Callable[[Any, int], tuple[Any, int]]:
    if isinstance(s, str):
        if s in ("long", "int"):
            return read_long
        if s == "double":
            return lambda buf, pos: (
                struct.unpack_from("<d", buf, pos)[0],
                pos + 8,
            )
        if s == "float":
            return lambda buf, pos: (
                struct.unpack_from("<f", buf, pos)[0],
                pos + 4,
            )
        if s == "string":
            def dec_str(buf, pos):
                b, pos = _read_bytes(buf, pos)
                return b.decode("utf-8"), pos

            return dec_str
        if s == "bytes":
            return _read_bytes
        if s == "boolean":
            return lambda buf, pos: (buf[pos] == 1, pos + 1)
        if s == "null":
            return lambda buf, pos: (None, pos)
        raise TypeError(f"unsupported Avro type: {s!r}")
    lt = s.get("logicalType")
    if lt in ("date", "timestamp-micros", "local-timestamp-micros"):
        # emit raw ints; pyarrow interprets them in the column's unit
        return read_long
    if lt == "decimal":
        scale = s["scale"]

        def dec_dec(buf, pos):
            b, pos = _read_bytes(buf, pos)
            return (
                Decimal(int.from_bytes(b, "big", signed=True)).scaleb(-scale),
                pos,
            )

        return dec_dec
    if s["type"] == "array":
        item_dec = _decoder(s["items"])

        def dec_arr(buf, pos):
            out = []
            while True:
                n, pos = read_long(buf, pos)
                if n == 0:
                    return out, pos
                if n < 0:
                    # negative count: block byte-size follows (skippable form)
                    n = -n
                    _, pos = read_long(buf, pos)
                for _ in range(n):
                    v, pos = item_dec(buf, pos)
                    out.append(v)

        return dec_arr
    if s["type"] == "map":
        val_dec = _decoder(s["values"])

        def dec_map(buf, pos):
            out = {}
            while True:
                n, pos = read_long(buf, pos)
                if n == 0:
                    return out, pos
                if n < 0:
                    # negative count: block byte-size follows (skippable form)
                    n = -n
                    _, pos = read_long(buf, pos)
                for _ in range(n):
                    kb, pos = _read_bytes(buf, pos)
                    out[kb.decode("utf-8")], pos = val_dec(buf, pos)

        return dec_map
    if s["type"] == "enum":
        symbols = list(s["symbols"])

        def dec_enum(buf, pos):
            idx, pos = read_long(buf, pos)
            if not 0 <= idx < len(symbols):
                raise ValueError(
                    f"enum index {idx} out of range for {s.get('name')!r} "
                    f"({len(symbols)} symbols) — corrupt stream"
                )
            return symbols[idx], pos

        return dec_enum
    if s["type"] == "fixed":
        size = int(s["size"])

        def dec_fixed(buf, pos):
            b = bytes(buf[pos : pos + size])
            if len(b) != size:
                raise ValueError("truncated fixed value — corrupt stream")
            return b, pos + size

        return dec_fixed
    if s["type"] == "record":
        field_decs = [(f["name"], _decoder(f["type"])) for f in s["fields"]]

        def dec_rec(buf, pos):
            row = {}
            for fname, fd in field_decs:
                row[fname], pos = fd(buf, pos)
            return row, pos

        return dec_rec
    raise TypeError(f"unsupported Avro type: {s!r}")


# --------------------------------------------------------------------------
# object container file: header / blocks
# --------------------------------------------------------------------------


def _write_header(out: bytearray, schema_json: str, codec: str, sync: bytes) -> None:
    out.extend(MAGIC)
    meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    write_long(out, len(meta))
    for k, v in sorted(meta.items()):
        _write_bytes(out, k.encode())
        _write_bytes(out, v)
    write_long(out, 0)  # map terminator block
    out.extend(sync)


def read_header(buf) -> tuple[dict, str, bytes, int]:
    """Parse a container header → (avro schema dict, codec, sync, pos)."""
    if bytes(buf[:4]) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = read_long(buf, pos)
        if n == 0:
            break
        if n < 0:  # skippable form: byte size follows
            n = -n
            _, pos = read_long(buf, pos)
        for _ in range(n):
            k, pos = _read_bytes(buf, pos)
            v, pos = _read_bytes(buf, pos)
            meta[k.decode()] = v
    if "avro.schema" not in meta:
        raise ValueError("container header carries no avro.schema")
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in _CODECS:
        raise ValueError(f"unsupported avro.codec {codec!r} (supported: {_CODECS})")
    sync = bytes(buf[pos : pos + SYNC_SIZE])
    if len(sync) != SYNC_SIZE:
        raise ValueError("truncated header (short sync marker)")
    return json.loads(meta["avro.schema"]), codec, sync, pos + SYNC_SIZE


def _iter_blocks(buf, pos: int, codec: str, sync: bytes) -> Iterator[tuple[int, bytes]]:
    """Yield (record_count, decompressed_payload) per block, validating the
    sync marker after every block — a mismatch names the offset."""
    total = len(buf)
    while pos < total:
        count, pos = read_long(buf, pos)
        size, pos = read_long(buf, pos)
        if count < 0 or size < 0 or pos + size + SYNC_SIZE > total:
            raise ValueError(f"corrupt block header at offset {pos}")
        payload = bytes(buf[pos : pos + size])
        pos += size
        marker = bytes(buf[pos : pos + SYNC_SIZE])
        if marker != sync:
            raise ValueError(
                f"sync marker mismatch at offset {pos} — corrupt or "
                "misaligned Avro block"
            )
        pos += SYNC_SIZE
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)  # raw DEFLATE per spec
        yield count, payload


def decode_container(data: bytes) -> tuple[Any, list[dict]]:
    """Decode one whole container file → (avro schema dict, list of row
    dicts). The building block both the distributed reader and the tests
    drive."""
    schema, codec, sync, pos = read_header(data)
    dec = _decoder(schema)
    rows: list[dict] = []
    for count, payload in _iter_blocks(data, pos, codec, sync):
        p = 0
        for _ in range(count):
            row, p = dec(payload, p)
            rows.append(row)
        if p != len(payload):
            raise ValueError(
                f"block decoded {p} of {len(payload)} bytes — corrupt block"
            )
    return schema, rows


def encode_container(
    schema: Any,
    rows: list[dict],
    codec: str = "deflate",
    sync: bytes | None = None,
    records_per_block: int = 4096,
) -> bytes:
    """Encode rows into one container byte string (driver-side building
    block; the distributed writer calls it per partition).

    ``sync`` defaults to a CONTENT-ADDRESSED marker: md5 over the exact
    framed block bytes (count/size varints + encoded-or-compressed
    payloads). Real Avro randomizes the marker per file so record bytes
    cannot embed a valid boundary; randomness would break task-retry
    determinism here, but hashing the payload BYTES gives the same
    unforgeability — any record bytes that tried to embed the file's own
    marker would change the marker (an attacker needs an md5 fixed point) —
    while identical input still produces identical files. (The previous
    scheme, md5 of schema + row count, was PREDICTABLE: adversarial record
    values could embed the marker plus well-formed fake block framing that
    the split reader's validator accepts — ADVICE r9.) An all-zero marker is
    separately rejected by the split reader (zero runs in uncompressed
    payloads collide with it)."""
    if codec not in _CODECS:
        raise ValueError(f"unsupported codec {codec!r} (supported: {_CODECS})")
    enc = _encoder(schema)
    blocks: list[tuple[int, bytes]] = []
    for i in range(0, len(rows), records_per_block):
        chunk = rows[i : i + records_per_block]
        block = bytearray()
        for row in chunk:
            enc(block, row)
        payload = bytes(block)
        if codec == "deflate":
            # level 1: the Avro spec fixes the FORMAT (raw DEFLATE), not the
            # effort level — readers are level-agnostic, and the write path
            # is encoder-CPU-bound, so the fast level trades a few percent
            # of ratio for a several-fold cheaper compress step (§1.2
            # per-task work).
            co = zlib.compressobj(1, zlib.DEFLATED, -15)
            payload = co.compress(payload) + co.flush()
        blocks.append((len(chunk), payload))
    if sync is None:
        import hashlib

        h = hashlib.md5(json.dumps(schema).encode())
        for count, payload in blocks:
            frame = bytearray()
            write_long(frame, count)
            write_long(frame, len(payload))
            h.update(bytes(frame))
            h.update(payload)
        sync = h.digest()
    out = bytearray()
    _write_header(out, json.dumps(schema), codec, sync)
    for count, payload in blocks:
        write_long(out, count)
        write_long(out, len(payload))
        out.extend(payload)
        out.extend(sync)
    return bytes(out)


# --------------------------------------------------------------------------
# columnar (vectorized) encode — byte-identical fast path for primitive rows
# --------------------------------------------------------------------------


def _vector_kinds(schema: Any) -> list[tuple[str, str, bool]] | None:
    """(name, kind, nullable) per field when EVERY field is a primitive the
    columnar encoder handles — long/int/double/float/string/bytes/boolean,
    date, timestamp-micros — else ``None`` (caller falls back to the
    row-at-a-time encoder: maps/arrays/enums/fixed/decimal/nested records)."""
    if not (isinstance(schema, dict) and schema.get("type") == "record"):
        return None
    out: list[tuple[str, str, bool]] = []
    for f in schema.get("fields", ()):
        base, nullable = _strip_union(f["type"])
        if isinstance(base, dict):
            lt = base.get("logicalType")
            if lt == "date" and base.get("type") == "int":
                kind = "varint"  # days since epoch, zigzag varint
            elif lt in ("timestamp-micros", "local-timestamp-micros") and base.get(
                "type"
            ) == "long":
                kind = "varint"  # micros since epoch, zigzag varint
            else:
                return None
        elif base in ("long", "int"):
            kind = "varint"
        elif base in ("double", "float"):
            kind = base
        elif base in ("string", "bytes"):
            kind = "varlen"
        elif base == "boolean":
            kind = "boolean"
        else:
            return None
        out.append((f["name"], kind, nullable))
    return out


def _varint_matrix(z: "Any") -> tuple["Any", "Any"]:
    """Vectorized zigzag-varint: ``z`` (uint64 ndarray) → (flat uint8 buffer
    of 10-byte-per-value rows, per-value byte lengths). The first ``len``
    bytes of each 10-byte row are exactly what ``write_long`` emits."""
    import numpy as np

    n = len(z)
    shifts = (np.arange(10, dtype=np.uint64) * np.uint64(7))[None, :]
    b = ((z[:, None] >> shifts) & np.uint64(0x7F)).astype(np.uint8)
    nb = np.ones(n, dtype=np.int64)
    for i in range(1, 10):
        nb[z >= (np.uint64(1) << np.uint64(7 * i))] = i + 1
    cont = np.arange(10, dtype=np.int64)[None, :] < (nb[:, None] - 1)
    b |= cont.astype(np.uint8) << 7
    return np.ascontiguousarray(b).reshape(-1), nb


def _zigzag_np(v: "Any") -> "Any":
    """Signed int64 ndarray → unsigned zigzag space, elementwise."""
    import numpy as np

    u = v.astype(np.int64, copy=False)
    return (u.astype(np.uint64) << np.uint64(1)) ^ (u >> np.int64(63)).astype(
        np.uint64
    )


def _column_segments(arr: "Any", kind: str, nullable: bool, fname: str) -> list:
    """Encode one Arrow column as byte SEGMENTS: a list of
    ``(buf uint8[], starts int64[n], lens int64[n])`` — per row, the field's
    binary encoding is the concatenation of its segments' slices. Nullable
    fields lead with the union-branch byte and zero out value segments on
    null rows, matching ``_encoder``'s output byte for byte."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(arr)
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    isnull = np.zeros(n, dtype=bool)
    if arr.null_count:
        if not nullable:
            raise TypeError(
                f"field {fname!r} is non-nullable in the Avro schema but the "
                "column carries nulls"
            )
        isnull = np.asarray(arr.is_null())
    segs: list = []
    if nullable:
        branch = np.where(isnull, 0x00, 0x02).astype(np.uint8)
        segs.append((branch, np.arange(n, dtype=np.int64), np.ones(n, np.int64)))

    if kind == "varint":
        # date32 stores days, timestamps micros — both already the integers
        # the spec encodes; surface them as int64 before the varint matrix
        if pa.types.is_date32(arr.type):
            arr = arr.cast(pa.int32())
        elif pa.types.is_timestamp(arr.type):
            # the schema says micros — normalize the unit BEFORE the raw cast
            # (an ns-unit batch would otherwise encode nanos as micros).
            # safe=False: sub-microsecond ns values TRUNCATE, matching the
            # row path (datetime carries only micros), instead of raising
            arr = arr.cast(pa.timestamp("us", tz=arr.type.tz), safe=False).cast(
                pa.int64()
            )
        vals = np.asarray(pc.fill_null(arr.cast(pa.int64()), 0))
        buf, lens = _varint_matrix(_zigzag_np(vals))
        starts = np.arange(n, dtype=np.int64) * 10
    elif kind in ("double", "float"):
        width = 8 if kind == "double" else 4
        fill = pa.scalar(0.0, type=pa.float64() if kind == "double" else pa.float32())
        # explicit little-endian before the byte view — the row path packs
        # '<d'/'<f'; a native-endian view would emit swapped bytes on BE hosts
        vals = np.ascontiguousarray(np.asarray(pc.fill_null(arr, fill))).astype(
            "<f8" if kind == "double" else "<f4", copy=False
        )
        buf = vals.view(np.uint8)
        starts = np.arange(n, dtype=np.int64) * width
        lens = np.full(n, width, dtype=np.int64)
    elif kind == "boolean":
        vals = np.asarray(pc.fill_null(arr, False))
        buf = vals.astype(np.uint8)
        starts = np.arange(n, dtype=np.int64)
        lens = np.ones(n, dtype=np.int64)
    elif kind == "varlen":
        if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
            off_dtype = np.int64
        else:
            off_dtype = np.int32
        bufs = arr.buffers()
        offsets = np.frombuffer(bufs[1], dtype=off_dtype)[
            arr.offset : arr.offset + n + 1
        ].astype(np.int64)
        data = (
            np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None
            else np.zeros(0, dtype=np.uint8)
        )
        body_starts = offsets[:-1].copy()
        body_lens = np.diff(offsets)
        body_lens[isnull] = 0
        # length-prefix varint, then the utf-8/raw bytes
        pbuf, plens = _varint_matrix(_zigzag_np(body_lens))
        plens = plens.copy()
        plens[isnull] = 0
        segs.append((pbuf, np.arange(n, dtype=np.int64) * 10, plens))
        segs.append((data, body_starts, body_lens))
        return segs
    else:  # pragma: no cover — _vector_kinds gates the kinds
        raise TypeError(f"unsupported columnar kind {kind!r}")

    lens = lens.copy()
    lens[isnull] = 0
    segs.append((buf, starts, lens))
    return segs


def _flatten_segments(segs: list) -> tuple["Any", list]:
    """Concatenate all segment buffers ONCE into a single source array and
    rebase each segment's starts — done per table, not per block."""
    import numpy as np

    bufs = [s[0] for s in segs]
    src_all = np.concatenate(bufs) if len(bufs) > 1 else bufs[0]
    rebased = []
    acc = 0
    for (buf, starts, lens) in segs:
        rebased.append((starts + acc, lens))
        acc += len(buf)
    return src_all, rebased


def _gather_block(src_all: "Any", rebased: list, lo: int, hi: int) -> bytes:
    """Assemble rows [lo, hi) into one record-major byte payload (the
    uncompressed Avro block): for each row, each segment's slice in order —
    a single vectorized ragged gather."""
    import numpy as np

    starts = np.stack([s[lo:hi] for s, _l in rebased], axis=1)
    lens = np.stack([l[lo:hi] for _s, l in rebased], axis=1)
    lens_flat = np.ascontiguousarray(lens).reshape(-1)
    starts_flat = np.ascontiguousarray(starts).reshape(-1)
    total = int(lens_flat.sum())
    out_starts = np.zeros(len(lens_flat), dtype=np.int64)
    np.cumsum(lens_flat[:-1], out=out_starts[1:])
    idx = (
        np.repeat(starts_flat, lens_flat)
        + np.arange(total, dtype=np.int64)
        - np.repeat(out_starts, lens_flat)
    )
    return src_all[idx].tobytes()


def encode_container_arrow(
    schema: Any,
    table: "Any",
    codec: str = "deflate",
    sync: bytes | None = None,
    records_per_block: int = 4096,
) -> bytes | None:
    """Columnar twin of :func:`encode_container`: encode a ``pyarrow.Table``
    without materializing Python row objects (§4.2 — whole-column numpy ops
    instead of per-row closures). Byte-identical output by construction
    (test-pinned against the row path). Returns ``None`` when the schema has
    fields the columnar path does not cover — callers fall back to rows."""
    kinds = _vector_kinds(schema)
    if kinds is None:
        return None
    if codec not in _CODECS:
        raise ValueError(f"unsupported codec {codec!r} (supported: {_CODECS})")
    names = [f["name"] for f in schema["fields"]]
    if names != list(table.column_names):
        raise ValueError(
            f"avro_schema fields {names} must match table columns "
            f"{list(table.column_names)} in order"
        )
    segs: list = []
    for (fname, kind, nullable) in kinds:
        segs.extend(
            _column_segments(table.column(fname), kind, nullable, fname)
        )
    src_all, rebased = _flatten_segments(segs)
    n = table.num_rows
    blocks: list[tuple[int, bytes]] = []
    for i in range(0, n, records_per_block):
        j = min(i + records_per_block, n)
        payload = _gather_block(src_all, rebased, i, j)
        if codec == "deflate":
            co = zlib.compressobj(1, zlib.DEFLATED, -15)
            payload = co.compress(payload) + co.flush()
        blocks.append((j - i, payload))
    if sync is None:
        import hashlib

        h = hashlib.md5(json.dumps(schema).encode())
        for count, payload in blocks:
            frame = bytearray()
            write_long(frame, count)
            write_long(frame, len(payload))
            h.update(bytes(frame))
            h.update(payload)
        sync = h.digest()
    out = bytearray()
    _write_header(out, json.dumps(schema), codec, sync)
    for count, payload in blocks:
        write_long(out, count)
        write_long(out, len(payload))
        out.extend(payload)
        out.extend(sync)
    return bytes(out)


# --------------------------------------------------------------------------
# columnar (vectorized) decode — value-identical fast path for primitive rows
# --------------------------------------------------------------------------


class _NonMinimalBranch(Exception):
    """A union branch varint was not the minimal single byte (0x00/0x02).
    Our writer never emits that, but a foreign file legally could — the
    columnar scanner bails and the caller falls back to the row decoder,
    which accepts any varint form."""


def _scanner_source(kinds: list) -> str:
    """Generate the per-schema scanner source (§4.2: the byte-level varint
    scan stays Python — varints are sequentially data-dependent — but every
    byte is touched ONCE by one generated loop with no per-field closure
    dispatch and no per-row dict). Per field it appends, to per-column
    accumulators: decoded ints (varint kinds), value byte offsets
    (fixed-width kinds, -1 = null), or (start, len) pairs (varlen kinds,
    len -1 = null); numpy gathers materialize the columns afterwards."""
    unpack: list[str] = []
    for i, (_name, kind, _nul) in enumerate(kinds):
        unpack.extend((f"a{i}s", f"a{i}l") if kind == "varlen" else (f"a{i}",))
    lines = [
        "def _scan(buf, pos, n, accs):",
        f"    ({', '.join(unpack)},) = accs",
        "    for _ in range(n):",
    ]
    # inline varint VALUE decode — only varlen lengths need the value during
    # the scan (to advance past the body); other varints are decoded by the
    # numpy post-pass from their recorded offsets
    varlen_core = [
        "b = buf[pos]; pos += 1",
        "if b < 128:",
        "    z = b",
        "else:",
        "    z = b & 127",
        "    shift = 7",
        "    while True:",
        "        b = buf[pos]; pos += 1",
        "        z |= (b & 127) << shift",
        "        if b < 128:",
        "            break",
        "        shift += 7",
        "        if shift > 70:",
        "            raise ValueError("
        "'varint longer than 10 bytes — corrupt stream')",
    ]
    for i, (_name, kind, nullable) in enumerate(kinds):
        if kind == "varint":
            # record the start offset, advance past the continuation bytes —
            # no shifts, no int building: _varint_gather does that in numpy
            val = [
                f"a{i}(pos)",
                "while buf[pos] > 127:",
                "    pos += 1",
                "pos += 1",
            ]
            null_stmt = [f"a{i}(-1)"]
        elif kind in ("double", "float", "boolean"):
            width = {"double": 8, "float": 4, "boolean": 1}[kind]
            val = [f"a{i}(pos)", f"pos += {width}"]
            null_stmt = [f"a{i}(-1)"]
        else:  # varlen
            val = [
                *varlen_core,
                "ln = (z >> 1) ^ -(z & 1)",
                "if ln < 0:",
                "    raise ValueError("
                "'negative byte-length — corrupt stream')",
                f"a{i}s(pos); a{i}l(ln)",
                "pos += ln",
            ]
            null_stmt = [f"a{i}s(0); a{i}l(-1)"]
        if nullable:
            body = ["b = buf[pos]; pos += 1", "if b == 0:"]
            body += ["    " + s for s in null_stmt]
            body += ["elif b == 2:"]
            body += ["    " + s for s in val]
            body += ["else:", "    raise _NonMinimalBranch()"]
        else:
            body = val
        lines.extend("        " + s for s in body)
    lines.append("    return pos")
    return "\n".join(lines)


def _varint_gather(buf_np: "Any", offs: "Any") -> "Any":
    """Vectorized zigzag-varint decode: value start offsets (into a buffer
    padded with ≥10 trailing zero bytes) → int64 values. Active-set loop:
    byte k is gathered only for the values still carrying a continuation
    bit, so a column of 1-byte varints costs one 1-D gather and a column of
    8-byte timestamps eight — never a dense n×10 matrix."""
    import numpy as np

    b = buf_np[offs]
    z = (b & np.uint8(0x7F)).astype(np.uint64)
    active = np.nonzero(b >= 128)[0]
    step = 1
    while len(active):
        if step > 9:
            raise ValueError("varint longer than 10 bytes — corrupt stream")
        b = buf_np[offs[active] + step]
        z[active] |= (b & np.uint8(0x7F)).astype(np.uint64) << np.uint64(
            7 * step
        )
        active = active[b >= 128]
        step += 1
    return (
        (z >> np.uint64(1)) ^ (np.uint64(0) - (z & np.uint64(1)))
    ).view(np.int64)


_SCANNER_CACHE: dict[str, Any] = {}


def _decode_scanner(avro_schema: Any):
    """(scan function, kinds) for a primitive-only record schema, compiled
    once per schema per process (worker reuse keeps the cache warm across
    tasks), or ``None`` when the schema needs the row decoder."""
    kinds = _vector_kinds(avro_schema)
    if kinds is None:
        return None
    key = json.dumps(kinds)
    hit = _SCANNER_CACHE.get(key)
    if hit is None:
        ns: dict[str, Any] = {"_NonMinimalBranch": _NonMinimalBranch}
        exec(compile(_scanner_source(kinds), "<avro-scanner>", "exec"), ns)
        hit = (ns["_scan"], kinds)
        _SCANNER_CACHE[key] = hit
    return hit


def _default_arrow_types(avro_schema: Any) -> dict:
    """Field name → Arrow type straight from the Avro schema — used when the
    caller has no Spark-derived schema (tests, standalone decodes)."""
    import pyarrow as pa

    out = {}
    for f in avro_schema["fields"]:
        base, _nul = _strip_union(f["type"])
        if isinstance(base, dict):
            lt = base.get("logicalType")
            t = {
                "date": pa.date32(),
                "timestamp-micros": pa.timestamp("us", tz="UTC"),
                "local-timestamp-micros": pa.timestamp("us"),
            }[lt]
        else:
            t = {
                "long": pa.int64(),
                "int": pa.int32(),
                "double": pa.float64(),
                "float": pa.float32(),
                "string": pa.string(),
                "bytes": pa.binary(),
                "boolean": pa.bool_(),
            }[base]
        out[f["name"]] = t
    return out


def _blocks_to_columns(
    avro_schema: Any, blocks: list[tuple[int, bytes]], col_types: dict | None = None
) -> list | None:
    """Decode (count, decompressed payload) blocks into Arrow arrays, one per
    field, in schema order — or ``None`` when the schema (or a non-minimal
    branch varint) needs the row decoder. Value-identical to the row path by
    construction (test-pinned). Payloads are concatenated once so records
    are back-to-back and the numpy gathers run over a single buffer; the
    per-block byte-consumption check is preserved at each block boundary."""
    compiled = _decode_scanner(avro_schema)
    if compiled is None:
        return None
    scan, kinds = compiled
    import numpy as np
    import pyarrow as pa

    if col_types is None:
        col_types = _default_arrow_types(avro_schema)
    from array import array

    # array('q') accumulators: append cost matches a list's, but the numpy
    # view afterwards is a zero-copy frombuffer instead of a per-element scan
    accs: list = []
    appends: list = []
    for _name, kind, _nul in kinds:
        n_lists = 2 if kind == "varlen" else 1
        for _ in range(n_lists):
            acc = array("q")
            accs.append(acc)
            appends.append(acc.append)
    full = b"".join(p for _c, p in blocks)
    pos = 0
    cum = 0
    try:
        for count, payload in blocks:
            cum += len(payload)
            prev = pos
            pos = scan(full, pos, count, tuple(appends))
            if pos != cum:
                raise ValueError(
                    f"block decoded {pos - prev} of {len(payload)} bytes — "
                    "corrupt block"
                )
    except _NonMinimalBranch:
        return None
    # pad so the 10-byte varint gather window never reads past the end
    buf_np = np.frombuffer(full + b"\x00" * 10, dtype=np.uint8)
    arrays: list = []
    ai = 0
    for name, kind, _nul in kinds:
        t = col_types[name]
        if kind == "varint":
            offs = np.frombuffer(accs[ai], dtype=np.int64)
            ai += 1
            mask = offs < 0
            vals = _varint_gather(buf_np, np.where(mask, 0, offs))
            arr = pa.array(
                vals, type=pa.int64(), mask=mask if mask.any() else None
            )
            if pa.types.is_date32(t):
                # no direct int64→date32 cast; hop through int32 (checked)
                arr = arr.cast(pa.int32())
            arrays.append(arr.cast(t) if arr.type != t else arr)
        elif kind in ("double", "float", "boolean"):
            offs = np.frombuffer(accs[ai], dtype=np.int64)
            ai += 1
            mask = offs < 0
            safe = np.where(mask, 0, offs)
            if kind == "boolean":
                vals: Any = buf_np[safe] == 1
            else:
                width = 8 if kind == "double" else 4
                dt = "<f8" if kind == "double" else "<f4"
                idx = safe[:, None] + np.arange(width, dtype=np.int64)
                vals = buf_np[idx].view(dt).ravel()
            arrays.append(
                pa.array(vals, type=t, mask=mask if mask.any() else None)
            )
        else:  # varlen
            starts = np.frombuffer(accs[ai], dtype=np.int64)
            lens = np.frombuffer(accs[ai + 1], dtype=np.int64)
            ai += 2
            mask = lens < 0
            lens2 = np.where(mask, 0, lens)
            n = len(lens2)
            offsets = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(lens2, out=offsets[1:])
            total = int(offsets[-1])
            idx = (
                np.repeat(starts, lens2)
                + np.arange(total, dtype=np.int64)
                - np.repeat(offsets[:-1], lens2)
            )
            validity = None
            if mask.any():
                validity = pa.array(~mask).buffers()[1]
            arr = pa.Array.from_buffers(
                pa.large_binary(),
                n,
                [
                    validity,
                    pa.py_buffer(offsets.tobytes()),
                    pa.py_buffer(buf_np[idx].tobytes()),
                ],
            )
            if pa.types.is_string(t) or pa.types.is_large_string(t):
                # binary→string cast VALIDATES utf-8, matching the row
                # path's bytes.decode('utf-8') failure mode
                arr = arr.cast(pa.large_string())
            arrays.append(arr.cast(t) if arr.type != t else arr)
    return arrays


def decode_container_arrow(
    data: bytes, col_types: dict | None = None
) -> tuple[Any, int, list] | None:
    """Columnar twin of :func:`decode_container`: one whole container file →
    (avro schema dict, n_rows, Arrow arrays in field order) WITHOUT
    materializing Python row objects. ``None`` when the schema has fields
    the columnar path does not cover (maps/arrays/enums/fixed/decimal/nested
    records) — callers fall back to the row decoder."""
    schema, codec, sync, pos = read_header(data)
    blocks = list(_iter_blocks(data, pos, codec, sync))
    cols = _blocks_to_columns(schema, blocks, col_types)
    if cols is None:
        return None
    return schema, sum(c for c, _p in blocks), cols


# --------------------------------------------------------------------------
# sync-marker byte-range splits (one big container file → N parallel tasks)
# --------------------------------------------------------------------------


def _block_ok(buf, base: int, q: int, sync: bytes, ensure, size: int) -> bool:
    """True iff a well-formed block starts at absolute offset ``q``: sane
    count/size varints, in-file extent, and the trailing sync matches. This
    is what makes candidate sync positions self-correcting — the 16 sync
    bytes CAN occur inside a compressed payload by chance, but such a false
    match is followed by garbage varints or a wrong trailing marker."""
    try:
        ensure(q + 24)  # two varint longs are at most 20 bytes
        off = q - base
        count, off = read_long(buf, off)
        bsize, off = read_long(buf, off)
        if count < 0 or bsize < 0:
            return False
        end = base + off + bsize
        if end + SYNC_SIZE > size:
            return False
        ensure(end + SYNC_SIZE)
        return bytes(buf[end - base : end - base + SYNC_SIZE]) == sync
    except (IndexError, ValueError):
        return False


def read_container_range(path: str, lo: int, hi: int) -> tuple[Any, list[dict]]:
    """Decode the blocks of one container file that START in ``[lo, hi)`` —
    Hadoop input-split ownership: the task seeks to its range, scans forward
    to the first VALIDATED sync boundary, decodes owned blocks, and reads
    past ``hi`` only to finish the last owned block. Splitting any byte
    partition of ``[header_end, filesize)`` across calls yields every record
    exactly once. Returns (avro schema dict, rows)."""
    schema, blocks = _range_blocks(path, lo, hi)
    dec = _decoder(schema)
    rows: list[dict] = []
    for _count, payload in blocks:
        p = 0
        for _ in range(_count):
            row, p = dec(payload, p)
            rows.append(row)
        if p != len(payload):
            raise ValueError(
                f"block decoded {p} of {len(payload)} bytes — corrupt block"
            )
    return schema, rows


def _range_blocks(path: str, lo: int, hi: int) -> tuple[Any, list[tuple[int, bytes]]]:
    """Block walk behind :func:`read_container_range`: validate split
    ownership and sync markers, decompress, and return the owned blocks as
    (record_count, payload) WITHOUT decoding records — so the columnar and
    the row decoders share one split reader."""
    with open(path, "rb") as fh:
        head = fh.read(1 << 20)
        schema, codec, sync, header_end = read_header(head)
        if sync == b"\x00" * SYNC_SIZE:
            # A zero marker can collide with a zero run inside an
            # uncompressed payload and validate a spurious boundary —
            # refuse split ownership rather than risk double-decoding.
            raise ValueError(
                "container uses an all-zero sync marker — unsafe for "
                "byte-range split reads; re-read without split_bytes"
            )
        size = os.fstat(fh.fileno()).st_size
        lo = max(lo, header_end)
        if lo >= size or lo >= hi:
            return schema, []
        # include the 16 bytes before lo so a sync ENDING exactly at lo is
        # findable (its block starts at lo and is owned by this split)
        base = lo - SYNC_SIZE if lo > header_end else lo
        fh.seek(base)
        buf = bytearray(fh.read(hi - base))

        def ensure(upto_abs: int) -> None:
            while base + len(buf) < min(upto_abs, size):
                chunk = fh.read(
                    max(upto_abs - base - len(buf), 1 << 16)
                )
                if not chunk:
                    break
                buf.extend(chunk)

        if lo == header_end:
            q = lo  # first split: blocks start right after the header sync
        else:
            q = None
            search = 0
            while q is None:
                idx = buf.find(sync, search)
                if idx < 0 or base + idx + SYNC_SIZE >= hi:
                    return schema, []  # no owned block starts in this range
                cand = base + idx + SYNC_SIZE
                if _block_ok(buf, base, cand, sync, ensure, size):
                    q = cand
                else:
                    search = idx + 1
        blocks: list[tuple[int, bytes]] = []
        while q < hi and q < size:
            ensure(q + 24)
            off = q - base
            count, off = read_long(buf, off)
            bsize, off = read_long(buf, off)
            if count < 0 or bsize < 0 or base + off + bsize + SYNC_SIZE > size:
                raise ValueError(f"corrupt block header at offset {q}")
            ensure(base + off + bsize + SYNC_SIZE)
            payload = bytes(buf[off : off + bsize])
            marker = bytes(buf[off + bsize : off + bsize + SYNC_SIZE])
            if marker != sync:
                raise ValueError(
                    f"sync marker mismatch at offset {base + off + bsize} — "
                    "corrupt or misaligned Avro block"
                )
            if codec == "deflate":
                payload = zlib.decompress(payload, -15)
            blocks.append((count, payload))
            q = base + off + bsize + SYNC_SIZE
        return schema, blocks


def plan_avro_splits(path: str, split_bytes: int) -> list[tuple[str, int, int]]:
    """Driver-side split planning: per ``.avro`` file, byte ranges of
    ``split_bytes`` covering ``[header_end, filesize)``. Metadata-sized work
    (one header read + one stat per file)."""
    if split_bytes < 1:
        raise ValueError("split_bytes must be >= 1")
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".avro")
        )
        if not files:
            raise FileNotFoundError(f"no .avro files under {path}")
    else:
        files = [path]
    splits: list[tuple[str, int, int]] = []
    for fp in files:
        with open(fp, "rb") as fh:
            head = fh.read(1 << 20)
        _schema, _codec, _sync, header_end = read_header(head)
        size = os.path.getsize(fp)
        lo = header_end
        while lo < size:
            hi = min(lo + split_bytes, size)
            splits.append((fp, lo, hi))
            lo = hi
    return splits


# --------------------------------------------------------------------------
# distributed writer / reader
# --------------------------------------------------------------------------


def write_avro(
    df: DataFrame,
    path: str,
    codec: str = "deflate",
    records_per_block: int = 4096,
    avro_schema: Any | None = None,
) -> list[tuple[str, int, int]]:
    """Write ``df`` as Avro container files, one per non-empty partition,
    executor-side via ``mapInArrow`` (the driver never sees data rows, only
    the returned per-file (file, n_records, n_bytes) stats). The sync marker
    is content-addressed from the encoded block BYTES (see
    :func:`encode_container`) so writes are deterministic — retries of the
    same task produce identical bytes — yet unforgeable by record values.

    ``avro_schema`` overrides the derived schema, letting a write target
    Avro types Spark lacks: an ``enum`` field consumes a string column
    (values must be symbols), a ``fixed`` field a binary column of exactly
    its size — the field names must match ``df``'s columns."""
    import pyarrow as pa

    if codec not in _CODECS:
        raise ValueError(f"unsupported codec {codec!r} (supported: {_CODECS})")
    os.makedirs(path, exist_ok=True)
    if avro_schema is None:
        avro_schema = avro_schema_of_struct(df.schema)
    else:
        want = [f["name"] for f in avro_schema.get("fields", ())]
        if want != list(df.columns):
            raise ValueError(
                f"avro_schema fields {want} must match df columns "
                f"{list(df.columns)} in order"
            )
    schema_json = json.dumps(avro_schema)
    stats_arrow = pa.schema(
        [("file", pa.string()), ("n_records", pa.int64()), ("n_bytes", pa.int64())]
    )

    vectorizable = _vector_kinds(avro_schema) is not None

    def _write(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        data = None
        n_rows = 0
        if vectorizable:
            # primitive-only schema: encode whole Arrow columns with numpy
            # (§4.2) — byte-identical to the row path, no Python row objects
            blist = list(batches)
            if blist:
                tbl = pa.Table.from_batches(blist)
                n_rows = tbl.num_rows
                if n_rows:
                    data = encode_container_arrow(
                        avro_schema, tbl, codec=codec,
                        records_per_block=records_per_block,
                    )
        else:
            rows: list[dict] = []
            for batch in batches:
                rows.extend(batch.to_pylist())
            n_rows = len(rows)
            if rows:
                # sync=None → encode_container derives the marker from the
                # partition's own encoded bytes (content addressing); two
                # partitions with identical content share a marker, which is
                # harmless — separate files with separate headers
                data = encode_container(
                    avro_schema, rows, codec=codec,
                    records_per_block=records_per_block,
                )
        if data is not None:
            fname = os.path.join(path, f"part-{pid:05d}.avro")
            tmp = fname + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(data)
            os.replace(tmp, fname)  # atomic publish, the snapshot-layer habit
            yield pa.RecordBatch.from_pylist(
                [{"file": fname, "n_records": n_rows, "n_bytes": len(data)}],
                schema=stats_arrow,
            )

    stats = df.mapInArrow(
        _write, "file string, n_records bigint, n_bytes bigint"
    ).collect()
    return [(r["file"], r["n_records"], r["n_bytes"]) for r in stats]


def read_avro_schema(path: str) -> tuple[Any, T.DataType]:
    """Read ONE container header (metadata-sized IO, no data blocks) →
    (avro schema dict, Spark struct). ``path`` may be a file or a directory
    of ``.avro`` files."""
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".avro")
        )
        if not files:
            raise FileNotFoundError(f"no .avro files under {path}")
        path = files[0]
    with open(path, "rb") as fh:
        head = fh.read(1 << 20)  # headers are metadata-sized; 1 MiB is ample
    schema, _codec, _sync, _pos = read_header(head)
    return schema, spark_struct_of_avro(schema)


def read_avro(
    spark: SparkSession, path: str, split_bytes: int | None = None
) -> DataFrame:
    """Distributed Avro read: the schema comes from ONE header read on the
    driver; files load through Spark's native ``binaryFile`` source (so
    listing/scheduling scale like any file scan) and each file decodes
    executor-side in ``mapInArrow``, rebuilding typed Arrow columns directly
    — nulls stay nulls, timestamps/dates/decimals land as their Arrow types.

    Default parallelism is per-file (the bounded-size lake-file layout).
    ``split_bytes`` switches to SYNC-MARKER BYTE-RANGE SPLITS so one giant
    container file fans out over many tasks: the driver plans
    (file, lo, hi) ranges (:func:`plan_avro_splits`, metadata-sized), and
    each task decodes exactly the blocks starting in its range
    (:func:`read_container_range`). Results are identical either way —
    splits partition the block sequence."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    avro_schema, spark_struct = read_avro_schema(path)
    arrow_schema = to_arrow_schema(spark_struct)
    col_types = {f.name: f.type for f in arrow_schema}

    def _to_batch(rows: list[dict]) -> "pa.RecordBatch":
        arrays = [
            pa.array([r[f.name] for r in rows], type=col_types[f.name])
            for f in arrow_schema
        ]
        return pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)

    def _blocks_to_batch(schema: Any, blocks: list) -> "pa.RecordBatch":
        # columnar scan first (§4.2 — no Python row objects); row decoder
        # stays the fallback for complex types / non-minimal varints
        cols = _blocks_to_columns(schema, blocks, col_types)
        if cols is not None:
            return pa.RecordBatch.from_arrays(cols, schema=arrow_schema)
        dec = _decoder(schema)
        rows: list[dict] = []
        for count, payload in blocks:
            p = 0
            for _ in range(count):
                row, p = dec(payload, p)
                rows.append(row)
            if p != len(payload):
                raise ValueError(
                    f"block decoded {p} of {len(payload)} bytes — corrupt block"
                )
        return _to_batch(rows)

    if split_bytes is not None:
        splits = plan_avro_splits(path, split_bytes)
        if not splits:
            # header-only container (valid Avro, zero blocks):
            # repartition(0) would raise — return an empty frame instead
            return spark.createDataFrame([], spark_struct)

        def _read_ranges(
            batches: Iterator["pa.RecordBatch"],
        ) -> Iterator["pa.RecordBatch"]:
            for batch in batches:
                for r in batch.to_pylist():
                    schema_b, blocks = _range_blocks(
                        r["file"], r["lo"], r["hi"]
                    )
                    if blocks:
                        yield _blocks_to_batch(schema_b, blocks)

        split_df = spark.createDataFrame(
            splits, "file string, lo bigint, hi bigint"
        ).repartition(len(splits))  # one task per split
        return split_df.mapInArrow(_read_ranges, spark_struct)

    def _read(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            for filerow in batch.to_pylist():
                content = filerow["content"]
                schema_b, codec, sync, pos = read_header(content)
                blocks = list(_iter_blocks(content, pos, codec, sync))
                yield _blocks_to_batch(schema_b, blocks)

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(path)
        .select("content")
    )
    return files.mapInArrow(_read, spark_struct)
