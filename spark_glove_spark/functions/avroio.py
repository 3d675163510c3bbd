"""Avro Object Container File codec, from the public spec (Apache
Avro 1.11 specification, "Object Container Files" + "Binary Encoding"
sections) — the functions/jpeg.py discipline applied to the one ingest
format the environment's Spark build cannot read (the spark-avro
datasource jar is absent and there is no network to fetch it; the
pure-Python `avro`/`fastavro` packages are absent too, verified
empirically — PLANS.md "Environment limits").

Scope: the typed subset a Kafka-adjacent ingest lane actually ships —
records of {null, boolean, int, long, float, double, string, bytes}
fields, nullable via the standard ["null", T] union, plus the three
complex types that subset composes into (r13, VERDICT r12 missing-item
2): arrays of a primitive (`{"type": "array", "items": T}` — the
`embeddings` table's `list<float>` lane), string-keyed maps
(`{"type": "map", "values": T}`), and enums (symbols encoded as the
spec's int position). Field types are carried internally as compact
strings — `"array<float>"`, `"map<long>"`, `"enum<F|O|P>"`,
`"fixed<16>"`, `"decimal(12,2)"` — so the `_FIELDS` sidecar stays
plain JSON. Logical types (timestamp-micros, date, decimal) annotate
their primitives per the spec, unknown annotations fall back to the
raw type, and fixed carries exactly its size bytes unprefixed.
Nested records (r14, VERDICT r13 missing-item 4) are supported ONE
level deep — `"struct<lat:double,lon:double,label:string?>"` maps to
the spec's record-in-record with scalar members (`?` = the standard
["null", T] union), encoded as the concatenation of member encodings.
Deeper nesting (array of array, record in record in record, containers
inside a struct) stays out of scope and the schema parser REJECTS it
loudly (honest NotImplementedError, not silent misreads). Codecs:
`null` and `deflate`.

Wire format implemented here, byte for byte:
* int/long: zigzag then base-128 little-endian varint (high bit =
  continuation) — spec "Binary Encoding / Primitive Types".
* string/bytes: long length prefix + raw bytes (UTF-8 for string).
* float/double: 4/8-byte little-endian IEEE 754; boolean: one byte
  0/1; null: zero bytes; union: long branch index, then the value.
* array/map: a series of blocks, each a long item count then the
  items (map items = string key + value), terminated by a zero
  count; a negative count is followed by the block's byte size
  (readers honor both, this writer emits one positive block) — spec
  "Binary Encoding / Complex Types". enum: int position into the
  schema's symbol list.
* OCF: magic b"Obj\\x01"; file-metadata map (block count, key/value
  pairs, zero terminator) carrying avro.schema + avro.codec; a
  16-byte sync marker; then data blocks of (object count, byte size,
  payload, sync) — spec "Object Container Files". The deflate codec
  is RFC 1951 RAW deflate (no zlib header/checksum): zlib with
  wbits=-15 on both sides. The snappy codec (spec "Required Codecs /
  snappy") is the snappy BLOCK format followed by the 4-byte
  BIG-endian CRC32 of the UNCOMPRESSED block payload; the block
  format itself lives in functions/snappy.py (pure-Python, decoder
  complete for foreign files, writer emits spec-valid literal
  framing — deflate stays the compressing default).
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Iterable, Iterator

from spark_glove_spark.functions import snappy as _snappy

MAGIC = b"Obj\x01"
_CODECS = ("null", "deflate", "snappy")

# Spark simpleString type -> Avro primitive for the supported subset
SPARK_TO_AVRO = {
    "boolean": "boolean",
    "int": "int",
    "bigint": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "binary": "bytes",
}
AVRO_TO_SPARK = {v: k for k, v in SPARK_TO_AVRO.items()}


# Logical types (spec "Logical Types"): an annotation over a primitive
# wire type. Carried internally as their own compact strings; the wire
# bytes are exactly the underlying primitive's. decimal(p,s) is the
# parameterized member: bytes carrying the big-endian two's-complement
# UNSCALED integer (spec "decimal"), the exact-money type Kafka
# pipelines ship.
_LOGICAL = {
    "timestamp-micros": "long",  # micros since epoch UTC
    "date": "int",  # days since epoch
}


def _decimal_params(typ: str) -> tuple[int, int]:
    """('decimal(12,2)') -> (12, 2); raises on malformed."""
    p, s = typ[8:-1].split(",")
    return int(p), int(s)


def _split_depth0(s: str) -> list[str]:
    """Split on commas at bracket depth 0 — ``decimal(12,2)`` and
    future ``<>``-nested members keep their commas."""
    out, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(s[start:i])
            start = i + 1
    out.append(s[start:])
    return [p.strip() for p in out if p.strip()]


# Inner struct fields stay SCALAR (one nesting level — the shape real
# Kafka/event schemas ship; deeper nesting keeps the module's loud
# rejection). Everything write_value can encode without recursion into
# another container qualifies.
def _struct_scalar(typ: str) -> bool:
    return (
        typ in AVRO_TO_SPARK
        or typ in _LOGICAL
        or typ.startswith("decimal(")
        or typ.startswith("enum<")
        or typ.startswith("fixed<")
    )


def _struct_fields(typ: str) -> list[tuple[str, str, bool]]:
    """``struct<a:long,b:string?>`` -> [(name, compact_type, nullable)]
    — the ``?`` suffix marks a nullable (``["null", T]`` union) inner
    field. Rejects non-scalar inner types loudly (one level only)."""
    out = []
    for part in _split_depth0(typ[7:-1]):
        name, _, t = part.partition(":")
        name, t = name.strip(), t.strip()
        nullable = t.endswith("?")
        if nullable:
            t = t[:-1].strip()
        if not name or not t:
            raise NotImplementedError(f"struct member {part!r} malformed")
        if not _struct_scalar(t):
            raise NotImplementedError(
                f"struct member type {t!r} out of subset scope "
                "(one nesting level: scalar members only)"
            )
        out.append((name, t, nullable))
    if not out:
        raise NotImplementedError(f"empty struct type {typ!r}")
    return out


def spark_type_to_avro(t: str) -> str:
    """Spark simpleString -> this module's compact type string.
    ``array<float>`` -> ``"array<float>"``; ``map<string,bigint>`` ->
    ``"map<long>"`` (avro map keys are always strings); ``timestamp``
    / ``date`` -> the spec's logical types over long/int. Loud
    NotImplementedError outside the subset."""
    if t in ("timestamp", "timestamp_ntz"):
        # the repo reads parquet timestamps session-tz-pinned to UTC
        # (registry wrapper), so both spark types carry the same wall
        # micros — the logical type's epoch-UTC definition
        return "timestamp-micros"
    if t == "date":
        return "date"
    if t.startswith("decimal(") and t.endswith(")"):
        _decimal_params(t)  # validate
        return t
    if t in SPARK_TO_AVRO:
        return SPARK_TO_AVRO[t]
    if t.startswith("array<") and t.endswith(">"):
        inner = t[6:-1]
        if inner in SPARK_TO_AVRO:
            return f"array<{SPARK_TO_AVRO[inner]}>"
    if t.startswith("map<string,") and t.endswith(">"):
        inner = t[11:-1]
        if inner in SPARK_TO_AVRO:
            return f"map<{SPARK_TO_AVRO[inner]}>"
    if t.startswith("struct<") and t.endswith(">"):
        # Spark DDL carries no inner-field nullability, so members map
        # non-nullable; authored compact strings carry `?` directly
        members = []
        for part in _split_depth0(t[7:-1]):
            name, _, it = part.partition(":")
            members.append(f"{name.strip()}:{spark_type_to_avro(it.strip())}")
        compact = f"struct<{','.join(members)}>"
        _struct_fields(compact)  # validate (scalar members, one level)
        return compact
    raise NotImplementedError(f"spark type {t!r} not avro-mappable")


def avro_type_to_spark(typ: str) -> str:
    """Compact type string -> Spark DDL type."""
    if typ == "timestamp-micros":
        return "timestamp"
    if typ == "date":
        return "date"
    if typ.startswith("decimal("):
        return typ  # spark DDL spells decimal(p,s) identically
    if typ in AVRO_TO_SPARK:
        return AVRO_TO_SPARK[typ]
    if typ.startswith("array<") and typ.endswith(">"):
        inner = typ[6:-1]
        if inner not in AVRO_TO_SPARK:
            # ADVICE r13: guard the inner lookup — a foreign _FIELDS
            # sidecar with array<array<long>> must hit the module's
            # reject-loudly convention, not a bare KeyError
            raise NotImplementedError(
                f"avro type {typ!r} out of subset scope"
            )
        return f"array<{AVRO_TO_SPARK[inner]}>"
    if typ.startswith("map<") and typ.endswith(">"):
        inner = typ[4:-1]
        if inner not in AVRO_TO_SPARK:
            raise NotImplementedError(
                f"avro type {typ!r} out of subset scope"
            )
        return f"map<string,{AVRO_TO_SPARK[inner]}>"
    if typ.startswith("struct<") and typ.endswith(">"):
        inner = ", ".join(
            f"{n}: {avro_type_to_spark(t)}"
            for n, t, _ in _struct_fields(typ)
        )
        return f"struct<{inner}>"
    if typ.startswith("enum<") and typ.endswith(">"):
        return "string"  # enums surface as their symbol strings
    if typ.startswith("fixed<") and typ.endswith(">"):
        return "binary"  # fixed surfaces as plain bytes
    raise NotImplementedError(f"avro type {typ!r} out of subset scope")


def _enum_symbols(typ: str) -> list[str]:
    return typ[5:-1].split("|")


# --- primitive binary encoding -------------------------------------------


def write_long(buf: io.BytesIO, n: int) -> None:
    """Zigzag + base-128 varint (spec: <<1 ^ >>63 for 64-bit two's
    complement; Python ints are unbounded, so mask to 64 bits)."""
    z = ((n << 1) ^ (n >> 63)) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def read_long(buf) -> int:
    shift, acc = 0, 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise EOFError("varint truncated")
        b = raw[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("varint too long for a 64-bit value")
    # un-zigzag back into signed 64-bit space
    n = (acc >> 1) ^ -(acc & 1)
    return n


def write_value(buf: io.BytesIO, typ: str, nullable: bool, v) -> None:
    if nullable:
        if v is None:
            write_long(buf, 0)  # union branch 0 = "null"
            return
        write_long(buf, 1)  # union branch 1 = the value type
    elif v is None:
        raise ValueError(f"null in non-nullable {typ} field")
    if typ.startswith("decimal("):
        import decimal as _dec

        prec, scale = _decimal_params(typ)
        d = _dec.Decimal(v)
        unscaled = int(d.scaleb(scale))
        if _dec.Decimal(unscaled).scaleb(-scale) != d:
            raise ValueError(f"value {v} not exact at scale {scale}")
        if len(str(abs(unscaled))) > prec:
            raise ValueError(f"value {v} exceeds precision {prec}")
        # spec: bytes of the big-endian two's-complement unscaled int
        nbytes = max(1, (unscaled.bit_length() + 8) // 8)
        write_value(
            buf, "bytes", False, unscaled.to_bytes(nbytes, "big", signed=True)
        )
    elif typ == "timestamp-micros":
        import datetime as _dt

        if isinstance(v, _dt.datetime):
            # ADVICE r13: an AWARE datetime converts to UTC explicitly
            # (the spec's epoch-UTC micros) instead of silently
            # encoding local wall-clock; naive datetimes keep riding
            # the session-tz-pinned-to-UTC convention
            if v.tzinfo is not None:
                v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            td = v - _dt.datetime(1970, 1, 1)
            v = (
                td.days * 86_400_000_000
                + td.seconds * 1_000_000
                + td.microseconds
            )
        write_long(buf, int(v))
    elif typ == "date":
        import datetime as _dt

        if isinstance(v, _dt.date):
            v = v.toordinal() - _dt.date(1970, 1, 1).toordinal()
        write_value(buf, "int", False, v)
    elif typ == "int":
        v = int(v)
        # ADVICE r12: 'int' is a 32-bit type in the spec even though
        # the varint wire form is unbounded — reject out-of-range
        # loudly instead of emitting a container strict readers call
        # an int overflow.
        if not -(2**31) <= v < 2**31:
            raise ValueError(f"value {v} out of range for avro int")
        write_long(buf, v)
    elif typ == "long":
        write_long(buf, int(v))
    elif typ == "double":
        buf.write(struct.pack("<d", float(v)))
    elif typ == "float":
        buf.write(struct.pack("<f", float(v)))
    elif typ == "string":
        raw = v.encode("utf-8")
        write_long(buf, len(raw))
        buf.write(raw)
    elif typ == "bytes":
        raw = bytes(v)
        write_long(buf, len(raw))
        buf.write(raw)
    elif typ == "boolean":
        buf.write(b"\x01" if v else b"\x00")
    elif typ.startswith("array<"):
        inner = typ[6:-1]
        items = list(v)
        if items:
            write_long(buf, len(items))
            for item in items:
                if item is None:
                    raise ValueError("null array item outside subset scope")
                write_value(buf, inner, False, item)
        write_long(buf, 0)  # block terminator
    elif typ.startswith("map<"):
        inner = typ[4:-1]
        entries = sorted(v.items())  # deterministic bytes for replay
        if entries:
            write_long(buf, len(entries))
            for k, item in entries:
                if item is None:
                    raise ValueError("null map value outside subset scope")
                write_value(buf, "string", False, k)
                write_value(buf, inner, False, item)
        write_long(buf, 0)
    elif typ.startswith("struct<"):
        # spec "Binary Encoding / Complex Types": a record encodes as
        # the concatenation of its field encodings, no length or tag
        members = _struct_fields(typ)
        if isinstance(v, dict):
            vals = [v.get(n) for n, _, _ in members]
        elif hasattr(v, "asDict"):  # pyspark Row
            d = v.asDict()
            vals = [d.get(n) for n, _, _ in members]
        else:
            vals = list(v)
            if len(vals) != len(members):
                raise ValueError(
                    f"struct value has {len(vals)} members, "
                    f"schema has {len(members)}"
                )
        for (name, it, inl), item in zip(members, vals):
            write_value(buf, it, inl, item)
    elif typ.startswith("enum<"):
        syms = _enum_symbols(typ)
        try:
            write_long(buf, syms.index(v))
        except ValueError:
            raise ValueError(f"value {v!r} not in enum symbols {syms}")
    elif typ.startswith("fixed<"):
        size = int(typ[6:-1])
        raw = bytes(v)
        if len(raw) != size:
            raise ValueError(f"fixed({size}) value has {len(raw)} bytes")
        buf.write(raw)  # spec: exactly size bytes, NO length prefix
    else:
        raise NotImplementedError(f"avro type {typ!r} out of subset scope")


def read_value(buf, typ: str, nullable: bool):
    if nullable:
        branch = read_long(buf)
        if branch == 0:
            return None
        if branch != 1:
            raise ValueError(f"union branch {branch} outside ['null', T]")
    if typ.startswith("decimal("):
        import decimal as _dec

        raw = read_value(buf, "bytes", False)
        _, scale = _decimal_params(typ)
        return _dec.Decimal(
            int.from_bytes(raw, "big", signed=True)
        ).scaleb(-scale)
    if typ == "timestamp-micros":
        import datetime as _dt

        return _dt.datetime(1970, 1, 1) + _dt.timedelta(
            microseconds=read_long(buf)
        )
    if typ == "date":
        import datetime as _dt

        return _dt.date.fromordinal(
            _dt.date(1970, 1, 1).toordinal() + read_value(buf, "int", False)
        )
    if typ == "long":
        return read_long(buf)
    if typ == "int":
        n = read_long(buf)
        # symmetric with the write-side bound: a spec-violating
        # container must fail at the codec, not deep in Arrow
        if not -(2**31) <= n < 2**31:
            raise ValueError(f"value {n} out of range for avro int")
        return n
    if typ == "double":
        raw = buf.read(8)
        if len(raw) != 8:
            raise EOFError("double body truncated")
        return struct.unpack("<d", raw)[0]
    if typ == "float":
        raw = buf.read(4)
        if len(raw) != 4:
            raise EOFError("float body truncated")
        return struct.unpack("<f", raw)[0]
    if typ in ("string", "bytes"):
        n = read_long(buf)
        if n < 0:  # read(-1) would return the block tail as "data"
            raise ValueError(f"negative {typ} length {n}")
        raw = buf.read(n)
        if len(raw) != n:
            raise EOFError("bytes body truncated")
        return raw.decode("utf-8") if typ == "string" else raw
    if typ == "boolean":
        # ADVICE r12: a truncated block used to read as False; keep
        # the module-wide reject-loudly contract instead.
        raw = buf.read(1)
        if not raw:
            raise EOFError("boolean body truncated")
        if raw not in (b"\x00", b"\x01"):
            raise ValueError(f"boolean byte {raw!r} outside 0/1")
        return raw == b"\x01"
    if typ.startswith("array<"):
        inner = typ[6:-1]
        out = []
        while True:
            count = read_long(buf)
            if count == 0:
                return out
            if count < 0:  # spec: negative count, then block byte size
                count = -count
                read_long(buf)
            for _ in range(count):
                out.append(read_value(buf, inner, False))
    if typ.startswith("map<"):
        inner = typ[4:-1]
        out = {}
        while True:
            count = read_long(buf)
            if count == 0:
                return out
            if count < 0:
                count = -count
                read_long(buf)
            for _ in range(count):
                k = read_value(buf, "string", False)
                out[k] = read_value(buf, inner, False)
    if typ.startswith("fixed<"):
        size = int(typ[6:-1])
        raw = buf.read(size)
        if len(raw) != size:
            raise EOFError(f"fixed({size}) body truncated")
        return raw
    if typ.startswith("struct<"):
        return tuple(
            read_value(buf, it, inl) for _, it, inl in _struct_fields(typ)
        )
    if typ.startswith("enum<"):
        syms = _enum_symbols(typ)
        i = read_long(buf)
        if not 0 <= i < len(syms):
            raise ValueError(f"enum index {i} outside {len(syms)} symbols")
        return syms[i]
    raise NotImplementedError(f"avro type {typ!r} out of subset scope")


# --- schema subset --------------------------------------------------------


def _type_json(typ: str, field_name: str):
    """Compact type string -> the spec's schema-JSON type node."""
    if typ in _LOGICAL:
        return {"type": _LOGICAL[typ], "logicalType": typ}
    if typ.startswith("decimal("):
        prec, scale = _decimal_params(typ)
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": prec,
            "scale": scale,
        }
    if typ in AVRO_TO_SPARK:
        return typ
    if typ.startswith("array<") and typ.endswith(">"):
        inner = typ[6:-1]
        if inner in AVRO_TO_SPARK:
            return {"type": "array", "items": inner}
    if typ.startswith("map<") and typ.endswith(">"):
        inner = typ[4:-1]
        if inner in AVRO_TO_SPARK:
            return {"type": "map", "values": inner}
    if typ.startswith("fixed<") and typ.endswith(">"):
        return {
            "type": "fixed",
            "name": f"{field_name}_fixed",
            "size": int(typ[6:-1]),
        }
    if typ.startswith("enum<") and typ.endswith(">"):
        return {
            "type": "enum",
            "name": f"{field_name}_enum",
            "symbols": _enum_symbols(typ),
        }
    if typ.startswith("struct<") and typ.endswith(">"):
        return {
            "type": "record",
            "name": f"{field_name}_rec",
            "fields": [
                {
                    "name": n,
                    "type": ["null", _type_json(t, f"{field_name}_{n}")]
                    if nl
                    else _type_json(t, f"{field_name}_{n}"),
                }
                for n, t, nl in _struct_fields(typ)
            ],
        }
    raise NotImplementedError(f"avro type {typ!r} out of subset scope")


def _type_compact(t, where: str, depth: int = 0) -> str:
    """Schema-JSON type node -> compact type string; rejects loudly
    outside the subset (complex types nested beyond one record
    level). ``depth`` > 0 means we are already inside a nested record,
    where only scalar members are in scope."""
    if isinstance(t, str):
        if t in AVRO_TO_SPARK:
            return t
        raise NotImplementedError(f"avro type {t!r} out of scope ({where})")
    if isinstance(t, dict):
        kind = t.get("type")
        lt = t.get("logicalType")
        if lt is not None:
            # a KNOWN logical type must ride its prescribed primitive;
            # an unknown one falls back to the raw type per the spec
            if lt == "decimal":
                if (
                    kind == "bytes"
                    and isinstance(t.get("precision"), int)
                    and isinstance(t.get("scale"), int)
                    and 0 < t["precision"]
                    and 0 <= t["scale"] <= t["precision"]
                ):
                    return f"decimal({t['precision']},{t['scale']})"
                raise NotImplementedError(
                    f"decimal node {t!r} out of scope ({where})"
                )
            if lt in _LOGICAL:
                if kind != _LOGICAL[lt]:
                    raise NotImplementedError(
                        f"logicalType {lt!r} over {kind!r} (expected "
                        f"{_LOGICAL[lt]!r}) out of scope ({where})"
                    )
                return lt
            if isinstance(kind, str) and kind in AVRO_TO_SPARK:
                return kind  # spec: ignore unknown logical types
        if kind == "array" and isinstance(t.get("items"), str) \
                and t["items"] in AVRO_TO_SPARK:
            return f"array<{t['items']}>"
        if kind == "map" and isinstance(t.get("values"), str) \
                and t["values"] in AVRO_TO_SPARK:
            return f"map<{t['values']}>"
        if kind == "fixed" and isinstance(t.get("size"), int) \
                and t["size"] > 0:
            return f"fixed<{t['size']}>"
        if kind == "enum":
            syms = t.get("symbols", [])
            if syms and all(
                isinstance(s, str) and s and "|" not in s for s in syms
            ):
                return f"enum<{'|'.join(syms)}>"
        if kind == "record" and depth == 0:
            members = []
            for f in t.get("fields", []):
                ft, nl = f.get("type"), False
                if isinstance(ft, list):
                    if len(ft) != 2 or ft[0] != "null":
                        raise NotImplementedError(
                            f"union {ft!r} beyond ['null', T] ({where})"
                        )
                    ft, nl = ft[1], True
                it = _type_compact(ft, f"{where}.{f.get('name')}", depth + 1)
                if not _struct_scalar(it):
                    raise NotImplementedError(
                        f"nested record member {it!r} out of subset "
                        f"scope ({where}.{f.get('name')})"
                    )
                members.append(f"{f['name']}:{it}{'?' if nl else ''}")
            if members:
                return f"struct<{','.join(members)}>"
        raise NotImplementedError(f"schema node {t!r} out of scope ({where})")
    raise NotImplementedError(f"schema node {t!r} out of scope ({where})")


def schema_json(fields: list[tuple[str, str, bool]], name: str = "row") -> str:
    """Avro record schema JSON for [(name, avro_type, nullable)]."""
    return json.dumps(
        {
            "type": "record",
            "name": name,
            "fields": [
                {
                    "name": n,
                    "type": ["null", _type_json(t, n)]
                    if nl
                    else _type_json(t, n),
                }
                for n, t, nl in fields
            ],
        }
    )


def parse_schema(text: str) -> list[tuple[str, str, bool]]:
    """Inverse of :func:`schema_json`; rejects anything outside the
    supported subset instead of misreading it."""
    sch = json.loads(text)
    if sch.get("type") != "record":
        raise NotImplementedError(f"top-level {sch.get('type')!r} unsupported")
    out = []
    for f in sch["fields"]:
        t = f["type"]
        if isinstance(t, list):
            if len(t) != 2 or t[0] != "null":
                raise NotImplementedError(f"union {t!r} beyond ['null', T]")
            out.append((f["name"], _type_compact(t[1], f["name"]), True))
        else:
            out.append((f["name"], _type_compact(t, f["name"]), False))
    return out


# --- object container file ------------------------------------------------


def _sync_for(seed: str) -> bytes:
    """Deterministic 16-byte sync marker (md5 of the seed): replayable
    writes produce byte-identical files, the repo's determinism rule."""
    import hashlib

    return hashlib.md5(f"sgs-avro-sync|{seed}".encode()).digest()


def write_ocf(
    path: str,
    rows: Iterable[tuple],
    fields: list[tuple[str, str, bool]],
    codec: str = "deflate",
    block_rows: int = 4096,
) -> int:
    """Write an OCF at ``path``; returns the row count. Rows are
    tuples in field order."""
    if codec not in _CODECS:
        raise NotImplementedError(f"codec {codec!r}; supported: {_CODECS}")
    sync = _sync_for(path)
    total = 0
    with open(path, "wb") as f:
        f.write(MAGIC)
        meta = {
            "avro.schema": schema_json(fields).encode(),
            "avro.codec": codec.encode(),
        }
        head = io.BytesIO()
        write_long(head, len(meta))
        for k, v in sorted(meta.items()):
            write_value(head, "string", False, k)
            write_value(head, "bytes", False, v)
        write_long(head, 0)  # map terminator
        f.write(head.getvalue())
        f.write(sync)

        batch: list[tuple] = []

        def flush() -> None:
            nonlocal total
            if not batch:
                return
            body = io.BytesIO()
            for row in batch:
                for (name, typ, nullable), v in zip(fields, row):
                    write_value(body, typ, nullable, v)
            payload = body.getvalue()
            if codec == "deflate":
                co = zlib.compressobj(9, zlib.DEFLATED, -15)  # RFC1951 raw
                payload = co.compress(payload) + co.flush()
            elif codec == "snappy":
                # spec: snappy block + 4-byte big-endian CRC32 of the
                # UNCOMPRESSED data
                crc = zlib.crc32(payload) & 0xFFFFFFFF
                payload = _snappy.compress(payload) + crc.to_bytes(4, "big")
            blk = io.BytesIO()
            write_long(blk, len(batch))
            write_long(blk, len(payload))
            f.write(blk.getvalue())
            f.write(payload)
            f.write(sync)
            total += len(batch)
            batch.clear()

        for row in rows:
            batch.append(row)
            if len(batch) >= block_rows:
                flush()
        flush()
    return total


def read_header(f) -> tuple[list[tuple[str, str, bool]], str, bytes]:
    """(fields, codec, sync) from an open OCF."""
    if f.read(4) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta: dict[str, bytes] = {}
    while True:
        n = read_long(f)
        if n == 0:
            break
        if n < 0:  # spec: negative count is followed by a byte size
            n = -n
            read_long(f)
        for _ in range(n):
            k = read_value(f, "string", False)
            meta[k] = read_value(f, "bytes", False)
    fields = parse_schema(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in _CODECS:
        raise NotImplementedError(f"codec {codec!r}; supported: {_CODECS}")
    sync = f.read(16)
    if len(sync) != 16:
        raise EOFError("header sync marker truncated")
    return fields, codec, sync


def read_ocf(path: str) -> tuple[list[tuple[str, str, bool]], Iterator[tuple]]:
    """(fields, row iterator) for an OCF written by any spec-compliant
    writer within the supported subset."""
    f = open(path, "rb")
    fields, codec, sync = read_header(f)

    def rows() -> Iterator[tuple]:
        with f:
            while True:
                first = f.read(1)
                if not first:
                    return
                # re-feed the first byte of the block's count varint
                count = read_long(_Prefixed(first, f))
                size = read_long(f)
                payload = f.read(size)
                if len(payload) != size:
                    raise EOFError("block payload truncated")
                if codec == "deflate":
                    payload = zlib.decompress(payload, wbits=-15)
                elif codec == "snappy":
                    if size < 4:
                        raise ValueError("snappy block too short for CRC")
                    comp, tail = payload[:-4], payload[-4:]
                    payload = _snappy.decompress(comp)
                    if zlib.crc32(payload) & 0xFFFFFFFF != int.from_bytes(
                        tail, "big"
                    ):
                        raise ValueError(
                            "snappy CRC mismatch (corrupt block)"
                        )
                if f.read(16) != sync:
                    raise ValueError("sync marker mismatch (corrupt block)")
                body = io.BytesIO(payload)
                for _ in range(count):
                    yield tuple(
                        read_value(body, t, nl) for _, t, nl in fields
                    )
                if body.read(1):
                    raise ValueError("block decoded short of its byte size")

    return fields, rows()


class _Prefixed:
    """One pushed-back byte in front of a file object (the block-count
    varint's first byte doubles as the EOF probe)."""

    def __init__(self, first: bytes, f) -> None:
        self._first, self._f = first, f

    def read(self, n: int):
        if self._first:
            b, self._first = self._first, b""
            return b + (self._f.read(n - 1) if n > 1 else b"")
        return self._f.read(n)
