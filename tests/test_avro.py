"""From-spec Avro OCF codec teeth (functions/avroio.py) + the
datasource roundtrip guards. No reference implementation exists in
this environment (no spark-avro jar, no avro/fastavro packages), so
the spec itself is the oracle: the varint/zigzag vectors below are
the worked examples from the public Avro specification's "Binary
Encoding" section, and structural invariants (magic, sync markers,
block accounting, RFC 1951 payloads) are asserted byte-level."""

from __future__ import annotations

import io
import math
import os
import struct
import zlib

import pytest

from spark_glove_spark.functions import avroio


def _enc_long(n: int) -> bytes:
    buf = io.BytesIO()
    avroio.write_long(buf, n)
    return buf.getvalue()


def test_zigzag_varint_spec_vectors():
    """The spec's own table: 0->00, -1->01, 1->02, -2->03, 2->04,
    -64->7f, 64->80 01."""
    assert _enc_long(0) == bytes.fromhex("00")
    assert _enc_long(-1) == bytes.fromhex("01")
    assert _enc_long(1) == bytes.fromhex("02")
    assert _enc_long(-2) == bytes.fromhex("03")
    assert _enc_long(2) == bytes.fromhex("04")
    assert _enc_long(-64) == bytes.fromhex("7f")
    assert _enc_long(64) == bytes.fromhex("8001")


def test_long_roundtrip_extremes():
    for n in (0, 1, -1, 127, -128, 2**31 - 1, -(2**31), 2**62, -(2**63),
              2**63 - 1):
        assert avroio.read_long(io.BytesIO(_enc_long(n))) == n


def test_value_roundtrip_all_types():
    cases = [
        ("long", False, 42),
        ("int", False, -7),
        ("double", False, math.pi),
        ("string", False, "héllo ✓"),
        ("bytes", False, b"\x00\xff\x80"),
        ("boolean", False, True),
        ("boolean", False, False),
        ("string", True, None),
        ("string", True, "present"),
        ("long", True, None),
        ("long", True, -99),
    ]
    for typ, nullable, v in cases:
        buf = io.BytesIO()
        avroio.write_value(buf, typ, nullable, v)
        assert avroio.read_value(io.BytesIO(buf.getvalue()), typ, nullable) == v


def test_double_is_ieee754_little_endian():
    buf = io.BytesIO()
    avroio.write_value(buf, "double", False, 1.5)
    assert buf.getvalue() == struct.pack("<d", 1.5)


def test_schema_roundtrip_and_scope_guard():
    fields = [("k", "long", False), ("v", "string", True), ("p", "double", False)]
    assert avroio.parse_schema(avroio.schema_json(fields)) == fields
    # r13: arrays of a primitive are now IN scope (VERDICT r12 item 3)
    assert avroio.parse_schema(
        '{"type":"record","name":"r","fields":'
        '[{"name":"a","type":{"type":"array","items":"long"}}]}'
    ) == [("a", "array<long>", False)]
    # ... but recursive nesting stays a loud scope guard
    with pytest.raises(NotImplementedError):
        avroio.parse_schema(
            '{"type":"record","name":"r","fields":[{"name":"a","type":'
            '{"type":"array","items":{"type":"array","items":"long"}}}]}'
        )
    with pytest.raises(NotImplementedError):
        avroio.parse_schema('{"type":"record","name":"r","fields":'
                            '[{"name":"a","type":["string","long"]}]}')


def test_complex_schema_roundtrip():
    """array/map/enum survive schema_json -> parse_schema, including
    inside the ['null', T] union, and emit the spec's JSON nodes."""
    import json

    fields = [
        ("emb", "array<float>", True),
        ("attrs", "map<long>", False),
        ("st", "enum<F|O|P>", False),
    ]
    text = avroio.schema_json(fields)
    assert avroio.parse_schema(text) == fields
    node = json.loads(text)["fields"]
    assert node[0]["type"] == ["null", {"type": "array", "items": "float"}]
    assert node[1]["type"] == {"type": "map", "values": "long"}
    assert node[2]["type"] == {
        "type": "enum", "name": "st_enum", "symbols": ["F", "O", "P"],
    }


def test_float_is_ieee754_little_endian():
    buf = io.BytesIO()
    avroio.write_value(buf, "float", False, 1.5)
    assert buf.getvalue() == struct.pack("<f", 1.5)


def test_complex_value_roundtrip():
    cases = [
        ("array<float>", False, [0.5, -1.25, 3.0]),
        ("array<long>", False, []),
        ("array<string>", True, None),
        ("array<double>", True, [1e-9, -0.0]),
        ("map<long>", False, {"a": 7, "b": -2}),
        ("map<string>", False, {}),
        ("map<double>", True, None),
        ("enum<F|O|P>", False, "P"),
        ("enum<F|O|P>", True, None),
    ]
    for typ, nullable, v in cases:
        buf = io.BytesIO()
        avroio.write_value(buf, typ, nullable, v)
        got = avroio.read_value(io.BytesIO(buf.getvalue()), typ, nullable)
        assert got == v, (typ, v, got)


def test_array_wire_form_is_spec_blocks():
    """Spec worked form: [10, 20] as array<long> = count 2 (zigzag 04),
    items 14 28 (zigzag of 10, 20), terminator 00."""
    buf = io.BytesIO()
    avroio.write_value(buf, "array<long>", False, [10, 20])
    assert buf.getvalue() == bytes.fromhex("04 14 28 00".replace(" ", ""))
    # readers also honor the negative-count + byte-size block form
    alt = io.BytesIO()
    avroio.write_long(alt, -2)
    avroio.write_long(alt, 2)  # block byte size
    avroio.write_long(alt, 10)
    avroio.write_long(alt, 20)
    avroio.write_long(alt, 0)
    assert avroio.read_value(
        io.BytesIO(alt.getvalue()), "array<long>", False
    ) == [10, 20]


def test_enum_wire_form_is_symbol_position():
    buf = io.BytesIO()
    avroio.write_value(buf, "enum<F|O|P>", False, "P")
    assert buf.getvalue() == bytes.fromhex("04")  # zigzag(2)
    with pytest.raises(ValueError, match="not in enum symbols"):
        avroio.write_value(io.BytesIO(), "enum<F|O|P>", False, "Z")
    with pytest.raises(ValueError, match="enum index"):
        avroio.read_value(io.BytesIO(b"\x08"), "enum<F|O|P>", False)


def test_int_range_and_boolean_reject_loudly():
    """ADVICE r12: avro 'int' is 32-bit (reject overflow at write);
    a truncated or non-0/1 boolean byte raises instead of reading
    False."""
    with pytest.raises(ValueError, match="avro int"):
        avroio.write_value(io.BytesIO(), "int", False, 2**31)
    with pytest.raises(ValueError, match="avro int"):
        avroio.write_value(io.BytesIO(), "int", False, -(2**31) - 1)
    buf = io.BytesIO()
    avroio.write_value(buf, "int", False, -(2**31))  # boundary is legal
    assert avroio.read_value(io.BytesIO(buf.getvalue()), "int", False) == -(2**31)
    with pytest.raises(EOFError):
        avroio.read_value(io.BytesIO(b""), "boolean", False)
    with pytest.raises(ValueError, match="outside 0/1"):
        avroio.read_value(io.BytesIO(b"\x02"), "boolean", False)


def test_spark_type_mapping_complex():
    assert avroio.spark_type_to_avro("array<float>") == "array<float>"
    assert avroio.spark_type_to_avro("map<string,bigint>") == "map<long>"
    assert avroio.avro_type_to_spark("array<double>") == "array<double>"
    assert avroio.avro_type_to_spark("map<long>") == "map<string,bigint>"
    assert avroio.avro_type_to_spark("enum<F|O>") == "string"
    with pytest.raises(NotImplementedError):
        avroio.spark_type_to_avro("array<array<float>>")
    with pytest.raises(NotImplementedError):
        avroio.spark_type_to_avro("map<bigint,bigint>")  # non-string keys


def test_resolution_rejects_type_change(tmp_path):
    """ADVICE r12: a name match whose type change is NOT in the
    spec's promotion table (here long -> int, a narrowing) must raise
    loudly instead of flowing wrongly-typed values into Spark."""
    from spark_glove_spark.operators.avro_queries import _resolved_rows

    p = str(tmp_path / "g1.avro")
    avroio.write_ocf(p, [(1, "x")], [("k", "long", False), ("v", "string", False)])
    with pytest.raises(NotImplementedError, match="promotion"):
        list(_resolved_rows(p, [("k", "int", False), ("v", "string", False)]))
    # unchanged types still resolve (drop v, add nullable tag)
    out = list(_resolved_rows(p, [("k", "long", False), ("tag", "string", True)]))
    assert out == [(1, None)]


def test_resolution_promotes_along_the_spec_table(tmp_path):
    """Spec "Schema Resolution": int->long/double, float->double,
    string<->bytes promote with exact values; the fast path must not
    skip conversion when names align but types differ."""
    from spark_glove_spark.operators.avro_queries import _resolved_rows

    p = str(tmp_path / "g2.avro")
    avroio.write_ocf(
        p,
        [(7, 1.5, "ab", None), (8, -2.25, "c", 3)],
        [
            ("k", "int", False),
            ("x", "float", False),
            ("s", "string", False),
            ("m", "int", True),
        ],
    )
    out = list(
        _resolved_rows(
            p,
            [
                ("k", "long", False),
                ("x", "double", False),
                ("s", "bytes", False),
                ("m", "double", True),  # nulls survive promotion
            ],
        )
    )
    assert out == [(7, 1.5, b"ab", None), (8, -2.25, b"c", 3.0)]
    # bytes -> string, the reverse lane
    p2 = str(tmp_path / "g3.avro")
    avroio.write_ocf(p2, [(b"xy",)], [("b", "bytes", False)])
    assert list(_resolved_rows(p2, [("b", "string", False)])) == [("xy",)]


@pytest.mark.parametrize("codec", ["null", "deflate", "snappy"])
def test_ocf_roundtrip(tmp_path, codec):
    fields = [("k", "long", False), ("name", "string", True), ("x", "double", False)]
    rows = [(i, None if i % 3 == 0 else f"n{i}", i * 0.25) for i in range(-50, 5000)]
    path = str(tmp_path / f"t_{codec}.avro")
    n = avroio.write_ocf(path, rows, fields, codec=codec, block_rows=700)
    assert n == len(rows)
    got_fields, it = avroio.read_ocf(path)
    assert got_fields == fields
    assert list(it) == rows


def test_ocf_structure_bytes(tmp_path):
    """Magic, header sync == every block's sync, deflate payload is
    RAW RFC 1951 (inflates with wbits=-15, rejects as zlib-wrapped)."""
    fields = [("k", "long", False)]
    path = str(tmp_path / "s.avro")
    avroio.write_ocf(path, [(i,) for i in range(10)], fields, codec="deflate")
    raw = open(path, "rb").read()
    assert raw.startswith(avroio.MAGIC)
    f = open(path, "rb")
    _, codec, sync = avroio.read_header(f)
    assert codec == "deflate"
    count = avroio.read_long(f)
    size = avroio.read_long(f)
    payload = f.read(size)
    assert count == 10
    assert zlib.decompress(payload, wbits=-15)  # raw deflate inflates
    with pytest.raises(zlib.error):
        zlib.decompress(payload)  # and is NOT zlib-wrapped
    assert f.read(16) == sync  # block sealed by the header's marker


def test_ocf_corruption_detected(tmp_path):
    fields = [("k", "long", False)]
    path = str(tmp_path / "c.avro")
    avroio.write_ocf(path, [(i,) for i in range(100)], fields, codec="null")
    raw = bytearray(open(path, "rb").read())
    raw[-1] ^= 0xFF  # flip the last sync byte
    open(path, "wb").write(bytes(raw))
    _, it = avroio.read_ocf(path)
    with pytest.raises(ValueError, match="sync"):
        list(it)


def test_schema_resolution_projection(tmp_path):
    """Spec schema-resolution rules at codec level: a reader schema
    with an added nullable field reads old containers as null there;
    a dropped field is skipped; a writer missing a NON-nullable
    reader field is a loud error (exercised via the datasource's
    projection logic semantics, mirrored here on raw containers)."""
    old_fields = [("k", "long", False), ("x", "double", False)]
    new_fields = [
        ("k", "long", False),
        ("x", "double", False),
        ("tag", "string", True),
    ]
    p_old = str(tmp_path / "gen1.avro")
    p_new = str(tmp_path / "gen2.avro")
    avroio.write_ocf(p_old, [(1, 1.0), (2, 2.0)], old_fields, codec="null")
    avroio.write_ocf(
        p_new, [(3, 3.0, "t3"), (4, 4.0, None)], new_fields, codec="null"
    )
    # decode each under its own header, project by name to new_fields
    out = []
    for p in (p_old, p_new):
        wf, rows = avroio.read_ocf(p)
        pos = {n: i for i, (n, _, _) in enumerate(wf)}
        idxs = [pos.get(n) for n, _, _ in new_fields]
        out += [
            tuple(None if i is None else r[i] for i in idxs) for r in rows
        ]
    assert out == [
        (1, 1.0, None),
        (2, 2.0, None),
        (3, 3.0, "t3"),
        (4, 4.0, None),
    ]


def test_read_side_rejects_malformed_bytes():
    """r13 review findings: the read path matches the write path's
    reject-loudly contract — negative string/bytes length prefixes
    (read(-1) would return the block tail as 'data') and out-of-range
    'int' values from spec-violating writers raise at the codec."""
    neg = io.BytesIO()
    avroio.write_long(neg, -1)  # length -1
    with pytest.raises(ValueError, match="negative"):
        avroio.read_value(io.BytesIO(neg.getvalue()), "string", False)
    big = io.BytesIO()
    avroio.write_long(big, 2**40)
    with pytest.raises(ValueError, match="avro int"):
        avroio.read_value(io.BytesIO(big.getvalue()), "int", False)
    # boundary stays legal on the read side too
    edge = io.BytesIO()
    avroio.write_long(edge, -(2**31))
    assert avroio.read_value(io.BytesIO(edge.getvalue()), "int", False) == -(2**31)


def test_resolution_rejects_null_into_non_nullable_reader(tmp_path):
    """r13 review finding: a nullable writer field resolving to a
    NON-nullable reader field must prove its values null-free — a
    None reaching a not-null Spark column would be silently wrong
    downstream (Spark does not re-check datasource nullability)."""
    from spark_glove_spark.operators.avro_queries import _resolved_rows

    p = str(tmp_path / "n.avro")
    avroio.write_ocf(
        p, [(1, "a"), (2, None)], [("k", "long", False), ("v", "string", True)]
    )
    reader = [("k", "long", False), ("v", "string", False)]
    with pytest.raises(ValueError, match="non-nullable reader"):
        list(_resolved_rows(p, reader))
    # null-free values under the same narrowed schema DO resolve
    p2 = str(tmp_path / "n2.avro")
    avroio.write_ocf(
        p2, [(1, "a"), (2, "b")], [("k", "long", False), ("v", "string", True)]
    )
    assert list(_resolved_rows(p2, reader)) == [(1, "a"), (2, "b")]


def test_logical_types_wire_and_schema():
    """Spec "Logical Types": timestamp-micros rides a long of epoch
    micros, date an int of epoch days — zero extra wire bytes; the
    schema JSON carries the annotation; a KNOWN logical type over the
    wrong primitive rejects; an UNKNOWN logical type falls back to
    its raw primitive exactly as the spec prescribes."""
    import datetime as dt
    import json

    ts = dt.datetime(2024, 3, 1, 12, 30, 45, 123456)
    buf = io.BytesIO()
    avroio.write_value(buf, "timestamp-micros", False, ts)
    micros = (ts - dt.datetime(1970, 1, 1)) // dt.timedelta(microseconds=1)
    assert buf.getvalue() == _enc_long(micros)  # long wire form, exactly
    assert avroio.read_value(
        io.BytesIO(buf.getvalue()), "timestamp-micros", False
    ) == ts
    d = dt.date(1969, 6, 15)  # pre-epoch: negative day count
    buf = io.BytesIO()
    avroio.write_value(buf, "date", False, d)
    assert buf.getvalue() == _enc_long(
        d.toordinal() - dt.date(1970, 1, 1).toordinal()
    )
    assert avroio.read_value(io.BytesIO(buf.getvalue()), "date", False) == d

    fields = [("ts", "timestamp-micros", False), ("d", "date", True)]
    node = json.loads(avroio.schema_json(fields))["fields"]
    assert node[0]["type"] == {"type": "long", "logicalType": "timestamp-micros"}
    assert node[1]["type"] == ["null", {"type": "int", "logicalType": "date"}]
    assert avroio.parse_schema(avroio.schema_json(fields)) == fields
    with pytest.raises(NotImplementedError):
        avroio.parse_schema(
            '{"type":"record","name":"r","fields":'
            '[{"name":"d","type":{"type":"string","logicalType":"date"}}]}'
        )
    assert avroio.parse_schema(
        '{"type":"record","name":"r","fields":'
        '[{"name":"u","type":{"type":"long","logicalType":"time-weird"}}]}'
    ) == [("u", "long", False)]
    assert avroio.spark_type_to_avro("timestamp") == "timestamp-micros"
    assert avroio.spark_type_to_avro("timestamp_ntz") == "timestamp-micros"
    assert avroio.avro_type_to_spark("timestamp-micros") == "timestamp"
    assert avroio.avro_type_to_spark("date") == "date"


def test_decimal_wire_and_bounds():
    """Spec "decimal": bytes of the big-endian two's-complement
    UNSCALED integer; exact roundtrip including negatives and nulls;
    inexact-at-scale and precision-overflow values reject at write;
    schema JSON carries precision/scale."""
    import json
    from decimal import Decimal

    fields = [("price", "decimal(12,2)", False), ("adj", "decimal(6,3)", True)]
    buf = io.BytesIO()
    avroio.write_value(buf, "decimal(4,2)", False, Decimal("-1.00"))
    raw = avroio.read_value(io.BytesIO(buf.getvalue()), "bytes", False)
    assert int.from_bytes(raw, "big", signed=True) == -100
    for v in (Decimal("12345.67"), Decimal("-999.99"), Decimal("0.00")):
        b = io.BytesIO()
        avroio.write_value(b, "decimal(12,2)", False, v)
        assert avroio.read_value(
            io.BytesIO(b.getvalue()), "decimal(12,2)", False
        ) == v
    with pytest.raises(ValueError, match="not exact"):
        avroio.write_value(io.BytesIO(), "decimal(12,2)", False, Decimal("1.005"))
    with pytest.raises(ValueError, match="precision"):
        avroio.write_value(io.BytesIO(), "decimal(4,2)", False, Decimal("123.45"))
    node = json.loads(avroio.schema_json(fields))["fields"]
    assert node[0]["type"] == {
        "type": "bytes", "logicalType": "decimal", "precision": 12, "scale": 2,
    }
    assert avroio.parse_schema(avroio.schema_json(fields)) == fields
    with pytest.raises(NotImplementedError):  # decimal must ride bytes
        avroio.parse_schema(
            '{"type":"record","name":"r","fields":[{"name":"d","type":'
            '{"type":"long","logicalType":"decimal","precision":4,"scale":2}}]}'
        )
    assert avroio.spark_type_to_avro("decimal(12,2)") == "decimal(12,2)"
    assert avroio.avro_type_to_spark("decimal(6,3)") == "decimal(6,3)"


def test_fixed_wire_and_bounds():
    """Spec "Fixed": exactly size bytes, NO length prefix; wrong-size
    values reject at write, truncation raises at read; schema JSON
    carries the named fixed node; surfaces to Spark as binary.
    Reachable from a Spark binary column via write_avro's overrides
    hook, same as enum."""
    import json

    buf = io.BytesIO()
    avroio.write_value(buf, "fixed<4>", False, b"\x01\x02\x03\x04")
    assert buf.getvalue() == b"\x01\x02\x03\x04"  # raw, unprefixed
    assert avroio.read_value(
        io.BytesIO(buf.getvalue()), "fixed<4>", False
    ) == b"\x01\x02\x03\x04"
    with pytest.raises(ValueError, match="fixed"):
        avroio.write_value(io.BytesIO(), "fixed<4>", False, b"\x01")
    with pytest.raises(EOFError, match="truncated"):
        avroio.read_value(io.BytesIO(b"\x01\x02"), "fixed<4>", False)
    fields = [("digest", "fixed<16>", False)]
    node = json.loads(avroio.schema_json(fields))["fields"]
    assert node[0]["type"] == {
        "type": "fixed", "name": "digest_fixed", "size": 16,
    }
    assert avroio.parse_schema(avroio.schema_json(fields)) == fields
    assert avroio.avro_type_to_spark("fixed<16>") == "binary"
    # container roundtrip, nullable union included
    import tempfile, os
    p = tempfile.mktemp(suffix=".avro")
    f2 = [("digest", "fixed<4>", True), ("k", "long", False)]
    rows = [(b"abcd", 1), (None, 2)]
    avroio.write_ocf(p, rows, f2)
    fs, it = avroio.read_ocf(p)
    assert fs == f2 and list(it) == rows
    os.remove(p)


def test_struct_wire_form_is_concatenated_fields():
    """Spec "Complex Types / Records": a record encodes as the
    concatenation of its field encodings — no length, no tag. The
    spec's own worked example: {"a": 27, "b": "foo"} over
    record{a: long, b: string} = 36 06 66 6f 6f."""
    buf = io.BytesIO()
    avroio.write_value(
        buf, "struct<a:long,b:string>", False, {"a": 27, "b": "foo"}
    )
    assert buf.getvalue() == bytes.fromhex("3606666f6f")


def test_struct_value_roundtrip_and_nullable_members():
    typ = "struct<seg:string,bal:decimal(12,2)?,pp:string?>"
    from decimal import Decimal

    cases = [
        {"seg": "AUTO", "bal": Decimal("12.34"), "pp": "27"},
        {"seg": "BLDG", "bal": None, "pp": None},
    ]
    for v in cases:
        buf = io.BytesIO()
        avroio.write_value(buf, typ, False, v)
        got = avroio.read_value(io.BytesIO(buf.getvalue()), typ, False)
        assert got == tuple(v.values()), (v, got)
    # a nullable struct itself rides the ["null", T] union too
    buf = io.BytesIO()
    avroio.write_value(buf, typ, True, None)
    assert avroio.read_value(io.BytesIO(buf.getvalue()), typ, True) is None
    # tuple/list values are accepted positionally, arity-checked
    buf = io.BytesIO()
    avroio.write_value(buf, "struct<a:long,b:string>", False, (5, "x"))
    assert avroio.read_value(
        io.BytesIO(buf.getvalue()), "struct<a:long,b:string>", False
    ) == (5, "x")
    with pytest.raises(ValueError, match="members"):
        avroio.write_value(io.BytesIO(), "struct<a:long,b:string>", False, (5,))


def test_struct_schema_json_roundtrip_and_depth_guard():
    typ = "struct<seg:string,bal:decimal(12,2)?,ts:timestamp-micros>"
    fields = [("id", "long", False), ("profile", typ, True)]
    js = avroio.schema_json(fields, name="t")
    back = avroio.parse_schema(js)
    assert back == fields
    # one level only: a struct member that is itself a container or
    # record rejects loudly on BOTH sides
    with pytest.raises(NotImplementedError, match="scope"):
        avroio.write_value(
            io.BytesIO(), "struct<a:struct<b:long>>", False, {"a": {"b": 1}}
        )
    with pytest.raises(NotImplementedError, match="scope"):
        avroio.write_value(
            io.BytesIO(), "struct<a:array<long>>", False, {"a": [1]}
        )
    import json

    node = json.loads(
        '{"type":"record","name":"r","fields":[{"name":"x","type":'
        '{"type":"record","name":"inner","fields":[{"name":"y","type":'
        '{"type":"record","name":"deep","fields":[]}}]}}]}'
    )
    with pytest.raises(NotImplementedError):
        avroio.parse_schema(json.dumps(node))


def test_struct_spark_type_mapping():
    assert (
        avroio.spark_type_to_avro("struct<lat:double,lon:double>")
        == "struct<lat:double,lon:double>"
    )
    assert (
        avroio.avro_type_to_spark("struct<seg:string,bal:decimal(12,2)?>")
        == "struct<seg: string, bal: decimal(12,2)>"
    )
    with pytest.raises(NotImplementedError):
        avroio.spark_type_to_avro("struct<a:struct<b:long>>")


# --- snappy codec (functions/snappy.py + OCF integration) ----------
# The snappy BLOCK format (google/snappy format_description.txt) has
# no worked byte examples in its description, so the vectors below
# are hand-derived from its rules: preamble = uncompressed length as
# LE base-128 varint; tag low bits 00=literal (len-1 in the upper 6
# bits, 60..63 switch to 1..4 extra LE length bytes), 01=copy with
# len 4..11 and an 11-bit offset split (3 bits in the tag, 1 byte
# following), 10=copy with len 1..64 and a 2-byte LE offset.

from spark_glove_spark.functions import snappy  # noqa: E402


def test_snappy_literal_wire_form():
    # "abc" -> preamble 0x03, tag (3-1)<<2 = 0x08, then the bytes
    assert snappy.compress(b"abc") == b"\x03\x08abc"
    assert snappy.decompress(b"\x03\x08abc") == b"abc"
    # 100-byte literal: len-1=99 >= 60 -> tag 60<<2=0xF0, 1 LE byte
    body = bytes(range(100))
    assert snappy.compress(body) == b"\x64\xf0\x63" + body


def test_snappy_copy_tags_decode():
    # 1-byte-offset copy: "a" then (off=1, len=7) -> "a"*8, the
    # overlapping-copy RLE idiom. tag = 0b01 | (len-4)<<2 | (off>>8)<<5
    stream = b"\x08" + b"\x00a" + bytes([0x01 | (3 << 2), 0x01])
    assert snappy.decompress(stream) == b"a" * 8
    # 2-byte-offset copy: "abcd" then (off=4, len=4) -> "abcdabcd"
    stream = b"\x08" + b"\x0cabcd" + bytes([0x02 | (3 << 2), 0x04, 0x00])
    assert snappy.decompress(stream) == b"abcdabcd"


def test_snappy_rejects_malformed():
    for bad, why in [
        (b"\x02\x00a" + bytes([0x01 | (0 << 2), 0x00]), "zero.*offset"),
        (b"\x09\x00a" + bytes([0x01 | (3 << 2), 0x05]), "before window"),
        (b"\x05\x08abc", "output.*!= preamble"),
        (b"\x03\x0cabc", "truncated literal"),
        (b"\x80", "truncated preamble"),
    ]:
        with pytest.raises(ValueError, match=why):
            snappy.decompress(bad)


def test_snappy_greedy_roundtrips_and_compresses():
    data = (b"the quick brown fox. " * 400) + bytes(range(256)) * 4
    enc = snappy.compress(data, "greedy")
    assert snappy.decompress(enc) == data
    assert len(enc) < len(data) // 2  # repetitive input really shrinks
    # literal mode: spec-valid, never shrinks, always roundtrips
    lit = snappy.compress(data, "literal")
    assert snappy.decompress(lit) == data
    assert len(lit) >= len(data)


def test_snappy_ocf_structure_and_crc(tmp_path):
    """Avro framing: compressed block ends in the 4-byte BIG-endian
    CRC32 of the UNCOMPRESSED payload (spec 'Required Codecs')."""
    fields = [("k", "long", False)]
    path = str(tmp_path / "sn.avro")
    avroio.write_ocf(path, [(i,) for i in range(10)], fields, codec="snappy")
    f = open(path, "rb")
    _, codec, sync = avroio.read_header(f)
    assert codec == "snappy"
    count = avroio.read_long(f)
    size = avroio.read_long(f)
    payload = f.read(size)
    assert count == 10
    raw = snappy.decompress(payload[:-4])
    assert int.from_bytes(payload[-4:], "big") == zlib.crc32(raw)
    body = io.BytesIO(raw)
    assert [avroio.read_value(body, "long", False) for _ in range(10)] == list(
        range(10)
    )
    assert f.read(16) == sync


def test_snappy_ocf_crc_corruption_detected(tmp_path):
    fields = [("k", "long", False)]
    path = str(tmp_path / "snc.avro")
    avroio.write_ocf(path, [(i,) for i in range(100)], fields, codec="snappy")
    raw = bytearray(open(path, "rb").read())
    raw[-21] ^= 0xFF  # a CRC byte (last block: ...crc4 | sync16)
    open(path, "wb").write(bytes(raw))
    _, it = avroio.read_ocf(path)
    with pytest.raises(ValueError, match="CRC mismatch"):
        list(it)


def test_snappy_ocf_reads_foreign_greedy_blocks(tmp_path):
    """A conformant writer may emit copy-bearing streams; the reader
    must accept them (the greedy encoder stands in for 'foreign')."""
    fields = [("k", "long", False), ("s", "string", False)]
    rows = [(i, f"tok-{i % 5}") for i in range(200)]
    body = io.BytesIO()
    for r in rows:
        for (_, t, nl), v in zip(fields, r):
            avroio.write_value(body, t, nl, v)
    raw = body.getvalue()
    payload = snappy.compress(raw, "greedy") + zlib.crc32(raw).to_bytes(
        4, "big"
    )
    assert len(payload) < len(raw)  # the block really carries copies
    path = str(tmp_path / "fg.avro")
    with open(path, "wb") as out:
        out.write(avroio.MAGIC)
        head = io.BytesIO()
        avroio.write_long(head, 2)
        for k, v in [
            ("avro.codec", b"snappy"),
            ("avro.schema", avroio.schema_json(fields).encode()),
        ]:
            avroio.write_value(head, "string", False, k)
            avroio.write_value(head, "bytes", False, v)
        avroio.write_long(head, 0)
        out.write(head.getvalue())
        out.write(b"S" * 16)
        blk = io.BytesIO()
        avroio.write_long(blk, len(rows))
        avroio.write_long(blk, len(payload))
        out.write(blk.getvalue())
        out.write(payload)
        out.write(b"S" * 16)
    got_fields, it = avroio.read_ocf(path)
    assert got_fields == fields
    assert list(it) == rows
