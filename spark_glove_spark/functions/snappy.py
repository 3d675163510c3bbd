"""Pure-Python Snappy block-format codec, from the public format
description (google/snappy format_description.txt) — no third-party
library (the container has none; SURVEY §0's stdlib-only discipline,
same as the Avro codec this serves).

Scope: the BLOCK format only — the one Avro's ``snappy`` codec uses
(one compressed blob per Avro block; the stream/framing format with
chunk headers is a different wire format and is not an Avro codec).

Decoder: COMPLETE. All four tag types (literal, 1/2/4-byte-offset
copies), multi-byte literal lengths, overlapping copies (offset <
length repeats bytes, the format's RLE idiom), preamble varint, and
loud ValueError on every malformed shape (truncation, zero offset,
back-reference before the window start, output over/underrun). A
foreign file written by any conformant snappy implementation decodes.

Encoder: TWO spec-valid modes.

* ``mode="literal"`` (default) frames the input as bare literals —
  no matching, output = input + ~0.5% framing. The format
  description explicitly permits any tag sequence that decodes to
  the input; every conformant decoder (including this one and the
  JVM readers Avro interop targets) accepts it. This is the fast
  path: Python-side matching would put a per-byte interpreter loop
  on the write path, and the Avro container's compressing codec
  remains deflate (RFC1951 via zlib, C-speed).
* ``mode="greedy"`` is a real compressor — the reference
  implementation's shape: 4-byte hash table over a 64 KiB-windowed
  greedy scan, emitting copies for matches >= 4 bytes. Used by the
  tests to produce copy-bearing streams that exercise the decoder's
  back-reference paths, and available when output SIZE matters more
  than write wall (pure Python, ~1 MB/s — fine for the interop lane,
  wrong for a hot sink).

Avro integration note (functions/avroio.py): the Avro spec's snappy
codec appends a 4-byte BIG-endian CRC32 of the UNCOMPRESSED block
payload after the compressed bytes; that CRC lives in avroio (it is
Avro framing, not snappy format).
"""

from __future__ import annotations

_MAX_OFFSET = 1 << 16  # format: "the offset is at most 2^16 - 1" in
# practice for 1/2-byte copies; 4-byte copies may exceed it but no
# known compressor emits them inside a 64 KiB-windowed scan. We
# decode them anyway (full format), bounded by bytes-produced.


def _read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    """(value, next_pos) little-endian base-128 varint at ``pos``."""
    shift = 0
    out = 0
    while True:
        if pos >= len(buf):
            raise ValueError("snappy: truncated preamble varint")
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy: preamble varint overlong")


def _write_uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decompress(buf: bytes) -> bytes:
    """Decode one snappy block-format blob. Raises ValueError on any
    malformed input (never returns partial output)."""
    expect, pos = _read_uvarint(buf, 0)
    out = bytearray()
    n = len(buf)
    while pos < n:
        tag = buf[pos]
        pos += 1
        kind = tag & 0x03
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:  # 60..63 -> 1..4 extra little-endian bytes
                extra = ln - 59
                if pos + extra > n:
                    raise ValueError("snappy: truncated literal length")
                ln = int.from_bytes(buf[pos : pos + extra], "little")
                pos += extra
            ln += 1
            if pos + ln > n:
                raise ValueError("snappy: truncated literal body")
            out += buf[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 1-byte offset: len 4..11, offset 11 bits
            ln = 4 + ((tag >> 2) & 0x07)
            if pos >= n:
                raise ValueError("snappy: truncated 1-byte-offset copy")
            off = ((tag >> 5) << 8) | buf[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte little-endian offset: len 1..64
            ln = (tag >> 2) + 1
            if pos + 2 > n:
                raise ValueError("snappy: truncated 2-byte-offset copy")
            off = int.from_bytes(buf[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte little-endian offset
            ln = (tag >> 2) + 1
            if pos + 4 > n:
                raise ValueError("snappy: truncated 4-byte-offset copy")
            off = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        if off == 0:
            raise ValueError("snappy: zero copy offset")
        have = len(out)
        if off > have:
            raise ValueError("snappy: copy offset before window start")
        if off >= ln:  # disjoint: one slice
            start = have - off
            out += out[start : start + ln]
        else:  # overlapping: the format's RLE — repeat the tail
            start = have - off
            for i in range(ln):
                out.append(out[start + i])
        if len(out) > expect:
            raise ValueError("snappy: output overruns preamble length")
    if len(out) != expect:
        raise ValueError(
            f"snappy: output {len(out)} != preamble {expect} (truncated)"
        )
    return bytes(out)


def _emit_literal(out: bytearray, data: bytes, lo: int, hi: int) -> None:
    """Append literal element(s) covering data[lo:hi]."""
    while lo < hi:
        ln = min(hi - lo, 1 << 32)  # single element max is 2^32
        lm1 = ln - 1
        if lm1 < 60:
            out.append(lm1 << 2)
        elif lm1 < 1 << 8:
            out.append(60 << 2)
            out += lm1.to_bytes(1, "little")
        elif lm1 < 1 << 16:
            out.append(61 << 2)
            out += lm1.to_bytes(2, "little")
        elif lm1 < 1 << 24:
            out.append(62 << 2)
            out += lm1.to_bytes(3, "little")
        else:
            out.append(63 << 2)
            out += lm1.to_bytes(4, "little")
        out += data[lo : lo + ln]
        lo += ln


def _emit_copy(out: bytearray, off: int, ln: int) -> None:
    """Append copy element(s) for (offset, length); splits lengths the
    tags cannot carry (>64) into 64-byte copies + remainder >= 4."""
    while ln > 0:
        step = min(ln, 64)
        if ln - step in (1, 2, 3):  # leave a legal >=4 remainder
            step = ln - 4
        if 4 <= step <= 11 and off < 1 << 11:
            out.append(0x01 | ((step - 4) << 2) | ((off >> 8) << 5))
            out.append(off & 0xFF)
        else:
            out.append(0x02 | ((step - 1) << 2))
            out += off.to_bytes(2, "little")
        ln -= step


def compress(data: bytes, mode: str = "literal") -> bytes:
    """Encode ``data`` as one snappy block-format blob.

    mode="literal": preamble + bare literal framing (fast, +~0.5%).
    mode="greedy": reference-shaped greedy matcher (slow, compresses).
    """
    if mode == "literal":
        out = bytearray(_write_uvarint(len(data)))
        _emit_literal(out, data, 0, len(data))
        return bytes(out)
    if mode != "greedy":
        raise ValueError(f"snappy: unknown compress mode {mode!r}")
    out = bytearray(_write_uvarint(len(data)))
    n = len(data)
    table: dict[bytes, int] = {}
    lit = 0  # start of the pending literal run
    i = 0
    while i + 4 <= n:
        key = data[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand < _MAX_OFFSET:
            # extend the match forward
            ln = 4
            while i + ln < n and data[cand + ln] == data[i + ln]:
                ln += 1
            if lit < i:
                _emit_literal(out, data, lit, i)
            _emit_copy(out, i - cand, ln)
            # seed the table sparsely inside the match (every 4th
            # position keeps the dict small at equal recall for the
            # repetitive inputs this mode exists to exercise)
            for j in range(i + 1, min(i + ln, n - 3), 4):
                table[data[j : j + 4]] = j
            i += ln
            lit = i
        else:
            i += 1
    if lit < n:
        _emit_literal(out, data, lit, n)
    return bytes(out)
