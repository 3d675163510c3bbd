"""Unit teeth for the multimodal decoders and the streaming schema
probe (ADVICE r2 hardening): RIFF chunk-walk correctness, fail-loudly
on non-PCM16 audio, and footer-probe guards. Pure-Python — no
SparkSession needed except the graph fallback test.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from spark_glove_spark.operators.multimodal import (
    decode_media,
    decode_wav,
    synth_ppm,
    synth_wav,
)
from spark_glove_spark.streaming.jobs import _ts_is_nanos


def _fmt_chunk(audio_format=1, channels=1, rate=8000, bits=16):
    block = channels * bits // 8
    return b"fmt " + struct.pack(
        "<IHHIIHH", 16, audio_format, channels, rate, rate * block, block, bits
    )


def _data_chunk(samples: np.ndarray) -> bytes:
    raw = samples.astype("<i2").tobytes()
    return b"data" + struct.pack("<I", len(raw)) + raw


def _riff(*chunks: bytes) -> bytes:
    body = b"WAVE" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_wav_roundtrips_synth():
    s = decode_wav(synth_wav(7))
    expected = ((7 * 31 + np.arange(64) * 17) % 65536) - 32768
    assert (s == expected).all()


def test_decode_wav_skips_list_chunk_containing_data_bytes():
    """A LIST/INFO chunk BEFORE data — whose payload contains the
    literal bytes 'data' — must be walked over, not matched (the old
    content.index(b'data') bug)."""
    samples = np.arange(-5, 5)
    lst = b"LIST" + struct.pack("<I", 9) + b"INFOdata\x00" + b"\x00"  # odd + pad
    wav = _riff(lst, _fmt_chunk(), _data_chunk(samples))
    assert (decode_wav(wav) == samples).all()


@pytest.mark.parametrize(
    "audio_format,bits",
    [(3, 32), (2, 4), (1, 24)],  # IEEE float, ADPCM, 24-bit PCM
)
def test_decode_wav_rejects_non_pcm16(audio_format, bits):
    wav = _riff(
        _fmt_chunk(audio_format=audio_format, bits=bits),
        _data_chunk(np.arange(4)),
    )
    with pytest.raises(NotImplementedError):
        decode_wav(wav)


def test_decode_wav_rejects_data_before_fmt():
    wav = _riff(_data_chunk(np.arange(4)), _fmt_chunk())
    with pytest.raises(NotImplementedError):
        decode_wav(wav)


def test_decode_wav_rejects_non_riff():
    with pytest.raises(NotImplementedError):
        decode_wav(b"\x00" * 64)


def test_decode_media_ppm_roundtrip():
    img = decode_media(synth_ppm(3), "image")
    assert img.shape == (8, 8, 3)
    assert img.dtype == np.uint8
    expected = ((3 * 7 + np.arange(192) * 13) % 256).reshape(8, 8, 3)
    assert (img == expected).all()


def test_decode_media_unknown_raises():
    with pytest.raises(NotImplementedError):
        decode_media(b"\xff\xd8\xff\xe0JFIF-ish", "image")  # JPEG magic


def test_ts_probe_plain_int64_is_nanos(tmp_path):
    """A plain-int64 ts column must read as 'nanos' (matching the
    legacy nanosAsLong conf), not crash on .unit (ADVICE r2)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"ts": pa.array([1, 2, 3], type=pa.int64())})
    p = os.path.join(tmp_path, "events.parquet")
    pq.write_table(t, p)
    assert _ts_is_nanos(p) is True


def test_ts_probe_micros_timestamp(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"ts": pa.array([1, 2, 3], type=pa.timestamp("us"))})
    p = os.path.join(tmp_path, "events.parquet")
    pq.write_table(t, p)
    assert _ts_is_nanos(p) is False


def test_ts_probe_mixed_directory_raises(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(tmp_path, "dir")
    os.makedirs(d)
    pq.write_table(
        pa.table({"ts": pa.array([1], type=pa.timestamp("us"))}),
        os.path.join(d, "a.parquet"),
    )
    pq.write_table(
        pa.table({"ts": pa.array([1], type=pa.int64())}),
        os.path.join(d, "b.parquet"),
    )
    with pytest.raises(ValueError, match="mixed ts resolutions"):
        _ts_is_nanos(d)


# ---------------------------------------------------------------------------
# PNG (round 3): stdlib-zlib decode with full unfilter pass
# ---------------------------------------------------------------------------

def test_png_roundtrip_all_filters():
    from spark_glove_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.RandomState(42)
    img = rng.randint(0, 256, size=(10, 7, 3), dtype=np.uint8)
    for f in range(5):
        out = decode_png(encode_png(img, filters=[f] * 10))
        assert (out == img).all(), f"filter {f} did not roundtrip"
    # mixed filters (the synth default)
    out = decode_png(encode_png(img))
    assert (out == img).all()


def test_synth_png_matches_synth_ppm_pixels():
    from spark_glove_spark.operators.multimodal import decode_png, synth_png

    for item_id in (1, 3, 101):
        png_img = decode_png(synth_png(item_id))
        ppm_img = decode_media(synth_ppm(item_id), "image")
        assert (png_img == ppm_img).all()


def test_decode_media_dispatches_png():
    from spark_glove_spark.operators.multimodal import synth_png

    img = decode_media(synth_png(5), "image")
    assert img.shape == (8, 8, 3)


def test_png_rejects_unsupported_subset():
    import struct
    import zlib

    from spark_glove_spark.operators.multimodal import (
        PNG_SIGNATURE,
        decode_png,
    )

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    # 16-bit depth
    bad = PNG_SIGNATURE + chunk(
        b"IHDR", struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    )
    with pytest.raises(NotImplementedError):
        decode_png(bad)
    # corrupted CRC
    good_ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    c = bytearray(chunk(b"IHDR", good_ihdr))
    c[-1] ^= 0xFF
    with pytest.raises(NotImplementedError):
        decode_png(PNG_SIGNATURE + bytes(c))


# --- round 7: BMP + GIF (from-scratch LZW) -------------------------------


def test_bmp_roundtrip_and_layout_quirks():
    import numpy as np

    from spark_glove_spark.operators.multimodal import (
        _BMP_H, _BMP_W, decode_bmp, synth_bmp,
    )

    for item in (0, 1, 5, 123):
        img = decode_bmp(synth_bmp(item))
        n = _BMP_W * _BMP_H * 3
        ref = (
            (item * 7 + np.arange(n, dtype=np.int64) * 13) % 256
        ).reshape(_BMP_H, _BMP_W, 3)
        assert np.array_equal(img, ref), item
    # corrupt magic / unsupported depth raise loudly
    import pytest

    good = bytearray(synth_bmp(1))
    bad = bytes(b"XX") + bytes(good[2:])
    with pytest.raises(ValueError, match="BM magic"):
        decode_bmp(bad)
    good[28] = 8  # bpp -> 8
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(good))


def test_gif_lzw_roundtrip_fuzz_and_refusals():
    import random

    import numpy as np
    import pytest

    from spark_glove_spark.operators.multimodal import (
        _GIF_H, _GIF_W, _gif_indices, _gif_palette,
        _lzw_decode, _lzw_encode, decode_gif, synth_gif,
    )

    for item in (0, 3, 77, 4999):
        img = decode_gif(synth_gif(item))
        ref = _gif_palette()[_gif_indices(item).reshape(_GIF_H, _GIF_W)]
        assert np.array_equal(img, ref), item
    # fuzz the codec pair: random streams long enough to force width
    # growth and dictionary resets, plus the KwKwK run case
    rng = random.Random(5)
    for t in range(25):
        n = rng.randint(1, 9000)
        arr = np.array([rng.randrange(16) for _ in range(n)], dtype=np.uint8)
        assert np.array_equal(_lzw_decode(_lzw_encode(arr, 4), 4, n), arr), t
    runs = np.zeros(500, dtype=np.uint8)
    assert np.array_equal(_lzw_decode(_lzw_encode(runs, 4), 4, 500), runs)
    # honest refusals
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTAGIF" + b"\x00" * 20)
    g = bytearray(synth_gif(1))
    # set the interlace flag in the image descriptor
    idesc = g.index(0x2C, 6)
    g[idesc + 9] |= 0x40
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_gif(bytes(g))
