"""Pure-Python PNG codec: filters, RGB, CRC checks, skip-undecodable."""

import numpy as np
import pytest

from osmnetfusion_spark.operators import multimodal as MM


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_gray_roundtrip_all_filters(ft):
    rng = np.random.default_rng(ft)
    px = rng.integers(0, 256, size=(11, 7), dtype=np.uint8)
    w, h, dec = MM.decode_png(MM.encode_png(px, filter_type=ft))
    assert (w, h) == (7, 11)
    np.testing.assert_array_equal(dec, px)


def test_crc_corruption_detected():
    blob = bytearray(MM.encode_png(np.zeros((4, 4), dtype=np.uint8)))
    blob[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        MM.decode_png(bytes(blob))


def test_not_png_rejected():
    with pytest.raises(ValueError, match="not a PNG"):
        MM.decode_png(b"\xff\xd8\xff\xe0 jpeg-ish")


def _huge_header_png() -> bytes:
    """Valid-CRC PNG advertising 65536x65536 in IHDR with no pixel data:
    the decoder must reject at the header, before ever touching IDAT."""
    import struct

    ihdr = struct.pack(">IIBBBBB", 65536, 65536, 8, 0, 0, 0, 0)
    return (
        MM.PNG_SIG
        + MM._chunk(b"IHDR", ihdr)
        + MM._chunk(b"IDAT", b"")
        + MM._chunk(b"IEND", b"")
    )


def test_oversized_image_rejects_fast():
    """VERDICT r3 #7: rows above the thumbnail decode bound must degrade
    gracefully (reject in O(header)), not decode slowly."""
    import time

    t0 = time.perf_counter()
    with pytest.raises(ValueError, match="max_pixels"):
        MM.decode_png(_huge_header_png())
    assert time.perf_counter() - t0 < 0.1  # header-time, not pixel-time
    # one pixel short of the advertised size still trips the guard
    with pytest.raises(ValueError, match="max_pixels"):
        MM.decode_png(_huge_header_png(), max_pixels=65536 * 65536 - 1)
    # raising the bound ABOVE the size re-enables the path (guard, not a
    # hard cap): decode proceeds past IHDR and now fails on the empty
    # IDAT (inflates to zero bytes, far short of h*(stride+1))
    with pytest.raises(ValueError, match="truncated"):
        MM.decode_png(_huge_header_png(), max_pixels=65536 * 65536)


def test_decompression_bomb_rejected_bounded():
    """ADVICE r4: a PNG declaring tiny dimensions but carrying a highly
    compressed multi-MB IDAT must reject WITHOUT inflating the whole
    stream into memory -- the inflate is bounded at h*(stride+1)."""
    import struct
    import zlib as _z

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    # 64 MiB of zeros compresses to ~64 KiB; a 1x1 gray PNG needs 2 raw bytes
    bomb = _z.compress(b"\x00" * (64 << 20), 9)
    blob = (
        MM.PNG_SIG
        + MM._chunk(b"IHDR", ihdr)
        + MM._chunk(b"IDAT", bomb)
        + MM._chunk(b"IEND", b"")
    )
    import time, tracemalloc

    tracemalloc.start()
    t0 = time.perf_counter()
    with pytest.raises(ValueError, match="decompression bomb"):
        MM.decode_png(blob)
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    # the 64 MiB payload must never have materialized
    assert peak < 8 << 20, f"inflated {peak} bytes for a 1x1 bomb"
    assert time.perf_counter() - t0 < 1.0


def test_trailing_garbage_after_deflate_rejected():
    """Extra compressed data past the exact pixel budget also trips the
    bomb guard (stream holds more than h*(stride+1) raw bytes)."""
    import struct
    import zlib as _z

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    # 2x2 gray needs 2*(2+1)=6 raw bytes; supply 7
    blob = (
        MM.PNG_SIG
        + MM._chunk(b"IHDR", ihdr)
        + MM._chunk(b"IDAT", _z.compress(b"\x00" * 7))
        + MM._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="decompression bomb"):
        MM.decode_png(blob)


def test_oversized_image_row_degrades_to_undecoded(spark):
    px = np.full((3, 5), 100, dtype=np.uint8)
    rows = [
        ("ok", bytearray(MM.encode_png(px))),
        ("huge", bytearray(_huge_header_png())),
    ]
    df = spark.createDataFrame(rows, "doc_id string, png binary")
    out = {
        r.doc_id: r
        for r in MM.decode_and_featurize(
            df, payload="png", id_col="doc_id", fake=False
        ).collect()
    }
    assert out["ok"].decoded
    assert not out["huge"].decoded and out["huge"].width is None


def test_decode_and_featurize_mixed_payloads(spark):
    # one real PNG + one undecodable payload in the same batch: the PNG
    # decodes, the other row comes back decoded=false instead of failing
    px = np.full((3, 5), 100, dtype=np.uint8)
    rows = [("a", bytearray(MM.encode_png(px))), ("b", bytearray(b"\xff\xd8not-a-png"))]
    df = spark.createDataFrame(rows, "doc_id string, png binary")
    out = {
        r.doc_id: r
        for r in MM.decode_and_featurize(df, payload="png", id_col="doc_id", fake=False).collect()
    }
    a, b = out["a"], out["b"]
    assert a.decoded and (a.width, a.height) == (5, 3)
    assert abs(a.features[0] - 100 / 255.0) < 1e-12
    assert not b.decoded and b.width is None and b.features is None
