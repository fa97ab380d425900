"""Tests for the pure-numpy baseline JPEG codec (jpeg_codec.py).

No Spark session needed for the codec-level tests: encoder and decoder
are plain functions over bytes. Coverage:

1. DC-only exactness — the planted-fixture contract: flat q=8 tables
   make each decoded sample exactly 128 + dc, across grayscale, 4:4:4
   and 4:2:0 with cropping and restart markers (the
   ``jpeg_pipeline_synthetic`` oracle replays these same formulas).
2. AC round-trip — arbitrary quantised coefficient blocks decode to
   clamp(floor(IDCT + 128.5)) computed by an INDEPENDENT basis-matrix
   IDCT written in the test (hypothesis-driven).
3. Totality — junk bytes, truncations of valid streams, progressive
   SOF2 markers and oversized dimensions all return None, never raise.
4. Restart-marker discipline — out-of-sequence RSTn is rejected.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from anomaly_detection_spark.operators.jpeg_codec import (
    _JPEG_MAX_PIXELS,
    _ZIGZAG,
    encode_jpeg,
    parse_jpeg,
)

FLAT8 = np.full(64, 8, dtype=np.int64)


def _dc_block(v: int) -> np.ndarray:
    c = np.zeros(64, dtype=np.int64)
    c[0] = v
    return c


def _ref_idct_samples(coef_nat: np.ndarray, qt_nat: np.ndarray) -> np.ndarray:
    """Independent reference: dequant + orthonormal IDCT + level shift
    + the decoder's sample rounding, written from the T.81 math rather
    than imported from the codec."""
    x = np.arange(8)
    C = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    C[0, :] *= 1.0 / np.sqrt(2.0)
    spatial = C.T @ (coef_nat.astype(np.float64) * qt_nat).reshape(8, 8) @ C
    return np.clip(np.floor(spatial + 128.5), 0, 255).astype(np.uint8)


def test_gray_dc_only_exact_with_crop():
    nbx, nby = 3, 2
    w, h = 8 * nbx - 3, 8 * nby - 1
    data = encode_jpeg(
        w, h, [FLAT8], [(1, 1, 0, lambda bx, by: _dc_block(((7 + (by * nbx + bx) * 13) % 161) - 80))]
    )
    out = parse_jpeg(data)
    assert out is not None
    ww, hh, px = out
    assert (ww, hh) == (w, h)
    img = px.reshape(h, w, 3)
    ys, xs = np.mgrid[0:h, 0:w]
    b = (ys // 8) * nbx + (xs // 8)
    exp = (128 + ((7 + b * 13) % 161) - 80).astype(np.uint8)
    assert (img == exp[..., None]).all()


@pytest.mark.parametrize("ri", [0, 1, 2])
def test_420_color_dc_only_exact_with_restarts(ri):
    k, nmx, nmy = 11, 2, 2
    w, h = 16 * nmx - 3, 16 * nmy - 2
    comps = [
        (2, 2, 0, lambda bx, by: _dc_block(((k * 7 + (by * 2 * nmx + bx) * 13) % 161) - 80)),
        (1, 1, 1, lambda bx, by: _dc_block(((k * 11 + (by * nmx + bx) * 17) % 121) - 60)),
        (1, 1, 1, lambda bx, by: _dc_block(((k * 5 + (by * nmx + bx) * 19) % 121) - 60)),
    ]
    data = encode_jpeg(w, h, [FLAT8, FLAT8], comps, restart_interval=ri)
    out = parse_jpeg(data)
    assert out is not None
    ww, hh, px = out
    assert (ww, hh) == (w, h)
    img = px.reshape(h, w, 3).astype(np.float64)
    ys, xs = np.mgrid[0:h, 0:w]
    lb = (ys // 8) * (2 * nmx) + (xs // 8)
    m = (ys // 16) * nmx + (xs // 16)
    yv = (128 + ((k * 7 + lb * 13) % 161) - 80).astype(np.float64)
    cb = (128 + ((k * 11 + m * 17) % 121) - 60).astype(np.float64)
    cr = (128 + ((k * 5 + m * 19) % 121) - 60).astype(np.float64)
    r = np.clip(np.floor(yv + 1.402 * (cr - 128.0) + 0.5), 0, 255)
    g = np.clip(np.floor(yv - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0) + 0.5), 0, 255)
    b = np.clip(np.floor(yv + 1.772 * (cb - 128.0) + 0.5), 0, 255)
    assert (img == np.stack((r, g, b), axis=-1)).all()


def test_422_nonzero_chroma_block_mapping():
    """4:2:2 with DISTINCT per-block chroma DCs: pins the chroma block
    index mapping m = (y//8)*nmx + (x//16) (a swapped or off-by-one
    mapping would decode the right colors in the wrong 16x8 regions —
    invisible to the zero-chroma test below)."""
    k, nmx, nmy = 3, 2, 2  # 32x16 image, 2x2 MCUs of 16x8
    w, h = 16 * nmx - 1, 8 * nmy - 2
    comps = [
        (2, 1, 0, lambda bx, by: _dc_block(((k * 7 + (by * 2 * nmx + bx) * 13) % 161) - 80)),
        (1, 1, 1, lambda bx, by: _dc_block(((k * 11 + (by * nmx + bx) * 17) % 121) - 60)),
        (1, 1, 1, lambda bx, by: _dc_block(((k * 5 + (by * nmx + bx) * 19) % 121) - 60)),
    ]
    out = parse_jpeg(encode_jpeg(w, h, [FLAT8, FLAT8], comps))
    assert out is not None
    ww, hh, px = out
    assert (ww, hh) == (w, h)
    img = px.reshape(h, w, 3).astype(np.float64)
    ys, xs = np.mgrid[0:h, 0:w]
    lb = (ys // 8) * (2 * nmx) + (xs // 8)
    m = (ys // 8) * nmx + (xs // 16)  # 4:2:2 chroma block = 16x8 region
    yv = (128 + ((k * 7 + lb * 13) % 161) - 80).astype(np.float64)
    cb = (128 + ((k * 11 + m * 17) % 121) - 60).astype(np.float64)
    cr = (128 + ((k * 5 + m * 19) % 121) - 60).astype(np.float64)
    r = np.clip(np.floor(yv + 1.402 * (cr - 128.0) + 0.5), 0, 255)
    g = np.clip(np.floor(yv - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0) + 0.5), 0, 255)
    b = np.clip(np.floor(yv + 1.772 * (cb - 128.0) + 0.5), 0, 255)
    assert (img == np.stack((r, g, b), axis=-1)).all()


def test_422_sampling_supported():
    """4:2:2 (2x1) — the third standard grid: chroma replicated
    horizontally only."""
    comps = [
        (2, 1, 0, lambda bx, by: _dc_block(10 * (by * 4 + bx))),
        (1, 1, 1, lambda bx, by: _dc_block(0)),
        (1, 1, 1, lambda bx, by: _dc_block(0)),
    ]
    data = encode_jpeg(30, 14, [FLAT8, FLAT8], comps)
    out = parse_jpeg(data)
    assert out is not None
    w, h, px = out
    assert (w, h) == (30, 14)
    img = px.reshape(h, w, 3)
    # dcCb = dcCr = 0 -> R = G = B = Y exactly
    assert (img[..., 0] == img[..., 1]).all() and (img[..., 1] == img[..., 2]).all()
    assert img[0, 0, 0] == 128 and img[0, 8, 0] == 138


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_ac_roundtrip_vs_independent_idct(data):
    """Arbitrary quantised AC/DC coefficients (hypothesis) decode to the
    independent reference IDCT — exercises run/size coding, ZRL, EOB
    and multi-block DC prediction."""
    rng = np.random.RandomState(data.draw(st.integers(0, 2**31 - 1)))
    nbx, nby = data.draw(st.integers(1, 3)), data.draw(st.integers(1, 2))
    qt = rng.randint(1, 32, 64).astype(np.int64)
    blocks = {}

    def coef(bx, by):
        c = rng.randint(-40, 41, 64).astype(np.int64)
        # sparsify so ZRL/EOB paths are hit
        mask = rng.rand(64) < 0.8
        c[mask] = 0
        c[0] = rng.randint(-200, 201)
        blocks[(bx, by)] = c.copy()
        return c

    w, h = 8 * nbx, 8 * nby
    stream = encode_jpeg(w, h, [qt], [(1, 1, 0, coef)])
    out = parse_jpeg(stream)
    assert out is not None
    ww, hh, px = out
    img = px.reshape(h, w, 3)
    for (bx, by), c in blocks.items():
        exp = _ref_idct_samples(c, qt.astype(np.float64))
        got = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, 0]
        assert (got == exp).all()


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_junk_returns_none(payload):
    assert parse_jpeg(payload) is None or payload[:2] == b"\xff\xd8"


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 400))
def test_truncation_never_raises(cut):
    """Totality: any prefix of a valid stream either fails cleanly to
    None or (when only the trailing EOI is lost) still decodes to the
    correct dimensions — it must never raise or emit garbage dims."""
    data = encode_jpeg(
        16, 16, [FLAT8], [(1, 1, 0, lambda bx, by: _dc_block(bx * 10 + by))], restart_interval=1
    )
    out = parse_jpeg(data[: min(cut, len(data))])
    assert out is None or (out[0], out[1]) == (16, 16)


def test_progressive_rejected():
    data = bytearray(
        encode_jpeg(16, 8, [FLAT8], [(1, 1, 0, lambda bx, by: _dc_block(0))])
    )
    i = bytes(data).find(b"\xff\xc0")
    data[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    assert parse_jpeg(bytes(data)) is None


def test_oversized_rejected():
    # forge an SOF claiming > _JPEG_MAX_PIXELS; decoder must refuse
    # BEFORE attempting entropy decode
    data = bytearray(encode_jpeg(8, 8, [FLAT8], [(1, 1, 0, lambda bx, by: _dc_block(0))]))
    i = bytes(data).find(b"\xff\xc0")
    big = 1024
    assert big * big > _JPEG_MAX_PIXELS
    data[i + 5 : i + 7] = big.to_bytes(2, "big")
    data[i + 7 : i + 9] = big.to_bytes(2, "big")
    assert parse_jpeg(bytes(data)) is None


def test_out_of_sequence_restart_rejected():
    data = encode_jpeg(
        24, 8, [FLAT8], [(1, 1, 0, lambda bx, by: _dc_block(5))], restart_interval=1
    )
    # swap the two RST markers (RST0 <-> RST1)
    swapped = data.replace(b"\xff\xd0", b"\xff\xee").replace(b"\xff\xd1", b"\xff\xd0").replace(
        b"\xff\xee", b"\xff\xd1"
    )
    assert swapped != data
    assert parse_jpeg(swapped) is None


def test_zigzag_is_an_involution_partner():
    """_ZIGZAG maps scan order -> natural order and is a permutation."""
    assert sorted(_ZIGZAG.tolist()) == list(range(64))
    # spot-pin the spec corners
    assert _ZIGZAG[0] == 0 and _ZIGZAG[1] == 1 and _ZIGZAG[2] == 8 and _ZIGZAG[63] == 63


def test_decode_media_routes_jpeg(spark):
    """Integration: planted JPEG payloads flow through decode_media /
    image_stats with decode_ok=True and exact dims."""
    from anomaly_detection_spark.operators.multimodal import (
        decode_media,
        image_stats,
        planted_jpeg_media,
    )

    media = planted_jpeg_media(spark, 12)
    dec = {r["media_ref"]: r for r in decode_media(media).collect()}
    assert len(dec) == 12
    assert all(r["decode_ok"] for r in dec.values())
    assert dec["jpeg-0"]["width"] == 8 and dec["jpeg-0"]["height"] == 8
    stats = {r["media_ref"]: r for r in image_stats(media).collect()}
    assert all(r["decode_ok"] for r in stats.values())
    # grayscale k=0: one 8x8 block, dcY(b=0) = -80 -> every sample 48
    assert stats["jpeg-0"]["sum_rgb"] == 3 * 64 * 48


def test_resize_consumes_jpeg(spark):
    """resize_images must actually resample JPEG rasters (meta.resize
    = 'nearest'), not stub-pass them through."""
    from anomaly_detection_spark.operators.multimodal import planted_jpeg_media, resize_images

    rows = resize_images(planted_jpeg_media(spark, 6), target_w=4, target_h=4).collect()
    assert len(rows) == 6
    assert all(r["meta"]["resize"] == "nearest" for r in rows)
