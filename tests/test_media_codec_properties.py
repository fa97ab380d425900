"""Property tests (hypothesis) for the pure-numpy media codecs.

No Spark session needed: the parsers are plain functions over bytes.
Two properties per codec:

1. roundtrip — any payload built by an independent writer model parses
   back to exactly the planted dims/rates/samples;
2. totality — arbitrary byte junk (including near-miss RIFF prefixes
   and truncations of valid payloads) returns None, never raises:
   callers in decode_media/mapInPandas must fall back to the stub
   path, not crash an executor task.
"""

import zlib

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from anomaly_detection_spark.operators.multimodal import (
    _PNG_SIG,
    _parse_avi,
    _parse_png,
    _parse_ppm,
    _parse_wav,
)


def _wav_bytes(ch: int, rate: int, samples: np.ndarray, extra: bytes = b"") -> bytes:
    data = samples.astype("<i2").tobytes()
    return (
        b"RIFF" + (36 + len(extra) + len(data)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + ch.to_bytes(2, "little")
        + rate.to_bytes(4, "little") + (rate * ch * 2).to_bytes(4, "little")
        + (ch * 2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        + extra
        + b"data" + len(data).to_bytes(4, "little") + data
    )


@settings(max_examples=30, deadline=None)
@given(
    ch=st.integers(1, 4),
    rate=st.integers(1, 192_000),
    samples=st.lists(st.integers(-32768, 32767), min_size=1, max_size=64),
    junk_chunk=st.booleans(),
)
def test_wav_roundtrip_property(ch, rate, samples, junk_chunk):
    arr = np.array(samples, dtype=np.int64)
    extra = b""
    if junk_chunk:  # unknown chunk (odd size -> pad byte) must be skipped
        extra = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
    got = _parse_wav(_wav_bytes(ch, rate, arr, extra))
    assert got is not None
    grate, gch, gsamples = got
    assert (grate, gch) == (rate, ch)
    assert (gsamples == arr.astype("<i2")).all()


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_parsers_total_on_junk(payload):
    assert _parse_wav(payload) is None or payload[:4] == b"RIFF"
    assert _parse_avi(payload) is None or payload[:4] == b"RIFF"
    # random junk essentially never carries a valid CRC32 chain
    assert _parse_png(payload) is None or payload.startswith(_PNG_SIG)
    # _parse_ppm may legitimately parse junk that happens to start with a
    # valid P6 header; it must simply not raise.
    _parse_ppm(payload)


def _png_bytes(w: int, h: int, px: np.ndarray, filters: list[int]) -> bytes:
    stride = 3 * w
    img = px.reshape(h, stride).astype(np.int64)
    zero3 = np.zeros(3, dtype=np.int64)
    lines, prev = [], np.zeros(stride, dtype=np.int64)
    for r in range(h):
        ft, raw = filters[r % len(filters)], img[r]
        left = np.concatenate((zero3, raw[:-3]))
        ul = np.concatenate((zero3, prev[:-3]))
        if ft == 0:
            filt = raw
        elif ft == 1:
            filt = (raw - left) & 0xFF
        elif ft == 2:
            filt = (raw - prev) & 0xFF
        elif ft == 3:
            filt = (raw - ((left + prev) >> 1)) & 0xFF
        else:
            pa, pb, pc = np.abs(prev - ul), np.abs(left - ul), np.abs(left + prev - 2 * ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul))
            filt = (raw - pred) & 0xFF
        lines.append(bytes([ft]) + filt.astype(np.uint8).tobytes())
        prev = raw
    comp = zlib.compress(b"".join(lines))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (len(data).to_bytes(4, "big") + typ + data
                + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big"))

    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", comp) + chunk(b"IEND", b"")


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 9),
    h=st.integers(1, 9),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=6),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(w, h, filters, seed):
    px = (np.random.RandomState(seed).randint(0, 256, 3 * w * h)).astype(np.uint8)
    payload = _png_bytes(w, h, px, filters)
    got = _parse_png(payload)
    assert got is not None
    gw, gh, gpx = got
    assert (gw, gh) == (w, h) and (gpx == px).all()
    # truncation (drops IEND / breaks a CRC window) must reject
    assert _parse_png(payload[:-1]) is None


@settings(max_examples=30, deadline=None)
@given(
    ch=st.integers(1, 2),
    rate=st.integers(8000, 48000),
    n=st.integers(1, 32),
    cut=st.integers(1, 40),
)
def test_wav_truncation_property(ch, rate, n, cut):
    arr = np.arange(n * ch, dtype=np.int64) % 251 - 125
    payload = _wav_bytes(ch, rate, arr)
    cut = min(cut, len(payload) - 1)
    truncated = payload[: len(payload) - cut]
    got = _parse_wav(truncated)
    # either rejected outright, or (when only trailing sample bytes are
    # cut but the data chunk header still claims more) rejected too —
    # a truncated payload must NEVER parse as if complete.
    assert got is None


@settings(max_examples=20, deadline=None)
@given(
    w4=st.integers(1, 5),
    h=st.integers(1, 6),
    nf=st.integers(1, 5),
    usec=st.integers(1000, 1_000_000),
    seed=st.integers(0, 10_000),
)
def test_avi_roundtrip_property(w4, h, nf, usec, seed):
    w = 4 * w4  # multiple of 4: DIB stride == 3w, no pad bytes

    def chunk(cid, body):
        pad = b"\x00" if len(body) & 1 else b""
        return cid + len(body).to_bytes(4, "little") + body + pad

    i = np.arange(3 * w * h, dtype=np.int64)
    frames = [((seed + f * 13 + i * 5) % 256).astype(np.uint8).tobytes() for f in range(nf)]
    fsize = len(frames[0])
    avih = b"".join(
        v.to_bytes(4, "little")
        for v in [usec, fsize * 25, 0, 0x10, nf, 0, 1, fsize, w, h, 0, 0, 0, 0]
    )
    strf = (
        (40).to_bytes(4, "little") + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + fsize.to_bytes(4, "little") + (0).to_bytes(16, "little")
    )
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih)
                 + chunk(b"LIST", b"strl" + chunk(b"strf", strf)))
    movi = chunk(b"LIST", b"movi" + b"".join(chunk(b"00db", fb) for fb in frames))
    body = b"AVI " + hdrl + movi
    payload = b"RIFF" + len(body).to_bytes(4, "little") + body

    got = _parse_avi(payload)
    assert got is not None
    gw, gh, gu, gframes = got
    assert (gw, gh, gu, len(gframes)) == (w, h, usec, nf)
    for f, gf in enumerate(gframes):
        assert gf.tobytes() == frames[f]
    # truncation must reject
    assert _parse_avi(payload[:-1]) is None


# ------------------------------------------------------------- round 6:
# G.711 companded audio and Motion-JPEG video (decoded via jpeg_codec)


def _g711_wav(fmt: int, ch: int, rate: int, data: bytes) -> bytes:
    return (
        b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVEfmt "
        + (16).to_bytes(4, "little") + fmt.to_bytes(2, "little")
        + ch.to_bytes(2, "little") + rate.to_bytes(4, "little")
        + (rate * ch).to_bytes(4, "little") + ch.to_bytes(2, "little")
        + (8).to_bytes(2, "little")
        + b"data" + len(data).to_bytes(4, "little") + data
    )


def _mulaw_ref(b: int) -> int:
    """Independent CCITT mu-law expansion (sign/exponent/mantissa form,
    written from the G.711 spec — NOT the vectorized production code)."""
    b = ~b & 0xFF
    sample = (((b & 0x0F) << 3) + 0x84) << ((b >> 4) & 0x07)
    sample -= 0x84
    return -sample if b & 0x80 else sample


def _alaw_ref(b: int) -> int:
    a = b ^ 0x55
    exponent = (a >> 4) & 0x07
    if exponent == 0:
        sample = ((a & 0x0F) << 4) + 8
    else:
        sample = (((a & 0x0F) << 4) + 0x108) << (exponent - 1)
    return sample if a & 0x80 else -sample


def test_g711_all_256_codes_match_reference_tables():
    allb = bytes(range(256))
    rate, ch, s = _parse_wav(_g711_wav(7, 1, 8000, allb))
    assert (rate, ch) == (8000, 1)
    assert s.dtype == np.int16
    assert [int(v) for v in s] == [_mulaw_ref(b) for b in range(256)]
    assert int(abs(s.astype(np.int64)).max()) == 32124  # published mu-law peak
    rate, ch, s = _parse_wav(_g711_wav(6, 2, 16000, allb))
    assert (rate, ch) == (16000, 2)
    assert [int(v) for v in s] == [_alaw_ref(b) for b in range(256)]
    assert int(abs(s.astype(np.int64)).max()) == 32256  # published A-law peak


def test_g711_zero_codes():
    # mu-law 0xFF and 0x7F both decode to 0; A-law 0xD5 -> +8, 0x55 -> -8
    _, _, s = _parse_wav(_g711_wav(7, 1, 8000, bytes([0xFF, 0x7F])))
    assert list(s) == [0, 0]
    _, _, s = _parse_wav(_g711_wav(6, 1, 8000, bytes([0xD5, 0x55])))
    assert list(s) == [8, -8]


def test_g711_rejects_wrong_bits():
    # companded formats must be 8-bit; PCM must be 16-bit
    bad = bytearray(_g711_wav(7, 1, 8000, bytes(4)))
    bad[34:36] = (16).to_bytes(2, "little")
    assert _parse_wav(bytes(bad)) is None
    bad = bytearray(_g711_wav(1, 1, 8000, bytes(4)))
    assert _parse_wav(bytes(bad)) is None  # fmt 1 with bits=8


def _mjpg_avi(w: int, h: int, jpeg_frames: list, usec: int) -> bytes:
    # reuse the fixture's container writer — the format under test is the
    # DECODER; builder independence buys nothing (frames already come
    # from the production encode_jpeg)
    from anomaly_detection_spark.operators.multimodal import _build_mjpg_avi

    return _build_mjpg_avi(w, h, jpeg_frames, usec)


def test_mjpg_avi_frames_decode_via_jpeg_codec():
    from anomaly_detection_spark.operators.jpeg_codec import encode_jpeg

    qt = np.full(64, 8, dtype=np.int64)

    def dc(v):
        c = np.zeros(64, dtype=np.int64)
        c[0] = v
        return c

    w, h = 14, 10  # 2x2 block grid with cropping
    frames = [
        encode_jpeg(
            w, h, [qt],
            [(1, 1, 0, (lambda ff: lambda bx, by: dc(((ff * 13 + (by * 2 + bx) * 7) % 161) - 80))(f))],
        )
        for f in range(3)
    ]
    out = _parse_avi(_mjpg_avi(w, h, frames, 40000))
    assert out is not None
    gw, gh, gu, dec = out
    assert (gw, gh, gu, len(dec)) == (w, h, 40000, 3)
    ys, xs = np.mgrid[0:h, 0:w]
    blk = (ys // 8) * 2 + (xs // 8)
    for f in range(3):
        exp = (128 + ((f * 13 + blk * 7) % 161) - 80).astype(np.uint8)
        assert (dec[f].reshape(h, w, 3) == exp[..., None]).all()


def test_mjpg_dim_mismatch_rejected():
    from anomaly_detection_spark.operators.jpeg_codec import encode_jpeg

    qt = np.full(64, 8, dtype=np.int64)

    def dc(v):
        c = np.zeros(64, dtype=np.int64)
        c[0] = v
        return c

    frame = encode_jpeg(8, 8, [qt], [(1, 1, 0, lambda bx, by: dc(0))])
    # container claims 16x8 but the JPEG frame is 8x8 -> refuse
    assert _parse_avi(_mjpg_avi(16, 8, [frame], 40000)) is None
    # junk frame bytes -> refuse
    assert _parse_avi(_mjpg_avi(8, 8, [b"\xff\xd8 junk"], 40000)) is None


def test_mjpg_clip_pixel_budget_degrades_to_stub():
    """Clip-level budget: a Motion-JPEG clip whose TOTAL decoded pixels
    exceed _MJPG_MAX_TOTAL_PIXELS must return None (-> metadata stub)
    even though each frame is individually small — interpreted-Python
    entropy decode across thousands of frames must never stall an
    executor task."""
    from anomaly_detection_spark.operators.jpeg_codec import encode_jpeg
    from anomaly_detection_spark.operators.multimodal import _MJPG_MAX_TOTAL_PIXELS

    qt = np.full(64, 8, dtype=np.int64)

    def dc(v):
        c = np.zeros(64, dtype=np.int64)
        c[0] = v
        return c

    frame = encode_jpeg(8, 8, [qt], [(1, 1, 0, lambda bx, by: dc(0))])
    n_over = _MJPG_MAX_TOTAL_PIXELS // 64 + 1
    # the budget check runs on header metadata BEFORE any frame decode,
    # so building the over-budget container is cheap (repeated frame)
    assert _parse_avi(_mjpg_avi(8, 8, [frame] * n_over, 40000)) is None
    assert _parse_avi(_mjpg_avi(8, 8, [frame] * 3, 40000)) is not None


# ---------- GIF (LZW) ----------


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    nbits=st.integers(1, 8),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_property(w, h, nbits, interlace, seed):
    """Any palette size 2..256, any dims, interlaced or not: encode →
    parse recovers the exact palette-mapped RGB raster."""
    from anomaly_detection_spark.operators.gif_codec import encode_gif, parse_gif

    rng = np.random.RandomState(seed)
    ncol = 1 << nbits
    pal = bytes(rng.randint(0, 256, 3 * ncol, dtype=np.uint8))
    idx = rng.randint(0, ncol, w * h).astype(np.uint8)
    got = parse_gif(encode_gif(w, h, idx, pal, interlace=interlace))
    assert got is not None
    gw, gh, px = got
    exp = np.frombuffer(pal, np.uint8).reshape(-1, 3)[idx].reshape(-1)
    assert (gw, gh) == (w, h)
    assert np.array_equal(px, exp)


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), cut=st.floats(0.01, 0.99))
def test_gif_truncation_property(seed, cut):
    """Truncating a valid GIF anywhere must return None, never raise."""
    from anomaly_detection_spark.operators.gif_codec import encode_gif, parse_gif

    rng = np.random.RandomState(seed)
    pal = bytes(rng.randint(0, 256, 3 * 16, dtype=np.uint8))
    idx = rng.randint(0, 16, 12 * 9).astype(np.uint8)
    blob = encode_gif(12, 9, idx, pal)
    assert parse_gif(blob[: max(1, int(len(blob) * cut))]) is None


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_gif_total_on_junk(payload):
    from anomaly_detection_spark.operators.gif_codec import parse_gif

    assert parse_gif(payload) is None or payload[:3] == b"GIF"
    got = parse_gif(b"GIF89a" + payload)  # must not raise; if it decodes,
    if got is not None:  # the result must at least be shape-consistent
        w, h, px = got
        assert w > 0 and h > 0 and len(px) == 3 * w * h


def test_gif_lzw_dictionary_growth_and_reset():
    """A long low-entropy stream forces the code width through every
    size up to 12 bits and past the 4096-entry dictionary reset; the
    decode must still be exact and the stream genuinely compressed."""
    from anomaly_detection_spark.operators.gif_codec import encode_gif, parse_gif

    w, h = 320, 200  # 64k pixels -> thousands of dictionary entries
    pal = bytes((i * 5) % 256 for i in range(3 * 32))
    idx = np.array([(i // 7 + i // 11) % 32 for i in range(w * h)], dtype=np.uint8)
    blob = encode_gif(w, h, idx, pal)
    got = parse_gif(blob)
    assert got is not None
    exp = np.frombuffer(pal, np.uint8).reshape(-1, 3)[idx].reshape(-1)
    assert np.array_equal(got[2], exp)
    assert len(blob) < w * h // 2  # real compression, not byte stuffing


def test_gif_pixel_budget():
    """Dims past _GIF_MAX_PIXELS must reject from the header alone."""
    from anomaly_detection_spark.operators.gif_codec import encode_gif, parse_gif
    from anomaly_detection_spark.operators.gif_codec import _GIF_MAX_PIXELS

    pal = bytes(range(12))
    blob = bytearray(encode_gif(4, 3, np.zeros(12, np.uint8), pal))
    # forge the image-descriptor dims to a budget-busting size
    big = int(np.sqrt(_GIF_MAX_PIXELS)) + 1
    off = blob.index(0x2C, 13)
    blob[off + 5 : off + 7] = big.to_bytes(2, "little")
    blob[off + 7 : off + 9] = big.to_bytes(2, "little")
    assert parse_gif(bytes(blob)) is None


# ---------- IMA ADPCM ----------


@settings(max_examples=30, deadline=None)
@given(
    ch=st.integers(1, 2),
    spb_units=st.integers(1, 5),
    n_blocks=st.integers(1, 3),
    seed=st.integers(0, 2**31 - 1),
)
def test_adpcm_roundtrip_property(ch, spb_units, n_blocks, seed):
    """decode(encode(x)) must equal the encoder's own reconstruction
    (ADPCM is lossy, so the reconstruction — not the input — is the
    contract), through the full WAV container for mono AND stereo."""
    from anomaly_detection_spark.operators.multimodal import (
        _ima_adpcm_decode,
        _ima_adpcm_encode,
        _parse_wav,
    )

    spb = 1 + 8 * spb_units
    rng = np.random.RandomState(seed)
    x = rng.randint(-32768, 32768, n_blocks * spb * ch)
    data, ba, recon = _ima_adpcm_encode(x, ch, spb)
    got = _ima_adpcm_decode(data, ch, ba)
    assert got is not None and np.array_equal(got, recon)
    wav = (
        b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVEfmt "
        + (16).to_bytes(4, "little") + (17).to_bytes(2, "little")
        + ch.to_bytes(2, "little") + (8000).to_bytes(4, "little")
        + (4000).to_bytes(4, "little") + ba.to_bytes(2, "little")
        + (4).to_bytes(2, "little")
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    r = _parse_wav(wav)
    assert r is not None and r[1] == ch and np.array_equal(r[2], recon)


def test_adpcm_known_vector():
    """Hand-computed IMA steps from the spec's reference algorithm:
    pred=0, idx=0 (step 7); nibble 7 -> vpdiff (7>>3) + 7 + 3 + 1 = 11,
    pred 11, idx 0+8=8 (step 16); nibble 3 -> vpdiff 2 + 8 + 4 = 14,
    pred 11+14=25, idx 8-1=7."""
    from anomaly_detection_spark.operators.multimodal import _ima_step

    pred, idx = _ima_step(0, 0, 7)
    assert (pred, idx) == (11, 8)
    pred, idx = _ima_step(pred, idx, 3)
    assert (pred, idx) == (25, 7)
    # sign bit subtracts; clamp floors at -32768
    pred, idx = _ima_step(-32760, 88, 0xF)
    assert pred == -32768 and idx == 88


def test_adpcm_malformed_rejected():
    from anomaly_detection_spark.operators.multimodal import _ima_adpcm_decode

    assert _ima_adpcm_decode(b"", 1, 8) is None  # empty data
    assert _ima_adpcm_decode(bytes(12), 1, 8) is None  # size not multiple
    assert _ima_adpcm_decode(bytes(8), 1, 0) is None  # zero block align
    assert _ima_adpcm_decode(bytes(8), 1, 6) is None  # align not 4-multiple
    bad_idx = bytes([0, 0, 89, 0, 0, 0, 0, 0])  # step index > 88
    assert _ima_adpcm_decode(bad_idx, 1, 8) is None
    bad_rsv = bytes([0, 0, 0, 1, 0, 0, 0, 0])  # reserved byte nonzero
    assert _ima_adpcm_decode(bad_rsv, 1, 8) is None


def test_adpcm_sample_budget():
    from anomaly_detection_spark.operators.multimodal import (
        _ADPCM_MAX_SAMPLES,
        _ima_adpcm_decode,
    )

    ba = 4 + 4096
    n_blocks = _ADPCM_MAX_SAMPLES // (1 + 2 * 4096) + 1
    assert _ima_adpcm_decode(bytes(ba * n_blocks), 1, ba) is None


# ---------- round-7: MP3 frame-header / H.264 NAL metadata walks ----------


def test_mp3_header_walk_roundtrip_and_rejections():
    from anomaly_detection_spark.operators.av_metadata import (
        _MP3_BITRATES,
        build_mp3,
        parse_mp3_headers,
    )

    kidx = [3, 3, 7, 3]  # VBR (two distinct bitrates)
    p = build_mp3(1, 2, kidx, [0, 1, 0, 1], lambda f, i: (f * 7 + i) % 251,
                  id3_body=b"x" * 37)
    r = parse_mp3_headers(p)
    assert r == {
        "sample_rate": 48000,
        "mode": 2,
        "n_frames": 4,
        "bitrate_sum_kbps": sum(_MP3_BITRATES[i] for i in kidx),
        "duration_ms": 4 * 1152 * 1000 // 48000,
        "vbr": True,
    }
    cbr = parse_mp3_headers(build_mp3(0, 0, [5, 5], [0, 0], lambda f, i: 7))
    assert cbr["vbr"] is False and cbr["sample_rate"] == 44100
    # a desynced walk (truncated final frame) returns None, not garbage
    assert parse_mp3_headers(p[:-1]) is None
    assert parse_mp3_headers(b"\x12\x34" + p) is None  # no leading sync
    assert parse_mp3_headers(b"") is None
    bad_id3 = b"ID3\x04\x00\x00\xff\xff\xff\xff" + p  # non-syncsafe size
    assert parse_mp3_headers(bad_id3) is None


def test_h264_nal_walk_sps_and_rejections():
    from anomaly_detection_spark.operators.av_metadata import (
        _BitWriter,
        _parse_sps,
        _strip_emulation,
        build_h264,
        parse_h264_nals,
    )

    slices = [(True, b"\x01\x02\x03"), (False, b"\x05\x06\x07\x08")]
    p = build_h264(3, 2, 31, 0, 1, slices, [b"\x80\x80"])
    r = parse_h264_nals(p)
    assert r["width"] == 48 and r["height"] == 32 and r["level_idc"] == 31
    assert r["n_nals"] == 5 and r["n_idr"] == 1 and r["n_slices"] == 2 and r["n_sei"] == 1
    # total NAL bytes excludes start codes: payload minus 4 + 3*4
    assert r["total_nal_bytes"] == len(p) - 4 - 3 * 4
    assert parse_h264_nals(b"\x00\x01" + p) is None  # not Annex-B
    assert parse_h264_nals(b"") is None
    # emulation prevention: writer inserts, parser strips (pinned bytes)
    assert _strip_emulation(b"\x00\x00\x03\x00\x01") == b"\x00\x00\x00\x01"
    w = _BitWriter()
    w.write(0, 22)
    w.write(1, 2)
    assert b"\x00\x00\x03" in w.rbsp()
    assert _strip_emulation(w.rbsp()) == b"\x00\x00\x01\x80"
    # SPS with frame cropping: 4:2:0 crop units are 2 pixels
    w = _BitWriter()
    w.write(66, 8); w.write(0, 8); w.write(20, 8)
    w.ue(0); w.ue(0); w.ue(2)  # sps id, log2_mfn, poc_type 2
    w.ue(1); w.bit(0)
    w.ue(9); w.ue(7)  # 160 x 128 before crop
    w.bit(1); w.bit(1)  # frame_mbs_only, direct_8x8
    w.bit(1); w.ue(1); w.ue(2); w.ue(0); w.ue(3)  # crop l1 r2 t0 b3
    w.bit(0)
    sps = _parse_sps(w.rbsp())
    assert sps == {"width": 160 - 2 * 3, "height": 128 - 2 * 3, "level_idc": 20}
    # high-profile SPS (chroma trees) is out of scope -> None
    w = _BitWriter(); w.write(100, 8); w.write(0, 8); w.write(40, 8); w.ue(0)
    assert _parse_sps(w.rbsp()) is None


def test_h264_avcc_framing_parity_and_fallback():
    from anomaly_detection_spark.operators.av_metadata import (
        build_h264,
        parse_h264_nals,
    )

    slices = [(True, b"\x01\x02\x03"), (False, b"\x05\x06\x07\x08")]
    annexb = build_h264(3, 2, 31, 0, 1, slices, [b"\x80\x80"])
    avcc = build_h264(3, 2, 31, 0, 1, slices, [b"\x80\x80"], framing="avcc")
    # every metric is framing-independent (total excludes the framing)
    assert parse_h264_nals(avcc) == parse_h264_nals(annexb)
    assert avcc != annexb and avcc[4] == 0x67  # first prefix = SPS length
    # AVCC whose FIRST NAL length byte-mimics an Annex-B start code
    # (length 256..511 -> 00 00 01 xx prefix): the Annex-B split claims
    # it, the parse fails, and the walk falls back to AVCC. The SPS
    # NAL is small, so put a 300-byte slice NAL first (the length-
    # prefix walk imposes no SPS-first order).
    sps_nal = avcc[4 : 4 + int.from_bytes(avcc[:4], "big")]
    big_nal = b"\x41" + bytes(1 + (j * 3) % 200 for j in range(300))
    raw = (
        len(big_nal).to_bytes(4, "big")
        + big_nal
        + len(sps_nal).to_bytes(4, "big")
        + sps_nal
    )
    assert raw[:3] == b"\x00\x00\x01"  # byte-mimics a start code
    r = parse_h264_nals(raw)
    assert r is not None and r["n_nals"] == 2 and r["width"] == 48
    assert r["total_nal_bytes"] == len(big_nal) + len(sps_nal)
    big_slice = [(True, bytes(1 + (j * 3) % 200 for j in range(300)))]
    assert parse_h264_nals(
        build_h264(2, 1, 20, 2, 0, big_slice, framing="avcc")
    ) == parse_h264_nals(build_h264(2, 1, 20, 2, 0, big_slice))
    # truncated / desynced AVCC rejects rather than emitting garbage
    assert parse_h264_nals(avcc[:-1]) is None
    assert parse_h264_nals(raw + b"\x00\x00\x00\x00") is None  # zero len
    assert parse_h264_nals(b"\x00\x01" + annexb) is None


def test_av_stats_operators_over_planted_fixture(spark):
    from anomaly_detection_spark.operators.av_metadata import (
        h264_stats,
        mp3_stats,
        planted_av_media,
    )

    media = planted_av_media(spark, 20)
    mp3 = mp3_stats(media).collect()
    h264 = h264_stats(media).collect()
    assert len(mp3) == 10 * 6 and all(r["parse_ok"] for r in mp3)
    assert len(h264) == 10 * 8 and all(r["parse_ok"] for r in h264)
    # an unparseable payload emits one parse_ok=false row, never drops
    import pandas as pd
    bad = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_ref": ["bad-1"],
                "kind": ["audio"],
                "payload": [b"\x00garbage"],
                "meta": [{"source": "t"}],
            }
        )
    )
    rows = mp3_stats(bad).collect()
    assert len(rows) == 1 and rows[0]["parse_ok"] is False and rows[0]["value"] is None
