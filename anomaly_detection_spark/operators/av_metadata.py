"""Compressed A/V METADATA profiling: MP3 frame-header walks and
H.264 Annex-B NAL walks — pure bit math, no PCM/pixel decode.

Full MP3 (MDCT synthesis) and H.264 (CABAC/CAVLC + inter prediction)
decoding is out of scope in this container (no soundfile/pyav — see
multimodal._stub_decode), but the METADATA a training-data pipeline
profiles on — duration, sample rate, bitrate profile, frame counts,
resolution, keyframe structure — lives entirely in the frame/NAL
headers, which are plain integer bit fields:

- **MP3**: every MPEG-1 Layer III frame starts with a 4-byte header
  (11-bit sync, version/layer bits, bitrate and sample-rate table
  indexes, padding bit, channel mode); the frame's byte length is the
  closed form ``144000·kbps/rate + pad``, so a sequential walk
  recovers the exact frame count, per-frame bitrates (VBR detection)
  and sample-accurate duration (1152 samples/frame). ID3v2 tags are
  skipped via their syncsafe length.
- **H.264**: a raw stream is NAL units framed either Annex-B
  (``00 00 01`` start codes) or AVCC (4-byte BE length prefixes, the
  MP4 flavor) — both walks are supported, with Annex-B tried first
  and a failed PARSE (not just a failed split) falling back to AVCC,
  since framing is ambiguous without the container. The NAL header
  byte carries the unit type (SPS 7, PPS 8, IDR slice 5, non-IDR
  slice 1, SEI 6). The SPS is parsed for real — emulation-prevention
  bytes stripped, then exp-Golomb fields through
  ``pic_width_in_mbs_minus1`` / ``pic_height_in_map_units_minus1`` /
  cropping — yielding the exact pixel dimensions and level.

The ``av_metadata_synthetic`` gate query checks both walks against a
DuckDB closed-form oracle over planted fixtures whose every header
field comes from modular formulas; the encoders here write spec-valid
streams from those formulas (coefficient-level, like
``jpeg_codec.encode_jpeg``), so the oracle is exact.

Scale notes: both stats operators are mapInPandas projections over the
relevant ``kind`` rows — bytes never shuffle; header walks are O(bytes)
single-pass with no allocation proportional to media size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = [
    "parse_mp3_headers",
    "parse_h264_nals",
    "build_mp3",
    "build_h264",
    "mp3_stats",
    "h264_stats",
    "planted_av_media",
]

# MPEG-1 Layer III bitrate table (kbps), index 1..14 (0 = free, 15 = bad)
_MP3_BITRATES = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
# MPEG-1 sample-rate table, index 0..2 (3 = reserved)
_MP3_RATES = (44100, 48000, 32000)
_MP3_SAMPLES_PER_FRAME = 1152
_MAX_FRAMES = 1_000_000  # runaway-walk backstop on hostile payloads


# ---------------------------------------------------------------- MP3


def parse_mp3_headers(payload: bytes) -> dict | None:
    """Walk an MPEG-1 Layer III stream's frame headers. Returns
    ``{sample_rate, mode, n_frames, bitrate_sum_kbps, duration_ms,
    vbr}`` or None when the payload is not a clean MPEG-1 Layer III
    walk (every frame must parse and the walk must land exactly on
    EOF — a desynced walk returns None rather than garbage counts)."""
    if not payload:
        return None
    pos = 0
    # ID3v2 tag: 'ID3' ver(2) flags(1) syncsafe-size(4), then the body
    if payload[:3] == b"ID3" and len(payload) >= 10:
        size = 0
        for b in payload[6:10]:
            if b & 0x80:
                return None  # syncsafe bytes keep the high bit clear
            size = (size << 7) | b
        pos = 10 + size
    rates: set[int] = set()
    modes: set[int] = set()
    kbps_seen: list[int] = []
    n = len(payload)
    while pos < n:
        if len(kbps_seen) >= _MAX_FRAMES or pos + 4 > n:
            return None
        b0, b1, b2, b3 = payload[pos : pos + 4]
        # sync (11 bits), MPEG-1 ('11'), Layer III ('01'); CRC bit free
        if b0 != 0xFF or (b1 & 0xF6) != 0xF2:
            return None
        kbps_idx = b2 >> 4
        rate_idx = (b2 >> 2) & 0x3
        pad = (b2 >> 1) & 0x1
        if kbps_idx in (0, 15) or rate_idx == 3:
            return None
        kbps = _MP3_BITRATES[kbps_idx]
        rate = _MP3_RATES[rate_idx]
        rates.add(rate)
        modes.add(b3 >> 6)
        kbps_seen.append(kbps)
        pos += 144000 * kbps // rate + pad
    if pos != n or not kbps_seen or len(rates) != 1 or len(modes) != 1:
        return None
    rate = next(iter(rates))
    return {
        "sample_rate": rate,
        "mode": next(iter(modes)),
        "n_frames": len(kbps_seen),
        "bitrate_sum_kbps": sum(kbps_seen),
        "duration_ms": len(kbps_seen) * _MP3_SAMPLES_PER_FRAME * 1000 // rate,
        "vbr": len(set(kbps_seen)) > 1,
    }


def build_mp3(
    rate_idx: int,
    mode: int,
    frame_kbps_idx: list[int],
    pads: list[int],
    body_byte,
    id3_body: bytes | None = None,
) -> bytes:
    """Spec-valid MPEG-1 Layer III stream from explicit header fields
    (fixture encoder; frame bodies are filler produced by
    ``body_byte(frame, i)``)."""
    out = bytearray()
    if id3_body is not None:
        size = len(id3_body)
        ss = bytes(((size >> s) & 0x7F) for s in (21, 14, 7, 0))
        out += b"ID3\x04\x00\x00" + ss + id3_body
    rate = _MP3_RATES[rate_idx]
    for f, (ki, pad) in enumerate(zip(frame_kbps_idx, pads)):
        kbps = _MP3_BITRATES[ki]
        flen = 144000 * kbps // rate + pad
        hdr = bytes(
            [0xFF, 0xFB, (ki << 4) | (rate_idx << 2) | (pad << 1), mode << 6]
        )
        body = bytes(body_byte(f, i) for i in range(flen - 4))
        out += hdr + body
    return bytes(out)


# ---------------------------------------------------------------- H.264


class _BitReader:
    def __init__(self, data: bytes):
        self.data, self.pos = data, 0

    def bit(self) -> int:
        byte = self.data[self.pos >> 3]
        b = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def ue(self) -> int:
        zeros = 0
        while self.bit() == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("bad exp-Golomb")
        return (1 << zeros) - 1 + self.bits(zeros) if zeros else 0

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


def _strip_emulation(data: bytes) -> bytes:
    """RBSP extraction: drop the 0x03 of every 00 00 03 sequence."""
    out = bytearray()
    zeros = 0
    for b in data:
        if zeros >= 2 and b == 3:
            zeros = 0
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _parse_sps(rbsp: bytes) -> dict | None:
    r = _BitReader(rbsp)
    try:
        profile = r.bits(8)
        r.bits(8)  # constraint flags + reserved
        level = r.bits(8)
        r.ue()  # seq_parameter_set_id
        if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128):
            return None  # high-profile chroma trees out of scope
        r.ue()  # log2_max_frame_num_minus4
        poc_type = r.ue()
        if poc_type == 0:
            r.ue()  # log2_max_pic_order_cnt_lsb_minus4
        elif poc_type == 1:
            r.bit()
            r.se()
            r.se()
            for _ in range(r.ue()):
                r.se()
        r.ue()  # max_num_ref_frames
        r.bit()  # gaps_in_frame_num_value_allowed_flag
        w_mbs = r.ue() + 1
        h_units = r.ue() + 1
        frame_mbs_only = r.bit()
        if not frame_mbs_only:
            r.bit()  # mb_adaptive_frame_field_flag
        r.bit()  # direct_8x8_inference_flag
        crop_l = crop_r = crop_t = crop_b = 0
        if r.bit():  # frame_cropping_flag
            crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
        height_units = (2 - frame_mbs_only) * h_units
        return {
            "width": w_mbs * 16 - 2 * (crop_l + crop_r),
            "height": height_units * 16 - (2 if frame_mbs_only else 4) * (crop_t + crop_b),
            "level_idc": level,
        }
    except (IndexError, ValueError):
        return None


def _annexb_units(payload: bytes) -> list[bytes] | None:
    """Split an Annex-B stream at its 00 00 01 start codes (a leading
    00 belongs to a 4-byte start code)."""
    if payload[:3] != b"\x00\x00\x01" and payload[:4] != b"\x00\x00\x00\x01":
        return None
    starts = []
    i = 0
    while True:
        j = payload.find(b"\x00\x00\x01", i)
        if j < 0:
            break
        starts.append(j + 3)
        i = j + 3
    units = []
    for idx, s in enumerate(starts):
        e = starts[idx + 1] - 3 if idx + 1 < len(starts) else len(payload)
        while e > s and payload[e - 1] == 0 and idx + 1 < len(starts):
            e -= 1  # the 4th byte of the next 4-byte start code
        units.append(payload[s:e])
    return units


def _avcc_units(payload: bytes) -> list[bytes] | None:
    """Split an AVCC (MP4-flavor) stream: [4-byte BE length][NAL]...;
    the walk must land exactly on EOF or the payload is rejected."""
    units = []
    pos, n = 0, len(payload)
    while pos < n:
        if pos + 4 > n or len(units) >= _MAX_FRAMES:
            return None
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        pos += 4
        if ln == 0 or pos + ln > n:
            return None
        units.append(payload[pos : pos + ln])
        pos += ln
    return units if units else None


def _profile_units(units: list[bytes]) -> dict | None:
    """Count NAL types and parse the first baseline SPS; None when any
    unit is malformed (forbidden_zero_bit) or no SPS parses."""
    counts: dict[int, int] = {}
    total = 0
    sps = None
    for nal in units:
        if not nal or nal[0] & 0x80:
            return None
        ntype = nal[0] & 0x1F
        counts[ntype] = counts.get(ntype, 0) + 1
        total += len(nal)
        if ntype == 7 and sps is None:
            sps = _parse_sps(_strip_emulation(nal[1:]))
    if sps is None:
        return None
    return {
        **sps,
        "n_nals": len(units),
        "n_idr": counts.get(5, 0),
        "n_slices": counts.get(5, 0) + counts.get(1, 0),
        "n_sei": counts.get(6, 0),
        "total_nal_bytes": total,
    }


def parse_h264_nals(payload: bytes) -> dict | None:
    """Walk an H.264 stream's NAL units — Annex-B (00 00 01 start
    codes) or AVCC (4-byte length prefixes, the MP4 flavor; detected
    by a strict walk-to-EOF). Returns ``{width, height, level_idc,
    n_nals, n_idr, n_slices, n_sei, total_nal_bytes}`` or None when
    neither framing yields a clean parse with a baseline SPS.
    ``total_nal_bytes`` counts NAL bytes excluding the framing (start
    codes / length prefixes), so it is framing-independent; slices =
    IDR + non-IDR. Framing is ambiguous without the container (an
    AVCC first-NAL length of 1 or 256..511 byte-mimics a start code),
    so a failed Annex-B PARSE — not just a failed split — falls back
    to the AVCC walk."""
    if not payload or len(payload) < 4:
        return None
    for split in (_annexb_units, _avcc_units):
        units = split(payload)
        if units:
            parsed = _profile_units(units)
            if parsed is not None:
                return parsed
    return None


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def bit(self, b: int):
        self.bits.append(b & 1)

    def write(self, v: int, n: int):
        for s in range(n - 1, -1, -1):
            self.bit(v >> s)

    def ue(self, v: int):
        code = v + 1
        n = code.bit_length()
        self.write(0, n - 1)
        self.write(code, n)

    def rbsp(self) -> bytes:
        bits = self.bits + [1]  # rbsp_stop_one_bit
        while len(bits) % 8:
            bits.append(0)
        raw = bytes(
            sum(b << (7 - i) for i, b in enumerate(bits[p : p + 8]))
            for p in range(0, len(bits), 8)
        )
        out = bytearray()
        zeros = 0
        for b in raw:  # emulation prevention on encode
            if zeros >= 2 and b <= 3:
                out.append(3)
                zeros = 0
            out.append(b)
            zeros = zeros + 1 if b == 0 else 0
        return bytes(out)


def build_h264(
    w_mbs: int,
    h_units: int,
    level_idc: int,
    poc_type: int,
    log2_mfn: int,
    slice_nals: list[tuple[bool, bytes]],
    sei_payloads: list[bytes] = (),
    framing: str = "annexb",
) -> bytes:
    """Spec-valid H.264 stream: SPS (baseline profile 66) + PPS +
    optional SEI + slice NALs (``(is_idr, payload_bytes)``; payload
    bytes must avoid 00 00 0x runs — fixtures use nonzero fillers).
    ``framing``: 'annexb' (4-byte start code on the SPS, 3-byte after)
    or 'avcc' (4-byte BE length prefixes, the MP4 flavor)."""
    w = _BitWriter()
    w.write(66, 8)  # profile_idc baseline
    w.write(0, 8)  # constraint flags
    w.write(level_idc, 8)
    w.ue(0)  # sps id
    w.ue(log2_mfn)  # log2_max_frame_num_minus4
    w.ue(poc_type)
    if poc_type == 0:
        w.ue(0)
    w.ue(1)  # max_num_ref_frames
    w.bit(0)  # gaps allowed
    w.ue(w_mbs - 1)
    w.ue(h_units - 1)
    w.bit(1)  # frame_mbs_only
    w.bit(1)  # direct_8x8_inference
    w.bit(0)  # no cropping
    w.bit(0)  # no VUI
    sps = b"\x67" + w.rbsp()
    pps = b"\x68\xce\x38\x80"  # minimal fixed PPS body (not parsed)
    nals = [sps, pps]
    nals += [b"\x06" + p for p in sei_payloads]
    nals += [(b"\x65" if is_idr else b"\x41") + body for is_idr, body in slice_nals]
    if framing == "avcc":
        return b"".join(len(n).to_bytes(4, "big") + n for n in nals)
    out = bytearray(b"\x00\x00\x00\x01" + nals[0])
    for n in nals[1:]:
        out += b"\x00\x00\x01" + n
    return bytes(out)


# ---------------------------------------------------------------- stats

AV_METADATA_SCHEMA = "media_ref string, metric string, value bigint, parse_ok boolean"


def mp3_stats(media: DataFrame) -> DataFrame:
    """Long-format MP3 header metrics per audio asset: one row per
    (media_ref, metric) with metrics sample_rate / mode / n_frames /
    duration_ms / bitrate_sum_kbps / vbr (0 or 1). Unparseable
    payloads emit one ``parse_ok=false`` row so no asset silently
    drops. mapInPandas over audio rows only; bytes never shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                parsed = parse_mp3_headers(bytes(r.payload) if r.payload is not None else b"")
                if parsed is None:
                    rows.append(
                        {"media_ref": r.media_ref, "metric": "n_frames", "value": None, "parse_ok": False}
                    )
                    continue
                parsed = dict(parsed, vbr=int(parsed["vbr"]))
                for metric, value in sorted(parsed.items()):
                    rows.append(
                        {"media_ref": r.media_ref, "metric": metric, "value": int(value), "parse_ok": True}
                    )
            yield pd.DataFrame(rows, columns=["media_ref", "metric", "value", "parse_ok"])

    return media.filter(F.col("kind") == "audio").mapInPandas(batches, AV_METADATA_SCHEMA)


def h264_stats(media: DataFrame) -> DataFrame:
    """Long-format H.264 NAL/SPS metrics per video asset: width /
    height / level_idc / n_nals / n_idr / n_slices / n_sei /
    total_nal_bytes. Same contract as :func:`mp3_stats`."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                parsed = parse_h264_nals(bytes(r.payload) if r.payload is not None else b"")
                if parsed is None:
                    rows.append(
                        {"media_ref": r.media_ref, "metric": "n_nals", "value": None, "parse_ok": False}
                    )
                    continue
                for metric, value in sorted(parsed.items()):
                    rows.append(
                        {"media_ref": r.media_ref, "metric": metric, "value": int(value), "parse_ok": True}
                    )
            yield pd.DataFrame(rows, columns=["media_ref", "metric", "value", "parse_ok"])

    return media.filter(F.col("kind") == "video").mapInPandas(batches, AV_METADATA_SCHEMA)


# ---------------------------------------------------------------- fixture


def planted_av_media(spark, n_assets: int = 90) -> DataFrame:
    """Deterministic MP3/H.264 media table — the fixture behind the
    ``av_metadata_synthetic`` oracle. Asset k:

    - even k: MP3, rate index ``(k//2) % 3``, mode ``k % 4``,
      ``5 + k%7`` frames, frame f bitrate index ``1 + (k*3 + f) % 14``
      and padding bit ``(k + f) % 2``, body byte i of frame f
      ``(k*13 + f*7 + i*3) % 251``; every k%6==0 asset is prefixed
      with an ID3v2 tag of ``10 + k%20`` body bytes.
    - odd k: H.264, baseline SPS with width mbs ``1 + k%4``,
      height units ``1 + k%3``, level ``10 + (k%5)*10``, poc_type
      ``0 if k%4 < 2 else 2``, log2_max_frame_num_minus4 ``k % 3``;
      ``(k//2) % 2`` SEI NALs of 4 bytes ``0x80``; ``1 + k%3`` IDR +
      ``2 + k%5`` non-IDR slices, slice n carrying ``3 + (k*5+n) % 17``
      payload bytes valued ``1 + (k*11 + n*7 + j*3) % 200`` (nonzero —
      no accidental start codes). Framing alternates: k%4==1 assets
      are Annex-B, k%4==3 AVCC — every oracle metric is
      framing-independent (total_nal_bytes excludes the framing), so
      both walks are value-checked by the same closed forms."""
    from .multimodal import MEDIA_SCHEMA

    def build(k: int) -> tuple[str, bytes]:
        if k % 2 == 0:
            nf = 5 + k % 7
            payload = build_mp3(
                rate_idx=(k // 2) % 3,
                mode=k % 4,
                frame_kbps_idx=[1 + (k * 3 + f) % 14 for f in range(nf)],
                pads=[(k + f) % 2 for f in range(nf)],
                body_byte=lambda f, i: (k * 13 + f * 7 + i * 3) % 251,
                id3_body=bytes((k * 5 + i) % 200 for i in range(10 + k % 20))
                if k % 6 == 0
                else None,
            )
            return "audio", payload
        n_idr, n_nonidr = 1 + k % 3, 2 + k % 5
        slices = []
        for n in range(n_idr + n_nonidr):
            body = bytes(
                1 + (k * 11 + n * 7 + j * 3) % 200 for j in range(3 + (k * 5 + n) % 17)
            )
            slices.append((n < n_idr, body))
        payload = build_h264(
            w_mbs=1 + k % 4,
            h_units=1 + k % 3,
            level_idc=10 + (k % 5) * 10,
            poc_type=0 if k % 4 < 2 else 2,
            log2_mfn=k % 3,
            slice_nals=slices,
            sei_payloads=[b"\x80\x80\x80\x80"] * ((k // 2) % 2),
            framing="annexb" if k % 4 == 1 else "avcc",
        )
        return "video", payload

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for k in pdf["id"]:
                k = int(k)
                kind, payload = build(k)
                rows.append(
                    {
                        "media_ref": f"av-{k}",
                        "kind": kind,
                        "payload": payload,
                        "meta": {"source": "planted_av_media"},
                    }
                )
            yield pd.DataFrame(rows, columns=["media_ref", "kind", "payload", "meta"])

    return spark.range(n_assets).mapInPandas(gen, MEDIA_SCHEMA)
