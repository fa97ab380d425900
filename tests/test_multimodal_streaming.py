import os
import time

import pyspark.sql.functions as F
import pytest

from anomaly_detection_spark.operators.multimodal import (
    decode_media,
    extract_features,
    media_quality_verdicts,
    sample_frames,
    synthetic_media,
)
from anomaly_detection_spark.sources.synthetic import asset_catalog, documents_interleaved


@pytest.fixture(scope="module")
def media(spark):
    docs = documents_interleaved(spark, 500, n_partitions=2, seed=42)
    return synthetic_media(spark, docs).cache()


def test_media_schema_and_determinism(spark, media):
    assert media.columns == ["media_ref", "kind", "payload", "meta"]
    a = sorted((r["media_ref"], bytes(r["payload"])) for r in media.collect())
    docs = documents_interleaved(spark, 500, n_partitions=2, seed=42)
    b = sorted(
        (r["media_ref"], bytes(r["payload"]))
        for r in synthetic_media(spark, docs).collect()
    )
    assert a == b


def test_decode_media_stub(spark, media):
    d = decode_media(media)
    rows = d.collect()
    assert all(r["decode_ok"] for r in rows)
    img = [r for r in rows if r["kind"] == "image"]
    assert img and all(r["width"] > 0 and r["height"] > 0 and r["n_frames"] == 1 for r in img)
    aud = [r for r in rows if r["kind"] == "audio"]
    assert all(r["sample_rate"] >= 8000 for r in aud)


def test_extract_features_shape_and_norm(spark, media):
    import numpy as np

    feats = extract_features(media).collect()
    assert all(len(r["feature"]) == 64 for r in feats)
    norms = [float(np.linalg.norm(r["feature"])) for r in feats]
    assert all(abs(n - 1.0) < 1e-3 for n in norms)


def test_sample_frames_and_quality(spark, media):
    frames = sample_frames(media, every_n=8).collect()
    assert frames and all(r["frame_idx"] % 8 == 0 and r["frame_idx"] <= r["n_frames"] for r in frames)
    v = {r["kind"]: r["status"] for r in media_quality_verdicts(media).collect()}
    assert set(v.values()) == {"Healthy"}


def test_sample_frames_zero_frame_payload_emits_no_rows():
    from anomaly_detection_spark.operators.multimodal import _sample_frame_rows

    zero = lambda ref, kind, raw: {"n_frames": 0}  # noqa: E731
    assert _sample_frame_rows("v0", b"not-an-avi", 8, probe=zero) == []
    none = lambda ref, kind, raw: {"n_frames": None}  # noqa: E731
    assert _sample_frame_rows("v1", None, 8, probe=none) == []
    # sanity: a probe that DOES see frames still yields metadata-only rows
    some = lambda ref, kind, raw: {"n_frames": 3}  # noqa: E731
    rows = _sample_frame_rows("v2", b"junk", 2, probe=some)
    assert [(r["frame_idx"], r["n_frames"], r["frame_sum"]) for r in rows] == [(0, 3, None), (2, 3, None)]


def test_streaming_incremental_suite(spark, tmp_path):
    from anomaly_detection_spark.sources.catalog import LocalParquetCatalog
    from anomaly_detection_spark.streaming.incremental import (
        read_document_stream,
        stream_incremental_suite,
    )

    docs_dir = str(tmp_path / "docs_in")
    docs = documents_interleaved(spark, 2000, n_partitions=4, seed=42)
    docs.write.mode("overwrite").parquet(docs_dir)
    cat = asset_catalog(spark, 1024)
    store = LocalParquetCatalog(str(tmp_path / "store"))

    stream = read_document_stream(spark, docs_dir, max_files_per_trigger=2)
    q = stream_incremental_suite(stream, cat, store, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    viol = store.read(spark, "_dq_violations")
    lineage = store.read(spark, "_dq_lineage")
    assert viol.count() > 0
    assert lineage.filter(F.col("run_id").startswith("stream-")).count() > 0
    # batch equivalence: streamed violations == batch violations on same input
    from anomaly_detection_spark.operators.referential import ri_violations
    from anomaly_detection_spark.operators.spans import span_violations

    batch = span_violations(docs).select("doc_id", "rule_id").unionByName(
        ri_violations(docs, cat).select("doc_id", F.lit("ri.media_ref").alias("rule_id"))
    )
    got = {(r["doc_id"], r["rule_id"]) for r in viol.select("doc_id", "rule_id").collect()}
    want = {(r["doc_id"], r["rule_id"]) for r in batch.collect()}
    assert got == want

    # exactly-once: restarting the availableNow stream adds nothing
    q2 = stream_incremental_suite(
        read_document_stream(spark, docs_dir, max_files_per_trigger=2),
        cat,
        store,
        str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(60)
    assert viol.count() == len(got)


def test_windowed_volume_stream_semantics(spark, tmp_path):
    """Watermarked 24h windowed volumes: run through a real file stream
    and compare against the batch window aggregation."""
    from anomaly_detection_spark.streaming.incremental import windowed_volume_stream

    src = str(tmp_path / "ev_in")
    rows = spark.range(500).select(
        (F.col("id") % 3).cast("int").alias("partition_id"),
        F.to_timestamp(F.from_unixtime(F.lit(1_700_000_000) + F.col("id") * 600)).alias("event_ts"),
    )
    rows.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("partition_id int, event_ts timestamp").parquet(src)
    out = windowed_volume_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("winvol")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits windows the watermark has closed; compare
    # those against the same batch aggregation
    got = {
        (r["window_start"], r["partition_id"]): r["volume"]
        for r in spark.table("winvol").collect()
    }
    batch = {
        (r["w"]["start"], r["partition_id"]): r["volume"]
        for r in rows.groupBy(F.window("event_ts", "24 hours").alias("w"), "partition_id")
        .agg(F.count(F.lit(1)).alias("volume"))
        .collect()
    }
    for k, v in got.items():
        assert batch[k] == v


def test_stateful_freshness_stream(spark, tmp_path):
    """applyInPandasWithState: per-partition state (last commit, total
    commits) accumulates ACROSS micro-batches — the second batch's
    output reflects state carried from the first."""
    from anomaly_detection_spark.streaming.incremental import stateful_freshness_stream

    in_dir = str(tmp_path / "commits_in")
    os.makedirs(in_dir)
    rows1 = [(p, f"2025-08-15 0{p}:00:00") for p in range(4)]
    rows2 = [(0, "2025-08-15 10:00:00"), (1, "2025-08-14 00:00:00")]  # pid1: OLDER than batch 1
    schema = "partition_id int, ts_str string"
    spark.createDataFrame(rows1, schema).selectExpr(
        "partition_id", "to_timestamp(ts_str) as timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(in_dir + "/b1")
    spark.createDataFrame(rows2, schema).selectExpr(
        "partition_id", "to_timestamp(ts_str) as timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(in_dir + "/b2")

    stream = (
        spark.readStream.schema("partition_id int, timestamp timestamp")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )
    out_dir = str(tmp_path / "out")
    q = (
        stateful_freshness_stream(stream, threshold_sec=10**9)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.parquet(out_dir).collect()
    by_pid = {}
    for r in out:
        by_pid.setdefault(r["partition_id"], []).append(r)
    # pid 0 appears in both batches → the later emission shows n=2 and
    # the newer last_commit; state accumulated across batches
    p0 = sorted(by_pid[0], key=lambda r: r["n_commits"])
    assert [r["n_commits"] for r in p0] == [1, 2]
    assert str(p0[-1]["last_commit"]).startswith("2025-08-15 10:00:00")
    # pid 1's second batch is OLDER → last_commit keeps the batch-1 max
    p1 = sorted(by_pid[1], key=lambda r: r["n_commits"])
    assert [r["n_commits"] for r in p1] == [1, 2]
    assert str(p1[-1]["last_commit"]).startswith("2025-08-15 01:00:00")
    # generous threshold → no staleness alarms in the data path
    assert all(r["status"] == "Healthy" for r in out)


class _FakeGroupState:
    """Minimal GroupState double: exists/get/update/setTimeoutDuration/
    hasTimedOut — enough to drive _freshness_monitor's both branches."""

    def __init__(self, value=None):
        self._v = value
        self.hasTimedOut = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms


def test_stateful_freshness_timeout_branch():
    """The hasTimedOut path (a partition going silent past the
    threshold) emits the Unhealthy staleness row from state alone and
    re-arms the timeout — driven by a fake GroupState because
    availableNow triggers can never idle into a timeout."""
    import pandas as pd

    from anomaly_detection_spark.streaming.incremental import _freshness_monitor

    st = _FakeGroupState()
    batch = pd.DataFrame({"timestamp": pd.to_datetime([1000, 2000], unit="s")})
    out = list(_freshness_monitor((3,), iter([batch]), st, 3600, "timestamp"))
    row = out[0].iloc[0]
    assert row["status"] == "Healthy" and row["n_commits"] == 2
    assert st.get == (2000.0, 2)
    assert st.timeout_ms == 3600 * 1000

    # silence: the processing-time timeout fires with no new data
    st.hasTimedOut = True
    st.timeout_ms = None
    out2 = list(_freshness_monitor((3,), iter([]), st, 3600, "timestamp"))
    row2 = out2[0].iloc[0]
    assert row2["status"] == "Unhealthy"
    assert row2["n_commits"] == 2
    assert row2["last_commit"] == pd.Timestamp(2000, unit="s")
    assert st.timeout_ms == 3600 * 1000  # re-armed for the next window

    # recovery: a later commit folds on top of the timed-out state
    st.hasTimedOut = False
    batch2 = pd.DataFrame({"timestamp": pd.to_datetime([5000], unit="s")})
    out3 = list(_freshness_monitor((3,), iter([batch2]), st, 3600, "timestamp"))
    row3 = out3[0].iloc[0]
    assert row3["status"] == "Healthy" and row3["n_commits"] == 3
    assert st.get == (5000.0, 3)


def test_parse_ppm_roundtrip_and_malformed():
    """Pure-numpy P6 decoder: exact roundtrip incl. comments; malformed
    headers/truncated rasters return None (callers fall back, no crash)."""
    import numpy as np

    from anomaly_detection_spark.operators.multimodal import _parse_ppm

    w, h = 5, 3
    px = (np.arange(3 * w * h) % 256).astype(np.uint8)
    payload = f"P6\n{w} {h}\n255\n".encode() + px.tobytes()
    got = _parse_ppm(payload)
    assert got is not None
    gw, gh, gpx = got
    assert (gw, gh) == (w, h) and (gpx == px).all()
    # comments between header tokens are legal PPM
    commented = b"P6\n# made by a camera\n5 3\n# maxval next\n255\n" + px.tobytes()
    cw, ch, cpx = _parse_ppm(commented)
    assert (cw, ch) == (w, h) and (cpx == px).all()
    assert _parse_ppm(b"") is None
    assert _parse_ppm(b"P5\n5 3\n255\n" + px.tobytes()) is None  # greyscale magic
    assert _parse_ppm(f"P6\n{w} {h}\n65535\n".encode() + px.tobytes()) is None  # 16-bit
    assert _parse_ppm(f"P6\n{w} {h}\n255\n".encode() + px.tobytes()[:-1]) is None  # short
    assert _parse_ppm(b"P6\nxx 3\n255\n" + px.tobytes()) is None  # non-int dim


def test_parse_wav_roundtrip_and_malformed():
    """Pure-numpy RIFF/WAV PCM decoder: exact roundtrip incl. an extra
    chunk before data; non-PCM/truncated/8-bit payloads return None."""
    import numpy as np

    from anomaly_detection_spark.operators.multimodal import _parse_wav

    def wav(ch, rate, samples, fmt_tag=1, bits=16, extra=b""):
        data = samples.astype("<i2").tobytes()
        return (
            b"RIFF" + (36 + len(extra) + len(data)).to_bytes(4, "little") + b"WAVE"
            + b"fmt " + (16).to_bytes(4, "little")
            + fmt_tag.to_bytes(2, "little") + ch.to_bytes(2, "little")
            + rate.to_bytes(4, "little") + (rate * ch * 2).to_bytes(4, "little")
            + (ch * 2).to_bytes(2, "little") + bits.to_bytes(2, "little")
            + extra
            + b"data" + len(data).to_bytes(4, "little") + data
        )

    s = np.array([0, 100, -200, 32767, -32768, 7], dtype=np.int64)
    got = _parse_wav(wav(2, 44100, s))
    assert got is not None
    rate, ch, samples = got
    assert (rate, ch) == (44100, 2) and (samples == s).all()
    # a LIST chunk (odd size -> pad byte) before data must be skipped
    extra = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
    rate2, ch2, samples2 = _parse_wav(wav(1, 8000, s, extra=extra))
    assert (rate2, ch2) == (8000, 1) and (samples2 == s).all()
    assert _parse_wav(b"") is None
    assert _parse_wav(b"RIFF\x00\x00\x00\x00AVI LIST") is None  # not WAVE
    assert _parse_wav(wav(1, 8000, s, fmt_tag=3)) is None  # IEEE float
    assert _parse_wav(wav(1, 8000, s, bits=8)) is None  # 8-bit PCM
    assert _parse_wav(wav(1, 8000, s)[:-3]) is None  # truncated data chunk


def test_parse_png_roundtrip_and_malformed():
    """Pure stdlib+numpy PNG decoder: roundtrip through a reference
    encoder exercising ALL five filter types; CRC corruption, wrong
    colortype and truncation must return None (not raise)."""
    import numpy as np

    from anomaly_detection_spark.operators.multimodal import _parse_png, _PNG_SIG
    import zlib

    def encode(w, h, px, filters):
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

        def chunk(typ, data):
            return (len(data).to_bytes(4, "big") + typ + data
                    + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big"))

        ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
        return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", comp) + chunk(b"IEND", b"")

    rng = np.random.RandomState(7)
    w, h = 6, 7
    px = rng.randint(0, 256, 3 * w * h).astype(np.uint8)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        payload = encode(w, h, px, filters)
        got = _parse_png(payload)
        assert got is not None, filters
        gw, gh, gpx = got
        assert (gw, gh) == (w, h) and (gpx == px).all(), filters
    payload = encode(w, h, px, [0, 1, 2, 3, 4])
    assert _parse_png(b"") is None
    assert _parse_png(payload[:-1]) is None  # truncated IEND
    corrupted = bytearray(payload)
    corrupted[40] ^= 0xFF  # flip a byte inside IDAT -> CRC mismatch
    assert _parse_png(bytes(corrupted)) is None
    # RGBA colortype must fall back (we only claim truecolor RGB)
    rgba = bytearray(payload)
    rgba[8 + 8 + 9] = 6  # IHDR colortype byte
    assert _parse_png(bytes(rgba)) is None  # (CRC also now wrong)


def test_parse_avi_roundtrip_and_malformed():
    """Pure-numpy uncompressed-AVI decoder: exact roundtrip of the
    planted builder's output; non-AVI RIFF, truncated movi, and
    compressed-codec payloads return None."""
    import numpy as np

    from anomaly_detection_spark.operators.multimodal import _parse_avi

    # build one planted-formula video payload by hand
    k = 5  # k % 3 == 2 -> video
    w, h, nf = 4 * (1 + k % 4), 2 + k % 5, 2 + k % 4
    i = np.arange(3 * w * h, dtype=np.int64)

    def chunk(cid, body):
        pad = b"\x00" if len(body) & 1 else b""
        return cid + len(body).to_bytes(4, "little") + body + pad

    frames = [((k * 29 + f * 13 + i * 5) % 256).astype(np.uint8).tobytes() for f in range(nf)]
    fsize = len(frames[0])
    avih = b"".join(
        v.to_bytes(4, "little")
        for v in [40000, fsize * 25, 0, 0x10, nf, 0, 1, fsize, w, h, 0, 0, 0, 0]
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
    assert (gw, gh, gu, len(gframes)) == (w, h, 40000, nf)
    want = sum(int(((k * 29 + f * 13 + i * 5) % 256).sum()) for f in range(nf))
    assert sum(int(f.astype(np.int64).sum()) for f in gframes) == want
    assert _parse_avi(b"") is None
    assert _parse_avi(b"RIFF\x10\x00\x00\x00WAVEfmt ") is None  # not AVI
    assert _parse_avi(payload[:-5]) is None  # truncated movi chunk
    # compressed codec (biCompression != 0) must NOT pretend to decode
    compressed = payload.replace(
        (0).to_bytes(4, "little") + fsize.to_bytes(4, "little") + (0).to_bytes(16, "little"),
        b"MJPG" + fsize.to_bytes(4, "little") + (0).to_bytes(16, "little"),
        1,
    )
    assert _parse_avi(compressed) is None


def test_planted_media_decodes_for_real(spark):
    """decode_media / image_stats / audio_stats / video_stats must
    recover the planted dims, rates, frame counts and exact integer
    sums from the BINARY payloads (real codec paths for all three
    kinds)."""
    import numpy as np

    from anomaly_detection_spark.operators.multimodal import (
        audio_stats,
        decode_media,
        image_stats,
        planted_media,
        video_stats,
    )

    media = planted_media(spark, 30).cache()
    decoded = {r["media_ref"]: r for r in decode_media(media).collect()}
    stats = {r["media_ref"]: r for r in image_stats(media).collect()}
    astats = {r["media_ref"]: r for r in audio_stats(media).collect()}
    vstats = {r["media_ref"]: r for r in video_stats(media).collect()}
    assert len(stats) == 10  # k % 3 == 0
    assert len(astats) == 10  # k % 3 == 1
    assert len(vstats) == 10  # k % 3 == 2
    # images alternate containers: even k -> raw PPM, odd k -> zlib PNG
    payloads = {
        r["media_ref"]: bytes(r["payload"])
        for r in media.filter("kind = 'image'").collect()
    }
    for k in range(0, 30, 3):
        want_sig = b"\x89PNG" if k % 2 else b"P6"
        assert payloads[f"asset-{k}"].startswith(want_sig), k
    for k in range(0, 30, 3):
        w, h = 4 + k % 13, 3 + k % 7
        i = np.arange(3 * w * h, dtype=np.int64)
        want_sum = int(((k * 31 + i * 7) % 256).sum())
        d, s = decoded[f"asset-{k}"], stats[f"asset-{k}"]
        assert (d["width"], d["height"], d["n_frames"], d["decode_ok"]) == (w, h, 1, True)
        assert (s["width"], s["height"], s["n_pixels"], s["sum_rgb"], s["decode_ok"]) == (
            w, h, w * h, want_sum, True,
        )
    for k in range(1, 30, 3):
        ch, rate, frames = 1 + k % 2, 8000 + (k % 5) * 2000, 40 + k % 50
        i = np.arange(ch * frames, dtype=np.int64)
        want_abs = int(np.abs((k * 37 + i * 11) % 4001 - 2000).sum())
        d, a = decoded[f"asset-{k}"], astats[f"asset-{k}"]
        assert (d["sample_rate"], d["duration_ms"], d["decode_ok"]) == (
            rate, frames * 1000 // rate, True,
        )
        assert (
            a["sample_rate"], a["n_channels"], a["n_frames"],
            a["duration_ms"], a["sum_abs"], a["decode_ok"],
        ) == (rate, ch, frames, frames * 1000 // rate, want_abs, True)
    for k in range(2, 30, 3):
        w, h, nf = 4 * (1 + k % 4), 2 + k % 5, 2 + k % 4
        i = np.arange(3 * w * h, dtype=np.int64)
        want_rgb = sum(int(((k * 29 + f * 13 + i * 5) % 256).sum()) for f in range(nf))
        d, v = decoded[f"asset-{k}"], vstats[f"asset-{k}"]
        assert (d["width"], d["height"], d["n_frames"], d["duration_ms"], d["decode_ok"]) == (
            w, h, nf, nf * 40, True,
        )
        assert (
            v["width"], v["height"], v["n_frames"], v["duration_ms"], v["sum_rgb"], v["decode_ok"],
        ) == (w, h, nf, nf * 40, want_rgb, True)
    media.unpersist()


def test_resize_and_sample_frames_real_paths(spark):
    """resize_images must actually resample decodable pixels (nearest-
    neighbor index math on PPM and PNG inputs, re-emitted as PPM) and
    sample_frames must slice + sum the REAL sampled frames out of
    planted AVI payloads."""
    import numpy as np

    from anomaly_detection_spark.operators.multimodal import (
        _parse_ppm,
        planted_media,
        resize_images,
        sample_frames,
    )

    media = planted_media(spark, 30).cache()
    tw, th = 8, 5
    resized = {
        r["media_ref"]: r for r in resize_images(media, target_w=tw, target_h=th).collect()
    }
    assert len(resized) == 10
    for k in range(0, 30, 3):  # both PPM (even k) and PNG (odd k) inputs
        r = resized[f"asset-{k}"]
        assert r["meta"]["resize"] == "nearest" and r["meta"]["resized_to"] == f"{tw}x{th}"
        got = _parse_ppm(bytes(r["payload"]))
        assert got is not None
        gw, gh, gpx = got
        assert (gw, gh) == (tw, th)
        w, h = 4 + k % 13, 3 + k % 7
        out = gpx.reshape(th, tw, 3)
        for y in (0, th - 1):
            for x in (0, tw - 1):
                sy, sx = y * h // th, x * w // tw
                for c in range(3):
                    src_i = 3 * (sy * w + sx) + c
                    assert out[y, x, c] == (k * 31 + src_i * 7) % 256, (k, y, x, c)

    frames = sample_frames(media, every_n=2).collect()
    by_ref: dict = {}
    for r in frames:
        by_ref.setdefault(r["media_ref"], []).append(r)
    assert len(by_ref) == 10
    for k in range(2, 30, 3):
        w, h, nf = 4 * (1 + k % 4), 2 + k % 5, 2 + k % 4
        i = np.arange(3 * w * h, dtype=np.int64)
        rows = sorted(by_ref[f"asset-{k}"], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in rows] == list(range(0, nf, 2))
        for r in rows:
            want = int(((k * 29 + r["frame_idx"] * 13 + i * 5) % 256).sum())
            assert (r["n_frames"], r["frame_sum"]) == (nf, want), (k, r["frame_idx"])
    media.unpersist()


def test_stream_exact_dedup_drops_in_horizon_copies(spark, tmp_path):
    """Planted dup bursts across micro-batch files: the first arrival
    of each fingerprint survives, later copies (same normalized text,
    different ids/whitespace) are dropped; distinct texts all pass."""
    from datetime import datetime, timedelta

    from anomaly_detection_spark.streaming.incremental import stream_exact_dedup

    src = tmp_path / "src"
    src.mkdir()
    base = datetime(2025, 8, 16)
    # file 1: three distinct docs; file 2: dups of doc 0/1 (normalized-
    # equal text) + one new; file 3: another dup of doc 0
    batches = [
        [(0, "alpha beta gamma", base), (1, "delta epsilon", base), (2, "zeta eta", base),
         (3, None, base), (4, None, base)],  # distinct null-text records must BOTH survive
        [(10, "Alpha  beta   GAMMA", base + timedelta(hours=1)), (11, "delta epsilon", base + timedelta(hours=1)), (12, "theta iota", base + timedelta(hours=1))],
        [(20, "alpha beta gamma", base + timedelta(hours=2))],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "doc_id long, text string, event_ts timestamp").coalesce(
            1
        ).write.parquet(str(src / f"b{i}"))
    stream = spark.readStream.schema("doc_id long, text string, event_ts timestamp").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src) + "/*")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    deduped = stream_exact_dedup(stream)

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = deduped.writeStream.foreachBatch(sink).option("checkpointLocation", ckpt).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    # survivors: first arrivals only, plus BOTH null-text records
    # (null fingerprints get per-id sentinels, never collapse)
    assert got == {0, 1, 2, 3, 4, 12}
