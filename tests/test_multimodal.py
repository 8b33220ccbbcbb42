"""Multimodal plumbing: schemas, 1→N frame expansion, deterministic stub
features (decode layer stubbed per task contract — no media libs in image)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from near_duplicate_detection_spark.operators.multimodal import (
    EMBED_DIM,
    FRAMES_SCHEMA,
    HAS_REAL_CODEC,
    MEDIA_SCHEMA,
    _decode_stub,
    default_codec,
    extract_features,
    resize_meta,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("vid1", "video", b"payload-one", (640, 360, 3500)),
        ("vid2", "video", b"payload-two", (1920, 1080, 900)),
        ("img1", "image", b"img-bytes", (800, 600, 0)),
    ]
    pdf = pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])
    return spark.createDataFrame(pdf, MEDIA_SCHEMA).localCheckpoint()


def test_frame_sampling_one_per_interval(spark, media):
    frames = sample_frames(media, frame_interval_ms=1000).toPandas()
    per = frames.groupby("media_id").size().to_dict()
    # ceil(duration/1000) frames, min 1 (ts grid 0..duration-1 step 1000)
    assert per == {"vid1": 4, "vid2": 1, "img1": 1}
    v1 = frames[frames.media_id == "vid1"].sort_values("frame_idx")
    assert list(v1.ts_ms) == [0, 1000, 2000, 3000]
    assert all(len(p) > 0 for p in frames.payload)


def test_features_deterministic_and_normalized(spark, media):
    frames = sample_frames(media).localCheckpoint()
    f1 = extract_features(frames).toPandas()
    f2 = extract_features(frames).toPandas()
    assert len(f1) == len(f2) == 6
    key = ["media_id", "frame_idx"]
    a = f1.sort_values(key, ignore_index=True)
    b = f2.sort_values(key, ignore_index=True)
    for x, y in zip(a.embedding, b.embedding):
        assert np.allclose(x, y)
        assert len(x) == EMBED_DIM
        assert abs(np.linalg.norm(x) - 1.0) < 1e-5  # L2-normalized


def test_default_codec_matches_environment(spark, media):
    """The optional-dependency seam: without PIL the default codec IS the
    deterministic stub (and the pipelines' default argument equals it);
    with PIL it is the real decoder. Either way the stub path stays
    byte-stable — passing codec=_decode_stub explicitly must reproduce the
    default (stub) output exactly."""
    codec = default_codec()
    if HAS_REAL_CODEC:
        assert codec is not _decode_stub
    else:
        assert codec is _decode_stub
    frames_default = sample_frames(media).toPandas()
    frames_stub = sample_frames(media, codec=_decode_stub).toPandas()
    key = ["media_id", "frame_idx"]
    a = frames_default.sort_values(key, ignore_index=True)
    b = frames_stub.sort_values(key, ignore_index=True)
    assert [bytes(x) for x in a.payload] == [bytes(y) for y in b.payload]


@pytest.mark.skipif(not HAS_REAL_CODEC, reason="PIL not installed in sandbox")
def test_real_codec_end_to_end(spark):
    """Activates when PIL is installed (round-2 verdict next-round #7): a
    real PNG flows through the same Spark plumbing — frame sampling slices
    actual decoded pixels, and feature extraction embeds the decoded
    thumbnail — with the same schemas, batch shapes, and normalization
    contract the stub path pins."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    px = np.arange(32 * 32, dtype=np.uint8).reshape(32, 32)
    Image.fromarray(px, mode="L").save(buf, format="PNG")
    payload = buf.getvalue()
    media = spark.createDataFrame(
        pd.DataFrame(
            [("png1", "image", payload, (32, 32, 0))],
            columns=["media_id", "kind", "payload", "meta"],
        ),
        MEDIA_SCHEMA,
    )
    codec = default_codec()
    frames = sample_frames(media, codec=codec).toPandas()
    assert len(frames) == 1
    decoded = codec(payload)
    assert decoded.shape == (16, 16) and decoded.dtype == np.uint8
    assert bytes(frames.payload.iloc[0])[:64] == decoded.tobytes()[:64]
    # features over encoded-image frame payloads: the frames table stores
    # the ORIGINAL encoded bytes (a real frames sink would re-encode each
    # frame) so the codec can decode them again
    enc_frames = spark.createDataFrame(
        pd.DataFrame(
            [("png1", 0, 0, payload)],
            columns=["media_id", "frame_idx", "ts_ms", "payload"],
        ),
        FRAMES_SCHEMA,
    )
    feats = extract_features(enc_frames, codec=codec).toPandas()
    assert len(feats) == 1
    emb = feats.embedding.iloc[0]
    assert len(emb) == EMBED_DIM
    assert abs(np.linalg.norm(emb) - 1.0) < 1e-5


def test_resize_meta_aspect_preserving(spark, media):
    out = resize_meta(media, max_side=224).toPandas().set_index("media_id")
    assert out.loc["vid1", "out_w"] == 224
    assert out.loc["vid1", "out_h"] == 126  # 360 * 224/640
    assert out.loc["vid2", "out_h"] == 126  # 1080 * 224/1920
    assert out.loc["img1", "out_w"] == 224


# ------------------------------------------------------------------ audio


def _audio_df(spark):
    from near_duplicate_detection_spark.operators.multimodal import (
        AUDIO_SCHEMA,
    )

    rng = np.random.RandomState(7)
    # 2 s at 1 kHz, one window short of exact; plus a sub-window clip
    a1 = rng.randint(-128, 128, size=2000, dtype=np.int64).astype(np.int8)
    a2 = np.array([5, -5, 5, -5], dtype=np.int8)
    rows = [
        ("au1", a1.tobytes(), (1000, 2000)),
        ("au2", a2.tobytes(), (1000, 4)),
    ]
    pdf = pd.DataFrame(rows, columns=["media_id", "payload", "meta"])
    return spark.createDataFrame(pdf, AUDIO_SCHEMA).localCheckpoint(), a1, a2


def test_audio_window_grid_and_features(spark):
    from near_duplicate_detection_spark.operators.multimodal import (
        sample_audio_windows,
    )

    df, a1, a2 = _audio_df(spark)
    out = sample_audio_windows(df, window_ms=500).toPandas()
    # au1: 2000 samples / 500-sample windows -> 4; au2: 4 samples -> 1
    per = out.groupby("media_id").size().to_dict()
    assert per == {"au1": 4, "au2": 1}
    w1 = out[out.media_id == "au1"].sort_values("window_idx")
    assert list(w1.start_ms) == [0, 500, 1000, 1500]
    # numpy oracle for each window's energy + zero crossings
    for i, row in enumerate(w1.itertuples()):
        w = a1[i * 500 : (i + 1) * 500].astype(np.int32)
        assert abs(row.energy - np.abs(w).mean()) < 1e-3
        assert row.zero_crossings == int(((w[:-1] * w[1:]) < 0).sum())
    w2 = out[out.media_id == "au2"].iloc[0]
    assert w2.zero_crossings == 3  # alternating signs


def test_audio_long_clip_no_int32_overflow(spark):
    """Round-4 ADVICE high: start_ms was computed in int32 (both grid
    columns arrive as int32 from Arrow) and wrapped negative once
    window_idx*spw*1000 crossed 2**31 — i.e. any clip past ~49 s at
    44.1 kHz. A 60 s 44.1 kHz clip must yield start_ms 0..59500 ascending,
    never negative, with the tail windows at exactly 59000/59500 ms."""
    from near_duplicate_detection_spark.operators.multimodal import (
        AUDIO_SCHEMA,
        sample_audio_windows,
    )

    rate, secs = 44100, 60
    n = rate * secs
    samples = np.resize(
        np.array([7, -7, 3, -3], dtype=np.int8), n
    )  # deterministic, cheap to build
    df = spark.createDataFrame(
        pd.DataFrame(
            [("long1", samples.tobytes(), (rate, n))],
            columns=["media_id", "payload", "meta"],
        ),
        AUDIO_SCHEMA,
    )
    out = (
        sample_audio_windows(df, window_ms=500)
        .toPandas()
        .sort_values("window_idx", ignore_index=True)
    )
    assert len(out) == 120  # 60 s / 500 ms
    assert (out.start_ms >= 0).all()
    assert list(out.start_ms) == [i * 500 for i in range(120)]
    # the previously-overflowing region (windows >= 98, start >= 49 s)
    assert out.start_ms.iloc[-2:].tolist() == [59000, 59500]
    # features in the deep region still match numpy on the real slice
    spw = rate // 2
    w = samples[118 * spw : 119 * spw].astype(np.int32)
    row = out.iloc[118]
    assert abs(row.energy - np.abs(w).mean()) < 1e-3
    assert row.zero_crossings == int(((w[:-1] * w[1:]) < 0).sum())


def test_audio_codec_decodes_once_per_doc(spark):
    """Round-4 VERDICT next-round #1: the grid explodes before the Arrow
    boundary, so the same payload reaches the kernel once per window row.
    A counting codec must be invoked once per DISTINCT media_id per batch
    — not once per window row — and frombuffer must not run at all when a
    codec is supplied (its work would be discarded)."""
    import tempfile

    from near_duplicate_detection_spark.operators.multimodal import (
        AUDIO_SCHEMA,
        sample_audio_windows,
    )

    path = tempfile.NamedTemporaryFile(
        mode="r", suffix=".cnt", delete=False
    ).name

    def counting_codec(payload: bytes) -> np.ndarray:
        # executor-side: append one line per invocation (local[*] shares
        # the filesystem with the driver)
        with open(path, "a") as f:
            f.write("x\n")
        return np.frombuffer(payload, dtype=np.int8)
    rng = np.random.RandomState(3)
    rows = [
        (
            f"doc{i}",
            rng.randint(-128, 128, size=3000, dtype=np.int64)
            .astype(np.int8)
            .tobytes(),
            (1000, 3000),
        )
        for i in range(5)
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "payload", "meta"]),
        AUDIO_SCHEMA,
    ).coalesce(1)  # one partition -> one Arrow batch stream
    out = sample_audio_windows(df, window_ms=500, codec=counting_codec).toPandas()
    assert len(out) == 5 * 6  # 3000 samples / 500-sample windows
    with open(path) as f:
        invocations = sum(1 for _ in f)
    # one decode per distinct doc, not per window row (30)
    assert invocations == 5


def test_frame_codec_decodes_once_per_doc(spark, media):
    """Image/video face of the same memo: sample_frames must decode each
    media_id once per batch even though the ts grid fans one payload out to
    many frame rows."""
    import tempfile

    counts_file = tempfile.NamedTemporaryFile(
        mode="r", suffix=".cnt", delete=False
    )
    path = counts_file.name

    def counting_codec(payload: bytes) -> np.ndarray:
        with open(path, "a") as f:
            f.write("x\n")
        return _decode_stub(payload)

    frames = sample_frames(media.coalesce(1), codec=counting_codec).toPandas()
    assert len(frames) == 6  # vid1:4, vid2:1, img1:1
    with open(path) as f:
        invocations = sum(1 for _ in f)
    assert invocations == 3  # one per media_id, not per frame
    # output identical to the un-memoized stub path
    plain = sample_frames(media, codec=_decode_stub).toPandas()
    key = ["media_id", "frame_idx"]
    a = frames.sort_values(key, ignore_index=True)
    b = plain.sort_values(key, ignore_index=True)
    assert [bytes(x) for x in a.payload] == [bytes(y) for y in b.payload]


def test_audio_windows_expansion_is_jvm_side(spark):
    """The 1->N window grid must be an explode(sequence) BEFORE the Arrow
    eval — one Python boundary, no per-window Python rows generation."""
    from near_duplicate_detection_spark.operators.multimodal import (
        sample_audio_windows,
    )

    df, _, _ = _audio_df(spark)
    plan = sample_audio_windows(
        df, window_ms=500
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    assert "Generate explode" in plan
