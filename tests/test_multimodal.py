"""Multimodal plumbing: schemas, 1→N frame expansion, deterministic stub
features (decode layer stubbed per task contract — no media libs in image)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from near_duplicate_detection_spark.operators.multimodal import (
    EMBED_DIM,
    MEDIA_SCHEMA,
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


def test_resize_meta_aspect_preserving(spark, media):
    out = resize_meta(media, max_side=224).toPandas().set_index("media_id")
    assert out.loc["vid1", "out_w"] == 224
    assert out.loc["vid1", "out_h"] == 126  # 360 * 224/640
    assert out.loc["vid2", "out_h"] == 126  # 1080 * 224/1920
    assert out.loc["img1", "out_w"] == 224
