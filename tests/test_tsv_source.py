"""S4/S11: TSV segment scan with end-1 adjustment + TSV sink round-trip."""

from __future__ import annotations

from near_duplicate_detection_spark.sources.tsv import read_segments, write_segments


def test_tsv_scan_end_minus_one(spark, tmp_path):
    p = tmp_path / "shots.tsv"
    p.write_text("0\t4960\t0\n4960\t7280\t1\n7280\t9000\t2\n")
    out = read_segments(spark, str(p)).orderBy("segment_id").toPandas()
    assert list(out.begin_ms) == [0, 4960, 7280]
    assert list(out.end_ms) == [4959, 7279, 8999]  # end-exclusive → inclusive


def test_tsv_roundtrip(spark, tmp_path):
    src = tmp_path / "in.tsv"
    src.write_text("0\t100\t0\n100\t250\t1\n")
    df = read_segments(spark, str(src))
    out_dir = tmp_path / "out"
    write_segments(df, str(out_dir))
    back = read_segments(spark, str(out_dir)).orderBy("segment_id").toPandas()
    # second read applies end-1 again on already-adjusted values
    assert list(back.end_ms) == [98, 248]
    assert list(back.begin_ms) == [0, 100]
