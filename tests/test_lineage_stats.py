"""StageCatalog.distinct_values must be a pure parquet-STATISTICS read:
exact for constant-per-file stamp columns, conservative (refusing) for
mixed stamps, and never decoding data pages (round-3 regression: the
previous implementation pulled the whole column to the driver)."""

from __future__ import annotations

from near_duplicate_detection_spark.lineage import StageCatalog


def _write(spark, cat, table, rows, mode="overwrite"):
    df = spark.createDataFrame(rows, "url string, cfg_hash string")
    cat.write(df, table, mode=mode)


def test_constant_stamp_reads_single_value(spark, tmp_path):
    cat = StageCatalog(spark, str(tmp_path))
    _write(spark, cat, "seen", [(f"u{i}", "abc123") for i in range(500)])
    assert cat.distinct_values("seen", "cfg_hash") == {"abc123"}


def test_mixed_stamps_refuse_equality(spark, tmp_path):
    """Appended files stamped under different params must widen the set —
    the delta guards compare against ONE expected hash and must refuse."""
    cat = StageCatalog(spark, str(tmp_path))
    _write(spark, cat, "seen", [(f"u{i}", "hash_old") for i in range(100)])
    _write(
        spark, cat, "seen", [(f"v{i}", "hash_new") for i in range(100)],
        mode="append",
    )
    got = cat.distinct_values("seen", "cfg_hash")
    assert got == {"hash_old", "hash_new"}
    assert got != {"hash_new"}


def test_mixed_within_one_file_refuses(spark, tmp_path):
    """A single file with two stamps has min != max in its row group — the
    stats read surfaces both bounds, so the equality guard still refuses."""
    cat = StageCatalog(spark, str(tmp_path))
    rows = [(f"u{i}", "aaaa") for i in range(50)] + [
        (f"v{i}", "zzzz") for i in range(50)
    ]
    df = spark.createDataFrame(rows, "url string, cfg_hash string").coalesce(1)
    cat.write(df, "seen")
    got = cat.distinct_values("seen", "cfg_hash")
    assert "aaaa" in got and "zzzz" in got and len(got) >= 2


def test_absent_column_empty_set(spark, tmp_path):
    cat = StageCatalog(spark, str(tmp_path))
    _write(spark, cat, "seen", [("u1", "h")])
    assert cat.distinct_values("seen", "nope") == set()


def test_null_stamp_is_conservative(spark, tmp_path):
    """NULL stamps (never written by the engine) must refuse, not pass."""
    cat = StageCatalog(spark, str(tmp_path))
    df = spark.createDataFrame(
        [("u1", "h"), ("u2", None)], "url string, cfg_hash string"
    ).coalesce(1)
    cat.write(df, "seen")
    got = cat.distinct_values("seen", "cfg_hash")
    assert got != {"h"}  # the None sentinel (or widened set) refuses


def test_stats_read_decodes_no_data_pages():
    """Belt: the implementation must never materialize the column
    (`to_table`) — only fragment metadata / row-group statistics
    (pyarrow dataset types are immutable C extensions, so this is a
    source-level check rather than a monkeypatch)."""
    import inspect

    src = inspect.getsource(StageCatalog.distinct_values)
    assert "to_table(" not in src  # the docstring cites it; the code may not
    assert "statistics" in src
