"""Train/test decontamination (operators/decontaminate.py): planted
benchmark overlap is found exactly, clean corpora pass untouched, and the
physical plan keeps the corpus on the map side (benchmark broadcast, no
sort-merge join anywhere — the asymmetry the operator exists to exploit)."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_duplicate_detection_spark.operators.decontaminate import (
    benchmark_shingles,
    contamination_hits,
    decontaminate,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


WORDS = [f"w{i:03d}" for i in range(40)]


def test_planted_contamination_found_exactly(spark):
    # doc a contains the benchmark item verbatim mid-text; doc b shares
    # nothing; doc c shares a 7-token run — one short of k=8
    bench_run = " ".join(WORDS[10:22])  # 12 tokens -> 5 distinct 8-shingles
    docs = _docs(
        spark,
        [
            ("a", " ".join(WORDS[:5]) + " " + bench_run + " tail tok"),
            ("b", " ".join(WORDS[25:40])),
            ("c", " ".join(WORDS[10:17]) + " zzz " + " ".join(WORDS[30:38])),
        ],
    )
    bench = _docs(spark, [("q1", bench_run)]).select("text")
    hits = {
        r["url"]: r["n_hits"]
        for r in contamination_hits(docs, bench, k=8).collect()
    }
    assert hits == {"a": 5}  # 12-token run = 12-8+1 = 5 shingles, all hit
    kept = sorted(
        r["url"] for r in decontaminate(docs, bench, k=8).collect()
    )
    assert kept == ["b", "c"]


def test_short_benchmark_item_still_findable(spark):
    # a benchmark item below k tokens becomes ONE whole-stream shingle;
    # it hits only a doc containing exactly that run as a full k'-window —
    # here doc text IS the item (the degenerate-guard parity case)
    item = " ".join(WORDS[:4])
    docs = _docs(spark, [("a", item), ("b", item + " " + WORDS[9])])
    bench = _docs(spark, [("q", item)]).select("text")
    hits = {
        r["url"]: r["n_hits"]
        for r in contamination_hits(docs, bench, k=8).collect()
    }
    # doc a: whole stream == item -> hit; doc b: 5 tokens -> whole-stream
    # shingle != item -> clean
    assert hits == {"a": 1}


def test_min_hits_threshold(spark):
    bench_run = " ".join(WORDS[0:22])
    docs = _docs(
        spark,
        [
            ("heavy", bench_run),  # many shared shingles
            ("light", " ".join(WORDS[0:8]) + " qqq " + " ".join(WORDS[30:38])),
        ],
    )
    bench = _docs(spark, [("q", bench_run)]).select("text")
    # light shares exactly ONE shingle (WORDS[0:8]) with the benchmark:
    # min_hits=2 spares it, min_hits=1 drops both
    assert sorted(
        r["url"] for r in decontaminate(docs, bench, k=8, min_hits=2).collect()
    ) == ["light"]
    assert (
        decontaminate(docs, bench, k=8, min_hits=1).count() == 0
    )


def test_clean_corpus_untouched_and_plan_broadcasts(spark):
    docs = _docs(
        spark, [(f"d{i}", " ".join(WORDS[i : i + 6])) for i in range(20)]
    )
    bench = _docs(spark, [("q", "xxx yyy zzz www vvv uuu ttt sss")]).select(
        "text"
    )
    out = decontaminate(docs, bench, k=8)
    assert out.count() == 20
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # benchmark side broadcast
    assert "SortMergeJoin" not in plan  # corpus never shuffle-joined
    # the benchmark shingle set is tiny and distinct
    assert benchmark_shingles(bench, k=8).count() == 1
