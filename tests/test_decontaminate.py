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


def test_nonempty_hitset_antijoin_broadcast_at_runtime(spark):
    """With a NON-empty (but small) hit set, AQE must still keep the
    corpus map-side: the un-hinted anti-join converts to a broadcast hash
    join at runtime from the hit set's actual post-agg size."""
    bench_run = " ".join(WORDS[10:22])
    docs = _docs(
        spark,
        [("hit", bench_run)]
        + [(f"d{i}", " ".join(WORDS[i : i + 6])) for i in range(20)],
    )
    bench = _docs(spark, [("q", bench_run)]).select("text")
    out = decontaminate(docs, bench, k=8)
    assert len(out.collect()) == 20  # 'hit' dropped
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    final = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final and "LeftAnti" in final
    assert "SortMergeJoin" not in final


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
    assert len(out.collect()) == 20
    # Round-4 ADVICE: the hit-set anti-join no longer carries a FORCED
    # broadcast hint (a pathologically contaminated corpus would OOM).
    # Contract now: AQE decides at runtime. Here the hit set is EMPTY, so
    # the final adaptive plan eliminates the anti-join outright
    # (empty-relation propagation) — the corpus must never cross a
    # sort-merge join. Only the FINAL plan section counts: the printed
    # string also embeds the pre-AQE "Initial Plan" which legitimately
    # contains the static SortMergeJoin.
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan  # collect() finalized AQE
    final = plan.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in final
    # benchmark-shingle side of contamination_hits keeps its forced
    # broadcast (genuinely benchmark-sized): visible in the initial plan
    assert "BroadcastHashJoin" in plan
    # the benchmark shingle set is tiny and distinct
    assert benchmark_shingles(bench, k=8).count() == 1
