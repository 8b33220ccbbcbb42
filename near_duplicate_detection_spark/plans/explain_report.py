"""Physical-plan audit: dump `.explain("formatted")` for the engine's key
plans and assert the properties that matter at scale (pushdown, broadcast,
codegen). Run: python -m near_duplicate_detection_spark.plans.explain_report
→ writes PLANS.md at the repo root.

This is the engineering loop the task demands: after correctness, read the
plan Catalyst actually produced and check it is the plan you'd want at 100 TB.
"""

from __future__ import annotations

import contextlib
import io
import os
import shutil


def _plan_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


CHECKS = []


def check(name: str, plan: str, must_contain: list[str], must_not: list[str] = ()):
    ok = all(s in plan for s in must_contain) and not any(s in plan for s in must_not)
    CHECKS.append((name, ok, must_contain, list(must_not)))
    return ok


def main() -> None:
    from near_duplicate_detection_spark.config import NDDConfig
    from near_duplicate_detection_spark.pipeline import NDDPipeline, query_top_k
    from near_duplicate_detection_spark.session import get_spark
    from near_duplicate_detection_spark.sources.pages import generate_pages

    spark = get_spark(app_name="ndd-explain", master="local[8]", shuffle_partitions=8)
    cfg = NDDConfig(num_buckets=4)
    base = "/tmp/ndd_explain"
    shutil.rmtree(base, ignore_errors=True)
    pipe = NDDPipeline(spark, cfg, base)
    pipe.run(generate_pages(spark, 2000))

    sections: list[tuple[str, str, str]] = []

    # 1. stage-1 scan: column pruning — html must NOT be read
    from near_duplicate_detection_spark.functions.signatures import (
        SIGNATURE_SCHEMA,
        signature_map_fn,
    )

    s1 = (
        pipe.pages_table()
        .select("url", "text")
        .mapInPandas(signature_map_fn(cfg), SIGNATURE_SCHEMA)
    )
    p = _plan_str(s1)
    check("stage1 prunes html from the pages scan", p,
          ["ReadSchema"], ["html"])
    sections.append((
        "Stage 1 — signatures (map-only)",
        "Column pruning: ReadSchema carries url+text only; the html binary "
        "column never leaves parquet. Zero exchanges before the Arrow eval.",
        p,
    ))

    # 2. LSH candidates: single shuffle then map-side pair expansion
    from near_duplicate_detection_spark.operators.lsh import (
        candidate_pairs,
        exact_groups,
    )

    sigs = pipe.signatures_table()
    _edges, reps = exact_groups(sigs)
    pairs, _fl = candidate_pairs(reps, cfg)
    p = _plan_str(pairs)
    check("LSH pair expansion is map-side (no join after groupBy)", p,
          ["HashAggregate", "Generate"],)
    sections.append((
        "Stage 2 — LSH candidates",
        "One hash aggregate on (band_id, band_hash); pairs are generated "
        "map-side from the bucket array (Generate over the higher-order "
        "transform), then deduped. No bucket self-join.",
        p,
    ))

    # 3. query path: broadcast of the query band probe
    q = query_top_k(spark, pipe.catalog, cfg, "probe text for the plan", k=5)
    p = _plan_str(q)
    check("query band probe is a broadcast join", p, ["BroadcastHashJoin"])
    check("query top-k plans TakeOrderedAndProject", p, ["TakeOrderedAndProject"])
    sections.append((
        "Query path — top-k",
        "Band probe broadcast-joins the 32-row query band table against the "
        "exploded signatures; final orderBy+limit compiles to "
        "TakeOrderedAndProject (no global sort) — the reference's full "
        "argsort (server_ndd.py:117) deliberately not reproduced.",
        p,
    ))

    # 4. interval join: broadcast nested loop with range predicate
    from near_duplicate_detection_spark.plans.contract import q_interval_join

    p = _plan_str(q_interval_join(spark, "/root/testdata/sf0.001"))
    check("interval join broadcasts the window side", p,
          ["BroadcastNestedLoopJoin"])
    sections.append((
        "Interval join (J1)",
        "Small window side broadcast; range predicate evaluated in the "
        "nested-loop join without shuffling the events table.",
        p,
    ))

    # 5. verify: semi-join pruning of the pages scan
    from near_duplicate_detection_spark.operators.verify import (
        candidate_shingle_sets,
    )

    sets = candidate_shingle_sets(pairs, pipe.pages_table(), cfg)
    p = _plan_str(sets)
    check("verify prunes pages via semi-join", p, ["LeftSemi"])
    sections.append((
        "Verify — candidate-only shingle sets",
        "Pages scan is pruned to candidate urls with a left-semi join before "
        "the Arrow shingle pass; shingle sets never materialize corpus-wide.",
        p,
    ))

    # 6. stage-2b verify: candidate-pruned text scan (round-2 fix — the
    # round-1 plan shuffled the full corpus text column through both joins)
    from near_duplicate_detection_spark.operators.substring import (
        substring_candidates,
        verify_substring_pairs,
    )

    from pyspark.sql import functions as F

    scands, _sfl = substring_candidates(pipe.pages_table(), cfg)
    # the operator materializes the pruned texts (localCheckpoint — both pair
    # sides consume them), which hides the semi-join from the FINAL plan;
    # audit the prune subtree it builds (same expression) plus the final
    # plan's checkpoint read, which proves the corpus never re-enters
    cand_urls = (
        scands.select(F.col("url_a").alias("url"))
        .union(scands.select(F.col("url_b").alias("url")))
        .distinct()
    )
    prune = _plan_str(
        pipe.pages_table().select("url", "text").join(cand_urls, "url", "left_semi")
    )
    check("substring verify prunes pages via semi-join", prune, ["LeftSemi"])
    p = _plan_str(verify_substring_pairs(scands, pipe.pages_table(), cfg))
    check(
        "substring verify joins read the materialized pruned texts",
        p, ["ExistingRDD"],
    )
    sections.append((
        "Stage 2b — substring verify (candidate-pruned)",
        "Pages texts are pruned to the candidate-pair urls with a left-semi "
        "join, materialized ONCE (both pair sides consume them), then the "
        "two pair⋈text joins read the checkpoint; the corpus text column is "
        "never shuffled (pattern of the stage-2 verify).",
        prune + "\n--- final verify plan (reads checkpointed texts) ---\n" + p,
    ))

    # 7. salted distinct aggregation: the salt reaches the phase-1 grouping
    from near_duplicate_detection_spark.plans.contract import (
        q_doc_fingerprint_winnow,
        q_salted_distinct_tokens,
    )

    p = _plan_str(q_salted_distinct_tokens(spark, "/root/testdata/sf0.001"))
    check("salted distinct-count groups phase 1 on the value salt", p,
          ["pmod(xxhash64(tok"])
    sections.append((
        "Skew — value-salted exact count-distinct",
        "Phase-1 HashAggregate keys include pmod(xxhash64(token), 64): a hot "
        "source's distinct-state spreads over 64 reducers; phase 2 sums the "
        "disjoint partials. Exact result (oracle-checked), skew-safe plan.",
        p,
    ))

    # 8. winnowing fingerprints: pure column expressions, no Python boundary
    p = _plan_str(q_doc_fingerprint_winnow(spark, "/root/testdata/sf0.001"))
    check("winnow fingerprints run JVM-side (no Python eval)", p,
          ["Generate"], ["ArrowEvalPython", "BatchEvalPython"])
    sections.append((
        "Winnowing document fingerprints",
        "k-gram hashing + window-min + distinct are higher-order column "
        "expressions (transform/slice/array_min) evaluated in the JVM; the "
        "only row-count change is the final explode (Generate). No pandas "
        "boundary, no shuffle before the explode.",
        p,
    ))

    # 9. bucketed stage tables: co-located join with zero Exchange
    from near_duplicate_detection_spark.sources.bucketed import (
        colocated_join,
        write_bucketed,
    )

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.sources.bucketing.autoBucketedScan.enabled",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    write_bucketed(
        sigs.select("url", "simhash"), "audit_sigs", "url", n_buckets=8
    )
    write_bucketed(
        pipe.clusters_view().select("url", "cluster_id"),
        "audit_clusters", "url", n_buckets=8,
    )
    p = _plan_str(colocated_join(spark, "audit_sigs", "audit_clusters", "url"))
    check("bucketed stage-table join has no Exchange", p,
          ["Bucketed: true"], ["Exchange"])
    spark.sql("DROP TABLE IF EXISTS audit_sigs")
    spark.sql("DROP TABLE IF EXISTS audit_clusters")
    for k, v in saved.items():
        spark.conf.set(k, v)
    sections.append((
        "Bucketed stage tables — co-located join",
        "signatures ⋈ clusters on url with both sides bucketBy(8, url): "
        "SortMergeJoin directly over bucketed scans, zero Exchange on either "
        "side. At 100 TB this is the Iceberg bucket(N, url) layout for every "
        "url-keyed cross-stage join.",
        p,
    ))

    # 10. webtext-quality operators (round 4): url canonicalization is pure
    # codegen; top-n-gram spends its ONE exchange before the gram explode;
    # the corpus boilerplate count shuffles 8-byte line hashes, not lines
    from near_duplicate_detection_spark.plans.contract import (
        q_boilerplate_line_frac,
        q_top_ngram_frac,
        q_url_canonical_host,
    )

    p = _plan_str(q_url_canonical_host(spark, "/root/testdata/sf0.001"))
    check("url canonicalization is JVM codegen (no Python eval)", p,
          ["Project"], ["ArrowEvalPython", "BatchEvalPython"])
    sections.append((
        "URL canonicalization",
        "The whole regexp_replace chain (case-fold authority, default "
        "ports, tracking params, fragment) is one codegen'd Project over "
        "the scan — zero exchanges, zero Python. The corpus-wide dedup key "
        "costs what a column read costs.",
        p,
    ))

    p = _plan_str(q_top_ngram_frac(spark, "/root/testdata/sf0.001"))
    check("top-n-gram spends its single Exchange before the explode",
          p, ["hashpartitioning(doc_id", "REPARTITION_BY_COL"])
    simple = q_top_ngram_frac(
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().executedPlan().toString()
    check("top-n-gram has exactly one Exchange total",
          "ONE" if simple.count("Exchange") == 1 else "MANY", ["ONE"])
    sections.append((
        "Top-n-gram character fraction (Gopher)",
        "Docs repartition by id BEFORE the gram explode; "
        "HashPartitioning(doc_id) satisfies both the (doc, gram) count and "
        "the per-doc argmax window, so the exploded gram rows (~2× text "
        "volume) never cross the wire — one Exchange, shipping compact doc "
        "rows.",
        p,
    ))

    p = _plan_str(q_boilerplate_line_frac(spark, "/root/testdata/sf0.001"))
    check("boilerplate count shuffles 8-byte line hashes, not line text",
          p, ["xxhash64(line"])
    sections.append((
        "Corpus boilerplate-line detection",
        "Per-doc array_distinct runs map-side before the explode; the "
        "cross-corpus count and the membership join are keyed on "
        "xxhash64(line) so shuffle rows carry an 8-byte key (the line text "
        "rides only as a min() aggregate on the boilerplate side).",
        p,
    ))

    from near_duplicate_detection_spark.plans.contract import (
        q_registered_domain_psl,
    )

    from near_duplicate_detection_spark.functions.url import PSL_SNAPSHOT

    n_lengths = len({s.count(".") + 1 for s in PSL_SNAPSHOT})
    p = _plan_str(q_registered_domain_psl(spark, "/root/testdata/sf0.001"))
    # formatted explain lists each node twice (tree + details): assert the
    # join COUNT on the tree section only, the exclusions on the whole text
    tree = p.split("\n\n")[0]
    check("PSL domain lookup is one broadcast join per rule length, zero shuffle",
          "ONE" if (
              tree.count("BroadcastHashJoin") == n_lengths
              and "hashpartitioning" not in p
              and "Generate" not in p
              and "EvalPython" not in p
              and "MapInPandas" not in p
          ) else "MANY", ["ONE"])
    sections.append((
        "Registered-domain PSL lookup",
        "Last-k-label candidate suffixes — one k per DISTINCT rule length "
        "in the suffix list (derived, so the bundled 2/3-label slice runs "
        "two probes and a full PSL with longer rules probes those too) — "
        "are JVM array expressions probing the broadcast PSL dim, fused "
        "into one map-side codegen stage. No explode (which would multiply "
        "rows into a groupBy argmax shuffle), no Exchange, no Python eval.",
        p,
    ))

    lines = ["# PLANS — physical-plan audit (generated by plans/explain_report.py)",
             ""]
    lines.append("| check | result |")
    lines.append("|---|---|")
    for name, ok, _m, _n in CHECKS:
        lines.append(f"| {name} | {'PASS' if ok else 'FAIL'} |")
    lines.append("")
    for title, why, plan in sections:
        lines.append(f"## {title}\n\n{why}\n")
        lines.append("```\n" + plan.strip()[:4000] + "\n```\n")
    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    with open(os.path.join(repo_root, "PLANS.md"), "w") as f:
        f.write("\n".join(lines))
    print("\n".join(f"{'PASS' if ok else 'FAIL'}: {name}" for name, ok, _m, _n in CHECKS))
    spark.stop()


if __name__ == "__main__":
    main()
