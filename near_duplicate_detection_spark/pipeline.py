"""Three-stage near-duplicate pipeline over a `pages` table.

Engine equivalent of the reference's index-build write path
(ndd/server_ndd.py:158-268, one process, whole index in RAM) re-expressed as
chained batch jobs over stage tables, each committing per-partition lineage
rows so a killed run resumes without recomputing finished work (the
reference's `.done` protocol, distributed — SURVEY §3.2):

  stage 1   pages → signatures            (bucketed by url hash; per-bucket lineage)
  stage 2   signatures → verified pairs   (LSH candidates + exact-Jaccard verify)
  stage 2b  pages → substring pairs       (rolling windows + suffix-array verify)
  stage 3   pairs → clusters              (connected components + representative)

Scale posture: stage 1 is a map-only pass (zero shuffles — signatures are
computed per Arrow batch and written partitioned). Stage 2 has exactly one
wide shuffle for bucketing plus one dedup and two verify joins, all on keys
Catalyst hash-partitions; AQE handles residual skew after the explicit
bucket-size ceiling. Stage 3 shuffles only the duplicate-pair edge set.
"""

from __future__ import annotations

import hashlib
import time

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from near_duplicate_detection_spark.config import NDDConfig
from near_duplicate_detection_spark.functions.signatures import (
    SIGNATURE_SCHEMA,
    signature_map_fn,
)
from near_duplicate_detection_spark.lineage import StageCatalog
from near_duplicate_detection_spark.operators.connected_components import (
    clusters_table,
    connected_components,
)
from near_duplicate_detection_spark.operators.lsh import (
    band_buckets,
    flagged_buckets,
    flagged_members,
    pairs_from_buckets,
    simhash_fallback_pairs,
)
from near_duplicate_detection_spark.operators.substring import (
    substring_candidates,
    verify_substring_pairs,
)
from near_duplicate_detection_spark.operators.verify import (
    candidate_shingle_sets,
    verify_pairs,
)


def _wrap64(x: int) -> int:
    """Wrap an arbitrary-precision int to signed 64-bit (mod 2^64) — the
    driver-side half of the decimal-accumulated checksum algebra."""
    x &= (1 << 64) - 1
    return x - (1 << 64) if x >= (1 << 63) else x


class NDDPipeline:
    def __init__(self, spark: SparkSession, cfg: NDDConfig, base_dir: str):
        self.spark = spark
        self.cfg = cfg
        self.catalog = StageCatalog(spark, base_dir)
        # appended rep urls from the last stage-2 delta in THIS process —
        # threaded into stage2b_delta to skip its discovery anti-join; None
        # means "unknown, discover". Never persisted: a fresh process always
        # discovers.
        self._appended_rep_urls: DataFrame | None = None
        # the same run's appended stage-2 pairs (checkpointed in
        # _stage2_apply_append) — threaded into stage2b_delta's
        # already-verified prune so the threaded path never scans the
        # corpus-sized edge tables. Consumed (and cleared) per call; a
        # fresh process falls back to the edge-table scan.
        self._appended_edges: DataFrame | None = None
        # snapshot-diff seam (run_incremental(changed_buckets=...)): when a
        # caller can ENUMERATE the drifted url-hash buckets (the Iceberg
        # snapshot-metadata analog — changed data files → changed
        # partitions), the inferred path's O(corpus) control-plane scans
        # (stage-0 _input_stats, the pure-append url probe, stage-2
        # classify_drift's full-outer join) restrict to those buckets:
        # partition-pruned reads on the bucket-partitioned tables, a
        # computed-bucket filter on the input/seen sides. None = infer over
        # the whole corpus (default behavior, unchanged).
        self._changed_buckets: frozenset[int] | None = None
        # per-bucket (rows, checksum) of the CURRENT input snapshot, as a
        # by-product of _try_pure_append's identity aggregate — consumed by
        # run_incremental's slow path so stage0_ingest's resume scan does
        # not re-evaluate the snapshot for the identical numbers (the probe
        # sums the same count / decimal xxhash64 expressions per bucket;
        # exactness relies on the corpus url-uniqueness invariant the
        # probe's own identity algebra already assumes). Never persisted;
        # valid only for the snapshot of the run_incremental call in flight.
        self._inferred_stats: dict[int, tuple[int, int]] | None = None

    # ---------- stage 0 ----------

    def _bucket_expr(self):
        return F.pmod(F.xxhash64("url"), F.lit(self.cfg.num_buckets)).cast("int")

    def _restrict_changed(self, df: DataFrame, bucket_col: str | None = None):
        """Apply the snapshot-diff seam: filter ``df`` to the caller-declared
        changed buckets. ``bucket_col`` names a physical bucket column (the
        bucket-partitioned stage tables — the filter partition-prunes);
        None derives the bucket from ``url`` (input snapshots / flat tables
        — the filter bounds the downstream shuffle, not the scan). No-op
        when the seam is inactive."""
        if self._changed_buckets is None:
            return df
        expr = (
            F.col(bucket_col) if bucket_col is not None else self._bucket_expr()
        )
        return df.where(expr.isin(sorted(self._changed_buckets)))

    def _input_stats(self, pages: DataFrame) -> dict[int, tuple[int, int]]:
        """Per-bucket (rows, content checksum) of an input snapshot — ONE
        aggregation scan. The checksum sums the full 64-bit xxhash64 of
        (url, text) mod 2^64, so edits, appends AND deletes all shift the
        bucket's stats (the reference's content version string per videoid,
        ndd/extract_images.py:166-178, as a distributed aggregate).

        Collision bound: two snapshots of a bucket share (rows, checksum)
        only if their multiset hash sums collide — 2^-64 per bucket for
        random drift (the sum is over the full 64-bit hash; accumulated in
        decimal(38,0) because ANSI mode rejects wrap-around bigint sums,
        then wrapped back to mod-2^64 driver-side so the append-delta
        subtraction algebra in stage 1 stays exact). An adversary
        controlling page text would need a 2^64-work multiset-sum collision
        — impractical, and crawl pipelines don't face adversarial inputs at
        that precision. (Round-2 used the top 32 bits only: 2^-32.)"""
        rows = (
            pages.select(
                self._bucket_expr().alias("bucket"),
                F.xxhash64("url", "text").alias("h"),
            )
            .groupBy("bucket")
            .agg(
                F.count("*").alias("rows"),
                F.sum(F.col("h").cast("decimal(38,0)")).alias("checksum"),
            )
            .collect()
        )
        return {
            int(r["bucket"]): (int(r["rows"]), _wrap64(int(r["checksum"])))
            for r in rows
        }

    def stage0_ingest(
        self,
        pages: DataFrame,
        resume: bool = True,
        stats_hint: dict[int, tuple[int, int]] | None = None,
    ) -> None:
        """Materialize the input as the catalog's `pages` table, partitioned
        by url-hash bucket. Every later stage scans this table instead of
        re-evaluating the input plan, and stage 1's pending-bucket filter
        becomes parquet partition pruning. (In production `pages` IS the
        Iceberg input table and this stage is a no-op — snapshot IDs replace
        the checksum scan.)

        DATA-AWARE: a bucket is rewritten iff its input (rows, checksum)
        differ from the last committed stats — so re-running with an
        appended, edited, or shrunken snapshot refreshes exactly the changed
        buckets, and a bucket whose docs all vanished is dropped (the
        reference drops deleted videos on update, ndd/server_ndd.py:246-261).

        ``stats_hint``: the input's per-bucket (rows, checksum) when the
        caller already aggregated exactly ``_input_stats``'s expressions
        over exactly this (restricted) snapshot — ``run_incremental``
        threads the pure-append probe's identity aggregate here, saving one
        full snapshot evaluation on the inferred edit/delete path (guide
        §1.2: remove duplicate passes). Trusted verbatim; resume-path only.

        PURE-APPEND fast path (same checksum algebra as stage 1's): appends
        hash uniformly into ALL buckets, so the bucket-granular rewrite
        above degenerates to a full-corpus rewrite for a 1% append. A
        drifted bucket whose NEW urls alone account for its (rows, checksum)
        delta has every old row byte-unchanged → append only the new rows
        (an O(append) write instead of O(corpus); the remaining O(corpus)
        cost is the stats scan + new-url anti-join, which Iceberg snapshot
        diffing replaces in production per the note above).
        """
        cfg, cat = self.cfg, self.catalog
        h = cfg.stage1_hash()
        t0 = time.monotonic()
        # snapshot-diff seam: with declared changed buckets, both the stats
        # scan and every write below see only those buckets' rows, and
        # undeclared buckets are trusted unchanged (never pending)
        pages = self._restrict_changed(pages)
        candidates = (
            sorted(self._changed_buckets)
            if self._changed_buckets is not None
            else range(cfg.num_buckets)
        )
        done = cat.latest_partition_stats("pages", h) if resume else {}
        if not done and self._changed_buckets is None:
            # ---- one-pass full build (r6): nothing is resumable, so every
            # input row will be written regardless of its stats — fold the
            # per-bucket (rows, checksum) aggregation into the write itself
            # via observed metrics instead of paying a SECOND full pass over
            # the input for _input_stats (guide §1.2: remove unnecessary
            # passes). The observed values are the same count/decimal-sum
            # expressions _input_stats aggregates, so lineage content is
            # bit-identical; resume/seam paths keep the stats-first scan
            # (they must decide WHAT to write before writing).
            self._ingest_one_pass(pages, h, t0)
            return
        stats = stats_hint if stats_hint is not None else self._input_stats(pages)
        pending = sorted(
            b for b in candidates if done.get(b, None) != stats.get(b, (0, 0))
        )
        if not pending:
            return
        nonempty = [b for b in pending if b in stats]
        # era-stamped at write time (merge-on-read governance — rows written
        # now postdate every stored page tombstone, see operators/mor.py)
        with_bucket = self._stamp_era(
            pages.withColumn("bucket", self._bucket_expr())
        )
        appended: set[int] = set()
        append_cand = [
            b
            for b in nonempty
            if resume and b in done and stats[b][0] > done[b][0]
        ]
        if append_cand and cat.exists("pages"):
            cand = with_bucket.where(
                F.col("bucket").isin([int(b) for b in append_cand])
            ).withColumn("h", F.xxhash64("url", "text"))
            new_rows = cand.join(
                self.pages_table()
                .where(F.col("bucket").isin([int(b) for b in append_cand]))
                .select("url"),
                "url",
                "left_anti",
            ).localCheckpoint()
            delta_stats = {
                int(r["bucket"]): (int(r["rows"]), _wrap64(int(r["cks"])))
                for r in new_rows.groupBy("bucket")
                .agg(
                    F.count("*").alias("rows"),
                    F.sum(F.col("h").cast("decimal(38,0)")).alias("cks"),
                )
                .collect()
            }
            for b in append_cand:
                want = (
                    stats[b][0] - done[b][0],
                    _wrap64(stats[b][1] - done[b][1]),
                )
                if delta_stats.get(b) == want:
                    appended.add(b)
            if appended:
                cat.write(
                    new_rows.where(
                        F.col("bucket").isin([int(b) for b in appended])
                    )
                    .drop("h")
                    .repartition("bucket"),
                    "pages",
                    partition_by=["bucket"],
                    mode="append",
                    max_records_per_file=2048,
                )
        full = [b for b in nonempty if b not in appended]
        if full:
            todo = with_bucket
            if len(full) < cfg.num_buckets:
                todo = todo.where(F.col("bucket").isin([int(b) for b in full]))
            # bucket-PURE partitions: without this, every upstream task writes
            # a file into every bucket dir (tasks × buckets small files), and
            # every downstream partitioned write inherits the explosion. One
            # shuffle here keeps all later stage writes at one-task-one-bucket.
            # maxRecordsPerFile splits each bucket into several files so the
            # downstream map stages regain full read parallelism.
            cat.write(
                todo.repartition("bucket"),
                "pages",
                partition_by=["bucket"],
                max_records_per_file=2048,
            )
        # vanished buckets: dynamic overwrite never touches a partition with
        # zero input rows — drop the dir explicitly (delete handling)
        for b in pending:
            if b not in stats:
                cat.drop_partition("pages", b)
        wall_ms = int((time.monotonic() - t0) * 1000)
        cat.mark_complete(
            "pages",
            h,
            {b: stats.get(b, (0, 0))[0] for b in pending},
            wall_ms,
            checksums={b: stats.get(b, (0, 0))[1] for b in pending},
        )
        cat.add_metrics(
            "pages",
            {
                "buckets_appended": len(appended),
                "buckets_rewritten": len(full),
                "appended_docs_ingested": sum(
                    stats[b][0] - done[b][0] for b in appended
                ),
                "wall_ms": wall_ms,
            },
        )

    def _ingest_one_pass(self, pages: DataFrame, h: str, t0: float) -> None:
        """Full-build stage 0 in ONE pass over the input: write every row
        and collect the per-bucket (rows, Σ xxhash64(url, text)) lineage
        stats as observed metrics of the SAME write job. Behavior-identical
        to the stats-then-write path when nothing is resumable: same files,
        same lineage rows, same metrics, same stale-partition drops."""
        from pyspark.sql import Observation

        cfg, cat = self.cfg, self.catalog
        dec = F.col("h").cast("decimal(38,0)")
        aggs = []
        for b in range(cfg.num_buckets):
            w = F.col("bucket") == b
            aggs.append(F.sum(F.when(w, 1).otherwise(0)).alias(f"r{b}"))
            aggs.append(F.sum(F.when(w, dec)).alias(f"c{b}"))
        df = (
            self._stamp_era(pages.withColumn("bucket", self._bucket_expr()))
            .withColumn("h", F.xxhash64("url", "text"))
            # bucket-PURE partitions, same rationale as the two-pass path
            .repartition("bucket")
        )
        obs = Observation("ingest_stats")
        cat.write(
            df.observe(obs, *aggs).drop("h"),
            "pages",
            partition_by=["bucket"],
            max_records_per_file=2048,
        )
        got = obs.get
        stats: dict[int, tuple[int, int]] = {}
        for b in range(cfg.num_buckets):
            r = int(got[f"r{b}"] or 0)
            if r:
                stats[b] = (r, _wrap64(int(got[f"c{b}"])))
        # dynamic overwrite never touches a partition with zero input rows —
        # drop stale dirs explicitly, exactly like the two-pass path
        pending = list(range(cfg.num_buckets))
        for b in pending:
            if b not in stats:
                cat.drop_partition("pages", b)
        wall_ms = int((time.monotonic() - t0) * 1000)
        cat.mark_complete(
            "pages",
            h,
            {b: stats.get(b, (0, 0))[0] for b in pending},
            wall_ms,
            checksums={b: stats.get(b, (0, 0))[1] for b in pending},
        )
        cat.add_metrics(
            "pages",
            {
                "buckets_appended": 0,
                "buckets_rewritten": len(stats),
                "appended_docs_ingested": 0,
                "wall_ms": wall_ms,
            },
        )

    def pages_table(self) -> DataFrame:
        """The pages VIEW: physical rows minus the ``page_tombstones``
        merge-on-read sidecar (explicit deletes/updates commit url
        tombstones instead of rewriting buckets — see ``delete_pages``).
        Every consumer must read through this, never ``catalog.read``
        raw — the same contract as ``clusters_view``/``stage_view``."""
        return pages_view(self.catalog)

    def signatures_table(self) -> DataFrame:
        """The signatures VIEW (same ``page_tombstones`` governance as
        ``pages_table`` — the two tables are written in lockstep)."""
        return signatures_view(self.catalog)

    # ---------- stage 1 ----------

    def stage1_signatures(self, resume: bool = True) -> None:
        """pages → signatures, partitioned by url-hash bucket with per-bucket
        lineage (reference P1 predicate, ndd/extract_features.py:88).

        DATA-AWARE: a bucket is done iff its committed signature lineage
        carries the SAME (rows, checksum) the pages table currently has for
        that bucket — content drift (append/edit/delete) re-signs exactly
        the drifted buckets. The pages checksum is chained into the
        signature lineage row, mirroring the reference's .done strings that
        embed the upstream stage's version (ndd/extract_features.py:74-88).
        """
        cfg, cat = self.cfg, self.catalog
        h = cfg.stage1_hash()
        pages_stats = cat.latest_partition_stats("pages", h)
        if not pages_stats:
            # pages table provided out-of-band (no stage-0 lineage): fall
            # back to treating every bucket as unknown → recompute all
            pages_stats = {
                b: (n, 0) for b, n in cat.bucket_counts("pages").items()
            }
        sig_stats = cat.latest_partition_stats("signatures", h) if resume else {}
        pending = sorted(
            b
            for b in range(cfg.num_buckets)
            if pages_stats.get(b, (0, 0)) != (0, 0)
            and sig_stats.get(b) != pages_stats.get(b)
        )
        vanished = [
            b
            for b in range(cfg.num_buckets)
            if pages_stats.get(b, (0, 0)) == (0, 0) and sig_stats.get(b, (0, 0)) != (0, 0)
        ]
        for b in vanished:
            cat.drop_partition("signatures", b)
        if vanished:
            cat.mark_complete(
                "signatures", h, {b: 0 for b in vanished}, 0,
                checksums={b: 0 for b in vanished},
            )
        if not pending:
            return
        t0 = time.monotonic()

        # ---- pure-append fast path: a drifted bucket whose NEW urls alone
        # account for the full (rows, checksum) delta has every old row
        # byte-unchanged (an edit keeps the url in signatures, so it is
        # excluded from the anti-join and the checksum identity fails; a
        # delete fails the row-count identity) → sign ONLY the new docs and
        # append to the partition. Appends hash uniformly into ALL buckets,
        # so without this the bucket-granular resume re-signs the whole
        # corpus for a 1% append.
        append_cand = [
            b
            for b in pending
            if resume
            and b in sig_stats
            and pages_stats.get(b, (0, 0))[0] > sig_stats[b][0]
        ]
        appended: set[int] = set()
        n_appended_docs = 0
        if append_cand:
            cand_pages = (
                self.pages_table()
                .where(F.col("bucket").isin([int(b) for b in append_cand]))
                .select(
                    "url",
                    "text",
                    "bucket",
                    F.xxhash64("url", "text").alias("h"),
                )
            )
            new_docs = cand_pages.join(
                self.signatures_table()
                .where(F.col("bucket").isin([int(b) for b in append_cand]))
                .select("url"),
                "url",
                "left_anti",
            ).localCheckpoint()
            delta_stats = {
                int(r["bucket"]): (int(r["rows"]), _wrap64(int(r["cks"])))
                for r in new_docs.groupBy("bucket")
                .agg(
                    F.count("*").alias("rows"),
                    F.sum(F.col("h").cast("decimal(38,0)")).alias("cks"),
                )
                .collect()
            }
            for b in append_cand:
                want = (
                    pages_stats[b][0] - sig_stats[b][0],
                    _wrap64(pages_stats[b][1] - sig_stats[b][1]),
                )
                if delta_stats.get(b) == want:
                    appended.add(b)
                    n_appended_docs += want[0]
            if appended:
                new_sigs = (
                    new_docs.where(
                        F.col("bucket").isin([int(b) for b in appended])
                    )
                    .select("url", "text")
                    .mapInPandas(signature_map_fn(cfg), schema=SIGNATURE_SCHEMA)
                    .withColumn(
                        "bucket",
                        F.pmod(
                            F.xxhash64("url"), F.lit(cfg.num_buckets)
                        ).cast("int"),
                    )
                )
                cat.write(
                    self._stamp_era(new_sigs),
                    "signatures",
                    partition_by=["bucket"],
                    mode="append",
                    max_records_per_file=2048,
                )

        full = [b for b in pending if b not in appended]
        if full:
            todo = self.pages_table().where(
                F.col("bucket").isin([int(b) for b in full])
            )
            # bucket recomputed JVM-side after the UDF — it is a pure
            # function of url (the stage-0 expression, see stage0_ingest),
            # so no Python passthrough layer is needed
            sigs = (
                todo.select("url", "text")
                .mapInPandas(signature_map_fn(cfg), schema=SIGNATURE_SCHEMA)
                .withColumn(
                    "bucket",
                    F.pmod(F.xxhash64("url"), F.lit(cfg.num_buckets)).cast("int"),
                )
            )
            # input partitions are bucket-pure (stage 0), so this partitioned
            # write emits one file per task, no fan-out
            cat.write(
                self._stamp_era(sigs), "signatures", partition_by=["bucket"],
                max_records_per_file=2048,
            )
        wall_ms = int((time.monotonic() - t0) * 1000)
        # LIVE rows per bucket = the pages stats (one signature per live
        # page; physical footer counts would include merge-on-read dead
        # rows awaiting a page_tombstones fold)
        cat.mark_complete(
            "signatures",
            h,
            {b: pages_stats.get(b, (0, 0))[0] for b in pending},
            wall_ms,
            # chain the consumed pages content version (reference .done
            # chaining, extract_features.py:74-88)
            checksums={b: pages_stats.get(b, (0, 0))[1] for b in pending},
        )
        # P4 analog (shotdetect.py:42-55 corrupt-input check): degenerate docs
        # are kept but counted — downstream they can only form exact-dup
        # groups with other empties, never LSH noise. Counted from parquet
        # row-group statistics (pyarrow filtered count, driver-side) — the
        # round-1 full Spark scan here was a pure serial tail.
        n_empty = cat.count_rows("signatures", filter_expr=("n_tokens", "==", 0))
        cat.add_metrics(
            "signatures",
            {
                "buckets_computed": len(full),
                "buckets_appended": len(appended),
                "appended_docs_signed": n_appended_docs,
                "wall_ms": wall_ms,
                "empty_docs": n_empty,
            },
        )

    # ---------- runtime hash chaining (params ∥ upstream CONTENT) ----------
    #
    # config.py's stage hashes chain parameters only; these runtime hashes
    # additionally fold in the signatures table's content fingerprint (per-
    # bucket rows+checksums from lineage), so appending/editing/deleting
    # pages invalidates stages 2/2b/3 — round 1's param-only predicate
    # silently served stale pairs/clusters after an append.

    @staticmethod
    def _h16(s: str) -> str:
        return hashlib.sha256(s.encode()).hexdigest()[:16]

    def stage2_run_hash(self) -> str:
        return self._h16(
            self.cfg.stage2_hash()
            + "|"
            + self.catalog.content_fingerprint("signatures")
        )

    def stage2b_run_hash(self) -> str:
        # 2b consumes signatures (via reps) AND stage-2 pairs (anti-join of
        # already-verified pairs) → chain both
        return self._h16(
            self.cfg.stage2b_hash()
            + "|"
            + self.catalog.content_fingerprint("signatures")
            + "|"
            + self.stage2_run_hash()
        )

    def stage3_run_hash(self) -> str:
        s2b = (
            self.stage2b_run_hash()
            if self.catalog.exists("substring_pairs")
            else "none"
        )
        return self._h16(
            self.cfg.stage3_hash() + "|" + self.stage2_run_hash() + "|" + s2b
        )

    # stage-3 append log: edges/docs appended by the stage-2/2b delta paths
    # since the last committed clusters build. Any FULL stage-2/2b rewrite
    # wipes it (the rebuilt edge set supersedes the log), and stage 3 wipes
    # it on commit (consumed). Missing log ⇒ stage 3 runs full.
    _STAGE3_LOG_TABLES = ("edges_new", "urls_new", "urls_retracted")

    def clusters_view(self) -> DataFrame:
        """The committed clusters with the merge-on-read label patch applied
        — see ``patched_clusters``. Every consumer of cluster labels must
        read through this, never ``catalog.read("clusters")`` raw."""
        return patched_clusters(self.catalog)

    # ---------- stage 2 ----------

    def stage2_pairs(self, resume: bool = True) -> None:
        cfg, cat = self.cfg, self.catalog
        h = self.stage2_run_hash()
        # a crashed retraction (marker up) may have mutated stage tables
        # AFTER the lineage commit — e.g. crash mid-retract, then the
        # snapshot reverts to the committed content: h matches but the
        # tables don't. Never trust the early-return while the marker is up.
        if (
            resume
            and cat.completed_partitions("pairs", h)
            and cat.exists("pairs")
            and not self._delta_suspect()
        ):
            return
        t0 = time.monotonic()
        # a full stage-2 rewrite (e.g. after an edit) invalidates the 2b
        # delta state (reps/windows may change under seen_2b's cover) AND
        # the stage-3 append log (the rebuilt edge set supersedes it; stage
        # 3 must run full) — wipe both BEFORE any write below: a crash
        # mid-rewrite must leave the conservative state (missing ⇒ delta
        # consumers fall back to full), never stale-but-plausible state.
        # (r6: wipes moved ahead of the compute chain so the overlapped
        # `seen` write can start immediately — same crash argument, the
        # conservative window is merely wider.)
        import shutil as _shutil

        wipe = ["window_index", "seen_2b", *self._STAGE3_LOG_TABLES]
        if self._retract_inflight():
            # a crashed retraction may also have mutated substring_pairs
            # in a way the (signature-content-based) 2b run hash cannot
            # see — wipe it so 2b is forced to rebuild, not early-return
            wipe.append("substring_pairs")
        wipe_patch = self._retract_inflight() or not cat.exists(
            "substring_pairs"
        )
        for t in wipe:
            _shutil.rmtree(cat.path(t), ignore_errors=True)
        # column-prune BEFORE the fp join: stage 2 only ever uses url+bands
        # (LSH) and url+simhash (fallback) — shipping the 128-perm minhash
        # array through the exact-group shuffles would 5× the bytes for
        # nothing (the minhash column exists for the query path / re-banding)
        sigs = self.signatures_table().select("url", "fp", "bands", "simhash")
        # the `seen` and `reps` writes depend only on the signature scan /
        # the star checkpoint, not on the candidate-verify chain — submit
        # them as soon as their input exists so they run UNDER the chain
        # instead of as a serial tail (guide §2.6). Lineage still commits
        # only at mark_complete, so crash behavior matches the sequential
        # shape.
        #
        # `seen` = the (url, fp) snapshot this stage processed, stamped with
        # the stage-2 PARAM hash so the delta path can reject state built
        # under different parameters. At Iceberg scale this is a snapshot
        # id + table property, not a table.
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=2)
        try:
            fut_seen = pool.submit(
                lambda: cat.write(
                    self._stamp_era(
                        sigs.select("url", "fp").withColumn(
                            "cfg_hash", F.lit(cfg.stage2_hash())
                        )
                    ),
                    "seen",
                )
            )
            # exact-dup star edges first; LSH sees one representative per
            # distinct content (collapses boilerplate/exact-dup bucket
            # skew). Materialize the JOINED star table ONCE and derive
            # edges/reps as map-side filters over the checkpoint: the
            # round-5 shape checkpointed exact_edges and reps separately,
            # which ran the signature scan + exact-group shuffle TWICE
            # (r6 A/B: 2.99 s for the two checkpoints vs 0.48 s for one at
            # 40k docs).
            rep_map = sigs.groupBy("fp").agg(F.min("url").alias("rep"))
            with_rep = sigs.join(rep_map, "fp").localCheckpoint()
            exact_edges = with_rep.where(F.col("url") != F.col("rep")).select(
                F.col("rep").alias("url_a"),
                F.col("url").alias("url_b"),
                F.lit(1.0).alias("jaccard"),
            )
            reps = with_rep.where(F.col("url") == F.col("rep")).drop("rep")
            # reps doubles as the delta path's INDEX: fp is the exact-group
            # rep_map, bands/simhash let an append's LSH probe scan this
            # table map-side instead of re-deriving the rep set by
            # semi-joining the full signatures table against reps every
            # delta run (an O(corpus) shuffle per append in round 3).
            # Signatures are pure functions of text, so retraction
            # rep-substitution keeps these columns exact.
            fut_reps = pool.submit(
                lambda: cat.write(
                    self._stamp_era(
                        reps.select("url", "fp", "bands", "simhash")
                    ),
                    "reps",
                )
            )
            # materialize ONLY the multi-member band buckets (small) —
            # every later consumer (flag metric, pair expansion) derives
            # map-side from it instead of recomputing the
            # scan+window+groupBy subtree
            buckets = band_buckets(reps, cfg).localCheckpoint()
            flagged = flagged_buckets(buckets, cfg)
            # the fallback is only joined in when a bucket actually tripped
            # the ceiling. Deciding that takes one count over the
            # checkpointed (tiny) bucket table — near-zero, and it doubles
            # as the flagged metric the round-5 shape paid a separate
            # post-commit job for. (Round 1's sin was recomputing the
            # corpus-wide band explode to decide; counting materialized
            # partitions is the CC-fixpoint trick instead.) The
            # unconditional union cost ~0.4 s of empty-side shuffles/run.
            n_flagged = flagged.count()
            cands = pairs_from_buckets(buckets, cfg, dedup=False)
            if n_flagged:
                cands = cands.union(
                    simhash_fallback_pairs(
                        reps, flagged_members(buckets, cfg), cfg, dedup=False
                    )
                )
            cands = cands.dropDuplicates(["url_a", "url_b"]).localCheckpoint()
            # materialize the shingle sets: verify joins them TWICE (url_a
            # and url_b sides), which would run the Arrow recompute twice
            sets = candidate_shingle_sets(
                cands, self.pages_table(), cfg
            ).localCheckpoint()
            verified = verify_pairs(cands, sets, cfg)
            cat.write(
                self._stamp_era(verified.unionByName(exact_edges)), "pairs"
            )
            fut_seen.result()
            fut_reps.result()
        finally:
            pool.shutdown(wait=True)
        if wipe_patch:
            # the merge-on-read retraction patch dies with the last table
            # it could govern: seen/reps/pairs were just rebuilt (fresh era
            # stamps exempt them regardless), window_index/seen_2b wiped
            # above — only a SURVIVING substring_pairs still needs it.
            # AFTER the writes (not in the wipe list above): a crash
            # between wipe and rebuild would have left stale governed
            # tables with their patch gone.
            _shutil.rmtree(cat.path("retract_patch"), ignore_errors=True)
        wall_ms = int((time.monotonic() - t0) * 1000)
        n_pairs = cat.count_rows("pairs")
        cat.mark_complete("pairs", h, {-1: n_pairs}, wall_ms)
        # the committed rebuild supersedes any crashed retraction or delta
        # append — only HERE are the crash markers cleared (every delta
        # entry point refuses while either is up)
        self._clear_retract_inflight()
        self._clear_marker("delta.inflight")
        cat.add_metrics(
            "pairs",
            {
                "verified_pairs": n_pairs,
                # counted once, up front, where it also routes the fallback
                "flagged_buckets": n_flagged,
                "wall_ms": wall_ms,
            },
        )

    def stage2_pairs_delta(self, max_retract: int | None = None) -> bool:
        """Incremental stage 2 (operators/delta.py): new docs' pairs are
        computed against the existing reps/pairs state instead of re-running
        the corpus-wide band groupBy. Edited/deleted docs are handled by a
        TARGETED RETRACTION first (``_stage2_retract`` — drop or
        rep-substitute their rows, then treat edited content as appended).
        Returns True if the delta path ran (or nothing changed); False when
        the state can't support it (no prior run, partial crash state,
        param drift, retraction larger than ``max_retract``) — the caller
        must run the full ``stage2_pairs``.

        Cluster-partition equivalence with a full rebuild is pinned by
        tests/test_incremental.py; in the bucket-ceiling-crossing corner
        the delta keeps strictly MORE verified pairs (recall ≥ full)."""
        from near_duplicate_detection_spark.operators.delta import (
            classify_drift,
            drift_new,
            drift_violations,
        )

        cfg, cat = self.cfg, self.catalog
        if max_retract is None:
            max_retract = cfg.max_retract
        if self._delta_suspect():
            return False  # crashed retraction/delta append → tables suspect
        h = self.stage2_run_hash()
        if cat.completed_partitions("pairs", h) and cat.exists("pairs"):
            return True  # already current (exists: never trust a lineage
            # row whose table was wiped — see the stage-2b mirror below)
        if not (cat.exists("seen") and cat.exists("reps") and cat.exists("pairs")):
            return False  # no prior full run to delta against
        t0 = time.monotonic()
        # snapshot-diff seam: drift can only live in the declared buckets,
        # so BOTH sides of classify_drift's full-outer join restrict to
        # them — the signatures side partition-prunes (bucket-partitioned),
        # the flat `seen` side filters on the derived bucket (at Iceberg
        # scale `seen` is a snapshot id, not a table — see stage2_pairs)
        sigs = self._restrict_changed(
            self.signatures_table(), "bucket"
        ).select("url", "fp", "bands", "simhash")
        # param-drift guard: delta state built under DIFFERENT stage-2
        # params must not be extended or re-committed (a param change with
        # zero appended docs would otherwise mark the stale pairs complete
        # under the new hash). Footer-level pyarrow read — no Spark job —
        # and stricter than a first()-row probe: MIXED stamps also refuse.
        # (Crash-idempotence — partial appends from a killed delta — is the
        # delta.inflight marker's job, checked at entry above; the round-3
        # anti-join guard over reps ∪ pairs here cost two full edge-table
        # scans per run for the same crash window.)
        if cat.distinct_values("seen", "cfg_hash") != {cfg.stage2_hash()}:
            return False
        seen = self._restrict_changed(
            self.stage_view("seen")
        ).select("url", "fp")
        # ONE corpus-scan job classifies all drift (append/edit/delete);
        # the checkpointed frame is drift-sized and feeds both splits
        drift = classify_drift(sigs, seen).localCheckpoint()
        violations = drift_violations(drift)
        new_sigs = drift_new(drift)
        if violations.limit(1).count():
            # edit/delete drift: targeted retraction (drop or rep-substitute
            # the drifted urls' rows across the stage tables), after which
            # edited docs classify as plain appends. Refusals (too large,
            # crash marker) → full path.
            if not self._stage2_retract(violations, max_retract):
                return False
            if not (
                cat.exists("seen") and cat.exists("reps") and cat.exists("pairs")
            ):
                return False  # retraction emptied a core table → full path
            # post-retraction new set WITHOUT a second corpus-wide
            # classify_drift join (r6, guide §1.2): the retraction dropped
            # exactly `violations` from the seen view (drop-only patch /
            # fold anti-join, operators/mor.py URL_DROP_TABLES), so
            #   new₂ = {sigs ∉ seen_before} ∪ {sigs ∩ violations}
            # — the first term is the materialized drift's new split, the
            # second a broadcast semi-join of the drift-sized violation set
            # against the (partition-restricted) signatures scan. Disjoint
            # by construction (violations ⊆ seen_before), so the union adds
            # no duplicates. One map-side scan replaces the full-outer join.
            new_sigs = drift_new(drift).unionByName(
                sigs.join(F.broadcast(violations), "url", "left_semi")
            )
        new_sigs = new_sigs.localCheckpoint()
        n_new = new_sigs.count()
        if n_new == 0:
            cat.mark_complete("pairs", h, {-1: cat.count_rows("pairs")}, 0)
            self._appended_rep_urls = self.spark.createDataFrame(
                [], "url string"
            )
            return True
        self._appended_rep_urls = self._stage2_apply_append(
            new_sigs, n_new, h, t0
        )
        return True

    def _stage2_apply_append(
        self, new_sigs: DataFrame, n_new: int, h: str, t0: float
    ) -> DataFrame:
        """Shared append core of the stage-2 delta: compute the appended
        docs' pairs against the persisted index state and append them to
        every stage-2 table + the stage-3 log. ``new_sigs`` must be
        materialized rows that are genuinely NEW (callers establish this —
        ``stage2_pairs_delta`` via drift classification, ``append_pages``
        via its caller contract). Returns the appended reps' urls (the
        stage-2b delta's new-coverage set)."""
        from near_duplicate_detection_spark.operators.delta import (
            delta_exact,
            delta_lsh_candidates,
        )

        cfg, cat = self.cfg, self.catalog
        reps_tbl = self.stage_view("reps")
        rep_map = reps_tbl.select("fp", F.col("url").alias("rep"))
        exact_edges, new_reps = delta_exact(new_sigs, rep_map)
        new_reps = new_reps.localCheckpoint()
        # the reps table IS the probe index (url, fp, bands, simhash): one
        # map-side scan. Round 3 re-derived the rep signature set per run
        # by semi-joining the full signatures table against reps — an
        # O(corpus) shuffle on url for every append.
        old_rep_sigs = reps_tbl.select("url", "bands", "simhash")
        cands, flagged = delta_lsh_candidates(old_rep_sigs, new_reps, cfg)
        cands = cands.localCheckpoint()
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=5) as pool:
            self._stage2_apply_append_tail(
                pool, cat, cfg, cands, flagged, exact_edges, new_sigs,
                new_reps, n_new, h, t0,
            )
        return new_reps.select("url")

    def _stage2_apply_append_tail(
        self, pool, cat, cfg, cands, flagged, exact_edges, new_sigs,
        new_reps, n_new, h, t0,
    ) -> None:
        """Compute/write tail of ``_stage2_apply_append``, run inside its
        write pool's scope so an exception anywhere still joins the pool."""
        # the flagged metric only has to COMPLETE before the appends below
        # mutate the tables its lineage reads from (stale file-listing
        # hazard) — submit it now so it runs UNDER the shingle-set/verify
        # chain instead of as a serial step after it (guide §2.6)
        flagged_future = pool.submit(flagged.count)
        sets = candidate_shingle_sets(
            cands, self.pages_table(), cfg
        ).localCheckpoint()
        verified = verify_pairs(cands, sets, cfg)
        # materialize the appended pairs ONCE: two writes consume them
        # (edges_new log, pairs append) and the verify join must not re-run
        appended_pairs = verified.unionByName(exact_edges).localCheckpoint()
        # stash this run's edge keys for stage2b_delta's prune: on the
        # threaded path every VISIBLE prior edge touching a new url is by
        # construction in this set (new urls have no earlier visible edges —
        # appends are genuinely new, and updates' old edges are retraction-
        # governed before this append runs)
        self._appended_edges = appended_pairs.select("url_a", "url_b")
        # the flagged metric must have COMPLETED before the appends below
        # mutate the tables its lineage reads from (stale file-listing
        # hazard) — join the overlapped job here
        n_flagged = flagged_future.result()
        # marker up across the multi-table appends (no atomic commit): a
        # crash anywhere below leaves it set, so every later delta entry
        # refuses and the idempotent full rebuild takes over
        self._set_marker("delta.inflight")

        # stage-3 append log BEFORE the pairs append: a crash between the
        # log write and the pairs append leaves an over-complete log (retry
        # re-appends → the log dedups on read) — the reverse order could
        # commit pairs whose edges the log never saw, and stage 3's delta
        # would miss them. That pairwise barrier is the ONLY ordering that
        # adds a guarantee beyond the marker, so it runs as one chained
        # task while the other three appends — order-free among themselves
        # and vs the log (the inflight marker, set above and cleared only
        # after mark_complete, routes ANY partial combination to the
        # idempotent full rebuild) — overlap it from the same pool (guide
        # §2.6; r6: the log write was a serial step ahead of the pool).
        def log_then_pairs():
            cat.write(
                appended_pairs.select("url_a", "url_b"),
                "edges_new",
                mode="append",
            )
            cat.write(self._stamp_era(appended_pairs), "pairs", mode="append")

        writes = (
            log_then_pairs,
            lambda: cat.write(new_sigs.select("url"), "urls_new", mode="append"),
            lambda: cat.write(
                self._stamp_era(
                    new_reps.select("url", "fp", "bands", "simhash")
                ),
                "reps",
                mode="append",
            ),
            lambda: cat.write(
                self._stamp_era(
                    new_sigs.select("url", "fp").withColumn(
                        "cfg_hash", F.lit(cfg.stage2_hash())
                    )
                ),
                "seen",
                mode="append",
            ),
        )
        for _ in pool.map(lambda w: w(), writes):
            pass
        wall_ms = int((time.monotonic() - t0) * 1000)
        n_pairs = cat.count_rows("pairs")
        cat.mark_complete("pairs", h, {-1: n_pairs}, wall_ms)
        self._clear_marker("delta.inflight")
        cat.add_metrics(
            "pairs",
            {
                "verified_pairs": n_pairs,
                "delta_new_docs": n_new,
                "flagged_buckets": n_flagged,
                "wall_ms": wall_ms,
            },
        )

    # ---------- targeted retraction (edit/delete delta) ----------

    # Two write-ahead markers guard the multi-table delta mutations, which
    # have no atomic commit: `retract.inflight` brackets a targeted
    # retraction's table rewrites, `delta.inflight` brackets a delta run's
    # table APPENDS (set before the first append, cleared after the stage's
    # mark_complete). Either marker up ⇒ a crash may have left partial
    # stage-table state ⇒ every delta entry point refuses and the full
    # ``stage2_pairs`` rebuild (whose overwrite is idempotent) clears both.
    # This file-exists check replaced the round-3 anti-join "partial" guards
    # (reps ∪ pairs(a) ∪ pairs(b) vs seen, and the 2b mirror) — two full
    # edge-table scans per delta run whose only purpose was detecting the
    # same crash window the marker now brackets exactly.

    def _marker_path(self, name: str) -> str:
        import os

        return os.path.join(self.catalog.base_dir, name)

    def _marker_up(self, name: str) -> bool:
        import os

        return os.path.exists(self._marker_path(name))

    def _set_marker(self, name: str) -> None:
        with open(self._marker_path(name), "w") as f:
            f.write("in progress\n")

    def _clear_marker(self, name: str) -> None:
        import os

        try:
            os.remove(self._marker_path(name))
        except FileNotFoundError:
            pass

    def _retract_marker_path(self) -> str:
        return self._marker_path("retract.inflight")

    def _retract_inflight(self) -> bool:
        return self._marker_up("retract.inflight")

    def _clear_retract_inflight(self) -> None:
        self._clear_marker("retract.inflight")

    def _delta_suspect(self) -> bool:
        """True when a crashed retraction OR a crashed delta append may have
        left partial stage-table state — every delta entry point refuses."""
        return self._marker_up("retract.inflight") or self._marker_up(
            "delta.inflight"
        )

    # ---- clusters append-era counter (compaction trigger) ----
    # Each merge-on-read commit appends exactly one clusters file; a
    # rewriting commit re-bases the table at the job's write parallelism.
    # Counting ERAS (appends since the last rewrite) therefore measures
    # fragmentation independently of cluster size, where a raw file count
    # would mis-trigger at high parallelism. The counter is an advisory
    # execution artifact — any value (including a missing file) is safe; it
    # only decides WHEN the next append folds, never what it commits.

    def _append_era(self) -> int:
        try:
            with open(self._marker_path("delta.appends")) as f:
                return int(f.read().strip() or 0)
        except (FileNotFoundError, ValueError):
            return 0

    def _bump_append_era(self) -> None:
        self._write_counter("delta.appends", self._append_era() + 1)

    def _reset_append_era(self) -> None:
        self._clear_marker("delta.appends")

    # retraction-era counter for the stage-2/2b merge-on-read patch
    # (operators/mor.py). MONOTONE and never reset: governed-table rows are
    # stamped with the counter at write time, patch entries with the
    # post-bump value, and an entry governs exactly the rows with
    # row.era < entry.era — so stale rows surviving a partial rebuild
    # (e.g. substring_pairs across a stage-2-only rewrite) stay correctly
    # governed while freshly rebuilt rows are automatically exempt.
    def _retract_era(self) -> int:
        """Missing file = era 0 (a catalog that never retracted). An
        EXISTING but unparsable file is refused, never read as 0: the
        counter is the governance clock for every MOR sidecar — silently
        resetting it would make all future patch/tombstone entries govern
        nothing (rows carry higher eras than the entries), i.e. deleted
        urls would stay visible with no error anywhere. Unreachable with
        the atomic bump below; defense against external truncation."""
        try:
            with open(self._marker_path("retract.era")) as f:
                content = f.read().strip()
        except FileNotFoundError:
            return 0
        try:
            return int(content)
        except ValueError:
            raise RuntimeError(
                "retract.era counter file is corrupt — refusing to read it "
                "as 0 (a reset clock makes stored sidecar entries govern "
                "the wrong rows, silently). Heal: delete retract.era AND "
                "every MOR sidecar dir (retract_patch, page_tombstones, "
                "cluster_remap, cluster_tombstones), then full-rebuild via "
                "run() — it re-stamps every governed table at the fresh "
                "clock."
            ) from None

    def _write_counter(self, name: str, value: int) -> None:
        """Atomic counter write: temp file + rename, so a crash mid-write
        can never leave a truncated/empty counter (open('w') truncates at
        open — a kill before the write would otherwise tear the file)."""
        import os

        path = self._marker_path(name)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(f"{int(value)}\n")
        os.replace(tmp, path)

    def _bump_retract_era(self) -> int:
        era = self._retract_era() + 1
        self._write_counter("retract.era", era)
        return era

    def _stamp_era(self, df: DataFrame) -> DataFrame:
        """Stamp governed-table rows with the current retraction era (rows
        written NOW postdate every stored patch entry, so no entry governs
        them — see operators/mor.py)."""
        return df.withColumn("era", F.lit(int(self._retract_era())))

    def stage_view(self, table: str) -> DataFrame:
        """A governed stage-2/2b table with the merge-on-read retraction
        patch resolved (operators/mor.py) — broadcast join only, zero wide
        shuffles over the table. Every consumer of seen/reps/pairs/
        window_index/seen_2b/substring_pairs must read through this, never
        ``catalog.read(...)`` raw (same contract as ``clusters_view``)."""
        from near_duplicate_detection_spark.operators import mor

        df = self.catalog.read(table)
        patch = mor.patch_agg(self.catalog)
        if patch is None:
            return df
        if table in mor.PAIR_TABLES:
            return mor.apply_pair_patch(df, patch)
        return mor.apply_url_patch(
            df, patch, drop_only=table in mor.URL_DROP_TABLES
        )

    def _stage2_retract(
        self, retracted: DataFrame, max_retract: int | None = None
    ) -> bool:
        """Merge-on-read retraction: retract edited/deleted urls from every
        stage-2/2b table by committing ONE driver-written patch sidecar
        (operators/mor.py ``retract_patch`` — url → new_url|NULL stamped
        with this retraction's era) instead of rewriting the six
        corpus-sized tables. The round-3 copy-on-write shape was O(change)
        compute but one FULL rewrite per stage table per retraction —
        O(corpus) write volume for every delete at the 10^12-doc contract;
        it survives below as the FOLD (taken when the accumulated patch
        would cross ``cfg.retract_patch_ceiling``, and schedulable off the
        ingest path via ``compact()``). Readers resolve the patch through
        ``stage_view`` — one broadcast join, the position-delete analog of
        Iceberg v2 MOR.

        Semantics (identical to the fold, pinned by tests): a retracted
        exact-group representative's rows are INHERITED verbatim by the
        min surviving member (identical content ⇒ identical signatures,
        windows, and verified scores); everything else is dropped.
        Reference: ``update_index`` removes a vanished video's entries
        without rebuilding the index (ndd/server_ndd.py:246-261).

        Cost shape of the MOR commit: the mapping needs the broken reps'
        fp groups — ONE map-side broadcast-pruned pass over the reps view
        and one over the seen view (read-only scans with tiny outputs; an
        fp-zone-mapped Iceberg layout would prune them further) — plus
        delta-sized rewrites of the pending edges_new/urls_new logs and
        two driver-side sidecar writes. No corpus-sized write anywhere.

        Crash protocol: ``retract.inflight`` is set BEFORE the first
        mutation and cleared after the last (multi-table, no atomic
        commit); a crash leaves the marker up and every delta entry point
        refuses until the full ``stage2_pairs`` rebuild clears it.

        Returns False (nothing touched) when the retraction exceeds
        ``max_retract`` — the broadcast-mapping ceiling."""
        import shutil as _shutil

        import pandas as pd
        import pyarrow as pa

        from near_duplicate_detection_spark.operators import mor
        from near_duplicate_detection_spark.operators.delta import (
            relabel_pair_table,
            relabel_url_table,
        )

        cat, cfg = self.catalog, self.cfg
        if max_retract is None:
            max_retract = cfg.max_retract
        retracted = retracted.select("url").distinct().localCheckpoint()
        n_ret = retracted.count()
        if n_ret > max_retract:
            return False
        # --- the relabel/drop plan, from the VIEWS (prior patch applied):
        # broken reps' fp groups → min surviving member per group. All
        # joins broadcast; outputs retraction-sized.
        broken = (
            self.stage_view("reps")
            .join(F.broadcast(retracted), "url", "left_semi")
            .select("url", "fp")
            .localCheckpoint()
        )
        surv = (
            self.stage_view("seen")
            .join(
                F.broadcast(broken.select("fp").distinct()), "fp", "left_semi"
            )
            .join(F.broadcast(retracted), "url", "left_anti")
            .groupBy("fp")
            .agg(F.min("url").alias("new_url"))
        )
        rep_new = {
            r["url"]: r["new_url"]
            for r in broken.join(F.broadcast(surv), "fp", "left")
            .select("url", "new_url")
            .collect()
        }
        mapping = {
            r["url"]: rep_new.get(r["url"]) for r in retracted.collect()
        }
        stored = (
            cat.read_small_rows(mor.PATCH_TABLE, ["url", "new_url", "era"])
            if cat.exists(mor.PATCH_TABLE)
            else []
        )
        fold = len(stored) + n_ret > cfg.retract_patch_ceiling
        # bump FIRST and unconditionally (fold included): stage 3's
        # merge-on-read tombstones reuse this counter later in the same
        # entry-point flow and need an era strictly above every
        # pre-existing clusters row
        era = self._bump_retract_era()
        # single-slice local relation (the cluster_label_delta convention:
        # python-sourced relations otherwise parallelize into
        # defaultParallelism partitions and pay a Python worker launch per
        # partition downstream) — consumed only by broadcast joins below
        mapping_df = self.spark.createDataFrame(
            self.spark.sparkContext.parallelize(sorted(mapping.items()), 1),
            schema="url string, new_url string",
        )
        with open(self._retract_marker_path(), "w") as f:
            f.write("retraction in progress\n")
        if fold:
            # copy-on-write fold: one broadcast-mapped rewrite per stage
            # table, reading through the VIEWS so the stored patch folds in
            # with this retraction's mapping; the fresh era stamp exempts
            # the rewritten rows from every stored entry, then the patch
            # dies. The replacement rep inherits the old rep's rows
            # byte-for-byte (identical content).
            cat.write(
                self._stamp_era(
                    self.stage_view("seen").join(
                        F.broadcast(retracted), "url", "left_anti"
                    )
                ).localCheckpoint(),
                "seen",
            )
            for t in ("reps", "window_index", "seen_2b"):
                if cat.exists(t):
                    cat.write(
                        self._stamp_era(
                            relabel_url_table(self.stage_view(t), mapping_df)
                        ).localCheckpoint(),
                        t,
                    )
            for t in ("pairs", "substring_pairs"):
                if cat.exists(t):
                    cat.write(
                        self._stamp_era(
                            relabel_pair_table(self.stage_view(t), mapping_df)
                        ).localCheckpoint(),
                        t,
                    )
            _shutil.rmtree(cat.path(mor.PATCH_TABLE), ignore_errors=True)
            patch_rows = 0
        else:
            patch = mor.compose_patch(stored, mapping, era)
            cat.write_small_local(
                mor.PATCH_TABLE,
                patch,
                ["url", "new_url", "era"],
                types=[pa.string(), pa.string(), pa.int64()],
            )
            patch_rows = len(patch)
        # pending stage-3 logs are delta-sized — eager rewrite either way.
        # edges_new: relabeled under the mapping so an uncommitted stage-3
        # delta stays consistent; urls_new DROPS retracted urls outright
        # (the replacement rep is an OLD doc — substituting it would double
        # it into stage 3's new_rows); an edited url re-enters via the
        # subsequent append delta.
        if cat.exists("edges_new"):
            cat.write(
                relabel_pair_table(
                    cat.read("edges_new"), mapping_df
                ).localCheckpoint(),
                "edges_new",
            )
        if cat.exists("urls_new"):
            cat.write(
                cat.read("urls_new")
                .join(F.broadcast(retracted), "url", "left_anti")
                .localCheckpoint(),
                "urls_new",
            )
        # stage-3 dissolve log LAST among the mutations (crash before this
        # append → the marker still routes everything to the full path):
        # driver-side parquet append, zero Spark jobs
        cat._append_small(
            "urls_retracted",
            pd.DataFrame(sorted(mapping.items()), columns=["url", "new_url"]),
            pa.schema([("url", pa.string()), ("new_url", pa.string())]),
        )
        self._clear_retract_inflight()
        cat.add_metrics(
            "pairs",
            {
                "retracted_docs": n_ret,
                "retract_mor_commit": 0 if fold else 1,
                "retract_fold": 1 if fold else 0,
                "retract_patch_rows": patch_rows,
            },
        )
        return True

    # ---------- stage 2b ----------

    def stage2b_substring(self, resume: bool = True) -> None:
        cfg, cat = self.cfg, self.catalog
        h = self.stage2b_run_hash()
        # exists guard: a wiped table must rebuild even if lineage matches
        # (stage2_pairs wipes substring_pairs after a crashed retraction)
        if (
            resume
            and cat.completed_partitions("substring_pairs", h)
            and cat.exists("substring_pairs")
        ):
            return
        t0 = time.monotonic()
        pages = self.pages_table()
        if cat.exists("reps"):
            # substring pass over unique-content representatives only —
            # exact copies are already linked by stage 2's star edges
            # (view: a retraction may have relabeled reps onto survivors)
            pages = pages.join(self.stage_view("reps"), "url", "left_semi")
        # a full 2b rewrite supersedes the stage-3 append log the same way a
        # full stage-2 rewrite does (the substring edge set may change
        # wholesale — e.g. ceiling crossings can DROP pairs, which the
        # merge-only stage-3 delta cannot express) → wipe, stage 3 runs full
        import shutil as _shutil

        for t in self._STAGE3_LOG_TABLES:
            _shutil.rmtree(cat.path(t), ignore_errors=True)
        cands, flagged, windows = substring_candidates(
            pages, cfg, return_windows=True
        )
        # pairs already verified by stage 2 don't need the expensive LCS pass
        if cat.exists("pairs"):
            cands = cands.join(
                self.stage_view("pairs").select("url_a", "url_b"),
                ["url_a", "url_b"],
                "left_anti",
            )
        # materialize the (small) candidate set ONCE: the verify step reads
        # it three times (url prune ×2 branches + the pair join) — without
        # this the whole fingerprint→bucket→expand subtree re-evaluates per
        # consumer
        cands = cands.localCheckpoint()
        # delta-path state next to the verified pairs: the per-doc window
        # fingerprint index + the set of urls this pass covered (appended
        # docs delta against these, the same seen convention as stage 2).
        # Coverage = the reps table when it exists (equal to the pruned
        # pages' urls, already materialized and tiny — no second corpus
        # scan), stamped with the 2b PARAM hash so the delta can reject
        # state built under other parameters. Both sidecar writes depend
        # only on state that is materialized by the time the candidate set
        # is (doc_windows checkpoint / reps table), so they are submitted
        # here and run UNDER the LCS verify instead of as a serial tail
        # (guide §2.6) — the stage commits only at mark_complete below, so
        # crash behavior is unchanged from the sequential shape.
        covered = (
            self.stage_view("reps").select("url")
            if cat.exists("reps")
            else pages.select("url")
        )
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=2)
        try:
            fut_windows = pool.submit(
                lambda: cat.write(self._stamp_era(windows), "window_index")
            )
            fut_seen = pool.submit(
                lambda: cat.write(
                    self._stamp_era(
                        covered.withColumn(
                            "cfg_hash", F.lit(cfg.stage2b_hash())
                        )
                    ),
                    "seen_2b",
                )
            )
            hits = verify_substring_pairs(cands, pages, cfg)
            cat.write(self._stamp_era(hits), "substring_pairs")
            fut_windows.result()
            fut_seen.result()
        finally:
            pool.shutdown(wait=True)
        wall_ms = int((time.monotonic() - t0) * 1000)
        n = cat.count_rows("substring_pairs")
        cat.mark_complete("substring_pairs", h, {-1: n}, wall_ms)
        cat.add_metrics(
            "substring_pairs",
            {
                "substring_pairs": n,
                # derives from the checkpointed multi-doc window counts
                # inside substring_candidates — cheap, after the commit
                "flagged_window_buckets": flagged.count(),
                "wall_ms": wall_ms,
            },
        )

    def stage2b_delta(
        self,
        new_urls: DataFrame | None = None,
        new_pages: DataFrame | None = None,
    ) -> bool:
        """Append-only incremental stage 2b: new reps' anchored windows probe
        the persisted window_index (operators/delta.py
        delta_window_candidates) instead of re-fingerprinting the corpus.
        Returns True if the delta ran (or nothing changed); False when there
        is no valid delta state — caller runs the full stage2b_substring.
        The full stage-2 path wipes window_index/seen_2b, so an edit/delete
        rebuild can never leave stale 2b delta state behind.

        ``new_urls``: the appended reps' urls when the caller already knows
        them (the stage-2 delta just computed them, or ``append_pages`` was
        handed them) — skips the corpus×corpus discovery anti-join
        reps ∖ seen_2b. Trust-but-verify: the threaded set equals that
        difference iff prior state was consistent and exactly this batch
        was appended, which footer-level row counts decide with zero Spark
        jobs (|reps| = |seen_2b| + |new_urls|); a mismatch (e.g. 2b skipped
        for several batches via substring_pass=False) falls back to the
        discovery join.

        ``new_pages``: the appended (url, text) rows when the caller holds
        them materialized (``append_pages``'s batch) — the window
        fingerprint then reads the batch instead of probing the corpus
        pages table for the same texts. Ignored whenever ``new_urls`` falls
        back to discovery (discovered urls need not be in the batch).

        On the verified-threaded path the already-verified-pair prune uses
        the same run's appended stage-2 edges (``self._appended_edges``)
        instead of scanning the pairs/substring_pairs tables — the threaded
        urls can have no other visible edges. The discovery fallback keeps
        the edge-table probe."""
        cfg, cat = self.cfg, self.catalog
        if self._delta_suspect():
            return False  # crashed retraction/delta append → tables suspect
        h = self.stage2b_run_hash()
        # exists guard on the early-return too (not only the full path's):
        # run hashes are CONTENT-derived, so healing a crashed retraction
        # over unchanged content collides with the pre-crash commit's hash
        # while the table was just WIPED by stage2_pairs — the stale
        # lineage row must not shadow the missing table (stage 3 would
        # silently lose every substring edge)
        if cat.completed_partitions("substring_pairs", h) and cat.exists(
            "substring_pairs"
        ):
            return True
        if not (
            cat.exists("window_index")
            and cat.exists("seen_2b")
            and cat.exists("substring_pairs")
            and cat.exists("reps")
        ):
            return False
        t0 = time.monotonic()
        # param-drift guard (same convention as stage 2's delta): footer-
        # level stamp read, no Spark job, mixed stamps refuse. Crash-
        # idempotence is the delta.inflight marker's job (entry check) —
        # the round-3 anti-join guards here scanned window_index,
        # substring_pairs (twice) and seen_2b per run for the same window.
        if cat.distinct_values("seen_2b", "cfg_hash") != {cfg.stage2b_hash()}:
            return False
        # consume the same-run stage-2 edge stash (see _stage2_apply_append):
        # only trustworthy on the verified-threaded path below — a discovery
        # fallback may cover urls from EARLIER batches whose visible edges
        # the stash never saw
        edges_hint, self._appended_edges = self._appended_edges, None
        if new_urls is not None:
            n_new = new_urls.count()
            if cat.count_rows("reps") != cat.count_rows("seen_2b") + n_new:
                new_urls = None  # coverage lag → discover below
        if new_urls is None:
            edges_hint = None
            new_pages = None  # discovered urls may predate the batch
            new_urls = (
                self.stage_view("reps")
                .select("url")
                .join(
                    self.stage_view("seen_2b").select("url"),
                    "url",
                    "left_anti",
                )
                .localCheckpoint()
            )
            n_new = new_urls.count()
        if n_new == 0:
            cat.mark_complete(
                "substring_pairs", h, {-1: cat.count_rows("substring_pairs")}, 0
            )
            return True
        self._stage2b_apply_append(
            new_urls,
            n_new,
            h,
            t0,
            new_pages=new_pages,
            prior_edges=edges_hint,
        )
        return True

    def _stage2b_apply_append(
        self,
        new_urls: DataFrame,
        n_new: int,
        h: str,
        t0: float,
        new_pages: DataFrame | None = None,
        prior_edges: DataFrame | None = None,
    ) -> None:
        """Shared append core of the stage-2b delta: fingerprint the new
        docs' windows, probe the persisted window_index, verify, append.
        ``new_urls`` must be materialized, append-sized, and genuinely new
        (not covered by seen_2b)."""
        from near_duplicate_detection_spark.operators.delta import (
            delta_window_candidates,
        )
        from near_duplicate_detection_spark.operators.substring import (
            DOC_WINDOWS_SCHEMA,
            window_fingerprint_fn,
        )

        cfg, cat = self.cfg, self.catalog
        # text source: the caller's materialized batch when provided (the
        # urls are a subset of it — zero corpus reads), else a map-side
        # probe of the corpus pages table
        src = new_pages if new_pages is not None else self.pages_table()
        new_pages = src.join(
            F.broadcast(new_urls), "url", "left_semi"
        )
        new_windows = (
            new_pages.select("url", "text")
            .mapInPandas(window_fingerprint_fn(cfg), DOC_WINDOWS_SCHEMA)
            .select("url", F.explode("win_hashes").alias("win_hash"))
            .localCheckpoint()
        )
        cands, flagged = delta_window_candidates(
            self.stage_view("window_index"), new_windows, cfg
        )
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=4) as pool:
            self._stage2b_apply_append_tail(
                pool, cat, cfg, cands, flagged, new_windows, new_urls,
                prior_edges, n_new, h, t0,
            )

    def _stage2b_apply_append_tail(
        self, pool, cat, cfg, cands, flagged, new_windows, new_urls,
        prior_edges, n_new, h, t0,
    ) -> None:
        """Prune/verify/write tail of ``_stage2b_apply_append``, run inside
        its write pool's scope so an exception anywhere still joins the
        pool. The flagged metric only has to COMPLETE before the appends
        mutate the tables its lineage reads from — submit it now so it runs
        UNDER the prune + LCS-verify chain instead of as a serial step
        after it (guide §2.6)."""
        flagged_future = pool.submit(flagged.count)
        # already-verified pairs (stage 2 or earlier 2b runs) skip the LCS.
        if prior_edges is not None:
            # verified-threaded path: ``prior_edges`` is the SAME run's
            # appended stage-2 pairs (checkpointed, append-sized). Every
            # candidate touches ≥1 threaded url, and a threaded url has no
            # OTHER visible edges — it is either genuinely new or its old
            # edges were retraction-governed before the append — so one
            # broadcast anti-join prunes exactly what the edge-table scan
            # would, with zero corpus-edge reads.
            cands = cands.join(
                F.broadcast(prior_edges), ["url_a", "url_b"], "left_anti"
            ).localCheckpoint()
        else:
            # discovery path: covered urls may predate this run, so probe
            # the prior edge tables (corpus-dup-volume-sized) map-side with
            # the broadcast candidate keys, then anti-join the append-sized
            # hit set back — never a shuffle of the edge tables.
            # ONE materialization fuses candidate generation with the
            # prune: the unmaterialized cands subplan appears twice in it
            # (broadcast keys + probe side) but re-derives from the
            # checkpointed window buckets — cheaper than the extra barrier
            # a cands-then-prune double checkpoint paid.
            cand_keys = cands.select("url_a", "url_b")
            edge_tables = (
                self.stage_view("pairs")
                .select("url_a", "url_b")
                .union(
                    self.stage_view("substring_pairs").select("url_a", "url_b")
                )
            )
            prior_hits = edge_tables.join(
                F.broadcast(cand_keys), ["url_a", "url_b"], "left_semi"
            )
            # materialized: verify reads cands three times (url set + pair
            # join), and each read would otherwise re-run the scan above
            cands = cands.join(
                F.broadcast(prior_hits), ["url_a", "url_b"], "left_anti"
            ).localCheckpoint()
        hits = verify_substring_pairs(cands, self.pages_table(), cfg)
        hits = hits.localCheckpoint()  # two consumers: log + table append
        # must have COMPLETED before the appends below mutate the tables
        # its lineage reads from (stale file-listing hazard)
        n_flagged = flagged_future.result()
        self._set_marker("delta.inflight")

        # stage-3 append log BEFORE the substring_pairs append (same crash
        # ordering rule as the stage-2 delta: over-logging is safe,
        # under-logging not) — the only pairwise barrier beyond the marker,
        # run as one chained task; window_index/seen_2b are order-free (the
        # inflight marker routes any partial state to the full rebuild) and
        # overlap it from the same pool (guide §2.6; r6: the log write was
        # a serial step ahead of the pool).
        def log_then_table():
            cat.write(hits.select("url_a", "url_b"), "edges_new", mode="append")
            cat.write(self._stamp_era(hits), "substring_pairs", mode="append")

        writes = (
            log_then_table,
            lambda: cat.write(
                self._stamp_era(new_windows), "window_index", mode="append"
            ),
            lambda: cat.write(
                self._stamp_era(
                    new_urls.withColumn("cfg_hash", F.lit(cfg.stage2b_hash()))
                ),
                "seen_2b",
                mode="append",
            ),
        )
        for _ in pool.map(lambda w: w(), writes):
            pass
        wall_ms = int((time.monotonic() - t0) * 1000)
        n = cat.count_rows("substring_pairs")
        cat.mark_complete("substring_pairs", h, {-1: n}, wall_ms)
        self._clear_marker("delta.inflight")
        cat.add_metrics(
            "substring_pairs",
            {
                "substring_pairs": n,
                "delta_new_docs": n_new,
                "flagged_window_buckets": n_flagged,
                "wall_ms": wall_ms,
            },
        )

    # ---------- stage 3 ----------

    def stage3_clusters(self, resume: bool = True) -> None:
        cfg, cat = self.cfg, self.catalog
        h = self.stage3_run_hash()
        if (
            resume
            and cat.completed_partitions("clusters", h)
            and cat.exists("clusters")
            # content-derived hashes can cycle back to an ancient commit's
            # value while a stage-3 log still holds un-applied changes
            # (append X then delete X) — never trust the resume row then
            and not any(cat.exists(t) for t in self._STAGE3_LOG_TABLES)
        ):
            return
        t0 = time.monotonic()
        edges = self.stage_view("pairs").select("url_a", "url_b")
        if cat.exists("substring_pairs"):
            edges = edges.union(
                self.stage_view("substring_pairs").select("url_a", "url_b")
            )
        labels = connected_components(edges)
        clusters = clusters_table(labels, self.pages_table().select("url"))
        # wipe the append log BEFORE the clusters write (the stage-2/2b
        # convention): the full build consumes everything the log covered,
        # and a crash in the wipe-after-write window would leave a clusters
        # table that already incorporates the logged edges NEXT TO an intact
        # log — the delta's guards would then re-apply the log onto the
        # updated table (duplicate url rows). Wipe-first means a crash
        # anywhere after it routes the retry to this full path (no log ⇒
        # delta refuses), whose overwrite is idempotent.
        import shutil as _shutil

        for t in self._STAGE3_LOG_TABLES:
            _shutil.rmtree(cat.path(t), ignore_errors=True)
        # the full build recomputes every label from the edge tables, so the
        # merge-on-read patch is superseded — wipe it with the logs (before
        # the write: a stale patch key could collide with a legitimately
        # re-emerging label in the rebuilt table)
        _shutil.rmtree(cat.path("cluster_remap"), ignore_errors=True)
        cat.write(self._stamp_era(clusters), "clusters")
        # tombstones die AFTER the write (not with the remap wipe above):
        # the rebuilt rows carry the current era, which every stored
        # tombstone already fails to govern (era-inert), so a crash in
        # the write→wipe window never resurrects dead rows — while a
        # wipe-first crash would have
        _shutil.rmtree(cat.path("cluster_tombstones"), ignore_errors=True)
        self._reset_append_era()  # full rewrite re-bases fragmentation
        wall_ms = int((time.monotonic() - t0) * 1000)
        n = cat.count_rows("clusters")
        cat.mark_complete("clusters", h, {-1: n}, wall_ms)
        # multi-doc cluster metric straight from the checkpointed CC labels
        # instead of re-scanning the just-written corpus-sized table
        # (_multi_doc_clusters — the delta paths still use it): every CC
        # component has ≥2 members (labels cover exactly the nodes with an
        # edge), and no singleton's cluster_id (its own url, absent from
        # labels) can collide with a component label (a member url), so
        # distinct labels ≡ clusters with ≥2 members.
        cat.add_metrics(
            "clusters",
            {
                "rows": n,
                "multi_doc_clusters": labels.select("label")
                .distinct()
                .count(),
                "wall_ms": wall_ms,
            },
        )

    def stage3_clusters_delta(self, max_remap: int | None = None) -> bool:
        """Incremental clustering from the append/retract logs.

        Append half: contracts the logged new edges (edges_new) to the
        committed clusters' labels and runs CC over the contracted graph
        (operators/delta.py cluster_label_delta) — work scales with the
        append, not the corpus edge set (round-2 verdict #1: the last
        full-reprocess stage). Retract half (urls_retracted): every cluster
        touching a retracted url is DISSOLVED — edge removal can split it
        and change its min-url label — and its surviving members re-cluster
        as raw nodes from the post-retraction edge tables (a map-side
        semi-join filter over the full pairs/substring_pairs tables against
        the dissolved membership — an O(edges) READ, but no wide shuffle
        and no re-verification), side by side with the appended edges. A
        pure append with ZERO label merges (the common case) commits by
        appending only the new rows — O(append), no corpus-table touch;
        only merge/retract runs pay the map-side rewrite of the clusters
        table (broadcast remap join + union of new rows) — an Iceberg
        MERGE at production scale.

        Returns True if the delta ran (or clusters is already current);
        False when there is no valid log, the prior clusters build is
        uncommitted, a crashed retraction left its marker up, or the
        dissolve/remap set exceeds ``max_remap`` (the broadcast ceiling) —
        caller runs the full stage.

        Crash protocol: stage the new table as ``clusters_next``, wipe the
        log, then swap dirs. A crash at any point leaves either the old
        committed clusters + intact log (retry re-deltas, idempotent) or a
        wiped log (retry falls back to full) — never a stale-but-plausible
        clusters table."""
        import os
        import shutil as _shutil

        from near_duplicate_detection_spark.operators.delta import (
            cluster_label_delta,
            pairs_touching,
        )

        cat = self.catalog
        if max_remap is None:
            max_remap = self.cfg.max_remap
        if self._delta_suspect():
            # crashed retraction OR crashed stage-2/2b delta append: the log
            # may reference edges whose pairs append never committed
            return False
        h = self.stage3_run_hash()
        has_retract = cat.exists("urls_retracted")
        has_edges = cat.exists("edges_new")
        has_urls = cat.exists("urls_new")
        log_pending = has_edges or has_urls or has_retract
        # "already current" is only trustworthy with NO pending log: run
        # hashes are CONTENT-derived, so a change that restores an earlier
        # content state (append a doc, then delete that same doc) collides
        # with the ancient commit's hash while the log still holds the
        # un-applied retraction — the stale lineage row must not shadow it
        if cat.completed_partitions("clusters", h) and not log_pending:
            return True
        if not (cat.exists("clusters") and cat.latest_partition_stats("clusters")):
            return False  # no committed prior build to delta against
        if not log_pending:
            return False  # no log → edge set may have been rebuilt wholesale
        t0 = time.monotonic()
        n_new_edges = cat.count_rows("edges_new") if has_edges else 0
        n_old_rows = cat.count_rows("clusters")  # footer read, no Spark job
        # the VIEW (patched labels): new remaps must contract against what
        # readers currently see, and any rewrite below must fold the patch
        old = self.clusters_view().select("url", "cluster_id")
        if has_retract:
            # the dissolve log is retraction-sized and driver-written: read
            # it driver-side and ship a LocalRelation (no scan job, no
            # checkpoint, count known without a job)
            retr_urls = sorted(
                {
                    u
                    for (u,) in cat.read_small_rows("urls_retracted", ["url"])
                }
            )
            n_retr = len(retr_urls)
            retr = self.spark.createDataFrame(
                pd.DataFrame({"url": retr_urls}), schema="url string"
            )
            # affected cluster ids and the surviving frontier are both
            # ceiling-bounded (affected ≤ |retraction|; frontier guarded by
            # max_remap below), so COLLECT them into LocalRelations instead
            # of localCheckpoint+count: one evaluation each of the corpus
            # clusters view rather than two, and every downstream broadcast
            # (pairs_touching probe, base_old anti-join, tombstone union)
            # builds driver-side with no extra job
            affected_ids = sorted(
                r["cluster_id"]
                for r in old.join(F.broadcast(retr), "url", "left_semi")
                .select("cluster_id")
                .distinct()
                .collect()
            )
            n_dissolved = len(affected_ids)
            affected = self.spark.createDataFrame(
                pd.DataFrame({"cluster_id": affected_ids}),
                schema="cluster_id string",
            )
            # take(ceiling+1) pushes a CollectLimit: an over-ceiling dissolve
            # (giant cluster) early-stops instead of materializing the set
            frontier_rows = (
                old.join(F.broadcast(affected), "cluster_id", "left_semi")
                .select("url")
                .join(F.broadcast(retr), "url", "left_anti")
                .take(max_remap + 1)
            )
            n_frontier = len(frontier_rows)
            if n_frontier > max_remap:
                return False  # dissolve set too wide to broadcast → full CC
            frontier_urls = sorted(r["url"] for r in frontier_rows)
            frontier = self.spark.createDataFrame(
                pd.DataFrame({"url": frontier_urls}),
                schema="url string",
            )
            sub_edges = None
            if cat.exists("pairs"):
                all_edges = self.stage_view("pairs").select("url_a", "url_b")
                if cat.exists("substring_pairs"):
                    all_edges = all_edges.union(
                        self.stage_view("substring_pairs").select(
                            "url_a", "url_b"
                        )
                    )
                sub_edges = pairs_touching(all_edges, frontier)
            base_old = old.join(F.broadcast(affected), "cluster_id", "left_anti")
        else:
            retr = frontier = sub_edges = None
            n_retr = n_dissolved = n_frontier = 0
            base_old = old
        had_tomb = cat.exists("cluster_tombstones")
        edge_parts = []
        if has_edges:
            edge_parts.append(cat.read("edges_new").select("url_a", "url_b"))
        if sub_edges is not None:
            edge_parts.append(sub_edges)
        if edge_parts:
            combined = edge_parts[0]
            for p in edge_parts[1:]:
                combined = combined.union(p)
            combined = combined.dropDuplicates(["url_a", "url_b"])
            if sub_edges is not None:
                # the dissolve edges read the corpus-sized pairs views;
                # cluster_label_delta evaluates its edge input twice (label
                # lookup endpoints, then the contraction) — materialize ONCE.
                # Change-proportional: |edges_new| + the dissolved clusters'
                # edge degree. The pure-append path skips this (edges_new is
                # a small committed read — a checkpoint would only add a job)
                combined = combined.localCheckpoint()
            # frontier members are NOT in base_old, so the contraction keeps
            # them as raw nodes and re-derives their labels from scratch
            remap, node_labels, n_remap, changed_map = cluster_label_delta(
                base_old, combined, driver_cc_max=self.cfg.driver_cc_max
            )
            driver_solved = n_remap is not None
            if n_remap is None:
                # distributed-CC fallback: remap is a real plan — materialize
                # once and count it for the broadcast size guard
                remap = remap.localCheckpoint()
                n_remap = remap.count()
            # driver-CC path: remap/node_labels are LOCAL relations (driver
            # data) — no checkpoint, no Spark count; broadcast joins below
            # ship them directly
            if n_remap > max_remap:
                return False  # merge cascade too wide to broadcast → full CC
        else:
            remap = node_labels = None
            n_remap = 0
            changed_map = {}
            driver_solved = True  # vacuously: no edges, no remaps
        new_rows = (
            cat.read("urls_new").select("url").distinct()
            if has_urls
            else self.spark.createDataFrame([], "url string")
        )
        # NOTE: no retracted-url filter here — the retraction already
        # rewrote urls_new (dropping retracted rows), so any retracted url
        # present now is an EDITED doc legitimately re-appended by the
        # subsequent append delta
        if frontier is not None:
            # dissolved-cluster survivors re-enter exactly like new docs:
            # label from the contraction CC, else themselves (singletons)
            new_rows = new_rows.unionByName(frontier.select("url"))
        if node_labels is not None:
            new_rows = new_rows.join(node_labels, "url", "left").select(
                "url", F.coalesce("label", F.col("url")).alias("cluster_id")
            )
        else:
            new_rows = new_rows.withColumn("cluster_id", F.col("url"))
        if driver_solved:
            # Merge-on-read commit, appends AND retractions: new rows land
            # as an APPEND, label merges land as ``cluster_remap`` patch
            # rows (old_label → new_label), and a retraction's dissolved
            # memberships land as ``cluster_tombstones`` rows (url, era) —
            # applied by every reader through ``patched_clusters``. The
            # corpus-sized clusters table is never rewritten on either
            # delta path. The new remaps operate on PATCHED labels (``old``
            # above reads the view), so the stored patch composes with
            # them transitively; labels only ever decrease (min-root
            # union-find), so a folded key can never re-emerge as a
            # displayed label and one join pass resolves every row.
            # Tombstones are era-discriminated (operators/mor.py): the
            # frontier's re-labeled rows are appended at the CURRENT
            # retraction era, which the tombstone written at that same era
            # does not govern — only the pre-retraction rows die. Over any
            # broadcast ceiling the rewrite-and-swap below folds both
            # sidecars instead (the Iceberg-MERGE analog). Crash protocol:
            # marker up across append + sidecar writes + log wipe — a
            # crash leaves the marker, every delta entry refuses, and the
            # idempotent full rebuild heals.
            new_patch = self._compose_label_patch(changed_map or {})
            n_tomb = n_retr + n_frontier
            n_tomb_old = (
                cat.count_rows("cluster_tombstones") if had_tomb else 0
            )
            # era ceiling: after cfg.clusters_append_ceiling consecutive
            # MOR commits, fold instead (the rewrite below) — bounds
            # small-file growth (one file per MOR commit), patch age, and
            # tombstone accumulation (also capped at the broadcast bound)
            if (
                len(new_patch) <= max_remap
                and n_tomb_old + n_tomb <= max_remap
                and self._append_era() < self.cfg.clusters_append_ceiling
            ):
                appended = self._stamp_era(
                    new_rows.withColumn(
                        "is_representative",
                        F.col("url") == F.col("cluster_id"),
                    )
                ).coalesce(1)
                self._set_marker("delta.inflight")
                cat.write(appended, "clusters", mode="append")
                if has_retract:
                    # ALL rows of the dissolved clusters die: retracted
                    # members outright, frontier members' PRE-retraction
                    # rows (their re-labeled rows were just appended at
                    # the current era, which this tombstone — written at
                    # that same era — does not govern). Both url sets are
                    # already driver lists (ceiling-checked above), so the
                    # append is a driver-side read-union-rewrite of the
                    # ceiling-bounded sidecar — zero Spark jobs (a python-
                    # sourced Spark append pays a Python-worker launch per
                    # default partition, ~4 s measured for tiny tables)
                    import pyarrow as _pa

                    era_now = int(self._retract_era())
                    new_tomb = [
                        (u, era_now)
                        for u in sorted(set(retr_urls) | set(frontier_urls))
                    ]
                    old_tomb = (
                        cat.read_small_rows(
                            "cluster_tombstones", ["url", "era"]
                        )
                        if had_tomb
                        else []
                    )
                    cat.write_small_local(
                        "cluster_tombstones",
                        old_tomb + new_tomb,
                        ["url", "era"],
                        types=[_pa.string(), _pa.int64()],
                    )
                if new_patch:
                    # driver-side pyarrow write: zero Spark jobs (a python-
                    # sourced Spark write pays a worker launch per default
                    # partition — measured ~4 s for a 2-row table)
                    cat.write_small_local(
                        "cluster_remap",
                        sorted(new_patch.items()),
                        ["old_label", "new_label"],
                    )
                else:
                    _shutil.rmtree(
                        cat.path("cluster_remap"), ignore_errors=True
                    )
                n = cat.count_rows("clusters")  # footer read, no Spark job
                for t in self._STAGE3_LOG_TABLES:
                    _shutil.rmtree(cat.path(t), ignore_errors=True)
                wall_ms = int((time.monotonic() - t0) * 1000)
                cat.mark_complete("clusters", h, {-1: n}, wall_ms)
                self._bump_append_era()
                self._clear_marker("delta.inflight")
                cat.add_metrics(
                    "clusters",
                    {
                        # physical footer count: includes tombstoned rows
                        # until a fold reclaims them (live count = view)
                        "rows": n,
                        "delta_new_edges": n_new_edges,
                        "delta_new_urls": n - n_old_rows - n_frontier,
                        "delta_merged_labels": n_remap,
                        "delta_retracted_urls": n_retr,
                        "delta_dissolved_clusters": n_dissolved,
                        "delta_append_only_commit": 0 if has_retract else 1,
                        "delta_retract_mor_commit": 1 if has_retract else 0,
                        "delta_patch_rows": len(new_patch),
                        "delta_tombstone_rows": n_tomb_old + n_tomb,
                        "wall_ms": wall_ms,
                    },
                )
                return True
        updated_old = base_old
        if remap is not None:
            rm = remap.select(
                F.col("url").alias("_old_label"), F.col("label").alias("_new_label")
            )
            updated_old = (
                base_old.join(
                    F.broadcast(rm),
                    base_old.cluster_id == rm._old_label,
                    "left",
                )
                .select(
                    "url",
                    F.coalesce("_new_label", F.col("cluster_id")).alias(
                        "cluster_id"
                    ),
                )
            )
        clusters_next = self._stamp_era(
            updated_old.unionByName(new_rows).withColumn(
                "is_representative", F.col("url") == F.col("cluster_id")
            )
        )
        # stage → wipe log → swap (see docstring crash protocol)
        _shutil.rmtree(cat.path("clusters_next"), ignore_errors=True)
        cat.write(clusters_next, "clusters_next")
        n_merged = n_remap
        # pure-append runs derive the new-url count from footer counts
        # (clusters_next = base_old ∪ new_rows row-for-row, and base_old is
        # the whole prior table when nothing dissolved); the retract path
        # keeps the Spark count — base_old is then a filtered plan — and
        # must count BEFORE the log wipe below (new_rows reads urls_new)
        n_new_urls = (
            cat.count_rows("clusters_next") - n_old_rows
            if not (has_retract or had_tomb)
            else new_rows.count()
        )
        # marker brackets the destructive window (first wipe → swap →
        # mark_complete), mirroring the MOR branch above and compact():
        # without it, a crash after the log wipe but before the rename
        # leaves the OLD clusters table with its logs (and below, its remap
        # sidecar) gone — the next delta would then commit "no change" /
        # unpatched labels with no error anywhere. Marker up ⇒ every delta
        # entry refuses and the idempotent full rebuild heals.
        self._set_marker("delta.inflight")
        for t in self._STAGE3_LOG_TABLES:
            _shutil.rmtree(cat.path(t), ignore_errors=True)
        # the staged table was built from the VIEW, so the patch is folded
        # into it — wipe the sidecar with the logs, before the swap
        _shutil.rmtree(cat.path("cluster_remap"), ignore_errors=True)
        _shutil.rmtree(cat.path("clusters"), ignore_errors=True)
        os.rename(cat.path("clusters_next"), cat.path("clusters"))
        # tombstones die AFTER the swap (unlike the remap wipe above): the
        # staged rows carry the current era, which stored tombstones fail
        # to govern (era-inert) — a crash in the swap→wipe window is
        # harmless, while wipe-before-swap would resurrect dead rows in
        # the still-old table
        _shutil.rmtree(cat.path("cluster_tombstones"), ignore_errors=True)
        self._reset_append_era()  # rewriting commit re-bases fragmentation
        wall_ms = int((time.monotonic() - t0) * 1000)
        n = cat.count_rows("clusters")
        cat.mark_complete("clusters", h, {-1: n}, wall_ms)
        self._clear_marker("delta.inflight")
        cat.add_metrics(
            "clusters",
            {
                "rows": n,
                "delta_new_edges": n_new_edges,
                "delta_new_urls": n_new_urls,
                "delta_merged_labels": n_merged,
                "delta_retracted_urls": n_retr,
                "delta_dissolved_clusters": n_dissolved,
                # multi_doc_clusters deliberately NOT recomputed here: it is
                # a corpus-wide groupBy — an O(corpus) shuffle per append at
                # scale. Full builds report it; delta runs leave the last
                # full-build value standing (metrics are append-only).
                "wall_ms": wall_ms,
            },
        )
        return True

    def _compose_label_patch(
        self, changed: dict[str, str]
    ) -> dict[str, str]:
        """Compose the stored merge-on-read patch with this run's remaps.

        The stored patch maps physical labels to CURRENT (displayed)
        labels; ``changed`` maps current labels to this run's new labels —
        so the composition chains stored values through ``changed``, and
        ``changed`` keys not already covered become new patch keys.
        Both inputs are transitively closed (union-find roots are never
        keys; the store is composed on every commit), so the result is too.
        Driver-side dict math over broadcast-ceiling-bounded inputs."""
        cat = self.catalog
        patch: dict[str, str] = {}
        if cat.exists("cluster_remap"):
            patch = dict(
                cat.read_small_rows(
                    "cluster_remap", ["old_label", "new_label"]
                )
            )
        out = {o: changed.get(n, n) for o, n in patch.items()}
        for c, n in changed.items():
            if c not in patch:
                out[c] = n
        return {o: n for o, n in out.items() if o != n}

    def _multi_doc_clusters(self) -> int:
        """Count of clusters with ≥2 members — a distributed groupBy over the
        written clusters table (off the stage's critical path, after the
        commit; never a corpus-proportional driver-side column pull)."""
        return (
            self.clusters_view()
            .groupBy("cluster_id")
            .count()
            .where(F.col("count") > 1)
            .count()
        )

    # ---------- targeted re-index ----------

    def invalidate_urls(self, urls: list[str]) -> None:
        """Force recomputation of the buckets holding the given urls on the
        next resume run (reference `update_index` with explicit videoids,
        ndd/server_ndd.py:307-315). Implemented by retracting the buckets'
        committed signature stats: a (-1, -1) lineage row can never match
        the upstream pages stats, so the data-aware predicate re-signs
        exactly those buckets — and the changed signature lineage flows into
        every downstream runtime hash."""
        if not urls:
            return
        cfg, cat = self.cfg, self.catalog
        rows = (
            self.spark.createDataFrame([(u,) for u in urls], "url string")
            .select(self._bucket_expr().alias("bucket"))
            .distinct()
            .collect()
        )
        buckets = sorted(int(r["bucket"]) for r in rows)
        cat.mark_complete(
            "signatures",
            cfg.stage1_hash(),
            {b: -1 for b in buckets},
            0,
            checksums={b: -1 for b in buckets},
        )

    # ---------- full build ----------

    def run(
        self,
        pages: DataFrame | None = None,
        resume: bool = True,
        substring_pass: bool = True,
    ) -> DataFrame:
        """Full build. `pages=None` reuses the catalog's existing pages table."""
        if pages is not None:
            self.stage0_ingest(pages, resume)
        self.stage1_signatures(resume)
        self.stage2_pairs(resume)
        if substring_pass:
            self.stage2b_substring(resume)
        self.stage3_clusters(resume)
        return self.clusters_view()

    def run_incremental(
        self,
        pages: DataFrame | None = None,
        substring_pass: bool = True,
        changed_buckets=None,
    ) -> DataFrame:
        """Change-optimized build: stage 0 refreshes drifted buckets, stage
        1 signs only changed docs, stages 2 and 2b run their DELTA paths —
        appends probe the persisted index state, edits/deletes go through a
        targeted retraction (drop or rep-substitute the drifted urls' rows)
        and then re-enter as appends — and stage 3 merges appended edges
        into the committed clusters via cluster contraction, dissolving and
        re-clustering only the clusters a retraction touched. The full
        rebuild runs only when the delta state is missing, superseded, too
        large to retract, or marked inconsistent by a crashed retraction.
        `pages` is the FULL current snapshot (same contract as run());
        appends/edits/deletes are inferred.

        PURE-APPEND fast path: ONE fused marker-join + aggregation over the
        snapshot both classifies the drift (per-bucket checksum algebra —
        any edit/delete/url-dup fails an identity) and yields the appended
        rows, which then go through ``append_pages``'s shared delta core.
        The inferred path's control plane thereby drops from three
        corpus-table scans per run (stage-0 discovery anti-join, stage-1
        unsigned-doc anti-join, stage-2 ``classify_drift`` full-outer join)
        to ONE url-probe join; mixed drift falls back to the full
        stage-by-stage machinery below, unchanged.

        SNAPSHOT-DIFF SEAM: ``changed_buckets`` (iterable of bucket ids)
        declares that ONLY those url-hash buckets can have drifted since
        the last committed run — the information an Iceberg snapshot diff
        yields for free (changed data files → changed partitions). Under
        that contract the control plane restricts to the declared buckets:
        the stage-0 stats scan and the pure-append url probe filter to
        them (partition-pruned on the bucket-partitioned pages table), and
        stage-2 ``classify_drift``'s full-outer join reads only their
        signature partitions — O(changed-bucket data), not O(corpus).
        ``pages`` may be the full snapshot or just the changed buckets'
        complete current rows (rows hashing elsewhere are ignored); either
        way every declared bucket's CURRENT content must be fully present.
        A caller that declares too few buckets silently misses that drift —
        same trust model as ``append_pages``'s caller contract. Default
        (None) infers over the whole corpus, behavior unchanged."""
        if changed_buckets is not None:
            bset = frozenset(int(b) for b in changed_buckets)
            bad = [b for b in bset if not 0 <= b < self.cfg.num_buckets]
            if bad:
                raise ValueError(f"changed_buckets outside range: {bad[:5]}")
            self._changed_buckets = bset
        try:
            if pages is not None:
                fast = self._try_pure_append(pages, substring_pass)
                if fast is not None:
                    return fast
                # the rejected probe's identity aggregate IS this snapshot's
                # _input_stats — reuse it instead of a second full pass
                self.stage0_ingest(
                    pages, resume=True, stats_hint=self._inferred_stats
                )
            self.stage1_signatures(resume=True)
            self._appended_rep_urls = None
            self._appended_edges = None
            if not self.stage2_pairs_delta():
                self.stage2_pairs(resume=True)
            if substring_pass:
                # thread the stage-2 delta's appended rep set into 2b so it
                # can skip the corpus×corpus discovery anti-join (verified
                # there by footer-level row counts; None falls back to
                # discovery)
                if not self.stage2b_delta(new_urls=self._appended_rep_urls):
                    self.stage2b_substring(resume=True)
            if not self.stage3_clusters_delta():
                self.stage3_clusters(resume=True)
            return self.clusters_view()
        finally:
            self._changed_buckets = None
            self._inferred_stats = None

    def _try_pure_append(
        self, pages: DataFrame, substring_pass: bool
    ) -> DataFrame | None:
        """``run_incremental``'s fast path: prove the snapshot is the
        committed corpus plus appended rows, extract those rows, and run
        them through ``append_pages``. Returns the clusters DataFrame, or
        None when the snapshot is not a clean append onto a healthy catalog
        (first build, edits/deletes, signature lag, crash marker, param
        drift, no drift at all) — the caller then runs the slow inferred
        path, which handles every one of those cases.

        Proof obligation (per bucket, same mod-2^64 algebra as
        ``stage0_ingest``): split the snapshot's rows by whether their url
        already exists in the pages table (one join against the corpus URL
        column — the fast path's single corpus-table probe); the
        OLD-portion (rows, Σ xxhash64(url, text)) must equal the committed
        lineage stats exactly. An edit keeps the url but shifts the old
        checksum; a delete drops the old row count; a duplicated url
        inflates it — each fails the identity (collision odds 2^-64 per
        bucket, see ``_input_stats``). Buckets absent from the lineage must
        be all-new. The surviving difference is by construction a pure
        append, which ``append_pages`` verifies no further (its caller
        contract is established here)."""
        cat, cfg = self.catalog, self.cfg
        self._inferred_stats = None  # valid only for THIS call's snapshot
        if self._delta_suspect():
            return None  # crashed delta/retraction: slow path heals
        h1 = cfg.stage1_hash()
        pstats = cat.latest_partition_stats("pages", h1)
        if not pstats or not cat.exists("pages"):
            return None  # first build (or param change invalidated stage 0)
        if cat.latest_partition_stats("signatures", h1) != pstats:
            return None  # signatures lag pages: stage 1 must heal first
        # snapshot-diff seam: restrict the snapshot scan AND the corpus url
        # probe to the declared buckets (the probe side partition-prunes on
        # the bucket-partitioned pages table); undeclared buckets are
        # trusted committed and skip the identity check below
        marked = (
            self._restrict_changed(pages.select("url", "text"))
            .withColumn("bucket", self._bucket_expr())
            .withColumn("h", F.xxhash64("url", "text"))
            .join(
                self._restrict_changed(self.pages_table(), "bucket")
                .select("url")
                .withColumn("_old", F.lit(True)),
                "url",
                "left",
            )
        )
        is_new = F.col("_old").isNull()
        dec = F.col("h").cast("decimal(38,0)")
        zero = F.lit(0).cast("decimal(38,0)")
        agg = (
            marked.groupBy("bucket")
            .agg(
                F.count("*").alias("rows"),
                F.sum(dec).alias("cks"),
                F.sum(F.when(is_new, 1).otherwise(0)).alias("new_rows"),
                F.sum(F.when(is_new, dec).otherwise(zero)).alias("new_cks"),
            )
            .collect()
        )
        totals = {int(r["bucket"]): r for r in agg}
        # by-product stash: the aggregate above already IS _input_stats of
        # this (restricted) snapshot — per-bucket count + decimal xxhash64
        # sum, wrapped to mod-2^64 — so when drift forces the slow path,
        # run_incremental hands it to stage0_ingest instead of paying a
        # second full snapshot evaluation for the identical dict (guide
        # §1.2). The left probe join cannot change multiplicity: the pages
        # view is url-unique (MOR governance + the url-primary-key caller
        # contract this probe's identity algebra already relies on).
        self._inferred_stats = {
            b: (int(r["rows"]), _wrap64(int(r["cks"])))
            for b, r in totals.items()
        }
        n_new = sum(int(r["new_rows"]) for r in agg)
        if n_new == 0:
            return None  # no appended rows: no-drift or delete-only drift
        check = set(totals) | {b for b, s in pstats.items() if s != (0, 0)}
        if self._changed_buckets is not None:
            check &= self._changed_buckets
        for b in check:
            want_rows, want_cks = pstats.get(b, (0, 0))
            t = totals.get(b)
            old_rows = int(t["rows"]) - int(t["new_rows"]) if t else 0
            old_cks = (
                _wrap64(int(t["cks"]) - int(t["new_cks"])) if t else 0
            )
            if old_rows != want_rows:
                return None  # delete / duplicated url in this bucket
            if want_rows and old_cks != want_cks:
                return None  # edit in this bucket
        batch = marked.where(is_new).select("url", "text")
        try:
            return self.append_pages(batch, substring_pass=substring_pass)
        except AppendRefusedError:
            return None  # stale stage-2/2b/3 state: slow path rebuilds

    @staticmethod
    def _refuse(why: str):
        raise AppendRefusedError(
            f"{why} — fall back to run_incremental(full_snapshot) "
            "(or run() for a rebuild)"
        )

    def _delta_preconditions(
        self, substring_pass: bool
    ) -> dict[int, tuple[int, int]]:
        """Shared refusal gate of the explicit O(change) entry points
        (``append_pages`` / ``delete_pages`` / ``update_pages``): the
        catalog must be a committed, CURRENT build with healthy delta state
        — pages/signatures lineage consistent, pairs (and substring_pairs,
        when ``substring_pass``) committed under the current run hashes,
        param stamps matching, clusters committed, no crash marker. Every
        check is footer/lineage-level (zero Spark jobs). Raises
        ``AppendRefusedError`` (nothing mutated); returns the committed
        per-bucket pages stats."""
        cfg, cat, refuse = self.cfg, self.catalog, self._refuse
        if self._delta_suspect():
            refuse("crash marker up (a prior retraction/delta was killed)")
        h1 = cfg.stage1_hash()
        pstats = cat.latest_partition_stats("pages", h1)
        if not pstats:
            refuse("no committed pages lineage under the current params")
        sstats = cat.latest_partition_stats("signatures", h1)
        stale = [
            b
            for b in range(cfg.num_buckets)
            if pstats.get(b, (0, 0)) != (0, 0)
            and sstats.get(b) != pstats.get(b)
        ]
        if stale:
            refuse(f"signatures lag pages in buckets {stale[:5]}")
        if not (
            cat.exists("seen") and cat.exists("reps") and cat.exists("pairs")
        ):
            refuse("no stage-2 delta state (seen/reps/pairs)")
        if not cat.completed_partitions("pairs", self.stage2_run_hash()):
            refuse("pairs not committed under the current run hash")
        if cat.distinct_values("seen", "cfg_hash") != {cfg.stage2_hash()}:
            refuse("stage-2 param stamp drift in seen")
        if substring_pass:
            if not (
                cat.exists("window_index")
                and cat.exists("seen_2b")
                and cat.exists("substring_pairs")
            ):
                refuse("no stage-2b delta state")
            if not cat.completed_partitions(
                "substring_pairs", self.stage2b_run_hash()
            ):
                refuse("substring_pairs not committed under the current run hash")
            if cat.distinct_values("seen_2b", "cfg_hash") != {
                cfg.stage2b_hash()
            }:
                refuse("stage-2b param stamp drift in seen_2b")
        if not (
            cat.exists("clusters") and cat.latest_partition_stats("clusters")
        ):
            refuse("no committed clusters build")
        return pstats

    def append_pages(
        self, new_pages: DataFrame, substring_pass: bool = True
    ) -> DataFrame:
        """O(append) incremental entry point: the caller KNOWS the appended
        rows and hands exactly them (the reference's ``update_index`` with
        explicit videoids, ndd/server_ndd.py:307-315) — so the engine skips
        every per-run O(corpus) control-plane cost ``run_incremental`` pays
        to INFER the drift from a full snapshot: the stage-0 ``_input_stats``
        aggregation scan, the stage-1 unsigned-doc discovery anti-join, the
        stage-2 ``classify_drift`` full-outer join against the corpus-sized
        ``seen`` table, and the stage-2b reps∖seen_2b discovery anti-join.
        What remains corpus-proportional is only the DATA-PLANE index probe
        (map-side scans of the persisted reps/window_index tables — the
        analog of probing a partitioned index; zero corpus shuffles).

        Caller contract (refusals raise ``AppendRefusedError``, nothing
        mutated):
        - ``new_pages`` urls must not exist in the catalog — violations are
          NOT detected here (detecting them is exactly the O(corpus) probe
          this path exists to skip); a violated contract surfaces as
          duplicate urls in ``seen``/``clusters``. In-batch duplicate urls
          ARE detected (the batch-sized stats job counts distinct urls).
        - The catalog must be a committed, CURRENT build: pages/signatures
          lineage consistent, pairs (and substring_pairs, when
          ``substring_pass``) committed under the current run hashes,
          param stamps matching, clusters committed, no crash marker.

        Crash recovery: a ``delta.inflight`` marker brackets all mutations;
        after a crash, every delta entry point (including this one) refuses
        and ``run_incremental(full_snapshot)`` heals the catalog (stage 0/1
        checksum algebra re-ingests/re-signs exactly the missing rows, the
        full stage-2 rebuild clears the marker).

        Lineage semantics are identical to ``run_incremental`` on the same
        appended rows — per-bucket (rows, checksum) advance by the batch's
        delta via the same mod-2^64 algebra — so the two entry points are
        interchangeable run-to-run, which tests pin by alternating them."""
        cfg, cat = self.cfg, self.catalog
        h1 = cfg.stage1_hash()
        refuse = self._refuse
        pstats = self._delta_preconditions(substring_pass)

        # ---- batch prep: ONE materialization, bucket-pure partitions so
        # both partitioned appends below write one file per task ----
        new_rows = (
            new_pages.select("url", "text")
            .withColumn("bucket", self._bucket_expr())
            .withColumn("h", F.xxhash64("url", "text"))
            .repartition("bucket")
            .localCheckpoint()
        )
        # one batch-sized job: per-bucket (rows, checksum) delta + in-batch
        # url-duplicate detection (urls hash-partition by bucket, so the
        # per-bucket distinct counts sum to the global distinct count)
        agg = (
            new_rows.groupBy("bucket")
            .agg(
                F.count("*").alias("rows"),
                F.sum(F.col("h").cast("decimal(38,0)")).alias("cks"),
                F.countDistinct("url").alias("urls"),
            )
            .collect()
        )
        delta_stats = {
            int(r["bucket"]): (int(r["rows"]), _wrap64(int(r["cks"])))
            for r in agg
        }
        n_new = sum(int(r["rows"]) for r in agg)
        if n_new != sum(int(r["urls"]) for r in agg):
            refuse("batch contains duplicate urls")
        if n_new == 0:
            return self.clusters_view()

        # ---- stages 0 + 1, overlapped (guide §2.6; r6 second pass): the
        # pages append/commit and the batch signing both read only the
        # checkpointed batch and mutate DIFFERENT tables under the
        # delta.inflight marker, which routes any partial combination to
        # the idempotent full heal — the relative order of the two lineage
        # commits adds no guarantee (either partial order trips the
        # signatures-lag-pages precondition and heals). Both joined before
        # the stage-2 run hash is computed, since that hash is derived
        # from the advanced lineage.
        t0 = time.monotonic()
        self._set_marker("delta.inflight")
        merged = {
            b: (
                pstats.get(b, (0, 0))[0] + d[0],
                _wrap64(pstats.get(b, (0, 0))[1] + d[1]),
            )
            for b, d in delta_stats.items()
        }

        def stage0_commit():
            cat.write(
                self._stamp_era(new_rows.drop("h")),
                "pages",
                partition_by=["bucket"],
                mode="append",
                max_records_per_file=2048,
            )
            wall_ms = int((time.monotonic() - t0) * 1000)
            cat.mark_complete(
                "pages",
                h1,
                {b: m[0] for b, m in merged.items()},
                wall_ms,
                checksums={b: m[1] for b, m in merged.items()},
            )
            cat.add_metrics(
                "pages",
                {
                    "buckets_appended": len(merged),
                    "buckets_rewritten": 0,
                    "appended_docs_ingested": n_new,
                    "wall_ms": wall_ms,
                },
            )

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as pool:
            stage0_future = pool.submit(stage0_commit)
            # stage 1: sign ONLY the batch (partitions stay bucket-pure
            # through the Arrow map, so the partitioned append is
            # fan-out-free)
            t1 = time.monotonic()
            new_sigs = (
                new_rows.select("url", "text")
                .mapInPandas(signature_map_fn(cfg), schema=SIGNATURE_SCHEMA)
                .withColumn(
                    "bucket",
                    F.pmod(
                        F.xxhash64("url"), F.lit(cfg.num_buckets)
                    ).cast("int"),
                )
                .localCheckpoint()
            )
            cat.write(
                self._stamp_era(new_sigs),
                "signatures",
                partition_by=["bucket"],
                mode="append",
                max_records_per_file=2048,
            )
            wall_ms = int((time.monotonic() - t1) * 1000)
            cat.mark_complete(
                "signatures",
                h1,
                {b: m[0] for b, m in merged.items()},
                wall_ms,
                checksums={b: m[1] for b, m in merged.items()},
            )
            cat.add_metrics(
                "signatures",
                {
                    "buckets_computed": 0,
                    "buckets_appended": len(merged),
                    "appended_docs_signed": n_new,
                    "wall_ms": wall_ms,
                },
            )
            stage0_future.result()

        # ---- stages 2 / 2b / 3: the shared delta append cores ----
        h2 = self.stage2_run_hash()  # AFTER the stage-0/1 lineage advances
        new_rep_urls = self._stage2_apply_append(
            new_sigs.select("url", "fp", "bands", "simhash"),
            n_new,
            h2,
            time.monotonic(),
        )
        if substring_pass:
            if not self.stage2b_delta(
                new_urls=new_rep_urls,
                new_pages=new_rows.select("url", "text"),
            ):
                # unreachable given the preconditions above; surface rather
                # than silently rebuild (the caller wanted O(append))
                refuse("stage-2b delta state became invalid mid-append")
        if not self.stage3_clusters_delta():
            # legitimate wide-merge fallback (remap over the broadcast
            # ceiling): full CC over the catalog's committed edge tables —
            # no input snapshot needed, correctness identical
            self.stage3_clusters(resume=True)
        return self.clusters_view()

    def _fold_page_tombstones(self) -> int:
        """Physically reclaim the ``page_tombstones`` merge-on-read sidecar
        (operators/mor.py): rewrite ONLY the buckets holding governed urls
        — partition-pruned scans of pages and signatures with the tombstone
        join resolved — then drop the sidecar and any bucket whose live
        rows all died (lineage already records 0 for it). Pure physical
        reorganization: both views are row-identical before and after, no
        lineage row advances (the committed LIVE content never changed).
        Bounded by the sidecar (``page_tombstone_ceiling``), never the
        corpus. Crash protocol: ``delta.inflight`` brackets the rewrites; a
        crash mid-fold leaves views CORRECT (rewritten rows keep their
        original eras, so the still-present sidecar governs nothing that
        survived) and the marker routes every delta entry to the full heal.
        Returns the number of tombstone rows folded."""
        import shutil as _shutil

        from near_duplicate_detection_spark.operators import mor

        cat, cfg = self.catalog, self.cfg
        if not cat.exists(mor.PAGE_TOMBSTONES):
            return 0
        n_tomb = cat.count_rows(mor.PAGE_TOMBSTONES)
        tomb = mor.page_tombstone_agg(cat)
        # governed buckets from the sidecar urls: one tiny job over the
        # single-slice LocalRelation (bucket = f(url) needs Spark's xxhash64)
        buckets = sorted(
            int(r["bucket"])
            for r in tomb.withColumn("bucket", self._bucket_expr())
            .select("bucket")
            .distinct()
            .collect()
        )
        bucket_pred = F.col("bucket").isin([int(b) for b in buckets])
        live_rows = cat.latest_partition_stats("pages", cfg.stage1_hash())
        self._set_marker("delta.inflight")
        for table in ("pages", "signatures"):
            # localCheckpoint: the overwrite replaces partitions the plan
            # reads (the same source-break rule as every bucket rewrite)
            live = mor.apply_tombstones(
                cat.read(table).where(bucket_pred), tomb
            ).localCheckpoint()
            cat.write(
                live,
                table,
                partition_by=["bucket"],
                mode="overwrite",
                max_records_per_file=2048,
            )
            for b in buckets:
                if live_rows.get(b, (0, 0))[0] == 0:
                    # dynamic overwrite never touches a partition with zero
                    # output rows — drop fully-dead bucket dirs explicitly
                    cat.drop_partition(table, b)
        _shutil.rmtree(cat.path(mor.PAGE_TOMBSTONES), ignore_errors=True)
        self._clear_marker("delta.inflight")
        cat.add_metrics(
            "pages",
            {
                "tombstones_folded": n_tomb,
                "buckets_rewritten": len(buckets),
            },
        )
        return n_tomb

    def delete_pages(
        self,
        urls: list[str] | DataFrame,
        substring_pass: bool = True,
    ) -> DataFrame:
        """O(delete) explicit retraction: the caller KNOWS the deleted urls
        and hands exactly them (the reference's ``update_index`` dropping a
        vanished video's entries by videoid, ndd/server_ndd.py:246-261) —
        so the engine skips the drift inference ``run_incremental`` pays on
        a shrunken snapshot: the stage-0 ``_input_stats`` corpus scan, the
        per-drifted-bucket stage-0 rewrite from the snapshot, the stage-1
        RE-SIGNING of every drifted bucket (a uniform delete drifts ALL
        buckets, so the inferred path re-signs ~the whole surviving corpus
        through the MinHash UDF), and the ``classify_drift`` full-outer
        join. Here zero docs are re-signed: pages and signatures are
        rewritten by a broadcast anti-join over ONLY the buckets holding
        deleted urls (partition-pruned scans — the Iceberg MERGE/DELETE
        analog), lineage advances by checksum subtraction (the same
        mod-2^64 algebra as the append), and the stage-2/2b/3 tables go
        through the shared targeted-retraction core (``_stage2_retract`` —
        rep rows inherited verbatim by the min surviving exact-group
        member, dissolved clusters re-clustered by the stage-3 delta).

        Caller contract (refusals raise ``AppendRefusedError``, nothing
        mutated): every url must exist in the corpus — verified here
        cheaply (the checksum scan over the affected buckets counts the
        matches), unlike ``append_pages``'s unverifiable no-duplicate
        contract. The retraction must fit the broadcast ceiling
        (``cfg.max_retract``). The catalog must be a committed, current
        build (shared ``_delta_preconditions`` gate).

        Crash recovery: ``delta.inflight`` brackets the pages/signatures
        rewrites, ``retract.inflight`` (inside ``_stage2_retract``) the
        stage-table rewrites; after a crash every delta entry refuses and
        ``run_incremental(full_snapshot)`` heals the catalog."""
        cfg, cat, refuse = self.cfg, self.catalog, self._refuse
        h1 = cfg.stage1_hash()
        pstats = self._delta_preconditions(substring_pass)
        if not isinstance(urls, DataFrame):
            urls = self.spark.createDataFrame(
                [(u,) for u in urls], "url string"
            )
        # batch-sized: dedup + bucket each url; one tiny job yields the
        # affected-bucket list (the partition-pruning key for every corpus
        # touch below) and the retraction size
        u = (
            urls.select("url")
            .distinct()
            .withColumn("bucket", self._bucket_expr())
            .localCheckpoint()
        )
        per_bucket_urls = {
            int(r["bucket"]): int(r["n"])
            for r in u.groupBy("bucket").agg(F.count("*").alias("n")).collect()
        }
        n_del = sum(per_bucket_urls.values())
        if n_del == 0:
            return self.clusters_view()
        if n_del > cfg.max_retract:
            refuse(
                f"retraction of {n_del} urls exceeds max_retract="
                f"{cfg.max_retract} (broadcast-mapping ceiling)"
            )
        affected = sorted(per_bucket_urls)
        bucket_pred = F.col("bucket").isin([int(b) for b in affected])
        # ONE partition-pruned scan: per-bucket (rows, checksum) of the
        # doomed rows — both the lineage delta AND the existence check
        # (pages urls are unique by build invariant, so matched-row count
        # == number of handed urls actually present)
        del_stats = {
            int(r["bucket"]): (int(r["rows"]), _wrap64(int(r["cks"])))
            for r in self.pages_table()
            .where(bucket_pred)
            .join(F.broadcast(u.select("url")), "url", "left_semi")
            .withColumn("h", F.xxhash64("url", "text"))
            .groupBy("bucket")
            .agg(
                F.count("*").alias("rows"),
                F.sum(F.col("h").cast("decimal(38,0)")).alias("cks"),
            )
            .collect()
        }
        n_found = sum(r for r, _ in del_stats.values())
        if n_found != n_del:
            refuse(
                f"{n_del - n_found} of the handed urls are not in the corpus"
            )
        if any(b not in pstats for b in del_stats):
            refuse("deleted rows found in buckets with no committed lineage")
        merged = {
            b: (
                pstats[b][0] - d[0],
                _wrap64(pstats[b][1] - d[1]),
            )
            for b, d in del_stats.items()
        }

        # ---- stages 0/1: MERGE-ON-READ delete — the batch commits as ONE
        # driver-written tombstone sidecar append (url, era) governing both
        # bucket tables (operators/mor.py), lineage advances by checksum
        # subtraction, and NO bucket is rewritten (the round-3 shape
        # rewrote every affected bucket — O(corpus) write volume for a
        # uniformly random batch; it survives below as the over-ceiling
        # fold, the Iceberg position-delete + maintenance pattern).
        import pandas as pd
        import pyarrow as pa

        from near_duplicate_detection_spark.operators import mor

        t0 = time.monotonic()
        stored_tomb = (
            cat.count_rows(mor.PAGE_TOMBSTONES)
            if cat.exists(mor.PAGE_TOMBSTONES)
            else 0
        )
        fold = stored_tomb + n_del > cfg.page_tombstone_ceiling
        if fold:
            # over the sidecar ceiling: reclaim the stored tombstones
            # physically first (self-bracketing), then apply THIS batch
            # copy-on-write — ceiling 0 disables merge-on-read entirely
            self._fold_page_tombstones()
        era = self._bump_retract_era()
        self._set_marker("delta.inflight")
        if fold:
            for table in ("pages", "signatures"):
                # checkpointed: the write overwrites partitions the plan
                # reads (same source-break rule as the _stage2_retract fold)
                survivors = (
                    cat.read(table)
                    .where(bucket_pred)
                    .join(F.broadcast(u.select("url")), "url", "left_anti")
                    .localCheckpoint()
                )
                cat.write(
                    survivors,
                    table,
                    partition_by=["bucket"],
                    mode="overwrite",
                    max_records_per_file=2048,
                )
                for b, m in merged.items():
                    if m[0] == 0:
                        # dynamic overwrite never touches a partition with
                        # zero output rows — drop the emptied dir explicitly
                        cat.drop_partition(table, b)
        else:
            cat._append_small(
                mor.PAGE_TOMBSTONES,
                pd.DataFrame(
                    {
                        "url": sorted(r["url"] for r in u.select("url").collect()),
                        "era": era,
                    }
                ),
                pa.schema([("url", pa.string()), ("era", pa.int64())]),
            )
        wall_ms = int((time.monotonic() - t0) * 1000)
        for table in ("pages", "signatures"):
            cat.mark_complete(
                table,
                h1,
                {b: m[0] for b, m in merged.items()},
                wall_ms,
                checksums={b: m[1] for b, m in merged.items()},
            )
        cat.add_metrics(
            "pages",
            {
                "deleted_docs": n_del,
                "buckets_rewritten": len(affected) if fold else 0,
                "buckets_dropped": sum(
                    1 for m in merged.values() if m[0] == 0
                )
                if fold
                else 0,
                "page_tombstone_rows": 0 if fold else n_del,
                "wall_ms": wall_ms,
            },
        )

        # ---- stages 2/2b: the shared targeted-retraction core (broadcast
        # relabel/drop per stage table; rep rows inherited by the min
        # surviving exact-group member) — size pre-checked above, so a
        # False here is unreachable; surface rather than silently rebuild
        if not self._stage2_retract(u.select("url"), cfg.max_retract):
            refuse(
                "stage-2 retraction declined mid-delete (pages/signatures "
                "already rewritten — heal with run_incremental)"
            )
        # no appended docs: commit pairs/substring_pairs under the NEW run
        # hashes (the lineage advance above changed them) — same contract
        # as stage2_pairs_delta's n_new == 0 branch
        cat.mark_complete(
            "pairs", self.stage2_run_hash(), {-1: cat.count_rows("pairs")}, 0
        )
        if substring_pass:
            cat.mark_complete(
                "substring_pairs",
                self.stage2b_run_hash(),
                {-1: cat.count_rows("substring_pairs")},
                0,
            )
        self._clear_marker("delta.inflight")

        # ---- stage 3: dissolve + re-cluster only the touched clusters
        if not self.stage3_clusters_delta():
            # wide-dissolve fallback (over the broadcast ceiling): full
            # CC over the committed edge tables, correctness identical
            self.stage3_clusters(resume=True)
        return self.clusters_view()

    def update_pages(
        self, changed_rows: DataFrame, substring_pass: bool = True
    ) -> DataFrame:
        """O(edit) explicit upsert, single-pass: the caller hands the NEW
        (url, text) rows of docs that already exist (the reference's
        ``update_index`` re-indexing explicit videoids,
        ndd/server_ndd.py:307-315). The inferred edit path
        (``run_incremental`` on the full snapshot) re-signs every drifted
        bucket — ~the whole corpus for a uniform edit set; here ONLY the
        handed batch goes through the signature UDF.

        Fused, not composed: the former delete_pages + append_pages
        composition paid both delta chains' fixed costs — each affected
        bucket of pages AND signatures written twice (anti-join overwrite,
        then append), four lineage commits, two run-hash advances with an
        intermediate no-op pairs/substring_pairs commit between them.
        Every updated url keeps its bucket (bucket = f(url)), so here each
        affected bucket is rewritten ONCE with survivors ∪ re-signed batch
        rows, per-bucket row counts are INVARIANT and lineage advances
        ONCE by checksum substitution (old rows subtracted, batch rows
        added — the same mod-2^64 algebra), and the shared stage-2
        retraction + append cores run back-to-back under the single final
        run hash. Stage 3 commits both halves — retraction dissolves +
        appended edges — in ONE clusters swap (the same mixed-drift shape
        ``run_incremental`` produces).

        Caller contract (refusals raise ``AppendRefusedError``, nothing
        mutated): every url must already exist in the corpus — verified
        cheaply by the affected-bucket checksum scan; no duplicate urls in
        the batch; the batch must fit the broadcast-mapping ceiling
        (``cfg.max_retract``); the catalog must be a committed, current
        build (shared ``_delta_preconditions`` gate).

        Crash recovery: ``delta.inflight`` brackets the pages/signatures
        rewrites and the stage-2 appends, ``retract.inflight`` (inside
        ``_stage2_retract``) the stage-table relabels; after a crash every
        delta entry refuses and ``run_incremental(full_snapshot)`` heals
        the catalog."""
        cfg, cat, refuse = self.cfg, self.catalog, self._refuse
        h1 = cfg.stage1_hash()
        pstats = self._delta_preconditions(substring_pass)

        # ---- batch prep: ONE materialization, bucket-pure partitions so
        # both partitioned rewrites below write one file per task ----
        new_rows = (
            changed_rows.select("url", "text")
            .withColumn("bucket", self._bucket_expr())
            .withColumn("h", F.xxhash64("url", "text"))
            .repartition("bucket")
            .localCheckpoint()
        )
        agg = (
            new_rows.groupBy("bucket")
            .agg(
                F.count("*").alias("rows"),
                F.sum(F.col("h").cast("decimal(38,0)")).alias("cks"),
                F.countDistinct("url").alias("urls"),
            )
            .collect()
        )
        add_stats = {
            int(r["bucket"]): (int(r["rows"]), _wrap64(int(r["cks"])))
            for r in agg
        }
        n_upd = sum(r for r, _ in add_stats.values())
        if n_upd == 0:
            return self.clusters_view()
        if n_upd != sum(int(r["urls"]) for r in agg):
            refuse("batch contains duplicate urls")
        if n_upd > cfg.max_retract:
            refuse(
                f"update of {n_upd} urls exceeds max_retract="
                f"{cfg.max_retract} (broadcast-mapping ceiling)"
            )
        urls = new_rows.select("url")
        affected = sorted(add_stats)
        bucket_pred = F.col("bucket").isin([int(b) for b in affected])
        # ONE partition-pruned scan: per-bucket (rows, checksum) of the
        # doomed OLD rows — the subtraction half of the lineage delta AND
        # the existence check (pages urls are unique by build invariant,
        # so matched-row count == number of handed urls actually present)
        del_stats = {
            int(r["bucket"]): (int(r["rows"]), _wrap64(int(r["cks"])))
            for r in self.pages_table()
            .where(bucket_pred)
            .join(F.broadcast(urls), "url", "left_semi")
            .withColumn("h", F.xxhash64("url", "text"))
            .groupBy("bucket")
            .agg(
                F.count("*").alias("rows"),
                F.sum(F.col("h").cast("decimal(38,0)")).alias("cks"),
            )
            .collect()
        }
        n_found = sum(r for r, _ in del_stats.values())
        if n_found != n_upd:
            refuse(
                f"{n_upd - n_found} of the handed urls are not in the corpus"
            )
        if any(b not in pstats for b in del_stats):
            refuse("updated rows found in buckets with no committed lineage")
        # bucket = f(url): every replaced row re-enters its own bucket, so
        # per-bucket row counts hold and only the checksums substitute
        merged = {
            b: (
                pstats[b][0] - del_stats[b][0] + a[0],
                _wrap64(pstats[b][1] - del_stats[b][1] + a[1]),
            )
            for b, a in add_stats.items()
        }

        # ---- stage 1 compute: sign ONLY the batch (pure — no mutation
        # yet, so a crash here needs no heal; partitions stay bucket-pure
        # through the Arrow map)
        t0 = time.monotonic()
        new_sigs = (
            new_rows.select("url", "text")
            .mapInPandas(signature_map_fn(cfg), schema=SIGNATURE_SCHEMA)
            .withColumn(
                "bucket",
                F.pmod(F.xxhash64("url"), F.lit(cfg.num_buckets)).cast("int"),
            )
            .localCheckpoint()
        )

        # ---- stages 0/1 commit: MERGE-ON-READ upsert — the old rows die
        # as ONE driver-written tombstone sidecar append (url, era) and the
        # re-signed batch lands as new era-stamped files in its buckets
        # (delete-then-append, the Iceberg v2 position-delete + append
        # commit shape; rows stamped AT the tombstone era are the re-adds
        # and survive — operators/mor.py). NO bucket is rewritten; the
        # round-3 survivors ∪ batch rewrite survives as the over-ceiling
        # fold. Batch partitions are bucket-pure, so both appends write one
        # file per touched bucket.
        import pandas as pd
        import pyarrow as pa

        from near_duplicate_detection_spark.operators import mor

        stored_tomb = (
            cat.count_rows(mor.PAGE_TOMBSTONES)
            if cat.exists(mor.PAGE_TOMBSTONES)
            else 0
        )
        fold = stored_tomb + n_upd > cfg.page_tombstone_ceiling
        if fold:
            # over the sidecar ceiling: reclaim stored tombstones first
            # (self-bracketing), then apply THIS batch copy-on-write —
            # ceiling 0 disables merge-on-read entirely
            self._fold_page_tombstones()
        era = self._bump_retract_era()
        self._set_marker("delta.inflight")
        if fold:
            for table, fresh in (
                ("pages", self._stamp_era(new_rows.drop("h"))),
                ("signatures", self._stamp_era(new_sigs)),
            ):
                # checkpointed: the write overwrites partitions the plan
                # reads. allowMissingColumns: the stored pages table keeps
                # the input's full schema (warc_ts/html/lang ride along);
                # the batch carries only (url, text, bucket, era) —
                # extraction inputs — so its rows null-fill the passthrough
                # columns, same as an appended batch
                replaced = (
                    cat.read(table)
                    .where(bucket_pred)
                    .join(F.broadcast(urls), "url", "left_anti")
                    .unionByName(fresh, allowMissingColumns=True)
                    .localCheckpoint()
                )
                cat.write(
                    replaced,
                    table,
                    partition_by=["bucket"],
                    mode="overwrite",
                    max_records_per_file=2048,
                )
        else:
            cat._append_small(
                mor.PAGE_TOMBSTONES,
                pd.DataFrame(
                    {
                        "url": sorted(r["url"] for r in urls.collect()),
                        "era": era,
                    }
                ),
                pa.schema([("url", pa.string()), ("era", pa.int64())]),
            )
            # the two appends are order-free (different tables, both under
            # the marker — any partial combination heals) — pooled (§2.6)
            from concurrent.futures import ThreadPoolExecutor

            appends = (
                lambda: cat.write(
                    self._stamp_era(new_rows.drop("h")),
                    "pages",
                    partition_by=["bucket"],
                    mode="append",
                    max_records_per_file=2048,
                ),
                lambda: cat.write(
                    self._stamp_era(new_sigs),
                    "signatures",
                    partition_by=["bucket"],
                    mode="append",
                    max_records_per_file=2048,
                ),
            )
            with ThreadPoolExecutor(max_workers=2) as pool:
                for _ in pool.map(lambda w: w(), appends):
                    pass
        wall_ms = int((time.monotonic() - t0) * 1000)
        for table in ("pages", "signatures"):
            cat.mark_complete(
                table,
                h1,
                {b: m[0] for b, m in merged.items()},
                wall_ms,
                checksums={b: m[1] for b, m in merged.items()},
            )
        cat.add_metrics(
            "pages",
            {
                "updated_docs": n_upd,
                "buckets_rewritten": len(affected) if fold else 0,
                "page_tombstone_rows": 0 if fold else n_upd,
                "wall_ms": wall_ms,
            },
        )
        cat.add_metrics(
            "signatures",
            {
                "buckets_computed": 0,
                "buckets_appended": 0,
                "appended_docs_signed": n_upd,
                "wall_ms": wall_ms,
            },
        )

        # ---- stage 2: the shared retraction core (old rows out of every
        # stage table; rep rows inherited by the min surviving exact-group
        # member), then the shared append core — back-to-back under the
        # ONE final run hash (size pre-checked above, so a False here is
        # unreachable; surface rather than silently rebuild)
        if not self._stage2_retract(urls, cfg.max_retract):
            refuse(
                "stage-2 retraction declined mid-update (pages/signatures "
                "already rewritten — heal with run_incremental)"
            )
        h2 = self.stage2_run_hash()  # AFTER the single stage-1 advance
        new_rep_urls = self._stage2_apply_append(
            new_sigs.select("url", "fp", "bands", "simhash"),
            n_upd,
            h2,
            time.monotonic(),
        )
        if substring_pass:
            if not self.stage2b_delta(
                new_urls=new_rep_urls,
                new_pages=new_rows.select("url", "text"),
            ):
                refuse("stage-2b delta state became invalid mid-update")

        # ---- stage 3: ONE clusters swap commits retraction + re-append
        if not self.stage3_clusters_delta():
            # wide-merge/dissolve fallback (over the broadcast ceiling):
            # full CC over the committed edge tables, correctness identical
            self.stage3_clusters(resume=True)
        return self.clusters_view()

    def compact(self) -> dict:
        """Table maintenance: fold the merge-on-read label patch and rewrite
        fragmented storage — the Iceberg ``rewrite_data_files`` + patch-fold
        analog. Pure physical reorganization: every read view is
        row-identical before and after, and NO lineage row advances (the
        committed content, hence every run hash and per-bucket checksum, is
        untouched — resume stays a no-op).

        Two targets:
        - ``clusters``: when a ``cluster_remap`` sidecar exists or any
          append eras accumulated (each merge-on-read commit adds exactly
          one file), rewrite from ``clusters_view`` — folding the patch —
          via the staged ``clusters_next`` → atomic-rename swap, wipe the
          sidecar, reset the era counter. Readers then skip the patch join
          entirely.
        - ``pages`` / ``signatures``: buckets holding more than one parquet
          file (every delta append/upsert adds one file per touched bucket)
          are rewritten in place by dynamic partition overwrite — ONE
          shuffle over only the fragmented buckets' rows (partition-pruned
          scan), bucket-pure partitions so each bucket lands as one file.

        The append path folds on its own once
        ``cfg.clusters_append_ceiling`` eras accumulate; this entry point
        is for operators who want to schedule the rewrite cost off the
        ingest path (the reference has no analog — its index is a single
        pickle rewritten wholesale, ndd/server_ndd.py:246-261).

        Refuses (``AppendRefusedError``, nothing mutated) while a crash
        marker is up or a stage-3 log is pending — maintenance must not
        interleave with a mid-flight delta. Crash protocol: the
        ``delta.inflight`` marker brackets every destructive window (swap
        and bucket overwrites); a crash leaves the marker, all delta entry
        points refuse, and ``run_incremental(full_snapshot)`` heals via the
        per-bucket checksum algebra, exactly as for a crashed retraction.
        Returns ``{table: (files_before, files_after), ...}``."""
        import os as _os
        import shutil as _shutil

        cat, refuse = self.catalog, self._refuse
        if self._delta_suspect():
            refuse("crash marker up (a prior retraction/delta was killed)")
        if any(cat.exists(t) for t in self._STAGE3_LOG_TABLES):
            refuse("stage-3 log pending (mid-flight delta)")
        t0 = time.monotonic()
        out: dict = {}
        if cat.exists("clusters") and (
            cat.exists("cluster_remap")
            or cat.exists("cluster_tombstones")
            or self._append_era() > 0
        ):
            before = cat.file_count("clusters")
            _shutil.rmtree(cat.path("clusters_next"), ignore_errors=True)
            # the view resolves tombstones + label patch → both folded
            cat.write(self._stamp_era(self.clusters_view()), "clusters_next")
            self._set_marker("delta.inflight")
            _shutil.rmtree(cat.path("cluster_remap"), ignore_errors=True)
            _shutil.rmtree(cat.path("clusters"), ignore_errors=True)
            _os.rename(cat.path("clusters_next"), cat.path("clusters"))
            # after the swap: era-inert against the staged rows, so the
            # swap→wipe crash window never resurrects dead rows
            _shutil.rmtree(cat.path("cluster_tombstones"), ignore_errors=True)
            self._reset_append_era()
            self._clear_marker("delta.inflight")
            out["clusters"] = (before, cat.file_count("clusters"))
        from near_duplicate_detection_spark.operators import mor as _mor

        if cat.exists(_mor.PATCH_TABLE):
            # fold the merge-on-read RETRACTION patch (operators/mor.py):
            # rewrite each governed stage-2/2b table from its view — the
            # broadcast-resolved logical rows — with a fresh era stamp,
            # then drop the sidecar. Readers skip the patch join entirely
            # afterwards. Crash protocol: retract.inflight brackets the
            # multi-table rewrite (same marker as a mid-flight retraction);
            # a crash routes every delta entry to the full rebuild.
            n_patch = cat.count_rows(_mor.PATCH_TABLE)
            with open(self._retract_marker_path(), "w") as f:
                f.write("patch fold in progress\n")
            for table in _mor.GOVERNED_TABLES:
                if cat.exists(table):
                    cat.write(
                        self._stamp_era(self.stage_view(table))
                        .localCheckpoint(),
                        table,
                    )
            _shutil.rmtree(cat.path(_mor.PATCH_TABLE), ignore_errors=True)
            self._clear_retract_inflight()
            out["retract_patch"] = (1, 0)
            cat.add_metrics(
                "compaction", {"retract_patch_rows_folded": n_patch}
            )
        if cat.exists(_mor.PAGE_TOMBSTONES):
            # fold the merge-on-read PAGE tombstones (explicit deletes/
            # updates commit url tombstones instead of bucket rewrites):
            # rewrite only the governed buckets of pages/signatures with
            # the tombstone join resolved, drop the sidecar. Readers then
            # skip the tombstone join entirely.
            folded = self._fold_page_tombstones()
            out["page_tombstones"] = (1, 0)
            cat.add_metrics(
                "compaction", {"page_tombstone_rows_folded": folded}
            )
        for table in ("pages", "signatures"):
            if not cat.exists(table):
                continue
            frag = cat.fragmented_partitions(table)
            if not frag:
                continue
            before = cat.file_count(table)
            # localCheckpoint: materialize the fragmented rows BEFORE the
            # overwrite — the write would otherwise read the very files it
            # replaces. Bounded by the fragmented buckets' size, not the
            # corpus (partition-pruned scan).
            df = (
                cat.read(table)
                .where(F.col("bucket").isin(frag))
                .repartition("bucket")  # bucket-pure → one file per bucket
                .localCheckpoint()
            )
            self._set_marker("delta.inflight")
            cat.write(df, table, partition_by=["bucket"])
            self._clear_marker("delta.inflight")
            out[table] = (before, cat.file_count(table))
        # a serving operator who built a band_index wants it to survive
        # maintenance: any bucket rewrite above flipped its source stamp,
        # so refresh it here (off the ingest path — exactly where the
        # rebuild cost belongs). No-op when no index exists or the stamp
        # still matches (nothing above touched signatures).
        from near_duplicate_detection_spark.operators import serving_index as _si

        if cat.exists(_si.BAND_INDEX) and _si.fresh_band_index(cat) is None:
            self.build_serving_index()
            out[_si.BAND_INDEX] = (0, cat.file_count(_si.BAND_INDEX))
        if out:
            flat = {
                f"{t}_files_{w}": v[i]
                for t, v in out.items()
                for i, w in ((0, "before"), (1, "after"))
            }
            flat["wall_ms"] = int((time.monotonic() - t0) * 1000)
            cat.add_metrics("compaction", flat)
        return out

    def build_serving_index(self, partitions: int | None = None) -> None:
        """Materialize the partition-pruned query probe index
        (operators/serving_index.py): ``band_index`` partitioned by
        ``xxhash64(band_hash) % cfg.band_index_partitions``, stamped against
        the current signatures + page_tombstones state. ``query_top_k``
        uses it only while that stamp matches — any later commit routes
        queries back to the exact full-view probe, so this is pure derived
        state a serving operator refreshes on their own cadence (the
        natural point is right after ``compact()``)."""
        from near_duplicate_detection_spark.operators.serving_index import (
            build_band_index,
        )

        build_band_index(self.catalog, self.cfg, partitions)


class AppendRefusedError(RuntimeError):
    """``append_pages`` could not run its O(append) plan (stale or crashed
    catalog state, param drift, duplicate urls in the batch). Nothing was
    mutated unless the message says otherwise; recover with
    ``run_incremental(full_snapshot)`` or a full ``run()``."""


def pages_view(catalog: StageCatalog) -> DataFrame:
    """The pages table with the ``page_tombstones`` merge-on-read sidecar
    resolved (operators/mor.py): explicit deletes/updates append url
    tombstones instead of rewriting every affected bucket, and readers drop
    the governed rows through one broadcast join against a cached
    LocalRelation (era semantics: a row written at or after the tombstone's
    commit is a re-add and survives). Physical reclamation happens at the
    ``page_tombstone_ceiling`` fold or via ``compact()``."""
    from near_duplicate_detection_spark.operators import mor

    df = catalog.read("pages")
    tomb = mor.page_tombstone_agg(catalog)
    return df if tomb is None else mor.apply_tombstones(df, tomb)


def signatures_view(catalog: StageCatalog) -> DataFrame:
    """The signatures table under the same ``page_tombstones`` governance
    as ``pages_view`` (one row per live url each, written in lockstep)."""
    from near_duplicate_detection_spark.operators import mor

    df = catalog.read("signatures")
    tomb = mor.page_tombstone_agg(catalog)
    return df if tomb is None else mor.apply_tombstones(df, tomb)


def patched_clusters(catalog: StageCatalog) -> DataFrame:
    """The committed clusters VIEW: physical rows plus the merge-on-read
    label patch.

    Stage-3 append commits never rewrite the corpus-sized clusters table —
    appended rows land as new files and label MERGES land as
    ``cluster_remap`` rows (old_label → new_label), applied here by one
    broadcast join (the patch is bounded by ``cfg.max_remap``, the same
    broadcast ceiling the delta already enforces). This is the Iceberg
    merge-on-read pattern: any rewriting commit (full build, retraction
    dissolve, over-ceiling fold) folds the patch into the physical rows and
    wipes it, so the patch never grows past one append era. The patch is
    transitively closed by construction (composition at every commit), so
    one join pass fully resolves labels; ``is_representative`` is
    recomputed against the patched label.

    Stage-3 RETRACTION commits are merge-on-read too: a dissolved
    cluster's memberships land as ``cluster_tombstones`` rows (url, era)
    and the surviving members' re-labeled rows are appended at the
    retraction's era. A tombstone governs exactly the rows that PREDATE
    it (row.era < tombstone era — operators/mor.py era semantics; the
    newest tombstone per url suffices because a tombstone always kills
    every row alive at its commit). Both sidecars resolve here with one
    broadcast join each, bounded by ``cfg.max_remap``; any rewriting
    commit folds and wipes them."""
    from near_duplicate_detection_spark.operators import mor

    df = catalog.read("clusters")
    cols = ("url", "cluster_id", "is_representative")
    tomb = mor.tombstone_agg(catalog)
    if tomb is not None:
        df = mor.apply_tombstones(df, tomb)
    rm = mor.remap_df(catalog)
    if rm is None:
        return df.select(*cols)
    return (
        df.join(F.broadcast(rm), df["cluster_id"] == rm["old_label"], "left")
        .select(
            df["url"],
            F.coalesce(rm["new_label"], df["cluster_id"]).alias("cluster_id"),
        )
        .withColumn("is_representative", F.col("url") == F.col("cluster_id"))
    )


# ---------- flagship read path (reference SURVEY §3.1) ----------


def query_top_k(
    spark: SparkSession,
    catalog: StageCatalog,
    cfg: NDDConfig,
    query_text: str,
    k: int = 30,
) -> DataFrame:
    """Top-k near-duplicates of an ad-hoc text, one per cluster.

    Engine equivalent of the reference's similarity query
    (ndd/server_ndd.py:97-156): signature probe (same UDF as indexing) →
    LSH band broadcast-join (replaces the O(N) matmul) → exact-Jaccard
    verify → keep-first per cluster (W1) → orderBy + limit (W2/W4,
    Catalyst plans TakeOrderedAndProject).

    FRESHNESS CONTRACT (mid-incremental reads): an in-flight
    run_incremental/append_pages commits signatures and pairs BEFORE the
    clusters table advances (and the stage-3 delta swaps clusters via a
    staged ``clusters_next`` dir, so this table is never half-written). A
    query in that window sees the appended docs — they are in the
    signatures index the band probe hits — but not yet in clusters; the
    ``coalesce(cluster_id, url)`` rule below gives each such doc its OWN
    dedup group, so appended docs appear individually (never collapsed
    into one arbitrary group, never silently dropped) and previously
    committed docs keep their committed grouping. Results are therefore
    always a consistent read of "last committed clusters + individually
    listed newer docs" — tests/test_query_freshness.py pins this.
    """
    import numpy as np
    import pandas as pd

    from near_duplicate_detection_spark.functions.hashing import perm_params
    from near_duplicate_detection_spark.functions.signatures import (
        compute_signatures_batch,
    )

    from near_duplicate_detection_spark.functions.signatures import (
        SHINGLE_SET_SCHEMA,
        shingle_sets_map_fn,
    )

    a, b = perm_params(cfg.num_perms)
    qsig = compute_signatures_batch(
        pd.Series(["query://q"]), pd.Series([query_text]), cfg, a, b,
        include_shingles=True,
    )
    q_bands = [
        (i, int(h)) for i, h in enumerate(qsig["bands"].iloc[0])
    ]
    q_shingles = [int(s) for s in qsig["shingles"].iloc[0]]

    from near_duplicate_detection_spark.operators.serving_index import (
        probe_urls,
    )

    # candidate generation: partition-pruned band_index probe when a FRESH
    # index exists (operators/serving_index.py — any commit since its build
    # flips the source stamp and this falls back to the full signatures
    # view), else the exact full-view band join
    candidates = probe_urls(spark, catalog, q_bands)
    # exact verify against candidates only: recompute their shingle sets.
    # The text fetch is partition-pruned (_candidate_texts) — without it
    # this leg full-scanned pages per request, the same corpus-proportional
    # read the band_index removes from the probe side.
    cand_sets = _candidate_texts(spark, catalog, cfg, candidates).mapInPandas(
        shingle_sets_map_fn(cfg), SHINGLE_SET_SCHEMA
    )
    # query shingles ride along as a one-row broadcast, not a literal array
    # expression — a long query text would otherwise bloat the plan tree
    qdf = spark.createDataFrame([(q_shingles,)], "q_shingles array<bigint>")
    inter = F.size(F.array_intersect(F.col("shingles"), F.col("q_shingles")))
    union = F.size("shingles") + F.size("q_shingles") - inter
    scored = (
        cand_sets.crossJoin(F.broadcast(qdf))
        .withColumn("jaccard", inter.cast("double") / union.cast("double"))
        .select("url", "jaccard")
    )
    clusters = patched_clusters(catalog).select("url", "cluster_id")
    from pyspark.sql import Window as W

    # candidates missing from a stale/mid-rebuild clusters table must each
    # form their OWN dedup group — partitioning on a raw NULL cluster_id
    # would collapse all of them into one group and keep a single hit
    w = W.partitionBy(F.coalesce("cluster_id", F.col("url"))).orderBy(
        F.desc("jaccard"), F.asc("url")
    )
    return (
        scored.join(clusters, "url", "left")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
        .orderBy(F.desc("jaccard"), F.asc("url"))
        .limit(k)
    )


def _candidate_texts(
    spark: SparkSession, catalog: StageCatalog, cfg: NDDConfig, candidates
) -> DataFrame:
    """(url, text) for one query's candidate urls, read partition-pruned.

    A single query's candidate set is bounded — each probed (band, hash)
    bucket holds at most ``max_bucket_size`` urls by the ``over_ceiling``
    contract, so |candidates| ≤ lsh_bands × max_bucket_size — small enough
    to collect. The urls' buckets become driver-known literals: a
    ``bucket IN (...)`` filter prunes the pages scan to at most
    |candidates| of ``num_buckets`` directories (directory pruning, the
    same mechanism as the band_index's ``pt IN``), and a broadcast
    semi-join against the collected urls (a LocalRelation — no literal-list
    plan bloat) keeps exactly the candidate rows. Above
    ``cfg.query_collect_ceiling`` (degenerate probe output) this falls back
    to the unpruned semi-join, the right plan at that size; the batch path
    (``query_top_k_batch``) never uses this — its candidates are a
    distributed table and a large batch hits every bucket anyway."""
    full = pages_view(catalog)
    rows = candidates.limit(cfg.query_collect_ceiling + 1).collect()
    if len(rows) > cfg.query_collect_ceiling:
        return full.select("url", "text").join(candidates, "url", "left_semi")
    if not rows:
        return full.select("url", "text").where(F.lit(False))
    urls_df = spark.createDataFrame(
        [(r["url"],) for r in rows], "url string"
    )
    # bucket = f(url) through Spark's own xxhash64 (one LocalRelation
    # expression evaluation, no scan job) so the literals match the
    # partition values stage 0 wrote exactly
    buckets = sorted(
        {
            int(r["b"])
            for r in urls_df.select(
                F.pmod(F.xxhash64("url"), F.lit(cfg.num_buckets))
                .cast("int")
                .alias("b")
            ).collect()
        }
    )
    return (
        full.where(F.col("bucket").isin(buckets))
        .join(F.broadcast(urls_df), "url", "left_semi")
        .select("url", "text")
    )


def query_top_k_batch(
    spark: SparkSession,
    catalog: StageCatalog,
    cfg: NDDConfig,
    queries: DataFrame,
    k: int = 30,
) -> DataFrame:
    """Top-k near-duplicates for a whole TABLE of queries in one plan.

    The reference serves one query per HTTP request (ndd/server_ndd.py:
    271-306, an O(N) scan each); the Spark-native generalization signs every
    query with the SAME distributed Arrow UDF used for indexing, then
    resolves all of them with two equi-joins:

      queries --mapInPandas--> query signatures
        bands  ⋈  index bands      → (query_id, url) candidates
        shingles ⋈ candidate sets  → exact Jaccard per (query_id, url)
      window (query_id, cluster) keep-first → window query_id top-k

    Everything scales with candidates, not queries × corpus: the band join
    is an equi-join Catalyst is free to broadcast (few queries) or shuffle
    (query table as big as the index — e.g. corpus-vs-corpus linking); the
    verify shingle sets are computed once per DISTINCT candidate url across
    all queries.

    queries: DataFrame(query_id string, text string) → DataFrame(query_id,
    url, jaccard, cluster_id, rank), rank 1..k per query, one hit per
    cluster per query (W1 semantics).
    """
    from pyspark.sql import Window as W

    from near_duplicate_detection_spark.functions.signatures import (
        SHINGLE_SET_SCHEMA,
        SIGNATURE_SCHEMA,
        shingle_sets_map_fn,
        signature_map_fn,
    )
    from near_duplicate_detection_spark.operators.lsh import explode_bands

    q = queries.select(F.col("query_id").alias("url"), "text")
    qsigs = q.mapInPandas(signature_map_fn(cfg), SIGNATURE_SCHEMA)
    q_bands = explode_bands(qsigs).select(
        F.col("url").alias("query_id"), "band_id", "band_hash"
    )
    q_sets = q.mapInPandas(shingle_sets_map_fn(cfg), SHINGLE_SET_SCHEMA).select(
        F.col("url").alias("query_id"), F.col("shingles").alias("q_shingles")
    )

    candidates = (
        explode_bands(signatures_view(catalog))
        .join(q_bands, ["band_id", "band_hash"])
        .select("query_id", "url")
        .distinct()
    )
    # verify sets once per distinct candidate url (shared across queries)
    cand_sets = (
        pages_view(catalog)
        .select("url", "text")
        .join(candidates.select("url").distinct(), "url", "left_semi")
        .mapInPandas(shingle_sets_map_fn(cfg), SHINGLE_SET_SCHEMA)
    )
    inter = F.size(F.array_intersect(F.col("shingles"), F.col("q_shingles")))
    union = F.size("shingles") + F.size("q_shingles") - inter
    scored = (
        candidates.join(cand_sets, "url")
        .join(q_sets, "query_id")
        .withColumn("jaccard", inter.cast("double") / union.cast("double"))
        .select("query_id", "url", "jaccard")
    )
    clusters = patched_clusters(catalog).select("url", "cluster_id")
    # same unclustered-candidate rule as query_top_k: NULL cluster_id rows
    # each keep their own group rather than sharing one NULL partition
    w_cluster = W.partitionBy(
        "query_id", F.coalesce("cluster_id", F.col("url"))
    ).orderBy(F.desc("jaccard"), F.asc("url"))
    w_rank = W.partitionBy("query_id").orderBy(F.desc("jaccard"), F.asc("url"))
    return (
        scored.join(clusters, "url", "left")
        .withColumn("rn", F.row_number().over(w_cluster))
        .where(F.col("rn") == 1)
        .withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= k)
        .drop("rn")
    )
