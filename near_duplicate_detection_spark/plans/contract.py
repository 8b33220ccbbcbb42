"""Driver-contract query catalog: SURVEY §2 operators on the shared test
tables, each as (spark_fn, oracle_sql) where the oracle is ANSI SQL DuckDB
runs on the same parquet views.

Column-name parity rule: every computed column is aliased IDENTICALLY in the
Spark plan and the SQL so the driver's order-insensitive value-hash matches.
Floating aggregates are rounded on BOTH sides (driver hashes exact values).
Every query with a deterministic LIMIT carries a full tiebreak ORDER BY.

Reference citations per query are in each docstring (file:line into
/root/reference)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

# ---------------------------------------------------------------- helpers

_STOPLIST = ["the", "a", "of", "and", "to", "in"]
_CANON = [10.0, 30.0, 60.0, 90.0]
_CANON_LABELS = ["low", "mid", "high", "top"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------- queries


def q_window_dedup_topk(spark, sf_dir):
    """W1/W2/W4 (server_ndd.py:127-141,117; client_flask.py:123-124):
    keep-first per group within a global order, then top-k — the reference's
    dedup-by-(videoid, shot) over distance-sorted hits."""
    li = _t(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_partkey").orderBy(
        F.asc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "l_partkey",
            F.col("l_extendedprice").alias("best_price"),
            "l_orderkey",
            "l_linenumber",
        )
        .orderBy("best_price", "l_orderkey", "l_partkey", "l_linenumber")
        .limit(100)
    )


SQL_WINDOW_DEDUP_TOPK = """
SELECT l_partkey, best_price, l_orderkey, l_linenumber FROM (
  SELECT l_partkey, l_extendedprice AS best_price, l_orderkey, l_linenumber,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn
  FROM lineitem) t
WHERE rn = 1
ORDER BY best_price, l_orderkey, l_partkey, l_linenumber
LIMIT 100
"""


def q_interval_join(spark, sf_dir):
    """J1 (server_ndd.py:217-220): assign records to enclosing intervals —
    frame→shot becomes event→window (marker events open 10-minute windows)."""
    ev = _t(spark, sf_dir, "events")
    windows = ev.where(F.col("event_id") % 97 == 0).select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("w_begin"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("w_end"),
    )
    return (
        ev.join(
            F.broadcast(windows),
            (ev.ts >= windows.w_begin) & (ev.ts < windows.w_end),
        )
        .groupBy("window_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


SQL_INTERVAL_JOIN = """
SELECT w.event_id AS window_id, count(*) AS n_events,
       round(sum(e.value), 4) AS sum_value
FROM events e
JOIN (SELECT event_id, ts FROM events WHERE event_id % 97 = 0) w
  ON e.ts >= w.ts AND e.ts < w.ts + INTERVAL 10 MINUTE
GROUP BY w.event_id
"""


def q_two_level_minmax(spark, sf_dir):
    """A1/A2 (extract_images.py:125-127,205-208): two-level min/max rollup —
    per-shot bbox then per-movie bbox becomes per-order then per-customer."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    per_order = li.groupBy("l_orderkey").agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    )
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.round(F.min("lo"), 4).alias("min_price"),
            F.round(F.max("hi"), 4).alias("max_price"),
            F.count("*").alias("n_orders"),
        )
    )


SQL_TWO_LEVEL_MINMAX = """
SELECT o_custkey, round(min(lo), 4) AS min_price, round(max(hi), 4) AS max_price,
       count(*) AS n_orders
FROM (SELECT l_orderkey, min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
      FROM lineitem GROUP BY l_orderkey) p
JOIN orders ON p.l_orderkey = o_orderkey
GROUP BY o_custkey
"""


def q_broadcast_lookup_coalesce(spark, sf_dir):
    """J4/S7 (server_ndd.py:188-196): small-dim lookup with fallback —
    videoname via HTTP else videoid → broadcast join + coalesce."""
    orders = _t(spark, sf_dir, "orders")
    dim = _t(spark, sf_dir, "customer").where(F.col("c_custkey") % 10 == 0)
    return (
        orders.join(F.broadcast(dim), orders.o_custkey == dim.c_custkey, "left")
        .select(
            "o_orderkey",
            F.coalesce(
                "c_name", F.concat(F.lit("cust#"), F.col("o_custkey").cast("string"))
            ).alias("display_name"),
        )
    )


SQL_BROADCAST_LOOKUP_COALESCE = """
SELECT o_orderkey,
       coalesce(c_name, 'cust#' || CAST(o_custkey AS VARCHAR)) AS display_name
FROM orders
LEFT JOIN (SELECT * FROM customer WHERE c_custkey % 10 = 0) d
  ON o_custkey = c_custkey
"""


def q_pair_dedup_canonical(spark, sf_dir):
    """J6 (server_ndd.py:127-141 implied grouping): canonical unordered-pair
    dedup via least/greatest + distinct."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.least("l_partkey", "l_suppkey").alias("pair_lo"),
            F.greatest("l_partkey", "l_suppkey").alias("pair_hi"),
        )
        .dropDuplicates(["pair_lo", "pair_hi"])
    )


SQL_PAIR_DEDUP_CANONICAL = """
SELECT DISTINCT least(l_partkey, l_suppkey) AS pair_lo,
                greatest(l_partkey, l_suppkey) AS pair_hi
FROM lineitem
"""


def q_token_count(spark, sf_dir):
    """F12 analog / training-pipeline token counting over documents."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )


SQL_TOKEN_COUNT = """
SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
"""


def q_token_budget(spark, sf_dir):
    """Training-budget token estimate per doc: BPE-ish subword segmentation
    (alpha runs / digit runs / single punctuation — the GPT-2 pre-tokenizer
    shape) plus the chars/4 heuristic; est_tokens = max of the two (a
    subword can't be shorter than a BPE token, chars/4 bounds long-run
    text). Pure codegen — regexp_extract_all + integer arithmetic."""
    d = _t(spark, sf_dir, "documents")
    subs = F.regexp_extract_all(
        F.col("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), F.lit(0)
    )
    n_sub = F.size(subs).cast("long")
    n_chars = F.length("text").cast("long")
    chars4 = F.floor((n_chars + 3) / 4).cast("long")
    return d.select(
        "doc_id",
        n_sub.alias("n_subwords"),
        n_chars.alias("n_chars"),
        F.greatest(n_sub, chars4).alias("est_tokens"),
    )


SQL_TOKEN_BUDGET = r"""
SELECT doc_id,
       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_subwords,
       length(text) AS n_chars,
       greatest(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')),
                (length(text) + 3) // 4) AS est_tokens
FROM documents
"""


def q_quality_score(spark, sf_dir):
    """Training-pipeline quality scoring: length + stopword-ratio features."""
    d = _t(spark, sf_dir, "documents")
    stop_arr = F.array(*[F.lit(s) for s in _STOPLIST])
    toks = F.split("text", " ")
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    return d.select(
        "doc_id",
        F.length("text").alias("text_len"),
        F.size(toks).alias("n_tokens"),
        F.round(n_stop.cast("double") / F.size(toks), 6).alias("stopword_ratio"),
    )


SQL_QUALITY_SCORE = f"""
SELECT doc_id, length(text) AS text_len,
       len(string_split(text, ' ')) AS n_tokens,
       round(len(list_filter(string_split(text, ' '),
                 x -> list_contains({_STOPLIST!r}, x)))
             / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS stopword_ratio
FROM documents
"""


def q_ngram_jaccard_pairs(spark, sf_dir):
    """Token-set Jaccard near-dup pairs (the verify-stage semantics, SURVEY J3
    verification; reference exact-distance server_ndd.py:104-112) on a doc
    subset, SQL-checkable."""
    d = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 10 == 0)
        .select("doc_id", F.array_distinct(F.split("text", " ")).alias("toks"))
    )
    # the single-row-group parquet file scans as ONE task, which would run
    # the whole quadratic array_intersect stream serially (guide §2.5 input
    # skew) — spread the streamed side across the cores; the build side
    # stays a broadcast
    par = spark.sparkContext.defaultParallelism
    a = d.select(
        F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a")
    ).repartition(par)
    b = d.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size("toks_a") + F.size("toks_b") - inter
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.round(inter.cast("double") / union.cast("double"), 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= 0.3)
    )


SQL_NGRAM_JACCARD_PAIRS = """
WITH d AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
           FROM documents WHERE doc_id % 10 = 0)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(len(list_intersect(a.toks, b.toks))
             / CAST(len(a.toks) + len(b.toks)
                    - len(list_intersect(a.toks, b.toks)) AS DOUBLE), 6) AS jaccard
FROM d a JOIN d b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.toks, b.toks))
      / CAST(len(a.toks) + len(b.toks)
             - len(list_intersect(a.toks, b.toks)) AS DOUBLE) >= 0.3
"""


def q_embedding_knn_bruteforce(spark, sf_dir):
    """J3 reference semantics (server_ndd.py:104-117): brute-force exact
    similarity top-k — query vectors vs the whole index, broadcast the small
    query side, window top-k per query."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    dot = F.aggregate(
        F.zip_with("qvec", "vec", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.col(c), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        # spread the index side: single-row-group parquet scans as one task
        # (guide §2.5), serializing the 2000×10 dot-product stream
        emb.repartition(spark.sparkContext.defaultParallelism)
        .crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", F.round(dot / (norm("qvec") * norm("vec")), 6))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("query_id", "vec_id", "cosine", F.col("rn").alias("rank"))
    )


SQL_EMBEDDING_KNN_BRUTEFORCE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
q AS (SELECT vec_id AS query_id, vec AS qvec FROM e WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_dot_product(q.qvec, e.vec)
               / (sqrt(list_dot_product(q.qvec, q.qvec))
                  * sqrt(list_dot_product(e.vec, e.vec))), 6) AS cosine
  FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rank
  FROM scored)
SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= 5
"""


def q_embedding_cosine_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-dup pairs (the dedup-family member next to
    exact/MinHash/SimHash/Jaccard): all pairs with cosine ≥ τ — the exact
    verification semantics of the reference's distance scan
    (server_ndd.py:104-112) recast as a dedup predicate. This is the
    verify/baseline path; the scale path for the same predicate is the
    bucketed `ann_lsh_topk`/`ann_ivf_topk` joins (candidates from LSH/IVF,
    then this exact cosine only on candidates)."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("vec").alias("va"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.col(c), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", F.round(dot / (norm("va") * norm("vb")), 6))
        .where(F.col("cosine") >= 0.4)
        .select("vec_a", "vec_b", "cosine")
    )


SQL_EMBEDDING_COSINE_DUP_PAIRS = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
scored AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round(list_dot_product(a.vec, b.vec)
               / (sqrt(list_dot_product(a.vec, a.vec))
                  * sqrt(list_dot_product(b.vec, b.vec))), 6) AS cosine
  FROM e a JOIN e b ON a.vec_id < b.vec_id)
SELECT vec_a, vec_b, cosine FROM scored WHERE cosine >= 0.4
"""


_WINNOW_K = 8  # char-gram width
_WINNOW_W = 4  # winnowing window (hashes per window)


def q_doc_fingerprint_winnow(spark, sf_dir):
    """Document fingerprinting by winnowing (Schleimer et al., MOSS; the
    rolling-hash fingerprint family behind the engine's stage-2b anchors,
    operators/substring.py): char k-gram hashes, min per sliding window of w,
    distinct per doc. Pure higher-order column expressions — no UDF, no
    shuffle until the final explode; the md5-derived 32-bit hash family is
    computed identically by Spark (conv) and DuckDB (0x-cast) so the full
    fingerprint sets are value-checked."""
    k, w = _WINNOW_K, _WINNOW_W
    d = _t(spark, sf_dir, "documents").where(F.length("text") >= k + w - 1)
    grams = F.expr(
        f"transform(sequence(1, length(text)-{k}+1),"
        f" i -> cast(conv(substring(md5(substring(text, i, {k})), 1, 8), 16, 10)"
        " as bigint))"
    )
    fps = F.expr(
        f"array_distinct(transform(sequence(1, size(hashes)-{w}+1),"
        f" j -> array_min(slice(hashes, j, {w}))))"
    )
    return (
        d.select("doc_id", grams.alias("hashes"))
        .select("doc_id", F.explode(fps).alias("fp"))
    )


SQL_DOC_FINGERPRINT_WINNOW = f"""
WITH g AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(text)-{_WINNOW_K}+1),
             i -> ('0x' || substr(md5(substr(text, i, {_WINNOW_K})), 1, 8))::BIGINT
         ) AS hashes
  FROM documents WHERE len(text) >= {_WINNOW_K + _WINNOW_W - 1}),
w AS (
  SELECT doc_id,
         list_distinct(list_transform(
             generate_series(1, len(hashes)-{_WINNOW_W}+1),
             j -> list_min(hashes[j:j+{_WINNOW_W - 1}]))) AS fps
  FROM g)
SELECT doc_id, unnest(fps) AS fp FROM w
"""


_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+[0-9][0-9-]{7,}[0-9]"


def q_pii_redact(spark, sf_dir):
    """PII redaction (training-pipeline op): scrub emails/phones from text
    with counting — pure regexp column expressions, no UDF. The PII-bearing
    text is synthesized deterministically from customer columns (the test
    tables carry no real PII, so the operator under test is the redaction,
    not the detection corpus)."""
    c = _t(spark, sf_dir, "customer")
    txt = F.format_string(
        "reach %s at user%d@example.com or +1-555-%04d now",
        F.col("c_name"),
        F.col("c_custkey"),
        F.pmod(F.col("c_custkey"), F.lit(10000)),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(txt, _PII_EMAIL, "<EMAIL>"), _PII_PHONE, "<PHONE>"
    )
    return c.select(
        "c_custkey",
        redacted.alias("redacted"),
        F.size(F.regexp_extract_all(txt, F.lit(_PII_EMAIL), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(txt, F.lit(_PII_PHONE), F.lit(0))).alias(
            "n_phones"
        ),
    )


SQL_PII_REDACT = f"""
WITH synth AS (
  SELECT c_custkey,
         printf('reach %s at user%d@example.com or +1-555-%04d now',
                c_name, c_custkey, c_custkey % 10000) AS txt
  FROM customer)
SELECT c_custkey,
       regexp_replace(regexp_replace(txt, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                      '{_PII_PHONE}', '<PHONE>', 'g') AS redacted,
       len(regexp_extract_all(txt, '{_PII_EMAIL}')) AS n_emails,
       len(regexp_extract_all(txt, '{_PII_PHONE}')) AS n_phones
FROM synth
"""


def q_salted_distinct_tokens(spark, sf_dir):
    """Skew-safe exact per-source distinct-token count via value-salted
    two-phase aggregation (operators/skew.py): phase 1 groups by
    (source, pmod(xxhash64(token), 64)) so a hot domain's distinct-state
    spreads over 64 reducers, phase 2 sums the disjoint partials. Result is
    provably identical to the unsalted plan — which is exactly what the
    oracle (a plain COUNT(DISTINCT)) checks."""
    from near_duplicate_detection_spark.operators.skew import salted_count_distinct

    d = _t(spark, sf_dir, "documents")
    toks = d.select("source", F.explode(F.split("text", " ")).alias("tok"))
    return salted_count_distinct(
        toks, ["source"], "tok", alias="distinct_tokens", n_salt=64
    )


SQL_SALTED_DISTINCT_TOKENS = """
SELECT source, count(DISTINCT tok) AS distinct_tokens
FROM (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
GROUP BY source
"""


def q_ms_to_hms(spark, sf_dir):
    """F3 (server_ndd.py:149-150): ms → H:MM:SS display formatting."""
    ev = _t(spark, sf_dir, "events")
    ms = (F.col("value") * 1000).cast("bigint")
    secs = (ms / F.lit(1000)).cast("bigint")
    return ev.select(
        "event_id",
        F.format_string(
            "%d:%02d:%02d",
            (secs / 3600).cast("bigint"),
            ((secs % 3600) / 60).cast("bigint"),
            (secs % 60).cast("bigint"),
        ).alias("hms"),
    )


SQL_MS_TO_HMS = """
SELECT event_id,
       printf('%d:%02d:%02d',
              (CAST(value * 1000 AS BIGINT) // 1000) // 3600,
              ((CAST(value * 1000 AS BIGINT) // 1000) % 3600) // 60,
              (CAST(value * 1000 AS BIGINT) // 1000) % 60) AS hms
FROM events
"""


def q_json_extract(spark, sf_dir):
    """F9 (server_ndd.py:273,300-306): JSON envelope decode."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            F.get_json_object("props", "$.k").cast("int").alias("k_value")
        )
        .groupBy("k_value")
        .agg(F.count("*").alias("n"))
    )


SQL_JSON_EXTRACT = """
SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k_value, count(*) AS n
FROM events GROUP BY 1
"""


def q_base64_encode(spark, sf_dir):
    """F1 (server_ndd.py:63-74): base64 encoding of binary payloads."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.base64(F.encode(F.substring("text", 1, 16), "utf-8")).alias("b64_prefix"),
    )


SQL_BASE64_ENCODE = """
SELECT doc_id, to_base64(encode(substr(text, 1, 16))) AS b64_prefix FROM documents
"""


def q_path_parse(spark, sf_dir):
    """F4 (server_ndd.py:169,194): id parsing out of path-like strings."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("source", "([0-9]+)", 1).cast("int").alias("src_num"),
    )


SQL_PATH_PARSE = """
SELECT doc_id, CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) AS src_num
FROM documents
"""


def q_argmin_classify(spark, sf_dir):
    """A5 (extract_aspect_ratio.py:46-47,67-69): nearest-canonical-class
    argmin — aspect-ratio labels become value-bucket labels."""
    ev = _t(spark, sf_dir, "events")
    diffs = F.array(*[F.abs(F.col("value") - F.lit(c)) for c in _CANON])
    labels = F.array(*[F.lit(s) for s in _CANON_LABELS])
    idx = F.array_position(diffs, F.array_min(diffs))
    return ev.select(
        "event_id", F.element_at(labels, idx.cast("int")).alias("value_class")
    )


SQL_ARGMIN_CLASSIFY = f"""
SELECT event_id,
       ({_CANON_LABELS!r})[list_position(
           [abs(value - 10.0), abs(value - 30.0),
            abs(value - 60.0), abs(value - 90.0)],
           list_min([abs(value - 10.0), abs(value - 30.0),
                     abs(value - 60.0), abs(value - 90.0)]))] AS value_class
FROM events
"""


def q_sessionize(spark, sf_dir):
    """Sessionization (gap > 30 min) — the batch analog of the reference's
    per-shot grouping of a timeline (utils.py:7-18 shot rows)."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_sess").over(
            W.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"), F.min("event_id").alias("first_event")
    )


SQL_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  -- CAST: DuckDB windowed sum returns HUGEINT which lands as float64 in
  -- fetchdf(); Spark emits bigint and the driver value-hash is dtype-sensitive
  SELECT user_id, event_id,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged)
SELECT user_id, session_id, count(*) AS n_events, min(event_id) AS first_event
FROM sess GROUP BY user_id, session_id
"""


def q_lang_stats(spark, sf_dir):
    """Metrics-table rollup (lineage/metrics analog of S12 counts)."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


SQL_LANG_STATS = """
SELECT lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM documents GROUP BY lang
"""


def q_exact_dedup_groups(spark, sf_dir):
    """S1-exact dedup (training-pipeline op): group by normalized-content
    hash; md5 on both engines so the oracle matches bit-for-bit."""
    d = _t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    return (
        d.select("doc_id", F.md5(F.encode(norm, "utf-8")).alias("content_md5"))
        .groupBy("content_md5")
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("representative"))
    )


SQL_EXACT_DEDUP_GROUPS = """
SELECT md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS content_md5,
       count(*) AS n_copies, min(doc_id) AS representative
FROM documents GROUP BY 1
"""


def q_norm_precompute(spark, sf_dir):
    """A3 (server_ndd.py:265): materialized squared-norm column over the
    embedding vectors."""
    e = _t(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    sq = F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x)
    return e.select("vec_id", F.round(sq, 6).alias("norm_sq"))


SQL_NORM_PRECOMPUTE = """
SELECT vec_id,
       round(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]), 6)
           AS norm_sq
FROM embeddings
"""


def q_except_custkeys(spark, sf_dir):
    """§2.6 set ops: customers active early but gone later (EXCEPT)."""
    o = _t(spark, sf_dir, "orders")
    early = o.where(F.year("o_orderdate") <= 1996).select("o_custkey").distinct()
    late = o.where(F.year("o_orderdate") >= 2000).select("o_custkey").distinct()
    return early.exceptAll(late).distinct()


SQL_EXCEPT_CUSTKEYS = """
SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) <= 1996
EXCEPT
SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) >= 2000
"""


def q_json_fallback_chain(spark, sf_dir):
    """S6 (utils.py:36-65): JSON parse with coalesce fallback chain — the
    DAR→PAR/SAR→default cascade becomes missing-key coalesce."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.coalesce(
            F.get_json_object("props", "$.missing_key").cast("int"),
            F.get_json_object("props", "$.k").cast("int"),
            F.lit(-1),
        ).alias("resolved_k"),
    )


SQL_JSON_FALLBACK_CHAIN = """
SELECT event_id,
       coalesce(CAST(json_extract_string(props, '$.missing_key') AS INT),
                CAST(json_extract_string(props, '$.k') AS INT),
                -1) AS resolved_k
FROM events
"""


def q_conditional_fallback(spark, sf_dir):
    """P7 (extract_images.py:219-220): per-row conditional fallback —
    empty-bbox→movie-template becomes zero-discount→list-price."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_discount") == 0, F.col("l_extendedprice"))
        .otherwise(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
        )
        .alias("effective_price"),
    )


SQL_CONDITIONAL_FALLBACK = """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_discount = 0 THEN l_extendedprice
            ELSE round(l_extendedprice * (1 - l_discount), 4)
       END AS effective_price
FROM lineitem
"""


def q_filter_validate(spark, sf_dir):
    """P2/P3 (client_flask.py:83-94): pattern filter + safe-cast validation."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.where(F.col("source").rlike("^src[0-9]+$"))
        .select(
            "doc_id",
            F.regexp_extract("source", "src([0-9]+)", 1)
            .try_cast("int")
            .alias("src_id"),
        )
        .where(F.col("src_id").isNotNull() & (F.col("src_id") % 2 == 0))
    )


SQL_FILTER_VALIDATE = """
SELECT doc_id,
       TRY_CAST(regexp_extract(source, 'src([0-9]+)', 1) AS INT) AS src_id
FROM documents
WHERE regexp_matches(source, '^src[0-9]+$')
  AND TRY_CAST(regexp_extract(source, 'src([0-9]+)', 1) AS INT) IS NOT NULL
  AND TRY_CAST(regexp_extract(source, 'src([0-9]+)', 1) AS INT) % 2 = 0
"""


def q_lang_id_markers(spark, sf_dir):
    """Language-ID by marker-word voting (training-pipeline op; A5-shaped
    argmax over a literal class array)."""
    from near_duplicate_detection_spark.functions.textstats import lang_id

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", lang_id("text").alias("lang_guess"))


def _sql_lang_id() -> str:
    from near_duplicate_detection_spark.functions.textstats import LANG_MARKERS

    langs = list(LANG_MARKERS)
    hits = ", ".join(
        f"len(list_filter(string_split(lower(text), ' '), "
        f"x -> list_contains({LANG_MARKERS[lg]!r}, x)))"
        for lg in langs
    )
    return f"""
WITH scored AS (
  SELECT doc_id, [{hits}] AS hits FROM documents)
SELECT doc_id,
       CASE WHEN list_max(hits) > 0
            THEN ({langs!r})[list_position(hits, list_max(hits))]
            ELSE 'und' END AS lang_guess
FROM scored
"""


SQL_LANG_ID_MARKERS = _sql_lang_id()


# ------------------------------------------------ engine (rows-only) queries


def _doc_signatures(spark, sf_dir):
    from near_duplicate_detection_spark.config import NDDConfig
    from near_duplicate_detection_spark.functions.signatures import (
        SIGNATURE_SCHEMA,
        signature_map_fn,
    )

    cfg = NDDConfig(shingle_k=3)
    d = (
        _t(spark, sf_dir, "documents")
        .select(F.col("doc_id").cast("string").alias("url"), "text")
        # single-row-group parquet ⇒ one scan task: without this the whole
        # signature UDF pass runs on one core (guide §2.5 input skew)
        .repartition(spark.sparkContext.defaultParallelism)
    )
    return cfg, d.mapInPandas(signature_map_fn(cfg), schema=SIGNATURE_SCHEMA)


def q_minhash_signatures(spark, sf_dir):
    """U1 (extract_features.py:26-32): per-record signature extraction.

    The hash values themselves are family-bound (seeded permutations have no
    ANSI-SQL equivalent — their value gates are the brute-force oracles in
    tests/test_signatures.py), so the driver-checkable projection is the
    signature SHAPE contract the UDF must honor per row: engine-tokenizer
    token count, signature width == num_perms, band count == num_bands.
    simhash/fp values are exercised by simhash_hamming_topk/substring_pairs."""
    _, sigs = _doc_signatures(spark, sf_dir)
    return sigs.select(
        F.col("url").cast("bigint").alias("doc_id"),
        "n_tokens",
        F.size("minhash").alias("sig_len"),
        F.size("bands").alias("n_bands"),
    )


def _sql_minhash_signatures() -> str:
    from near_duplicate_detection_spark.config import NDDConfig

    cfg = NDDConfig(shingle_k=3)
    return f"""
SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
       {cfg.num_perms} AS sig_len, {cfg.lsh_bands} AS n_bands
FROM documents
"""


SQL_MINHASH_SIGNATURES = _sql_minhash_signatures()


def q_lsh_candidate_pairs(spark, sf_dir):
    """J3 (server_ndd.py:104-112 re-expressed): LSH band equi-join candidates
    + exact-Jaccard verify at 0.2 over documents.

    Oracle-checkable because verification is EXACT set Jaccard and, on this
    data, every true pair sits at J ≥ 0.9 — far above the 32-band/4-row
    recall cliff at 0.2 — so the LSH-surfaced verified set equals the
    all-pairs J ≥ 0.2 set a SQL engine can compute directly. Pairs are
    re-canonicalized numerically (the engine canonicalizes by url STRING
    order, which differs from numeric doc_id order)."""
    from near_duplicate_detection_spark.config import NDDConfig
    from near_duplicate_detection_spark.operators.lsh import candidate_pairs
    from near_duplicate_detection_spark.operators.verify import (
        candidate_shingle_sets,
        verify_pairs,
    )

    cfg = NDDConfig(shingle_k=3, jaccard_threshold=0.2)
    _, sigs = _doc_signatures(spark, sf_dir)
    # materialize once, exactly as the pipeline's stage 2 does: the pair set
    # feeds THREE consumers (both member_urls branches + the verify join)
    # and each would otherwise re-run the signature UDF + band groupBy
    # subtree; the shingle sets feed the verify join twice (r6: this query
    # re-evaluated the signature MapInPandas 4× per run)
    pairs, _flagged = candidate_pairs(sigs.localCheckpoint(), cfg)
    pairs = pairs.localCheckpoint()
    docs = (
        _t(spark, sf_dir, "documents")
        .select(F.col("doc_id").cast("string").alias("url"), "text")
    )
    sets = candidate_shingle_sets(pairs, docs, cfg).localCheckpoint()
    va = F.col("url_a").cast("bigint")
    vb = F.col("url_b").cast("bigint")
    return verify_pairs(pairs, sets, cfg).select(
        F.least(va, vb).alias("doc_a"),
        F.greatest(va, vb).alias("doc_b"),
        F.round("jaccard", 6).alias("jaccard"),
    )


SQL_LSH_CANDIDATE_PAIRS = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id,
         CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
              ELSE list_distinct(list_transform(range(1, len(toks) - 1),
                     i -> array_to_string(toks[i:i+2], ' ')))
         END AS sh
  FROM d)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(len(list_intersect(a.sh, b.sh))
             / CAST(len(a.sh) + len(b.sh)
                    - len(list_intersect(a.sh, b.sh)) AS DOUBLE), 6) AS jaccard
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.sh, b.sh))
      / CAST(len(a.sh) + len(b.sh)
             - len(list_intersect(a.sh, b.sh)) AS DOUBLE) >= 0.2
"""


def q_near_dup_clusters(spark, sf_dir):
    """A7: connected components + cluster table over an exact near-dup edge
    set (token-set Jaccard ≥ 0.9 on the %10 doc subset — SQL-reproducible,
    unlike LSH candidates, so the DISTRIBUTED CC operator itself is checked
    against a DuckDB recursive-CTE transitive closure). The LSH-driven
    clustering path keeps its recall gates in tests/."""
    from near_duplicate_detection_spark.operators.connected_components import (
        clusters_table,
        connected_components,
    )

    edges = q_ngram_jaccard_pairs(spark, sf_dir).where(
        F.col("jaccard") >= 0.9
    ).select(
        F.col("doc_a").cast("string").alias("url_a"),
        F.col("doc_b").cast("string").alias("url_b"),
    )
    all_urls = (
        _t(spark, sf_dir, "documents")
        .select(F.col("doc_id").cast("string").alias("url"))
    )
    labels = connected_components(edges)
    clusters = clusters_table(labels, all_urls)
    # cluster_size as a window count over the same partitioning the rows
    # already need — the groupBy+join spelling paid a second shuffle plus a
    # join for the identical value (r6; guide §2.4 shared-exchange rule)
    return clusters.withColumn(
        "cluster_size", F.count("*").over(W.partitionBy("cluster_id"))
    ).select(
        F.col("url").cast("bigint").alias("doc_id"),
        "cluster_id",
        "is_representative",
        "cluster_size",
    )


SQL_NEAR_DUP_CLUSTERS = """
WITH RECURSIVE d AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
  FROM documents WHERE doc_id % 10 = 0),
e AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM d a JOIN d b ON a.doc_id <> b.doc_id
  WHERE round(len(list_intersect(a.toks, b.toks))
        / CAST(len(a.toks) + len(b.toks)
               - len(list_intersect(a.toks, b.toks)) AS DOUBLE), 6) >= 0.9),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM d
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node),
comp AS (
  -- min over the STRING form: the engine's labels are urls and string min
  -- is its deterministic representative rule
  SELECT node AS doc_id, min(CAST(lbl AS VARCHAR)) AS cluster_id
  FROM reach GROUP BY node),
full_c AS (
  SELECT doc.doc_id,
         coalesce(c.cluster_id, CAST(doc.doc_id AS VARCHAR)) AS cluster_id
  FROM documents doc LEFT JOIN comp c ON doc.doc_id = c.doc_id)
SELECT f.doc_id, f.cluster_id,
       (CAST(f.doc_id AS VARCHAR) = f.cluster_id) AS is_representative,
       s.cluster_size
FROM full_c f
JOIN (SELECT cluster_id, count(*) AS cluster_size
      FROM full_c GROUP BY 1) s USING (cluster_id)
"""


_SIMHASH_BITS = 16


def q_simhash_hamming_topk(spark, sf_dir):
    """SimHash + Hamming-distance top-k (the engine's fallback metric for
    flagged LSH buckets) as a pure Spark plan over an md5-derived token bit
    family: bit i of a token = bit i of its first 4 md5 hex digits, simhash
    bit i = majority vote over the token stream. Both engines compute md5
    over utf-8 identically, so the full simhash VALUE is oracle-checked —
    the engine's production 64-bit xxhash-family simhash keeps its
    brute-force bit-vote gates in tests/test_signatures.py."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    ex = d.select(
        "doc_id", F.size(toks).alias("n"), F.explode(toks).alias("tok")
    )
    mask = F.conv(
        F.substring(F.md5(F.col("tok").cast("binary")), 1, 4), 16, 10
    ).cast("long")
    counts = [
        F.sum(F.shiftright(mask, i).bitwiseAND(F.lit(1))).alias(f"c{i}")
        for i in range(_SIMHASH_BITS)
    ]
    per = ex.groupBy("doc_id", "n").agg(*counts)
    sim = None
    for i in range(_SIMHASH_BITS):
        term = F.when(
            F.col(f"c{i}") * 2 > F.col("n"), F.lit(1 << i)
        ).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    sims = per.select("doc_id", sim.cast("long").alias("simhash"))
    probe = sims.where(F.col("doc_id") == 0).select(
        F.col("simhash").alias("probe_hash")
    )
    return (
        sims.crossJoin(F.broadcast(probe))
        .where(F.col("doc_id") != 0)
        .select(
            "doc_id",
            "simhash",
            F.bit_count(
                F.col("simhash").bitwiseXOR(F.col("probe_hash"))
            ).alias("hamming"),
        )
        .orderBy("hamming", "doc_id")
        .limit(10)
    )


def _sql_simhash_hamming_topk() -> str:
    sums = ", ".join(
        f"sum((mask >> {i}) & 1) AS c{i}" for i in range(_SIMHASH_BITS)
    )
    bits = " + ".join(
        f"(CASE WHEN c{i} * 2 > n THEN {1 << i} ELSE 0 END)"
        for i in range(_SIMHASH_BITS)
    )
    return f"""
WITH ex AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n,
         unnest(string_split(text, ' ')) AS tok
  FROM documents),
m AS (
  SELECT doc_id, n, ('0x' || substr(md5(tok), 1, 4))::BIGINT AS mask FROM ex),
c AS (
  SELECT doc_id, n, {sums} FROM m GROUP BY doc_id, n),
s AS (
  SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM c),
p AS (SELECT simhash AS ph FROM s WHERE doc_id = 0)
SELECT s.doc_id, s.simhash, bit_count(xor(s.simhash, p.ph)) AS hamming
FROM s, p WHERE s.doc_id <> 0
ORDER BY hamming, doc_id LIMIT 10
"""


SQL_SIMHASH_HAMMING_TOPK = _sql_simhash_hamming_topk()


def q_ann_lsh_topk(spark, sf_dir):
    """Sign-LSH bucketed approximate nearest neighbors (scale path of J3).

    Oracle-checkable despite the random-hyperplane family: the plane matrix
    is seeded and tiny (8×64), so the oracle SQL inlines it as literals and
    replays the exact probe semantics (own bucket + every one-bit flip =
    Hamming ≤ 1 on the bucket codes)."""
    from near_duplicate_detection_spark.operators.similarity import (
        ann_topk,
        hyperplanes,
    )

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    q = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    planes = hyperplanes(dim=64, n_planes=8)
    out = ann_topk(e, q, planes, k=5)
    return out.select(
        "query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank"
    )


def _sql_ann_lsh_topk() -> str:
    """Replays q_ann_lsh_topk in DuckDB: the seeded 8×64 plane matrix is
    inlined as double literals (repr round-trips exactly, and both engines
    fold the dot product left-to-right over the same values), bucket code =
    packed sign bits, candidates = bucket pairs within Hamming distance 1
    (== the engine's own-bucket + one-bit-flip probe set)."""
    from near_duplicate_detection_spark.operators.similarity import hyperplanes

    planes = hyperplanes(dim=64, n_planes=8)
    lits = [
        "[" + ", ".join(repr(float(x)) for x in p) + "]::DOUBLE[]"
        for p in planes
    ]
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(vec, {lit}) > 0 THEN {1 << i} ELSE 0 END)"
        for i, lit in enumerate(lits)
    )
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
b AS (
  SELECT vec_id, vec, {bucket} AS bucket FROM e),
q AS (
  SELECT vec_id AS query_id, vec AS qvec, bucket AS qbucket
  FROM b WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, b.vec_id,
         list_dot_product(q.qvec, b.vec)
         / (sqrt(list_dot_product(q.qvec, q.qvec))
            * sqrt(list_dot_product(b.vec, b.vec))) AS cosine
  FROM b JOIN q ON bit_count(xor(b.bucket, q.qbucket)) <= 1),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rank
  FROM scored)
SELECT query_id, vec_id, round(cosine, 6) AS cosine, rank
FROM ranked WHERE rank <= 5
"""


SQL_ANN_LSH_TOPK = _sql_ann_lsh_topk()


def q_ann_ivf_topk(spark, sf_dir):
    """IVF approximate nearest neighbors (the data-adaptive scale path,
    complementing sign-LSH): coarse cells from a deterministic subset of the
    table itself (vec_id % 97 — so the oracle needs no literals), map-side
    literal-centroid assignment, equi-join probe of the 2 nearest cells."""
    from near_duplicate_detection_spark.operators.similarity import ivf_topk

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    cents = e.where(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("vec").alias("cvec")
    )
    q = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    # single-row-group parquet ⇒ one scan task: spread the index side so the
    # per-row centroid-distance fold runs on every core (guide §2.5); the
    # centroid/query sides stay tiny single-task scans
    out = ivf_topk(
        e.repartition(spark.sparkContext.defaultParallelism), q, cents,
        k=5, n_probe=2,
    )
    return out.select(
        "query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank"
    )


# replay of q_ann_ivf_topk: list_distance is monotone in the engine's
# squared-L2 fold, so the (distance, centroid_id) argmin agrees
SQL_ANN_IVF_TOPK = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
c AS (
  SELECT vec_id AS cid, vec AS cvec FROM e WHERE vec_id % 97 = 0),
ia AS (
  SELECT e.vec_id, e.vec, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_distance(e.vec, c.cvec), c.cid) AS rk
  FROM e CROSS JOIN c),
idx AS (SELECT vec_id, vec, cid FROM ia WHERE rk = 1),
q AS (SELECT vec_id AS query_id, vec AS qvec, cid
      FROM ia WHERE vec_id < 5 AND rk <= 2),
cand AS (
  SELECT DISTINCT q.query_id, i.vec_id
  FROM idx i JOIN q ON i.cid = q.cid),
scored AS (
  SELECT cd.query_id, cd.vec_id,
         list_dot_product(eq.vec, ei.vec)
         / (sqrt(list_dot_product(eq.vec, eq.vec))
            * sqrt(list_dot_product(ei.vec, ei.vec))) AS cosine
  FROM cand cd
  JOIN e ei ON cd.vec_id = ei.vec_id
  JOIN e eq ON cd.query_id = eq.vec_id),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rank
  FROM scored)
SELECT query_id, vec_id, round(cosine, 6) AS cosine, rank
FROM ranked WHERE rank <= 5
"""


def q_quality_features_full(spark, sf_dir):
    """Gopher/C4-style quality feature vector per doc (pure column math —
    every term has a DuckDB list-function equivalent)."""
    from near_duplicate_detection_spark.functions.textstats import quality_features

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return quality_features(d).drop("text")


def _sql_quality_features_full() -> str:
    from near_duplicate_detection_spark.functions.textstats import LANG_MARKERS

    en = LANG_MARKERS["en"]
    return f"""
WITH t AS (
  SELECT doc_id,
         regexp_split_to_array(lower(text), '\\s+') AS toks,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
         len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
             x -> list_contains({en!r}, x))) AS n_stop
  FROM documents),
f AS (
  SELECT doc_id, len(toks) AS nt, n_chars, n_punct, n_stop,
         len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) AS dr
  FROM t)
SELECT doc_id,
       nt AS q_n_tokens,
       n_chars AS q_n_chars,
       round(dr, 6) AS q_distinct_ratio,
       n_punct AS q_n_punct,
       round((n_chars - nt + 1) / CAST(nt AS DOUBLE), 6) AS q_mean_token_len,
       round(least(nt / 50.0, 1.0) * 0.4
             + least(dr * 2, 1.0) * 0.3
             + least(n_stop / 5.0, 1.0) * 0.3, 6) AS q_score
FROM f
"""


SQL_QUALITY_FEATURES_FULL = _sql_quality_features_full()


def q_multimodal_frame_features(spark, sf_dir):
    """Multimodal plumbing demo: binary payload → frame sampling → stub
    embeddings (decode stubbed; Spark-side schema/batching real) — rows-only."""
    from near_duplicate_detection_spark.operators.multimodal import (
        extract_features,
        sample_frames,
    )

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    media = d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("video").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit(640).alias("width"),
            F.lit(360).alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
    feats = extract_features(sample_frames(media, frame_interval_ms=1000))
    return feats.select(
        "media_id", "frame_idx", F.size("embedding").alias("dim")
    )


# the embedding VALUES are stub-codec-defined (no SQL equivalent), but the
# frame GRID and dimension are pure arithmetic: one frame per second over
# duration_ms = n_chars*10, dim constant — fully SQL-checkable
SQL_MULTIMODAL_FRAME_FEATURES = """
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       CAST(unnest(range(0, greatest(n_chars*10 - 1, 0) // 1000 + 1))
            AS INTEGER) AS frame_idx,
       CAST(64 AS INTEGER) AS dim
FROM documents WHERE doc_id < 50
"""


def q_substring_pairs(spark, sf_dir):
    """U5 / stage 2b: exact long-repeat detection (content-defined anchored
    windows → bucket join → suffix-array LCS verify; functions/suffix.py,
    operators/substring.py). Texts are CONSTRUCTED deterministically from
    doc_id so the planted ≥200-char shared runs — docs i and j share a run
    iff i ≡ j (mod 250) — are reproducible in ANSI SQL, making the full
    operator chain oracle-checkable (graft of the reference's exact
    verification semantics, ndd/server_ndd.py:104-112)."""
    from near_duplicate_detection_spark.config import NDDConfig
    from near_duplicate_detection_spark.operators.substring import (
        substring_candidates,
        verify_substring_pairs,
    )

    cfg = NDDConfig()
    base = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(29)),
            lambda j: F.format_string("b%04dx%02d", F.col("doc_id"), j),
        ),
        " ",
    )
    # run tokens are md5-derived (identical function in Spark and DuckDB):
    # full-entropy content keeps the content-defined anchor hash uncorrelated
    # — low-entropy digit patterns cluster the rolling hash mod d and can
    # starve a run of anchors
    run = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(39)),
            lambda j: F.substring(
                F.md5(
                    F.encode(
                        F.format_string("r%d-%d", F.col("doc_id") % 250, j),
                        "utf-8",
                    )
                ),
                1,
                8,
            ),
        ),
        " ",
    )
    pages = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("url"),
        F.concat(base, F.lit(" "), run).alias("text"),
    )
    cands, _flagged = substring_candidates(pages, cfg)
    # materialized once — verify consumes the candidate set three times
    hits = verify_substring_pairs(cands.localCheckpoint(), pages, cfg)
    return hits.select("url_a", "url_b")


SQL_SUBSTRING_PAIRS = """
SELECT least(CAST(a.doc_id AS VARCHAR), CAST(b.doc_id AS VARCHAR)) AS url_a,
       greatest(CAST(a.doc_id AS VARCHAR), CAST(b.doc_id AS VARCHAR)) AS url_b
FROM documents a JOIN documents b
  ON a.doc_id < b.doc_id AND a.doc_id % 250 = b.doc_id % 250
"""
# (the oracle needs no text reconstruction: the planted-run grouping is pure
# id arithmetic; the md5 run content exists only so the ENGINE has real
# ≥200-char shared runs to find)


def q_resize_meta(spark, sf_dir):
    """F7: aspect-preserving resize dimension math (reference
    ndd/extract_images.py trailer resize semantics, server_ndd.py:54-57) via
    the real operators.multimodal.resize_meta — pure column arithmetic, no
    decode. Dimensions are synthesized deterministically from doc_id so the
    arithmetic is reproducible in ANSI SQL."""
    from near_duplicate_detection_spark.operators.multimodal import resize_meta

    d = _t(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("image").alias("kind"),
        F.struct(
            (160 + (F.col("doc_id") * 37) % 1920).cast("int").alias("width"),
            (120 + (F.col("doc_id") * 53) % 1080).cast("int").alias("height"),
        ).alias("meta"),
    )
    return resize_meta(media, max_side=224).select(
        "media_id", "width", "height", "out_w", "out_h"
    )


# Spark round(double) is HALF_UP on the shortest decimal repr; DuckDB round
# is half-away-from-zero — identical for these positive values, so the same
# round(x) spells the operator's math exactly.
SQL_RESIZE_META = """
WITH dims AS (
  SELECT CAST(doc_id AS VARCHAR) AS media_id,
         CAST(160 + (doc_id*37) % 1920 AS INTEGER) AS width,
         CAST(120 + (doc_id*53) % 1080 AS INTEGER) AS height
  FROM documents)
SELECT media_id, width, height,
       CAST(CASE WHEN width >= height THEN 224
            ELSE round(width * (224.0 / greatest(width, height))) END
            AS INTEGER) AS out_w,
       CAST(CASE WHEN height > width THEN 224
            ELSE round(height * (224.0 / greatest(width, height))) END
            AS INTEGER) AS out_h
FROM dims
"""


def q_normalize_text(spark, sf_dir):
    """F11/U2: canonical text normalization (casefold + whitespace collapse,
    functions/text.py:50-56 — the form that is shingled; graft of the
    reference's image-to-canonical-input convert, ndd/server_ndd.py:54-57)
    through the REAL Arrow-batched normalize_text_udf. The input is made
    messy deterministically (case flips, tabs, pad) in both engines; on
    ASCII input casefold == lower, so the UDF is ANSI-SQL-checkable."""
    from near_duplicate_detection_spark.functions.text import normalize_text_udf

    d = _t(spark, sf_dir, "documents")
    messy = F.concat(
        F.lit("  "), F.upper("text"), F.lit("\t\t "), F.col("text"), F.lit(" ")
    )
    return d.select(
        "doc_id",
        normalize_text_udf(messy).alias("norm_text"),
        F.length(normalize_text_udf(messy)).alias("norm_len"),
    )


SQL_NORMALIZE_TEXT = r"""
WITH messy AS (
  SELECT doc_id,
         '  ' || upper(text) || chr(9) || chr(9) || ' ' || text || ' ' AS m
  FROM documents)
SELECT doc_id,
       trim(regexp_replace(lower(m), '\s+', ' ', 'g')) AS norm_text,
       length(trim(regexp_replace(lower(m), '\s+', ' ', 'g'))) AS norm_len
FROM messy
"""


def q_shingle_guard(spark, sf_dir):
    """P5: degenerate-record guard (functions/signatures.py:44-61 — a doc
    shorter than k tokens yields ONE whole-stream shingle, an empty doc one
    empty shingle, so every doc gets a signature; reference analog: the
    guard on shot lists shorter than one sampling interval,
    ndd/extract_images.py:43). Runs the REAL shingle_strings/tokenize pair
    over constructed degenerate docs (text truncated to doc_id % 7 tokens —
    some 0-token, some < k, some exactly k)."""
    from pyspark.sql import types as T

    from near_duplicate_detection_spark.functions.signatures import (
        shingle_strings,
    )
    from near_duplicate_detection_spark.functions.text import tokenize

    k = 5  # NDDConfig().shingle_k default; literal so the oracle can match

    # annotation-free: module-level `from __future__ import annotations`
    # makes local-import hints unresolvable for pandas_udf inference
    @F.pandas_udf(T.IntegerType())
    def n_shingles_udf(text):
        return text.map(lambda s: len(shingle_strings(tokenize(s), k)))

    d = _t(spark, sf_dir, "documents")
    trunc = F.array_join(
        F.slice(F.split("text", " "), 1, (F.col("doc_id") % 7).cast("int")),
        " ",
    )
    return d.select(
        "doc_id",
        (F.col("doc_id") % 7).cast("int").alias("n_tokens"),
        n_shingles_udf(trunc).alias("n_shingles"),
    )


# guard algebra: n=0 -> 1 (the empty shingle), 0<n<=k -> 1 (whole stream),
# else n-k+1 sliding windows. Docs have >= 8 tokens (min 48 chars), so the
# truncation to doc_id%7 in [0,6] is never clipped.
SQL_SHINGLE_GUARD = """
SELECT doc_id,
       CAST(doc_id % 7 AS INTEGER) AS n_tokens,
       CAST(CASE WHEN doc_id % 7 <= 5 THEN 1
                 ELSE doc_id % 7 - 5 + 1 END AS INTEGER) AS n_shingles
FROM documents
"""


def q_extract_text_roundtrip(spark, sf_dir):
    """S5/S10/F10/U2: the engine's byte-deterministic HTML→text extraction
    (functions/text.py extract_text_udf — comment/script/style stripping,
    tag removal, entity decode, whitespace collapse; graft of the
    reference's deterministic per-record decode, ndd/utils.py:21-33)
    through the REAL Arrow-batched UDF. The HTML is constructed in-engine
    with every hazard class the extractor handles; the expected output is a
    plain string both engines can spell, so the per-row invariant the
    north rule demands (byte-identical extracted text per url) is itself
    oracle-checked."""
    from near_duplicate_detection_spark.functions.text import extract_text_udf

    d = _t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit(
            "<html><head><title>t</title>"
            "<script type=\"text/javascript\">var hidden = 'SCRIPT-LEAK';"
            "</script><style>.x{color:red}</style></head><body>\n<p>"
        ),
        F.col("text"),
        F.lit(
            "</p><!-- COMMENT-LEAK --><div class=\"a\">tail &amp; "
            "&lt;entity&gt;\ttest</div>\n</body></html>"
        ),
    )
    return d.select(
        "doc_id",
        extract_text_udf(F.encode(html, "utf-8")).alias("extracted"),
    )


# expected = 't ' + text + ' tail & <entity> test' (title text survives —
# the extractor strips only comments/script/style bodies; tags become
# spaces; entities decode; whitespace collapses to single spaces)
SQL_EXTRACT_TEXT_ROUNDTRIP = """
SELECT doc_id, 't ' || text || ' tail & <entity> test' AS extracted
FROM documents
"""


def q_doc_validity_metrics(spark, sf_dir):
    """P4: corrupt/empty-input classification → per-class metrics (the
    pipeline's empty-doc metrics rows, pipeline.py stage-1 metrics; reference
    analog: skipping videos whose feature extraction produced no shots,
    ndd/server_ndd.py:246-261). Same constructed degenerate corpus as
    q_shingle_guard, aggregated: every doc lands in exactly one class."""
    d = _t(spark, sf_dir, "documents")
    n_tok = F.col("doc_id") % 7
    trunc = F.array_join(
        F.slice(F.split("text", " "), 1, n_tok.cast("int")), " "
    )
    cls = (
        F.when(trunc == "", "empty")
        .when(n_tok < 5, "short")
        .otherwise("ok")
    )
    return (
        d.select(F.col("lang"), cls.alias("doc_class"))
        .groupBy("lang", "doc_class")
        .agg(F.count("*").alias("n_docs"))
    )


SQL_DOC_VALIDITY_METRICS = """
SELECT lang,
       CASE WHEN doc_id % 7 = 0 THEN 'empty'
            WHEN doc_id % 7 < 5 THEN 'short'
            ELSE 'ok' END AS doc_class,
       count(*) AS n_docs
FROM documents
GROUP BY 1, 2
"""


def q_decontaminate_hits(spark, sf_dir):
    """Train/test decontamination (operators/decontaminate.py): per-doc
    count of distinct k-token shingles shared with a benchmark set — the
    GPT-3-appendix-C n-gram contamination check as a broadcast semi-join.
    The benchmark is carved deterministically out of the corpus (a 12-token
    run from every 50th doc), so contamination is planted and the whole
    operator chain is ANSI-SQL-checkable."""
    from near_duplicate_detection_spark.operators.decontaminate import (
        contamination_hits,
    )

    d = _t(spark, sf_dir, "documents")
    bench = d.where(F.col("doc_id") % 50 == 7).select(
        F.array_join(F.slice(F.split("text", " "), 3, 12), " ").alias("text")
    )
    return contamination_hits(
        d.select("doc_id", "text"), bench, k=8, id_col="doc_id"
    )


SQL_DECONTAMINATE_HITS = """
WITH bench AS (
  SELECT array_to_string(list_slice(string_split(text, ' '), 3, 14), ' ')
         AS btext
  FROM documents WHERE doc_id % 50 = 7),
bsh AS (
  SELECT DISTINCT unnest(
    CASE WHEN len(string_split(btext, ' ')) <= 8 THEN [btext]
         ELSE list_transform(
           range(1, len(string_split(btext, ' ')) - 6),
           i -> array_to_string(
                  list_slice(string_split(btext, ' '), i, i + 7), ' '))
    END) AS shingle
  FROM bench WHERE btext <> ''),
dsh AS (
  SELECT DISTINCT doc_id, unnest(
    CASE WHEN len(string_split(text, ' ')) <= 8 THEN [text]
         ELSE list_transform(
           range(1, len(string_split(text, ' ')) - 6),
           i -> array_to_string(
                  list_slice(string_split(text, ' '), i, i + 7), ' '))
    END) AS shingle
  FROM documents)
SELECT doc_id, count(*) AS n_hits
FROM dsh JOIN bsh USING (shingle)
GROUP BY doc_id
"""


def q_repetition_signals(spark, sf_dir):
    """Gopher intra-doc repetition filters (Rae et al. 2021 §A1.1) over the
    engine's real higher-order-function implementation
    (functions/textstats.py repetition_signals): duplicate-line fraction and
    duplicate-line character fraction. The corpus has no newlines, so lines
    are deterministic 3-token chunks and duplication is PLANTED: each doc's
    tokens are truncated to a multiple of 3 and its first 6 tokens appended
    again, so its first two lines recur exactly once each (reference analog:
    repeated frames within one video, ndd/server_ndd.py:127-141)."""
    from near_duplicate_detection_spark.functions.textstats import (
        chunk_lines,
        repetition_signals,
    )

    d = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n3 = (F.size(toks) / 3).cast("int") * 3
    planted = F.concat(F.slice(toks, 1, n3), F.slice(toks, 1, 6))
    return d.select(
        "doc_id", *repetition_signals(chunk_lines(planted, 3))
    )


SQL_REPETITION_SIGNALS = """
WITH p AS (
  SELECT doc_id,
         list_concat(
           list_slice(string_split(text, ' '), 1,
                      (len(string_split(text, ' ')) // 3) * 3),
           list_slice(string_split(text, ' '), 1, 6)) AS arr
  FROM documents),
l AS (
  SELECT doc_id,
         list_transform(
           range(0, greatest(CAST(ceil(len(arr) / 3.0) AS BIGINT), 1)),
           i -> array_to_string(list_slice(arr, i * 3 + 1, i * 3 + 3), ' '))
         AS lines
  FROM p),
m AS (
  SELECT doc_id, len(lines) AS n, len(list_distinct(lines)) AS nd,
         list_sum(list_transform(lines, x -> length(x))) AS chars,
         list_sum(list_transform(list_distinct(lines), x -> length(x)))
           AS dchars
  FROM l)
SELECT doc_id,
       round(CASE WHEN n > 0 THEN (n - nd) * 1.0 / n ELSE 0 END, 6)
         AS dup_line_frac,
       round(CASE WHEN chars > 0 THEN (chars - dchars) * 1.0 / chars
             ELSE 0 END, 6) AS dup_line_char_frac
FROM m
"""


def q_top_ngram_frac(spark, sf_dir):
    """Gopher top-n-gram character fraction (Rae et al. 2021 §A1.1) via the
    distributed operator (functions/textstats.py top_ngram_char_frac):
    grams explode map-side, the count shuffles on (doc, gram) — never on
    the gram alone, so corpus-hot grams cannot skew a reducer — and the
    per-doc argmax is a window with a total-order tiebreak."""
    from near_duplicate_detection_spark.functions.textstats import (
        top_ngram_char_frac,
    )

    d = _t(spark, sf_dir, "documents")
    return top_ngram_char_frac(d, "doc_id", "text", n=2)


SQL_TOP_NGRAM_FRAC = """
WITH t AS (
  SELECT doc_id, length(text) AS doc_chars,
         string_split(text, ' ') AS toks
  FROM documents),
g AS (
  SELECT doc_id, doc_chars,
         unnest(list_transform(
           range(1, greatest(len(toks) - 1, 0) + 1),
           i -> array_to_string(list_slice(toks, i, i + 1), ' '))) AS gram
  FROM t),
c AS (
  SELECT doc_id, doc_chars, gram, count(*) AS cnt
  FROM g GROUP BY 1, 2, 3),
r AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY cnt DESC, gram ASC) AS rn
  FROM c)
SELECT doc_id, gram AS top_ngram, cnt AS top_ngram_count,
       round(least(cnt * length(gram) * 1.0 / greatest(doc_chars, 1), 1.0), 6)
         AS top_ngram_char_frac
FROM r WHERE rn = 1
"""


def q_url_canonical_host(spark, sf_dir):
    """URL canonicalization (functions/url.py) — the web-corpus analog of
    the reference's videoid identity key (ndd/server_ndd.py:127-141): a
    deterministic url is synthesized per doc (mixed-case scheme/host,
    default and non-default ports, tracking params in every position,
    fragments), then canonicalized entirely with RE2-compatible
    regexp_replace chains (JVM codegen, no UDF). Covers: case folding
    limited to scheme+authority, scheme-AWARE default-port dropping
    (http:443 must survive), utm/fbclid stripping with '?' repair, and
    fragment removal."""
    from near_duplicate_detection_spark.functions.url import (
        canonicalize_url,
        registered_domain,
        url_host,
    )

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    scheme = (
        F.when(i % 3 == 0, "http").when(i % 3 == 1, "HTTPS").otherwise("https")
    )
    host = F.concat(F.lit("WWW.News"), s(i % 17), F.lit(".Example.COM"))
    port = (
        F.when(i % 4 == 0, ":443")
        .when(i % 4 == 1, ":8080")
        .when(i % 4 == 2, ":80")
        .otherwise("")
    )
    path = F.concat(F.lit("/a/"), s(i), F.lit("/x"))
    qs = (
        F.when(i % 5 == 0, F.concat(F.lit("?utm_source=feed&id="), s(i)))
        .when(
            i % 5 == 1,
            F.concat(
                F.lit("?id="), s(i), F.lit("&utm_campaign=Spring&ref="),
                s(i % 7),
            ),
        )
        .when(i % 5 == 2, F.lit("?utm_a=1&utm_b=2"))
        .when(i % 5 == 3, F.concat(F.lit("?id="), s(i)))
        .otherwise("")
    )
    frag = F.when(i % 2 == 0, "#frag").otherwise("")
    url = F.concat(scheme, F.lit("://"), host, port, path, qs, frag)
    canon = canonicalize_url(url)
    return d.select(
        "doc_id",
        canon.alias("canon_url"),
        url_host(canon).alias("host"),
        registered_domain(url_host(canon)).alias("domain"),
    )


SQL_URL_CANONICAL_HOST = """
WITH u AS (
  SELECT doc_id,
    (CASE doc_id % 3 WHEN 0 THEN 'http' WHEN 1 THEN 'HTTPS'
                     ELSE 'https' END)
    || '://' || 'WWW.News' || CAST(doc_id % 17 AS VARCHAR) || '.Example.COM'
    || (CASE doc_id % 4 WHEN 0 THEN ':443' WHEN 1 THEN ':8080'
                        WHEN 2 THEN ':80' ELSE '' END)
    || '/a/' || CAST(doc_id AS VARCHAR) || '/x'
    || (CASE doc_id % 5
          WHEN 0 THEN '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR)
          WHEN 1 THEN '?id=' || CAST(doc_id AS VARCHAR)
                      || '&utm_campaign=Spring&ref='
                      || CAST(doc_id % 7 AS VARCHAR)
          WHEN 2 THEN '?utm_a=1&utm_b=2'
          WHEN 3 THEN '?id=' || CAST(doc_id AS VARCHAR)
          ELSE '' END)
    || (CASE doc_id % 2 WHEN 0 THEN '#frag' ELSE '' END) AS url
  FROM documents),
s1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS url FROM u),
s2 AS (
  SELECT doc_id,
    lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*', 0))
      || substr(url,
           length(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*',
                                 0)) + 1) AS url
  FROM s1),
s3 AS (
  SELECT doc_id,
    regexp_replace(
      regexp_replace(url, '^(http://[^/:?]+):80([/?]|$)', '\\1\\2'),
      '^(https://[^/:?]+):443([/?]|$)', '\\1\\2') AS url
  FROM s2),
s4 AS (
  SELECT doc_id,
    regexp_replace(url, '[?&](utm_[a-zA-Z]+|fbclid|gclid)=[^&#]*', '', 'g')
      AS url
  FROM s3),
s5 AS (
  SELECT doc_id,
    regexp_replace(regexp_replace(url, '^([^?&]*)&', '\\1?'),
                   '[?&]+$', '') AS canon_url
  FROM s4)
SELECT doc_id, canon_url,
       regexp_extract(canon_url, '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1)
         AS host,
       regexp_extract(
         regexp_extract(canon_url, '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1),
         '([^.]+\\.[^.]+)$', 1) AS domain
FROM s5
"""


def q_registered_domain_psl(spark, sf_dir):
    """Public-suffix-list registrable-domain lookup (functions/url.py
    registered_domain_psl, round-4 VERDICT next-round #3): hosts synthesized
    per doc id cover a 2-label rule (co.uk), a deeper-vs-shorter rule
    conflict (com.au vs act.edu.au — longest must win), the implicit '*'
    fallback (plain .org, unknown TLD), and a host that IS a public suffix
    (NULL). The Spark side runs the REAL operator — split/slice candidate
    suffixes probing the bundled PSL dim through three broadcast hash
    joins, zero shuffle — while DuckDB spells the expected registrable
    domain independently from the same id arithmetic."""
    from near_duplicate_detection_spark.functions.url import (
        registered_domain_psl,
    )

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    host = (
        F.when(i % 6 == 0, F.concat(F.lit("www.news"), s(i % 17), F.lit(".co.uk")))
        .when(
            i % 6 == 1,
            F.concat(F.lit("shop"), s(i % 13), F.lit(".example.com.au")),
        )
        .when(
            i % 6 == 2,
            F.concat(F.lit("a.b.site"), s(i % 7), F.lit(".act.edu.au")),
        )
        .when(
            i % 6 == 3,
            F.concat(F.lit("deep.sub.example"), s(i % 5), F.lit(".org")),
        )
        .when(i % 6 == 4, F.lit("co.uk"))
        .otherwise(F.concat(F.lit("ex"), s(i % 3), F.lit(".unknowntld")))
    )
    return registered_domain_psl(
        d.select("doc_id", host.alias("host")), "host"
    )


SQL_REGISTERED_DOMAIN_PSL = """
SELECT doc_id,
  CASE doc_id % 6
    WHEN 0 THEN 'www.news' || CAST(doc_id % 17 AS VARCHAR) || '.co.uk'
    WHEN 1 THEN 'shop' || CAST(doc_id % 13 AS VARCHAR) || '.example.com.au'
    WHEN 2 THEN 'a.b.site' || CAST(doc_id % 7 AS VARCHAR) || '.act.edu.au'
    WHEN 3 THEN 'deep.sub.example' || CAST(doc_id % 5 AS VARCHAR) || '.org'
    WHEN 4 THEN 'co.uk'
    ELSE 'ex' || CAST(doc_id % 3 AS VARCHAR) || '.unknowntld'
  END AS host,
  CASE doc_id % 6
    WHEN 0 THEN 'news' || CAST(doc_id % 17 AS VARCHAR) || '.co.uk'
    WHEN 1 THEN 'example.com.au'
    WHEN 2 THEN 'site' || CAST(doc_id % 7 AS VARCHAR) || '.act.edu.au'
    WHEN 3 THEN 'example' || CAST(doc_id % 5 AS VARCHAR) || '.org'
    WHEN 4 THEN NULL
    ELSE 'ex' || CAST(doc_id % 3 AS VARCHAR) || '.unknowntld'
  END AS registered_domain
FROM documents
"""


def q_boilerplate_line_frac(spark, sf_dir):
    """Corpus-level boilerplate-line detection (operators/line_dedup.py,
    CCNet/RefinedWeb-style): per-doc fraction of 3-token lines that occur
    in >= 3 distinct documents. The cross-corpus count groups on an 8-byte
    xxhash64 of the line (map-side array_distinct first), the membership
    test is an equi-join on the same key — the shape that survives 10^12
    docs. Oracle joins on the line text (identical absent 64-bit hash
    collisions)."""
    from near_duplicate_detection_spark.functions.textstats import line_chunks
    from near_duplicate_detection_spark.operators.line_dedup import (
        boilerplate_line_frac,
    )

    d = _t(spark, sf_dir, "documents")
    return boilerplate_line_frac(d, "doc_id", line_chunks("text", 3), 3)


SQL_BOILERPLATE_LINE_FRAC = """
WITH l AS (
  SELECT doc_id,
         list_transform(
           range(0, greatest(CAST(ceil(len(string_split(text, ' ')) / 3.0)
                                  AS BIGINT), 1)),
           i -> array_to_string(
                  list_slice(string_split(text, ' '),
                             i * 3 + 1, i * 3 + 3), ' ')) AS lines
  FROM documents),
occ AS (SELECT doc_id, unnest(lines) AS line FROM l),
dd AS (SELECT DISTINCT doc_id, line FROM occ WHERE line <> ''),
b AS (SELECT line FROM dd GROUP BY line HAVING count(*) >= 3)
SELECT occ.doc_id, count(*) AS n_lines,
       round(coalesce(
         sum(CASE WHEN occ.line <> '' AND b.line IS NOT NULL
                  THEN 1 ELSE 0 END) * 1.0
           / nullif(sum(CASE WHEN occ.line <> '' THEN 1 ELSE 0 END), 0),
         0), 6) AS boiler_frac
FROM occ LEFT JOIN b ON occ.line = b.line
GROUP BY occ.doc_id
"""


def q_filter_report(spark, sf_dir):
    """The full C4/Gopher-style corpus filter chain
    (operators/filter_chain.py) value-checked END TO END: token bounds →
    planted Gopher repetition (docs with doc_id%10==4 get their first six
    tokens re-appended) → corpus boilerplate share → planted benchmark
    contamination (a 12-token run from every 50th doc, k=8 shingles) —
    every doc lands in exactly one attribution bucket, first failing gate
    wins (reference drop-gate analog: ndd/server_ndd.py:246-261)."""
    from near_duplicate_detection_spark.operators.filter_chain import (
        filter_report,
    )

    d = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n3 = (F.size(toks) / 3).cast("int") * 3
    planted = F.array_join(
        F.concat(F.slice(toks, 1, n3), F.slice(toks, 1, 6)), " "
    )
    base = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 4, planted)
        .otherwise(F.col("text"))
        .alias("text"),
    )
    bench = base.where(F.col("doc_id") % 50 == 7).select(
        F.array_join(F.slice(F.split("text", " "), 3, 12), " ").alias("text")
    )
    return filter_report(
        base,
        id_col="doc_id",
        text_col="text",
        min_tokens=20,
        max_tokens=95,
        max_dup_line_frac=0.1,
        max_boiler_frac=0.2,
        boiler_min_docs=3,
        line_width=3,
        benchmark=bench,
        decontaminate_k=8,
    )


SQL_FILTER_REPORT = """
WITH base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 4 THEN
           array_to_string(list_concat(
             list_slice(string_split(text, ' '), 1,
                        (len(string_split(text, ' ')) // 3) * 3),
             list_slice(string_split(text, ' '), 1, 6)), ' ')
         ELSE text END AS text
  FROM documents),
l AS (
  SELECT doc_id,
         list_transform(
           range(0, greatest(CAST(ceil(len(string_split(text, ' ')) / 3.0)
                                  AS BIGINT), 1)),
           i -> array_to_string(
                  list_slice(string_split(text, ' '),
                             i * 3 + 1, i * 3 + 3), ' ')) AS lines
  FROM base),
occ AS (SELECT doc_id, unnest(lines) AS line FROM l),
dd AS (SELECT DISTINCT doc_id, line FROM occ WHERE line <> ''),
b AS (SELECT line FROM dd GROUP BY line HAVING count(*) >= 3),
bf AS (
  SELECT occ.doc_id,
         coalesce(
           sum(CASE WHEN occ.line <> '' AND b.line IS NOT NULL
                    THEN 1 ELSE 0 END) * 1.0
             / nullif(sum(CASE WHEN occ.line <> '' THEN 1 ELSE 0 END), 0),
           0) AS boiler_frac
  FROM occ LEFT JOIN b ON occ.line = b.line
  GROUP BY occ.doc_id),
bench AS (
  SELECT array_to_string(list_slice(string_split(text, ' '), 3, 14), ' ')
         AS btext
  FROM base WHERE doc_id % 50 = 7),
bsh AS (
  SELECT DISTINCT unnest(
    CASE WHEN len(string_split(btext, ' ')) <= 8 THEN [btext]
         ELSE list_transform(
           range(1, len(string_split(btext, ' ')) - 6),
           i -> array_to_string(
                  list_slice(string_split(btext, ' '), i, i + 7), ' '))
    END) AS shingle
  FROM bench WHERE btext <> ''),
dsh AS (
  SELECT DISTINCT doc_id, unnest(
    CASE WHEN len(string_split(text, ' ')) <= 8 THEN [text]
         ELSE list_transform(
           range(1, len(string_split(text, ' ')) - 6),
           i -> array_to_string(
                  list_slice(string_split(text, ' '), i, i + 7), ' '))
    END) AS shingle
  FROM base),
hits AS (SELECT DISTINCT doc_id FROM dsh JOIN bsh USING (shingle)),
ann AS (
  SELECT base.doc_id,
    CASE
      WHEN len(string_split(base.text, ' ')) < 20 THEN 'too_short'
      WHEN len(string_split(base.text, ' ')) > 95 THEN 'too_long'
      WHEN (len(l.lines) - len(list_distinct(l.lines))) * 1.0
             / len(l.lines) > 0.1 THEN 'repetitive'
      WHEN bf.boiler_frac > 0.2 THEN 'boilerplate'
      WHEN hits.doc_id IS NOT NULL THEN 'contaminated'
      ELSE 'kept' END AS reject_reason
  FROM base
  JOIN l ON base.doc_id = l.doc_id
  JOIN bf ON base.doc_id = bf.doc_id
  LEFT JOIN hits ON base.doc_id = hits.doc_id)
SELECT reject_reason, count(*) AS n_docs
FROM ann GROUP BY reject_reason
"""


def q_audio_window_features(spark, sf_dir):
    """Audio windowing through the REAL Arrow-batched operator
    (operators/multimodal.py sample_audio_windows): per-doc synthetic raw
    PCM whose payload is a constant byte v = 1 + doc_id%7 repeated
    n = 100 + doc_id%50 times at 100 Hz — so every 500 ms window's mean
    |sample| is EXACTLY v (float32 of a small int is exact), zero
    crossings are exactly 0, and the whole window grid (count, start_ms)
    is id arithmetic ANSI SQL can spell. The bytes genuinely flow through
    the binary column, the JVM explode grid, and the numpy window kernel
    (reference analog: per-shot frame grid, extract_images.py:43)."""
    from near_duplicate_detection_spark.operators.multimodal import (
        sample_audio_windows,
    )

    d = _t(spark, sf_dir, "documents")
    audio = d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.expr(
            "cast(repeat(char(doc_id % 7 + 1),"
            " cast(100 + doc_id % 50 as int)) as binary)"
        ).alias("payload"),
        F.struct(
            F.lit(100).alias("sample_rate"),
            (F.lit(100) + F.col("doc_id") % 50).cast("int").alias(
                "n_samples"
            ),
        ).alias("meta"),
    )
    return sample_audio_windows(audio, window_ms=500)


SQL_AUDIO_WINDOW_FEATURES = """
WITH a AS (
  SELECT doc_id, 100 + doc_id % 50 AS n, 1 + doc_id % 7 AS v
  FROM documents),
w AS (
  SELECT doc_id, v,
         unnest(range(0, ((n - 1) // 50) + 1)) AS window_idx
  FROM a)
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       CAST(window_idx AS INT) AS window_idx,
       CAST(window_idx * 500 AS INT) AS start_ms,
       CAST(v AS FLOAT) AS energy,
       CAST(0 AS INT) AS zero_crossings
FROM w
"""


# ---------------------------------------------------------------- registry

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "window_dedup_topk": q_window_dedup_topk,
    "interval_join": q_interval_join,
    "two_level_minmax": q_two_level_minmax,
    "broadcast_lookup_coalesce": q_broadcast_lookup_coalesce,
    "pair_dedup_canonical": q_pair_dedup_canonical,
    "token_count": q_token_count,
    "token_budget": q_token_budget,
    "quality_score": q_quality_score,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "embedding_knn_bruteforce": q_embedding_knn_bruteforce,
    "embedding_cosine_dup_pairs": q_embedding_cosine_dup_pairs,
    "doc_fingerprint_winnow": q_doc_fingerprint_winnow,
    "salted_distinct_tokens": q_salted_distinct_tokens,
    "pii_redact": q_pii_redact,
    "ms_to_hms": q_ms_to_hms,
    "json_extract": q_json_extract,
    "base64_encode": q_base64_encode,
    "path_parse": q_path_parse,
    "argmin_classify": q_argmin_classify,
    "sessionize": q_sessionize,
    "lang_stats": q_lang_stats,
    "exact_dedup_groups": q_exact_dedup_groups,
    "norm_precompute": q_norm_precompute,
    "except_custkeys": q_except_custkeys,
    "json_fallback_chain": q_json_fallback_chain,
    "conditional_fallback": q_conditional_fallback,
    "lang_id_markers": q_lang_id_markers,
    "filter_validate": q_filter_validate,
    "minhash_signatures": q_minhash_signatures,
    "lsh_candidate_pairs": q_lsh_candidate_pairs,
    "near_dup_clusters": q_near_dup_clusters,
    "simhash_hamming_topk": q_simhash_hamming_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "quality_features_full": q_quality_features_full,
    "multimodal_frame_features": q_multimodal_frame_features,
    "substring_pairs": q_substring_pairs,
    "resize_meta": q_resize_meta,
    "normalize_text": q_normalize_text,
    "shingle_guard": q_shingle_guard,
    "doc_validity_metrics": q_doc_validity_metrics,
    "extract_text_roundtrip": q_extract_text_roundtrip,
    "decontaminate_hits": q_decontaminate_hits,
    "repetition_signals": q_repetition_signals,
    "top_ngram_frac": q_top_ngram_frac,
    "url_canonical_host": q_url_canonical_host,
    "registered_domain_psl": q_registered_domain_psl,
    "boilerplate_line_frac": q_boilerplate_line_frac,
    "filter_report": q_filter_report,
    "audio_window_features": q_audio_window_features,
}

ORACLES: dict[str, str] = {
    "window_dedup_topk": SQL_WINDOW_DEDUP_TOPK,
    "interval_join": SQL_INTERVAL_JOIN,
    "two_level_minmax": SQL_TWO_LEVEL_MINMAX,
    "broadcast_lookup_coalesce": SQL_BROADCAST_LOOKUP_COALESCE,
    "pair_dedup_canonical": SQL_PAIR_DEDUP_CANONICAL,
    "token_count": SQL_TOKEN_COUNT,
    "token_budget": SQL_TOKEN_BUDGET,
    "quality_score": SQL_QUALITY_SCORE,
    "ngram_jaccard_pairs": SQL_NGRAM_JACCARD_PAIRS,
    "embedding_knn_bruteforce": SQL_EMBEDDING_KNN_BRUTEFORCE,
    "embedding_cosine_dup_pairs": SQL_EMBEDDING_COSINE_DUP_PAIRS,
    "doc_fingerprint_winnow": SQL_DOC_FINGERPRINT_WINNOW,
    "salted_distinct_tokens": SQL_SALTED_DISTINCT_TOKENS,
    "pii_redact": SQL_PII_REDACT,
    "ms_to_hms": SQL_MS_TO_HMS,
    "json_extract": SQL_JSON_EXTRACT,
    "base64_encode": SQL_BASE64_ENCODE,
    "path_parse": SQL_PATH_PARSE,
    "argmin_classify": SQL_ARGMIN_CLASSIFY,
    "sessionize": SQL_SESSIONIZE,
    "lang_stats": SQL_LANG_STATS,
    "exact_dedup_groups": SQL_EXACT_DEDUP_GROUPS,
    "norm_precompute": SQL_NORM_PRECOMPUTE,
    "except_custkeys": SQL_EXCEPT_CUSTKEYS,
    "json_fallback_chain": SQL_JSON_FALLBACK_CHAIN,
    "conditional_fallback": SQL_CONDITIONAL_FALLBACK,
    "lang_id_markers": SQL_LANG_ID_MARKERS,
    "filter_validate": SQL_FILTER_VALIDATE,
    "near_dup_clusters": SQL_NEAR_DUP_CLUSTERS,
    "quality_features_full": SQL_QUALITY_FEATURES_FULL,
    "multimodal_frame_features": SQL_MULTIMODAL_FRAME_FEATURES,
    "substring_pairs": SQL_SUBSTRING_PAIRS,
    "minhash_signatures": SQL_MINHASH_SIGNATURES,
    "lsh_candidate_pairs": SQL_LSH_CANDIDATE_PAIRS,
    "ann_lsh_topk": SQL_ANN_LSH_TOPK,
    "ann_ivf_topk": SQL_ANN_IVF_TOPK,
    "simhash_hamming_topk": SQL_SIMHASH_HAMMING_TOPK,
    "resize_meta": SQL_RESIZE_META,
    "normalize_text": SQL_NORMALIZE_TEXT,
    "shingle_guard": SQL_SHINGLE_GUARD,
    "doc_validity_metrics": SQL_DOC_VALIDITY_METRICS,
    "extract_text_roundtrip": SQL_EXTRACT_TEXT_ROUNDTRIP,
    "decontaminate_hits": SQL_DECONTAMINATE_HITS,
    "repetition_signals": SQL_REPETITION_SIGNALS,
    "top_ngram_frac": SQL_TOP_NGRAM_FRAC,
    "url_canonical_host": SQL_URL_CANONICAL_HOST,
    "registered_domain_psl": SQL_REGISTERED_DOMAIN_PSL,
    "boilerplate_line_frac": SQL_BOILERPLATE_LINE_FRAC,
    "filter_report": SQL_FILTER_REPORT,
    "audio_window_features": SQL_AUDIO_WINDOW_FEATURES,
}
