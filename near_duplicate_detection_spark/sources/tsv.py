"""TSV segment-boundary scan/sink (SURVEY S4/S11).

Reference: ndd/utils.py:7-18 reads shot boundaries as tab-separated
(begin_ms, end_ms, shot_id) rows and returns (begin, end-1) tuples — the
end-exclusive adjustment is part of the contract; ndd/shotdetect.py:32-39
writes them. Engine: schema'd csv reader + the same end-1 projection,
expressed as column arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("begin_ms", T.LongType(), False),
        T.StructField("end_ms", T.LongType(), False),
        T.StructField("segment_id", T.LongType(), False),
    ]
)


def read_segments(spark: SparkSession, path: str) -> DataFrame:
    """TSV → (segment_id, begin_ms, end_ms) with the reference's end-1
    adjustment (utils.py:14-18: boundaries become inclusive)."""
    return (
        spark.read.csv(path, sep="\t", schema=SEGMENT_SCHEMA)
        .select(
            "segment_id",
            "begin_ms",
            (F.col("end_ms") - F.lit(1)).alias("end_ms"),
        )
    )


def write_segments(df: DataFrame, path: str) -> None:
    """Inverse sink (shotdetect.py:32-39 csv writer analog)."""
    (
        df.select("begin_ms", "end_ms", "segment_id")
        .write.mode("overwrite")
        .option("sep", "\t")
        .csv(path)
    )
