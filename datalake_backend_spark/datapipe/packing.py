"""Sequence packing: lay a document corpus out as one global token
stream and chunk it into fixed-length training sequences.

The GPT-style pre-training data layout: documents are concatenated in a
deterministic key order and the stream is split every ``max_len``
tokens; a document is described by its global start offset, the
sequence window it starts in, and how many windows it spans.

The global running sum is the scale problem: `SUM() OVER (ORDER BY
key)` with no PARTITION BY moves the whole corpus through ONE task.
:func:`token_stream_offsets` computes the identical result through
the shared two-phase prefix-sum kernel
(``operators.ranking.keyed_running_sum``): sampled value-derived
bucket boundaries, per-bucket windows, and an exclusive prefix over
``#buckets`` metadata rows — every data-sized window partitioned, no
``localCheckpoint`` materialization (round 13; the earlier
spark_partition_id variant froze the whole frame to executor disks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_backend_spark.datapipe.text import token_count


def token_stream_offsets(
    df: DataFrame,
    key_col: str = "doc_id",
    token_count_col: str | None = None,
    text_col: str = "text",
    out_col: str = "start_offset",
) -> DataFrame:
    """Global exclusive running token count in ``key_col`` order.

    Result is a pure function of (key, n_tokens) — independent of input
    partitioning or cluster size, so an engine re-implementation (or a
    rebuild on more executors) reproduces byte-identical offsets.
    Supply ``token_count_col`` if token counts are precomputed;
    otherwise they are derived from ``text_col``.
    """
    if token_count_col is None:
        d = df.withColumn("_n_tok", token_count(F.col(text_col)).cast("long"))
    else:
        d = df.withColumn("_n_tok", F.col(token_count_col).cast("long"))
    # inclusive prefix sum from the shared two-phase kernel
    # (ranking.keyed_running_sum — value-derived buckets, per-bucket
    # windows, metadata offsets; round-13 replaced this operator's own
    # localCheckpoint + spark_partition_id variant, the last forced
    # materialization on a driver-window path), then subtract the
    # row's own count for the exclusive offset
    from datalake_backend_spark.operators.ranking import keyed_running_sum

    cum = keyed_running_sum(d, [], [key_col], "_n_tok", out_col="_incl")
    return (
        cum.withColumn(out_col, F.col("_incl") - F.col("_n_tok"))
        .drop("_incl", "_n_tok")
    )


def pack_sequences(
    df: DataFrame,
    max_len: int,
    key_col: str = "doc_id",
    token_count_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Assign each document its place in the packed token stream:
    ``start_offset`` (global token position), ``seq_id`` (the
    ``max_len``-token training sequence its first token lands in),
    ``offset_in_seq``, and ``n_seqs_spanned`` (how many windows the
    document crosses — the boundary-split accounting a loader needs).
    Input columns other than ``text_col`` pass through, so downstream
    stages never re-join (re-joining would re-evaluate the whole
    upstream plan on the build side).

    Integer ``div``/``%`` arithmetic throughout — exact at any corpus
    size (a double-precision floor would silently wobble past 2^53
    tokens).
    """
    d = token_stream_offsets(df, key_col, token_count_col, text_col)
    n_tok = (
        token_count(F.col(text_col)).cast("long")
        if token_count_col is None
        else F.col(token_count_col).cast("long")
    )
    ml = int(max_len)
    carry = [
        c
        for c in df.columns
        if c not in (key_col, text_col, token_count_col, "start_offset")
    ]
    staged = d.select(
        F.col(key_col), *carry, n_tok.alias("n_tokens"), F.col("start_offset")
    )
    # `div` is Spark's exact integer division (`//` in DuckDB); operands
    # are non-negative longs so div == floor division in both engines
    return staged.select(
        F.col(key_col),
        *carry,
        "n_tokens",
        "start_offset",
        F.expr(f"start_offset div {ml}").alias("seq_id"),
        (F.col("start_offset") % F.lit(ml)).alias("offset_in_seq"),
        (
            F.expr(f"(start_offset + n_tokens - 1) div {ml}")
            - F.expr(f"start_offset div {ml}")
            + F.lit(1)
        ).alias("n_seqs_spanned"),
    )
