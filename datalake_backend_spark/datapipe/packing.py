"""Sequence packing: lay a document corpus out as one global token
stream and chunk it into fixed-length training sequences.

The GPT-style pre-training data layout: documents are concatenated in a
deterministic key order and the stream is split every ``max_len``
tokens; a document is described by its global start offset, the
sequence window it starts in, and how many windows it spans.

The global running sum is the scale problem: `SUM() OVER (ORDER BY
key)` with no PARTITION BY moves the whole corpus through ONE task.
:func:`token_stream_offsets` computes the identical result with the
classic two-phase plan instead:

1. range-partition + sort by key (one shuffle of (key, n_tokens)
   pairs — never text);
2. per-partition token totals (a handful of rows — one per partition);
3. exclusive prefix sum over those totals (a window over
   cluster-parallelism-sized metadata, not data);
4. broadcast the per-partition offsets back and add a
   partition-local running sum.

Every step is bounded: the only partition-less window runs over
``#partitions`` rows, and the data-sized windows are all partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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
        token_count_col = "_n_tok"
    else:
        d = df.withColumn("_n_tok", F.col(token_count_col).cast("long"))
        token_count_col = "_n_tok"
    d = d.repartitionByRange(F.col(key_col)).sortWithinPartitions(key_col)
    # FREEZE the partitioning before the totals branch and the final
    # join both consume it: spark_partition_id() is assigned on the
    # shuffle READ side, where AQE coalescing and range-boundary
    # resampling can differ per consumer — offsets from one
    # partitioning joined to rows from another corrupt the prefix sum.
    d = d.withColumn("_pid", F.spark_partition_id()).localCheckpoint(
        eager=True
    )
    totals = d.groupBy("_pid").agg(F.sum("_n_tok").alias("_pt"))
    # exclusive prefix over per-partition totals: #partitions rows, so
    # the partition-less window is metadata-sized by construction
    w_parts = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "_pid", F.coalesce(F.sum("_pt").over(w_parts), F.lit(0)).alias("_off")
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.join(F.broadcast(offsets), "_pid")
        .withColumn(
            out_col,
            F.col("_off") + F.coalesce(F.sum("_n_tok").over(w_local), F.lit(0)),
        )
        .drop("_pid", "_off", "_n_tok")
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
