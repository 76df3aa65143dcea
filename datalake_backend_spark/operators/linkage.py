"""Record-linkage match-weight estimation (Fellegi–Sunter style).

The classical probabilistic record-linkage model (Fellegi & Sunter
1969 — public literature) scores candidate pairs by per-field
agreement weights ``m_i / u_i``: the probability a field agrees among
true matches vs among random pairs. This module estimates those
weights UNSUPERVISED from blocked candidate pairs, the standard
bootstrap when no labels exist:

- ``u_i`` — field-agreement rate over ALL blocking candidates
  (dominated by non-matches, the u-probability proxy);
- ``m_i`` — field-agreement rate over the STRONG subset (rank-gap-1
  neighbors: records ADJACENT in the sorted-neighborhood order, the
  highest-precision unsupervised match proxy).

All rates are scaled truncating integer divisions, so every weight
reproduces bit-for-bit in any engine — the log-odds monotone
transform is left to the consumer (log is not div-exact).

Scale shape: the candidate frame arrives with payload columns carried
through the blocking (``sorted_neighborhood_pairs(carry_cols=...)``)
— no re-join against the base table; the estimation itself is ONE
partial-aggregable pass over the pairs (a handful of conditional
counts), then a per-field unpivot of a single aggregate row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def match_weights(
    pairs: DataFrame,
    fields: list[str],
    strong_col: str | None = None,
    scale: int = 10**6,
) -> DataFrame:
    """Per-field agreement weights over blocked candidate pairs.

    ``pairs`` must carry ``{f}_a`` / ``{f}_b`` for every ``f`` in
    ``fields`` (the ``carry_cols`` output shape). ``strong_col``: a
    boolean column marking the high-precision subset; defaults to
    ``rank_gap = 1`` when the frame has a ``rank_gap`` column.

    Returns one row per field: ``(field, n_pairs, n_strong,
    u_scaled, m_scaled, weight_ratio_scaled)`` where
    ``u_scaled = n_agree_all · scale div n_pairs``,
    ``m_scaled = n_agree_strong · scale div n_strong`` and
    ``weight_ratio_scaled = m_scaled · scale div max(u_scaled, 1)``
    (the max-guard keeps a never-agreeing field loud instead of NULL).
    NULL field values never count as agreement (NULL-safe equality
    against non-NULL only).
    """
    if not fields:
        raise ValueError("fields must be non-empty")
    if strong_col is None:
        if "rank_gap" not in pairs.columns:
            raise ValueError(
                "no strong_col given and no rank_gap column to default to"
            )
        strong = F.col("rank_gap") == 1
    else:
        strong = F.col(strong_col)
    aggs = [
        F.count("*").alias("n_pairs"),
        F.sum(strong.cast("bigint")).alias("n_strong"),
    ]
    for f in fields:
        agree = F.col(f"{f}_a").eqNullSafe(F.col(f"{f}_b")) & F.col(
            f"{f}_a"
        ).isNotNull()
        aggs.append(F.sum(agree.cast("bigint")).alias(f"_all_{f}"))
        aggs.append(
            F.sum((agree & strong).cast("bigint")).alias(f"_str_{f}")
        )
    row = pairs.agg(*aggs)
    # unpivot the single aggregate row into one output row per field:
    # a stack() over literals — no shuffle, no second pass
    stacked = row.select(
        "n_pairs",
        "n_strong",
        F.expr(
            "stack({n}, {args}) AS (field, n_agree_all, n_agree_strong)".format(
                n=len(fields),
                args=", ".join(
                    f"'{f}', _all_{f}, _str_{f}" for f in fields
                ),
            )
        ),
    )
    return stacked.select(
        "field",
        "n_pairs",
        "n_strong",
        F.expr(f"n_agree_all * {scale}L div n_pairs").alias("u_scaled"),
        F.expr(f"n_agree_strong * {scale}L div n_strong").alias("m_scaled"),
        F.expr(
            f"(n_agree_strong * {scale}L div n_strong) * {scale}L "
            f"div greatest(n_agree_all * {scale}L div n_pairs, 1L)"
        ).alias("weight_ratio_scaled"),
    )
