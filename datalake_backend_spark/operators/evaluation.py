"""Model-evaluation aggregates: exact counts, integer-permille rates.

Scores come from upstream operators (nb_quality_score, lm_doc_score,
similarity ranks); this module turns (score, label) pairs into the
reports an eval harness reads — gains tables live in
``operators/ranking.py`` (score_deciles); this file holds the
threshold-sweep confusion matrix. Everything is BIGINT counts and
cross-multiplied permille floors, so any engine reproduces the report
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def confusion_at_thresholds(
    df: DataFrame,
    score_col: str,
    label_col,
    thresholds: list[int],
) -> DataFrame:
    """Confusion matrix at each decision threshold — ONE pass over the
    data: the thresholds (a small literal list) explode against every
    row, predictions are ``score ≥ threshold``, and per threshold the
    exact TP/FP/FN/TN counts plus precision/recall/accuracy in
    integer permille (NULL when the denominator is 0, e.g. precision
    at a threshold nothing clears). The PR-curve-at-k-operating-points
    report, engine-exact.

    Scale shape: the explode multiplies rows by |thresholds| (a
    handful) INSIDE the map stage; one hash aggregate follows. No
    joins, no windows.
    """
    if not thresholds:
        raise ValueError("need >= 1 threshold")
    label = F.col(label_col) if isinstance(label_col, str) else label_col
    t = F.explode(
        F.array(*[F.lit(int(x)).cast("bigint") for x in thresholds])
    ).alias("threshold")
    d = df.select(
        F.col(score_col).alias("_s"), label.cast("boolean").alias("_y"), t
    ).withColumn("_p", F.col("_s") >= F.col("threshold"))

    def n(cond: Column) -> Column:
        return F.sum(cond.cast("bigint"))

    per = d.groupBy("threshold").agg(
        n(F.col("_p") & F.col("_y")).alias("tp"),
        n(F.col("_p") & ~F.col("_y")).alias("fp"),
        n(~F.col("_p") & F.col("_y")).alias("fn"),
        n(~F.col("_p") & ~F.col("_y")).alias("tn"),
    )
    return per.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.expr("tp * 1000 div (tp + fp)"),
        ).alias("precision_permille"),
        F.when(
            F.col("tp") + F.col("fn") > 0,
            F.expr("tp * 1000 div (tp + fn)"),
        ).alias("recall_permille"),
        F.expr("(tp + tn) * 1000 div (tp + fp + fn + tn)").alias(
            "accuracy_permille"
        ),
    )


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    keys: list[str] | None = None,
) -> DataFrame:
    """EXACT area under the ROC curve per key, tie-aware — the
    threshold-free companion to :func:`confusion_at_thresholds`:
    AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻), which is
    precisely the normalized Mann-Whitney statistic
    ``U⁺ / (n⁺ · n⁻)``. Reuses ``distributions.mann_whitney_u``'s
    all-integer doubled mid-ranks, so ties contribute exactly ½ and
    the final value is one IEEE division of engine-identical
    numbers — no sampling, no trapezoid approximation, no tolerance.

    ``label_col`` must be 1 (positive) / 0 (negative). Scale shape
    inherits from mann_whitney_u: one hash aggregate, one window
    over per-key DISTINCT scores, one re-aggregate."""
    from datalake_backend_spark.operators.distributions import mann_whitney_u

    keys = keys or []
    mw = mann_whitney_u(df, score_col, label_col, 1, 0, keys=keys)
    return mw.select(
        *keys,
        F.col("n_a").alias("n_pos"),
        F.col("n_b").alias("n_neg"),
        # n⁺·n⁻ as a double PRODUCT (not a bigint product cast): the
        # bigint multiply overflows first at extreme n; double·double
        # is correctly rounded and engine-identical
        (
            F.col("u_a")
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
        ).alias("auc"),
    )
