"""Survival analysis (Kaplan-Meier product-limit estimator).

Churn / retention / time-to-failure analytics over the same event
streams the reference's splitters aggregate
(``split_vehicle_data/split_vehicle.py`` computes only first-order
histograms; any "how long until X" dashboard on that data needs the
censoring-aware estimator implemented here). Public-literature
algorithm (Kaplan & Meier 1958); distributed shape follows this
repo's aggregate-first window idiom: raw observations collapse to
(key, duration) rows before any window touches them, so the per-key
window size is the distinct-duration cardinality, never the row
count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    keys: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Kaplan-Meier survival curve per key: one row per distinct
    duration with ≥1 EVENT (censored-only times contribute to the
    at-risk denominator but emit no step), with the at-risk count,
    event count, and the product-limit survival estimate
    ``S(t) = Π_{t_i ≤ t} (1 − d_i / n_i)``.

    ``event_col`` is 1 for an observed event, 0 for right-censoring.

    Exactness: ``n_i`` (at-risk) and ``d_i`` (events) are exact
    BIGINTs from one hash aggregate + one grouped-duration window;
    each step ratio ``(n_i − d_i) / n_i`` is a correctly-rounded
    IEEE division of identical integers, so per-step factors are
    bit-identical across engines. The running product is
    ``exp(Σ ln(factor))`` (Spark has no product aggregate), and ln /
    exp are libm calls with last-ulp latitude — so the survival
    column is ROUNDED to ``round_to`` dp for comparison, the same
    convention as the repo's tf-idf / LM-score queries. d and
    at-risk stay exact.

    Scale shape: groupBy (keys, duration) collapses the data, the
    cumulative window runs over per-key distinct durations only, and
    the at-risk count derives from the same grouped frame — no raw
    row enters a window, no global sort.
    """
    keys = keys or []
    g = df.groupBy(*keys, duration_col).agg(
        F.sum(F.col(event_col).cast("bigint")).alias("d"),
        F.count("*").alias("_obs"),
    )
    w = Window.partitionBy(*keys).orderBy(duration_col)
    removed_before = F.coalesce(
        F.sum("_obs").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("bigint"),
    )
    total = F.sum("_obs").over(Window.partitionBy(*keys))
    stepped = g.withColumn("at_risk", total - removed_before)
    # ln(1 - d/n) only where an event happened; censored-only rows
    # pass factor 1 (ln = 0) through the cumulative sum. When the
    # whole risk set dies (d = n, the curve hits 0) Spark's log(0)
    # is NULL — which a window SUM would silently SKIP, corrupting
    # every later step — so that case takes a −1e9 sentinel whose
    # exp underflows to exactly 0.0 on every IEEE engine.
    log_factor = (
        F.when(F.col("d") >= F.col("at_risk"), F.lit(-1e9))
        .when(
            F.col("d") > 0,
            F.log(
                (F.col("at_risk") - F.col("d")).cast("double")
                / F.col("at_risk").cast("double")
            ),
        )
        .otherwise(F.lit(0.0))
    )
    surv = F.exp(
        F.sum(log_factor).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        stepped.withColumn("survival", F.round(surv, round_to))
        .where(F.col("d") > 0)
        .select(*keys, duration_col, "at_risk", "d", "survival")
    )
