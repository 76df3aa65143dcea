"""Declarative data-quality constraints over a DataFrame.

The reference guards its zones imperatively — required-column checks
and per-field cleaning sprinkled through each domain processor
(``Preprocess_Json_Data/processors/*.py``); this module is the
declarative, engine-level version every lake pipeline grows into
(dbt tests / Great Expectations / Delta constraints): a rule list is
compiled into ONE aggregate pass and the result is a per-rule
violation report a gate can act on.

Scale shape: all row-level rules (not_null / range / in_set / regex /
custom predicate) become conditional-count expressions inside a single
``agg`` — one scan, map-side partials, no matter how many rules.
``unique`` needs a key shuffle by nature (duplicate detection is a
group-by), and ``foreign_key`` is a broadcast-or-shuffle anti-join;
both still count violations without materializing violating rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> dict:
    return {"rule": f"not_null({col})", "kind": "row", "col": col,
            "pred": F.col(col).isNotNull()}


def in_range(col: str, lo=None, hi=None) -> dict:
    c = F.col(col)
    pred = F.lit(True)
    if lo is not None:
        pred = pred & (c >= lo)
    if hi is not None:
        pred = pred & (c <= hi)
    # null passes range checks (pair with not_null to forbid nulls)
    return {"rule": f"in_range({col},{lo},{hi})", "kind": "row", "col": col,
            "pred": c.isNull() | pred}


def in_set(col: str, values: list) -> dict:
    return {"rule": f"in_set({col})", "kind": "row", "col": col,
            "pred": F.col(col).isNull() | F.col(col).isin(values)}


def matches(col: str, pattern: str) -> dict:
    return {"rule": f"matches({col})", "kind": "row", "col": col,
            "pred": F.col(col).isNull() | F.col(col).rlike(pattern)}


def satisfies(name: str, pred: Column) -> dict:
    """Arbitrary row predicate (the CHECK constraint)."""
    return {"rule": name, "kind": "row", "pred": pred}


def unique(cols: list[str]) -> dict:
    return {"rule": f"unique({','.join(cols)})", "kind": "unique",
            "cols": list(cols)}


def foreign_key(col: str, ref_df: DataFrame, ref_col: str,
                ref_name: str = "ref") -> dict:
    return {"rule": f"foreign_key({col}->{ref_name}.{ref_col})",
            "kind": "fk", "col": col, "ref_df": ref_df, "ref_col": ref_col}


def check_constraints(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate ``rules`` and return one report row per rule:
    ``(rule, violations, n_rows, passed)``, in the given rule order
    (``rule`` is unique per report, so order is reconstructible).

    Row-level rules share ONE aggregate job; each ``unique`` adds one
    group-by job and each ``foreign_key`` one anti-join job — the
    report is exact, never sampled."""
    spark = df.sparkSession
    row_rules = [r for r in rules if r["kind"] == "row"]
    reports: list[DataFrame] = []
    if row_rules:
        aggs = [F.count(F.lit(1)).alias("_n")] + [
            F.sum((~r["pred"]).cast("long")).alias(f"_v{i}")
            for i, r in enumerate(row_rules)
        ]
        one = df.agg(*aggs)
        stack = ", ".join(
            f"'{r['rule']}', _v{i}" for i, r in enumerate(row_rules)
        )
        reports.append(
            one.select(
                F.expr(
                    f"stack({len(row_rules)}, {stack}) AS (rule, violations)"
                ),
                F.col("_n").alias("n_rows"),
            )
        )
    for r in rules:
        if r["kind"] == "unique":
            dup = (
                df.groupBy(*r["cols"])
                .agg(F.count(F.lit(1)).alias("_c"))
                .where(F.col("_c") > 1)
                .agg(
                    F.coalesce(F.sum(F.col("_c") - 1), F.lit(0)).alias(
                        "violations"
                    )
                )
            )
            reports.append(
                dup.crossJoin(df.agg(F.count(F.lit(1)).alias("n_rows"))).select(
                    F.lit(r["rule"]).alias("rule"), "violations", "n_rows"
                )
            )
        elif r["kind"] == "fk":
            orphan = (
                df.select(F.col(r["col"]).alias("_k"))
                .where(F.col("_k").isNotNull())
                .join(
                    r["ref_df"].select(
                        F.col(r["ref_col"]).alias("_k")
                    ).distinct(),
                    "_k",
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).alias("violations"))
            )
            reports.append(
                orphan.crossJoin(
                    df.agg(F.count(F.lit(1)).alias("n_rows"))
                ).select(F.lit(r["rule"]).alias("rule"), "violations", "n_rows")
            )
    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out.select(
        "rule", "violations", "n_rows", (F.col("violations") == 0).alias("passed")
    )
