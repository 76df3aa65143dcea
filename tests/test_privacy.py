"""k-anonymity global recoding (operators/privacy.py; oracle twin
r152)."""

from pyspark.sql import functions as F  # noqa: F401


def _rows():
    rows = []
    for i in range(12):
        rows.append((f"u{i}", "A", 5.0))            # one tight class
        rows.append((f"v{i}", "B", i * 200.0))      # $200-spread ladder
        rows.append((f"w{i}", "C", -50.0))          # negative balances
    return rows


def test_k_anonymize_minimal_level_and_floor_div(spark):
    """Chosen level is the SMALLEST satisfying k: B's $2200 spread
    fits one $3200 bucket at level 5 but splits 8/4 at level 4; C's
    negative balance must land in bucket −1 (floor), not 0
    (truncation) — the exact Spark `div` hazard the operator works
    around."""
    import pytest

    from datalake_backend_spark.operators.privacy import k_anonymize

    df = spark.createDataFrame(_rows(), "id string, seg string, bal double")
    classes, level, achieved = k_anonymize(df, ["seg"], "bal", k=10, max_level=8)
    assert level == 5 and achieved is True
    got = {(r.seg, r.bucket): r.k_size for r in classes.collect()}
    assert got == {("A", 0): 12, ("B", 0): 12, ("C", -1): 12}
    # k too large for the categorical structure -> explicit refusal
    with pytest.raises(ValueError, match="coarsen"):
        k_anonymize(df, ["seg", "id"], "bal", k=2, max_level=3)
    # ... unless the caller opts into the max-level release
    cl, lvl, ok = k_anonymize(
        df, ["seg", "id"], "bal", k=2, max_level=3, on_fail="max_level"
    )
    assert lvl == 3 and ok is False and cl.count() == 36


def test_l_diversify_homogeneity(spark):
    """Distinct l-diversity (operators/privacy.py:l_diversify; oracle
    twin r155): segment A's two $100-apart sub-groups carry different
    diagnoses, so level 0 ($100 buckets) is 10-anonymous yet FULLY
    homogeneous — only widening to level 1 merges them and reaches
    l=2. No level can reach l=3 (neither segment has a third value),
    so that falls back with achieved=False."""
    import pytest

    from datalake_backend_spark.operators.privacy import l_diversify

    rows = []
    for i in range(10):
        rows.append((f"a{i}", "A", 10.0, "flu"))
        rows.append((f"b{i}", "A", 110.0, "cold"))
        rows.append((f"c{i}", "B", 10.0, "flu" if i % 2 else "cold"))
    df = spark.createDataFrame(
        rows, "id string, seg string, bal double, diag string"
    )
    classes, level, ok = l_diversify(
        df, ["seg"], "bal", "diag", l_min=2, max_level=4
    )
    assert level == 1 and ok is True
    got = {(r.seg, r.bucket): (r.k_size, r.l_distinct) for r in classes.collect()}
    assert got == {("A", 0): (20, 2), ("B", 0): (10, 2)}
    with pytest.raises(ValueError, match="suppress"):
        l_diversify(df, ["seg"], "bal", "diag", l_min=3, max_level=4)
    _, lvl, ok3 = l_diversify(
        df, ["seg"], "bal", "diag", l_min=3, max_level=4, on_fail="max_level"
    )
    assert lvl == 4 and ok3 is False


def test_t_closeness_known_distributions(spark):
    """t-closeness (operators/privacy.py:t_closeness_classes; oracle
    twin r171): a class mirroring the global distribution scores 0; a
    fully homogeneous class scores scale*(N-g)/N via the closed form
    (1/2)*(|n*N - g*n| + sum_other g_v*n)/(n*N)."""
    from datalake_backend_spark.operators.privacy import (
        t_closeness_classes,
    )

    # segment A: 2 of each nation 0/1 (mirrors global 6/6)
    # segment B: 4 of nation 0 only (homogeneous)
    rows = (
        [("A", 0.0, 0)] * 2 + [("A", 0.0, 1)] * 2
        + [("B", 0.0, 0)] * 4 + [("B", 0.0, 1)] * 4
    )
    # adjust: global = A(2,2) + B(4,4) -> balanced; make B homogeneous
    rows = (
        [("A", 0.0, 0)] * 3 + [("A", 0.0, 1)] * 3
        + [("B", 0.0, 0)] * 6
    )
    df = spark.createDataFrame(rows, "seg string, bal double, nat int")
    out = {
        r.seg: r
        for r in t_closeness_classes(
            df, ["seg"], "bal", "nat", level=0
        ).collect()
    }
    # global: nat0=9, nat1=3, N=12
    # A (n=6, c0=3, c1=3): |3*12-9*6| + |3*12-3*6| = 18+18=36
    #   t = 1e6*36 // (2*6*12) = 250000  (TVD = 0.25)
    # B (n=6, c0=6, c1=0): |6*12-9*6| + |0-3*6| = 18+18=36 -> 250000
    assert out["A"].t_scaled == 250000
    assert out["B"].t_scaled == 250000 and out["B"].k_size == 6
    # exact mirror: one class holding everything -> t = 0
    one = spark.createDataFrame(
        [("X", 0.0, 0), ("X", 0.0, 1)], "seg string, bal double, nat int"
    )
    z = t_closeness_classes(one, ["seg"], "bal", "nat", level=0).collect()
    assert z[0].t_scaled == 0
