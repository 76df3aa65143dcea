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
