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
