"""KMeans clustering of detection centers (SURVEY §2.6 A15).

The reference's common-object splitter optionally k-means-clusters bbox
centers with sklearn on driver-collected points
(``split_common_data/split_common.py:71-80``). Here it's
``pyspark.ml.clustering.KMeans`` over a features vector column —
distributed Lloyd iterations, deterministic via fixed seed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans_clusters(
    df: DataFrame,
    feature_cols: list[str],
    k: int = 3,
    seed: int = 42,
    out_col: str = "cluster",
) -> DataFrame:
    """Assign each row to one of ``k`` clusters over ``feature_cols``.

    Returns ``df`` + cluster id column. Import is local so the engine
    works without pyspark.ml on minimal deployments.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import VectorAssembler

    assembler = VectorAssembler(inputCols=feature_cols, outputCol="_features")
    assembled = assembler.transform(df)
    model = KMeans(k=k, seed=seed, featuresCol="_features", predictionCol=out_col).fit(
        assembled
    )
    return model.transform(assembled).drop("_features")


def cluster_summary(
    clustered: DataFrame, feature_cols: list[str], cluster_col: str = "cluster"
) -> DataFrame:
    """Per-cluster counts + centroids (the splitter's cluster report)."""
    aggs = [F.count("*").alias("n")]
    for c in feature_cols:
        aggs.append(F.avg(c).alias(f"centroid_{c}"))
    return clustered.groupBy(cluster_col).agg(*aggs)
