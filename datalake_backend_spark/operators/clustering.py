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


def grid_density_clusters(
    df: DataFrame,
    x_col: str,
    y_col: str,
    cell: int,
    min_pts: int,
    max_iter: int = 20,
) -> DataFrame:
    """Density-based spatial clustering on a grid (the GriDBSCAN
    family's distributed core): bucket points into ``cell``-wide
    integer grid cells, keep cells holding ≥ ``min_pts`` points
    (density filter), connect dense cells that touch in the
    8-neighborhood, and label connected components — clusters emerge
    without choosing k, and sparse cells drop as noise. Deterministic
    end to end: cluster id = the component's minimum encoded cell id.

    Scale shape: the density filter is one hash aggregate (points
    never pairwise-compare — the cell histogram replaces DBSCAN's
    ε-neighbor probes); adjacency is a self-equi-join of the DENSE
    cell table against its 9 neighbor offsets (dense cells ≪ points);
    components reuse ``datapipe.dedup.cluster_near_dups`` (min-label
    propagation with the large-star/small-star fallback, O(log²)
    rounds). Returns one row per dense cell:
    ``(cx, cy, n_points, cluster_id)``.

    Coordinates must be non-negative integers (the encoded cell id
    packs cx·2²¹ + cy; 2M cells per axis — raise ``cell`` before a
    coordinate overflows that)."""
    if cell < 1 or min_pts < 1:
        raise ValueError("cell and min_pts must be >= 1")
    dense = (
        df.select(
            F.expr(f"{x_col} div {cell}").alias("cx"),
            F.expr(f"{y_col} div {cell}").alias("cy"),
        )
        .groupBy("cx", "cy")
        .agg(F.count("*").alias("n_points"))
        .where(F.col("n_points") >= min_pts)
    )
    enc = (F.col("cx") * F.lit(1 << 21) + F.col("cy")).alias("cid")
    nodes = dense.select(enc, "cx", "cy", "n_points")
    neigh = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    probes = (
        nodes.withColumn("_dx", F.explode(neigh))
        .withColumn("_dy", F.explode(neigh))
        .select(
            F.col("cid").alias("id_a"),
            (F.col("cx") + F.col("_dx")).alias("cx"),
            (F.col("cy") + F.col("_dy")).alias("cy"),
        )
    )
    edges = probes.join(
        nodes.select(F.col("cid").alias("id_b"), "cx", "cy"), ["cx", "cy"]
    ).where(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
    from datalake_backend_spark.datapipe.dedup import cluster_near_dups

    labels = cluster_near_dups(edges, "id_a", "id_b", max_iter=max_iter)
    return (
        nodes.join(labels, nodes.cid == labels.node, "left")
        .select(
            "cx",
            "cy",
            "n_points",
            # singleton dense cells never appear in an edge — they are
            # their own cluster
            F.coalesce(F.col("cluster_id"), F.col("cid")).alias(
                "cluster_id"
            ),
        )
    )
