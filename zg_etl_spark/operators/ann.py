"""IVF approximate-nearest-neighbor over an embedding column.

The declared query surface carries the oracle-checkable variants (l8
brute force, l9 seed-centroid IVF, l14 vectorized-UDF); this module is
the PRODUCTION index path: a k-means coarse quantizer (pyspark.ml,
seeded/deterministic) whose assignment table is the persisted IVF index
— on a cluster, a bucketed table — and a search that probes only the
query's ``nprobe`` nearest centroid buckets before exact re-ranking.
K-means cluster ids are not cross-engine reproducible, so this path is
verified by RECALL against the exact brute-force top-k
(tests/test_ann_ivf.py) instead of a DuckDB value oracle.

Scale shape: index build is one ML fit over a sampled/bucketed table;
search is (queries × nprobe buckets) equi-join — candidate volume is
corpus_size * nprobe / k, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def build_ivf_index(embeddings: DataFrame, k: int = 4, seed: int = 42):
    """Fit the coarse quantizer and assign every vector to a bucket.

    Returns (centroids_df, assignment_df): `centroids` is broadcast-sized
    (k rows: bucket, centroid array); `assignment` is the index table
    (vec_id, bucket) a deployment persists bucketed-by-bucket.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = embeddings.select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )
    model = KMeans(k=k, seed=seed, maxIter=20).fit(vecs)
    assignment = model.transform(vecs).select(
        "vec_id", F.col("prediction").cast("int").alias("bucket")
    )
    spark = embeddings.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "bucket int, centroid array<double>",
    )
    return centroids, assignment


def _cos(a: str, b: str) -> str:
    dot = f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0 AS DOUBLE), (s, x) -> s + x)"
    na = f"sqrt(aggregate(zip_with({a}, {a}, (x, y) -> x * y), CAST(0 AS DOUBLE), (s, x) -> s + x))"
    nb = f"sqrt(aggregate(zip_with({b}, {b}, (x, y) -> x * y), CAST(0 AS DOUBLE), (s, x) -> s + x))"
    return f"({dot}) / ({na} * {nb})"


def ivf_search(
    embeddings: DataFrame,
    centroids: DataFrame,
    assignment: DataFrame,
    query_ids: list[int],
    top_k: int = 5,
    nprobe: int = 1,
) -> DataFrame:
    """Top-k cosine neighbors per query, probing ``nprobe`` buckets.

    Plan shape: query→centroid scoring is a broadcast nested loop over k
    rows (tiny); candidate fetch is an equi-join on bucket; exact cosine
    re-ranks only the probed candidates.
    """
    q = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("q_vec"),
    )
    # nprobe nearest centroids per query (k rows — broadcast)
    probed = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("c_sim", F.expr(_cos("q_vec", "centroid")))
        .withColumn(
            "c_rank",
            F.expr(
                "ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY c_sim DESC, bucket)"
            ),
        )
        .filter(F.col("c_rank") <= nprobe)
        .select("q_id", "q_vec", "bucket")
    )
    cands = probed.join(assignment, "bucket").filter(
        F.col("vec_id") != F.col("q_id")
    )
    scored = cands.join(
        embeddings.select(
            F.col("vec_id"), F.col("embedding").cast("array<double>").alias("c_vec")
        ),
        "vec_id",
    ).withColumn("cosine", F.round(F.expr(_cos("q_vec", "c_vec")), 4))
    return (
        scored.withColumn(
            "rank",
            F.expr(
                "CAST(ROW_NUMBER() OVER (PARTITION BY q_id "
                "ORDER BY cosine DESC, vec_id) AS BIGINT)"
            ),
        )
        .filter(F.col("rank") <= top_k)
        .select("q_id", F.col("vec_id").alias("cand_id"), "cosine", "rank")
    )
