"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline and an IVF-style
cluster-pruned variant as the scale path.  Dot products run as Catalyst
higher-order functions (zip_with + aggregate) — JVM-side, no Python.

At 100 TB / 10^9 vectors: brute force is a single scan + global top-k
(TakeOrderedAndProject — no full sort); IVF prunes the scan to one
centroid bucket, and the centroid assignment job is a broadcast join
(centroid table is tiny) + scan-local argmax, shuffling nothing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def l2(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2(a) * l2(b))


def cosine_topk(emb: DataFrame, query_id: int, k: int = 10,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Brute-force cosine top-k against the vector of `query_id`.

    The query vector joins in as a broadcast single-row dim table —
    no collect, no driver round-trip; Catalyst folds it into the scan.
    Returns (vec_id, cos_sim) sorted desc, ties broken by id asc.
    """
    q = emb.filter(F.col(id_col) == query_id) \
        .select(F.col(vec_col).cast("array<double>").alias("qvec"))
    sim = (emb.filter(F.col(id_col) != query_id)
           .crossJoin(F.broadcast(q))
           .select(F.col(id_col),
                   F.round(cosine(F.col(vec_col).cast("array<double>"),
                                  F.col("qvec")), 6).alias("cos_sim")))
    return sim.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def assign_ivf_clusters(emb: DataFrame, n_centroids: int = 8,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """IVF assignment with deterministic 'trained' centroids: the vectors
    with id 0..n_centroids-1 act as the codebook (a seeded k-means init;
    good enough to demonstrate the partition-pruned search path).

    Returns (vec_id, cluster).  Broadcast join + scan-local argmax.
    """
    cents = (emb.filter(F.col(id_col) < n_centroids)
             .select(F.col(id_col).cast("int").alias("c_id"),
                     F.col(vec_col).cast("array<double>").alias("c_vec")))
    packed = cents.groupBy().agg(
        F.sort_array(F.collect_list(F.struct("c_id", "c_vec")))
        .alias("cents"))
    scored = emb.crossJoin(F.broadcast(packed)).select(
        F.col(id_col),
        F.transform(
            F.col("cents"),
            lambda c: F.round(cosine(F.col(vec_col).cast("array<double>"),
                                     c["c_vec"]), 9)).alias("sims"))
    # argmax with lowest-id tie-break: array_position of the max
    best = F.array_position(F.col("sims"), F.array_max(F.col("sims"))) - 1
    return scored.select(F.col(id_col), best.cast("int").alias("cluster"))


def ivf_topk(emb: DataFrame, query_id: int, k: int = 10,
             n_centroids: int = 8, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Cluster-pruned ANN: search only the query's IVF cluster.

    At scale the assignment is precomputed and the table is partitioned
    by cluster -> partition pruning turns this into a 1/n_centroids scan.
    """
    assign = assign_ivf_clusters(emb, n_centroids, id_col, vec_col)
    with_cluster = emb.join(assign, id_col)
    q_cluster = assign.filter(F.col(id_col) == query_id) \
        .select(F.col("cluster").alias("q_cluster"))
    pruned = with_cluster.join(F.broadcast(q_cluster),
                               F.col("cluster") == F.col("q_cluster")) \
        .drop("q_cluster")
    return cosine_topk(pruned, query_id, k, id_col, vec_col)
