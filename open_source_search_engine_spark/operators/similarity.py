"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — one broadcast of the (small) query set
against the corpus, JVM-vectorized with zip_with/aggregate, then the
standard partial+final TakeOrdered.  Scale path: LSH-bucketed ANN
(random-hyperplane signs → bucket join) so only same-bucket pairs are
scored; IVF-style coarse quantization falls out of the same shape with
k-means centroids as the bucketer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0).cast("double"),
                       lambda acc, v: acc + v)


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0).cast("double"),
                              lambda acc, v: acc + v * v))


def cosine_expr(a: Column, b: Column) -> Column:
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return dot_expr(ad, bd) / (norm_expr(ad) * norm_expr(bd))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     qid_col: str = "qid") -> DataFrame:
    """Exact top-k neighbours per query vector. queries: (qid, embedding).
    Broadcast the query side; score JVM-side; per-query window top-k."""
    q = F.broadcast(queries.select(F.col(qid_col),
                                   F.col(vec_col).alias("qvec")))
    scored = (corpus.crossJoin(q)
              .withColumn("cosine",
                          cosine_expr(F.col(vec_col), F.col("qvec"))))
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"),
                                            F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(qid_col, id_col, "cosine", "rank"))


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42):
    """Deterministic pseudo-random hyperplanes as array<double> literals
    (hash-derived, no RNG state)."""
    import numpy as np
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit LSH bucket id: bit b = (vec · plane_b) > 0."""
    bucket = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        sign = dot_expr(F.transform(vec, lambda x: x.cast("double")),
                        lit_plane) > 0
        bucket = bucket + F.when(sign, F.lit(1 << b).cast("long")) \
                           .otherwise(F.lit(0))
    return bucket


def kmeans_centroids(corpus: DataFrame, n_clusters: int = 16,
                     vec_col: str = "embedding", iters: int = 3,
                     seed: int = 42) -> list[list[float]]:
    """Distributed Lloyd's iterations: Arrow-batched assignment (NumPy
    matmul per batch), element-wise centroid update via posexplode +
    groupBy(cluster, dim).avg — centroids (k×dim, tiny) round-trip through
    the driver each iteration like any broadcast model state."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    first = corpus.select(vec_col).first()
    dim = len(first[0])
    rng = np.random.default_rng(seed)
    centroids = rng.standard_normal((n_clusters, dim))

    for _ in range(iters):
        C = centroids.copy()

        @pandas_udf(T.IntegerType())
        def assign(vecs):
            M = np.array(vecs.tolist(), dtype=np.float64)
            d = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            return pd.Series(d.argmin(axis=1).astype("int32"))

        assigned = corpus.withColumn("_c", assign(F.col(vec_col)))
        sums = (assigned
                .select("_c", F.posexplode(vec_col).alias("_d", "_v"))
                .groupBy("_c", "_d")
                .agg(F.avg("_v").alias("m"))
                .collect())
        for row in sums:
            centroids[row["_c"], row["_d"]] = row["m"]
    return centroids.tolist()


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             qid_col: str = "qid", n_clusters: int = 16, nprobe: int = 4,
             centroids: list[list[float]] | None = None,
             seed: int = 42) -> DataFrame:
    """IVF ANN: assign corpus to its nearest centroid (the inverted-file
    partition key), probe the ``nprobe`` nearest cells per query, score
    only those cells' vectors.  At scale the corpus assignment is a
    one-time materialized column and the search shuffles on cell id."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    if centroids is None:
        centroids = kmeans_centroids(corpus, n_clusters, vec_col,
                                     seed=seed)
    C = np.array(centroids, dtype=np.float64)

    @pandas_udf(T.IntegerType())
    def assign1(vecs):
        M = np.array(vecs.tolist(), dtype=np.float64)
        d = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d.argmin(axis=1).astype("int32"))

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_cells(vecs):
        M = np.array(vecs.tolist(), dtype=np.float64)
        d = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        order = np.argsort(d, axis=1)[:, :nprobe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    cells = corpus.withColumn("cell", assign1(F.col(vec_col)))
    q = (queries.select(qid_col, F.col(vec_col).alias("qvec"))
         .withColumn("cell", F.explode(probe_cells(F.col("qvec")))))
    scored = (cells.join(F.broadcast(q), "cell")
              .withColumn("cosine",
                          F.round(cosine_expr(F.col(vec_col),
                                              F.col("qvec")), 6)))
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(qid_col, id_col, "cosine", "rank"))


def lsh_ann_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 qid_col: str = "qid", n_planes: int = 8,
                 dim: int | None = None, seed: int = 42,
                 n_tables: int = 1, n_probes: int = 0) -> DataFrame:
    """Approximate top-k: only same-LSH-bucket candidates are scored.
    At 100 TB the bucket join replaces the cross join — shuffle keyed on
    the 2^n_planes bucket ids.

    ``n_tables`` > 1 unions candidates from that many INDEPENDENT
    hyperplane sets (standard multi-table LSH): recall grows
    1-(1-p^planes)^tables while each table's join stays bucket-local.

    ``n_probes`` = 1 additionally probes every bucket at Hamming
    distance 1 from the query's bucket (multi-probe LSH, Lv et al.
    VLDB'07): the QUERY side fans out to 1+n_planes bucket keys — the
    corpus stays single-bucket, so the join cost grows only with
    |queries|, not |corpus|.  One flipped sign bit is exactly the
    near-miss case that costs sign-LSH most of its recall.

    Candidates are deduped per (query, id) before the exact re-rank."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    q = queries.select(qid_col, F.col(vec_col).alias("qvec"))
    cand = None
    for t in range(max(1, n_tables)):
        planes = random_hyperplanes(dim, n_planes, seed + t * 1009)
        cb = corpus.withColumn(
            "bucket", lsh_bucket_expr(F.col(vec_col), planes))
        qb = q.withColumn("_b0", lsh_bucket_expr(F.col("qvec"), planes))
        if n_probes >= 1:
            probes = F.array(
                F.col("_b0"),
                *[F.col("_b0").bitwiseXOR(F.lit(1 << b).cast("long"))
                  for b in range(n_planes)])
            qb = qb.withColumn("bucket", F.explode(probes))
        else:
            qb = qb.withColumn("bucket", F.col("_b0"))
        qb = F.broadcast(qb.drop("_b0"))
        hits = cb.join(qb, "bucket").drop("bucket")
        cand = hits if cand is None else cand.unionByName(hits)
    cand = cand.dropDuplicates([qid_col, id_col])
    # rank on the RAW cosine (no rounding) so the ordering is identical
    # to an independent SQL restatement; callers stabilize for display
    scored = cand.withColumn(
        "cosine", cosine_expr(F.col(vec_col), F.col("qvec")))
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(qid_col, id_col, "cosine", "rank"))
