"""Similarity search over an embedding column (array<float>).

- :func:`cosine_topk` — brute-force exact top-k: one scan, per-partition
  heap top-k (TakeOrderedAndProject), k-row driver merge. The correctness
  baseline; also the right plan when the query set is small.
- :func:`ivf_topk` — IVF-style scale path: partition vectors by nearest
  centroid (computed once), probe only the closest `nprobe` centroids per
  query. At 100 TB this turns full scans into `nprobe/nlist` partial scans,
  with the centroid assignment stored as a partition column so partition
  pruning does the skipping.

All vector math is `zip_with`/`aggregate` Column expressions (JVM). The
dot product of float32 inputs is computed in float64 after an explicit cast
— deterministic and oracle-comparable (DuckDB list_* functions are float64).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _query_lit(query_vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in query_vec])


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine (desc), id asc tiebreak. Returns (id, cosine)."""
    q = _query_lit(query_vec)
    v = _as_double(F.col(vec_col))
    scored = emb.select(
        F.col(id_col),
        F.round(cosine(v, q), 4).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def _assign(emb: DataFrame, cents: list[list[float]], vec_col: str) -> DataFrame:
    """Nearest-centroid (max cosine) assignment as a `list_id` column.

    The row vector and its norm are hoisted into their own columns so the
    nlist-wide similarity array computes them ONCE per row (Catalyst keeps
    multiply-referenced non-cheap projections materialized); centroid norms
    are plain Python floats. Naively instantiating cosine() per centroid
    re-derived norm(v) nlist times — half the assignment FLOPs for nothing.
    """
    import math

    cnorms = [math.sqrt(sum(x * x for x in c)) or 1.0 for c in cents]
    # the centroid table rides as ONE nested-array literal (and one norm
    # array literal): unrolling nlist × dim scalar literals instead builds a
    # 1000+-node expression tree whose analysis + codegen dominates the op's
    # wall at sandbox scale — and grows with nlist
    sims = F.zip_with(
        F.lit([[float(x) for x in c] for c in cents]),
        F.lit(cnorms),
        lambda c, cn: dot(F.col("_v"), c) / (F.col("_vn") * cn),
    )
    list_id = F.expr("array_position(sims_arr, array_max(sims_arr)) - 1")
    return (
        emb.withColumn("_v", _as_double(F.col(vec_col)))
        .withColumn("_vn", norm(F.col("_v")))
        .withColumn("sims_arr", sims)
        .withColumn("list_id", list_id.cast("int"))
        .drop("sims_arr", "_v", "_vn")
    )


def build_ivf(
    emb: DataFrame,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 2,
) -> tuple[DataFrame, list[list[float]]]:
    """Assign every vector to its nearest of `nlist` k-means centroids.

    Seeding is deterministic (first `nlist` vectors by id), then
    ``kmeans_iters`` Lloyd iterations refine: assign → per-list mean.
    The mean is computed distributed — posexplode to (list_id, pos, val),
    then groupBy(list_id, pos).avg, a map-side-combinable partial agg that
    reduces n×dim rows to nlist×dim before the shuffle; only the nlist×dim
    centroid table is ever collected. Empty lists keep their previous
    centroid. Deterministic end to end (no RNG).

    ``emb`` is CACHED for the build (VERDICT r02 item 5): each Lloyd
    iteration and the final assignment re-reference it — without the cache
    the input scan + nlist-wide cosine expression rebuilt kmeans_iters+1
    times (measured ~2× of the op's cost at sf0.1). The seeding collect
    doubles as the cache materialization barrier. The cache is left warm
    for the returned `assigned` plan (the caller's probe reads it); Spark
    evicts it LRU-style — at the 100 TB design point the assignment is a
    one-time index build persisted with `list_id` as a partition column,
    not an in-memory cache.
    Returns (assigned_df with `list_id`, centroids).
    """
    emb = emb.cache()
    cents = [
        [float(x) for x in r[vec_col]]
        for r in emb.orderBy(id_col).limit(nlist).collect()
    ]
    dim = len(cents[0]) if cents else 0
    for _ in range(kmeans_iters):
        assigned = _assign(emb, cents, vec_col)
        means = (
            assigned.select("list_id", F.posexplode(_as_double(F.col(vec_col))).alias("pos", "val"))
            .groupBy("list_id", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        new_cents = [list(c) for c in cents]
        by_list: dict[int, list[float]] = {}
        for r in means:
            by_list.setdefault(r["list_id"], [0.0] * dim)[r["pos"]] = r["m"]
        for li, vec in by_list.items():
            new_cents[li] = vec
        cents = new_cents
    return _assign(emb, cents, vec_col), cents


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score centroids against the query on the driver
    (nlist is tiny), scan only the `nprobe` best lists. With `list_id` as a
    partition column this is pure partition pruning at scale."""
    import math

    def py_cos(a: list[float], b: list[float]) -> float:
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    probe = sorted(range(len(centroids)), key=lambda i: -py_cos(centroids[i], query_vec))[:nprobe]
    q = _query_lit(query_vec)
    v = _as_double(F.col(vec_col))
    return (
        assigned.where(F.col("list_id").isin(probe))
        .select(F.col(id_col), F.round(cosine(v, q), 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )
