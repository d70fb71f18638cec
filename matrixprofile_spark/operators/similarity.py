"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k of query vectors against the
  corpus. The dot product is a sequential F.aggregate fold over
  zip_with products — JVM-side, deterministic summation order (matters
  for bit-stable results across partitionings).
- ivf_topk: IVF-style two-stage ANN: per-cell centroids (posexplode +
  per-dimension mean), route each query to its nprobe closest cells,
  search only those cells. The centroid table is tiny → broadcast; the
  cell search is an equi-join on cell id — no cross join anywhere.
- hyperplane_lsh_buckets: sign-sketch bucketing (random-hyperplane LSH)
  with deterministic ±1 hyperplanes derived from md5(plane, dim) — a
  scale path where even nprobe cells are too big: candidates share a
  bucket key.

At 100 TB: brute force is the per-query-batch baseline (one broadcast
of the query block, map-side cosine, TakeOrderedAndProject); IVF cuts
the scanned fraction to nprobe/n_cells; both avoid shuffling the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cos(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + (v * v).cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + (v * v).cast("double")))
    return dot / (na * nb)


def brute_force_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """queries(query_id, qvec) × corpus → top-k by cosine.

    The query block is broadcast; ranking is deterministic
    (cosine desc, neighbor id asc); self-matches excluded."""
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
    )
    crossed = corpus.join(F.broadcast(queries)).where(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = crossed.select(
        "query_id", "neighbor_id", _cos(F.col("qvec"), F.col("nvec")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


def cell_centroids(
    embeddings: DataFrame, cell_col: str = "label", vec_col: str = "embedding",
    sample_mille: int = 1000, id_col: str = "vec_id",
) -> DataFrame:
    """Per-cell per-dimension mean → centroid arrays (IVF codebook).

    ``sample_mille`` (‰ of rows kept, deterministic via hash(id) — no
    RNG, stable under repartitioning) bounds the codebook build's
    corpus×dims explode at scale: centroids are statistical summaries,
    so a 1-5% sample of a 100 TB corpus gives the same routing quality
    while the build reads 20-100× less. Default 1000 (=all rows) keeps
    the small-scale oracle exact."""
    src = embeddings
    if sample_mille < 1000:
        src = src.where(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(1000)) < sample_mille
        )
        # a small or skewed cell can lose ALL rows to sampling, which
        # would silently make its vectors unreachable by ivf routing —
        # rescue such cells with their unsampled rows (cells are few, so
        # the distinct/anti-join sides are tiny and broadcastable)
        missing = (
            embeddings.select(cell_col).distinct()
            .join(src.select(cell_col).distinct(), cell_col, "left_anti")
        )
        src = src.unionByName(
            embeddings.join(F.broadcast(missing), cell_col, "left_semi")
        )
    exploded = src.select(
        F.col(cell_col).alias("cell"), F.posexplode(vec_col).alias("pos", "v")
    )
    means = exploded.groupBy("cell", "pos").agg(
        (F.sum(F.col("v").cast("double")) / F.count("v")).alias("m")
    )
    return means.groupBy("cell").agg(
        F.expr("transform(array_sort(collect_list(struct(pos, m))), x -> x.m)")
        .alias("centroid")
    )


def _argmin_cell(vec, codebook: list[tuple[int, list[float]]]):
    """cell id of the nearest (squared-L2) codebook centroid, as a single
    map-side column expression. The codebook is embedded as literals —
    fine to ~10⁴ cell×dim products; past that, assignment becomes the
    same broadcast equi-join shape `ivf_topk` uses for query routing.
    Ties break to the smallest cell id (struct array_min orders by
    (dist, cell)); the distance fold accumulates in index order, so the
    value is bit-deterministic."""
    cands = F.array(*[
        F.struct(
            F.aggregate(
                F.zip_with(
                    vec, F.array(*[F.lit(float(v)) for v in cent]),
                    lambda x, c: ((x.cast("double") - c)
                                  * (x.cast("double") - c)),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("d"),
            F.lit(int(cell)).alias("cell"),
        )
        for cell, cent in codebook
    ])
    return F.array_min(cands)["cell"]


def learn_codebook(
    embeddings: DataFrame, n_cells: int = 8, iters: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
    sample_mille: int = 1000,
) -> list[tuple[int, list[float]]]:
    """Learn an IVF codebook with deterministic hash-seeded Lloyd
    iterations — no pre-existing cell/label column required.

    Seeds are the `n_cells` rows ranked first by (md5(id-as-string), id)
    — an ordering any engine reproduces, no RNG. Each iteration assigns
    every vector to its nearest centroid map-side (`_argmin_cell`, zero
    shuffle) and re-centroids with a per-dimension mean (the one shuffle
    per iteration, bounded by `sample_mille` hash-sampling at scale). A
    cell that loses every member keeps its previous centroid.

    Driver-side state is only the codebook itself (n_cells×dims floats,
    KBs) — justified: it is broadcast back as literals each iteration.
    """
    src = embeddings.select(F.col(id_col).alias("id"),
                            F.col(vec_col).alias("vec"))
    if sample_mille < 1000:
        src = src.where(
            F.pmod(F.xxhash64(F.col("id")), F.lit(1000)) < sample_mille
        )
    seeds = (
        src.orderBy(F.md5(F.col("id").cast("string")), F.col("id"))
        .limit(n_cells).collect()
    )
    codebook = [(i, [float(v) for v in row["vec"]])
                for i, row in enumerate(seeds)]
    for _ in range(iters):
        assigned = src.withColumn("cell", _argmin_cell(F.col("vec"), codebook))
        rows = cell_centroids(assigned, cell_col="cell", vec_col="vec",
                              id_col="id").collect()
        got = {int(r["cell"]): [float(v) for v in r["centroid"]] for r in rows}
        codebook = [(c, got.get(c, cent)) for c, cent in codebook]
    return codebook


def ivf_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5, nprobe: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding", cell_col: str = "label",
    codebook_sample_mille: int = 1000,
    codebook: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """Route each query to its nprobe nearest cell centroids, then exact
    cosine inside those cells only.

    Two cell sources: a pre-partitioned `cell_col` (the fast case when
    the table already carries one), or a learned `codebook` (from
    `learn_codebook`) — then every corpus row is assigned map-side by
    nearest-centroid, no label column needed."""
    if codebook is not None:
        spark = embeddings.sparkSession
        embeddings = embeddings.withColumn(
            "__cell", _argmin_cell(F.col(vec_col), codebook)
        )
        cell_col = "__cell"
        cents = spark.createDataFrame(
            [(c, v) for c, v in codebook], "cell int, centroid array<double>"
        )
    else:
        cents = cell_centroids(embeddings, cell_col, vec_col,
                               sample_mille=codebook_sample_mille,
                               id_col=id_col)
    routed = queries.join(F.broadcast(cents)).select(
        "query_id", "qvec", "cell", _cos(F.col("qvec"), F.col("centroid")).alias("ccos")
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("cell"))
    probes = (
        routed.withColumn("crank", F.row_number().over(wr))
        .where(F.col("crank") <= nprobe)
        .select("query_id", "qvec", "cell")
    )
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        F.col(cell_col).alias("cell"),
    )
    scored = corpus.join(F.broadcast(probes), "cell").where(
        F.col("neighbor_id") != F.col("query_id")
    ).select("query_id", "neighbor_id", _cos(F.col("qvec"), F.col("nvec")).alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.9, planes: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: hyperplane-LSH buckets
    generate the candidates (intra-bucket equi-join — never all-pairs),
    exact cosine filters them to `threshold`.

    At 100 TB this is the vector twin of MinHash-LSH dedup: the shuffle
    key is the bucket (uniform by construction), candidate volume is
    bounded by bucket sizes, and recall is tunable via `planes` (fewer
    planes → bigger buckets → higher recall, more scoring work)."""
    dims = int(
        embeddings.select(F.size(vec_col).alias("d")).limit(1).first()["d"]
    )
    vecs = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        _bucket_expr(F.col(vec_col), planes, dims).alias("bucket"),
    )
    a = vecs.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"),
                    "bucket")
    b = vecs.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"),
                    "bucket")
    cand = a.join(b, "bucket").where(F.col("id_a") < F.col("id_b"))
    scored = cand.select(
        "id_a", "id_b", _cos(F.col("vec_a"), F.col("vec_b")).alias("cos")
    )
    return scored.where(F.col("cos") >= threshold)


def _plane_sign(plane: int, dim: int) -> float:
    """±1 from md5("plane,dim") parity — identical to the SQL twin
    `conv(substring(md5(concat_ws(',', p, d)), 1, 15), 16, 10) % 2`."""
    import hashlib

    h = hashlib.md5(f"{plane},{dim}".encode()).hexdigest()
    return 1.0 if int(h[:15], 16) % 2 == 0 else -1.0


def hyperplane_lsh_buckets(
    embeddings: DataFrame, planes: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
    dims: int | None = None,
) -> DataFrame:
    """Sign-sketch bucket per vector: bit p = sign(Σ_d s(p,d)·v_d) with
    s(p,d) = ±1 from md5(p||','||d) parity — deterministic, no RNG.

    The ±1 plane matrix is materialized driver-side (planes×dims
    constants, a few KiB) and folded per row with zip_with/aggregate —
    a pure map-side projection with NO shuffle, vs the naive
    posexplode + double-groupBy formulation that amplifies every
    vector into dims×planes rows through two exchanges. The fold
    accumulates in index order, so the dot is bit-deterministic."""
    if dims is None:
        dims = int(
            embeddings.select(F.size(vec_col).alias("d")).limit(1).first()["d"]
        )
    return embeddings.select(
        F.col(id_col).alias("id"),
        _bucket_expr(F.col(vec_col), planes, dims).alias("bucket"),
    )


def _bucket_expr(vec, planes: int, dims: int):
    """The sign-sketch bucket as a single map-side column expression."""
    bucket = F.lit(0).cast("bigint")
    for p in range(planes):
        s_lit = F.array(*[F.lit(_plane_sign(p, d)) for d in range(dims)])
        dot = F.aggregate(
            F.zip_with(vec, s_lit, lambda v, s: (v * s).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0)).cast(
            "bigint"
        )
    return bucket
