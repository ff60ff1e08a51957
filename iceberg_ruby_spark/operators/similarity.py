"""Similarity search over embedding columns (array<float>).

Absent from the reference (SURVEY.md §2 Tier C).  Two tiers:

- :func:`cosine_topk` — brute-force exact top-k.  The query set is
  broadcast; the corpus is scanned exactly once; the dot product is a
  JVM-side ``zip_with`` + ``aggregate`` (no Python per row).  This is the
  correctness baseline and is the right plan whenever
  |queries| × |corpus| work fits the cluster (corpus read dominates).
- :func:`lsh_ann_topk` — random-hyperplane LSH: bucket by sign-bit
  signature, probe the query's bucket(s), exact re-rank inside.  At 100 TB
  this touches only matching buckets instead of the full corpus per query.
  Hyperplanes are derived deterministically from a seed so plans are
  reproducible run to run.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from iceberg_ruby_spark._lazy import LazyModule
from iceberg_ruby_spark._localdf import small_local_df
from iceberg_ruby_spark.errors import InvalidDataError

# pandas resolves on first use (~0.3 s import): only the pandas-UDF paths
# (IVF assign/probe, PQ encode/ADC) touch it; workers unpickling the
# JVM-only operators here skip the import.  The proxy satisfies the
# ``pd.Series`` annotations pandas_udf evaluates at decoration time.
pd = LazyModule("pandas", __name__, "pd")


def _dot(a, b):
    """JVM-side dot product of two array columns (double accumulation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def vector_norms(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Append an ``l2_norm`` column (JVM-side)."""
    return df.withColumn("l2_norm", _norm(F.col(vec_col)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors (excluding self-matches by id).

    Output: (query_id, vec_id, cosine, rank).  Ordering is deterministic —
    ties in (rounded) cosine break on corpus id.

    Plan: broadcast(queries) × corpus → one pass over the corpus, ranking
    via a per-query window.  At 1000 executors the corpus stays partitioned;
    only the (small) query set is replicated."""
    query_id_col = query_id_col or id_col
    # norms precomputed per ROW (value-identical; each per-pair _norm was
    # a full interpreted fold repeated |queries| times per corpus row)
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    ).withColumn("__qn", _norm(F.col("__qv")))
    c = corpus.select(
        F.col(id_col), F.col(vec_col).alias("__cv")
    ).withColumn("__cn", _norm(F.col("__cv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("__qv"), F.col("__cv"))
                / (F.col("__qn") * F.col("__cn")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (seeded; no runtime
    randomness so results are stable across runs/retries)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    planes /= np.linalg.norm(planes, axis=1, keepdims=True)
    return planes.tolist()


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Sign-bit LSH bucket id (long) for an array column: bit i is the sign
    of the projection onto plane i — all JVM-side arithmetic."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = _dot(vec_col, F.array(*[F.lit(float(x)) for x in p]))
        bucket = bucket + F.when(
            proj >= 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    n_probe_bits: int = 1,
    n_tables: int = 1,
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane LSH bucketing + exact
    re-rank within the probed buckets.

    Scale path: the corpus is bucketed once (can be persisted /
    hidden-partitioned by bucket); each query joins only its probed
    buckets — a hash-equality join on a long key instead of a full scan
    per query.  Recall is tunable three ways, in increasing cost order:

    - ``n_probe_bits`` (multi-probe): each query also probes every bucket
      within that Hamming distance of its own signature.  Multiplies only
      the QUERY-side row count (×(1+n_planes) at 1 bit); the corpus side
      — the 100 TB side — is never expanded.
    - ``n_planes``: fewer planes → bigger buckets → more candidates.
    - ``n_tables``: L independent plane sets; a pair is a candidate if it
      collides in ANY table — recall 1-(1-p^m)^L vs p^m for one table.
      This is the knob that works when true neighbors sit at moderate
      cosine (p per plane ≈ 0.6 at cos≈0.3, so any single table's recall
      decays geometrically in m).  Cost: the corpus index holds L entries
      per vector (linear, the standard LSH memory/recall trade) and
      candidates need one dedup before re-rank.

    The bucket key packs the table id into the high bits of the sign
    signature, so multi-table remains ONE long-key equality join."""
    if n_probe_bits > 2:
        raise ValueError("n_probe_bits > 2 explodes the probe fan-out; use fewer planes instead")
    query_id_col = query_id_col or id_col
    table_planes = [
        _hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)
    ]

    def probe_buckets(vec, want_probes: bool):
        out = []
        for t, planes in enumerate(table_planes):
            b0 = lsh_bucket(vec, planes) + F.lit(t << n_planes).cast("long")
            out.append(b0)
            if want_probes and n_probe_bits >= 1:
                out += [
                    b0.bitwiseXOR(F.lit(1 << i).cast("long"))
                    for i in range(n_planes)
                ]
            if want_probes and n_probe_bits >= 2:
                out += [
                    b0.bitwiseXOR(F.lit((1 << i) | (1 << j)).cast("long"))
                    for i in range(n_planes)
                    for j in range(i + 1, n_planes)
                ]
        return F.explode(F.array(*out))

    c = (
        corpus.select(F.col(id_col), F.col(vec_col).alias("__cv"))
        .withColumn("__cn", _norm(F.col("__cv")))
        .withColumn("__bucket", probe_buckets(F.col("__cv"), want_probes=False))
    )
    q = (
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
        )
        .withColumn("__qn", _norm(F.col("__qv")))
        .withColumn("__bucket", probe_buckets(F.col("__qv"), want_probes=True))
    )
    # a pair can collide in several tables — dedup candidates before the
    # exact re-rank so each (query, id) is scored once
    scored = (
        c.join(F.broadcast(q), "__bucket")
        .filter(F.col(id_col) != F.col("query_id"))
        .dropDuplicates(["query_id", id_col])
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("__qv"), F.col("__cv"))
                / (F.col("__qn") * F.col("__cn")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )


def _train_centroids(
    corpus: DataFrame,
    vec_col: str,
    n_cells: int,
    sample_size: int = 4096,
    iters: int = 10,
    seed: int = 42,
    id_col: Optional[str] = None,
):
    """Coarse quantizer: kmeans++-seeded numpy Lloyd iterations on a
    deterministic sample.

    The sample (≤4096 vectors) is the ONLY data that reaches the driver —
    training cost is independent of corpus size; assignment below is
    distributed.  kmeans++ seeding (D²-weighted farthest-point sampling)
    spreads the initial centroids instead of clumping them where the
    sample happens to be dense — measured +6–8 points of recall@10 at the
    driver parameters on the fixture corpora vs uniform-random init
    (0.56→0.64 at sf0.001, 0.62→0.68 at sf0.01).

    Sampling is deterministic under ANY partitioning: with ``id_col`` the
    sample is the ``sample_size`` smallest ids of a seeded xxhash64 of the
    id — a uniform pseudo-random draw whose members don't depend on
    partition enumeration order (a bare ``limit`` takes whichever tasks
    answer first: stable on one local file, arbitrary on a multi-file
    100 TB table).  The TakeOrderedAndProject this compiles to holds only
    ``sample_size`` rows per partition, then merges — no full sort, no
    full shuffle.  Without ``id_col`` (no stable key available) it falls
    back to the order-dependent ``limit``."""
    x = _bounded_sample(corpus, vec_col, sample_size, seed, id_col)
    if len(x) == 0:
        raise ValueError("cannot train IVF on an empty corpus")
    return _kmeans_np(x, n_cells, seed=seed, iters=iters)


def _bounded_sample(corpus, vec_col, sample_size, seed, id_col):
    """Deterministic ≤``sample_size`` vector sample as a numpy array —
    partition-order-independent when ``id_col`` is given (seeded-xxhash64
    smallest ids via TakeOrderedAndProject; see _train_centroids doc)."""
    import numpy as np

    if id_col is not None:
        sample = corpus.select(F.col(vec_col), F.col(id_col).alias("__id"))
        sample = (
            sample.orderBy(
                F.xxhash64(F.col("__id"), F.lit(seed)).asc(), F.col("__id").asc()
            )
            .limit(sample_size)
            .select(vec_col)
        )
        rows = sample.collect()
    else:
        rows = corpus.select(vec_col).limit(sample_size).collect()
    return np.asarray([r[0] for r in rows], dtype=np.float64)


def _kmeans_sub(args):
    """Module-level worker for the forked sub-quantizer pool — must be
    importable so ``ProcessPoolExecutor`` can pickle it by reference."""
    x_sub, k, seed = args
    return _kmeans_np(x_sub, k, seed=seed)


def _train_subcodebooks(x, m: int, dsub: int, n_codes: int, seed: int):
    """Train PQ's ``m`` INDEPENDENT sub-quantizers (disjoint column
    slices, disjoint seeds ``seed+j``) — in parallel via a fork-based
    process pool when the work is big enough to amortize the pool.

    Results are BIT-IDENTICAL to the sequential loop: each training is a
    self-contained deterministic computation (own ``RandomState(seed+j)``,
    1-thread BLAS pinned process-wide by the package ``__init__``, fork
    children inherit both), so process isolation changes no float op —
    pinned by tests/test_ground_truth.py.  A THREAD pool was measured
    and rejected earlier this round (GIL-bound Lloyd scatter: 8 threads
    ran 1.8× slower); fork sidesteps the GIL and the children inherit
    the already-imported numpy for free.  Measured IN A LIVE DRIVER at
    the bench shape (n=2000, d=64, m=8, k=512): 1.72 s sequential →
    0.97 s pooled (first pool of the process) / 0.76 s after.  IPC is
    trivial — each task ships one (n, dsub) float64 slice out (~128 KB
    at bench shape) and one (k, dsub) codebook back.

    The work gate keeps tiny trainings (unit tests, toy codebooks)
    sequential: pool spawn costs ~0.1-0.3 s, so below ~4M proxy units
    (≈0.5 s of sequential training) the loop wins.  ``m == 1`` has no
    parallelism.  Any pool failure (no fork on the platform, exhausted
    pids) falls back to the identical sequential computation."""
    jobs = [(x[:, j * dsub : (j + 1) * dsub], n_codes, seed + j) for j in range(m)]
    work_proxy = m * min(n_codes, len(x)) * len(x) * dsub
    procs = os.environ.get("SPARK_GRAFT_PQ_TRAIN_PROCS")
    max_procs = int(procs) if procs else min(m, os.cpu_count() or 1)
    if m < 2 or max_procs < 2 or work_proxy < 4_000_000:
        return [_kmeans_sub(j) for j in jobs]
    try:
        import multiprocessing as mp
        from concurrent.futures import ProcessPoolExecutor

        ctx = mp.get_context("fork")  # children inherit loaded numpy
        with ProcessPoolExecutor(max_workers=max_procs, mp_context=ctx) as ex:
            return list(ex.map(_kmeans_sub, jobs))
    except Exception:
        return [_kmeans_sub(j) for j in jobs]


def _kmeans_np(x, k: int, seed: int = 42, iters: int = 10):
    """kmeans++-seeded Lloyd iterations on an in-memory sample — the
    training core shared by the IVF coarse quantizer and the PQ
    sub-quantizers."""
    import numpy as np

    k = min(k, len(x))
    rng = np.random.RandomState(seed)
    # kmeans++ seeding.  The distance update uses the same matmul
    # identity as the Lloyd loop below: ||x−c||² = ||x||² − 2x·c + ||c||²
    # is ONE BLAS matvec pass over (n, d) instead of the three ufunc
    # passes (subtract, square, row-sum) the broadcast form costs per
    # seeding step — and there are k−1 steps, which made seeding (not
    # Lloyd) the dominant cost of a 256-code sub-quantizer training.
    # Clamp at 0: the matmul form can go −ε on a point equal to the
    # centroid, and rng.choice requires non-negative weights.  Centroid
    # VALUES can move in the last float bit vs the old form; every
    # consumer is insensitive by construction (exact-regime PQ/IVF
    # oracles are codebook-value-free, recall floors have headroom).
    centroids = np.empty((k, x.shape[1]), dtype=np.float64)
    centroids[0] = x[rng.randint(len(x))]
    xsq = (x * x).sum(axis=1)
    c0 = centroids[0]
    d2 = np.maximum(xsq - 2.0 * (x @ c0) + c0 @ c0, 0.0)
    for c in range(1, k):
        total = d2.sum()
        if total <= 0:
            centroids[c:] = x[rng.choice(len(x), size=k - c)]
            break
        # exact inline of rng.choice(len(x), p=probs): cumsum → normalize
        # → one random_sample → searchsorted(side='right') is precisely
        # numpy's internal sampling path, so the draws are BIT-IDENTICAL
        # (same RNG stream, same float ops) — it just skips choice()'s
        # per-call O(n) probability validation, which profiled at ~40 µs
        # × (k−1) calls × m sub-quantizers in a PQ build
        cdf = (d2 / total).cumsum()
        cdf /= cdf[-1]
        centroids[c] = x[cdf.searchsorted(rng.random_sample(), side="right")]
        cc = centroids[c]
        d2 = np.minimum(
            d2, np.maximum(xsq - 2.0 * (x @ cc) + cc @ cc, 0.0)
        )
    for _ in range(iters):
        # argmin ||x-c||² needs only ||c||² - 2x·c — the matmul form; the
        # broadcast (n, k, d) difference array it replaces allocated
        # ~n·k·d·8 bytes PER ITERATION (134 MB at the PQ defaults) and
        # made training the dominant cost of the whole index build
        d = (centroids**2).sum(axis=1)[None, :] - 2.0 * (x @ centroids.T)
        assign = d.argmin(axis=1)
        sums = np.zeros_like(centroids)
        np.add.at(sums, assign, x)
        counts = np.bincount(assign, minlength=k).astype(np.float64)
        nz = counts > 0
        centroids[nz] = sums[nz] / counts[nz, None]
    return centroids


def _cell_assigner(centroids):
    """Arrow-batched nearest-centroid assignment (one numpy matmul per
    batch; the centroid table rides the UDF closure → executor broadcast)."""
    import numpy as np
    import pandas as pd

    cents = np.asarray(centroids, dtype=np.float64)
    sq = (cents**2).sum(axis=1)

    @F.pandas_udf("int")
    def _assign(vecs: pd.Series) -> pd.Series:
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if len(x) == 0:
            return pd.Series([], dtype="Int32")
        d = sq[None, :] - 2.0 * (x @ cents.T)  # argmin ||v-c||² sans ||v||²
        return pd.Series(d.argmin(axis=1)).astype("Int32")

    # asNondeterministic (guide §4.4): the function IS deterministic, but
    # joins on the assigned cell derive ``isnotnull(cell)`` and the
    # optimizer pushes that filter below by DUPLICATING the UDF — every
    # assignment consumer then ran the matmul twice per corpus row (one
    # ArrowEvalPython below the filter, one above; seen in the
    # dedup_semantic and IVF plans).  Marking it non-deterministic
    # forbids the copy, yielding a single evaluation; assignment values
    # are unchanged.  Broader cost (ADVICE r13): non-determinism blocks
    # pushdown of ALL predicates through the project containing this
    # UDF, not just the duplicated isnotnull — e.g. an id filter applied
    # AFTER ivf_assign no longer prunes the scan below it.  The measured
    # double-evaluation win dominates on the engine's own paths (they
    # filter before assigning); callers composing ad-hoc filters on top
    # of ivf_assign should filter/select-prune the INPUT frame instead.
    return _assign.asNondeterministic()


def _cell_assign_expr(vec, centroids):
    """Nearest-centroid cell id as a PURE JVM expression — no Python
    worker, no Arrow hop: per cell, ``argmin ||v−c||² = ||c||² − 2·v·c``
    (the row's own ``||v||²`` is constant across cells) computed with
    ``zip_with``/``aggregate`` against centroid literals, then one
    ``array_min`` over (distance, cell) structs whose lexicographic
    ordering reproduces numpy ``argmin``'s first-index tie-break.
    Opt-in via ``ivf_assign(engine='expr')`` — measured slower than the
    Arrow assigner at production shape (see :func:`ivf_assign`), but the
    no-Python-worker form when that constraint matters."""
    structs = []
    for i, c in enumerate(centroids):
        carr = F.array(*[F.lit(float(x)) for x in c])
        sq = float(sum(float(x) * float(x) for x in c))
        d = F.lit(sq) - 2.0 * _dot(vec, carr)
        structs.append(F.struct(d.alias("d"), F.lit(i).alias("cell")))
    return F.array_min(F.array(*structs)).getField("cell").cast("int")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
    n_cells: int = 64,
    n_probe: int = 8,
    seed: int = 42,
) -> DataFrame:
    """IVF approximate cosine top-k: coarse-quantize the corpus into
    ``n_cells`` Voronoi cells, probe the ``n_probe`` nearest cells per
    query, exact re-rank inside the probed cells.

    Scale path: cell assignment is one distributed pass (and at rest the
    corpus can be hidden-partitioned by cell); each query touches
    ``n_probe/n_cells`` of the data through a hash join on the cell id.
    Recall is tunable via ``n_probe``."""
    centroids, c = ivf_index(
        corpus, id_col=id_col, vec_col=vec_col, n_cells=n_cells, seed=seed
    )
    return ivf_search(
        centroids, c, queries, k=k, id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col, n_probe=n_probe,
    )


def ivf_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 64,
    seed: int = 42,
):
    """Build an IVF index: ``(centroids, assigned)`` where ``centroids``
    is the trained coarse quantizer (a small Python list — persist it as
    JSON alongside the table) and ``assigned`` is the corpus as
    ``(id, cell: int, __cv: vector)`` — the INDEX STATE a pipeline
    persists (e.g. an engine table hidden-partitioned by ``cell``, so
    probed scans prune cell directories).

    Incremental ingest: assign a NEW batch with :func:`ivf_assign` against
    the SAME centroids and append — no retraining, no re-assignment of
    history; searches over old ∪ new rows are identical to a one-shot
    build with these centroids (pinned by test + the
    ``embedding_ann_ivf_incremental`` oracle)."""
    centroids = _train_centroids(corpus, vec_col, n_cells, seed=seed, id_col=id_col)
    return centroids, ivf_assign(centroids, corpus, id_col=id_col, vec_col=vec_col)


def ivf_assign(
    centroids,
    batch: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    engine: str = "arrow",
) -> DataFrame:
    """(id, cell, __cv) for a batch against FIXED centroids — one
    distributed pass; the incremental-ingest half of :func:`ivf_index`.

    ``engine='arrow'`` (default) is the Arrow-batched numpy assigner:
    one matmul per batch.  ``engine='expr'`` is the pure-JVM
    ``array_min``-over-distances expression — zero Python workers, but
    MEASURED SLOWER at the production shape (dedup_semantic sf0.1,
    16 cells × 64 dims: median 8.4 s vs 6.3 s arrow, interleaved reps —
    SCALE.md r9 row): Catalyst evaluates ``zip_with``/``aggregate``
    lambdas per element interpreted, while the Arrow hop amortizes into
    a single vectorized matmul.  Kept as an explicit opt-out of Python
    workers; both engines produce identical cells (same argmin, same
    first-index tie-break — equivalence pinned in pytest)."""
    if engine not in ("expr", "arrow"):
        raise InvalidDataError(
            f"ivf_assign engine={engine!r}: expected 'arrow' or 'expr'"
        )
    base = batch.select(F.col(id_col), F.col(vec_col).alias("__cv"))
    if engine == "expr":
        return base.withColumn(
            "cell", _cell_assign_expr(F.col("__cv"), centroids)
        )
    assign = _cell_assigner(centroids)
    return base.withColumn("cell", assign(F.col("__cv")))


def ivf_search(
    centroids,
    assigned: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
    n_probe: int = 8,
) -> DataFrame:
    """Top-k over a prebuilt IVF index (:func:`ivf_index` /
    :func:`ivf_assign` output): probe the ``n_probe`` nearest cells per
    query, exact cosine re-rank inside the probed cells."""
    import numpy as np

    query_id_col = query_id_col or id_col
    c = assigned.withColumnRenamed("cell", "__cell").withColumn(
        "__cn", _norm(F.col("__cv"))
    )

    cents = np.asarray(centroids, dtype=np.float64)
    sq = (cents**2).sum(axis=1)

    @F.pandas_udf("array<int>")
    def probe_cells(vecs: pd.Series) -> pd.Series:
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if len(x) == 0:
            return pd.Series([], dtype=object)
        d = sq[None, :] - 2.0 * (x @ cents.T)
        order = np.argsort(d, axis=1)[:, : min(n_probe, len(cents))]
        return pd.Series([row.tolist() for row in order])

    q = (
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
        )
        .withColumn("__qn", _norm(F.col("__qv")))
        .withColumn("__cell", F.explode(probe_cells(F.col("__qv"))))
    )
    scored = (
        c.join(F.broadcast(q), "__cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("__qv"), F.col("__cv"))
                / (F.col("__qn") * F.col("__cn")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "embedding_q8"
) -> DataFrame:
    """Symmetric int8 quantization of a float vector column: per-row scale
    = max(|v|)/127, payload shrinks 4× (the difference between storing and
    not storing a 100 TB embedding table).  All JVM-side array arithmetic;
    adds (``out_col``: array<tinyint>, ``out_col + '_scale'``: float)."""
    v = F.col(vec_col)
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(1.0))
    q = F.transform(v, lambda x: F.round(x / scale).cast("tinyint"))
    return df.withColumn(f"{out_col}_scale", scale.cast("float")).withColumn(out_col, q)


def dequantize_int8(
    df: DataFrame, q_col: str = "embedding_q8", out_col: str = "embedding_deq"
) -> DataFrame:
    """Inverse of :func:`quantize_int8` (lossy: max abs error = scale/2)."""
    scale = F.col(f"{q_col}_scale")
    return df.withColumn(
        out_col, F.transform(F.col(q_col), lambda x: (x.cast("float") * scale))
    )


def pq_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 256,
    sample_size: int = 4096,
    seed: int = 42,
    emit_err: bool = False,
):
    """Product-quantization index (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): split the vector into
    ``m`` contiguous subspaces, k-means each on a bounded
    partition-independent sample (``n_codes`` entries per sub-codebook),
    and encode every corpus vector as ``m`` small codes.  Returns
    ``(codebooks, encoded)`` where ``codebooks`` is the trained
    quantizer (a small Python list — persist as JSON beside the table)
    and ``encoded`` is ``(id, __cv, codes: array<int>)``.

    The payload win is the point: m=8 × 1 byte ≈ 32× smaller than a
    64-dim float32 vector — at 100 TB the difference between an ANN scan
    that reads 3 TB of codes and one that reads 100 TB of floats.
    Training cost is sample-bounded; encoding is one Arrow-batched
    distributed pass (a numpy matmul per subspace per batch)."""
    import numpy as np

    x = _bounded_sample(corpus, vec_col, sample_size, seed, id_col)
    if len(x) == 0:
        raise ValueError("cannot train PQ on an empty corpus")
    # the sample already carries the dimensionality — a separate
    # corpus.first() action per index build was one whole Spark job (r13;
    # a THREAD-pooled variant of the m trainings was measured and
    # REJECTED: the Lloyd scatter is GIL-bound, so 8 threads ran 1.8×
    # slower than the sequential loop even with 1-thread BLAS — the
    # fork-based PROCESS pool in _train_subcodebooks is what won)
    dim = x.shape[1]
    if dim % m != 0:
        raise InvalidDataError(
            f"pq_index: vector dim {dim} is not divisible by m={m}"
        )
    dsub = dim // m
    # m independent trainings → fork pool when big enough (bit-identical
    # to the sequential loop; gate + fallback in _train_subcodebooks)
    codebooks = [
        cb.tolist() for cb in _train_subcodebooks(x, m, dsub, n_codes, seed)
    ]
    return codebooks, pq_encode(
        codebooks, corpus, id_col=id_col, vec_col=vec_col, emit_err=emit_err
    )


def pq_encode(
    codebooks,
    batch: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    emit_err: bool = False,
) -> DataFrame:
    """Encode a batch against FIXED codebooks → ``(id, __cv, codes)`` —
    the incremental-ingest half of :func:`pq_index` (new arrivals encode
    without retraining, exactly like :func:`ivf_assign`).

    ``emit_err=True`` additionally emits ``__err`` — the row's squared
    reconstruction error, computed from the SAME gathered reconstruction
    ``_pq_recon_err`` uses (bit-identical values) — so index builds get
    their build-error statistic from the encode pass itself instead of a
    second full pass over (vector, codes) (r13: one fewer
    ArrowEvalPython stage per index build; at scale one fewer read of
    the corpus)."""
    import numpy as np
    import pandas as pd

    cbs = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    m = len(cbs)
    dsub = cbs[0].shape[1]

    def _codes_of(x):
        codes = np.empty((len(x), m), dtype=np.int64)
        for j in range(m):
            sub = x[:, j * dsub : (j + 1) * dsub]
            cb = cbs[j]
            d = (cb**2).sum(axis=1)[None, :] - 2.0 * (sub @ cb.T)
            codes[:, j] = d.argmin(axis=1)
        return codes

    if not emit_err:

        @F.pandas_udf("array<int>")
        def _encode(vecs: pd.Series) -> pd.Series:
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
            if len(x) == 0:
                return pd.Series([], dtype=object)
            return pd.Series([row.tolist() for row in _codes_of(x)])

        return batch.select(
            F.col(id_col), F.col(vec_col).alias("__cv")
        ).withColumn("codes", _encode(F.col("__cv")))

    @F.pandas_udf("struct<codes:array<int>,err:double>")
    def _encode_err(vecs: pd.Series) -> pd.DataFrame:
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if len(x) == 0:
            return pd.DataFrame({"codes": [], "err": []})
        codes = _codes_of(x)
        # the exact (x − reconstruction)² sum _pq_recon_err computes — NOT
        # the algebraically-equal matmul form, whose float rounding would
        # break the lossless regime's exact-zero build error
        rec = np.concatenate([cbs[j][codes[:, j]] for j in range(m)], axis=1)
        err = ((x - rec) ** 2).sum(axis=1)
        return pd.DataFrame(
            {"codes": [row.tolist() for row in codes], "err": err}
        )

    out = batch.select(
        F.col(id_col), F.col(vec_col).alias("__cv")
    ).withColumn("__ce", _encode_err(F.col("__cv")))
    return out.select(
        id_col,
        "__cv",
        F.col("__ce.codes").alias("codes"),
        F.col("__ce.err").alias("__err"),
    )


def _adc_scorer(codebooks, qrows):
    """Arrow-batched ASYMMETRIC-DISTANCE scorer shared by
    :func:`pq_search` and :func:`pq_table_search`: per query a
    ``m × n_codes`` inner-product lookup table built once driver-side
    (query-norm-scaled), plus the reconstruction-norm table — the
    numerically sensitive ADC core lives in ONE place."""
    import numpy as np
    import pandas as pd

    cbs = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    m = len(cbs)
    dsub = cbs[0].shape[1]
    sqn = np.stack([(cb**2).sum(axis=1) for cb in cbs])
    luts = {}
    for r in qrows:
        qv = np.asarray(r[1], dtype=np.float64)
        qn = float(np.sqrt((qv**2).sum())) or 1.0
        luts[r[0]] = np.stack(
            [cbs[j] @ qv[j * dsub : (j + 1) * dsub] for j in range(m)]
        ) / qn

    @F.pandas_udf("double")
    def _adc(qids: pd.Series, codes: pd.Series) -> pd.Series:
        n = len(qids)
        out = np.empty(n)
        if n == 0:
            return pd.Series(out)
        rng = np.arange(m)
        cs_all = np.asarray(codes.tolist(), dtype=np.int64)  # (n, m)
        rnorm = np.sqrt(sqn[rng[None, :], cs_all].sum(axis=1))
        rnorm[rnorm == 0.0] = 1.0
        qarr = np.asarray(qids)
        # one gather+sum per DISTINCT query in the batch, not per row
        for qid in pd.unique(qids):
            sel = qarr == qid
            lut = luts[qid]
            out[sel] = lut[rng[None, :], cs_all[sel]].sum(axis=1)
        return pd.Series(out / rnorm)

    return _adc


def pq_search(
    codebooks,
    encoded: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
    refine: int = 4,
) -> DataFrame:
    """Top-k over a PQ index via asymmetric distance computation: per
    query a ``m × n_codes`` inner-product lookup table is built once
    driver-side (tiny — queries are the broadcast side by assumption,
    same as cosine_topk), each corpus vector's approximate cosine is
    ``m`` table lookups over its codes (the reconstruction norm comes
    from a second per-entry norm table — subspaces are orthogonal), the
    per-query top ``refine × k`` ADC candidates are then EXACTLY
    re-ranked on the true vectors riding the encoded frame.  Output
    matches the other ANN searches: (query_id, id, cosine, rank)."""
    query_id_col = query_id_col or id_col
    qrows = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col)
    ).collect()
    _adc = _adc_scorer(codebooks, qrows)
    qids = queries.select(F.col(query_id_col).alias("query_id"))
    cand = (
        encoded.crossJoin(F.broadcast(qids))
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("__adc", _adc(F.col("query_id"), F.col("codes")))
    )
    w0 = Window.partitionBy("query_id").orderBy(
        F.col("__adc").desc(), F.col(id_col).asc()
    )
    cand = cand.withColumn("__r0", F.row_number().over(w0)).filter(
        F.col("__r0") <= refine * k
    )
    qvecs = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    scored = cand.join(F.broadcast(qvecs), "query_id").withColumn(
        "cosine",
        F.round(
            _dot(F.col("__qv"), F.col("__cv"))
            / (_norm(F.col("__qv")) * _norm(F.col("__cv"))),
            6,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
    m: int = 8,
    n_codes: int = 256,
    refine: int = 4,
    seed: int = 42,
) -> DataFrame:
    """PQ approximate cosine top-k: train + encode + ADC search with
    exact re-rank (:func:`pq_index` → :func:`pq_search`)."""
    codebooks, enc = pq_index(
        corpus, id_col=id_col, vec_col=vec_col, m=m, n_codes=n_codes, seed=seed
    )
    return pq_search(
        codebooks, enc, queries, k=k, id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col, refine=refine,
    )


def truncate_embeddings(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    renormalize: bool = True,
    out_col: Optional[str] = None,
) -> DataFrame:
    """Matryoshka-style prefix truncation (Kusupati et al. 2022, MRL):
    keep the first ``dim`` dimensions and L2-renormalize — MRL-trained
    embeddings pack coarse semantics into prefixes, so the truncated
    vector is a usable cheap representation (dim/D of the storage and
    dot-product cost).  Map-only JVM ``slice`` + arithmetic — no shuffle,
    no UDF; at 100 TB this is a pure scan-side projection.  Zero-norm
    prefixes pass through unnormalized (guarded division)."""
    if dim <= 0:
        raise InvalidDataError(f"truncate_embeddings dim must be positive: {dim}")
    out_col = out_col or vec_col
    sliced = F.slice(F.col(vec_col).cast("array<double>"), 1, dim)
    if renormalize:
        nrm = F.sqrt(
            F.aggregate(
                F.transform(sliced, lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        expr = F.when(
            nrm > 0, F.transform(sliced, lambda x: x / nrm)
        ).otherwise(sliced)
    else:
        expr = sliced
    return df.withColumn(out_col, expr)


def _shortlist_exact_topk(
    coarse: DataFrame,
    coarse_col: str,
    coarse_ascending: bool,
    k: int,
    shortlist: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared tail of the two-stage ANN funnels (matryoshka, hamming):
    per-query top-``shortlist`` by the coarse score (ties break by id),
    EXACT full-dimension cosine over the survivors (corpus vector in
    ``vec_col``, query vector in ``__qv``), per-query top-``k``.  Both
    stages are WindowGroupLimit partial top-k — never a global sort."""
    order = (
        F.col(coarse_col).asc() if coarse_ascending else F.col(coarse_col).desc()
    )
    w1 = Window.partitionBy("query_id").orderBy(order, F.col(id_col).asc())
    short = (
        coarse.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= shortlist)
    )
    rescored = short.withColumn(
        "cosine",
        F.round(
            _dot(F.col("__qv"), F.col(vec_col))
            / (_norm(F.col("__qv")) * _norm(F.col(vec_col))),
            6,
        ),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )


def matryoshka_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    prefix_dim: int = 8,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
) -> DataFrame:
    """Adaptive retrieval: coarse ranking on ``prefix_dim``-dimensional
    truncated vectors shortlists ``shortlist`` candidates per query
    (dot products at prefix_dim/D of full cost), then the shortlist is
    re-ranked with EXACT full-dimension cosine — the same two-stage
    funnel shape as PQ's ADC + refine, with prefix truncation as the
    compressor.  ``shortlist ≥ |corpus|`` degenerates to exact top-k
    (the oracle-checkable regime); lossy-regime recall is pinned in
    pytest.  Both stages are per-query WindowGroupLimit top-k — partial
    top-k map-side, never a global sort."""
    query_id_col = query_id_col or id_col
    c_t = truncate_embeddings(
        corpus.select(F.col(id_col), F.col(vec_col)),
        prefix_dim, vec_col=vec_col, out_col="__ct",
    ).select(id_col, vec_col, "__ct")
    q_t = truncate_embeddings(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
        ),
        prefix_dim, vec_col="__qv", out_col="__qt",
    )
    coarse = (
        c_t.crossJoin(F.broadcast(q_t))
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("__cs", _dot(F.col("__qt"), F.col("__ct")))
    )
    return _shortlist_exact_topk(
        coarse, "__cs", False, k, shortlist, id_col, vec_col
    )


def binarize_embeddings(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    out_prefix: str = "__bp",
) -> DataFrame:
    """1-bit sign quantization: each dimension becomes ``v > 0``, packed
    32 bits per BIGINT column (``__bp0``, ``__bp1``, …) — 32× smaller
    than float32, the storage/IO regime binary ANN runs in at 100 TB.
    Pure JVM shift/CASE arithmetic, map-only, whole-stage codegen; 32
    bits per long (not 64) keeps the packing reproducible in engines
    whose left-shift overflow-checks at bit 63 (the DuckDB oracle)."""
    if dim <= 0:
        raise InvalidDataError(f"binarize_embeddings dim must be positive: {dim}")
    n_packs = (dim + 31) // 32
    cols = list(df.columns)
    pack_exprs = [
        "("
        + " + ".join(
            f"shiftleft(CASE WHEN {vec_col}[{p * 32 + k}] > 0 THEN 1L ELSE 0L END, {k})"
            for k in range(min(32, dim - p * 32))
        )
        + f") AS {out_prefix}{p}"
        for p in range(n_packs)
    ]
    return df.selectExpr(*cols, *pack_exprs)


def hamming_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
) -> DataFrame:
    """Binary ANN (faiss IndexBinaryFlat shape): Hamming-distance coarse
    ranking over sign-bit-packed vectors shortlists candidates per query,
    then EXACT full-precision cosine re-ranks the shortlist.  The coarse
    compare is XOR + bit_count over ``ceil(dim/32)`` longs — ~64× less
    payload and compute than a float64 dot product, all inside
    whole-stage codegen; both stages are per-query partial top-k
    (WindowGroupLimit), never a global sort.  ``shortlist ≥ |corpus|``
    degenerates to exact top-k (the oracle-checkable regime); the
    lossy-regime recall floor is pinned in pytest.  Ties on Hamming
    distance break by id for determinism."""
    query_id_col = query_id_col or id_col
    n_packs = (dim + 31) // 32
    c_b = binarize_embeddings(
        corpus.select(F.col(id_col), F.col(vec_col)), dim, vec_col=vec_col
    )
    q_b = binarize_embeddings(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
        ),
        dim,
        vec_col="__qv",
        out_prefix="__qp",
    )
    hamming = sum(
        F.bit_count(F.col(f"__bp{p}").bitwiseXOR(F.col(f"__qp{p}")))
        for p in range(n_packs)
    )
    coarse = (
        c_b.crossJoin(F.broadcast(q_b))
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("__hd", hamming)
    )
    return _shortlist_exact_topk(
        coarse, "__hd", True, k, shortlist, id_col, vec_col
    )


def ivf_table_index(
    catalog,
    table_name: str,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 64,
    seed: int = 42,
):
    """Persist an IVF index AS AN ENGINE TABLE: the corpus is written
    cell-partitioned (identity partition on the coarse-quantizer cell),
    and the trained centroids ride the table's properties as JSON — the
    index is fully self-contained table state, no side files.

    This is the 100 TB ANN posture: each Voronoi cell is its own
    partition directory, so a probed search reads ONLY the probed cells'
    FILES (manifest-bounds + partition pruning, verified by plan test) —
    an ``n_probe/n_cells`` fraction of the corpus touches disk, instead
    of a full scan that discards 90% of rows after reading them.
    Incremental ingest: :func:`ivf_assign` new batches against the saved
    centroids and ``append`` — same cells, same pruning, no retrain."""
    import json as _json

    import pyspark.sql.types as T

    centroids = _train_centroids(corpus, vec_col, n_cells, seed=seed, id_col=id_col)
    assigned = ivf_assign(centroids, corpus, id_col=id_col, vec_col=vec_col)
    # build-time assignment quality, stamped for ivf_table_drift's
    # staleness ratio (one extra aggregation pass at build only)
    build_stats = _ivf_assign_stats(
        assigned.select("cell", F.col("__cv").alias(vec_col)), vec_col, centroids
    )
    src_fields = {f.name: f.dataType for f in corpus.schema.fields}
    src_type = src_fields[vec_col].simpleString()
    t = catalog.create_table(
        table_name,
        schema=T.StructType(
            [
                T.StructField(id_col, src_fields[id_col]),
                T.StructField("cell", T.IntegerType()),
                T.StructField(vec_col, src_fields[vec_col]),
            ]
        ),
        partition_spec=[("cell", "identity")],
        properties={
            "ivf.centroids": _json.dumps(
                [[float(x) for x in c] for c in centroids]
            ),
            "ivf.vec-col": vec_col,
            "ivf.id-col": id_col,
            "ivf.build-mean-dist": repr(build_stats["mean_dist"]),
        },
    )
    t.append(
        assigned.select(
            F.col(id_col), F.col("cell"),
            F.col("__cv").cast(src_type).alias(vec_col),
        )
    )
    return t.refresh()


def _ivf_assign_stats(df: DataFrame, vec_col: str, centroids) -> dict:
    """Assignment-quality statistics in ONE aggregation pass over an
    assigned frame (``cell`` + vectors): per-cell counts and summed
    assign distances (shuffle on cell, map-side partials), then a
    singleton roll-up.  Centroids ride a broadcast — nothing corpus-sized
    moves."""
    spark = df.sparkSession
    cent_df = small_local_df(
        spark,
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell int, __c array<double>",
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.col("__c"),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    per_cell = (
        df.join(F.broadcast(cent_df), "cell")
        .withColumn("__d", dist)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("__d").alias("sd"))
    )
    r = per_cell.agg(
        F.sum("n").alias("n_vectors"),
        F.count(F.lit(1)).alias("n_cells_used"),
        F.max("n").alias("max_cell"),
        (F.sum("sd") / F.sum("n")).alias("mean_dist"),
    ).collect()[0]
    return {
        "n_vectors": int(r["n_vectors"] or 0),
        "n_cells_used": int(r["n_cells_used"] or 0),
        "max_cell": int(r["max_cell"] or 0),
        "mean_dist": float(r["mean_dist"] or 0.0),
    }


def ivf_table_drift(
    index_table,
    skew_threshold: float = 4.0,
    dist_ratio_threshold: float = 1.5,
) -> dict:
    """Index-staleness metric for an :func:`ivf_table_index` table —
    persisted centroids never retrain on their own, so after enough
    incremental ingest the cell balance degrades silently.  ONE
    aggregation over the index table computes:

    * ``cell_skew``: hottest cell's population over the mean — ingest
      that lands mostly in a few cells destroys the probe-pruning win;
    * ``mean_dist_ratio``: current mean assign-distance over the
      build-time value stamped in the table properties — drifted data
      sits far from every centroid, so probes miss true neighbors.

    ``stale`` is True when either exceeds its threshold — the signal to
    CALL :func:`ivf_table_retrain`."""
    import json as _json

    props = index_table.properties
    centroids = _json.loads(props["ivf.centroids"])
    vec_col = props.get("ivf.vec-col", "embedding")
    df = index_table.scan().to_df()
    s = _ivf_assign_stats(df, vec_col, centroids)
    n_cells = len(centroids)
    mean_cell = s["n_vectors"] / n_cells if n_cells else 0.0
    skew = s["max_cell"] / mean_cell if mean_cell else 0.0
    build_dist = float(props.get("ivf.build-mean-dist", 0.0) or 0.0)
    ratio = s["mean_dist"] / build_dist if build_dist else 1.0
    return {
        "n_vectors": s["n_vectors"],
        "n_cells": n_cells,
        "n_cells_used": s["n_cells_used"],
        "cell_skew": round(skew, 4),
        "mean_dist": round(s["mean_dist"], 6),
        "build_mean_dist": round(build_dist, 6),
        "mean_dist_ratio": round(ratio, 4),
        "stale": bool(skew > skew_threshold or ratio > dist_ratio_threshold),
    }


def ivf_table_retrain(index_table, seed: int = 42):
    """Rebuild an :func:`ivf_table_index` table's coarse quantizer from
    its CURRENT vectors and reassign every row — the repair for a stale
    index (:func:`ivf_table_drift`).  ONE atomic overwrite commit carries
    both the reassigned rows and the new centroids + build statistics
    (``Table.overwrite(set_properties=...)``), so a reader never sees
    new cells under old centroids or vice versa.  Training stays
    sample-bounded (driver sees ≤4096 vectors); reassignment is the
    distributed :func:`ivf_assign` pass."""
    import json as _json

    props = index_table.properties
    vec_col = props.get("ivf.vec-col", "embedding")
    id_col = props.get("ivf.id-col", "vec_id")
    n_cells = len(_json.loads(props["ivf.centroids"]))
    corpus = index_table.scan().to_df().select(id_col, vec_col)
    src_type = dict(corpus.dtypes)[vec_col]
    centroids = _train_centroids(
        corpus, vec_col, n_cells, seed=seed, id_col=id_col
    )
    assigned = ivf_assign(centroids, corpus, id_col=id_col, vec_col=vec_col)
    rows = assigned.select(
        F.col(id_col), F.col("cell"), F.col("__cv").cast(src_type).alias(vec_col)
    )
    stats = _ivf_assign_stats(
        assigned.select("cell", F.col("__cv").alias(vec_col)), vec_col, centroids
    )
    index_table.overwrite(
        rows,
        set_properties={
            "ivf.centroids": _json.dumps([[float(x) for x in c] for c in centroids]),
            "ivf.build-mean-dist": repr(stats["mean_dist"]),
        },
    )
    return index_table.refresh()


def pq_table_index(
    catalog,
    table_name: str,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 256,
    sample_size: int = 4096,
    seed: int = 42,
):
    """Persist a PQ index AS AN ENGINE TABLE — the standing-index design
    :func:`ivf_table_index` established, applied to product quantization:
    the trained codebooks ride the table's properties as JSON (m × n_codes
    × dsub floats — a few hundred KB, metadata-sized), and every corpus
    row is stored as ``(id, codes: array<int>, vector)``.  The index is
    fully self-contained table state, no side files, no per-call retrain
    (:func:`pq_topk` trains per call — fine for a query, wrong for a
    standing 100 TB index).

    The 100 TB posture: an ADC search scans ONLY ``(id, codes)`` —
    columnar projection makes the hot scan ~32× smaller than the float32
    vectors (m bytes of codes vs dim × 4) — and the true vectors are
    fetched just for the refine-pool candidates by id.  Incremental
    ingest: :func:`pq_table_encode` encodes new batches against the
    frozen codebooks and appends — same codes, no retrain; staleness is
    measurable (:func:`pq_table_drift`) and repairable in one atomic
    commit (:func:`pq_table_retrain`)."""
    import json as _json

    import pyspark.sql.types as T

    codebooks, enc = pq_index(
        corpus, id_col=id_col, vec_col=vec_col, m=m, n_codes=n_codes,
        sample_size=sample_size, seed=seed, emit_err=True,
    )
    # the encode pass is the expensive distributed step — persist so the
    # build-error aggregate and the append materialize it ONCE.  The
    # per-row reconstruction error rides the encode UDF itself (__err —
    # bit-identical to _pq_recon_err's value), so the build statistic is
    # one JVM aggregate over the cache instead of a second Arrow pass.
    enc = enc.persist()
    src_fields = {f.name: f.dataType for f in corpus.schema.fields}
    src_type = src_fields[vec_col].simpleString()
    rows = enc.select(
        F.col(id_col), F.col("codes"), F.col("__cv").cast(src_type).alias(vec_col)
    )
    r = enc.agg(F.avg("__err").alias("e"), F.count(F.lit(1)).alias("n")).collect()[0]
    build_err = float(r["e"] or 0.0)
    t = catalog.create_table(
        table_name,
        schema=T.StructType(
            [
                T.StructField(id_col, src_fields[id_col]),
                T.StructField(
                    "codes", T.ArrayType(T.IntegerType()), nullable=False
                ),
                T.StructField(vec_col, src_fields[vec_col]),
            ]
        ),
        properties={
            "pq.codebooks": _json.dumps(
                [[[float(x) for x in c] for c in cb] for cb in codebooks]
            ),
            "pq.vec-col": vec_col,
            "pq.id-col": id_col,
            # build REQUEST parameters, not the kmeans-clamped shapes —
            # retrain must re-run with what the user asked for (a small
            # first corpus would otherwise cap n_codes forever)
            "pq.m": str(m),
            "pq.n-codes": str(n_codes),
            "pq.sample-size": str(sample_size),
            "pq.build-recon-err": repr(build_err),
        },
    )
    t.append(rows)
    enc.unpersist()
    return t.refresh()


def _pq_recon_err(df: DataFrame, vec_col: str, codebooks) -> tuple:
    """(Mean squared reconstruction error of ``codes`` against their
    vectors, row count) — ONE Arrow-batched pass + a singleton aggregate.  The
    build-time value is stamped in the index properties; its growth is
    the PQ staleness signal (drifted vectors sit far from every centroid
    in every subspace, so ADC rankings degrade silently)."""
    import numpy as np
    import pandas as pd

    cbs = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    m = len(cbs)

    @F.pandas_udf("double")
    def _err(vecs: pd.Series, codes: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=float)
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        cs = np.asarray([np.asarray(c, dtype=np.int64) for c in codes])
        rec = np.concatenate([cbs[j][cs[:, j]] for j in range(m)], axis=1)
        return pd.Series(((x - rec) ** 2).sum(axis=1))

    r = (
        df.withColumn("__e", _err(F.col(vec_col), F.col("codes")))
        .agg(F.avg("__e").alias("e"), F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )
    return float(r["e"] or 0.0), int(r["n"] or 0)


def pq_table_encode(index_table, batch: DataFrame):
    """Incremental ingest into a :func:`pq_table_index` table: encode the
    batch against the FROZEN codebooks from the table properties and
    append — one distributed Arrow-batched pass, no retrain, codes
    identical to what a full rebuild with the same codebooks would
    produce (parity pinned in pytest)."""
    import json as _json

    props = index_table.properties
    codebooks = _json.loads(props["pq.codebooks"])
    vec_col = props.get("pq.vec-col", "embedding")
    id_col = props.get("pq.id-col", "vec_id")
    src_type = {
        f.name: f.dataType for f in index_table.schema.to_spark().fields
    }[vec_col].simpleString()
    enc = pq_encode(codebooks, batch, id_col=id_col, vec_col=vec_col)
    index_table.append(
        enc.select(
            F.col(id_col), F.col("codes"),
            F.col("__cv").cast(src_type).alias(vec_col),
        )
    )
    return index_table.refresh()


def pq_table_drift(index_table, err_ratio_threshold: float = 1.5) -> dict:
    """Index-staleness metric for a :func:`pq_table_index` table —
    frozen codebooks never retrain on their own, so after enough
    incremental ingest of shifted data the quantization error grows and
    ADC rankings rot.  ``recon_err_ratio`` is the current mean squared
    reconstruction error over the build-time value stamped in the
    properties; ``stale`` trips past the threshold — the signal to CALL
    :func:`pq_table_retrain`.  One scan of (vector, codes), one
    aggregate."""
    import json as _json

    props = index_table.properties
    codebooks = _json.loads(props["pq.codebooks"])
    vec_col = props.get("pq.vec-col", "embedding")
    df = index_table.scan().select(vec_col, "codes").to_df()
    err, n = _pq_recon_err(df, vec_col, codebooks)
    build = float(props.get("pq.build-recon-err", 0.0) or 0.0)
    # symmetric epsilon keeps the ratio meaningful in the lossless regime
    # (build error exactly 0 — n_codes >= corpus): any real error then
    # reads as drift instead of dividing by zero into a false "healthy"
    eps = 1e-9
    ratio = (err + eps) / (build + eps)
    return {
        "n_vectors": int(n),
        "recon_err": round(err, 6),
        "build_recon_err": round(build, 6),
        "recon_err_ratio": round(ratio, 4),
        "stale": bool(ratio > err_ratio_threshold),
    }


def pq_table_retrain(index_table, seed: int = 42):
    """Retrain a :func:`pq_table_index` table's codebooks from its
    CURRENT vectors and re-encode every row — the repair for a stale
    index (:func:`pq_table_drift`).  ONE atomic overwrite commit carries
    the re-encoded rows AND the new codebooks + build error
    (``Table.overwrite(set_properties=...)``), so a reader never sees
    new codes under old codebooks or vice versa — the same
    atomic-retrain shape as :func:`ivf_table_retrain`.  Training stays
    sample-bounded; re-encoding is one distributed pass."""
    import json as _json

    props = index_table.properties
    vec_col = props.get("pq.vec-col", "embedding")
    id_col = props.get("pq.id-col", "vec_id")
    old = _json.loads(props["pq.codebooks"])
    # the build REQUEST parameters, not the kmeans-clamped codebook
    # shapes: a small first corpus clamps len(old[0]) below the asked-for
    # n_codes, and a retrain from the clamped value would cap quantization
    # fidelity forever (r9 review finding #4)
    m = int(props.get("pq.m", len(old)))
    n_codes = int(props.get("pq.n-codes", len(old[0])))
    sample_size = int(props.get("pq.sample-size", 4096))
    corpus = index_table.scan().select(id_col, vec_col).to_df()
    src_type = dict(corpus.dtypes)[vec_col]
    codebooks, enc = pq_index(
        corpus, id_col=id_col, vec_col=vec_col, m=m, n_codes=n_codes,
        sample_size=sample_size, seed=seed, emit_err=True,
    )
    enc = enc.persist()  # one materialization feeds both jobs below
    r = enc.agg(F.avg("__err").alias("e")).collect()[0]
    err = float(r["e"] or 0.0)
    index_table.overwrite(
        enc.select(
            F.col(id_col), F.col("codes"),
            F.col("__cv").cast(src_type).alias(vec_col),
        ),
        set_properties={
            "pq.codebooks": _json.dumps(
                [[[float(x) for x in c] for c in cb] for cb in codebooks]
            ),
            "pq.build-recon-err": repr(err),
        },
    )
    enc.unpersist()
    return index_table.refresh()


def pq_table_search(
    index_table,
    queries: DataFrame,
    k: int = 10,
    refine: int = 4,
    query_id_col: Optional[str] = None,
) -> DataFrame:
    """Top-k over a :func:`pq_table_index` table: ADC scoring over a
    scan of ONLY ``(id, codes)`` (columnar projection — the ~32×
    read-shrink is the whole point of the standing index), then the
    per-query top ``refine × k`` candidates fetch their TRUE vectors by
    id from the same table and re-rank on exact cosine.  The candidate
    pool is queries × refine×k rows — driver- and broadcast-sized by
    construction, so the vector column is read only through an
    id-IN-list scan the engine's stats pruning consumes."""
    import json as _json

    props = index_table.properties
    codebooks = _json.loads(props["pq.codebooks"])
    vec_col = props.get("pq.vec-col", "embedding")
    id_col = props.get("pq.id-col", "vec_id")
    query_id_col = query_id_col or id_col
    qrows = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col)
    ).collect()
    _adc = _adc_scorer(codebooks, qrows)
    spark = index_table.spark
    enc = index_table.scan().select(id_col, "codes").to_df()
    qids = small_local_df(
        spark,
        [(r[0],) for r in qrows],
        f"query_id {dict(queries.dtypes)[query_id_col]}",
    )
    w0 = Window.partitionBy("query_id").orderBy(
        F.col("__adc").desc(), F.col(id_col).asc()
    )
    # ONE ADC job; the candidate pool (queries × refine×k rows) is
    # driver-sized by construction, so it collects once and re-enters the
    # plan as a literal frame — the big (id, codes) scan never re-runs
    cand_rows = (
        enc.crossJoin(F.broadcast(qids))
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("__adc", _adc(F.col("query_id"), F.col("codes")))
        .withColumn("__r0", F.row_number().over(w0))
        .filter(F.col("__r0") <= refine * k)
        .select("query_id", id_col)
        .collect()
    )
    qt = dict(queries.dtypes)[query_id_col]
    it = dict(enc.dtypes)[id_col]
    if not cand_rows:
        # empty queries, or every corpus row was a self-match: a typed
        # empty frame, never a crashing `IN ()`
        return spark.createDataFrame(
            [], f"query_id {qt}, {id_col} {it}, cosine double, rank int"
        )
    cand = small_local_df(
        spark, [(r[0], r[1]) for r in cand_rows], f"query_id {qt}, {id_col} {it}"
    )

    def _sql_lit(v):
        # quote-safe literal: string ids may carry quotes; everything
        # else the engine's predicate parser reads back as a number
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return repr(v)

    cand_ids = sorted({r[1] for r in cand_rows})
    id_list = ", ".join(_sql_lit(v) for v in cand_ids)
    vecs = (
        index_table.scan()
        .filter(f"{id_col} IN ({id_list})")
        .select(id_col, vec_col)
        .to_df()
    )
    qvecs = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    scored = (
        cand.join(F.broadcast(vecs), id_col)
        .join(F.broadcast(qvecs), "query_id")
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("__qv"), F.col(vec_col))
                / (_norm(F.col("__qv")) * _norm(F.col(vec_col))),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )


def ivf_table_search(
    index_table,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 8,
    query_id_col: Optional[str] = None,
) -> DataFrame:
    """Top-k over an :func:`ivf_table_index` table: probe cells per query
    from the table-property centroids, scan ONLY the probed cells (the
    cell filter is an OR-of-equalities the engine's manifest/partition
    pruning consumes — unprobed cells' files are never opened), then
    exact cosine re-rank per query within its own probes."""
    import json as _json

    import numpy as np

    props = index_table.properties
    centroids = _json.loads(props["ivf.centroids"])
    vec_col = props.get("ivf.vec-col", "embedding")
    id_col = props.get("ivf.id-col", "vec_id")
    query_id_col = query_id_col or id_col
    cents = np.asarray(centroids, dtype=np.float64)
    sq = (cents**2).sum(axis=1)
    qrows = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col)
    ).collect()
    n_probe = min(n_probe, len(cents))
    probe_rows = []
    all_cells = set()
    for r in qrows:
        qv = np.asarray(r[1], dtype=np.float64)
        d = sq - 2.0 * (cents @ qv)
        cells = [int(c) for c in np.argsort(d)[:n_probe]]
        all_cells.update(cells)
        probe_rows.extend((r[0], c) for c in cells)
    spark = index_table.spark
    probes = small_local_df(spark, probe_rows, "query_id long, cell int")
    # OR-of-equalities: the shape the engine's stats/partition pruning
    # consumes — only the probed cells' files are planned
    cond = " OR ".join(f"cell = {c}" for c in sorted(all_cells))
    cand = index_table.scan().filter(cond).to_df()
    qvecs = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    scored = (
        cand.join(F.broadcast(probes), "cell")
        .join(F.broadcast(qvecs), "query_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("__qv"), F.col(vec_col))
                / (_norm(F.col("__qv")) * _norm(F.col(vec_col))),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )
