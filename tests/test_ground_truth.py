"""Ground-truth oracles for the sketch/approximate operators.

The driver's DuckDB oracle cannot re-derive xxhash64 MinHash signatures or
seeded hyperplanes, so those queries are rows-only on the scoreboard.
These tests supply the missing hard signal on the SAME fixture data and
the SAME parameters the driver queries use (plans/llm.py):

- MinHash+LSH pairs vs brute-force exact Jaccard over the identical
  shingle-hash sets: every emitted pair must be a true pair with the
  exact Jaccard value (precision 1.0 — the funnel ends in exact
  verification), and recall over all true pairs is pinned.
- SimHash banded pairs vs brute-force Hamming: the pigeonhole banding is
  a *lossless* candidate generator for hamming ≤ max_hamming, so the two
  outputs must be EQUAL, not just overlapping.
- ANN (multi-table sign-LSH, IVF) vs exact cosine top-k: recall@10
  pinned at the driver parameters; IVF with n_probe == n_cells probes
  everything and must equal the exact ranking row-for-row.

Everything here is deterministic: fixed fixture parquet, seeded
hyperplanes/centroids, stable hash functions — the pins are regression
bounds, not flaky statistical hopes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_ruby_spark.operators.dedup import (
    _shingle_hashes,
    minhash_lsh_pairs,
    simhash,
    simhash_pairs,
)
from iceberg_ruby_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    lsh_ann_topk,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def exact_topk(emb):
    q = emb.filter(F.col("vec_id") < 5)
    return {(r.query_id, r.vec_id) for r in cosine_topk(emb, q, k=10).collect()}


def test_minhash_lsh_precision_is_exact_and_recall_pinned(docs):
    # driver parameters (plans/llm.py::dedup_minhash_lsh) on the xxhash64
    # fast path — the driver itself runs hash_fn='md5', whose full-pipeline
    # DuckDB twin is the oracle; this pins the default path the oracle
    # doesn't see
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(
            docs, "text", "doc_id",
            num_hashes=64, bands=16, shingle_size=5, threshold=0.5,
        ).collect()
    }
    # ground truth: brute-force exact Jaccard over the same shingle-hash
    # sets (all 125k pairs — fine at fixture scale, the thing LSH avoids)
    sets = (
        _shingle_hashes(docs, "text", "doc_id", 5)
        .groupBy("doc_id")
        .agg(F.collect_set("__h").alias("s"))
    )
    a = sets.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    b = sets.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    truth = {
        (r.id_a, r.id_b): r.j
        for r in (
            a.crossJoin(b)
            .filter("id_a < id_b")
            .withColumn("i", F.size(F.array_intersect("sa", "sb")))
            .withColumn("j", F.col("i") / (F.size("sa") + F.size("sb") - F.col("i")))
            .filter("j >= 0.5")
            .select("id_a", "id_b", F.round("j", 6).alias("j"))
        ).collect()
    }
    assert truth, "fixture has no true near-dup pairs — test is vacuous"
    # precision 1.0 with exact values: the output ends in exact verification
    for pair, j in got.items():
        assert pair in truth, f"false positive {pair}"
        assert abs(j - truth[pair]) < 1e-9, (pair, j, truth[pair])
    recall = sum(1 for p in got if p in truth) / len(truth)
    assert recall >= 0.95, f"recall {recall} (truth={len(truth)}, got={len(got)})"


def test_simhash_banding_equals_bruteforce_hamming(docs):
    sig = simhash(docs, "text", "doc_id")
    a = sig.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("ha"))
    b = sig.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("hb"))
    brute = {
        (r.id_a, r.id_b, r.hamming)
        for r in (
            a.crossJoin(b)
            .filter("id_a < id_b")
            .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
            .filter("hamming <= 3")
        ).collect()
    }
    banded = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_pairs(docs, "text", "doc_id", max_hamming=3).collect()
    }
    assert brute, "fixture has no simhash near-pairs — test is vacuous"
    # pigeonhole banding is lossless within the Hamming budget: any pair
    # with ≤3 differing bits agrees exactly on ≥1 of the 4 chunks
    assert banded == brute


def test_lsh_ann_recall_at_driver_params(emb, exact_topk):
    # driver parameters (plans/llm.py::embedding_ann_lsh)
    q = emb.filter(F.col("vec_id") < 5)
    lsh = {
        (r.query_id, r.vec_id)
        for r in lsh_ann_topk(
            emb, q, k=10, n_planes=4, n_tables=8, n_probe_bits=1
        ).collect()
    }
    recall = len(exact_topk & lsh) / len(exact_topk)
    assert recall >= 0.9, recall


def test_ivf_recall_on_approximate_path(emb, exact_topk):
    # the genuinely approximate configuration (n_probe < n_cells) — the
    # driver query runs full-probe (exact-oracle-checkable); this pins the
    # partial-probe path the driver can't
    q = emb.filter(F.col("vec_id") < 5)
    ivf = {
        (r.query_id, r.vec_id)
        for r in ivf_topk(emb, q, k=10, n_cells=32, n_probe=8).collect()
    }
    recall = len(exact_topk & ivf) / len(exact_topk)
    assert recall >= 0.6, recall  # measured 0.64 with kmeans++ seeding


def test_ivf_training_sample_is_partition_independent(emb):
    # VERDICT r4 "what's wrong" #3: a bare limit() samples whichever tasks
    # answer first — stable on one local file, arbitrary on a multi-file
    # table.  The seeded-hash sample must train IDENTICAL centroids no
    # matter how the corpus is partitioned.
    import numpy as np

    from iceberg_ruby_spark.operators.similarity import _train_centroids

    c1 = _train_centroids(emb, "embedding", 32, id_col="vec_id")
    c2 = _train_centroids(emb.repartition(7), "embedding", 32, id_col="vec_id")
    c3 = _train_centroids(emb.repartition(3, "label"), "embedding", 32, id_col="vec_id")
    assert np.array_equal(c1, c2)
    assert np.array_equal(c1, c3)


def test_ivf_full_probe_equals_exact(emb):
    # probing every cell degenerates to brute force: the outputs must be
    # identical row-for-row (same cosine rounding, same tie-break)
    q = emb.filter(F.col("vec_id") < 5)
    full = {
        (r.query_id, r.vec_id, r.cosine, r.rank)
        for r in ivf_topk(emb, q, k=10, n_cells=32, n_probe=32).collect()
    }
    exact = {
        (r.query_id, r.vec_id, r.cosine, r.rank)
        for r in cosine_topk(emb, q, k=10).collect()
    }
    assert full == exact


def test_pq_topk_recall_and_exact_regime(spark):
    import numpy as np

    from iceberg_ruby_spark.operators.similarity import (
        cosine_topk,
        pq_encode,
        pq_index,
        pq_search,
        pq_topk,
    )

    rng = np.random.RandomState(0)
    cents = rng.randn(5, 32) * 5
    rows = [
        (i, (cents[i % 5] + rng.randn(32) * 0.3).tolist()) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = spark.createDataFrame(rows[:5], "vec_id long, embedding array<double>")
    exact = {(r.query_id, r.vec_id) for r in cosine_topk(df, q, k=10).collect()}
    # lossy regime: small codebooks still recover the true neighbors on
    # clustered data (ADC candidates cover the top-k; exact re-rank)
    lossy = {
        (r.query_id, r.vec_id)
        for r in pq_topk(df, q, k=10, m=8, n_codes=32, refine=4).collect()
    }
    assert len(exact & lossy) / len(exact) >= 0.9
    # exact regime: n_codes >= corpus -> lossless reconstruction -> PQ
    # output is IDENTICAL to the exact scan, ranks and cosines included
    pq_rows = sorted(
        (r.query_id, r.vec_id, r.cosine, r.rank)
        for r in pq_topk(df, q, k=10, m=8, n_codes=256, refine=4).collect()
    )
    ex_rows = sorted(
        (r.query_id, r.vec_id, r.cosine, r.rank)
        for r in cosine_topk(df, q, k=10).collect()
    )
    assert pq_rows == ex_rows
    # incremental encode: new batch against fixed codebooks == one-shot
    cbs, enc_all = pq_index(df, m=8, n_codes=32)
    half = df.filter("vec_id < 100")
    rest = df.filter("vec_id >= 100")
    _, enc_half = pq_index(half, m=8, n_codes=32), None
    enc_inc = pq_encode(cbs, half).unionByName(pq_encode(cbs, rest))
    a = {(r.vec_id, tuple(r.codes)) for r in enc_all.collect()}
    b = {(r.vec_id, tuple(r.codes)) for r in enc_inc.collect()}
    assert a == b
    # dim-divisibility guard
    import pytest

    from iceberg_ruby_spark.errors import InvalidDataError

    bad = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(InvalidDataError, match="not divisible"):
        pq_index(bad, m=2)


def test_pq_subquantizer_pool_matches_sequential():
    """The fork-pool sub-quantizer training (r13) is BIT-IDENTICAL to the
    sequential loop: each of the m trainings is a self-contained
    deterministic computation (own RandomState(seed+j), 1-thread BLAS),
    so process isolation changes no float op.  Covers both sides of the
    work gate: a big-enough shape that takes the pool, and the forced
    single-proc env override that takes the sequential path."""
    import os

    import numpy as np

    from iceberg_ruby_spark.operators.similarity import (
        _kmeans_np,
        _train_subcodebooks,
    )

    rng = np.random.RandomState(3)
    m, dsub, k = 8, 8, 128
    x = rng.randn(700, m * dsub)  # proxy 8*128*700*8 = 5.7M > the 4M gate
    seq = [
        _kmeans_np(x[:, j * dsub : (j + 1) * dsub], k, seed=42 + j)
        for j in range(m)
    ]
    pooled = _train_subcodebooks(x, m, dsub, k, 42)
    assert all(np.array_equal(a, b) for a, b in zip(seq, pooled))
    os.environ["SPARK_GRAFT_PQ_TRAIN_PROCS"] = "1"
    try:
        forced_seq = _train_subcodebooks(x, m, dsub, k, 42)
    finally:
        del os.environ["SPARK_GRAFT_PQ_TRAIN_PROCS"]
    assert all(np.array_equal(a, b) for a, b in zip(seq, forced_seq))


def test_ivf_table_index_pruning_and_recall(catalog, spark):
    from iceberg_ruby_spark.operators.similarity import (
        cosine_topk,
        ivf_assign,
        ivf_table_index,
        ivf_table_search,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    t = ivf_table_index(catalog, "emb_ivf_t", emb, n_cells=8, seed=42)
    # the index is self-contained table state
    import json

    cents = json.loads(t.properties["ivf.centroids"])
    assert len(cents) == 8
    # probing 2 cells plans exactly the 2 cells' files, not the table
    all_files = len([e for e in t._current_entries() if "path" in e])
    pruned = len(t.scan().filter("cell = 1 OR cell = 5").plan_files())
    assert all_files == 8 and pruned == 2
    # full probe == exact top-k, row for row
    q = emb.filter("vec_id < 3")
    full = sorted(
        tuple(r) for r in ivf_table_search(t, q, k=5, n_probe=8).collect()
    )
    exact = sorted(tuple(r) for r in cosine_topk(emb, q, k=5).collect())
    assert full == exact
    # incremental ingest: assign against the SAVED centroids and append;
    # searches see old ∪ new through the same pruned layout
    new = emb.selectExpr("vec_id + 100000 AS vec_id", "embedding", "label")
    t.append(
        ivf_assign(cents, new).selectExpr(
            "vec_id", "cell", "CAST(__cv AS array<float>) AS embedding"
        )
    )
    grown = ivf_table_search(t.refresh(), q, k=5, n_probe=8)
    assert grown.count() == q.count() * 5


def test_ivf_table_drift_and_retrain(catalog, spark):
    """Staleness loop (VERDICT r7 #6): a fresh index reports healthy;
    skewed incremental ingest (far from every build-time centroid, all
    landing in few cells) trips the drift metric; retrain restores cell
    balance and full-probe recall, atomically with the reassigned rows."""
    import json

    from iceberg_ruby_spark.operators.similarity import (
        cosine_topk,
        ivf_assign,
        ivf_table_drift,
        ivf_table_index,
        ivf_table_retrain,
        ivf_table_search,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    t = ivf_table_index(catalog, "emb_ivf_drift", emb, n_cells=8, seed=42)
    d0 = ivf_table_drift(t)
    assert not d0["stale"]
    assert float(t.properties["ivf.build-mean-dist"]) > 0
    # skewed ingest: a tight far-away cluster, 4x the corpus size — lands
    # in one or two cells and far from every build centroid
    import pyspark.sql.functions as F

    n0 = emb.count()
    # 8 well-separated far sub-clusters so the RETRAINED quantizer can
    # balance them (one cell each); under the BUILD centroids they all
    # land far away in few cells
    far = spark.range(4 * n0).select(
        (F.col("id") + 1_000_000).alias("vec_id"),
        F.array(
            *[
                (F.lit(50.0) + (F.col("id") % 8) * 10.0).cast("float")
                for _ in range(dim)
            ]
        ).alias("embedding"),
    )
    cents = json.loads(t.properties["ivf.centroids"])
    t.append(
        ivf_assign(cents, far).selectExpr(
            "vec_id", "cell", "CAST(__cv AS array<float>) AS embedding"
        )
    )
    d1 = ivf_table_drift(t.refresh())
    assert d1["stale"], d1
    assert d1["cell_skew"] > d0["cell_skew"]
    # retrain: one atomic overwrite — centroids + rows swap together
    v_before = t.ops.load().version
    t2 = ivf_table_retrain(t)
    assert t2.ops.load().version == v_before + 1
    d2 = ivf_table_drift(t2)
    assert not d2["stale"], d2
    new_cents = json.loads(t2.properties["ivf.centroids"])
    assert new_cents != cents and len(new_cents) == 8
    # full-probe search over the retrained index equals exact top-k over
    # the grown corpus
    grown = emb.unionByName(
        far.withColumn("label", F.lit(None).cast("int")), allowMissingColumns=True
    ).select("vec_id", "embedding")
    q = emb.filter("vec_id < 3")
    got = sorted(
        tuple(r) for r in ivf_table_search(t2, q, k=5, n_probe=8).collect()
    )
    exact = sorted(tuple(r) for r in cosine_topk(grown, q, k=5).collect())
    assert got == exact
    # CALL spellings
    r = catalog.sql("CALL system.ivf_index_drift('emb_ivf_drift')")
    assert r.columns[-1] == "stale" and r.rows[0][-1] is False
    r2 = catalog.sql("CALL system.ivf_retrain('emb_ivf_drift')")
    assert r2.rows[0][0] == n0 + 4 * n0


def test_pq_table_index_lifecycle(catalog, spark):
    """PQ index persisted AS TABLE STATE (VERDICT r8 #5): codebooks in
    properties, exact-regime search ≡ exact top-k, incremental encode
    parity against the frozen codebooks, drift→retrain staleness loop
    with an atomic single-commit swap, and the CALL spellings."""
    import json

    import pyspark.sql.functions as F

    from iceberg_ruby_spark.operators.similarity import (
        cosine_topk,
        pq_encode,
        pq_table_drift,
        pq_table_encode,
        pq_table_index,
        pq_table_retrain,
        pq_table_search,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n0 = emb.count()
    dim = len(emb.select("embedding").first()[0])
    # exact regime: n_codes >= corpus -> lossless codes -> search == exact
    t = pq_table_index(
        catalog, "emb_pq_t", emb, m=8, n_codes=512, seed=42
    )
    cbs = json.loads(t.properties["pq.codebooks"])
    # kmeans caps codebook entries at the sample size (500 < 512): every
    # distinct subvector is its own centroid — exactly the lossless regime
    assert len(cbs) == 8 and n0 <= len(cbs[0]) <= 512
    assert len(cbs[0][0]) == dim // 8
    assert float(t.properties["pq.build-recon-err"]) >= 0.0
    q = emb.filter("vec_id < 3")
    got = sorted(
        tuple(r) for r in pq_table_search(t, q, k=5, refine=4).collect()
    )
    exact = sorted(tuple(r) for r in cosine_topk(emb, q, k=5).collect())
    assert got == exact
    # incremental ingest: encoding against the FROZEN codebooks appends
    # codes identical to a direct pq_encode of the same rows
    new = emb.selectExpr("vec_id + 100000 AS vec_id", "embedding")
    t = pq_table_encode(t, new)
    want = {
        (r.vec_id, tuple(r.codes)) for r in pq_encode(cbs, new).collect()
    }
    have = {
        (r.vec_id, tuple(r.codes))
        for r in t.scan().filter("vec_id >= 100000").to_df().collect()
    }
    assert have == want and len(have) == n0
    # search over the grown index still matches exact over the union
    grown = emb.unionByName(new.withColumn("label", F.lit(None).cast("int")))
    got2 = sorted(
        tuple(r) for r in pq_table_search(t, q, k=5, refine=4).collect()
    )
    exact2 = sorted(tuple(r) for r in cosine_topk(grown, q, k=5).collect())
    assert got2 == exact2
    # drift loop: healthy at build; direction-distinct FAR sub-clusters
    # (per-group block of hot dims — constant vectors would be cosine-
    # degenerate) reconstruct terribly under the frozen codebooks
    d0 = pq_table_drift(t)
    assert not d0["stale"] and d0["recon_err_ratio"] <= 1.05
    far = spark.range(4 * n0).select(
        (F.col("id") + 1_000_000).alias("vec_id"),
        F.array(
            *[
                F.when((F.col("id") % 8) == d // 8, F.lit(60.0))
                .otherwise(F.lit(0.5))
                .cast("float")
                for d in range(dim)
            ]
        ).alias("embedding"),
    )
    t = pq_table_encode(t, far)
    d1 = pq_table_drift(t)
    assert d1["stale"] and d1["recon_err_ratio"] > d0["recon_err_ratio"]
    # retrain: ONE commit swaps re-encoded rows + codebooks + build err
    v_before = t.ops.load().version
    t2 = pq_table_retrain(t)
    assert t2.ops.load().version == v_before + 1
    d2 = pq_table_drift(t2)
    assert not d2["stale"], d2
    assert json.loads(t2.properties["pq.codebooks"]) != cbs
    # recall restored: a far-cluster query finds its own sub-cluster
    # (cosine ~1.0 rows) through the retrained codebooks
    farq = far.filter("vec_id = 1000000")
    top = pq_table_search(t2, farq, k=5, refine=4).collect()
    assert len(top) == 5 and min(r.cosine for r in top) >= 0.999
    # empty query set: typed empty result, not a crashing IN ()
    empty = pq_table_search(t2, farq.limit(0), k=5)
    assert empty.count() == 0
    assert empty.columns == ["query_id", "vec_id", "cosine", "rank"]
    # the ADC scan is COLUMN-PRUNED: the hot (id, codes) projection never
    # reads the 32x-bigger vector column — the read-shrink claim, pinned
    # at the plan level like ivf_table's 2-of-16-files pin
    plan = (
        t2.scan().select("vec_id", "codes").to_df()
        ._jdf.queryExecution().executedPlan().toString()
    )
    read_schemas = [
        ln for ln in plan.splitlines() if "ReadSchema" in ln
    ]
    assert read_schemas and all("embedding" not in ln for ln in read_schemas)
    # CALL spellings
    r = catalog.sql("CALL system.pq_index_drift('emb_pq_t')")
    assert r.columns[-1] == "stale" and r.rows[0][-1] is False
    r2 = catalog.sql("CALL system.pq_retrain('emb_pq_t')")
    assert r2.rows[0][0] == 6 * n0


def test_matryoshka_topk_recall_and_exact_regime(spark):
    """Coarse-to-fine matryoshka retrieval: shortlist ≥ corpus is exactly
    the exact top-k (covering re-rank); the lossy regime (prefix_dim=8,
    shortlist=50) holds a recall@10 floor vs exact cosine."""
    from iceberg_ruby_spark.operators.similarity import (
        cosine_topk,
        matryoshka_topk,
        truncate_embeddings,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter("vec_id < 10")
    exact = {
        (r["query_id"], r["vec_id"]) for r in cosine_topk(emb, q, k=10).collect()
    }
    covering = {
        (r["query_id"], r["vec_id"])
        for r in matryoshka_topk(emb, q, k=10, shortlist=100_000).collect()
    }
    assert covering == exact
    # Lossy regime: these SYNTHETIC embeddings are not MRL-trained, so
    # prefixes carry no privileged signal — absolute recall is modest by
    # construction (measured 0.32 @ prefix=8/shortlist=50).  What must
    # hold is the MECHANISM: recall rises with prefix width and with
    # shortlist depth, with a floor under the measured values.
    def recall(prefix_dim, shortlist):
        lossy = {
            (r["query_id"], r["vec_id"])
            for r in matryoshka_topk(
                emb, q, k=10, prefix_dim=prefix_dim, shortlist=shortlist
            ).collect()
        }
        return len(lossy & exact) / len(exact)

    r8_50, r8_100, r32_50 = recall(8, 50), recall(8, 100), recall(32, 50)
    assert r8_50 >= 0.2, f"matryoshka recall@10 collapsed to {r8_50}"
    assert r32_50 > r8_50, "wider prefix must improve recall"
    assert r8_100 > r8_50, "deeper shortlist must improve recall"
    # truncation semantics: unit norm after renormalize, prefix preserved
    t = truncate_embeddings(emb, 8).select("vec_id", "embedding").first()
    assert len(t["embedding"]) == 8
    import math

    assert math.isclose(
        sum(x * x for x in t["embedding"]), 1.0, rel_tol=1e-9
    )
    import pytest

    from iceberg_ruby_spark.errors import InvalidDataError

    with pytest.raises(InvalidDataError, match="positive"):
        truncate_embeddings(emb, 0)


def test_hamming_topk_recall_and_exact_regime(spark):
    """Binary ANN: shortlist ≥ corpus is exactly the exact top-k
    (covering re-rank); the lossy regime (shortlist=50) holds a
    recall@10 floor vs exact cosine.  Packing semantics are pinned:
    32 bits per long, bit k set iff dim (32p+k) > 0."""
    from iceberg_ruby_spark.operators.similarity import (
        binarize_embeddings,
        cosine_topk,
        hamming_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter("vec_id < 10")
    exact = {
        (r["query_id"], r["vec_id"]) for r in cosine_topk(emb, q, k=10).collect()
    }
    covering = {
        (r["query_id"], r["vec_id"])
        for r in hamming_topk(emb, q, k=10, dim=64, shortlist=100_000).collect()
    }
    assert covering == exact
    lossy = {
        (r["query_id"], r["vec_id"])
        for r in hamming_topk(emb, q, k=10, dim=64, shortlist=50).collect()
    }
    recall = len(lossy & exact) / len(exact)
    assert recall >= 0.5, f"hamming recall@10 dropped to {recall}"
    # packing semantics against a hand-computed row
    row = binarize_embeddings(emb, 64).select("embedding", "__bp0", "__bp1").first()
    want0 = sum(1 << k for k in range(32) if row["embedding"][k] > 0)
    want1 = sum(1 << k for k in range(32) if row["embedding"][32 + k] > 0)
    assert (row["__bp0"], row["__bp1"]) == (want0, want1)
    import pytest

    from iceberg_ruby_spark.errors import InvalidDataError

    with pytest.raises(InvalidDataError, match="positive"):
        binarize_embeddings(emb, 0)
