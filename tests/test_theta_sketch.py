"""Theta sketch (theta_sketch.py) held to the Java library on Spark's
classpath (datasketches-java 6.2.0 — an independent implementation of
the same public formats):

- exact-mode compact sketches are BYTE-IDENTICAL to
  ``UpdateSketch.update(byte[])…compact().toByteArray()``;
- estimation-mode sketches heapify in Java, RE-SERIALIZE byte-identically,
  estimate within theta-sketch bounds, and UNION with Java-built sketches;
- the ``compute_statistics`` Puffin blobs are real
  ``apache-datasketches-theta-v1`` payloads whose Java-side estimate
  equals the published ndv.
"""

from __future__ import annotations

import random

import pytest

from iceberg_ruby_spark import theta_sketch as ts


def _jvm_compact(spark, byte_values, k=4096):
    b = spark._jvm.org.apache.datasketches.theta.UpdateSketch.builder()
    b.setNominalEntries(k)
    s = b.build()
    for v in byte_values:
        s.update(bytearray(v))
    return bytes(s.compact().toByteArray())


def _jvm_heapify(spark, data):
    jvm = spark._jvm
    return jvm.org.apache.datasketches.theta.CompactSketch.heapify(
        jvm.org.apache.datasketches.memory.Memory.wrap(data)
    )


def test_seed_hash_matches_library_default():
    assert ts.compute_seed_hash(ts.DEFAULT_UPDATE_SEED) == 0x93CC


EXACT_CASES = [
    [],
    [b"a"],
    [b"a", b"b", b"c"],
    [b"dup", b"dup", b"x"],  # duplicates collapse
    [f"key-{i}".encode() for i in range(1000)],
    [bytes([i]) * (i % 19 + 1) for i in range(256)],  # varied lengths
]


@pytest.mark.parametrize("vals", EXACT_CASES, ids=[f"c{i}" for i in range(len(EXACT_CASES))])
def test_exact_mode_bytes_identical_to_java(spark, vals):
    ours = ts.sketch_from_values(vals)
    assert ours == _jvm_compact(spark, vals)
    hashes, theta, empty = ts.deserialize_compact(ours)
    assert theta == ts.MAX_THETA
    assert empty == (len(vals) == 0)
    assert len(hashes) == len(set(vals))
    assert ts.estimate(ours) == len(set(vals))


def test_estimation_mode_java_interop(spark):
    n = 100_000
    vals = [f"key-{i}".encode() for i in range(n)]
    ours = ts.sketch_from_values(vals)
    sk = _jvm_heapify(spark, ours)
    # Java reads it, agrees on the estimate, and re-emits identical bytes
    assert bytes(sk.toByteArray()) == ours
    assert sk.getRetainedEntries() == ts.DEFAULT_NOMINAL_ENTRIES
    assert sk.getEstimate() == pytest.approx(ts.estimate(ours))
    # k=4096 theta sketch: relative standard error ~1/sqrt(k) ≈ 1.6%
    assert sk.getEstimate() == pytest.approx(n, rel=0.05)
    assert sk.getLowerBound(2) <= n <= sk.getUpperBound(2)
    # unions with a Java-built sketch over an overlapping value set
    b = spark._jvm.org.apache.datasketches.theta.UpdateSketch.builder()
    b.setNominalEntries(4096)
    other = b.build()
    for i in range(n // 2, n + n // 2):
        other.update(bytearray(f"key-{i}".encode()))
    u = spark._jvm.org.apache.datasketches.theta.SetOperation.builder().buildUnion()
    u.union(sk)
    u.union(other.compact())
    assert u.getResult().getEstimate() == pytest.approx(1.5 * n, rel=0.05)


def test_property_random_sets_byte_identical(spark):
    rnd = random.Random(17)
    for _trial in range(8):
        n = rnd.randrange(0, 600)
        vals = [
            rnd.getrandbits(rnd.randrange(8, 120)).to_bytes(16, "big")
            for _ in range(n)
        ]
        ours = ts.sketch_from_values(vals)
        assert ours == _jvm_compact(spark, vals), f"mismatch at n={n}"


def test_murmur_reference_vector():
    # cross-implementation determinism pin: hashing is pure and stable
    h1, h2 = ts.murmur3_x64_128(b"hello", 0)
    assert (h1, h2) == ts.murmur3_x64_128(b"hello", 0)
    assert ts.murmur3_x64_128(b"hello", 1) != (h1, h2)
    # 63-bit projection drops the sign bit
    assert 0 < ts.hash63(b"hello") < 1 << 63


def test_compute_statistics_writes_theta_blobs(catalog, spark):
    from iceberg_ruby_spark.puffin import THETA_BLOB_TYPE, read_puffin

    t = catalog.create_table(
        "theta_stats", schema={"a": "int", "b": "string", "c": "double"}
    )
    t.append(
        [{"a": i % 7, "b": f"s{i % 50}", "c": float(i)} for i in range(300)]
    )
    stats = t.compute_statistics()
    # supported types get exact ndv (all under k=4096)
    assert stats["columns"]["a"]["ndv"] == 7
    assert stats["columns"]["b"]["ndv"] == 50
    assert stats["columns"]["c"]["ndv"] == 300
    [entry] = t.refresh().statistics
    data = t.ops.io.read_bytes(t.ops._abs(entry["statistics-path"]))
    blobs, _ = read_puffin(data)
    theta = [b for b in blobs if b["type"] == THETA_BLOB_TYPE]
    assert len(theta) == 3
    for b in theta:
        # the JAVA library reads each blob and lands on the published ndv
        sk = _jvm_heapify(spark, bytes(b["payload"]))
        assert int(round(sk.getEstimate())) == int(b["properties"]["ndv"])


def test_vectorized_fixed_width_hash_matches_scalar():
    """hash63_fixed_batch (numpy, the ANALYZE hot path for numeric
    columns) must agree value-for-value with the scalar reference over
    the same single-value serializations."""
    import struct

    import numpy as np

    vals8 = [0, 1, 12345, 2**63 - 1, 2**64 - 1, 999999999999, 2**53 + 7]
    fast8 = ts.hash63_fixed_batch(np.array(vals8, dtype=np.uint64), 8)
    for f, v in zip(fast8, vals8):
        assert int(f) == ts.hash63(struct.pack("<Q", v))
    vals4 = [0, 1, 77, 2**31 - 1, 2**32 - 1, 123456]
    fast4 = ts.hash63_fixed_batch(np.array(vals4, dtype=np.uint64), 4)
    for f, v in zip(fast4, vals4):
        assert int(f) == ts.hash63(struct.pack("<I", v))
    # signed + float bit patterns route through the same fixed widths
    for x in (-1, -(2**40), 42):
        u = np.array([x], dtype=np.int64).astype(np.uint64)
        assert int(ts.hash63_fixed_batch(u, 8)[0]) == ts.hash63(struct.pack("<q", x))
    for d in (0.0, -0.0, 3.14159, -1e300):
        u = np.array([d], dtype=np.float64).view(np.uint64)
        assert int(ts.hash63_fixed_batch(u, 8)[0]) == ts.hash63(struct.pack("<d", d))


def test_compute_statistics_vectorized_path_agrees_with_scalar_types(catalog, spark):
    """A table mixing vectorized (long/double/timestamp) and scalar-path
    (string/date) columns: every published ndv must equal the true
    distinct count (all under k)."""
    import datetime

    rows = [
        {
            "i": k % 13,
            "d": float(k % 29) / 7,
            "s": f"s{k % 17}",
            "ts": datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=k % 31),
            "day": datetime.date(2024, 1, 1) + datetime.timedelta(days=k % 11),
        }
        for k in range(500)
    ]
    t = catalog.create_table(
        "theta_mixed",
        schema={"i": "int", "d": "double", "s": "string", "ts": "timestamp",
                "day": "date"},
    )
    t.append(rows)
    stats = t.compute_statistics()
    got = {c: v["ndv"] for c, v in stats["columns"].items()}
    assert got == {"i": 13, "d": 29, "s": 17, "ts": 31, "day": 11}
