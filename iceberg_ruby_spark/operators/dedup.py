"""Deduplication operators — exact and near-duplicate.

Absent from the reference (SURVEY.md §2 Tier C); built Spark-first for
100 TB corpora:

- **exact**: one hash-partitioned shuffle.  ``exact_dedup_by_hash`` shuffles
  a 64-char digest instead of multi-KB document bodies — at 100 TB the
  shuffle payload is the dominant cost, so group keys must be small.
- **MinHash + LSH**: shingle → k min-hash signature → banded bucket join.
  Candidate pairs come from band-bucket equality (never an all-pairs
  product); exact Jaccard is then verified *only for candidates*.
- **SimHash**: 64-bit signature via per-bit majority vote over token
  hashes; near-dups share signatures within small Hamming distance.
- **n-gram Jaccard**: exact set overlap within a blocking key (bounded
  pair enumeration).

Everything below is built-in-function Spark (whole-stage codegen); there is
no Python in any per-row path.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(
    df: DataFrame,
    cols: Optional[Sequence[str]] = None,
    tie_breaker: Optional[str] = None,
) -> DataFrame:
    """Drop exact duplicates over ``cols`` (default: all columns).

    With ``tie_breaker`` the survivor is deterministic (minimum value wins)
    — required for oracle-comparable results; otherwise ``dropDuplicates``
    keeps an arbitrary row (cheaper: map-side partial aggregation)."""
    keys = list(cols) if cols else df.columns
    if tie_breaker is None:
        return df.dropDuplicates(keys)
    w = Window.partitionBy(*keys).orderBy(F.col(tie_breaker).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_dedup_by_hash(
    df: DataFrame,
    text_col: str,
    tie_breaker: str,
    normalize: bool = False,
) -> DataFrame:
    """Exact content dedup shuffling a sha256 digest, not the text.

    At scale the groupBy key is what crosses the network; hashing first
    makes the shuffle payload constant-size per row.  ``normalize`` folds
    case and whitespace before hashing (near-exact dedup)."""
    text = F.col(text_col)
    if normalize:
        text = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    hashed = df.withColumn("__h", F.sha2(text, 256))
    w = Window.partitionBy("__h").orderBy(F.col(tie_breaker).asc())
    return (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__h")
    )


def shingle_array(text_col: str, size: int = 5):
    """Distinct character ``size``-gram shingles of normalized text, as an
    array<string> column (JVM-side: sequence + transform + substr)."""
    t = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    n = F.greatest(F.length(t) - F.lit(size - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: F.substr(t, i, F.lit(size)))
    )


def token_shingle_array(text_col: str, size: int = 3):
    """Distinct word ``size``-gram shingles (space-joined) as array<string>."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.greatest(F.size(toks) - F.lit(size - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.array_join(F.slice(toks, i + 1, size), " "),
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    shingle_size: int = 5,
) -> DataFrame:
    """(id, sig: array<long>) — MinHash signature per document.

    Plan shape: explode distinct shingles → ONE groupBy(id) computing all
    ``num_hashes`` mins in a single shuffle (each hash function is
    ``xxhash64(shingle, i)``, JVM-side).  No Python per row, no k passes."""
    exploded = df.select(
        F.col(id_col), F.explode(shingle_array(text_col, shingle_size)).alias("__sh")
    )
    aggs = [
        F.min(F.xxhash64(F.col("__sh"), F.lit(i))).alias(f"__s{i}")
        for i in range(num_hashes)
    ]
    sig = exploded.groupBy(id_col).agg(*aggs)
    return sig.select(
        F.col(id_col),
        F.array(*[F.col(f"__s{i}") for i in range(num_hashes)]).alias("sig"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 5,
    threshold: float = 0.6,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard ≥ threshold) via
    MinHash + banded LSH.

    1. signatures (one shuffle);
    2. explode ``bands`` band-hashes, self-join on (band, hash) → candidate
       pairs — the only pair enumeration, and it is bucket-local;
    3. exact Jaccard verification **of candidates only**, via a shingle
       join (|A∩B| from matching shingles, |A∪B| = |A|+|B|−|A∩B|).

    At 100 TB step 2's bucket join replaces the O(n²) all-pairs product;
    skewed buckets (boilerplate shingles) are handled by AQE skew-join."""
    rows_per_band = max(1, num_hashes // bands)
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_size)
    band_cols = []
    for b in range(bands):
        chunk = [F.col("sig")[i] for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        band_cols.append(F.struct(F.lit(b).alias("band"), F.xxhash64(*chunk).alias("bh")))
    bands_df = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("__b")
    ).select(id_col, "__b.band", "__b.bh")
    a = bands_df.alias("a")
    b_ = bands_df.alias("b")
    cand = (
        a.join(b_, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh")))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    sh = df.select(
        F.col(id_col), F.explode(shingle_array(text_col, shingle_size)).alias("__sh")
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    sh_b = sh.select(F.col(id_col).alias("__idb"), F.col("__sh").alias("__shb"))
    inter = (
        cand.join(sh.withColumnRenamed(id_col, "id_a"), "id_a")
        .join(sh_b, (F.col("__idb") == F.col("id_b")) & (F.col("__sh") == F.col("__shb")))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("n", "na"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("n", "nb"), "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


def simhash(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bits: int = 64,
) -> DataFrame:
    """(id, simhash: long) — 64-bit SimHash over word tokens.

    Per-bit majority vote, expressed as ``bits`` conditional sums in ONE
    groupBy (single shuffle, all JVM-side): token hash h contributes +1 to
    bit b if h's bit b is set, else −1; the signature sets bit b where the
    sum is positive."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("__t"),
    ).withColumn("__h", F.xxhash64("__t"))
    aggs = []
    for b in range(bits):
        bit_set = F.shiftright(F.col("__h"), b).bitwiseAND(F.lit(1)) == 1
        aggs.append(F.sum(F.when(bit_set, 1).otherwise(-1)).alias(f"__b{b}"))
    votes = toks.groupBy(id_col).agg(*aggs)
    sig = F.lit(0).cast("long")
    for b in range(bits):
        sig = sig + F.when(
            F.col(f"__b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
    return votes.select(F.col(id_col), sig.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_col: str,
    n: int = 3,
    threshold: float = 0.3,
) -> DataFrame:
    """Exact word-``n``-gram Jaccard pairs within a blocking key.

    The block join bounds pair enumeration (all-pairs only inside a block);
    suitable when a cheap equality blocker exists (source, language,
    length bucket).  Set algebra is array_intersect/array_union — JVM-side."""
    with_sh = df.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("block"),
        token_shingle_array(text_col, n).alias("sh"),
    )
    a = with_sh.alias("a")
    b = with_sh.alias("b")
    return (
        a.join(b, "block")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (
                F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
                / F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
