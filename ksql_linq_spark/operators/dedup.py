"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design notes (100 TB):
- exact: one hash-shuffle on the fingerprint; keep-first via min(doc_id)
  aggregation (no window sort needed).
- MinHash+LSH: shingle -> k md5-minhashes -> bands -> self-join on
  (band_idx, band_hash).  The self-join keys are the band buckets, so
  the shuffle is bounded by bucket sizes, not n^2; md5 is used (not
  xxhash) so the DuckDB oracle can reproduce signatures bit-for-bit.
- SimHash: 32-bit sign-aggregated token-hash fingerprint; near-dups =
  equal fingerprint (hamming-0 fast path) or banded hamming join.
- n-gram Jaccard: explode shingles, self-join on shingle, count
  intersections per pair, |A∪B| from per-doc sizes.  The explode is a
  flatMap (no shuffle); the join shuffles on shingle — prune frequent
  shingles (stop-shingles) before joining at scale.
- embedding cosine: exact pairwise via block-join guarded by a
  similarity threshold; at scale use lsh buckets from similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import fingerprint, shingles


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per normalized-text fingerprint."""
    fp = df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
    keep = fp.groupBy("fp").agg(F.min(id_col).alias(id_col)).drop("fp")
    return df.join(keep, on=id_col, how="inner")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig ARRAY<STRING>): sig[i] = min over shingles of md5(i||shingle).

    md5-per-seed keeps it reproducible in any engine; string-min over hex
    is a valid uniform minhash order.
    """
    sh = df.select(F.col(id_col), shingles(F.col(text_col), shingle_n).alias("sh"))
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(F.col("sh"), lambda s: F.md5(F.concat(i.cast("string"), s)))
        ),
    )
    return sh.select(F.col(id_col), sig.alias("sig"))


def minhash_bands(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, band_idx, band_hash): LSH band buckets of the minhash signature."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    return sig.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band_idx"),
                    F.md5(
                        F.array_join(
                            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                            "|",
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("band"),
    ).select(id_col, "band.band_idx", "band.band_hash")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs (a < b) sharing >= 1 LSH band.

    bands divides num_hashes; rows_per_band = num_hashes // bands.
    Shuffle is on (band_idx, band_hash) — bucket-bounded, not quadratic.
    """
    banded = minhash_bands(df, text_col, id_col, num_hashes, bands, shingle_n)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.band_idx") == F.col("b.band_idx"),
                F.col("a.band_hash") == F.col("b.band_hash"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 32) -> DataFrame:
    """(id, simhash BIGINT): sign-aggregated 32-bit token-hash fingerprint.

    Token hash = first 8 hex chars of md5 (engine-portable); bit j of the
    fingerprint is 1 iff sum over tokens of (+1 if token-hash bit j else -1)
    is positive.
    """
    from .text import tokens, normalize_text

    toks = df.select(
        F.col(id_col),
        F.transform(
            tokens(normalize_text(F.col(text_col))),
            lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
        ).alias("h"),
    )
    # unrolled per-bit vote expressions (bits is small + static): each is
    # one JVM-side fold over the token-hash array, no Python per row
    def _vote(mask):
        # closure, not default-arg: pyspark lambdas must match exact arity
        return lambda acc, h: acc + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1)

    fp = F.lit(0).cast("long")
    for j in range(bits):
        mask = F.lit(1 << j).cast("long")
        vote = F.aggregate(F.col("h"), F.lit(0).cast("long"), _vote(mask))
        fp = fp.bitwiseOR(F.when(vote > 0, mask).otherwise(F.lit(0).cast("long")))
    return toks.select(F.col(id_col), fp.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing >= 1 shingle.

    ``max_shingle_freq`` drops stop-shingles (appearing in more than N
    docs) before the self-join — the skew guard at scale.
    """
    sh = df.select(F.col(id_col), shingles(F.col(text_col), shingle_n).alias("sh"))
    sizes = sh.select(F.col(id_col), F.size("sh").alias("sz"))
    ex = sh.select(F.col(id_col), F.explode("sh").alias("s"))
    if max_shingle_freq is not None:
        freq = ex.groupBy("s").agg(F.count_distinct(id_col).alias("df_"))
        ex = ex.join(freq.filter(F.col("df_") <= max_shingle_freq).select("s"), "s")
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, on=[F.col("a.s") == F.col("b.s"),
                      F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def embedding_cosine_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """Near-dup pairs by embedding cosine >= threshold (exact, pairwise).

    Quadratic — correct baseline for modest partitions; the scale path is
    similarity.random_projection_buckets -> join within buckets.
    """
    from .similarity import cosine

    v = df.select(
        F.col(id_col), F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v")
    )
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, on=F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cosine(F.col("a.v"), F.col("b.v")).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
