"""Deduplication operators for web-scale corpora.

Four tiers, cheapest first (a production pipeline runs them in this order,
each stage shrinking the input of the next):

  1. exact_dup_groups      — hash-groupBy on md5(text): one shuffle of
                             (hash, id) pairs only, never the text.
  2. minhash_lsh_pairs     — word-shingle MinHash signatures, banded LSH
                             bucketing, candidate self-join, exact-Jaccard
                             verification. The scale path: candidate
                             generation shuffles (band_key, id) pairs.
  3. simhash_pairs         — 32-bit SimHash over shingles; nibble-banded
                             candidate join; Hamming-distance verification.
  4. ngram_jaccard_pairs   — exact Jaccard within caller-provided blocking
                             keys (the brute-force baseline / verifier).

All hashes are md5-portable (ops.hashing), so every stage has an exact
ANSI-SQL oracle. Reference ancestor: the duplicate check
(/root/reference/data_quality/src/checks/values_duplicate.py) — exact dups
only; tiers 2-4 are the web-scale extension the target demands.

Scale notes (100 TB): every stage is expressed so the WIDE columns (text)
stay put until verification joins, which move only candidate-pair id lists;
LSH parameters (bands×rows) govern the recall/candidate-volume trade-off:
P(candidate | J) = 1 − (1 − J^rows)^bands.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_quality_spark.ops.hashing import portable_hash64

# MinHash defaults: 12 hashes = 4 bands × 3 rows → P(cand|J=0.7) ≈ 0.89,
# P(cand|J=0.3) ≈ 0.10. Verification removes false positives exactly.
MINHASH_K = 12
LSH_BANDS = 4
LSH_ROWS = 3

SIMHASH_BITS = 32
SIMHASH_BANDS = 4  # 8-bit bands; pairs sharing ≥1 band are candidates


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------


def tokens_col(text: Column) -> Column:
    return F.filter(F.split(text, r"\s+"), lambda x: x != "")


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams joined by single spaces (the MinHash item set)."""
    toks = tokens_col(text)
    k = F.size(toks)
    starts = F.sequence(F.lit(1), k - (n - 1))  # 1-based, element_at is 1-based
    grams = F.transform(
        starts,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + F.lit(j)) for j in range(n)]
        ),
    )
    return F.when(k >= n, F.array_distinct(grams)).otherwise(
        F.expr("CAST(array() AS array<string>)")
    )


# ---------------------------------------------------------------------------
# 1 — exact dedup
# ---------------------------------------------------------------------------


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(text_md5, n_dups, keep_id): one row per duplicated text; keep_id =
    min id (the canonical survivor). Only (md5, id) shuffles."""
    return (
        df.where(F.col(text_col).isNotNull())
        .select(F.md5(F.col(text_col)).alias("text_md5"), F.col(id_col))
        .groupBy("text_md5")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keep_id"))
        .where(F.col("n_dups") > 1)
    )


def drop_exact_dups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one row (min id) per distinct text; null-text rows all kept.
    Implemented as groupBy-min + semi join so the wide frame never shuffles
    fully (ids are the only shuffled payload besides the md5)."""
    keep = (
        df.where(F.col(text_col).isNotNull())
        .groupBy(F.md5(F.col(text_col)).alias("__h"))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    kept = df.join(keep, on=id_col, how="left_semi")
    return kept.unionByName(df.where(F.col(text_col).isNull()))


# ---------------------------------------------------------------------------
# 2 — MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(shingles: Column, k: int = MINHASH_K) -> Column:
    """Array of k minhash values: min over shingles of hash64(shingle||'#i').
    Empty shingle set → nulls (callers must filter)."""
    def hash_with(salt: str):
        # closure keeps the lambda unary — a binary lambda would make
        # F.transform pass the array INDEX as the second argument
        return lambda s: portable_hash64(s, salt)

    return F.array(
        *[
            F.array_min(F.transform(shingles, hash_with(f"#{i}")))
            for i in range(k)
        ]
    )


def with_minhash(
    df: DataFrame, text_col: str, n: int = 3, k: int = MINHASH_K
) -> DataFrame:
    sh = word_shingles(F.col(text_col), n)
    return df.withColumn("shingles", sh).withColumn(
        "minhash", minhash_signature(F.col("shingles"), k)
    )


def _band_key(mh: Column, band: int, rows: int = LSH_ROWS) -> Column:
    vals = [F.element_at(mh, band * rows + j + 1) for j in range(rows)]
    return F.concat_ws("_", F.lit(str(band)), *[v.cast("string") for v in vals])


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    return F.when(
        (F.size(a) + F.size(b) - inter) > 0,
        inter.cast("double") / (F.size(a) + F.size(b) - inter),
    ).otherwise(F.lit(0.0))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    n: int = 3,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard ≥ threshold).

    Plan shape: [project shingles+signature] → [explode bands: (band_key,
    id, shingles)] → [self-join on band_key] → [distinct pairs] → [exact
    Jaccard verify]. Only candidate rows carry shingle arrays through the
    join; the full corpus shuffles (band_key, id, shingles) — at 100 TB
    swap the shingle payload for a second join back to the docs table.
    """
    base = (
        with_minhash(df.select(id_col, text_col), text_col, n, k)
        .where(F.size("shingles") > 0)
        .select(id_col, "shingles", "minhash")
    )
    banded = base.select(
        F.col(id_col),
        "shingles",
        F.explode(
            F.array(*[_band_key(F.col("minhash"), b, rows) for b in range(bands)])
        ).alias("band_key"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(right, on="band_key")
        .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.shingles").alias("sh_a"),
            F.col("r.shingles").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.select(
        "id_a",
        "id_b",
        F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"),
    ).where(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# 3 — SimHash
# ---------------------------------------------------------------------------


def simhash(shingles: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash over the shingle set: bit j set iff Σ_s (±1 by bit j of
    hash(s)) > 0. O(bits) aggregates over the array, all codegen'd."""
    hs = F.transform(shingles, lambda s: portable_hash64(s))
    total = F.size(shingles)

    def bit_sum(j: int) -> Column:
        # ones_j − zeros_j = 2*ones_j − n
        ones = F.aggregate(
            hs,
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.shiftright(x, j).bitwiseAND(F.lit(1).cast("long")),
        )
        return 2 * ones - total

    out = F.lit(0).cast("long")
    for j in range(bits):
        out = out + F.when(bit_sum(j) > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    n: int = 3,
    bits: int = SIMHASH_BITS,
    bands: int = SIMHASH_BANDS,
) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share ≥1 of `bands` equal
    byte-bands; verified by Hamming distance ≤ max_hamming."""
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    base = (
        df.select(id_col, word_shingles(F.col(text_col), n).alias("sh"))
        .where(F.size("sh") > 0)
        .select(F.col(id_col), simhash(F.col("sh"), bits).alias("simhash"))
    )
    banded = base.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        "_",
                        F.lit(str(b)),
                        F.shiftright(F.col("simhash"), b * band_bits)
                        .bitwiseAND(F.lit(mask).cast("long"))
                        .cast("string"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_key"),
    )
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(r, on="band_key")
        .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.simhash").alias("sim_a"),
            F.col("r.simhash").alias("sim_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return cand.select("id_a", "id_b", ham.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


# ---------------------------------------------------------------------------
# 4 — blocked exact n-gram Jaccard (brute-force baseline)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    threshold: float = 0.7,
    n: int = 3,
) -> DataFrame:
    """Exact Jaccard over word n-gram sets within blocking-key groups.
    O(Σ block²) — the verifier/baseline, not the scale path."""
    base = df.select(
        id_col, *block_cols, word_shingles(F.col(text_col), n).alias("sh")
    ).where(F.size("sh") > 0)
    l, r = base.alias("l"), base.alias("r")
    return (
        l.join(r, on=block_cols)
        .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.round(jaccard(F.col("l.sh"), F.col("r.sh")), 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
