"""Fuzzy key matching via deletion-neighborhood blocking (the SymSpell /
symmetric-delete idea, re-expressed as Spark equi-joins).

Two strings are within Levenshtein distance 1 iff their deletion
neighborhoods intersect, where neighborhood(s) = {s} ∪ {s minus one char}:
a substitution at position i makes both sides share the delete-at-i
variant; an insertion/deletion makes the longer side's delete equal the
shorter side verbatim. So candidate generation is an exact equi-join on
variant strings — linear in Σ|s| postings, never a cross join — and an
exact ``levenshtein`` check verifies candidates (the blocking is complete
for distance ≤ 1, so recall is exactly 1.0 by construction; the verify
only removes false candidates like "aa"~"ab" sharing variant "a" at
distance... which IS 1 — false candidates are pairs at distance 2 that
collide, e.g. "ab"~"ba" sharing "a").

Scale shape: |s|+1 postings per key (keys are short identifiers — names,
codes, URLs — not documents), hashed to 8-byte longs for the shuffle;
per-variant posting lists pair within buckets like the shingle ops, with
the same optional hot-variant cap. At 100 TB of rows with bounded key
length this is one shuffle on the variant hash + one verify projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from healthcare_rcm_etl_pipeline_spark.operators.buckets import bounded_bucket_collect


def deletion_variants(col: F.Column) -> F.Column:
    """array<string>: the string plus every delete-one-char variant,
    distinct. Pure JVM expressions (transform over char positions)."""
    dels = F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.concat(
            F.substring(col, F.lit(1), i - 1),
            F.substring(col, i + 1, F.length(col)),
        ),
    )
    return F.array_distinct(F.concat(F.array(col), dels))


def edit1_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    max_bucket: int | None = None,
    max_key_len: int = 128,
) -> DataFrame:
    """All (id_a < id_b) row pairs whose ``key_col`` strings are within
    Levenshtein distance 1 (0 = exact duplicates included — callers filter
    ``lev = 1`` for near-matches only). The entity-resolution primitive:
    typo'd natural keys, OCR'd codes, off-by-one identifiers.

    ``max_bucket`` drops over-shared variants before pair emission (a
    variant shared by d keys emits d(d-1)/2 candidates — same hazard and
    same cap as the shingle posting lists; real duplicate pile-ups on one
    key are better handled by exact dedup first).

    ``max_key_len`` bounds the deletion neighborhood: a key of length L
    posts L+1 variants of ~L bytes each — O(L²) bytes per key, which is
    fine for identifiers and catastrophic for document-length strings.
    Keys longer than the cap are EXCLUDED (they are not identifiers; use
    the shingle/minhash ops for text) — raising instead would let one bad
    row kill a 100 TB job.

    Returns (id_a, id_b, key_a, key_b, lev).
    """
    base = df.select(
        F.col(id_col).alias("__id"), F.col(key_col).cast("string").alias("__key")
    ).filter(F.length("__key") <= max_key_len)
    post = base.select(
        "__id",
        "__key",
        F.explode(deletion_variants(F.col("__key"))).alias("__var"),
    ).withColumn("__vh", F.xxhash64("__var")).drop("__var")
    grouped = bounded_bucket_collect(
        post, ["__vh"], F.struct("__id", "__key"), max_bucket
    )
    pairs = grouped.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ds"),
                    lambda x, i: F.transform(
                        F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                        lambda y: F.struct(
                            x["__id"].alias("id_a"),
                            y["__id"].alias("id_b"),
                            x["__key"].alias("key_a"),
                            y["__key"].alias("key_b"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.*").filter(F.col("id_a") != F.col("id_b"))
    # normalize orientation, dedup across variants, verify exactly
    oriented = pairs.select(
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
        F.when(F.col("id_a") < F.col("id_b"), F.col("key_a"))
        .otherwise(F.col("key_b"))
        .alias("key_a"),
        F.when(F.col("id_a") < F.col("id_b"), F.col("key_b"))
        .otherwise(F.col("key_a"))
        .alias("key_b"),
    ).distinct()
    return oriented.withColumn("lev", F.levenshtein("key_a", "key_b")).filter(
        F.col("lev") <= 1
    )
