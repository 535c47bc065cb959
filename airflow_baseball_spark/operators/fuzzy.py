"""Fuzzy (edit-distance) self-join via deletion-neighborhood blocking
— entity resolution for near-identical identifiers (names, URLs,
SKUs) without the all-pairs comparison that kills it at scale.

The FastSS/SymDelete observation (Bocek et al., "Fast Similarity
Search in Large Dictionaries", 2007; popularized by SymSpell): two
strings within Levenshtein distance 1 — one substitution, insertion,
or deletion — always share a member of each other's *deletion
neighborhood* (the string itself plus every single-character
deletion). So blocking on those ``len+1`` keys finds every candidate
pair, and an exact ``levenshtein`` check on the candidates removes
the false positives.

Scale posture: the explode emits ``len+1`` rows per string — linear,
not quadratic; the self-join shuffles on the deletion key whose
bucket sizes are near-neighbor counts, never corpus size; the verify
runs only on candidates. All expression-level (sequence/transform/
substring/levenshtein are native Catalyst functions — no Python).
The ``id_a < id_b`` ordering both halves the join output and dedupes
the symmetric pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_neighborhood(col: str) -> F.Column:
    """Array of the string itself plus every delete-one-char variant
    (the distance-1 blocking keys). array_distinct matters: deleting
    any character of a same-character run yields ONE variant (e.g. the
    zero-run in "Customer#000000012" collapses 7 deletions to 1), and
    duplicate keys inflate the self-join quadratically per pair."""
    return F.array_distinct(
        F.expr(
            f"concat(array({col}), transform(sequence(1, length({col})), "
            f"i -> concat(substring({col}, 1, i - 1), "
            f"substring({col}, i + 1, length({col})))))"
        )
    )


def fuzzy_self_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_distance: int = 1,
) -> DataFrame:
    """(id_a, id_b) pairs whose ``text_col`` values are within
    ``max_distance`` (must be 1 — the deletion neighborhood blocks
    exactly distance-1 edits) Levenshtein distance, id_a < id_b."""
    if max_distance != 1:
        raise ValueError("deletion-neighborhood blocking covers distance 1 only")
    from airflow_baseball_spark.partitioning import spread

    # r11 (optimization): a small dictionary scans as ONE split, and the
    # broadcast hash join keeps the neighborhood explode AND the whole
    # candidate verify (tens of levenshteins per input row) on that
    # single task — spread() BEFORE the explode buys full-cluster
    # parallelism for both join sides and is a no-op once the scan
    # itself yields >= defaultParallelism splits.
    keyed = spread(df).select(
        F.col(id_col).alias("_fid"),
        F.col(text_col).alias("_ftxt"),
        F.explode(deletion_neighborhood(text_col)).alias("_fkey"),
    )
    a = keyed.select(
        F.col("_fid").alias("id_a"), F.col("_ftxt").alias("_txt_a"), "_fkey"
    )
    b = keyed.select(
        F.col("_fid").alias("id_b"), F.col("_ftxt").alias("_txt_b"), "_fkey"
    )
    # Verify BEFORE dedup: levenshtein is in-row and runs in the same
    # stage as the join, so false candidates die without ever being
    # shuffled; the distinct then carries only surviving (id, id)
    # pairs — two longs — instead of every candidate with both text
    # payloads (measured 6.0s → ~2s at sf0.1, where the blocking join
    # emits ~2M candidates of which a fraction survive).
    return (
        a.join(b, ["_fkey"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.levenshtein("_txt_a", "_txt_b") <= max_distance)
        )
        .select("id_a", "id_b")
        .distinct()  # pairs can share several deletion keys
    )
