"""Sequence packing for LLM pretraining — concat-then-chunk block
assignment (GPT-style) as pure window arithmetic.

Pretraining dataloaders concatenate the token streams of consecutive
documents and slice the stream into fixed-size context blocks; a doc
whose tokens straddle a block boundary spans two (or more) blocks.
This operator computes, per document, its token offset interval and
the blocks it lands in — the exact metadata a packer/loader needs —
without materializing tokens: only per-doc token *counts* flow
through the plan.

Scale design: a single global stream would force a total order (one
giant sort + one window partition = one task). Instead documents are
sharded by hash of the id; each shard is an independent stream packed
in id order, and block ids are globally unique as ``(shard, block)``.
At 100 TB that is ``shards`` independent window partitions — pick
``shards`` ≳ executor count and the whole thing is one shuffle with
even, bounded partitions. Determinism: shard assignment and in-shard
order depend only on the id column, never on physical layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_blocks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_tokens: int = 256,
    shards: int = 8,
) -> DataFrame:
    """Per-document block assignment:

    ``(doc_id, shard, n_tokens, start_offset, first_block,
    last_block, blocks_spanned)``

    Tokenization is whitespace-split (the engine's cheap stand-in for
    a real tokenizer; token *counts* are all packing needs). Offsets
    are exclusive prefix sums within the shard's id-ordered stream."""
    w = Window.partitionBy("shard").orderBy(id_col)
    return (
        docs.select(
            id_col,
            F.pmod(F.col(id_col), F.lit(shards)).alias("shard"),
            F.size(F.split(F.col(text_col), " ")).alias("n_tokens"),
        )
        .withColumn(
            "start_offset",
            F.coalesce(
                F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0).cast("long"),
            ),
        )
        .withColumn(
            "first_block", F.floor(F.col("start_offset") / block_tokens)
        )
        .withColumn(
            "last_block",
            F.floor(
                (F.col("start_offset") + F.col("n_tokens") - 1) / block_tokens
            ),
        )
        .withColumn(
            "blocks_spanned", F.col("last_block") - F.col("first_block") + 1
        )
    )
