"""Distributed exact order-statistic selection (two-pass histogram
rank-locate) — the scale-safe replacement for `row_number() OVER
(ORDER BY v)` on a raw fact table.

A global (or 2-partition per-class) row_number funnels the whole fact
through O(1) partitions: at 100 TB that is one executor sorting
everything. The classic fix (this module; same shape as
`q_two_pass_median`, which the r6 verdict named as the recipe):

pass 1  histogram the fact into `n_buckets` integer value-range bins —
        a combinable groupBy count — and locate, per requested rank k,
        the bin where the cumulative count crosses k (the cumsum runs
        over the BUCKET table: n_buckets rows per group, never the
        fact);
pass 2  sort ONLY the located bins (~n/n_buckets of the fact each,
        parallel across groups x ranks) and pick the residual rank.

Every step is integer arithmetic, so the selected values are exactly
the ones the naive global sort yields (ties in v cannot change the
k-th smallest VALUE), which keeps the plain-rank DuckDB oracles of the
call sites valid unchanged.

Degenerate input (all values equal) collapses to one bucket and pass 2
becomes the naive sort — correct, just not accelerated.

Used by: fd_bin_width, qq_table, winsorized_mean (r6 verdict item #4).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

RankSpec = tuple[str, Callable[[Column], Column]]


def rank_pick(
    df: DataFrame,
    value_col: str,
    ranks: Sequence[RankSpec],
    group_cols: Sequence[str] = (),
    n_buckets: int = 1024,
) -> DataFrame:
    """Return one row per group x rank label with the exact k-th
    smallest value of ``value_col`` (BIGINT) in that group.

    ``ranks``: (label, k_of_n) pairs where ``k_of_n`` maps the group
    count column to a 1-based integer rank (use integer arithmetic —
    e.g. ``lambda n: F.expr("(n + 3) div 4")``).

    Output columns: ``*group_cols, rank_label, v, n, lo, hi`` (n/lo/hi
    are the group count / min / max, which call sites usually need
    anyway and that pass 1 computes for free).
    """
    g = list(group_cols)
    v = F.col(value_col)
    base = df.select(*g, v.alias("v"))

    stats = base.groupBy(*g).agg(
        F.count("*").alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
    binned = (
        base.join(F.broadcast(stats), g)
        if g
        else base.crossJoin(F.broadcast(stats))
    ).select(
        *g,
        "v",
        "n",
        "lo",
        "hi",
        # r11: width-based bucketing — ((v-lo)*n_buckets) overflows
        # BIGINT once the value range nears 2^63/n_buckets (ANSI mode
        # errors; legacy mode silently mis-buckets), and large-SF
        # micro-unit magnitudes get there. (v-lo) div ceil-width is
        # overflow-free for any range that itself fits in BIGINT, is
        # monotone in v, and keeps ties in one bucket — the three
        # properties the rank arithmetic relies on; the picked values
        # are invariant to bucket layout.
        F.expr(f"(v - lo) div ((hi - lo) div {n_buckets} + 1)").alias("b"),
    )

    hist = binned.groupBy(*g, "b").agg(F.count("*").alias("c"))
    w_cum = (
        Window.partitionBy(*g).orderBy("b").rowsBetween(
            Window.unboundedPreceding, -1
        )
        if g
        else Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = hist.withColumn(
        "cum_before", F.coalesce(F.sum("c").over(w_cum), F.lit(0))
    )
    cum = (
        cum.join(F.broadcast(stats), g)
        if g
        else cum.crossJoin(F.broadcast(stats))
    )

    # one exploded pass locates EVERY rank: a per-rank union would
    # re-evaluate the histogram subtree once per rank (9x for decile
    # call sites — measured +1.2 s at sf0.1 before this form)
    rk = F.array(
        *[
            F.struct(
                F.lit(label).alias("rank_label"),
                k_of_n(F.col("n")).cast("long").alias("k"),
            )
            for label, k_of_n in ranks
        ]
    )
    located = (
        cum.select(*g, "b", "c", "cum_before", F.explode(rk).alias("rk"))
        .filter(
            (F.col("cum_before") < F.col("rk.k"))
            & (F.col("cum_before") + F.col("c") >= F.col("rk.k"))
        )
        .select(
            *g,
            F.col("rk.rank_label").alias("rank_label"),
            F.col("b").alias("target_b"),
            (F.col("rk.k") - F.col("cum_before")).alias("resid"),
        )
    )

    ren = located.withColumnsRenamed({c: f"_g_{c}" for c in g})
    cond = F.col("b") == F.col("target_b")
    for c in g:
        cond = cond & (F.col(c) == F.col(f"_g_{c}"))
    pass2 = binned.join(F.broadcast(ren), cond)
    w_in = Window.partitionBy(*g, "rank_label").orderBy("v")
    picked = (
        pass2.withColumn("rn", F.row_number().over(w_in))
        .filter(F.col("rn") == F.col("resid"))
        .select(*g, "rank_label", "v", "n", "lo", "hi")
    )
    return picked


def with_global_rank(
    df: DataFrame,
    key_col: str,
    tiebreak_cols: Sequence[str] = (),
    rank_col: str = "i",
    n_buckets: int = 1024,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Append the 1-based `row_number() OVER ([PARTITION BY
    group_cols] ORDER BY key_col, *tiebreak_cols)` WITHOUT funnelling
    any group through a single partition: two-level prefix-sum (r6
    verdict item #7 — gini/lorenz upgrade path; grouped form added
    for the low-cardinality-partition sweeps, e.g. a 5-valued
    event_type whose per-key windows would each sort n/5 rows).

    level 1  range-bucket every row on the BIGINT ``key_col`` (per
             group min/max from a combinable agg, broadcast back);
             count rows per (group, bucket); exclusive-cumsum those
             counts over the bucket table — n_buckets rows PER GROUP,
             windowed per group, never the data;
    level 2  row_number within each (group, bucket) — parallel across
             groups x buckets, ~|group|/n_buckets rows each — global
             rank = bucket offset + within-bucket rank.

    Bucketing on ``key_col`` preserves the (key, tiebreaks) order
    because bucket id is monotone in key; ties on key never straddle
    buckets, so tiebreak ordering stays entirely within one bucket's
    window. Row-for-row identical to the naive window, keeping
    plain-rank DuckDB oracles valid unchanged. ``group_cols`` values
    are assumed broadcastable (bounded group count).
    """
    tb = list(tiebreak_cols)
    g = list(group_cols)
    rng = df.groupBy(*g).agg(
        F.min(key_col).alias("_lo"), F.max(key_col).alias("_hi")
    )
    joined = (
        df.join(F.broadcast(rng), g)
        if g
        else df.crossJoin(F.broadcast(rng))
    )
    key_type = dict(df.dtypes).get(key_col, "bigint")
    if key_type in ("double", "float"):
        # r11: double keys (ratios, scores) bucket through double
        # arithmetic — floor of a monotone affine map, so bucket id
        # stays monotone in the key and key-ties share a bucket; the
        # degenerate all-equal range collapses to bucket 0. Ranks are
        # identical to the naive window because (key, *tiebreaks)
        # ordering is resolved entirely inside one bucket's window.
        bucket = F.when(
            F.col("_hi") == F.col("_lo"), F.lit(0)
        ).otherwise(
            F.least(
                F.floor(
                    (F.col(key_col) - F.col("_lo"))
                    / ((F.col("_hi") - F.col("_lo")) / F.lit(n_buckets))
                ),
                F.lit(n_buckets - 1),
            )
        )
    else:
        # overflow-free width form — see rank_pick's bucket note
        bucket = F.expr(
            f"({key_col} - _lo) div ((_hi - _lo) div {n_buckets} + 1)"
        )
    binned = joined.withColumn("_b", bucket)
    w_off = (
        Window.partitionBy(*g).orderBy("_b")
        if g
        else Window.orderBy("_b")
    ).rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        binned.groupBy(*g, "_b")
        .agg(F.count("*").alias("_c"))
        .withColumn("_off", F.coalesce(F.sum("_c").over(w_off), F.lit(0)))
        .drop("_c")
    )
    w_in = Window.partitionBy(*g, "_b").orderBy(key_col, *tb)
    return (
        binned.join(F.broadcast(offsets), [*g, "_b"])
        .withColumn(rank_col, F.col("_off") + F.row_number().over(w_in))
        .drop("_b", "_off", "_lo", "_hi")
    )


def with_global_cumsum(
    df: DataFrame,
    key_col: str,
    value_col: str,
    cum_col: str = "cum",
    n_buckets: int = 1024,
) -> DataFrame:
    """Append the inclusive running sum of ``value_col`` in ``key_col``
    order WITHOUT a single-partition sort — the same two-level
    prefix-sum as :func:`with_global_rank` but summing an arbitrary
    BIGINT column (sweep lines, shard planners, Lorenz-style
    accumulations). ``key_col`` must be BIGINT and unique per row
    (pre-aggregate duplicates first); only the n_buckets-row bucket
    table ever crosses one partition."""
    rng = df.agg(F.min(key_col).alias("_lo"), F.max(key_col).alias("_hi"))
    binned = df.crossJoin(F.broadcast(rng)).withColumn(
        "_b",
        # overflow-free width form -- see rank_pick's bucket note
        F.expr(f"({key_col} - _lo) div ((_hi - _lo) div {n_buckets} + 1)"),
    )
    offsets = (
        binned.groupBy("_b")
        .agg(F.sum(value_col).alias("_s"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_s").over(
                    Window.orderBy("_b").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .drop("_s")
    )
    w_in = Window.partitionBy("_b").orderBy(key_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        binned.join(F.broadcast(offsets), "_b")
        .withColumn(cum_col, F.col("_off") + F.sum(value_col).over(w_in))
        .drop("_b", "_off", "_lo", "_hi")
    )


def with_global_running_max(
    df: DataFrame,
    key_col: str,
    value_col: str,
    out_col: str = "run_max",
    descending: bool = False,
    n_buckets: int = 1024,
) -> DataFrame:
    """Append the EXCLUSIVE running max of ``value_col`` over rows
    whose ``key_col`` sorts strictly before this row (ascending, or
    strictly after when ``descending``) — NULL when no such row.
    Same two-level shape as :func:`with_global_cumsum`: per-bucket
    maxima, an exclusive cummax over the n_buckets-row bucket table,
    an exclusive within-bucket window, then max of the two (skyline /
    dominance and record-breaking scans without a global sort).
    ``key_col`` must be BIGINT and unique per row (pre-aggregate
    ties first — running-max-with-ties is order-ambiguous)."""
    rng = df.agg(F.min(key_col).alias("_lo"), F.max(key_col).alias("_hi"))
    binned = df.crossJoin(F.broadcast(rng)).withColumn(
        "_b",
        # overflow-free width form -- see rank_pick's bucket note
        F.expr(f"({key_col} - _lo) div ((_hi - _lo) div {n_buckets} + 1)"),
    )
    order_b = F.col("_b").desc() if descending else F.col("_b").asc()
    order_k = F.col(key_col).desc() if descending else F.col(key_col).asc()
    offsets = (
        binned.groupBy("_b")
        .agg(F.max(value_col).alias("_m"))
        .withColumn(
            "_boff",
            F.max("_m").over(
                Window.orderBy(order_b).rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
        )
        .drop("_m")
    )
    w_in = Window.partitionBy("_b").orderBy(order_k).rowsBetween(
        Window.unboundedPreceding, -1
    )
    within = F.max(value_col).over(w_in)
    boff = F.col("_boff")
    return (
        binned.join(F.broadcast(offsets), "_b")
        .withColumn(
            out_col,
            F.when(boff.isNull(), within)
            .when(within.isNull(), boff)
            .otherwise(F.greatest(boff, within)),
        )
        .drop("_b", "_boff", "_lo", "_hi")
    )
