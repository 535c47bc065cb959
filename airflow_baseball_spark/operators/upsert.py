"""Idempotent keyed upsert — Spark analog of MySQL
``INSERT … ON DUPLICATE KEY UPDATE`` (``dags/utils/queries.py:5-261``).

Two layers:

* :func:`upsert_dataframe` — the pure transformation: given the current
  target rows and an updates batch, return the post-merge state
  ("latest wins" per key). Deterministic: ordering is by an explicit
  version column, tie-broken on all non-key columns, so re-running the
  same batch is a no-op (the reference's ON DUPLICATE KEY contract).
* :func:`merge_upsert` — the storage operation: read target parquet if
  present, apply :func:`upsert_dataframe`, overwrite. On a Delta/Iceberg
  deployment this would be ``MERGE INTO`` (jars not in this image —
  gated behind an import-try in :func:`_try_delta_merge`); the
  parquet path is the portable fallback.

Column-wise merge semantics: the reference's metric stages each upsert
only *their* columns (wOBA, then wRC, then k/bb/babip …) into the same
row. ``update_cols`` restricts the merge accordingly: unlisted columns
keep the target's existing value when a key matches.

Scale: the union+window dedup shuffles once on the key. For a 100 TB
target this is exactly what Delta MERGE does under the hood minus the
file-level pruning; partition the target (e.g. by game_date) so the
overwrite touches only affected partitions (``partition_by``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def upsert_dataframe(
    target: DataFrame | None,
    updates: DataFrame,
    keys: Sequence[str],
    update_cols: Sequence[str] | None = None,
    version_col: str | None = None,
) -> DataFrame:
    """Return the merged state of ``target`` after applying ``updates``.

    * rows in ``updates`` whose key exists in ``target`` replace the
      target values of ``update_cols`` (all non-key columns if None);
    * new keys are inserted (missing non-updated columns become NULL);
    * duplicate keys *within* ``updates`` keep the highest
      ``version_col`` (falling back to "any one, deterministically" via
      a total order over all columns).
    """
    keys = list(keys)
    if target is None:
        merged = _dedup_latest(updates, keys, version_col)
        return merged

    if update_cols is None:
        update_cols = [c for c in updates.columns if c not in keys]
    update_cols = list(update_cols)

    upd = _dedup_latest(updates.select(*keys, *update_cols), keys, version_col)
    # Column-wise merge: matched rows take the update's value per
    # update_col, keep target's value for everything else; new keys get
    # NULL for non-updated target columns.
    upd_aliased = upd.select(
        *[F.col(k).alias(f"__u_{k}") for k in keys],
        *[F.col(c).alias(f"__u_{c}") for c in update_cols],
        F.lit(True).alias("__matched"),
    )
    cond = [target[k] == upd_aliased[f"__u_{k}"] for k in keys]
    joined = target.join(upd_aliased, cond, "full_outer")

    out_cols = []
    for c in target.columns:
        if c in keys:
            out_cols.append(F.coalesce(target[c], upd_aliased[f"__u_{c}"]).alias(c))
        elif c in update_cols:
            out_cols.append(
                F.when(F.col("__matched").isNotNull(), upd_aliased[f"__u_{c}"])
                .otherwise(target[c])
                .alias(c)
            )
        else:
            out_cols.append(target[c].alias(c))
    return joined.select(*out_cols)


def _dedup_latest(
    df: DataFrame, keys: Sequence[str], version_col: str | None
) -> DataFrame:
    order = []
    if version_col is not None:
        order.append(F.col(version_col).desc_nulls_last())
    # Deterministic tie-break: total order over remaining columns.
    order.extend(
        F.col(c).desc_nulls_last() for c in df.columns if c not in keys and c != version_col
    )
    if not order:
        return df.dropDuplicates(list(keys))
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(
    spark: SparkSession,
    updates: DataFrame,
    target_path: str,
    keys: Sequence[str],
    update_cols: Sequence[str] | None = None,
    version_col: str | None = None,
    partition_by: Sequence[str] | None = None,
    version_wins: bool = False,
) -> None:
    """Merge ``updates`` into the parquet table at ``target_path``.

    Two matched-key semantics:

    * ``version_wins=False`` (default): the updates batch replaces the
      stored row unconditionally — MySQL ON DUPLICATE KEY UPDATE
      parity (`dags/utils/queries.py:5-261`), where "latest" means
      "the batch being applied".
    * ``version_wins=True``: keep the row with the highest
      ``version_col`` across BOTH the stored table and the batch (same
      total order as :func:`_dedup_latest`). This is the CDC-apply
      contract: out-of-order batches cannot regress a newer stored
      row, and the merge is associative across any batch slicing.
      Requires ``updates`` to carry the full row schema
      (``update_cols`` unsupported)."""
    if version_wins and update_cols is not None:
        raise ValueError("version_wins merges full rows; update_cols unsupported")
    if not version_wins and _try_delta_merge(
        spark, updates, target_path, keys, update_cols
    ):
        return
    _recover_backup(spark, target_path)
    # Existence is decided by the filesystem, not by catching read
    # errors: a blanket except would treat a corrupt footer or a
    # transient FS fault as "table missing" and silently rebuild the
    # target from the batch alone.
    if _path_exists(spark, target_path):
        target = spark.read.parquet(target_path)
    else:
        target = None
    if version_wins:
        both = updates if target is None else target.unionByName(updates)
        merged = _dedup_latest(both, list(keys), version_col)
    else:
        merged = upsert_dataframe(target, updates, keys, update_cols, version_col)
    # Parquet cannot overwrite a path that the merged plan still reads
    # lazily; stage to a sibling path and swap (distributed — no
    # driver-side collect). Delta MERGE avoids the rewrite entirely.
    if target is None:
        writer = merged.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target_path)
        return
    tmp_path = target_path.rstrip("/") + "__staging"
    writer = merged.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp_path)
    _swap_paths(spark, tmp_path, target_path)


def merge_upsert_partitioned(
    spark: SparkSession,
    updates: DataFrame,
    target_path: str,
    keys: Sequence[str],
    partition_col: str,
    update_cols: Sequence[str] | None = None,
    version_col: str | None = None,
) -> list:
    """Partition-pruned upsert — the 100 TB shape of :func:`merge_upsert`.

    A daily batch touches a handful of partitions of a huge target
    (the reference's per-run upserts always land on "today":
    `dags/030_scrape_today_games_time.py:44-56`). Rewriting the whole
    table for that is the scale-killer; this variant:

    1. lists the partitions present in ``updates`` (one tiny distinct
       — bounded by the batch, never the target),
    2. reads ONLY those partitions of the target (the ``isin`` filter
       prunes directories at the source),
    3. merges, and dynamically overwrites just those partitions
       (``partitionOverwriteMode=dynamic`` leaves all other partition
       directories untouched on disk).

    The merged frame is ``localCheckpoint``-ed before the overwrite:
    it is bounded (batch-sized), and materializing it breaks the
    self-read the overwrite would otherwise reject. Returns the list
    of partition values rewritten."""
    parts = [r[0] for r in updates.select(partition_col).distinct().collect()]
    # fs-existence check, not try/except around the read: any real read
    # error (corrupt file, permissions, transient FS fault) must
    # propagate — swallowing it here would dynamic-overwrite the
    # touched partitions with batch-only rows, dropping every
    # pre-existing row whose key is not in the batch.
    if _path_exists(spark, target_path):
        target = spark.read.parquet(target_path).filter(
            F.col(partition_col).isin(parts)
        )
    else:
        target = None
    merged = upsert_dataframe(
        target, updates, keys, update_cols, version_col
    ).localCheckpoint()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(
            target_path
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return parts


def _fs_paths(spark: SparkSession, *paths: str):
    """(FileSystem, Path...) for HDFS-compatible stores and local FS."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    ps = [jvm.org.apache.hadoop.fs.Path(p) for p in paths]
    return (ps[0].getFileSystem(conf), *ps)


def _path_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` holds a readable table: a file, or a directory
    containing at least one visible data file (recursively, so
    partitioned layouts count). A leftover EMPTY directory — e.g. from
    an interrupted first write — is "missing", not "unreadable": a
    bare ``fs.exists`` would send it down the read path and fail
    schema inference forever until someone removed the dir by hand.
    Genuinely unreadable data (corrupt footer, FS fault) still fails
    loudly in the subsequent read."""
    fs, p = _fs_paths(spark, path)
    if not fs.exists(p):
        return False
    if fs.getFileStatus(p).isFile():
        return True
    base = p.toUri().getPath().rstrip("/")
    it = fs.listFiles(p, True)
    while it.hasNext():
        f = it.next().getPath().toUri().getPath()
        # every path SEGMENT below the base must be visible: a part
        # file under an interrupted write's _temporary/ subtree is
        # invisible to spark.read and must not count as data
        rel = f[len(base) :].lstrip("/")
        if all(not seg.startswith(("_", ".")) for seg in rel.split("/")):
            return True
    return False


def _backup_path(dst: str) -> str:
    return dst.rstrip("/") + "__backup"


def _recover_backup(spark: SparkSession, dst: str) -> None:
    """Roll forward from a crash between :func:`_swap_paths`' two
    renames: if ``dst`` is missing but its backup exists, the backup is
    the ONLY copy of the table — restore it before anything reads (and
    then rewrites) the target. Deleting it instead would permanently
    lose every pre-existing row."""
    fs, dst_p, bak_p = _fs_paths(spark, dst, _backup_path(dst))
    if fs.exists(bak_p) and not fs.exists(dst_p):
        if not fs.rename(bak_p, dst_p):
            raise OSError(
                f"could not restore backup {_backup_path(dst)} to {dst}"
            )


def _swap_paths(spark: SparkSession, src: str, dst: str) -> None:
    """Replace ``dst`` with ``src`` via the Hadoop FileSystem API (works
    on local paths and HDFS-compatible stores alike).

    Crash-safe ordering: rename ``dst`` aside to a backup first, then
    rename ``src`` into place, then drop the backup — a failure at any
    step leaves either the old or the new table fully intact (the
    reference's ON DUPLICATE KEY upsert is transactional; delete-then-
    rename would lose the table if the process died in between)."""
    fs, src_p, dst_p, bak_p = _fs_paths(spark, src, dst, _backup_path(dst))
    if fs.exists(bak_p):
        if not fs.exists(dst_p):
            # prior swap crashed between its two renames: the backup is
            # the only copy — refuse rather than delete it (callers run
            # _recover_backup before reading, so a well-formed merge
            # never reaches this state)
            raise OSError(
                f"backup {_backup_path(dst)} exists but target {dst} is "
                "missing — restore the backup (see _recover_backup) "
                "before swapping"
            )
        fs.delete(bak_p, True)  # stale backup from a crash after the swap
    had_target = fs.exists(dst_p)
    if had_target and not fs.rename(dst_p, bak_p):
        raise OSError(f"could not move {dst} aside to {bak_p}")
    try:
        # rename either returns false or raises (LocalFS raises on a
        # missing source) — treat both as failure and roll back
        ok = fs.rename(src_p, dst_p)
    except Exception:
        ok = False
    if not ok:
        if had_target:
            fs.rename(bak_p, dst_p)  # restore: dst is never left missing
        raise OSError(f"could not rename staging {src} into {dst}")
    fs.delete(bak_p, True)


def _try_delta_merge(
    spark: SparkSession,
    updates: DataFrame,
    target_path: str,
    keys: Sequence[str],
    update_cols: Sequence[str] | None,
) -> bool:
    """Use Delta Lake MERGE when the runtime has it (not in this image)."""
    try:
        from delta.tables import DeltaTable  # type: ignore
    except ImportError:
        return False
    if not DeltaTable.isDeltaTable(spark, target_path):
        return False
    table = DeltaTable.forPath(spark, target_path)
    cond = " AND ".join(f"t.{k} = u.{k}" for k in keys)
    update_cols = update_cols or [c for c in updates.columns if c not in keys]
    (
        table.alias("t")
        .merge(updates.alias("u"), cond)
        .whenMatchedUpdate(set={c: f"u.{c}" for c in update_cols})
        .whenNotMatchedInsertAll()
        .execute()
    )
    return True
