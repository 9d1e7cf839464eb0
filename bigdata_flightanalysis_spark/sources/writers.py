"""Sinks (SURVEY.md §2.1 S3).

The reference writes headered CSV with overwrite
(``Code/flight_analysis.py:244-246``). The engine keeps that sink for
compat and defaults to parquet — columnar, compressed, splittable,
statistics-bearing — which is the only sane sink at 100 TB. Writers
accept partition columns so large outputs lay out for partition
pruning on re-read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(
    df: DataFrame, path: str, *, mode: str = "overwrite", header: bool = True
) -> None:
    """CSV sink (S3) — exact reference shape, ``Code/flight_analysis.py:244-246``."""
    (
        df.write.format("csv")
        .option("header", str(header).lower())
        .mode(mode)
        .save(path)
    )


def write_json(
    df: DataFrame, path: str, *, mode: str = "overwrite", compression: str | None = "gzip"
) -> None:
    """JSON-lines sink — the interchange format for document/training
    corpora. Splittable-enough at scale when written as many compressed
    part files (one per task); never a single driver-side dump."""
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def write_orc(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink — columnar alternative when the downstream reader is
    ORC-native (Hive/Trino estates); same partition-layout options as
    the parquet sink."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_text(df: DataFrame, path: str, *, mode: str = "overwrite",
               compression: str | None = None) -> None:
    """Plain-text sink: requires a single string column (Spark's
    contract); one line per row, one file per task."""
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.text(path)


def _detect_hive_partitions(src_path: str) -> list[str]:
    """Partition columns of a local hive-layout dataset, read off the
    ``col=value`` directory chain (local-fs only — remote URIs pass
    ``partition_by`` explicitly)."""
    import os

    cols: list[str] = []
    cur = src_path
    while True:
        try:
            subdirs = [
                d
                for d in os.listdir(cur)
                if "=" in d and os.path.isdir(os.path.join(cur, d))
            ]
        except OSError:
            return cols
        if not subdirs:
            return cols
        cols.append(subdirs[0].split("=", 1)[0])
        cur = os.path.join(cur, subdirs[0])


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    n_files: int | None = None,
) -> int:
    """Small-files compaction — the table-maintenance pass every
    long-lived 100 TB dataset needs. Streaming sinks, frequent small
    batches and over-parallel writers each leave thousands of tiny
    part files; every subsequent scan then pays per-file open/footer
    costs and the NameNode/object-store pays the metadata. Compaction
    rewrites the data into files near ``target_file_bytes``.

    File count comes from the source's TOTAL ON-DISK BYTES (metadata
    listing only — no data pass), not a row count; the walk skips
    hidden (``_``/``.``-prefixed) files AND directories, matching the
    reader (a crashed write's ``_temporary`` subtree used to inflate
    the byte total and halve every output file, r16 review). The walk
    is LOCAL-ONLY: a remote/URI ``src_path`` must pass ``n_files``
    explicitly — it used to size to total=0 → ONE file, funneling the
    whole dataset through a single task with no error (r16 review).

    The flat rewrite is one ``coalesce`` when shrinking (narrow — no
    shuffle: tasks just read multiple input files each) and a
    round-robin ``repartition`` only when the source has too FEW
    partitions for the target. The hive-partitioned rewrite clusters
    by (partition cols, deterministic row-hash salt) with modulus
    ``ceil(n_files / n_leaf_dirs)`` — per-value file sizing at the
    global average (it used to write ONE file per partition value
    regardless of target: a 5 TB value became a 5 TB file, r16
    review); with no local walk (remote + explicit ``partition_by``)
    the salt modulus falls back to 1 file per value. Returns the file
    count actually written when ``dst_path`` is local, else the
    target count.
    """
    import math
    import os

    from pyspark.sql import functions as F

    total = 0
    leaf_dirs = 0
    for root, dirs, files in os.walk(src_path):
        # prune hidden dirs like the parquet reader does (_temporary,
        # .staging residue) — their bytes are invisible to the read
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        sized = [f for f in files if not f.startswith(("_", "."))]
        if sized:
            leaf_dirs += 1
            total += sum(
                os.path.getsize(os.path.join(root, f)) for f in sized
            )
    if n_files is None:
        if not os.path.isdir(src_path):
            raise ValueError(
                f"compact_parquet sizes output from a local directory "
                f"walk, and {src_path!r} is not a local directory — "
                "pass n_files explicitly for remote/URI datasets"
            )
        n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_path)
    # Preserve the hive partition layout: reading folds col=value dirs
    # into plain columns, so a partition-blind rewrite would FLATTEN
    # the dataset and every downstream reader that pruned on those
    # dirs full-scans from then on — the opposite of what a
    # maintenance pass is for. Auto-detected on local paths; remote
    # callers pass partition_by.
    parts = partition_by if partition_by is not None else _detect_hive_partitions(src_path)
    if parts:
        # cluster rows by (partition value, salt): each value writes
        # up to ceil(n_files/n_leaves) files sized near the global
        # average, instead of every task emitting a sliver into every
        # partition dir (small files) OR one unbounded file per value
        per_value = (
            max(1, math.ceil(n_files / leaf_dirs)) if leaf_dirs else 1
        )
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(per_value)
        )
        out = df.repartition(n_files, *[F.col(p) for p in parts], salt)
        out.write.mode(mode).partitionBy(*parts).parquet(dst_path)
        return _count_parquet_files(dst_path, n_files)
    if df.rdd.getNumPartitions() >= n_files:
        out = df.coalesce(n_files)
    else:
        out = df.repartition(n_files)
    out.write.mode(mode).parquet(dst_path)
    return _count_parquet_files(dst_path, n_files)


def _count_parquet_files(dst_path: str, fallback: int) -> int:
    """Actual data-file count of a just-written local dataset; the
    requested count for remote dsts (no local listing)."""
    import os

    if not os.path.isdir(dst_path):
        return fallback
    n = 0
    for root, dirs, files in os.walk(dst_path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        n += sum(1 for f in files if not f.startswith(("_", ".")))
    return n
