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
) -> int:
    """Small-files compaction — the table-maintenance pass every
    long-lived 100 TB dataset needs. Streaming sinks, frequent small
    batches and over-parallel writers each leave thousands of tiny
    part files; every subsequent scan then pays per-file open/footer
    costs and the NameNode/object-store pays the metadata. Compaction
    rewrites the data into files near ``target_file_bytes``.

    File count comes from the source's TOTAL ON-DISK BYTES (metadata
    listing only — no data pass), not a row count. The rewrite is one
    ``coalesce`` when shrinking (narrow — no shuffle: tasks just read
    multiple input files each) and a round-robin ``repartition`` only
    when the source has too FEW partitions for the target (growing
    file count requires redistribution anyway). Returns the file count
    written.
    """
    import math
    import os

    total = 0
    for root, _dirs, files in os.walk(src_path):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if not f.startswith(("_", "."))
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
        # cluster rows by partition value so each value writes one
        # file (up to n_files tasks), instead of every task emitting a
        # sliver into every partition dir — small files all over again
        out = df.repartition(n_files, *parts)
        out.write.mode(mode).partitionBy(*parts).parquet(dst_path)
        return n_files
    if df.rdd.getNumPartitions() >= n_files:
        out = df.coalesce(n_files)
    else:
        out = df.repartition(n_files)
    out.write.mode(mode).parquet(dst_path)
    return n_files
