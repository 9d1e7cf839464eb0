#!/usr/bin/env python
"""Core-count scaling spot-check for the most expensive sweep queries
(r17, VERDICT item 7).

The sf0.1 bench fixtures are overhead-dominated: the r16 driver data
showed a median c8/c32 ratio of 0.925 over 52 queries — per-task work
sits below scheduler/launch cost, so bench-SF timings cannot evidence
parallel efficiency. This script generates a corpus large enough that
DATA dominates (synthetic docs/embeddings through the same Python Data
Source the scale smokes use — deterministic per seed, written once and
read back as a normal sf-style directory), then times the top sweep
queries through the REGISTRY path with the noop sink, honouring
``SPARK_GRAFT_CPUS`` exactly like bench.py. Run it once per core
count against the SAME generated directory:

    python scripts/scaling_spotcheck.py --gen /tmp/scale_sfdir --rows 300000
    SPARK_GRAFT_CPUS=32 python scripts/scaling_spotcheck.py --sf /tmp/scale_sfdir
    SPARK_GRAFT_CPUS=8  python scripts/scaling_spotcheck.py --sf /tmp/scale_sfdir

and compare the two JSON lines: a query that parallelises shows
c8/c32 >> 1 (perfect scaling would be 4x). The committed r17 artifact
lives in plans/r17/scaling_spotcheck.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

#: The most expensive r16 driver-sweep queries that are data-dominated
#: candidates (contract-bearing MLlib fits included deliberately: their
#: *fit* is seeded but still distributed work).
QUERIES = (
    "doc_dup_canonical_pagerank",
    "doc_training_manifest",
    "doc_dedup_keep_best",
    "doc_dup_graph_kcore",
    "doc_dup_graph_triangles",
    "embed_ivf_topk",
    "kmeans_embedding_clusters",
)


def generate(gen_dir: str, rows: int, partitions: int, seed: int) -> None:
    """Materialize a deterministic sf-style directory: synthetic docs
    (10k-word vocabulary + 4-clique dup groups — the realistic dup
    density of the analytics smoke, NOT the adversarial 30-word list)
    and synthetic embeddings, both sized ``rows``."""
    from bigdata_flightanalysis_spark.session import get_session
    from bigdata_flightanalysis_spark.sources.pydatasource import (
        SyntheticDocsDataSource,
        SyntheticEmbeddingsDataSource,
    )

    spark = get_session("scaling-gen")
    spark.dataSource.register(SyntheticDocsDataSource)
    spark.dataSource.register(SyntheticEmbeddingsDataSource)
    (
        spark.read.format("synthetic_docs")
        .option("rows", rows)
        .option("partitions", partitions)
        .option("seed", seed)
        .option("vocab", 10_000)
        .option("clique", 3)
        .load()
        .write.mode("overwrite")
        .parquet(f"{gen_dir}/documents.parquet")
    )
    (
        spark.read.format("synthetic_embeddings")
        .option("rows", rows)
        .option("partitions", partitions)
        .option("seed", seed)
        .load()
        .write.mode("overwrite")
        .parquet(f"{gen_dir}/embeddings.parquet")
    )
    print(json.dumps({"generated": gen_dir, "rows": rows, "seed": seed}))
    spark.stop()


def measure(sf_dir: str, reps: int) -> None:
    from bigdata_flightanalysis_spark.queries.catalog import load_all
    from bigdata_flightanalysis_spark.session import get_session

    spark = get_session("scaling-spotcheck")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "(default)")
    reg = load_all()
    out: dict = {
        "metric": "scaling_spotcheck",
        "cpus": cpus,
        "sf_dir": sf_dir,
        "queries": {},
    }
    for name in QUERIES:
        fn = reg[name].fn
        times = []
        try:
            for i in range(reps):
                spark.sparkContext.setJobDescription(f"{name} c{cpus} rep{i}")
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                times.append(round(time.perf_counter() - t0, 2))
        except Exception as exc:  # record, keep measuring the rest
            out["queries"][name] = {"error": str(exc)[:200], "times": times}
            continue
        out["queries"][name] = {"min": min(times), "times": times}
        print(f"# {name}: {times}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen", help="generate the corpus into this dir and exit")
    ap.add_argument("--sf", help="measure against this generated dir")
    ap.add_argument("--rows", type=int, default=300_000)
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    if args.gen:
        generate(args.gen, args.rows, args.partitions, args.seed)
    elif args.sf:
        measure(args.sf, args.reps)
    else:
        ap.error("pass --gen DIR or --sf DIR")


if __name__ == "__main__":
    main()
