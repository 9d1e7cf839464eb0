"""CLI test for the unified offline recovery tool
(``python -m bigdata_flightanalysis_spark.fsck``): one tree holding
one of each crash-residue state, checked for both report and heal."""

from __future__ import annotations

import os

from bigdata_flightanalysis_spark import fsck


def _mk(path: str, *files: str) -> None:
    os.makedirs(path, exist_ok=True)
    for f in files:
        with open(os.path.join(path, f), "w") as fh:
            fh.write("x")


def _plant_tree(root: str) -> None:
    # 1. dangling .old — a crash between a flat-store rewrite's renames
    _mk(f"{root}/stores/fp_store.old", "part-0.parquet", "_store_meta.json")
    # 2. stale .old next to a healthy store — swap done, cleanup wasn't
    _mk(f"{root}/stores/band_store", "part-0.parquet")
    _mk(f"{root}/stores/band_store.old", "part-0.parquet")
    # 3. orphaned staging — a crash during a rewrite's staging write
    _mk(f"{root}/stores/vec_store", "part-0.parquet")
    _mk(f"{root}/stores/vec_store.staging", "part-0.parquet")
    # 4. streaming state dir in the two-rename window
    _mk(f"{root}/state/cdc_state.old", "part-0.parquet")
    # 5. index with an unpromoted totals rewrite (crash after the
    #    doc_stats swap, before the corpus_stats swap)
    _mk(f"{root}/idx_promote/postings", "_SUCCESS")
    _mk(f"{root}/idx_promote/doc_stats", "part-0.parquet")
    _mk(f"{root}/idx_promote/corpus_stats", "OLD_TOTALS")
    _mk(f"{root}/idx_promote/corpus_stats.new", "_SUCCESS", "NEW_TOTALS")
    # 6. torn index build — doc_stats listed, postings never completed
    _mk(f"{root}/idx_torn/doc_stats", "part-0.parquet")
    _mk(f"{root}/idx_torn/postings")  # dir created at job start, no _SUCCESS


def test_fsck_dry_run_reports_without_touching(tmp_path, capsys):
    root = str(tmp_path / "tree")
    _plant_tree(root)
    rc = fsck.main([root, "--dry-run"])
    assert rc == 1  # findings present, none healed
    out = capsys.readouterr().out
    assert "interrupted swap" in out and "orphaned staging" in out
    assert "torn build" in out and "UNHEALABLE" in out
    # nothing moved
    assert os.path.exists(f"{root}/stores/fp_store.old")
    assert not os.path.exists(f"{root}/stores/fp_store")
    assert os.path.exists(f"{root}/stores/vec_store.staging")
    assert os.path.exists(f"{root}/idx_promote/corpus_stats.new")
    assert os.path.exists(f"{root}/idx_promote/corpus_stats/OLD_TOTALS")
    # ... and nothing CREATED either: report-only must not take the
    # maintenance locks, whose flock layer materializes .lock files
    created = {
        os.path.join(d, n)
        for d, _dirs, files in os.walk(root)
        for n in files
        if n.endswith(".lock")
    }
    assert not created, created


def test_fsck_heals_every_state_and_flags_torn_build(tmp_path, capsys):
    root = str(tmp_path / "tree")
    _plant_tree(root)
    rc = fsck.main([root])
    out = capsys.readouterr().out
    assert rc == 1  # everything healed except the unhealable torn build
    # 1. dangling .old restored to the live path
    assert os.path.exists(f"{root}/stores/fp_store/part-0.parquet")
    assert not os.path.exists(f"{root}/stores/fp_store.old")
    # 2. stale residue removed, live store intact
    assert os.path.exists(f"{root}/stores/band_store/part-0.parquet")
    assert not os.path.exists(f"{root}/stores/band_store.old")
    # 3. orphaned staging reclaimed
    assert not os.path.exists(f"{root}/stores/vec_store.staging")
    assert os.path.exists(f"{root}/stores/vec_store")
    # 4. state dir restored
    assert os.path.exists(f"{root}/state/cdc_state/part-0.parquet")
    # 5. totals promoted: .new became live corpus_stats
    assert not os.path.exists(f"{root}/idx_promote/corpus_stats.new")
    assert os.path.exists(f"{root}/idx_promote/corpus_stats/NEW_TOTALS")
    assert not os.path.exists(f"{root}/idx_promote/corpus_stats/OLD_TOTALS")
    # 6. torn build reported, not silently "healed"
    assert "torn build" in out and "build_text_index" in out
    assert os.path.exists(f"{root}/idx_torn/doc_stats")

    # second pass: only the torn build remains
    rc2 = fsck.main([root])
    out2 = capsys.readouterr().out
    assert rc2 == 1 and "1 finding(s), 0 healed, 1 remaining" in out2

    # after the documented recovery (rebuild → complete postings), clean
    _mk(f"{root}/idx_torn/postings", "_SUCCESS")
    _mk(f"{root}/idx_torn/corpus_stats", "part-0.parquet")
    assert fsck.main([root]) == 0
    assert "0 finding(s)" in capsys.readouterr().out


def test_fsck_vetoed_totals_removed_not_promoted(tmp_path):
    """A corpus_stats.new whose producing compact crashed BEFORE the
    doc_stats promotion (staging still present) reflects the staged
    relation, not the live one — fsck must remove it, exactly like the
    serve-path recovery rule."""
    root = str(tmp_path / "tree")
    _mk(f"{root}/idx/postings", "_SUCCESS")
    _mk(f"{root}/idx/doc_stats", "part-0.parquet")
    _mk(f"{root}/idx/doc_stats.staging", "part-0.parquet")
    _mk(f"{root}/idx/corpus_stats", "OLD_TOTALS")
    _mk(f"{root}/idx/corpus_stats.new", "_SUCCESS", "NEW_TOTALS")
    assert fsck.main([root]) == 0
    assert not os.path.exists(f"{root}/idx/corpus_stats.new")
    assert not os.path.exists(f"{root}/idx/doc_stats.staging")
    assert os.path.exists(f"{root}/idx/corpus_stats/OLD_TOTALS")


def test_fsck_on_index_root_directly(tmp_path):
    root = str(tmp_path / "idx")
    _mk(f"{root}/postings", "_SUCCESS")
    _mk(f"{root}/doc_stats", "part-0.parquet")
    _mk(f"{root}/corpus_stats.old", "part-0.parquet")
    findings = fsck.fsck_tree(root)
    assert [f["issue"] for f in findings] == ["interrupted swap (no live dir)"]
    assert os.path.exists(f"{root}/corpus_stats/part-0.parquet")


def test_fsck_rejects_non_directory(tmp_path):
    assert fsck.main([str(tmp_path / "nope")]) == 2


def test_fsck_corpus_stats_staging_heal_matches_classification(tmp_path, capsys):
    """fsck classifies ANY <relation>.staging under an index root as
    orphaned-and-reclaimed — including corpus_stats.staging, which no
    current writer creates (totals rewrites go via corpus_stats.new).
    The heal must actually remove it: healed=True with the dir
    persisting would exit 0 while re-reporting the same 'healed'
    finding on every run, breaking the findings-are-what-was-healed
    contract."""
    root = str(tmp_path / "idx")
    _mk(f"{root}/postings", "_SUCCESS")
    _mk(f"{root}/doc_stats", "part-0.parquet")
    _mk(f"{root}/corpus_stats", "TOTALS")
    _mk(f"{root}/corpus_stats.staging", "part-0.parquet")

    rc = fsck.main([root])
    out = capsys.readouterr().out
    assert rc == 0
    assert "corpus_stats.staging" in out and "healed" in out
    assert not os.path.exists(f"{root}/corpus_stats.staging")
    assert os.path.exists(f"{root}/corpus_stats/TOTALS")  # live untouched

    rc2 = fsck.main([root])
    assert rc2 == 0
    assert "0 finding(s)" in capsys.readouterr().out


def test_fsck_heal_loop_races_live_ingest_and_compact(spark, tmp_path):
    """End-to-end proof of the cross-process flock contract: a SECOND
    PROCESS runs `fsck --heal` in a tight loop over a live store tree
    while this process ingests four dedup batches and compacts the
    store between them. The advisory flock must serialize fsck's
    classify+heal against every ingest/rewrite critical section, so:
    zero failed batches, zero lost rows, zero resurrected duplicates —
    and fsck itself never sees an unhealable state (child asserts
    exit 0 on every pass). Static residue planted next to the live
    store gives the heal loop real work on top of the racing."""
    import subprocess
    import sys

    from pyspark.sql import functions as F

    from bigdata_flightanalysis_spark.operators.incremental import (
        compact_flat_store,
        incremental_exact_dedup,
    )

    root = str(tmp_path / "tree")
    store = f"{root}/fp_store"
    os.makedirs(root)
    # real heal work for the loop: residue on SIBLING layouts
    _mk(f"{root}/other.staging", "part-0.parquet")
    _mk(f"{root}/dangling.old", "part-0.parquet")

    stop = str(tmp_path / "stop")
    child_src = (
        "import os, sys, time\n"
        "sys.path.insert(0, sys.argv[3])\n"
        "from bigdata_flightanalysis_spark import fsck\n"
        "root, stop = sys.argv[1], sys.argv[2]\n"
        "n = 0\n"
        "while not os.path.exists(stop):\n"
        "    rc = fsck.main([root])\n"
        "    assert rc == 0, 'fsck saw an unhealable state on a live tree'\n"
        "    n += 1\n"
        "    time.sleep(0.02)\n"
        "print('PASSES', n, flush=True)\n"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.Popen(
        [sys.executable, "-c", child_src, root, stop, repo],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    try:
        # 240 rows / 120 distinct texts, spread over 4 overlapping
        # batches: every text appears in >=2 batches, so any lock gap
        # (a heal racing an append, a compact dropping a batch's rows)
        # shows up as a lost or duplicated survivor.
        docs = spark.range(240).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("text-"), (F.col("id") % 120).cast("string")).alias(
                "text"
            ),
        )
        kept_texts: list[str] = []
        for k in range(4):
            batch = docs.filter(
                (F.col("doc_id") >= k * 60) & (F.col("doc_id") < (k + 1) * 60)
            )
            kept = incremental_exact_dedup(spark, batch, store)
            kept_texts.extend(r["text"] for r in kept.collect())
            if k == 1:
                compact_flat_store(spark, store)
        compact_flat_store(spark, store)
    finally:
        with open(stop, "w") as f:
            f.write("stop")
        out, _ = proc.communicate(timeout=120)
    assert proc.returncode == 0, f"fsck loop failed:\n{out}"
    passes = int(out.strip().rsplit("PASSES", 1)[1])
    assert passes >= 1, "fsck loop never completed a pass"
    # zero lost rows, zero resurrected duplicates
    assert len(kept_texts) == len(set(kept_texts)) == 120
    # the store's history matches: one fingerprint per distinct text
    assert spark.read.parquet(store).distinct().count() == 120
    # the planted residue was healed by the loop
    assert not os.path.exists(f"{root}/other.staging")
    assert not os.path.exists(f"{root}/dangling.old")
    assert os.path.exists(f"{root}/dangling")


def test_fsck_heal_loop_races_bm25_index_lifecycle(spark, tmp_path):
    """The index-layout twin of the store smoke above: a second
    process loops `fsck --heal` over a tree holding a LIVE BM25 index
    while this process runs the full lifecycle — build on half the
    corpus, refresh with an overlapping batch, replay that refresh
    (crash simulation), compact, serve. The flock must serialize
    fsck's classify+heal against every leg, so the raced index serves
    BIT-IDENTICAL results to the inline computation over the full
    corpus, and fsck never observes a torn state (a mid-build window
    where doc_stats exists but postings/_SUCCESS doesn't would exit 1
    — only lock serialization prevents seeing it)."""
    import subprocess
    import sys

    from pyspark.sql import functions as F

    from bigdata_flightanalysis_spark.queries.retrieval import (
        bm25_index_topk,
        build_text_index_from,
        compact_text_index,
        doc_bm25_topk,
        refresh_text_index,
    )
    from bigdata_flightanalysis_spark.sources.readers import read_table

    sf = "/root/testdata/sf0.001"
    root = str(tmp_path / "tree")
    idx = f"{root}/bm25_idx"
    os.makedirs(root)

    stop = str(tmp_path / "stop")
    child_src = (
        "import os, sys, time\n"
        "sys.path.insert(0, sys.argv[3])\n"
        "from bigdata_flightanalysis_spark import fsck\n"
        "root, stop = sys.argv[1], sys.argv[2]\n"
        "n = 0\n"
        "while not os.path.exists(stop):\n"
        "    rc = fsck.main([root])\n"
        "    assert rc == 0, 'fsck saw a torn/unhealable index state'\n"
        "    n += 1\n"
        "    time.sleep(0.02)\n"
        "print('PASSES', n, flush=True)\n"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.Popen(
        [sys.executable, "-c", child_src, root, stop, repo],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    try:
        docs = read_table(spark, sf, "documents").select("doc_id", "text")
        n = docs.count()
        build_text_index_from(spark, docs.where(F.col("doc_id") < n // 2), idx)
        batch2 = docs.where(F.col("doc_id") >= n // 3)  # overlapping
        refresh_text_index(spark, batch2, idx)
        refresh_text_index(spark, batch2, idx)  # crash-replay
        compact_text_index(spark, idx)
        served = [tuple(r) for r in bm25_index_topk(spark, idx).collect()]
    finally:
        with open(stop, "w") as f:
            f.write("stop")
        out, _ = proc.communicate(timeout=120)
    assert proc.returncode == 0, f"fsck loop failed:\n{out}"
    assert int(out.strip().rsplit("PASSES", 1)[1]) >= 1
    inline = [tuple(r) for r in doc_bm25_topk(spark, sf).collect()]
    assert served == inline and len(served) == 10


def test_fsck_heal_loop_races_cdc_stream_and_compaction(spark, tmp_path):
    """Third maintained-layout family under the same cross-process
    proof: `fsck --heal` loops over the state tree while a CDC
    changelog stream commits its micro-batches (foreachBatch
    read-merge-swap) and tombstone GC compacts the state afterwards.
    The snapshot must still equal the batch compaction query — the
    stream==batch contract survives a concurrent healer — and every
    fsck pass exits 0."""
    import subprocess
    import sys

    from pyspark.sql import functions as F

    from bigdata_flightanalysis_spark.queries.catalog import load_all
    from bigdata_flightanalysis_spark.sources.readers import read_table
    from bigdata_flightanalysis_spark.streaming.events import (
        cdc_compact_tombstones,
        cdc_snapshot,
        cdc_upsert_foreach_batch,
        run_foreach_batch,
    )

    sf = "/root/testdata/sf0.001"
    root = str(tmp_path / "tree")
    state = f"{root}/cdc_state"
    os.makedirs(root)

    # stage the events table as 3 files -> one micro-batch per file
    ev = read_table(spark, sf, "events").withColumn(
        "part", F.pmod(F.col("event_id"), F.lit(3))
    )
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    for i in range(3):
        (
            ev.filter(F.col("part") == i)
            .drop("part")
            .coalesce(1)
            .write.mode("append")
            .parquet(src_dir)
        )

    stop = str(tmp_path / "stop")
    child_src = (
        "import os, sys, time\n"
        "sys.path.insert(0, sys.argv[3])\n"
        "from bigdata_flightanalysis_spark import fsck\n"
        "root, stop = sys.argv[1], sys.argv[2]\n"
        "n = 0\n"
        "while not os.path.exists(stop):\n"
        "    rc = fsck.main([root])\n"
        "    assert rc == 0, 'fsck saw an unhealable state-dir state'\n"
        "    n += 1\n"
        "    time.sleep(0.02)\n"
        "print('PASSES', n, flush=True)\n"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.Popen(
        [sys.executable, "-c", child_src, root, stop, repo],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    try:
        src = (
            spark.readStream.schema(read_table(spark, sf, "events").schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
        )
        sink = cdc_upsert_foreach_batch(
            state,
            ["user_id"],
            order_cols=["ts", "event_id"],
            tombstone_col="event_type",
            tombstone_value="error",
        )
        run_foreach_batch(src, sink, checkpoint_dir=str(tmp_path / "ckpt"))
        # retention GC drops only tombstone ROWS the snapshot filters
        # anyway -> snapshot must be invariant under it
        dropped = cdc_compact_tombstones(
            spark,
            state,
            tombstone_col="event_type",
            tombstone_value="error",
            order_col="ts",
            older_than="9999-01-01",
        )
        snap = cdc_snapshot(spark, state, "event_type", "error").select(
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
        )
        got = sorted(tuple(r) for r in snap.collect())
    finally:
        with open(stop, "w") as f:
            f.write("stop")
        out, _ = proc.communicate(timeout=120)
    assert proc.returncode == 0, f"fsck loop failed:\n{out}"
    assert int(out.strip().rsplit("PASSES", 1)[1]) >= 1
    want = sorted(
        tuple(r)
        for r in load_all()["events_cdc_latest_state"].fn(spark, sf).collect()
    )
    assert got == want and len(got) > 0
    assert dropped >= 0


def test_fsck_ignores_live_spark_commit_dirs(tmp_path, capsys):
    """A live Spark writer's `_temporary` commit dir (owned by the
    FileOutputCommitter, deleted at job commit) is not crash residue:
    fsck must neither walk into it nor report anything under it — the
    r13 heal-loop race crashed fsck mid-walk when that dir vanished
    between listing and descent."""
    root = str(tmp_path / "tree")
    # residue-shaped names INSIDE _temporary must be invisible to fsck
    _mk(f"{root}/fp_store/_temporary/0/task_x/x.staging", "part-0")
    _mk(f"{root}/fp_store/_temporary/0/task_x/y.old", "part-0")
    _mk(f"{root}/fp_store", "part-0.parquet")
    rc = fsck.main([root])
    out = capsys.readouterr().out
    assert rc == 0
    assert "_temporary" not in out
    assert "0 finding(s)" in out
    # the live writer's dir is untouched
    assert os.path.exists(f"{root}/fp_store/_temporary/0/task_x/x.staging")


def test_fsck_heal_does_not_resurrect_a_deleted_tree(tmp_path):
    """A live writer can delete a whole tree AFTER the walk snapshots
    its entries but BEFORE the heal loop locks a layout in it (the
    r13-review race: the lockfile's makedirs + O_CREAT would recreate
    the deleted parent and plant a .lock in a dir the writer just
    cleaned). The heal loop must detect the vanished parent, skip, and
    leave NOTHING behind. Exercised at the _fsck_generic seam — the
    exact state fsck_tree hands it when the race fires."""
    import shutil

    parent = str(tmp_path / "tree" / "stores")
    _mk(f"{parent}/fp_store.old", "part-0.parquet")
    entries = sorted(os.listdir(parent))  # the walk's stale snapshot
    shutil.rmtree(str(tmp_path / "tree"))  # concurrent writer cleanup

    findings = fsck._fsck_generic(parent, entries, heal=True)
    assert findings == []
    # the deleted tree stays deleted: no resurrected parent, no lockfile
    assert not os.path.exists(parent)
    assert not os.path.exists(str(tmp_path / "tree"))


def test_fsck_tolerates_dirs_vanishing_mid_walk(tmp_path, monkeypatch):
    """A directory the walk yielded can be deleted by a concurrent
    writer while fsck processes it (the other half of the r13 race).
    Entries now come from the walk's OWN snapshot (no re-listing to
    crash), so the simulation deletes the doomed dir the moment the
    walk reaches it — via the _is_index_root probe, the first
    per-entry call after the snapshot — and fsck must skip it and
    finish the rest of the tree."""
    import shutil

    root = str(tmp_path / "tree")
    doomed = f"{root}/store_a/ephemeral"
    _mk(doomed, "part-0")
    _mk(f"{doomed}/sub.old", "part-0")  # stale residue in the snapshot
    _mk(f"{root}/store_b.old", "part-0.parquet")  # real work elsewhere

    real_probe = fsck._is_index_root

    def racy_probe(path):
        # fire only for entries strictly INSIDE the doomed dir: the
        # walk must still yield the doomed dir itself (with its stale
        # snapshot naming sub.old) so the heal loop's vanished-parent
        # guard is what handles it
        if os.path.abspath(str(path)).startswith(
            os.path.abspath(doomed) + os.sep
        ):
            shutil.rmtree(doomed, ignore_errors=True)
            return False
        return real_probe(path)

    monkeypatch.setattr(fsck, "_is_index_root", racy_probe)
    findings = fsck.fsck_tree(root, heal=True)
    # the vanished dir contributed nothing; the dangling .old healed
    assert [f for f in findings if "store_b" in f["path"]]
    assert all("ephemeral" not in f["path"] for f in findings)
    assert os.path.exists(f"{root}/store_b")  # .old restored to live
    assert not os.path.exists(doomed)  # and nothing resurrected it


def test_fsck_removes_file_shaped_residue(tmp_path):
    """A plain FILE named <store>.old or <store>.staging: rmtree with
    ignore_errors silently no-ops on files, so fsck used to report
    'healed' forever while the residue persisted (r14 review). The
    shared recover_layout removes files too, and healed status is now
    VERIFIED from post-heal disk state."""
    import os

    from bigdata_flightanalysis_spark.fsck import fsck_tree

    store = tmp_path / "store"
    store.mkdir()
    (store / "part-0.parquet").write_bytes(b"x")
    (tmp_path / "store.old").write_bytes(b"stray")       # FILE, not dir
    (tmp_path / "store.staging").write_bytes(b"stray")   # FILE, not dir

    findings = fsck_tree(str(tmp_path), heal=True)
    assert len(findings) == 2
    assert all(f["healed"] for f in findings), findings
    assert not os.path.lexists(tmp_path / "store.old")
    assert not os.path.lexists(tmp_path / "store.staging")
    # second run: clean tree, no recurring findings
    assert fsck_tree(str(tmp_path), heal=True) == []


def test_fsck_removes_file_shaped_index_residue(tmp_path):
    """Index-root twin of the file-shaped residue heal: the index heal
    (_recover_corpus_stats) used bare rmtree(ignore_errors), which
    no-ops on a FILE named <relation>.old/.staging — fsck reported the
    finding unhealed (exit 1) on every run forever (r15 review). The
    index heal now reclaims residue of any shape via util._remove_any,
    like the generic store path has since r14."""
    root = str(tmp_path / "idx")
    _mk(f"{root}/postings", "_SUCCESS")
    _mk(f"{root}/doc_stats", "part-0.parquet")
    with open(f"{root}/postings.old", "w") as fh:  # FILE, not dir
        fh.write("stray")
    with open(f"{root}/doc_stats.staging", "w") as fh:
        fh.write("stray")
    findings = fsck.fsck_tree(root, heal=True)
    assert len(findings) == 2
    assert all(f["healed"] for f in findings), findings
    assert not os.path.lexists(f"{root}/postings.old")
    assert not os.path.lexists(f"{root}/doc_stats.staging")
    # second run: clean, no recurring findings
    assert fsck.fsck_tree(root, heal=True) == []


def test_fsck_reports_unreadable_subtree_as_finding(tmp_path, monkeypatch):
    """An unreadable subtree must surface as an unhealed finding, not
    vanish behind os.walk's default onerror=None — residue behind a
    permission wall used to report '0 findings, exit 0' (r16 review).
    Simulated via a scandir that raises for one subdir (the suite runs
    as root, so a real chmod 000 would not block the walk)."""
    import os

    from bigdata_flightanalysis_spark.fsck import fsck_tree

    blocked = tmp_path / "blocked"
    blocked.mkdir()
    (blocked / "store.old").mkdir()

    real_scandir = os.scandir

    def deny(path=".", *a, **k):
        if os.path.abspath(str(path)) == str(blocked):
            raise PermissionError(13, "Permission denied", str(blocked))
        return real_scandir(path, *a, **k)

    monkeypatch.setattr(os, "scandir", deny)
    findings = fsck_tree(str(tmp_path), heal=False)
    assert any(
        "walk failed" in f["issue"] and not f["healed"] for f in findings
    ), findings
