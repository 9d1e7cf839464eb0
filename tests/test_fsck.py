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
