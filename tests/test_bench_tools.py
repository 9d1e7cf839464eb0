"""Bench tooling: the two-line bench.py output contract and the
bench_compare loader that consumes it (plus driver BENCH_r*.json
wrappers whose "tail" may hold several payload lines, the last one
possibly truncated — the round-6 failure mode)."""

from __future__ import annotations

import importlib.util
import json
from pathlib import Path


def _load_module():
    spec = importlib.util.spec_from_file_location(
        "bench_compare_m",
        Path(__file__).resolve().parents[1] / "scripts" / "bench_compare.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_loader_prefers_last_detailed_payload(tmp_path):
    mod = _load_module()
    detail_old = {"metric": "headline_queries_detail", "value": 9.9, "queries": {"q": 9.9}}
    detail_new = {"metric": "headline_queries_detail", "value": 1.0, "queries": {"q": 1.0}}
    compact = {"metric": "headline_queries_total", "value": 1.0, "n_queries": 1}
    tail = "\n".join(
        ["noise", json.dumps(detail_old), json.dumps(detail_new), json.dumps(compact)]
    )
    p = tmp_path / "BENCH_r07.json"
    p.write_text(json.dumps({"tail": tail}))
    got = mod._load(str(p))
    assert got["queries"] == {"q": 1.0}  # last DETAILED payload, not first


def test_loader_survives_truncated_line(tmp_path):
    """A payload line cut mid-JSON (the tail-buffer failure) must be
    skipped, falling back to the newest complete payload."""
    mod = _load_module()
    detail = {"metric": "headline_queries_detail", "value": 2.0, "queries": {"q": 2.0}}
    truncated = json.dumps({"metric": "x", "queries": {"a": 1}})[:25]
    tail = json.dumps(detail) + "\n" + truncated
    p = tmp_path / "BENCH_trunc.json"
    p.write_text(json.dumps({"tail": tail}))
    assert mod._load(str(p))["queries"] == {"q": 2.0}


def test_loader_compact_only_fallback(tmp_path):
    mod = _load_module()
    compact = {"metric": "headline_queries_total", "value": 3.0, "n_queries": 5}
    p = tmp_path / "BENCH_compact.json"
    p.write_text(json.dumps({"tail": json.dumps(compact)}))
    got = mod._load(str(p))
    assert got["value"] == 3.0 and "queries" not in got


def test_loader_reads_rev_path_spec_from_git(tmp_path):
    """A rev:path argument that isn't a file on disk is read from git
    history — how past rounds' committed BENCH_DETAIL.json stays
    reachable without checkouts."""
    import subprocess

    mod = _load_module()
    repo = tmp_path / "repo"
    repo.mkdir()
    env = {"GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
           "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t"}
    subprocess.run(["git", "init", "-q"], cwd=repo, check=True)
    detail = {"metric": "headline_queries_detail", "value": 3.0, "queries": {"q": 3.0}}
    (repo / "BENCH_DETAIL.json").write_text(json.dumps(detail))
    subprocess.run(["git", "add", "."], cwd=repo, check=True)
    import os as _os

    subprocess.run(
        ["git", "commit", "-q", "-m", "x"], cwd=repo, check=True,
        env={**_os.environ, **env},
    )
    (repo / "BENCH_DETAIL.json").write_text(json.dumps({**detail, "value": 4.0}))

    # _read_text resolves rev:path relative to the scripts dir's repo;
    # point its cwd at the fixture repo via monkey-free injection
    real_run = subprocess.run

    def run_in_fixture(cmd, **kw):
        kw["cwd"] = str(repo)
        return real_run(cmd, **kw)

    mod.subprocess = type(mod.subprocess)("subprocess")
    mod.subprocess.run = run_in_fixture
    got = mod._load("HEAD:BENCH_DETAIL.json")
    assert got["queries"] == {"q": 3.0}  # the COMMITTED payload, not disk
