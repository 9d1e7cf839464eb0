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


def test_loader_accepts_bare_compact_payload(tmp_path):
    """A file holding ONLY bench.py's compact last line (what a
    tail-buffered reader naturally captures) is a totals-only payload,
    not a malformed driver wrapper (r13 review)."""
    mod = _load_module()
    compact = {"metric": "headline_queries_total", "value": 4.5, "n_queries": 9}
    p = tmp_path / "compact.json"
    p.write_text(json.dumps(compact))
    got = mod._load(str(p))
    assert got["value"] == 4.5 and "queries" not in got


def test_loader_bad_rev_spec_shows_gits_error(tmp_path):
    """A bad rev:path spec must surface git's own explanation, not a
    bare CalledProcessError traceback (r13 review)."""
    import pytest

    mod = _load_module()
    with pytest.raises(SystemExit) as exc:
        mod._load("no-such-tag-xyz:BENCH_DETAIL.json")
    assert "git show" in str(exc.value)


def test_compare_reports_queries_missing_from_new_run(tmp_path, capsys):
    """A query that regressed from working to erroring vanishes from
    the new run's timings — the triage output must name it, not print
    a clean comparison (r13 review)."""
    import sys as _sys

    mod = _load_module()
    a = {"metric": "d", "value": 3.0, "queries": {"q1": 1.0, "q_dead": 2.0}}
    b = {"metric": "d", "value": 1.1, "queries": {"q1": 1.1}}
    pa, pb = tmp_path / "a.json", tmp_path / "b.json"
    pa.write_text(json.dumps(a))
    pb.write_text(json.dumps(b))
    old_argv = _sys.argv
    _sys.argv = ["bench_compare.py", str(pa), str(pb)]
    try:
        mod.main()
    finally:
        _sys.argv = old_argv
    out = capsys.readouterr().out
    assert "MISSING from new run" in out and "q_dead" in out


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


def _load_snapshot_module():
    spec = importlib.util.spec_from_file_location(
        "snapshot_driver_detail_m",
        Path(__file__).resolve().parents[1]
        / "scripts"
        / "snapshot_driver_detail.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run_snapshot(mod, monkeypatch, repo, rnd, extra=()):
    import sys

    monkeypatch.setattr(
        sys, "argv", ["snapshot_driver_detail.py", str(rnd), "--repo", str(repo), *extra]
    )
    return mod.main()


def test_snapshot_archives_matching_driver_detail(tmp_path, monkeypatch):
    """Happy path: BENCH_DETAIL.json's headline equals the driver
    wrapper's parsed value → archived as BENCH_DETAIL_driver_r{N}.json;
    a second invocation is a no-op (refuses to overwrite)."""
    mod = _load_snapshot_module()
    detail = {"metric": "headline_queries_detail", "value": 84.57, "queries": {"q": 84.57}}
    (tmp_path / "BENCH_DETAIL.json").write_text(json.dumps(detail))
    (tmp_path / "BENCH_r11.json").write_text(
        json.dumps({"parsed": {"value": 84.57, "sf": 0.1}})
    )
    assert _run_snapshot(mod, monkeypatch, tmp_path, 11) == 0
    out = tmp_path / "BENCH_DETAIL_driver_r11.json"
    assert json.loads(out.read_text())["value"] == 84.57
    out.write_text(json.dumps({"value": -1}))  # canary
    assert _run_snapshot(mod, monkeypatch, tmp_path, 11) == 0
    assert json.loads(out.read_text())["value"] == -1, "overwrote without --force"


def test_snapshot_refuses_clobbered_detail(tmp_path, monkeypatch):
    """The failure the script exists to catch: a later builder run
    already overwrote BENCH_DETAIL.json, so its headline disagrees
    with the driver wrapper — exit 1, nothing archived (recover from
    the wrapper tail instead)."""
    mod = _load_snapshot_module()
    (tmp_path / "BENCH_DETAIL.json").write_text(
        json.dumps({"value": 99.99, "queries": {}})
    )
    (tmp_path / "BENCH_r11.json").write_text(
        json.dumps({"parsed": {"value": 84.57}})
    )
    assert _run_snapshot(mod, monkeypatch, tmp_path, 11) == 1
    assert not (tmp_path / "BENCH_DETAIL_driver_r11.json").exists()


def test_snapshot_missing_artifacts_exit_2(tmp_path, monkeypatch):
    mod = _load_snapshot_module()
    assert _run_snapshot(mod, monkeypatch, tmp_path, 11) == 2


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_m", Path(__file__).resolve().parents[1] / "bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_emit_detail_survives_non_serializable_payload(tmp_path, capsys):
    """A non-serializable value in the detail payload (e.g. an
    exception object recorded as an error) must be stringified, not
    abort the run between the detail line and the compact contract
    line (r13 driver ADVICE: the old guard caught only OSError)."""
    bench = _load_bench()
    detail_path = str(tmp_path / "BENCH_DETAIL.json")
    full = {
        "metric": "headline_queries_detail",
        "value": 1.0,
        "errors": {"q1": RuntimeError("boom")},  # json.dump would raise TypeError
    }
    bench.emit_detail(full, detail_path)  # must not raise
    out = capsys.readouterr().out.strip().splitlines()
    payload = json.loads(out[-1])  # stdout detail line is complete JSON
    assert "boom" in payload["errors"]["q1"]
    on_disk = json.loads(Path(detail_path).read_text())  # file written too
    assert "boom" in on_disk["errors"]["q1"]


def test_emit_detail_survives_circular_payload_and_bad_path(tmp_path, capsys):
    """Failures default=str can't absorb (circular payload → ValueError)
    and filesystem failures both degrade to a stderr warning — the
    caller's compact line must remain reachable."""
    bench = _load_bench()
    circular: dict = {"metric": "headline_queries_detail"}
    circular["self"] = circular
    bench.emit_detail(circular, str(tmp_path / "d.json"))  # must not raise
    captured = capsys.readouterr()
    assert "not serializable" in captured.err
    assert "could not write" in captured.err
    # the stdout detail line degrades to a complete placeholder object
    placeholder = json.loads(captured.out.strip().splitlines()[-1])
    assert placeholder["metric"] == "headline_queries_detail"
    # unwritable path (a directory) → OSError branch, same degradation
    bench.emit_detail({"value": 1.0}, str(tmp_path))  # must not raise
    assert "could not write" in capsys.readouterr().err


def test_compare_placeholder_payload_gets_diagnostic_not_keyerror(tmp_path):
    """bench's serialization-failure placeholder carries only
    metric+error — compare must exit with a diagnostic naming the bad
    payload, not a KeyError traceback (r15 review)."""
    import json

    import pytest

    from scripts import bench_compare as BC

    good = tmp_path / "good.json"
    good.write_text(json.dumps({"metric": "m", "value": 1.0}))
    bad = tmp_path / "bad.json"
    bad.write_text(
        json.dumps({"metric": "headline_queries_detail", "error": "boom"})
    )
    import sys

    argv = sys.argv
    sys.argv = ["bench_compare.py", str(good), str(bad)]
    try:
        with pytest.raises(SystemExit, match="not a bench result"):
            BC.main()
    finally:
        sys.argv = argv
