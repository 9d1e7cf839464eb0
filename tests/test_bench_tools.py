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


def test_budgeted_per_query_fits_tail_with_contract_line():
    """The per-query compact line + the contract line together must fit
    the driver's 2000-char tail buffer whole (measured: every committed
    BENCH_r*.json archives a tail of exactly 2000 chars) at the real
    registry scale — 69 headline + 107 sweep queries with realistically
    long names — with the slowest queries present and the omitted tail
    disclosed (r16 verdict item 1)."""
    bench = _load_bench()
    timings = {
        f"doc_near_dup_candidates_hl_{i:03d}": 0.1 + (i % 17) * 0.37
        for i in range(69)
    }
    sweep = {
        f"events_value_winsorized_sw_{i:03d}": 0.05 + (i % 23) * 0.31
        for i in range(107)
    }
    line = bench.budgeted_per_query(timings, sweep, 0.1)
    assert "\n" not in line
    assert len(line) <= bench.PER_QUERY_LINE_BUDGET
    contract = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": round(sum(timings.values()), 4),
            "unit": "sec",
            "sf": 0.1,
            "n_queries": 69,
            "n_sweep": 107,
            "n_errors": 0,
        }
    )
    tail = (line + "\n" + contract + "\n")[-2000:]
    # both lines survive a 2000-char tail capture, complete
    t_lines = tail.strip().splitlines()
    assert json.loads(t_lines[-1])["metric"] == "headline_queries_total"
    payload = json.loads(t_lines[-2])
    assert payload["metric"] == "headline_queries_compact"
    # slowest-first: every included query is >= every omitted one
    merged = sorted(
        list(timings.values()) + list(sweep.values()), reverse=True
    )
    n_in = len(payload["queries"]) + len(payload["sweep"])
    slowest_omitted = merged[n_in] if n_in < len(merged) else 0.0
    included_min = min(
        list(payload["queries"].values()) + list(payload["sweep"].values())
    )
    assert included_min >= slowest_omitted - 0.005  # 2-decimal rounding
    # omission disclosure adds up exactly
    assert payload["n_queries_omitted"] == 69 - len(payload["queries"])
    assert payload["n_sweep_omitted"] == 107 - len(payload["sweep"])
    om = sum(
        t for n, t in timings.items() if n not in payload["queries"]
    )
    assert abs(payload["omitted_queries_sec"] - round(om, 2)) < 0.01
    # and something was actually omitted at this scale (the test would
    # be vacuous otherwise) while the slow half made it in
    assert payload["n_queries_omitted"] + payload["n_sweep_omitted"] > 0
    assert payload["value"] == round(sum(timings.values()), 4)


def test_budgeted_per_query_small_registry_keeps_everything():
    bench = _load_bench()
    timings = {"q1": 1.2345, "q2": 0.5}
    sweep = {"s1": 0.25}
    payload = json.loads(bench.budgeted_per_query(timings, sweep, 0.01))
    assert payload["queries"] == {"q1": 1.23, "q2": 0.5}
    assert payload["sweep"] == {"s1": 0.25}
    assert payload["n_queries_omitted"] == 0
    assert payload["n_sweep_omitted"] == 0
    assert payload["omitted_queries_sec"] == 0.0
    assert payload["omitted_sweep_sec"] == 0.0


def test_budgeted_per_query_empty_maps():
    bench = _load_bench()
    payload = json.loads(bench.budgeted_per_query({}, {}, "custom"))
    assert payload["queries"] == {} and payload["sweep"] == {}
    assert payload["sf"] == "custom"
