"""Unit tests for scripts/partest.py's pure parts — the scheduling
order and summary parsing the parallel suite runner rides. The runner
itself is exercised by being how the suite runs; these pin the logic
that would fail silently (a mis-parsed summary under-counts, a broken
LPT order quietly doubles wall time)."""

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "partest.py")


def _load():
    spec = importlib.util.spec_from_file_location("partest", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_summary_regex_parses_pytest_tails():
    mod = _load()
    counts = {}
    for n, kind in mod._SUMMARY.findall(
        "1 failed, 27 passed, 2 skipped in 172.17s (0:02:52)"
    ):
        counts[kind] = counts.get(kind, 0) + int(n)
    assert counts == {"failed": 1, "passed": 27, "skipped": 2}
    # "errors" must still count under the "error" key, not be dropped
    counts = {}
    for n, kind in mod._SUMMARY.findall("3 errors in 1.0s"):
        counts[kind] = counts.get(kind, 0) + int(n)
    assert counts.get("error") == 3


def test_parse_counts_anchors_on_the_duration_stamped_summary():
    mod = _load()
    # counts come from the REAL terminal summary, not from "N passed"
    # text a test echoed (e.g. inner pytest output on failure)
    out = (
        "some test output\n"
        "FAILED inner run: 27 passed\n"
        "1 failed, 3 passed in 4.56s\n"
    )
    assert mod.parse_counts(out) == {"failed": 1, "passed": 3}
    # a count-less terminal summary must STOP the scan, not let it
    # walk upward into captured output that happens to contain counts
    out = "captured: 27 passed\nno tests ran in 0.10s\n"
    assert mod.parse_counts(out) == {}
    out = "captured: 9 passed\n5 deselected in 0.01s\n"
    assert mod.parse_counts(out) == {}
    # and plain success still parses
    assert mod.parse_counts("12 passed in 172.17s (0:02:52)\n") == {
        "passed": 12
    }


def test_expected_cost_prefers_recorded_timings_over_size():
    mod = _load()
    timings = {"test_util.py": 3.6, "test_plans.py": 123.0}
    assert mod.expected_cost("test_util.py", timings) == 3.6
    # a discovered file absent from timings falls back to its size
    # scale — nonzero, so it still schedules
    real = mod.discover()[0]
    assert mod.expected_cost(real, {}) > 0


def test_discover_finds_this_file_and_load_sensitive_exists():
    mod = _load()
    files = mod.discover()
    assert "test_partest.py" in files
    # every LOAD_SENSITIVE entry must be a real file — a renamed
    # streaming test silently leaving the serial lane is the failure
    # mode this guards
    missing = [f for f in mod.LOAD_SENSITIVE if f not in files]
    assert missing == []


def test_no_tests_collected_is_not_a_failure(tmp_path, monkeypatch, capsys):
    """pytest exit code 5 ('no tests collected' — an empty or fully
    guarded-out file) must not go red: serial pytest over the whole
    dir would have passed (r13 review)."""
    mod = _load()
    files = mod.discover()

    def fake_run_file(fname):
        if fname == files[0]:
            return 5, 0.01, {}, "no tests ran in 0.10s"
        return 0, 0.01, {"passed": 1}, ""

    monkeypatch.setattr(mod, "run_file", fake_run_file)
    monkeypatch.setattr(mod, "TIMINGS", str(tmp_path / "t.json"))
    monkeypatch.setattr(mod, "TIMINGS_LOCAL", str(tmp_path / "t.local.json"))
    monkeypatch.setattr(sys, "argv", ["partest.py", "--workers", "1"])
    mod.main()  # SystemExit would fail the test
    out = capsys.readouterr().out
    assert f"note: {files[0]} collected no tests (rc=5)" in out
    assert "all green" in out


def test_sensitive_worker_joins_ordinary_queue_after_lane(
    tmp_path, monkeypatch
):
    """With multiple workers, the sensitive-lane thread must fall
    through to the ordinary queue once its lane drains instead of
    idling (r13 review) — and nothing may run twice or be missed."""
    mod = _load()
    launched = []

    def fake_run_file(fname):
        launched.append(fname)
        return 0, 0.01, {"passed": 1}, ""

    monkeypatch.setattr(mod, "run_file", fake_run_file)
    monkeypatch.setattr(mod, "TIMINGS", str(tmp_path / "t.json"))
    monkeypatch.setattr(mod, "TIMINGS_LOCAL", str(tmp_path / "t.local.json"))
    monkeypatch.setattr(sys, "argv", ["partest.py", "--workers", "2"])
    mod.main()
    files = mod.discover()
    assert sorted(launched) == sorted(files)  # each exactly once


def test_single_worker_merges_sensitive_lane(tmp_path, monkeypatch):
    """--workers 1 must be truly serial: the dedicated
    load-sensitive lane would otherwise make it two-concurrent."""
    mod = _load()
    launched = []

    def fake_run_file(fname):
        launched.append(fname)
        return 0, 0.01, {"passed": 1}, ""

    monkeypatch.setattr(mod, "run_file", fake_run_file)
    monkeypatch.setattr(mod, "TIMINGS", str(tmp_path / "t.json"))
    monkeypatch.setattr(mod, "TIMINGS_LOCAL", str(tmp_path / "t.local.json"))
    monkeypatch.setattr(
        sys, "argv", ["partest.py", "--workers", "1"]
    )
    mod.main()
    files = mod.discover()
    assert sorted(launched) == sorted(files)  # nothing ran twice/missed


def test_timings_write_local_only_by_default(tmp_path, monkeypatch):
    """Routine runs must rewrite only the gitignored .local overlay —
    the committed seed stays put so doc commits stop carrying 80-line
    timing rewrites (r13 verdict); --refresh-committed opts into the
    once-per-round seed refresh."""
    import json

    mod = _load()
    committed = tmp_path / "t.json"
    local = tmp_path / "t.local.json"
    committed.write_text(json.dumps({"test_util.py": 99.0}))
    monkeypatch.setattr(mod, "TIMINGS", str(committed))
    monkeypatch.setattr(mod, "TIMINGS_LOCAL", str(local))
    monkeypatch.setattr(
        mod, "run_file", lambda f: (0, 0.5, {"passed": 1}, "")
    )
    monkeypatch.setattr(sys, "argv", ["partest.py", "--workers", "1"])
    mod.main()
    assert local.exists()
    assert json.loads(committed.read_text()) == {"test_util.py": 99.0}
    files = mod.discover()
    assert json.loads(local.read_text()) == {f: 0.5 for f in files}

    # --refresh-committed rewrites both, identically
    monkeypatch.setattr(
        sys, "argv", ["partest.py", "--workers", "1", "--refresh-committed"]
    )
    mod.main()
    assert json.loads(committed.read_text()) == json.loads(local.read_text())


def test_timings_read_prefers_local_overlay(tmp_path, monkeypatch):
    """Scheduling reads the freshest source: the per-host overlay when
    present, else the committed seed; a truncated overlay falls back
    to the seed instead of bricking LPT."""
    import json

    mod = _load()
    committed = tmp_path / "t.json"
    local = tmp_path / "t.local.json"
    committed.write_text(json.dumps({"a.py": 1.0}))
    local.write_text(json.dumps({"a.py": 2.0}))
    monkeypatch.setattr(mod, "TIMINGS", str(committed))
    monkeypatch.setattr(mod, "TIMINGS_LOCAL", str(local))
    seen = {}

    def fake_run_file(fname):
        return 0, 0.01, {"passed": 1}, ""

    real_cost = mod.expected_cost

    def spy_cost(fname, timings):
        seen.update(timings)
        return real_cost(fname, timings)

    monkeypatch.setattr(mod, "run_file", fake_run_file)
    monkeypatch.setattr(mod, "expected_cost", spy_cost)
    monkeypatch.setattr(sys, "argv", ["partest.py", "--workers", "1"])
    mod.main()
    assert seen.get("a.py") == 2.0  # overlay won

    # truncated overlay → committed seed fallback
    local.write_text("{truncated")
    seen.clear()
    mod.main()
    assert seen.get("a.py") == 1.0
