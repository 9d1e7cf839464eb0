"""stage_rotation.py --check must state its frame of reference and
diagnose WHY a staged window mismatches (r11 verdict finding #1 / r11
ADVICE #1): run at round-end state — after the staged round's own
CORRECTNESS file has landed — the old check printed a bare 50-name diff
indistinguishable from genuinely wrong staging. Now it distinguishes:

- OK: staged window == the computation for the current frame;
- STALE: staged window == exactly the newest CORRECTNESS file's name
  set (the driver just verified it — staging is old, not wrong);
- WRONG: matches neither.

These tests replay each state synthetically via --repo-root, deriving
the CORRECTNESS contents from the repo's real staged window so they
stay valid across future restages.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "stage_rotation.py")


def _staged_and_rest():
    sys.path.insert(0, REPO)
    from bigdata_flightanalysis_spark.queries import catalog

    names = list(catalog.load_all())
    return names[:50], names[50:]


def _run_check(repo_root):
    return subprocess.run(
        [sys.executable, SCRIPT, "--check", "--repo-root", str(repo_root)],
        capture_output=True,
        text=True,
    )


def _write(repo_root, fname, names):
    rows = {n: {"rows_match": True} for n in names}
    with open(os.path.join(repo_root, fname), "w", encoding="utf-8") as f:
        json.dump(rows, f)


def test_check_ok_states_frame_of_reference(tmp_path):
    # Only the non-staged names have driver rows -> the staged 50 are
    # brand-new, lead the computed window outright, and the check passes.
    staged, rest = _staged_and_rest()
    _write(tmp_path, "CORRECTNESS_r01.json", rest)
    res = _run_check(tmp_path)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "window OK" in res.stdout
    assert "frame of reference: merged CORRECTNESS rounds r1..r1" in res.stdout


def test_check_diagnoses_stale_staging(tmp_path):
    # The newest CORRECTNESS file is exactly the staged window: the
    # driver just verified it, so the mismatch is stale staging — the
    # check must say so instead of printing a bare diff.
    staged, rest = _staged_and_rest()
    _write(tmp_path, "CORRECTNESS_r01.json", rest)
    _write(tmp_path, "CORRECTNESS_r02.json", staged)
    res = _run_check(tmp_path)
    assert res.returncode == 1
    assert "STALE, not wrong" in res.stdout
    assert "round 2's just-verified window" in res.stdout
    assert "expected in window but not staged" not in res.stdout


def test_check_diagnoses_wrong_staging(tmp_path):
    # The staged names' only driver rows are in the newest file (so
    # they rank freshest and fall out of the computed window), and that
    # file is NOT exactly the staged set (one extra name) — neither
    # frame explains the staging, so the check must call it wrong and
    # still print the diff.
    staged, rest = _staged_and_rest()
    _write(tmp_path, "CORRECTNESS_r01.json", rest)
    _write(tmp_path, "CORRECTNESS_r02.json", staged + rest[:1])
    res = _run_check(tmp_path)
    assert res.returncode == 1
    assert "staging looks WRONG" in res.stdout
    assert "expected in window but not staged" in res.stdout
    assert "STALE" not in res.stdout
