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


def _run_check(repo_root, *flags):
    """Run --check against a repo root. Synthetic --repo-root states
    pass --no-staged-changed so the frame stays genuinely flag-free
    even after a future restage commits a non-empty STAGED_CHANGED
    tuple (which a flagless check would replay, letting the committed
    flags leak into the synthetic scenario and flip its verdict)."""
    return subprocess.run(
        [sys.executable, SCRIPT, "--check", "--repo-root", str(repo_root), *flags],
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
    res = _run_check(tmp_path, "--no-staged-changed")
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
    res = _run_check(tmp_path, "--no-staged-changed")
    assert res.returncode == 3  # machine contract: stale-but-healthy
    assert "STALE, not wrong" in res.stdout
    assert "round 2's just-verified window" in res.stdout
    assert "expected in window but not staged" not in res.stdout


def test_check_diagnoses_near_stale_staging(tmp_path):
    # The newest CORRECTNESS file is the staged window plus one extra
    # name (the driver verified a 51-row window, or a query was renamed
    # mid-round): a genuinely stale round-end state must NOT degrade to
    # the WRONG message over that tiny divergence (r12 ADVICE #2) — the
    # check reports "likely STALE" with the small symmetric difference.
    staged, rest = _staged_and_rest()
    _write(tmp_path, "CORRECTNESS_r01.json", rest)
    _write(tmp_path, "CORRECTNESS_r02.json", staged + rest[:1])
    res = _run_check(tmp_path, "--no-staged-changed")
    assert res.returncode == 3  # machine contract: stale-but-healthy
    assert "likely STALE" in res.stdout
    assert rest[0] in res.stdout  # the symmetric difference is printed
    assert "staging looks WRONG" not in res.stdout


def test_check_diagnoses_wrong_staging(tmp_path):
    # The staged names' only driver rows are in the newest file (so
    # they rank freshest and fall out of the computed window), and that
    # file diverges substantially from the staged set (only 30 of the
    # staged 50 appear, padded with 20 others) — neither the exact nor
    # the near-match stale frame explains the staging, so the check
    # must call it wrong and still print the diff.
    staged, rest = _staged_and_rest()
    _write(tmp_path, "CORRECTNESS_r01.json", rest)
    _write(tmp_path, "CORRECTNESS_r02.json", staged[:30] + rest[:20])
    res = _run_check(tmp_path, "--no-staged-changed")
    assert res.returncode == 4  # machine contract: wrong staging
    assert "staging looks WRONG" in res.stdout
    assert "expected in window but not staged" in res.stdout
    assert "STALE" not in res.stdout


def test_check_on_live_repo_is_never_wrong():
    """Repo-state invariant: on a legitimately-maintained repo the
    check may pass (mid-round, freshly restaged) or diagnose stale
    staging (round-end, the staged round's CORRECTNESS file landed) —
    but must NEVER report WRONG. A WRONG here means _VERIFY_FIRST
    drifted from the rotation rule (hand-edit typo, forgotten
    restage-after-code-change) and the driver would burn its ~50-row
    window on the wrong queries.

    A flagless run replays the committed stage_rotation.STAGED_CHANGED
    constant (r12 ADVICE #1), so a mid-round staging that used
    --changed flags is validated in its own frame as long as each
    restage updates that constant — the restage workflow's committed
    record, not contributor memory.
    """
    res = _run_check(REPO)
    assert res.returncode in (0, 3), res.stdout + res.stderr
    assert "staging looks WRONG" not in res.stdout, res.stdout


def test_check_flagless_replays_staged_changed(tmp_path, monkeypatch):
    """A mid-round staging that used --changed flags must not be
    misdiagnosed by a flagless --check (r12 ADVICE #1): the flags are
    committed as stage_rotation.STAGED_CHANGED and a flagless check
    replays them automatically; --no-staged-changed opts back out to a
    genuinely flag-free frame."""
    import contextlib
    import io

    import pytest

    staged, rest = _staged_and_rest()
    # Ages are set so the flag-free frame can NEVER reproduce the
    # staged window (the 30 r2-dated staged names rank freshest and
    # fall out of it) and the newest file diverges substantially from
    # the staged set (20/50 overlap slack) — flagless says WRONG, while
    # the staged-changed frame (all 50 staged names changed) says OK.
    _write(tmp_path, "CORRECTNESS_r01.json", staged + rest)
    _write(tmp_path, "CORRECTNESS_r02.json", staged[:30] + rest[:20])

    mod = _load_rotation_module()
    monkeypatch.setattr(mod, "STAGED_CHANGED", tuple(staged))

    monkeypatch.setattr(
        sys,
        "argv",
        ["stage_rotation.py", "--check", "--repo-root", str(tmp_path)],
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        mod.main()  # OK path returns; any SystemExit fails the test
    assert "window OK" in buf.getvalue()

    monkeypatch.setattr(
        sys,
        "argv",
        [
            "stage_rotation.py",
            "--check",
            "--repo-root",
            str(tmp_path),
            "--no-staged-changed",
        ],
    )
    buf = io.StringIO()
    with pytest.raises(SystemExit), contextlib.redirect_stdout(buf):
        mod.main()
    assert "staging looks WRONG" in buf.getvalue()


def test_check_replayed_staged_changed_tolerates_renamed_query(
    tmp_path, monkeypatch
):
    """The committed STAGED_CHANGED constant can name a query that was
    later renamed/removed — the exact drift --check exists to survive.
    A flagless check must IGNORE such names (with a note) and still
    diagnose the staging, not die with an 'unknown --changed names'
    error about flags nobody typed (r13 review)."""
    import contextlib
    import io

    staged, rest = _staged_and_rest()
    _write(tmp_path, "CORRECTNESS_r01.json", staged + rest)
    _write(tmp_path, "CORRECTNESS_r02.json", staged[:30] + rest[:20])

    mod = _load_rotation_module()
    monkeypatch.setattr(
        mod, "STAGED_CHANGED", tuple(staged) + ("renamed_away_query",)
    )
    monkeypatch.setattr(
        sys,
        "argv",
        ["stage_rotation.py", "--check", "--repo-root", str(tmp_path)],
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        mod.main()  # OK path returns; SystemExit would fail the test
    out = buf.getvalue()
    assert "window OK" in out
    assert "renamed_away_query" in out and "ignored" in out


def test_newest_rounds_skips_digitless_correctness_files(tmp_path):
    """A mis-named scratch file matching the CORRECTNESS_r*.json glob
    but carrying no round number (CORRECTNESS_rerun.json) must be
    skipped, not crash every staging/--check run (r13 review)."""
    staged, rest = _staged_and_rest()
    _write(tmp_path, "CORRECTNESS_r01.json", rest)
    with open(
        os.path.join(tmp_path, "CORRECTNESS_rerun.json"), "w", encoding="utf-8"
    ) as f:
        f.write("{}")
    mod = _load_rotation_module()
    newest, rounds, just_verified = mod.newest_rounds(str(tmp_path))
    assert rounds == [1]
    assert set(newest) == set(rest)
    # and the subprocess path stays green end-to-end
    res = _run_check(tmp_path, "--no-staged-changed")
    assert res.returncode == 0, res.stdout + res.stderr


def test_window_flag_must_be_positive(tmp_path):
    """--window 0 would make --check vacuously green ([:0] == []);
    zero/negative values must be rejected at the flag (r13 review)."""
    res = _run_check(tmp_path, "--no-staged-changed", "--window", "0")
    assert res.returncode == 2
    assert "--window must be >= 1" in res.stderr


def _load_rotation_module():
    import importlib.util

    spec = importlib.util.spec_from_file_location("stage_rotation", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_window_computation_properties():
    """Property sweep of the pure window rule over synthetic
    registries/histories — the invariants every round's staging rides:

    1. window size = min(window_size, |registry|), no duplicates,
       all names from the registry;
    2. brand-new queries (no driver row) always lead — all inside the
       window whenever they fit;
    3. --changed queries are in the window whenever never+changed fit;
    4. every stalest query (oldest newest-round on record) is in the
       window whenever never+changed+stalest fit — the unbounded-
       staleness guard test_rotation_window_contains_every_stalest_query
       pins on the real repo, proven here over the input space;
    5. deterministic: same inputs, same output.
    """
    from hypothesis import given, settings
    from hypothesis import strategies as st

    mod = _load_rotation_module()

    names = st.text(alphabet="abcdefgh_", min_size=1, max_size=8)

    @settings(max_examples=200, deadline=None)
    @given(
        registry=st.sets(names, min_size=1, max_size=40),
        data=st.data(),
        window_size=st.integers(min_value=1, max_value=20),
    )
    def prop(registry, data, window_size):
        newest = {
            q: data.draw(st.integers(min_value=1, max_value=5))
            for q in registry
            if data.draw(st.booleans())
        }
        changed = data.draw(
            st.lists(st.sampled_from(sorted(registry)), max_size=5)
            if registry
            else st.just([])
        )
        window, never, changed_kept, by_age = mod.compute_window(
            registry, newest, changed, window_size
        )
        # (1) shape
        assert len(window) == min(window_size, len(registry))
        assert len(set(window)) == len(window)
        assert set(window) <= registry
        # (2) brand-new lead
        if len(never) <= window_size:
            assert set(never) <= set(window)
        else:
            assert set(window) <= set(never)
        # (3) changed next
        if len(never) + len(changed_kept) <= window_size:
            assert set(changed_kept) <= set(window)
        # (4) stalest covered
        aged = {q: r for q, r in newest.items() if q in registry}
        if aged:
            oldest = min(aged.values())
            stalest = {
                q for q, r in aged.items() if r == oldest and q not in changed_kept
            }
            if len(never) + len(changed_kept) + len(stalest) <= window_size:
                assert stalest <= set(window)
        # (5) determinism
        again, *_ = mod.compute_window(registry, newest, changed, window_size)
        assert again == window

    prop()


def test_diagnose_staging_properties():
    """Property sweep of the pure STALE/likely-STALE/WRONG rule
    (extracted r13 alongside the r12 advice's near-match heuristic):

    1. staged == computed (as sets) is always OK — the just-verified
       set can never demote a correctly-staged window;
    2. staged == just_verified (and != computed) is always STALE;
    3. a non-OK staged window within the two-sided slack of the
       just-verified set is never WRONG;
    4. WRONG requires divergence beyond the slack in some direction
       (or no just-verified set at all);
    5. deterministic.
    """
    from hypothesis import given, settings
    from hypothesis import strategies as st

    mod = _load_rotation_module()
    names = st.text(alphabet="abcdefgh_", min_size=1, max_size=6)

    @settings(max_examples=300, deadline=None)
    @given(
        staged=st.lists(names, min_size=1, max_size=20, unique=True),
        computed=st.lists(names, min_size=0, max_size=20, unique=True),
        just_verified=st.sets(names, min_size=0, max_size=25),
    )
    def prop(staged, computed, just_verified):
        verdict = mod.diagnose_staging(staged, computed, just_verified)
        assert verdict in ("OK", "STALE", "LIKELY_STALE", "WRONG")
        if set(staged) == set(computed):
            assert verdict == "OK"
            return
        if just_verified and set(staged) == just_verified:
            assert verdict == "STALE"
            return
        slack = len(staged) - max(
            1, round(mod.STALE_OVERLAP_FRACTION * len(staged))
        )
        near = (
            bool(just_verified)
            and len(set(staged) - just_verified) <= slack
            and len(just_verified - set(staged)) <= slack
        )
        assert verdict == ("LIKELY_STALE" if near else "WRONG")
        # determinism
        assert verdict == mod.diagnose_staging(staged, computed, just_verified)

    prop()


def test_staging_print_works_on_fresh_clone(tmp_path):
    """The print path must work end-to-end on a repo with no
    CORRECTNESS files at all (fresh clone): every query ranks as
    brand-new and the age audit degrades gracefully instead of
    min()-crashing on an empty sequence."""
    res = subprocess.run(
        [sys.executable, SCRIPT, "--repo-root", str(tmp_path)],
        capture_output=True,
        text=True,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "# window (50):" in res.stdout
    assert "NEW" in res.stdout
    assert "oldest row now none (no driver rows yet)" in res.stdout


def test_failed_driver_rows_do_not_refresh_staleness(tmp_path):
    """A FAILED driver row (rows_match false / err set) must not stamp
    the query as freshly verified — it used to rank the known-failing
    query freshest and keep it OUT of the window for ~3 rounds (r16
    review). A failed row leaves the query at its previous age, so it
    re-enters the window at the next restage."""
    import json as _json
    import os as _os

    sys.path.insert(0, _os.path.join(REPO, "scripts"))
    import importlib

    mod = importlib.import_module("stage_rotation")

    staged, rest = _staged_and_rest()
    victim = rest[0]
    # r1 verifies everything (all passing)…
    _write(tmp_path, "CORRECTNESS_r01.json", staged + rest)
    # …r2 re-checks a window containing the victim, which FAILS
    rows = {n: {"rows_match": True} for n in rest[:50]}
    rows[victim] = {
        "rows_match": False,
        "schema_match": True,
        "hash_match": False,
        "err": None,
    }
    with open(
        _os.path.join(tmp_path, "CORRECTNESS_r02.json"), "w", encoding="utf-8"
    ) as f:
        _json.dump(rows, f)

    newest, rounds, newest_names = mod.newest_rounds(str(tmp_path))
    assert rounds == [1, 2]
    assert newest[victim] == 1  # failure did NOT advance its age
    passing = rest[1]
    assert newest[passing] == 2
    # the newest-file name set still describes what the driver looked at
    assert victim in newest_names
