"""Generative crash-state coverage for the offline fsck: the residue
states a crash can leave are combinatorial (per-relation live/.old/
.staging for stores AND for each of the three index relations, plus
the ordered corpus_stats.new promotion rule and its doc_stats.staging
veto), and the hand-picked scenarios in test_fsck.py cover only the
states we thought of. These properties assert what must hold for
EVERY reachable combination:

1. **Convergence**: after one heal pass, no ``*.old`` / ``*.staging``
   / ``corpus_stats.new`` residue remains anywhere in the tree.
2. **Idempotence**: a second heal pass reports nothing new — the only
   finding allowed to repeat is the UNHEALABLE torn-build report,
   byte-identical to the first pass's.
3. **No data invented**: a relation neither live nor in ``.old``
   before the heal is still absent after it.
4. **Restore priority**: a dangling ``.old`` (no live sibling) is
   restored — its content becomes the live dir, never deleted.

Pure filesystem (no Spark): fsck's classify+heal is os.rename/rmtree
level, which is exactly why the whole space is cheap to sweep.
"""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigdata_flightanalysis_spark import fsck

# one store layout's crash state: which of live/.old/.staging exist
_STORE_STATE = st.fixed_dictionaries(
    {
        "live": st.booleans(),
        "old": st.booleans(),
        "staging": st.booleans(),
    }
)

# an index relation's crash state (same shape, per relation)
_INDEX_STATE = st.fixed_dictionaries(
    {
        "postings": _STORE_STATE,
        "doc_stats": _STORE_STATE,
        "corpus_stats": _STORE_STATE,
        # corpus_stats.new: absent / complete / incomplete (no _SUCCESS)
        "new": st.sampled_from(["absent", "complete", "incomplete"]),
        # whether the completed postings carry their _SUCCESS marker
        "postings_success": st.booleans(),
    }
)


def _mk(path: str, *files: str) -> None:
    os.makedirs(path, exist_ok=True)
    for f in files:
        with open(os.path.join(path, f), "w") as fh:
            fh.write("x")


def _plant_store(parent: str, name: str, state: dict) -> None:
    base = os.path.join(parent, name)
    if state["live"]:
        _mk(base, "part-live.parquet")
    if state["old"]:
        _mk(base + ".old", "part-old.parquet")
    if state["staging"]:
        _mk(base + ".staging", "part-staging.parquet")


def _plant_index(root: str, state: dict) -> None:
    _mk(root, "_index_meta.json")  # always recognizable as an index root
    for rel in ("postings", "doc_stats", "corpus_stats"):
        s = state[rel]
        live = os.path.join(root, rel)
        marker = ["_SUCCESS"] if rel == "postings" and state["postings_success"] else []
        if s["live"]:
            _mk(live, "part-live.parquet", *marker)
        if s["old"]:
            _mk(live + ".old", "part-old.parquet", *marker)
        if s["staging"]:
            _mk(live + ".staging", "part-staging.parquet")
    if state["new"] != "absent":
        files = ["NEW_TOTALS"] + (["_SUCCESS"] if state["new"] == "complete" else [])
        _mk(os.path.join(root, "corpus_stats.new"), *files)


def _residue(root: str) -> list[str]:
    out = []
    for parent, dirnames, _files in os.walk(root):
        for d in dirnames:
            if d.endswith((".old", ".staging")) or d == "corpus_stats.new":
                out.append(os.path.join(parent, d))
    return sorted(out)


@settings(max_examples=80, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(states=st.lists(_STORE_STATE, min_size=1, max_size=4))
def test_generic_store_heal_converges_and_is_idempotent(tmp_path_factory, states):
    root = str(tmp_path_factory.mktemp("tree"))
    had_old_only = []
    for i, s in enumerate(states):
        _plant_store(root, f"store{i}", s)
        if s["old"] and not s["live"]:
            had_old_only.append(f"store{i}")
    first = fsck.fsck_tree(root, heal=True)
    assert all(f["healed"] for f in first)  # generic layouts: all healable
    assert _residue(root) == []  # convergence
    second = fsck.fsck_tree(root, heal=True)
    assert second == []  # idempotence
    for i, s in enumerate(states):
        live = os.path.join(root, f"store{i}")
        if s["live"] or s["old"]:
            # restore priority: dangling .old came back as the live dir
            assert os.path.isdir(live)
            if not s["live"] and s["old"]:
                assert os.path.exists(os.path.join(live, "part-old.parquet"))
        else:
            # staging-only (or empty): nothing invented
            assert not os.path.exists(live)


@settings(max_examples=120, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(state=_INDEX_STATE)
def test_index_heal_converges_and_is_idempotent(tmp_path_factory, state):
    root = str(tmp_path_factory.mktemp("idx"))
    _plant_index(root, state)
    first = fsck.fsck_tree(root, heal=True)
    assert _residue(root) == []  # convergence, including corpus_stats.new
    second = fsck.fsck_tree(root, heal=True)
    torn_first = [f for f in first if not f["healed"]]
    # idempotence: the second pass may only repeat the unhealable
    # torn-build report, and must repeat it exactly
    assert second == torn_first
    for f in torn_first:
        assert "torn build" in f["issue"]
    # a torn build is reported iff doc_stats survives without complete
    # postings (dangling .old counts as the relation surviving)
    doc_stats_present = os.path.exists(os.path.join(root, "doc_stats"))
    postings_dir = os.path.join(root, "postings")
    postings_ok = os.path.exists(os.path.join(postings_dir, "_SUCCESS"))
    assert bool(torn_first) == (doc_stats_present and not postings_ok)
    # the .new promotion rule: a complete .new with no doc_stats.staging
    # veto must now BE the live corpus_stats; any other .new is gone
    promoted = state["new"] == "complete" and not state["doc_stats"]["staging"]
    if promoted:
        assert os.path.exists(os.path.join(root, "corpus_stats", "NEW_TOTALS"))
    else:
        assert not os.path.exists(
            os.path.join(root, "corpus_stats", "NEW_TOTALS")
        )
