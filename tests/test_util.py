"""atomic_write_json — the sidecar-write primitive every store/index
metadata file goes through. The invariant under test: the target path
is only ever absent or complete, never truncated (the crash state a
plain ``open(...).write`` can leave, which then fails every later
``json.load`` until hand-deleted)."""

import json
import os

from bigdata_flightanalysis_spark.util import atomic_write_json


def test_writes_valid_json_and_no_temp_residue(tmp_path):
    p = str(tmp_path / "meta.json")
    atomic_write_json(p, {"n_planes": 12, "scheme": "signlsh"})
    with open(p, encoding="utf-8") as f:
        assert json.load(f) == {"n_planes": 12, "scheme": "signlsh"}
    assert not os.path.exists(p + ".tmp")


def test_replaces_existing_file(tmp_path):
    p = str(tmp_path / "meta.json")
    atomic_write_json(p, {"v": 1})
    atomic_write_json(p, {"v": 2})
    with open(p, encoding="utf-8") as f:
        assert json.load(f) == {"v": 2}


def test_stale_temp_from_crashed_write_is_overwritten(tmp_path):
    """A crash mid-write leaves only the .tmp (target untouched); the
    next write must succeed and clean it up."""
    p = str(tmp_path / "meta.json")
    with open(p + ".tmp", "w", encoding="utf-8") as f:
        f.write('{"trunc')  # the torn state a crash leaves
    atomic_write_json(p, {"ok": True})
    with open(p, encoding="utf-8") as f:
        assert json.load(f) == {"ok": True}
    assert not os.path.exists(p + ".tmp")
