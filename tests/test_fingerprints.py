"""Fingerprint-keyed rotation freshness (round-7 advice item).

A driver-green record must stop counting the moment the entry's plan
function or oracle SQL changes, so edited entries rotate back into
the externally sampled window instead of resting on stale evidence.
"""

from __future__ import annotations

import json

import lol_data_pipeline_spark.plans as plans


class _FakeSpec:
    def __init__(self, fn, sql):
        self.fn = fn
        self.sql = sql


def _spec(sql="SELECT 1 AS x"):
    def fn(spark, sf_dir):
        return None

    return _FakeSpec(fn, sql)


def test_fingerprint_changes_with_sql():
    a = _spec("SELECT 1 AS x")
    b = _spec("SELECT 2 AS x")
    assert plans.entry_fingerprint(a) != plans.entry_fingerprint(b)
    assert plans.entry_fingerprint(a) == plans.entry_fingerprint(
        _spec("SELECT 1 AS x")
    )


def test_stale_stamp_makes_entry_fresh(monkeypatch):
    """green + matching stamp -> seen; green + stale stamp -> fresh;
    green + no stamp -> seen (back-compat)."""
    items = {"a": _spec(), "b": _spec("SELECT 2 AS y"), "c": _spec("SELECT 3 AS z")}
    monkeypatch.setattr(plans, "_driver_green_entries", lambda: {"a", "b", "c"})
    stamps = {
        "a": plans.entry_fingerprint(items["a"]),  # matches -> seen
        "b": "0" * 32,  # stale -> fresh
        # "c" unstamped -> seen
    }
    monkeypatch.setattr(plans, "_green_fingerprint_stamps", lambda: stamps)
    seen = plans._effective_seen_green(items)
    assert seen == {"a", "c"}


def test_update_fingerprints_green_rule():
    """Only rows with err=None, rows_match, and no explicit schema/hash
    mismatch count as green — red and no_oracle rows must stay
    unstamped so they remain in the sampled window."""
    import tools.update_fingerprints as uf

    rec = {
        "good": {"rows_match": True, "schema_match": True, "hash_match": True, "err": None},
        "red": {"rows_match": True, "schema_match": False, "hash_match": False, "err": None},
        "no_oracle": {"rows_match": True, "err": "no_oracle"},
    }
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "CORRECTNESS_r09.json")
        with open(p, "w") as f:
            json.dump(rec, f)
        assert uf._green_in(p) == {"good"}


def test_update_fingerprints_refuses_without_record_commit(tmp_path, monkeypatch):
    """Stamps are derived from the git commit that introduced the
    record (r07-advice: hashing the CURRENT tree let a late run
    retroactively certify edited code). A record whose commit can't
    be resolved — here: ROOT is not a git repo — must NOT be stamped."""
    import tools.update_fingerprints as uf

    rec = {"good": {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}}
    (tmp_path / "CORRECTNESS_r09.json").write_text(json.dumps(rec))
    stamp_path = tmp_path / "green_fingerprints.json"
    monkeypatch.setattr(uf, "ROOT", str(tmp_path))
    monkeypatch.setattr(uf, "STAMP_PATH", str(stamp_path))
    assert uf.main([]) == 0
    stamps = json.loads(stamp_path.read_text())
    assert stamps == {}  # refused: no retroactive certification


def test_update_fingerprints_stamps_at_record_commit(tmp_path, monkeypatch):
    """Against the REAL repo: stamping the newest record must
    reproduce exactly the committed green_fingerprints.json values
    (those were generated at the record commit), proving the worktree
    path computes record-time fingerprints, not working-tree ones."""
    import tools.update_fingerprints as uf

    stamp_path = tmp_path / "stamps.json"
    monkeypatch.setattr(uf, "STAMP_PATH", str(stamp_path))
    assert uf.main([]) == 0
    got = json.loads(stamp_path.read_text())
    with open(str(uf.ROOT) + "/tools/green_fingerprints.json") as f:
        committed = json.load(f)
    assert got  # stamped something
    for name, fp in got.items():
        assert committed.get(name) == fp, name
