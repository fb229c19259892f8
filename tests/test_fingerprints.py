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


_STUB_PLANS = '''\
import hashlib, inspect


class _Spec:
    def __init__(self, fn, sql):
        self.fn, self.sql = fn, sql


def _e(spark, sf_dir):
    return {marker!r}


REGISTRY = {{"e": _Spec(_e, "SELECT 1 AS x")}}


def entry_fingerprint(spec):
    return hashlib.md5(
        (inspect.getsource(spec.fn) + "\\0" + (spec.sql or "")).encode()
    ).hexdigest()
'''

_GREEN_ROW = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}


def _fixture_repo(tmp_path, marker="S1"):
    """A tiny git repo with a stub lol_data_pipeline_spark.plans
    package (one entry 'e') committed at HEAD. Returns its path."""
    import subprocess

    pkg = tmp_path / "lol_data_pipeline_spark"
    (pkg / "plans").mkdir(parents=True)
    (pkg / "__init__.py").write_text("")
    (pkg / "plans" / "__init__.py").write_text(_STUB_PLANS.format(marker=marker))

    def git(*args):
        subprocess.run(
            ["git", "-c", "user.email=t@t", "-c", "user.name=t", *args],
            cwd=tmp_path,
            capture_output=True,
            text=True,
            check=True,
        )

    git("init", "-q")
    git("add", "-A")
    git("commit", "-qm", "stub")
    return tmp_path


def _stub_fingerprint(root, marker="S1"):
    """The fingerprint the stub package computes for entry 'e' with
    the given source marker (reproduces the stub's own hash)."""
    import hashlib

    src = _STUB_PLANS.format(marker=marker)
    fn_src = src[src.index("def _e") : src.index("REGISTRY")].rstrip("\n") + "\n"
    return hashlib.md5((fn_src + "\0" + "SELECT 1 AS x").encode()).hexdigest()


def test_update_fingerprints_stamps_at_record_commit(tmp_path, monkeypatch):
    """Record-time, not working-tree: commit the stub with source S1
    and a tracked green record, then edit the working tree to S2
    WITHOUT committing — the stamp must be S1's fingerprint (evaluated
    in a worktree at the record commit), not S2's. This is the
    anti-retroactive-certification property, proven hermetically (the
    old version compared against the real repo's committed stamps,
    which goes stale the moment the driver drops a new record —
    the r07/r08 gate-failure class)."""
    import subprocess

    import tools.update_fingerprints as uf

    root = _fixture_repo(tmp_path, marker="S1")
    (root / "CORRECTNESS_r01.json").write_text(json.dumps({"e": _GREEN_ROW}))
    subprocess.run(
        ["git", "add", "CORRECTNESS_r01.json"], cwd=root, capture_output=True, check=True
    )
    subprocess.run(
        ["git", "-c", "user.email=t@t", "-c", "user.name=t", "commit", "-qm", "rec"],
        cwd=root, capture_output=True, check=True,
    )
    # now dirty the working tree: entry source becomes S2
    (root / "lol_data_pipeline_spark" / "plans" / "__init__.py").write_text(
        _STUB_PLANS.format(marker="S2")
    )
    stamp_path = tmp_path / "stamps.json"
    monkeypatch.setattr(uf, "ROOT", str(root))
    monkeypatch.setattr(uf, "STAMP_PATH", str(stamp_path))
    assert uf.main([]) == 0
    got = json.loads(stamp_path.read_text())
    assert got == {"e": _stub_fingerprint(root, "S1")}
    assert got["e"] != _stub_fingerprint(root, "S2")


def test_update_fingerprints_untracked_record_resolves_to_head(tmp_path, monkeypatch):
    """The r08 judging-time failure, as a negative control: the driver
    drops CORRECTNESS_r*.json AFTER the builder's final commit, so the
    newest record is UNTRACKED while every tracked file is clean — the
    stamper must resolve the record to HEAD and stamp (HEAD is exactly
    the tree the driver verified), not refuse."""
    import tools.update_fingerprints as uf

    root = _fixture_repo(tmp_path, marker="S1")
    (root / "CORRECTNESS_r99.json").write_text(json.dumps({"e": _GREEN_ROW}))
    stamp_path = tmp_path / "stamps.json"
    monkeypatch.setattr(uf, "ROOT", str(root))
    monkeypatch.setattr(uf, "STAMP_PATH", str(stamp_path))
    assert uf.main([]) == 0
    got = json.loads(stamp_path.read_text())
    assert got == {"e": _stub_fingerprint(root, "S1")}


def test_update_fingerprints_refuses_untracked_record_when_dirty(tmp_path, monkeypatch):
    """But when a TRACKED file has drifted from HEAD, no commit
    provably matches the tree the driver ran — an untracked record
    must still be refused (no retroactive certification)."""
    import tools.update_fingerprints as uf

    root = _fixture_repo(tmp_path, marker="S1")
    (root / "CORRECTNESS_r99.json").write_text(json.dumps({"e": _GREEN_ROW}))
    (root / "lol_data_pipeline_spark" / "plans" / "__init__.py").write_text(
        _STUB_PLANS.format(marker="S2")
    )
    stamp_path = tmp_path / "stamps.json"
    monkeypatch.setattr(uf, "ROOT", str(root))
    monkeypatch.setattr(uf, "STAMP_PATH", str(stamp_path))
    assert uf.main([]) == 0
    assert json.loads(stamp_path.read_text()) == {}


def test_unstamped_green_violations_exempts_untracked_records():
    """docs-sync stamp-coverage gate, untracked-record aware: a green
    entry is a violation only when a TRACKED record shows it green; a
    green that exists only in the driver's post-commit untracked drop
    is exempt until the next stamp run."""
    import tools.update_fingerprints as uf

    green_by_record = {
        "CORRECTNESS_r08.json": {"old_entry"},
        "CORRECTNESS_r99.json": {"old_entry", "new_entry"},
    }
    tracked = {"CORRECTNESS_r08.json"}  # r99 is the untracked drop
    names = {"old_entry", "new_entry"}
    # new_entry green only in the untracked record -> exempt
    assert uf.unstamped_green_violations(green_by_record, tracked, {}, names) == [
        "old_entry"
    ]
    # once stamped, no violations at all
    stamps = {"old_entry": "f" * 32}
    assert uf.unstamped_green_violations(green_by_record, tracked, stamps, names) == []
    # but a tracked-record green without a stamp is always a violation,
    # even if an untracked record ALSO shows it green
    assert "old_entry" in uf.unstamped_green_violations(
        green_by_record, tracked, {"new_entry": "f" * 32}, names
    )


def test_stamp_count_matches_registry():
    """Round-boundary hygiene (r12 verdict item 4): every entry the
    latest driver correctness record marked green must carry a
    fingerprint stamp (r12 closed with 19 green-but-unstamped
    entries), and no stamp may name a removed entry. Entries newer
    than the latest record are legitimately unstamped — they have no
    green evidence yet."""
    import glob
    import re

    import __spark_entry__ as entry

    with open("tools/green_fingerprints.json") as fh:
        stamps = json.load(fh)
    registry = set(entry.queries())
    extra = set(stamps) - registry
    assert not extra, f"stamps for removed entries: {sorted(extra)[:10]}"
    recs = sorted(
        glob.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
    )
    if not recs:
        return
    rec = json.load(open(recs[-1]))
    # a list-shaped record must fall back to the empty-rows path, not
    # AttributeError on .values() (r13 ADVICE)
    rows = (
        rec
        if isinstance(rec, dict)
        and all(isinstance(v, dict) for v in rec.values())
        else {}
    )
    green = {
        n
        for n, r in rows.items()
        if isinstance(r, dict)
        and r.get("err") is None
        and r.get("rows_match")
        and r.get("schema_match") is not False
        and r.get("hash_match") is not False
    }
    unstamped_green = (green & registry) - set(stamps)
    assert not unstamped_green, (
        f"driver-green entries left unstamped: {sorted(unstamped_green)[:10]}"
    )
