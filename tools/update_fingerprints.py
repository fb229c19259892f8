"""Maintain tools/green_fingerprints.json — the stamp file that keys
driver-green records to the implementation they actually verified.

The external correctness gate samples the first 50 registry entries;
the rotation in lol_data_pipeline_spark/plans/__init__.py pushes
driver-green entries to the back so never-checked ones rise into the
window. Greenness alone is not enough: an entry edited AFTER its green
round has no external evidence for its current code, so the rotation
only honors a green record whose stamped fingerprint (plan-function
source + oracle SQL at record time) still matches.

Fingerprints are computed FROM THE GIT COMMIT THAT INTRODUCED THE
RECORD, not from the working tree: a temporary detached `git worktree`
is checked out at that commit and entry fingerprints are evaluated
there in a subprocess. This means running the tool late — after code
edits, even with a dirty tree — can never retroactively certify
unverified code as green-and-unchanged (the r07-advice hole: the old
implementation hashed the CURRENT tree, so a post-edit run silently
defeated the freshness rotation it implements).

Usage:
    python tools/update_fingerprints.py            # stamp greens of the
                                                   # NEWEST record, at the
                                                   # record's own commit
    python tools/update_fingerprints.py --all      # stamp every green
                                                   # entry at the commit of
                                                   # the newest record in
                                                   # which it was green
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STAMP_PATH = os.path.join(ROOT, "tools", "green_fingerprints.json")

_FP_SCRIPT = """\
import json, sys
sys.path.insert(0, {root!r})
from lol_data_pipeline_spark.plans import REGISTRY, entry_fingerprint
names = json.loads(sys.stdin.read())
print(json.dumps({{n: entry_fingerprint(REGISTRY[n]) for n in names if n in REGISTRY}}))
"""


def _green_in(path: str) -> set[str]:
    try:
        with open(path) as f:
            rows = json.load(f)
    except (OSError, ValueError):
        return set()
    if not isinstance(rows, dict):
        return set()
    return {
        name
        for name, row in rows.items()
        if isinstance(row, dict)
        and row.get("err") is None
        and row.get("rows_match") is True
        and row.get("schema_match") is not False
        and row.get("hash_match") is not False
    }


def _git(args: list[str]) -> str | None:
    try:
        return subprocess.run(
            ["git", *args],
            cwd=ROOT,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
    except (subprocess.CalledProcessError, OSError):
        return None


def _tracked_files_clean() -> bool:
    """True when no TRACKED file is modified/staged — i.e. HEAD is the
    code in the working tree. Untracked files are ignored: entry
    fingerprints are evaluated in a detached checkout of the commit,
    and registry entries only exist via imports in tracked modules."""
    out = _git(["status", "--porcelain"])
    if out is None:
        return False
    return all(line.startswith("??") for line in out.splitlines() if line)


def _record_commit(path: str) -> str | None:
    """Newest commit touching the record file — the tree state the
    driver verified (records are committed together with the code).

    UNTRACKED record + clean tracked tree resolves to HEAD: the driver
    drops CORRECTNESS_r*.json AFTER the builder's final commit, so at
    that moment HEAD IS the tree the record verified. Refusing there
    (the r08 failure) left every newly-green entry unstamped and the
    freshness rotation silently off for them. Refusal remains correct
    when tracked files have drifted — then no commit provably matches
    what the driver ran."""
    out = _git(["log", "-n1", "--format=%H", "--", os.path.relpath(path, ROOT)])
    if out is None:
        return None
    if out.strip():
        return out.strip()
    status = _git(
        ["status", "--porcelain", "--untracked-files=all", "--", os.path.relpath(path, ROOT)]
    )
    untracked = status is not None and any(
        line.startswith("??") for line in status.splitlines()
    )
    if untracked and _tracked_files_clean():
        head = _git(["rev-parse", "HEAD"])
        return head.strip() if head and head.strip() else None
    return None


def _fingerprints_at_commit(commit: str, names: list[str]) -> dict[str, str]:
    """Check the record's commit out into a throwaway worktree and
    compute entry fingerprints THERE. CORRECTNESS/stamp files in the
    worktree are whatever that commit held — irrelevant, since only
    entry_fingerprint (function source + oracle SQL) is evaluated."""
    with tempfile.TemporaryDirectory(prefix="fp_worktree_") as tmp:
        wt = os.path.join(tmp, "tree")
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, commit],
            cwd=ROOT,
            capture_output=True,
            text=True,
            check=True,
        )
        try:
            out = subprocess.run(
                [sys.executable, "-c", _FP_SCRIPT.format(root=wt)],
                input=json.dumps(names),
                capture_output=True,
                text=True,
                check=True,
                cwd=wt,
            ).stdout
            return json.loads(out.strip().splitlines()[-1])
        finally:
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=ROOT,
                capture_output=True,
            )


def _tracked_record_files() -> set[str]:
    """Basenames of CORRECTNESS_r*.json records known to git."""
    out = _git(["ls-files", "--", "CORRECTNESS_r*.json"])
    if out is None:
        return set()
    return {os.path.basename(line) for line in out.splitlines() if line}


def unstamped_green_violations(
    green_by_record: dict[str, set[str]],
    tracked_records: set[str],
    stamps: dict[str, str],
    registry_names: set[str],
) -> list[str]:
    """Stamp-coverage invariant, untracked-record aware: a green
    registry entry missing a fingerprint stamp is a violation ONLY if
    some TRACKED record shows it green — a stamp run could and should
    have covered it. Greens whose only evidence is an untracked record
    postdate the last possible stamp run (the driver writes the record
    after the builder's final commit), so they are exempt until the
    next `python tools/update_fingerprints.py` — which the HEAD
    fallback in _record_commit lets succeed on that untracked record.

    Keyed by record BASENAME (e.g. 'CORRECTNESS_r08.json')."""
    greens_tracked: set[str] = set()
    for rec, names in green_by_record.items():
        if os.path.basename(rec) in tracked_records:
            greens_tracked.update(names)
    all_green: set[str] = set()
    for names in green_by_record.values():
        all_green.update(names)
    return sorted(
        n
        for n in all_green
        if n in registry_names and n not in stamps and n in greens_tracked
    )


def main(argv: list[str]) -> int:
    records = sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")))
    if not records:
        print("no CORRECTNESS_r*.json records found; nothing to stamp")
        return 1
    if "--all" in argv:
        # newest record in which each entry is green wins
        newest_green: dict[str, str] = {}
        for p in records:  # sorted ascending — later overwrites earlier
            for n in _green_in(p):
                newest_green[n] = p
        scope = f"all {len(records)} records"
    else:
        newest_green = {n: records[-1] for n in _green_in(records[-1])}
        scope = os.path.basename(records[-1])

    # group names by the record commit they were verified at
    by_commit: dict[str, list[str]] = {}
    unresolved: list[str] = []
    for n, p in sorted(newest_green.items()):
        c = _record_commit(p)
        if c is None:
            unresolved.append(n)
        else:
            by_commit.setdefault(c, []).append(n)
    if unresolved:
        print(
            f"REFUSING to stamp {len(unresolved)} entries whose record "
            f"commit can't be resolved (no git?): {unresolved[:5]}..."
        )

    try:
        with open(STAMP_PATH) as f:
            stamps = json.load(f)
    except (OSError, ValueError):
        stamps = {}

    updated = 0
    for commit, names in by_commit.items():
        fps = _fingerprints_at_commit(commit, names)
        for name in names:
            fp = fps.get(name)
            if fp is None:
                # entry didn't exist at the record commit (renamed?) —
                # leave unstamped; rotation treats it as fresh
                print(f"  skip {name}: not importable at {commit[:10]}")
                continue
            if stamps.get(name) != fp:
                stamps[name] = fp
                updated += 1
    with open(STAMP_PATH, "w") as f:
        json.dump(dict(sorted(stamps.items())), f, indent=1)
        f.write("\n")
    print(
        f"stamped {updated} updated / {len(newest_green)} green ({scope}); "
        f"{len(stamps)} total stamps -> {STAMP_PATH}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
