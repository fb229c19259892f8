"""Maintain tools/green_fingerprints.json — the stamp file that keys
driver-green records to the implementation they actually verified.

The external correctness gate samples the first 50 registry entries;
the rotation in lol_data_pipeline_spark/plans/__init__.py pushes
driver-green entries to the back so never-checked ones rise into the
window. Greenness alone is not enough: an entry edited AFTER its green
round has no external evidence for its current code, so the rotation
only honors a green record whose stamped fingerprint (plan-function
source + oracle SQL at record time) still matches.

Usage:
    python tools/update_fingerprints.py            # stamp greens of the
                                                   # NEWEST record with
                                                   # current fingerprints
    python tools/update_fingerprints.py --all      # stamp every green
                                                   # entry (only correct
                                                   # right after a round's
                                                   # record commit, before
                                                   # any code edits)

Run the default mode at round start, immediately after the driver's
"round N: verdict/..." commit and BEFORE touching any code, so the
stamps describe exactly the tree the driver verified.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lol_data_pipeline_spark.plans import (  # noqa: E402
    REGISTRY,
    entry_fingerprint,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STAMP_PATH = os.path.join(ROOT, "tools", "green_fingerprints.json")


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


def main(argv: list[str]) -> int:
    records = sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")))
    if not records:
        print("no CORRECTNESS_r*.json records found; nothing to stamp")
        return 1
    if "--all" in argv:
        to_stamp = set().union(*(_green_in(p) for p in records))
        scope = f"all {len(records)} records"
    else:
        to_stamp = _green_in(records[-1])
        scope = os.path.basename(records[-1])

    try:
        with open(STAMP_PATH) as f:
            stamps = json.load(f)
    except (OSError, ValueError):
        stamps = {}

    updated = 0
    for name in sorted(to_stamp):
        spec = REGISTRY.get(name)
        if spec is None:
            continue
        fp = entry_fingerprint(spec)
        if stamps.get(name) != fp:
            stamps[name] = fp
            updated += 1
    with open(STAMP_PATH, "w") as f:
        json.dump(dict(sorted(stamps.items())), f, indent=1)
        f.write("\n")
    print(
        f"stamped {updated} updated / {len(to_stamp)} green ({scope}); "
        f"{len(stamps)} total stamps -> {STAMP_PATH}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
