"""Regenerate tests/checked_hashes.json — the rotation-policy manifest.

The manifest records, per registered query, a hash of the plan
function's source plus its oracle SQL *as of the last round the query
sat in the driver window* (``registry.PRIORITY``). The pinned test
``tests/test_registry.py::test_changed_queries_enter_driver_window``
asserts that any query whose current hash differs from the manifest is
in the CURRENT window — i.e. "any query whose plan changes in a round
enters that round's driver window" (r3 verdict, next-round #9).

Run this when rotating PRIORITY for a new round, AFTER the rotation:

    python scripts/update_checked_hashes.py            # update window names
    python scripts/update_checked_hashes.py --bootstrap  # all names

``--bootstrap`` stamps every registered query (first run, or after an
intentional full re-baseline — a shared-helper change that flips every
closure hash). Bootstrap is GUARDED (r14 ADVICE, medium): it refuses
to run while any NON-window query's v1 hash (plan-function source +
oracle, no closure walk — ``tests/plan_v1_hashes.json``) has drifted
from its last stamp, because restamping such a row would mark a real
plan change as "driver-verified" when the driver never saw it. Rows
whose v1 legitimately changed belong in the current window, not in a
bootstrap. The default (no flag) stamps only the queries in the
current window, since those are the ones the coming driver round
verifies at current code. Both manifests are stamped together so the
v1 baseline always matches the v2 stamp's round.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lms_erp_data_integration_spark import plans  # noqa: E402
from lms_erp_data_integration_spark.plans import registry  # noqa: E402
from tests.query_hashes import (  # noqa: E402
    MANIFEST_PATH,
    V1_MANIFEST_PATH,
    query_source_hash,
    query_v1_hash,
)


def _load(path: str) -> dict:
    try:
        with open(path) as f:
            return json.load(f)
    except FileNotFoundError:
        return {}


def _write(path: str, manifest: dict) -> None:
    manifest = {n: h for n, h in manifest.items() if n in plans.QUERIES}
    with open(path, "w") as f:
        json.dump(dict(sorted(manifest.items())), f, indent=1)
        f.write("\n")


def main() -> int:
    bootstrap = "--bootstrap" in sys.argv[1:]
    manifest = _load(MANIFEST_PATH)
    v1_manifest = _load(V1_MANIFEST_PATH)
    if bootstrap and v1_manifest:
        drifted = [
            n
            for n in plans.QUERIES
            if n not in registry.PRIORITY
            and n in v1_manifest
            and v1_manifest[n] != query_v1_hash(n)
        ]
        if drifted:
            print(
                "REFUSING --bootstrap: plan-function source changed for "
                "queries OUTSIDE the current driver window — restamping "
                "them would fake driver verification. Add them to "
                f"registry.PRIORITY first: {drifted}"
            )
            return 1
    names = list(plans.QUERIES) if bootstrap else list(registry.PRIORITY)
    for name in names:
        manifest[name] = query_source_hash(name)
        v1_manifest[name] = query_v1_hash(name)
    _write(MANIFEST_PATH, manifest)
    _write(V1_MANIFEST_PATH, v1_manifest)
    print(
        f"stamped {len(names)} queries -> {MANIFEST_PATH} (+ v1 manifest)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
