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
intentional full re-baseline); the default stamps only the queries in
the current window, since those are the ones the coming driver round
verifies at current code.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lms_erp_data_integration_spark import plans  # noqa: E402
from lms_erp_data_integration_spark.plans import registry  # noqa: E402
from tests.query_hashes import MANIFEST_PATH, query_source_hash  # noqa: E402


def main() -> int:
    bootstrap = "--bootstrap" in sys.argv[1:]
    try:
        with open(MANIFEST_PATH) as f:
            manifest = json.load(f)
    except FileNotFoundError:
        manifest = {}
    names = list(plans.QUERIES) if bootstrap else list(registry.PRIORITY)
    for name in names:
        manifest[name] = query_source_hash(name)
    # drop entries for queries that no longer exist
    manifest = {n: h for n, h in manifest.items() if n in plans.QUERIES}
    with open(MANIFEST_PATH, "w") as f:
        json.dump(dict(sorted(manifest.items())), f, indent=1)
        f.write("\n")
    print(f"stamped {len(names)} queries -> {MANIFEST_PATH}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
