"""Shared helper for the rotation-policy manifest (see
``scripts/update_checked_hashes.py``): hash of a registered query's
plan-function source + oracle SQL. Limitation (documented, accepted):
the hash covers the registered function's own source, not helpers it
calls in ``operators/`` — a helper-only change does not flip it. The
window-rotation checklist therefore still says "any query whose
*behavior* changed enters the window"; this hash mechanizes the common
case (plan or oracle edits)."""

from __future__ import annotations

import hashlib
import inspect
import os

from lms_erp_data_integration_spark import plans

MANIFEST_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "checked_hashes.json"
)


def query_source_hash(name: str) -> str:
    src = inspect.getsource(plans.QUERIES[name])
    oracle = plans.ORACLES.get(name, "")
    return hashlib.sha256(
        (src + "\x00" + oracle).encode()
    ).hexdigest()[:16]
