"""Deterministic run parameters.

The reference stamps wall-clock values into the data (run-dir timestamp
``src/integrator.py:17``, ``load_date = today()`` ``src/canvas.py:101``),
which makes runs non-reproducible. The engine instead threads an explicit
``RunParams`` through every stage.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field


@dataclass(frozen=True)
class RunParams:
    """Parameters for one pipeline run.

    term_id: composite term id, 2-char year + semester code, e.g.
        ``"211S"`` (reference convention: ``tests/test_connect.py:40``).
    run_date: value for the ``load_date`` audit column
        (``src/canvas.py:101``).
    """

    term_id: str = "211S"
    run_date: dt.date = field(default_factory=lambda: dt.date(2021, 9, 1))

    @property
    def yr_cde(self) -> str:
        return self.term_id[:2]

    @property
    def trm_cde(self) -> str:
        return self.term_id[2:4]
