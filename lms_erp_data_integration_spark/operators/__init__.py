from .cleaning import CleanSpec, ENTITY_SPECS, clean  # noqa: F401
from .diff import missing_rows, present_rows, snapshot_diff  # noqa: F401
from . import (  # noqa: F401
    dedup,
    dq,
    gif,
    graph,
    jpeg,
    multimodal,
    profiling,
    relational,
    similarity,
    text,
)
