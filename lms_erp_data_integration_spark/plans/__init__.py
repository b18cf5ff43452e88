from .registry import QUERIES, ORACLES, query, all_queries  # noqa: F401

# Importing the plan modules populates the registry.
from . import sync_queries  # noqa: F401, E402
from . import relational_queries  # noqa: F401, E402
from . import tpch_shapes  # noqa: F401, E402
from . import llm_queries  # noqa: F401, E402
from . import streaming_queries  # noqa: F401, E402
from . import analytics_queries  # noqa: F401, E402
