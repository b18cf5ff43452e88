from .mirror import MIRROR_ENTITIES, mirror_table_name, write_mirror  # noqa: F401
from .runner import UPDATE_ORDER, SyncPipeline, run_report  # noqa: F401
