from .windows import hourly_event_counts, sliding_event_value  # noqa: F401
from .stateful import running_user_totals  # noqa: F401
