from .terms import (  # noqa: F401
    current_term_id,
    next_term_id,
    resolve_term,
    term_id_expr,
    term_successor_expr,
)
