"""Academic-term scalar functions.

Term id convention (reference): 4-char string, 2-char year + semester
code, e.g. ``"211S"`` = year "21", semester "1S". Successor rule
(``src/integrator.py:27-36``): ``1S -> same year 2S``; ``2S -> year+1 1S``
(2-digit year arithmetic, so "99" rolls to "100" only via int add — the
reference does ``int(year)+1`` then string-formats; we preserve exactly
that, zero-padding to 2).

Two forms are provided: pure-Python (driver-side scalars, mirroring
``integrator.py``) and Column expressions (cluster-side, so a term
column can be derived/advanced without ever collecting to the driver —
at 100 TB there is no driver-side loop).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEM_FIRST = "1S"
SEM_SECOND = "2S"


def next_term_id(term_id: str) -> str:
    """Successor of a term id (``src/integrator.py:27-36``)."""
    yr, trm = term_id[:2], term_id[2:4]
    if trm == SEM_SECOND:
        return f"{int(yr) + 1:02d}{SEM_FIRST}"
    return f"{yr}{SEM_SECOND}"


def current_term_id(reg_config: DataFrame) -> str:
    """Current term from a REG_CONFIG-shaped frame: first row,
    ``trim(CUR_YR_DFLT) || trim(CUR_TRM_DFLT)`` (``src/jenzabar.py:24-26``).
    """
    row = reg_config.select(
        F.concat(F.trim(F.col("CUR_YR_DFLT")), F.trim(F.col("CUR_TRM_DFLT"))).alias(
            "term_id"
        )
    ).first()
    if row is None:
        raise ValueError("REG_CONFIG is empty")
    return row["term_id"]


def resolve_term(reg_config: DataFrame, which: str = "current") -> str:
    """Resolve "current" or "next" term (``src/integrator.py:20-38``)."""
    term = current_term_id(reg_config)
    if which == "next":
        return next_term_id(term)
    if which == "current":
        return term
    raise ValueError(f"which must be 'current' or 'next', got {which!r}")


def term_id_expr(yr_cde: Column, trm_cde: Column) -> Column:
    """Compose a term id column from its parts."""
    return F.concat(F.trim(yr_cde), F.trim(trm_cde))


def term_successor_expr(term_id: Column) -> Column:
    """Column form of :func:`next_term_id` — runs JVM-side (codegen),
    no UDF."""
    yr = F.substring(term_id, 1, 2)
    trm = F.substring(term_id, 3, 2)
    next_yr_s = (yr.cast("int") + F.lit(1)).cast("string")
    # pad to 2 like Python's f"{n:02d}" — but never truncate ("99"->"100")
    next_yr = F.when(F.length(next_yr_s) < 2, F.lpad(next_yr_s, 2, "0")).otherwise(
        next_yr_s
    )
    return F.when(trm == SEM_SECOND, F.concat(next_yr, F.lit(SEM_FIRST))).otherwise(
        F.concat(yr, F.lit(SEM_SECOND))
    )
