"""Declarative cleaning spec — the reference's per-entity cleaning
pipeline (``src/canvas.py:62-104``) generalized, as the prototype's
``_prepare_dataframe_for_sql`` suggested (``tests/test_connect.py:168-186``).

One :class:`CleanSpec` fuses, in order:

- filters (F1 not-null, F2 ASCII-numeric id, F3 prefix exclusion)
- projection to ``cols_to_keep`` (P1, ``src/canvas.py:91``)
- rename map (P2, ``src/canvas.py:92``)
- boolean -> legacy T-SQL bit: True -> -1, False -> 0 (T1,
  ``src/canvas.py:94-95``; invariant tested ``tests/test_connect.py:184-186``)
- term columns ``yr_cde``/``trm_cde`` stamped as literals (T2,
  ``src/canvas.py:97-99``)
- audit ``load_date`` from RunParams, not wall clock (T3,
  ``src/canvas.py:101``)
- nullable long casts (T4, ``src/jenzabar.py:77-78``)

All steps are narrow Column expressions: Catalyst fuses the whole spec
into a single whole-stage-codegen'd scan stage — no shuffle, filters and
projection pushed into the Parquet scan. That property is what makes the
same spec viable over a 100 TB input.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..runparams import RunParams

# ASCII-digit standardization of pandas str.isnumeric (``src/canvas.py:70``)
# — documented Unicode-digit edge in SURVEY.md section 2.2 (F2).
_NUMERIC_RE = "^[0-9]+$"


@dataclass(frozen=True)
class CleanSpec:
    """Declarative cleaning recipe for one entity."""

    cols_to_keep: tuple[str, ...]
    rename: dict[str, str] = field(default_factory=dict)
    not_null: tuple[str, ...] = ()
    numeric_only: tuple[str, ...] = ()
    exclude_prefix: dict[str, str] = field(default_factory=dict)
    bool_to_bit: tuple[str, ...] = ()
    add_term_cols: bool = False
    cast_long: tuple[str, ...] = ()


def clean(df: DataFrame, spec: CleanSpec, params: RunParams) -> DataFrame:
    """Apply a :class:`CleanSpec` — a single narrow (shuffle-free) stage."""
    for c in spec.not_null:
        df = df.where(F.col(c).isNotNull())
    for c in spec.numeric_only:
        df = df.where(F.col(c).rlike(_NUMERIC_RE))
    for c, prefix in spec.exclude_prefix.items():
        df = df.where(~F.col(c).startswith(prefix))
    df = df.select(*spec.cols_to_keep)
    if spec.rename:
        df = df.withColumnsRenamed(spec.rename)
    for c in spec.bool_to_bit:
        if c in df.columns:  # reference guards on presence (canvas.py:94)
            df = df.withColumn(
                c, F.when(F.col(c).cast("boolean"), F.lit(-1)).otherwise(F.lit(0))
            )
    if spec.add_term_cols:
        df = df.withColumn("yr_cde", F.lit(params.yr_cde)).withColumn(
            "trm_cde", F.lit(params.trm_cde)
        )
    for c in spec.cast_long:
        if c in df.columns:
            df = df.withColumn(c, F.col(c).cast("long"))
    return df.withColumn("load_date", F.lit(params.run_date))


# Per-entity specs, verbatim from the reference cleaning branches
# (``src/canvas.py:66-88``) and the schema-contract tests
# (``tests/test_connect.py:117,133,146-147,160-161``).
ENTITY_SPECS: dict[str, CleanSpec] = {
    "users": CleanSpec(
        cols_to_keep=("user_id", "canvas_user_id", "login_id"),
        rename={"user_id": "id_num", "canvas_user_id": "canvas_user"},
        not_null=("user_id",),
        numeric_only=("user_id",),
    ),
    "courses": CleanSpec(
        cols_to_keep=("canvas_course_id", "course_id", "status"),
        rename={"course_id": "crs_cde"},
        add_term_cols=True,
    ),
    "sections": CleanSpec(
        cols_to_keep=(
            "course_id",
            "section_id",
            "name",
            "status",
            "account_id",
            "canvas_section_id",
            "created_by_sis",
        ),
        rename={"course_id": "crs_cde"},
        bool_to_bit=("created_by_sis",),
        add_term_cols=True,
    ),
    "enrollments": CleanSpec(
        cols_to_keep=(
            "course_id",
            "user_id",
            "role",
            "section_id",
            "status",
            "canvas_enrollment_id",
            "canvas_section_id",
            "created_by_sis",
        ),
        bool_to_bit=("created_by_sis",),
        add_term_cols=True,
        cast_long=("user_id",),
    ),
}
