"""Mirror-table writes — the reference's truncate-and-append SQL sink
(``src/jenzabar.py:31-47``) re-expressed as partitioned Parquet
overwrite.

Parity kept: the entity allowlist raising ``NameError`` on unknown
names (``src/jenzabar.py:35-36,42-43``) and the derived table-name
convention (``src/jenzabar.py:40``). Upgrades: snapshot overwrite is
atomic per partition (dynamic partition overwrite) instead of
DELETE-then-INSERT, and mirrors are laid out ``partitionBy(yr_cde,
trm_cde)`` so the per-term diff queries get partition pruning — the
100 TB answer to the reference's ``WHERE yr_cde=? AND trm_cde=?``
parameterization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

MIRROR_ENTITIES = ("users", "courses", "sections", "enrollments")
TERM_COLS = ("yr_cde", "trm_cde")


def mirror_table_name(entity: str) -> str:
    """``f'rpc_RE_Canvas_{name.capitalize()}'`` (``src/jenzabar.py:40``),
    lower-cased for metastore friendliness."""
    if entity not in MIRROR_ENTITIES:
        # exact reference behavior: unknown entity -> NameError
        # (src/jenzabar.py:42-43)
        raise NameError(f"{entity!r} is not a mirrored entity {MIRROR_ENTITIES}")
    return f"rpc_re_canvas_{entity}"


def write_mirror(df: DataFrame, entity: str, base_path: str) -> str:
    """Snapshot-overwrite one mirror table; returns its path."""
    path = f"{base_path.rstrip('/')}/{mirror_table_name(entity)}"
    writer = df.write.mode("overwrite")
    if all(c in df.columns for c in TERM_COLS):
        # dynamic mode: only the (yr_cde, trm_cde) partitions present in
        # df are replaced — refreshing one term must not wipe the others.
        # Set per-writer so the semantics hold on any session.
        writer = writer.partitionBy(*TERM_COLS).option(
            "partitionOverwriteMode", "dynamic"
        )
    writer.parquet(path)
    return path


def read_mirror(spark: SparkSession, entity: str, base_path: str) -> DataFrame:
    return spark.read.parquet(f"{base_path.rstrip('/')}/{mirror_table_name(entity)}")


def upsert_mirror(
    spark: SparkSession,
    updates: DataFrame,
    entity: str,
    base_path: str,
    key_cols: tuple[str, ...],
) -> str:
    """MERGE-style upsert: replace-or-insert ``updates`` rows by key,
    rewriting ONLY the (yr_cde, trm_cde) partitions the updates touch.

    The scalable alternative to snapshot overwrite when a day's delta
    is a sliver of the mirror: untouched term partitions are never
    read or written. Affected-partition discovery collects the
    DISTINCT term tuples of the delta — a handful of values by
    construction (terms, not rows), so the driver collect is bounded.

    Plain-parquet caveat (documented, inherent): without a table
    format there is no snapshot isolation across partitions; each
    partition swap is atomic, the set of swaps is not. A lakehouse
    deployment would land this same plan on Delta/Iceberg MERGE.
    """
    path = f"{base_path.rstrip('/')}/{mirror_table_name(entity)}"
    missing = [c for c in (*TERM_COLS, *key_cols) if c not in updates.columns]
    if missing:
        raise ValueError(f"updates missing required columns {missing}")
    from pyspark.sql import functions as F

    terms = [tuple(r) for r in updates.select(*TERM_COLS).distinct().collect()]
    term_pred = None
    for yr, trm in terms:
        p = (F.col(TERM_COLS[0]) == yr) & (F.col(TERM_COLS[1]) == trm)
        term_pred = p if term_pred is None else (term_pred | p)
    existing = spark.read.parquet(path).where(term_pred)
    # partition-column type inference may read term cols back with a
    # narrower type than the delta carries — align to the delta schema
    # so the union below can't silently coerce
    existing = existing.withColumns(
        {c: F.col(c).cast(updates.schema[c].dataType) for c in TERM_COLS}
    )
    # keep existing rows whose key is NOT updated, then add the delta;
    # the anti-join runs only over the touched partitions
    merged = existing.join(
        updates.select(*key_cols).distinct(), list(key_cols), "left_anti"
    ).unionByName(updates)
    (
        merged.write.mode("overwrite")
        .partitionBy(*TERM_COLS)
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path)
    )
    return path
