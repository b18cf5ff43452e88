"""Local replica of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a scale factor and
compares it against its DuckDB ``oracle_sql()`` twin: row count, column
names (sorted), and order-insensitive values. Exits non-zero on any
mismatch. Usage:

    python scripts/parity.py [--vanilla] [sf_dir] [query ...]

``--vanilla`` builds a bare SparkSession (like the driver's harness)
instead of the tuned ``get_spark`` one, so session-config assumptions
get caught here first.
"""

from __future__ import annotations

import decimal
import math
import sys

import duckdb
import pyarrow as pa

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from lms_erp_data_integration_spark.caching import release_cached  # noqa: E402
from lms_erp_data_integration_spark.catalog import TABLES  # noqa: E402
from lms_erp_data_integration_spark.session import get_spark  # noqa: E402


def norm(v):
    """Normalize a cell for comparison across engines.

    Exactly as strict as the driver's value hash: floats compare at
    full ``repr`` precision (shortest round-trip — bit-identical
    doubles or bust) and Decimals at exact text including scale. The
    old 9-significant-digit float rounding let ``rel_profile_columns``
    pass locally and fail the driver hash in r3; any query that fails
    at full precision gets the exact-integer (cents/micros) treatment
    instead of a looser comparator."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def frame_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        (tuple(norm(r[i]) for i in order) for r in rows), key=repr
    )
    return [cols[i] for i in order], out


def main() -> int:
    argv = list(sys.argv[1:])
    vanilla = "--vanilla" in argv
    if vanilla:
        argv.remove("--vanilla")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    if vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.shuffle.partitions", "8")
            .config("spark.ui.enabled", "false")
            .appName("parity-vanilla")
            .getOrCreate()
        )
    else:
        spark = get_spark(app_name="parity")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            failed.append(name)
            continue
        finally:
            release_cached()
        if name not in oracles:
            print(f"rows-only  {name}: {len(s_rows)} rows (no oracle)")
            continue
        try:
            arrow = con.execute(oracles[name]).fetch_arrow_table()
            d_cols = arrow.column_names
            # Positional extraction (not to_pylist's dict-per-row): an
            # oracle with duplicate output column names must not
            # silently collapse columns and compare wrong values.
            d_rows = list(
                zip(*[col.to_pylist() for col in arrow.columns])
            )
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {e}")
            failed.append(name)
            continue
        # The driver hashes typed (Arrow) values, so an oracle emitting a
        # type Spark can't produce — e.g. DuckDB widening an integer SUM
        # to HUGEINT (int128, surfaced in Arrow as decimal128(38,0)) —
        # hash-mismatches even when values agree. Catch it here: the r2
        # judge traced all four r2 hash failures to exactly this. Fix is
        # CAST(... AS BIGINT) in the oracle string. Known false
        # positive: an oracle *intentionally* emitting DECIMAL(38,0)
        # would be flagged too — none exists today; whitelist per-query
        # here if one ever does.
        wide = [
            f.name
            for f in arrow.schema
            if (
                pa.types.is_decimal(f.type)
                and f.type.precision == 38
                and f.type.scale == 0
            )
            or pa.types.is_decimal256(f.type)
        ]
        if wide:
            print(f"FAIL  {name}: oracle emits non-Spark types {wide}")
            failed.append(name)
            continue
        sk_cols, sk = frame_key(s_cols, s_rows)
        dk_cols, dk = frame_key(d_cols, d_rows)
        if sk_cols != dk_cols:
            print(f"FAIL  {name}: columns {sk_cols} != {dk_cols}")
            failed.append(name)
        elif len(sk) != len(dk):
            print(f"FAIL  {name}: rows {len(sk)} != {len(dk)}")
            failed.append(name)
        elif sk != dk:
            bad = next(i for i, (a, b) in enumerate(zip(sk, dk)) if a != b)
            print(f"FAIL  {name}: values differ, first at sorted row {bad}:")
            print(f"      spark : {sk[bad]}")
            print(f"      duckdb: {dk[bad]}")
            failed.append(name)
        else:
            print(f"OK    {name}: {len(sk)} rows")
    spark.stop()
    if failed:
        print(f"\n{len(failed)} FAILED: {failed}")
        return 1
    print("\nall queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
