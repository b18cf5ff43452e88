"""JDBC source/sink options (SURVEY.md S5/S8 external variant).

The reference connects to SQL Server via SQLAlchemy/pyODBC
(``src/jenzabar.py:14-16``) and refreshes mirrors with DELETE + batched
INSERT (``:46-47``). The Spark-native equivalents are
``spark.read/write.jdbc`` with ``truncate`` overwrite and an explicit
``batchsize``; no JDBC driver ships in this environment, so the engine
only *builds* the option sets (pure, unit-testable) and callers attach
them where a driver exists.
"""

from __future__ import annotations


def jdbc_options(
    host: str,
    database: str,
    user: str,
    password: str,
    table: str,
    batchsize: int = 10_000,
    truncate: bool = True,
) -> dict[str, str]:
    """Option map for ``spark.read/write.format('jdbc')``. Unlike the
    reference's connection string (``src/jenzabar.py:14-16``), which must
    URL-escape the password to embed it in the URL, Spark passes the
    discrete ``password`` option verbatim to the driver — so it goes in
    raw (escaping here would corrupt any password containing @ : %).
    ``batchsize`` replaces the reference's 100-row pandas chunks
    (``jenzabar.py:47``) — 10k rows per round trip is the sane JDBC
    default; ``truncate`` preserves snapshot-overwrite semantics without
    dropping the table."""
    return {
        "url": f"jdbc:sqlserver://{host};databaseName={database}",
        "dbtable": table,
        "user": user,
        "password": password,
        "batchsize": str(batchsize),
        "truncate": str(truncate).lower(),
    }
