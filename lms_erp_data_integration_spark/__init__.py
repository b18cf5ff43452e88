"""PySpark-native analytics/ETL engine with the capabilities of the
reference LMS/ERP integration pipeline (AbelGonzalezPortfolio/
LMS_ERP_Data_Integration), re-expressed Spark-first.

Layout (SURVEY.md section 7 build plan):

- ``session``    - tuned SparkSession factory (local + cluster posture)
- ``catalog``    - typed table catalog over Parquet test data
- ``runparams``  - deterministic run parameters (run_date, term_id)
- ``functions``  - scalar helpers (term arithmetic, cleaning exprs)
- ``operators``  - cleaning spec, snapshot-diff family, dedup,
                   similarity, text analysis, multimodal plumbing
- ``plans``      - named query plans (sync diffs Q1-Q7, relational
                   surface, LLM-data queries) used by __spark_entry__
- ``pipeline``   - ordered sink runner, mirror writes, run report
- ``sources``    - connectors (parquet/csv core; REST/JDBC adapters)
- ``streaming``  - Structured Streaming variants of the daily diff
"""

__version__ = "0.1.0"
