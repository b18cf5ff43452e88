"""Interleaved same-session A/B: threaded (guide §2.6 overlap) vs
sequential leg ordering for llm_corpus_curate_calibrated.

The sequential variant below replicates the pre-r14 code path line for
line using the same shared helpers, so the ONLY difference is whether
the quality leg and the dedup leg run concurrently. Both variants are
forced with the bench's noop sink and interleaved N times; rows are
also compared for equality. Usage:

    python scripts/ab_curate_overlap.py [n_rounds] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lms_erp_data_integration_spark.caching import (  # noqa: E402
    release_cached,
    tracked_persist,
)
from lms_erp_data_integration_spark.catalog import Catalog  # noqa: E402
from lms_erp_data_integration_spark.session import get_spark  # noqa: E402


def main() -> int:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from pyspark.sql import functions as F

    from lms_erp_data_integration_spark.operators.quality_ml import (
        _p_micro_expr,
        fit_quality_logreg,
    )
    from lms_erp_data_integration_spark.plans.curation_queries import (
        PSI_DRIFT_MICRO,
        QUALITY_PRECISION_FLOOR_MICRO,
        _choose_quality_point,
        corpus_curate_calibrated_frame,
        psi_kept_sources,
        psi_report_from_scores,
        quality_curve_frame,
    )
    from lms_erp_data_integration_spark.plans.llm_queries import (
        DEDUP_DROP_BUDGET_PPM,
        _choose_dedup_threshold,
        _drops_at_threshold,
        _pairs_at_sweep_floor,
        _threshold_curve_frame,
    )

    spark = get_spark(app_name="ab_curate_overlap")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def sequential(docs):
        """Pre-r14 ordering: quality leg then dedup leg, serially."""
        feats, w, means, _n = fit_quality_logreg(
            docs, keep=("doc_id", "source")
        )
        qth, qmet = _choose_quality_point(
            quality_curve_frame(feats, w, means).collect(),
            QUALITY_PRECISION_FLOOR_MICRO,
        )
        kept_src = psi_kept_sources(
            psi_report_from_scores(
                feats.select("doc_id", "source", F.col("f1").alias("score"))
            ),
            PSI_DRIFT_MICRO,
        ).select("source", F.lit(1).alias("_ok_src"))
        st = tracked_persist(_pairs_at_sweep_floor(docs))
        curve = {
            int(r["threshold_pct"]): r
            for r in _threshold_curve_frame(spark, st, docs).collect()
        }
        dth, dwb = _choose_dedup_threshold(curve, DEDUP_DROP_BUDGET_PPM)
        drops = _drops_at_threshold(st, dth).select(
            F.col("member").alias("doc_id"), F.lit(1).alias("_dup")
        )
        flags = (
            feats.select(
                "doc_id", "source", _p_micro_expr(w, means).alias("p")
            )
            .join(kept_src, "source", "left")
            .join(drops, "doc_id", "left")
        )
        q_pass = f"p >= {int(qth)}"
        agg = flags.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.expr(f"CASE WHEN NOT ({q_pass}) THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n_fail_quality"),
            F.sum(
                F.expr(
                    f"CASE WHEN ({q_pass}) AND _ok_src IS NULL"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("long")
            .alias("n_drift_dropped"),
            F.sum(
                F.expr(
                    f"CASE WHEN ({q_pass}) AND _ok_src = 1 AND _dup = 1"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("long")
            .alias("n_dup_dropped"),
            F.sum(
                F.expr(
                    f"CASE WHEN ({q_pass}) AND _ok_src = 1 AND _dup IS NULL"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("long")
            .alias("n_kept"),
        )
        return agg.select(
            "n_docs",
            F.lit(int(qth)).cast("long").alias("quality_threshold_micro"),
            F.lit(int(qmet)).cast("long").alias("quality_met_floor"),
            "n_fail_quality",
            F.lit(int(PSI_DRIFT_MICRO)).cast("long").alias("psi_line_micro"),
            "n_drift_dropped",
            F.lit(int(dth)).cast("long").alias("dedup_threshold_pct"),
            F.lit(int(dwb)).cast("long").alias("dedup_within_budget"),
            "n_dup_dropped",
            "n_kept",
        )

    def run(tag, fn):
        docs = Catalog(spark, sf_dir).documents
        t0 = time.perf_counter()
        df = fn(docs)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        rows = sorted(map(tuple, df.collect()))
        release_cached()
        return dt, rows

    timings = {"threaded": [], "sequential": []}
    ref_rows = None
    for i in range(n_rounds):
        order = (
            ("threaded", lambda d: corpus_curate_calibrated_frame(spark, d)),
            ("sequential", sequential),
        )
        if os.environ.get("AB_FLIP"):
            order = order[::-1]
        for tag, fn in order:
            dt, rows = run(tag, fn)
            timings[tag].append(round(dt, 3))
            if ref_rows is None:
                ref_rows = rows
            elif rows != ref_rows:
                print(f"ROW MISMATCH in {tag} round {i}: {rows} != {ref_rows}")
                return 1
    print(json.dumps(timings))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
