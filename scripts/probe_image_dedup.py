"""Image-near-dup scale probe (r9 verdict #3): the registered
``llm_image_visual_dedup`` row is fixture-gated at 10 payloads (its
oracle pins decoded pHashes as literal VALUES), so the bench never
measures the path's SCALING. This probe measures it directly: the
payload corpus is extended deterministically (ids >= 10 are planted
PNG/noisy-QOI content pairs, constant dup density), and the full
pipeline — encode -> format-sniffing decode -> pHash (one Arrow
mapInPandas pass) -> banded-LSH candidates -> Hamming verify — is
timed over a decade of corpus sizes.

Usage: python scripts/probe_image_dedup.py [n_small] [n_big]
Defaults 300 / 3000 (one decade). Prints per-size seconds + the
observed exponent, and merges an ``image_visual_dedup_scaled`` row
into scale_probe_result.json.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 3000

    from pyspark.sql import functions as F

    from lms_erp_data_integration_spark.caching import release_cached
    from lms_erp_data_integration_spark.plans.media_queries import (
        _IMG_DUP_BITS,
        _phash_candidates,
        image_phashes,
    )
    from lms_erp_data_integration_spark.session import get_spark

    spark = get_spark(app_name="probe_image_dedup")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def timed(n: int) -> tuple[float, int, int]:
        best, pairs, hashes = float("inf"), 0, 0
        for _ in range(2):
            t0 = time.perf_counter()
            ph = image_phashes(spark, n).persist()
            hashes = ph.count()
            cand = _phash_candidates(ph)
            dups = cand.where(F.col("hamming") <= _IMG_DUP_BITS)
            pairs = dups.count()
            best = min(best, time.perf_counter() - t0)
            ph.unpersist()
            release_cached()
        return best, hashes, pairs

    t1, h1, p1 = timed(n_small)
    t2, h2, p2 = timed(n_big)
    exp = math.log(t2 / t1) / math.log(n_big / n_small)
    print(
        f"n={n_small}: {t1:.2f}s ({h1} hashes, {p1} dup pairs)\n"
        f"n={n_big}: {t2:.2f}s ({h2} hashes, {p2} dup pairs)\n"
        f"observed exponent: {exp:.2f}"
    )

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scale_probe_result.json",
    )
    try:
        with open(path) as f:
            doc = json.load(f)
    except (OSError, ValueError):
        doc = {"note": "", "results": []}
    merged = {r["query"]: r for r in doc.get("results", [])}
    merged["image_visual_dedup_scaled"] = {
        "query": "image_visual_dedup_scaled",
        "n_small": n_small,
        "n_big": n_big,
        "sec_small": round(t1, 3),
        "sec_big": round(t2, 3),
        "dup_pairs_small": p1,
        "dup_pairs_big": p2,
        "exponent": round(exp, 3),
        "basis": "corpus size n (images), not sf",
    }
    doc["results"] = sorted(merged.values(), key=lambda r: r["query"])
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"merged into {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
