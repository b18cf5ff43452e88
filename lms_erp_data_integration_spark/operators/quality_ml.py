"""Distributed quality-classifier training — the fastText/CCNet-style
learned document filter, as exact integer-deterministic logistic
regression.

Real curation pipelines (CCNet, GPT-3's data work — public papers)
train a lightweight classifier on cheap text features and keep
documents the model scores as "quality". The engine's version trains
full-batch logistic regression ON THE CLUSTER: features are
integer-scaled Column expressions, each gradient step is ONE
aggregation whose per-row contributions are rounded to exact integer
micro-units — so the distributed SUM is commutative/associative-exact
and the learned weights are bit-identical regardless of partitioning,
parallelism, or row order. The same property makes the whole training
loop expressible as an unrolled DuckDB oracle (the BPE/k-means
precedent).

Scale posture: the feature frame is computed once and persisted
(narrow, codegen'd — no Python); each of the K iterations is one
map-side-combined aggregation producing 4 longs; the driver update is
O(features). At 100 TB this is K sequential scans of a cached narrow
projection — the same cost class as any global aggregate, with no
shuffle wider than the 4-long partial rows.

Numeric contract (mirrored in the SQL oracle): ratios use integer
``div`` on non-negative operands; the sigmoid is computed in double
then rounded half-up to micro-units (the only float op — same
exp()-rounding exposure the micro-nat bigram LM already ships);
gradient sums are exact BIGINTs; weight updates use TRUNCATING
integer division (DuckDB ``//`` truncates toward zero — Python's
floor ``//`` differs on negatives, so the driver uses _tdiv).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import STOPWORDS

MICRO = 1_000_000

# weak-supervision labeling rule (deterministic; the model learns to
# reproduce-and-generalize the rule from the features)
_STOP_MIN_MICRO = 50_000     # stopword ratio >= 5%
_PUNCT_MAX_MICRO = 300_000   # punctuation ratio <= 30%
_MIN_TOKENS = 20

FEATURES = ("bias", "stop_ratio", "mean_tok_len", "len_capped")
# fixed per-feature scale divisors applied to the centered features:
# chosen once from the corpus-independent structure of each feature
# (ratio micros / length micros) so every scaled feature lands in a
# comparable +-few-hundred range — integer-exact standardization
# without the float sqrt a stddev would need
SCALES = (100, 500, 5000, 2000)  # bias "feature" is the constant 100


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (matches DuckDB ``//`` and Spark
    ``div`` on negatives, unlike Python's floor ``//``)."""
    q = abs(a) // b
    return -q if a < 0 else q


def feature_frame(
    docs: DataFrame, text_col: str = "text", keep: tuple = ()
) -> DataFrame:
    """Integer micro-scaled features + weak label per document.
    Columns: f0 (bias), f1 (stopword ratio), f2 (mean token length),
    f3 (capped token count), y (label in {0, 1}). The punctuation
    ratio is deliberately absent: the synthetic corpus contains none,
    so it would be a constant-zero column (its rule clause is then
    vacuous and omitted from the label too). ``keep`` passes
    identifier columns (e.g. ``("doc_id",)``) through unchanged for
    consumers that score per document (the calibrated gate); the
    training aggregates never read them."""
    text = F.col(text_col)
    toks = F.split(F.trim(text), r"\s+")
    n_tokens = F.size(toks).cast("long")
    n_chars = F.length(text).cast("long")
    n_stop = F.size(
        F.filter(
            F.transform(toks, lambda t: F.lower(t)),
            lambda t: t.isin(*STOPWORDS),
        )
    ).cast("long")
    base = docs.select(
        *keep,
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars"),
        n_stop.alias("n_stop"),
    )
    f1 = F.expr(f"({MICRO} * n_stop) div greatest(n_tokens, 1)")
    f2 = F.expr(
        f"({MICRO} * (n_chars - n_tokens + 1)) div greatest(n_tokens, 1)"
    )
    f3 = F.least(F.col("n_tokens"), F.lit(200)) * F.lit(5000)
    return base.select(
        *keep,
        F.lit(MICRO).cast("long").alias("f0"),
        f1.cast("long").alias("f1"),
        f2.cast("long").alias("f2"),
        f3.cast("long").alias("f3"),
        (
            (F.col("n_tokens") >= _MIN_TOKENS) & (f1 >= _STOP_MIN_MICRO)
        )
        .cast("long")
        .alias("y"),
    )


def _scaled_expr(j: int, means: list[int]):
    """Centered, scale-divided integer feature column c_j. The bias
    (j=0) is the constant SCALES[0]."""
    if j == 0:
        return F.lit(SCALES[0]).cast("long")
    return F.expr(
        f"(f{j} - {int(means[j])}) div {SCALES[j]}"
    ).cast("long")


def _p_micro_expr(w: list[int], means: list[int]):
    """Column: sigmoid of the micro-scaled dot product over centered,
    scale-divided features, rounded half-up to micro-units — the
    per-row quantity whose integer sum forms the gradient. Centering
    (exact integer per-feature means) + fixed integer scales are what
    let badly-scaled all-positive raw features train without
    oscillation."""
    z = sum(
        _scaled_expr(j, means) * F.lit(int(w[j])) for j in range(4)
    ) / F.lit(float(MICRO))
    p = 1.0 / (1.0 + F.exp(-z))
    return F.floor(p * MICRO + F.lit(0.5)).cast("long")


def fit_quality_logreg(
    docs: DataFrame,
    text_col: str = "text",
    iterations: int = 6,
    step_divisor: int = 2_000,
    keep: tuple = (),
) -> tuple[DataFrame, list[int], list[int], int]:
    """Run the training loop only; returns (persisted feature frame,
    micro-weights, integer feature means, n). Shared by the training
    row and the threshold-calibration row so the calibration scores
    with exactly the weights the classifier row reports. ``keep``
    threads identifier columns through the persisted feature frame
    (the gradient aggregates never touch them, so the learned weights
    are identical with or without)."""
    from ..caching import tracked_persist

    feats = tracked_persist(feature_frame(docs, text_col, keep))
    stats = feats.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(f"f{j}").alias(f"s{j}") for j in range(4)],
    ).first()
    n = int(stats["n"])
    # exact integer feature means; f0 stays uncentered (true bias)
    means = [0] + [_tdiv(int(stats[f"s{j}"]), n) for j in range(1, 4)]
    w = [0, 0, 0, 0]
    for _ in range(iterations):
        r = (_p_micro_expr(w, means) - F.col("y") * MICRO).alias("r")
        g = feats.select(r, "f0", "f1", "f2", "f3").agg(
            *[
                F.sum(F.col("r") * _scaled_expr(j, means)).alias(f"g{j}")
                for j in range(4)
            ]
        ).first()
        w = [
            w[j] - _tdiv(int(g[f"g{j}"]), n * step_divisor)
            for j in range(4)
        ]
    return feats, w, means, n


def train_quality_logreg(
    docs: DataFrame,
    text_col: str = "text",
    iterations: int = 6,
    step_divisor: int = 2_000,
) -> DataFrame:
    """Full-batch logistic regression on the quality features.
    Returns ONE row: the learned micro-weights, the training-set
    confusion matrix at p >= 0.5, and n — every value an exact
    BIGINT, bit-identical across partitionings."""
    feats, w, means, n = fit_quality_logreg(
        docs, text_col, iterations, step_divisor
    )
    pred = (_p_micro_expr(w, means) >= MICRO // 2).cast("long")
    out = feats.select(pred.alias("pred"), "y").agg(
        F.sum(F.expr("pred * y")).alias("tp"),
        F.sum(F.expr("pred * (1 - y)")).alias("fp"),
        F.sum(F.expr("(1 - pred) * y")).alias("fn"),
        F.sum(F.expr("(1 - pred) * (1 - y)")).alias("tn"),
    )
    return out.select(
        *[F.lit(int(w[j])).alias(f"w{j}") for j in range(4)],
        *[F.lit(int(means[j])).alias(f"mean{j}") for j in range(1, 4)],
        "tp", "fp", "fn", "tn",
        F.lit(int(n)).alias("n_docs"),
    )
