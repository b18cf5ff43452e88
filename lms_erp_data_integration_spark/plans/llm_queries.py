"""LLM-data-pipeline queries (SURVEY.md M7 north star): dedup,
similarity search, text analysis, multimodal metadata — over the
``documents`` and ``embeddings`` tables.

Oracle strategy: every hash/LSH algorithm uses an md5-derived hash
family that DuckDB reproduces exactly (``('0x' || substr(md5(x),1,15))
::BIGINT``), so the oracles replicate the ENTIRE pipeline — including
LSH's own false negatives — and comparisons are bit-exact. Cosine
scores are bit-identical too: float->double casts are exact, float
products are exact in double, and both engines fold sums sequentially.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..operators import dedup as dd
from ..operators import similarity as sim
from ..operators import text as tx
from .registry import query

# ---------------------------------------------------------------- dedup

@query(
    "llm_dedup_exact",
    """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0)
SELECT md5(text) AS text_hash, MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
FROM corpus GROUP BY md5(text) HAVING COUNT(*) > 1
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (hash-groupBy). The test corpus has no exact dups,
    so a deterministic 10% resample is unioned in as planted copies."""
    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    planted = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return dd.exact_duplicates(docs.unionByName(planted))


# More shared oracle fragments (same zero-hash-change contract):
# integer-scaled and L2-normalized embedding CTE bodies, the
# cold-shingle candidate-pair + intersection block, the per-doc
# shingle-count CTE, and the top-10-per-query ranking tail.
_VI_CTE = """WITH v AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> floor(x * 1000000 + 0.5)) AS vi
  FROM embeddings),"""

_NORM_VEC_SELECT = """  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
           x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
                                          embedding::DOUBLE[]))) AS v
  FROM embeddings)"""

_PAIRS_INTER_CTE = """pairs AS (
  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
  FROM shing a
  JOIN cold c ON c.shingle = a.shingle
  JOIN shing b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
inter AS (
  SELECT p.i, p.j, COUNT(*) AS inter
  FROM pairs p
  JOIN shing si ON si.doc_id = p.i
  JOIN shing sj ON sj.doc_id = p.j AND sj.shingle = si.shingle
  GROUP BY p.i, p.j)"""

_SIZES_CTE = "sizes AS (SELECT doc_id, COUNT(*) AS n FROM shing GROUP BY doc_id),"

_RANK10_TAIL = """ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, score, rank FROM ranked WHERE rank <= 10
"""


_SIZES_COLD_CTE = (
    _SIZES_CTE
    + f"""
cold AS (
  SELECT shingle FROM shing GROUP BY shingle
  HAVING COUNT(*) <= {dd.NGRAM_MAX_DOC_FREQ}),"""
)


# Shared DuckDB-oracle CTE preludes (r6 verdict #7): every
# shingle-family oracle opens with the same tokenize+shingle CTEs and
# the four MinHash-family oracles add the same hash/minhash/band
# block. One definition each; the parity sweep proves the assembled
# strings stay byte-identical to the pre-factor literals.
_TOKS_SHING = r"""WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
shing AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM toks, unnest(range(1, len(w) - 1)) AS t(i)),"""


def _mh_banded_cte(num_hashes: int, rows_per_band: int) -> str:
    """toks/shing/base/mh/banded prelude shared by the MinHash-family
    oracles (llm_dedup_minhash_lsh, llm_minhash_accuracy,
    llm_dedup_incremental, llm_lsh_bucket_histogram)."""
    a, b = dd.mh_params(num_hashes)
    a_sql = "[" + ", ".join(map(str, a)) + "]"
    b_sql = "[" + ", ".join(map(str, b)) + "]"
    return f"""{_TOKS_SHING}
base AS (
  SELECT doc_id, shingle,
         ('0x' || substr(md5(shingle), 1, 7))::BIGINT AS h
  FROM shing),
mh AS (
  SELECT doc_id, seed,
         MIN(({a_sql}[seed + 1] * h + {b_sql}[seed + 1]) % {dd.MH_MOD})
           AS minhash
  FROM base, unnest(range(0, {num_hashes})) AS s(seed)
  GROUP BY doc_id, seed),
banded AS (
  SELECT doc_id, seed // {rows_per_band} AS band,
         string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed) AS band_key
  FROM mh GROUP BY doc_id, seed // {rows_per_band}),"""


def _minhash_oracle(num_hashes: int = 16, rows_per_band: int = 2) -> str:
    return rf"""
{_mh_banded_cte(num_hashes, rows_per_band)}
cands AS (
  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
{_SIZES_CTE}
inter AS (
  SELECT c.i, c.j, COUNT(*) AS inter
  FROM cands c
  JOIN shing si ON si.doc_id = c.i
  JOIN shing sj ON sj.doc_id = c.j AND sj.shingle = si.shingle
  GROUP BY c.i, c.j)
SELECT i, j, inter * 1.0 / (sa.n + sb.n - inter) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = i
JOIN sizes sb ON sb.doc_id = j
WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8
"""


_MINHASH_ORACLE = _minhash_oracle()


@query("llm_dedup_minhash_lsh", _MINHASH_ORACLE)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH(8 bands x 2 rows) + exact-Jaccard verify at
    0.8 over 3-word shingles. The oracle replicates the full LSH
    pipeline, so even its false negatives match."""
    docs = Catalog(spark, sf_dir).documents
    return dd.minhash_near_duplicates(
        docs, threshold=0.8, num_hashes=16, bands=8, shingle_n=3
    )


@query(
    "llm_dedup_ngram_jaccard",
    rf"""
{_TOKS_SHING}
{_SIZES_COLD_CTE}
{_PAIRS_INTER_CTE}
SELECT i, j, inter * 1.0 / (sa.n + sb.n - inter) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = i
JOIN sizes sb ON sb.doc_id = j
WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram-Jaccard near-dup baseline (inverted-index join with
    a hot-shingle posting-list cap) — ground truth for the MinHash
    path. The oracle mirrors the cap: candidates come from cold
    shingles only, Jaccard from the full sets."""
    docs = Catalog(spark, sf_dir).documents
    return dd.ngram_jaccard_duplicates(docs, threshold=0.8, shingle_n=3)


def _minhash_accuracy_oracle(
    num_hashes: int = 16, rows_per_band: int = 2
) -> str:
    return rf"""
{_mh_banded_cte(num_hashes, rows_per_band)}
cands AS (
  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
est AS (
  SELECT c.i, c.j, COUNT(*) AS est_matches
  FROM cands c
  JOIN mh ma ON ma.doc_id = c.i
  JOIN mh mb ON mb.doc_id = c.j AND mb.seed = ma.seed
            AND mb.minhash = ma.minhash
  GROUP BY c.i, c.j),
{_SIZES_CTE}
inter AS (
  SELECT c.i, c.j, COUNT(*) AS inter
  FROM cands c
  JOIN shing si ON si.doc_id = c.i
  JOIN shing sj ON sj.doc_id = c.j AND sj.shingle = si.shingle
  GROUP BY c.i, c.j)
SELECT x.i, x.j,
       CAST(e.est_matches AS BIGINT) AS est_matches,
       e.est_matches / {float(num_hashes)} AS est_jaccard,
       x.inter * 1.0 / (sa.n + sb.n - x.inter) AS jaccard
FROM inter x
JOIN est e ON e.i = x.i AND e.j = x.j
JOIN sizes sa ON sa.doc_id = x.i
JOIN sizes sb ON sb.doc_id = x.j
"""


@query("llm_minhash_accuracy", _minhash_accuracy_oracle())
def minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-calibration audit: for every LSH candidate pair, the
    MinHash-ESTIMATED Jaccard (matching signature slots / 16) next to
    the exact Jaccard — the residual between the two columns is the
    sketch error that decides whether 16 hashes suffice or the band
    scheme needs more rows. Run on the candidate set (collision-sized,
    never all-pairs), so the audit costs barely more than the dedup
    itself.

    Scale: signatures and shingle sets are both narrow per-doc
    builds; the only shuffles are the band equi-join (collision-bound)
    and the pair verify joins, identical to the production LSH path."""
    from ..caching import tracked_persist

    docs = Catalog(spark, sf_dir).documents
    shingled = tracked_persist(tx.word_shingles(docs, "doc_id", "text", 3))
    # persisted: the signature build (md5 per shingle x 16 affine
    # folds) feeds the band join AND both sides of the estimate join —
    # unpersisted it would recompute three times
    sigs = tracked_persist(dd.minhash_signatures(docs, num_hashes=16))
    cands = dd.lsh_candidate_pairs(sigs, bands=8, rows_per_band=2)
    exact = dd.jaccard_on_pairs(shingled, cands)
    est_matches = F.size(
        F.filter(
            F.zip_with(F.col("_si"), F.col("_sj"), lambda x, y: x == y),
            lambda m: m,
        )
    ).cast("long")
    est = (
        cands.join(
            sigs.select(F.col("doc_id").alias("i"), F.col("sigs").alias("_si")),
            "i",
        )
        .join(
            sigs.select(F.col("doc_id").alias("j"), F.col("sigs").alias("_sj")),
            "j",
        )
        .select(
            "i",
            "j",
            est_matches.alias("est_matches"),
            (est_matches / F.lit(16.0)).alias("est_jaccard"),
        )
    )
    return est.join(exact, ["i", "j"]).select(
        "i", "j", "est_matches", "est_jaccard", "jaccard"
    )


@query(
    "llm_dedup_containment",
    rf"""
{_TOKS_SHING}
{_SIZES_COLD_CTE}
{_PAIRS_INTER_CTE}
SELECT i, j,
       inter * 1.0 / least(sa.n, sb.n) AS containment,
       inter * 1.0 / (sa.n + sb.n - inter) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = i
JOIN sizes sb ON sb.doc_id = j
WHERE inter * 1.0 / least(sa.n, sb.n) >= 0.9
""",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup pairs by shingle CONTAINMENT
    (|A∩B|/min(|A|,|B|) >= 0.9): catches a document embedded inside a
    larger one — quotation, concatenated crawl dumps, boilerplate
    wrapping — which Jaccard misses because the size mismatch dilutes
    the union (Broder's containment measure, the standard complement
    in web-corpus dedup). Jaccard is emitted alongside so a consumer
    sees why the pair was invisible to the symmetric measure.

    Scale: identical inverted-index machinery, hot-shingle posting cap
    and cost bounds as ``llm_dedup_ngram_jaccard``
    (``operators/dedup._shingle_pair_stats``) — only the derived
    measure differs."""
    docs = Catalog(spark, sf_dir).documents
    return dd.ngram_containment_duplicates(docs, threshold=0.9, shingle_n=3)


_SIMHASH_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
  FROM documents),
th AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
bitv AS (
  SELECT doc_id, bit,
         SUM(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS votes
  FROM th, unnest(range(0, 32)) AS b(bit)
  GROUP BY doc_id, bit),
sigs AS (
  SELECT doc_id,
         SUM(CASE WHEN votes > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS sig
  FROM bitv GROUP BY doc_id)
SELECT a.doc_id AS i, b.doc_id AS j,
       bit_count(xor(a.sig, b.sig)) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 3
"""


@query("llm_dedup_simhash", _SIMHASH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(32-bit, md5 token hashes) near-dup pairs at Hamming<=3."""
    docs = Catalog(spark, sf_dir).documents
    return dd.simhash_near_duplicates(docs, max_hamming=3, bits=32)


# ----------------------------------------------------------- similarity

_COS = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


@query(
    "llm_sim_topk_bruteforce",
    f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_COS.format(a="e.embedding::DOUBLE[]", b="q.qv")} AS score
  FROM embeddings e, q WHERE e.vec_id <> q.query_id),
{_RANK10_TAIL}""",
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for 5 query vectors — the ANN baseline."""
    emb = Catalog(spark, sf_dir).embeddings
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return sim.brute_force_topk(emb, queries, k=10)


@query(
    "llm_sim_ivf_topk",
    f"""
WITH cent AS (
  SELECT label AS centroid_id, arg_min(embedding, vec_id)::DOUBLE[] AS cv
  FROM embeddings GROUP BY label),
assigned AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
             {_COS.format(a="e.embedding::DOUBLE[]", b="c.cv")} DESC,
             c.centroid_id) AS rn
    FROM embeddings e, cent c) t WHERE rn = 1),
q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, centroid_id
  FROM assigned WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, a.vec_id AS neighbor_id,
         {_COS.format(a="a.embedding::DOUBLE[]", b="q.qv")} AS score
  FROM assigned a JOIN q ON a.centroid_id = q.centroid_id
  WHERE a.vec_id <> q.query_id),
{_RANK10_TAIL}""",
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-10: centroid per label (min-vec_id representative),
    1-probe search within the assigned cluster — the scale path; the
    oracle replicates the same algorithm including its recall loss."""
    emb = Catalog(spark, sf_dir).embeddings
    centroids = emb.groupBy(F.col("label").alias("centroid_id")).agg(
        F.min_by("embedding", "vec_id").alias("embedding")
    )
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return sim.ivf_topk(emb, queries, centroids, k=10)


from .registry import ORACLES as _ORACLES  # noqa: E402  (composes the two registered search oracles above)


@query(
    "llm_sim_ivf_recall",
    f"""
WITH bf AS ({{bf}}),
ivf AS ({{ivf}})
SELECT bf.query_id,
       CAST(COUNT(ivf.neighbor_id) AS BIGINT) AS hits,
       CAST(COUNT(*) AS BIGINT) AS k,
       CAST(COUNT(ivf.neighbor_id) * 100 // COUNT(*) AS BIGINT)
         AS recall_pct
FROM bf LEFT JOIN ivf
  ON ivf.query_id = bf.query_id AND ivf.neighbor_id = bf.neighbor_id
GROUP BY bf.query_id
""".format(
        bf=_ORACLES["llm_sim_topk_bruteforce"],
        ivf=_ORACLES["llm_sim_ivf_topk"],
    ),
)
def sim_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index-quality audit: recall@10 of the IVF(1-probe) search
    against the exact brute-force baseline, per query — the number a
    team actually watches when tuning nprobe/k before shipping an
    index. Composes the two registered searches; the oracle re-runs
    both SQL forms and the same left-join overlap count.

    Scale: the audit runs on a SAMPLE of queries (here the 5 fixed
    probes) — recall estimation never needs the full corpus of
    queries, so the brute-force side stays bounded while the corpus
    grows."""
    emb = Catalog(spark, sf_dir).embeddings
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    centroids = emb.groupBy(F.col("label").alias("centroid_id")).agg(
        F.min_by("embedding", "vec_id").alias("embedding")
    )
    bf = sim.brute_force_topk(emb, queries, k=10).select(
        "query_id", "neighbor_id"
    )
    ivf = sim.ivf_topk(emb, queries, centroids, k=10).select(
        F.col("query_id").alias("qi"), F.col("neighbor_id").alias("ni")
    )
    j = bf.join(
        ivf,
        (F.col("query_id") == F.col("qi"))
        & (F.col("neighbor_id") == F.col("ni")),
        "left",
    )
    return j.groupBy("query_id").agg(
        F.count("ni").alias("hits"),
        F.count(F.lit(1)).alias("k"),
        F.expr("count(ni) * 100 div count(*)").alias("recall_pct"),
    )


@query(
    "llm_sim_near_dup_embeddings",
    f"""
WITH nv AS (
{_NORM_VEC_SELECT}
SELECT a.vec_id AS i, b.vec_id AS j, list_dot_product(a.v, b.v) AS cosine
FROM nv a JOIN nv b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v) >= 0.35
""",
)
def sim_near_dup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs. Threshold 0.35 sits at
    the ~99.9th percentile of this corpus's pair-cosine distribution
    (no planted dups; max pair cosine ~0.5-0.6).

    Registered on the blocked distributed form: corpus blocks compared
    pairwise with one numpy kernel per task — no driver
    materialization, no per-pair interpreted expression. The
    expression-only and driver-broadcast variants are bit-identical
    twins kept for the oracle and for bounded corpora respectively."""
    return sim.near_duplicate_pairs_blocked(
        Catalog(spark, sf_dir).embeddings, 0.35
    )


# ------------------------------------------------------------- text ops

_STOP_SQL = ", ".join(f"'{s}'" for s in tx.STOPWORDS)


@query(
    "llm_text_quality",
    rf"""
WITH t AS (
  SELECT doc_id, lang, source, text,
         regexp_split_to_array(trim(text), '\s+') AS w,
         regexp_split_to_array(trim(lower(text)), '\s+') AS wl
  FROM documents)
SELECT doc_id, lang, source,
  length(text) AS n_chars,
  len(w) AS n_tokens,
  len(regexp_extract_all(text, '[^a-zA-Z0-9\s]'))
    * 1.0 / greatest(length(text), 1) AS punct_ratio,
  len(list_filter(wl, x -> x IN ({_STOP_SQL})))
    * 1.0 / greatest(len(w), 1) AS stopword_ratio,
  (length(text) - len(w) + 1) * 1.0 / greatest(len(w), 1) AS mean_token_len
FROM t
""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring features per document (length/punct/stopword
    ratios) — all JVM-side expressions, no UDF."""
    docs = Catalog(spark, sf_dir).documents
    e = tx.quality_exprs(F.col("text"))
    return docs.select(
        "doc_id", "lang", "source", *[c.alias(n) for n, c in e.items()]
    )


@query(
    "llm_text_token_counts",
    r"""
SELECT doc_id,
  len(regexp_split_to_array(trim(text), '\s+')) AS n_ws_tokens,
  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))
    AS n_bpe_ish_tokens
FROM documents
""",
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish (letter-run / digit-run / symbol) token
    counts."""
    docs = Catalog(spark, sf_dir).documents
    return docs.select(
        "doc_id",
        F.size(tx.ws_tokens(F.col("text"))).alias("n_ws_tokens"),
        tx.bpe_ish_token_count(F.col("text")).alias("n_bpe_ish_tokens"),
    )


def _lang_oracle() -> str:
    score = {
        lang: (
            "len(list_filter(wl, x -> x IN ("
            + ", ".join(f"'{m}'" for m in markers)
            + ")))"
        )
        for lang, markers in sorted(tx.LANG_MARKERS.items())
    }
    best = "greatest(" + ", ".join(score.values()) + ")"
    case = "CASE " + " ".join(
        f"WHEN {best} > 0 AND {score[lang]} = {best} THEN '{lang}'"
        for lang in sorted(tx.LANG_MARKERS)
    ) + " ELSE 'und' END"
    return rf"""
WITH t AS (
  SELECT doc_id, lang,
         regexp_split_to_array(trim(lower(text)), '\s+') AS wl
  FROM documents)
SELECT lang, predicted_lang, COUNT(*) AS n FROM (
  SELECT lang, {case} AS predicted_lang FROM t) s
GROUP BY lang, predicted_lang
"""


@query("llm_text_language_id", _lang_oracle())
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language id vs the labeled ``lang`` column —
    output is the confusion matrix."""
    docs = Catalog(spark, sf_dir).documents
    return (
        docs.select(
            "lang", tx.language_id_expr(F.col("text")).alias("predicted_lang")
        )
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "llm_text_fingerprint",
    f"""
SELECT doc_id,
  list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform(string_split(text, ''),
                     c -> CAST(ascii(c) AS BIGINT))),
    (a, b) -> (a * {tx.FP_BASE} + b) % {tx.FP_MOD}) AS fingerprint
FROM documents
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive polynomial rolling-hash fingerprint per doc."""
    docs = Catalog(spark, sf_dir).documents
    return docs.select(
        "doc_id", tx.fingerprint_expr(F.col("text")).alias("fingerprint")
    )


# ------------------------------------------------------------ multimodal

@query(
    "llm_multimodal_payload_meta",
    """
SELECT doc_id,
  octet_length(encode(text)) AS n_bytes,
  sha256(text) AS payload_sha256,
  64 + octet_length(encode(text)) % 576 AS width,
  64 + (octet_length(encode(text)) * 7) % 448 AS height
FROM documents
""",
)
def multimodal_payload_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing in pure relational form: treat the utf-8
    payload as an opaque binary column and derive typed metadata
    (size, content hash, deterministic fake dimensions). The real
    decode path (images/audio) lives in operators/multimodal.py as
    mapInPandas plumbing with a stubbed decoder."""
    docs = Catalog(spark, sf_dir).documents
    payload = F.encode(F.col("text"), "UTF-8")
    n_bytes = F.length(payload)
    return docs.select(
        "doc_id",
        n_bytes.cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("payload_sha256"),
        (F.lit(64) + n_bytes % 576).cast("long").alias("width"),
        (F.lit(64) + (n_bytes * 7) % 448).cast("long").alias("height"),
    )


@query(
    "llm_text_top_terms",
    r"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
  FROM documents)
SELECT token, n, rnk FROM (
  SELECT token, COUNT(*) AS n,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS rnk
  FROM toks GROUP BY token) t
WHERE rnk <= 20
""",
)
def text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-20 term frequencies (explode -> count ->
    deterministic top-k)."""
    from pyspark.sql import Window as W

    docs = Catalog(spark, sf_dir).documents
    toks = F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token")
    w = W.orderBy(F.col("n").desc(), F.col("token"))
    return (
        docs.select(toks)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 20)
    )


def _hyperplane_oracle(tables: int = 4, bits: int = 4, dim: int = 64) -> str:
    planes = sim.hyperplanes(tables, bits, dim)
    bucket_cases = []
    for t in range(tables):
        parts = []
        for b in range(bits):
            lit = "[" + ", ".join(repr(x) for x in planes[t][b]) + "]::DOUBLE[]"
            parts.append(
                f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {lit}) >= 0 "
                f"THEN {1 << b} ELSE 0 END)"
            )
        bucket_cases.append("(" + " + ".join(parts) + f") AS b{t}")
    bcols = ",\n         ".join(bucket_cases)
    unions = "\n  UNION ALL\n  ".join(
        f"SELECT vec_id, {t} AS tbl, b{t} AS bucket FROM sigs" for t in range(tables)
    )
    return f"""
WITH sigs AS (
  SELECT vec_id, embedding,
         {bcols}
  FROM embeddings),
buckets AS (
  {unions}),
cands AS (
  SELECT DISTINCT a.vec_id AS i, b.vec_id AS j
  FROM buckets a JOIN buckets b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
nv AS (
{_NORM_VEC_SELECT}
SELECT c.i, c.j, list_dot_product(a.v, b.v) AS cosine
FROM cands c JOIN nv a ON a.vec_id = c.i JOIN nv b ON b.vec_id = c.j
WHERE list_dot_product(a.v, b.v) >= 0.35
"""


@query("llm_sim_lsh_hyperplane", _hyperplane_oracle())
def sim_lsh_hyperplane(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed near-dup pairs (4 tables x 4 bits) with exact
    cosine verification — the bucketed scale path beside the exact
    all-pairs llm_sim_near_dup_embeddings; the oracle replicates the
    pipeline including its recall loss."""
    return sim.lsh_bucketed_near_duplicates(
        Catalog(spark, sf_dir).embeddings, threshold=0.35, tables=4, bits=4
    )


def _sentiment_oracle() -> str:
    pos = ", ".join(f"'{w}'" for w in tx.POSITIVE_WORDS)
    neg = ", ".join(f"'{w}'" for w in tx.NEGATIVE_WORDS)
    return rf"""
WITH t AS (
  SELECT doc_id, lang,
         regexp_split_to_array(trim(lower(text)), '\s+') AS wl
  FROM documents),
scored AS (
  SELECT doc_id, lang,
         len(list_filter(wl, x -> x IN ({pos}))) AS n_pos,
         len(list_filter(wl, x -> x IN ({neg}))) AS n_neg,
         (len(list_filter(wl, x -> x IN ({pos})))
          - len(list_filter(wl, x -> x IN ({neg}))))
           * 1.0 / greatest(len(wl), 1) AS sentiment
  FROM t)
SELECT doc_id, lang, n_pos, n_neg, sentiment FROM scored
"""


@query("llm_text_sentiment", _sentiment_oracle())
def text_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-based sentiment scoring per document."""
    docs = Catalog(spark, sf_dir).documents
    e = tx.sentiment_exprs(F.col("text"))
    return docs.select("doc_id", "lang", *[c.alias(n) for n, c in e.items()])


@query(
    "llm_sim_ivf_multiprobe",
    f"""
WITH cent AS (
  SELECT label AS centroid_id, arg_min(embedding, vec_id)::DOUBLE[] AS cv
  FROM embeddings GROUP BY label),
assigned AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
             {_COS.format(a="e.embedding::DOUBLE[]", b="c.cv")} DESC,
             c.centroid_id) AS rn
    FROM embeddings e, cent c) t WHERE rn = 1),
q AS (
  SELECT vec_id AS query_id, qv, centroid_id FROM (
    SELECT e.vec_id, e.embedding::DOUBLE[] AS qv, c.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
             {_COS.format(a="e.embedding::DOUBLE[]", b="c.cv")} DESC,
             c.centroid_id) AS rn
    FROM embeddings e, cent c WHERE e.vec_id < 5) t WHERE rn <= 2),
scored AS (
  SELECT q.query_id, a.vec_id AS neighbor_id,
         {_COS.format(a="a.embedding::DOUBLE[]", b="q.qv")} AS score
  FROM assigned a JOIN q ON a.centroid_id = q.centroid_id
  WHERE a.vec_id <> q.query_id),
{_RANK10_TAIL}""",
)
def sim_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF top-10 (nprobe=2): searching the two nearest
    clusters per query trades compute for recall — the standard IVF
    recall knob, exercised end-to-end with an identical-algorithm
    oracle."""
    emb = Catalog(spark, sf_dir).embeddings
    centroids = emb.groupBy(F.col("label").alias("centroid_id")).agg(
        F.min_by("embedding", "vec_id").alias("embedding")
    )
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return sim.ivf_topk(emb, queries, centroids, k=10, nprobe=2)


@query(
    "llm_dedup_clusters",
    rf"""
WITH RECURSIVE toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
shing AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM toks, unnest(range(1, len(w) - 1)) AS t(i)),
{_SIZES_COLD_CTE}
cands AS (
  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
  FROM shing a
  JOIN cold c ON c.shingle = a.shingle
  JOIN shing b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
inter AS (
  SELECT p.i, p.j, COUNT(*) AS inter
  FROM cands p
  JOIN shing si ON si.doc_id = p.i
  JOIN shing sj ON sj.doc_id = p.j AND sj.shingle = si.shingle
  GROUP BY p.i, p.j),
pairs AS (
  SELECT i, j FROM inter
  JOIN sizes sa ON sa.doc_id = i JOIN sizes sb ON sb.doc_id = j
  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8),
edges AS (
  SELECT i AS src, j AS dst FROM pairs
  UNION SELECT j AS src, i AS dst FROM pairs),
reach AS (
  SELECT src AS node, dst AS target FROM edges
  UNION
  SELECT r.node, e.dst AS target FROM reach r JOIN edges e ON e.src = r.target
)
SELECT node AS member, least(node, MIN(target)) AS cluster_id
FROM reach GROUP BY node
""",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components (iterative min-label
    propagation) over the exact-Jaccard pair graph; cluster_id = min
    member = keeper. Oracle: recursive CTE transitive closure."""
    docs = Catalog(spark, sf_dir).documents
    pairs = dd.ngram_jaccard_duplicates(docs, threshold=0.8, shingle_n=3)
    return dd.duplicate_clusters(pairs.select("i", "j"))


@query(
    "llm_text_tfidf_top_terms",
    r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
  FROM documents),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         ROUND(tf.tf * ln(n.n_docs * 1.0 / df.df), 6) AS tfidf
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term) AS rnk
  FROM scored)
SELECT doc_id, term, tfidf, rnk FROM ranked WHERE rnk <= 5
""",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: top-5 terms per document (tf * ln(N/df), rounded to 6 dp
    because JVM Math.log and libm can differ in the last ulp)."""
    from pyspark.sql import Window as W

    from ..caching import tracked_persist

    docs = Catalog(spark, sf_dir).documents
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"),
    )
    # tf is cached and REUSED for document frequency: since tf already
    # holds one row per (doc, term), df is a plain count — no second
    # pass over the exploded token table, no countDistinct
    tf = tracked_persist(
        toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.count()
    # no broadcast hint on df_: the vocabulary table is O(distinct
    # terms) — unbounded at web scale. AQE picks broadcast when small.
    scored = tf.join(df_, "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select("doc_id", "term", "tfidf", "rnk")
    )


# -------------------------------------------------- corpus curation ops


@query(
    "llm_sample_stratified",
    """
SELECT doc_id, lang, source
FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 100
      < CASE WHEN lang = 'en' THEN 50 ELSE 20 END
""",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for corpus curation: keep 50%
    of English, 20% of everything else, selected by an md5 hash of the
    id — reproducible across runs/engines, no RNG state. A narrow
    filter that pushes to the scan: zero shuffles at any scale."""
    docs = Catalog(spark, sf_dir).documents
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 7), 16, 10
    ).cast("long") % 100
    rate = F.when(F.col("lang") == "en", 50).otherwise(20)
    return docs.where(bucket < rate).select("doc_id", "lang", "source")


@query(
    "llm_sample_importance",
    """
SELECT doc_id, lang, source,
       LEAST(90, GREATEST(10, n_chars // 20)) AS rate_pct
FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 100
      < LEAST(90, GREATEST(10, n_chars // 20))
""",
)
def sample_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighted deterministic sampling: each document's
    keep-rate derives from a per-document quality signal (here length,
    clamped to [10%, 90%]) instead of its group — the standard
    up-weight-the-good-data curation step, distinct from the
    group-quota form in ``llm_sample_stratified``. Selection hashes
    the id (md5), so the sample is reproducible across runs and
    engines with no RNG state.

    Scale: a narrow filter over a column-pruned scan — the rate
    expression and hash are row-local, zero shuffles at any scale."""
    docs = Catalog(spark, sf_dir).documents
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 7), 16, 10
    ).cast("long") % 100
    rate = F.least(
        F.lit(90), F.greatest(F.lit(10), F.expr("n_chars div 20"))
    )
    return docs.where(bucket < rate).select(
        "doc_id", "lang", "source", rate.alias("rate_pct")
    )


@query(
    "llm_emb_norm_stats",
    """
WITH n AS (
  SELECT label,
         CAST(floor(sqrt(list_dot_product(embedding::DOUBLE[],
                                          embedding::DOUBLE[]))
                    * 1000000 + 0.5) AS BIGINT) AS norm_micros
  FROM embeddings)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       MIN(norm_micros) AS min_norm_micros,
       MAX(norm_micros) AS max_norm_micros,
       CAST(SUM(norm_micros) // COUNT(*) AS BIGINT) AS avg_norm_micros
FROM n GROUP BY label
""",
)
def emb_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding L2-norm profile per label — the ANN pre-flight that
    catches un-normalized vectors, degenerate all-zero rows, and
    per-class norm drift BEFORE anyone builds an IVF index or trusts a
    dot product as a cosine. Norms are exact integer micros per row
    (floor(x*1e6+0.5) of a deterministic sequential-fold sqrt), so the
    grouped MIN/MAX/AVG are bit-portable — a raw double SUM would
    depend on partial-aggregation order.

    Scale: one narrow per-row map + one grouped aggregate with
    map-side partials; output is label-cardinality-sized."""
    emb = Catalog(spark, sf_dir).embeddings
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(v, v, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm_micros = F.floor(F.sqrt(dot) * 1_000_000 + F.lit(0.5)).cast("long")
    return (
        emb.select("label", norm_micros.alias("norm_micros"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min("norm_micros").alias("min_norm_micros"),
            F.max("norm_micros").alias("max_norm_micros"),
            F.expr("sum(norm_micros) div count(*)").alias(
                "avg_norm_micros"
            ),
        )
    )


@query(
    "llm_dedup_apply",
    rf"""
WITH RECURSIVE toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
shing AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM toks, unnest(range(1, len(w) - 1)) AS t(i)),
{_SIZES_COLD_CTE}
cands AS (
  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
  FROM shing a
  JOIN cold c ON c.shingle = a.shingle
  JOIN shing b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
inter AS (
  SELECT p.i, p.j, COUNT(*) AS inter
  FROM cands p
  JOIN shing si ON si.doc_id = p.i
  JOIN shing sj ON sj.doc_id = p.j AND sj.shingle = si.shingle
  GROUP BY p.i, p.j),
pairs AS (
  SELECT i, j FROM inter
  JOIN sizes sa ON sa.doc_id = i JOIN sizes sb ON sb.doc_id = j
  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8),
edges AS (
  SELECT i AS src, j AS dst FROM pairs
  UNION SELECT j AS src, i AS dst FROM pairs),
reach AS (
  SELECT src AS node, dst AS target FROM edges
  UNION
  SELECT r.node, e.dst AS target FROM reach r JOIN edges e ON e.src = r.target),
clusters AS (
  SELECT node AS member, least(node, MIN(target)) AS cluster_id
  FROM reach GROUP BY node)
SELECT d.doc_id, d.lang, d.source
FROM documents d
WHERE d.doc_id NOT IN (SELECT member FROM clusters WHERE member <> cluster_id)
""",
)
def dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the CLEANED corpus: drop every near-dup cluster
    member except the keeper (min id). This is the end-to-end 'apply'
    step a training-data pipeline actually ships — cluster ids come
    from the same exact-Jaccard + connected-components path as
    llm_dedup_clusters; survivors leave via an anti-join on doc_id. No
    broadcast hint: at web scale the duplicate set is
    corpus-proportional (often 30%+), so a mandatory broadcast would
    OOM the driver; AQE still picks broadcast-hash when the loser set
    is genuinely small (r2 verdict "What's wrong" #2)."""
    docs = Catalog(spark, sf_dir).documents
    pairs = dd.ngram_jaccard_duplicates(docs, threshold=0.8, shingle_n=3)
    clusters = dd.duplicate_clusters(pairs.select("i", "j"))
    losers = clusters.where(F.col("member") != F.col("cluster_id")).select(
        F.col("member").alias("doc_id")
    )
    return docs.join(losers, "doc_id", "left_anti").select(
        "doc_id", "lang", "source"
    )


@query(
    "llm_emb_quantize",
    """
WITH d AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
  FROM d)
SELECT vec_id, scale,
       array_to_string(
         list_transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT)),
         ',') AS q
FROM s WHERE scale > 0
""",
)
def emb_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column (scale =
    max|x| / 127). floor(x/scale + 0.5) instead of round() because the
    two engines disagree on round-half semantics while floor is exact;
    float->double casts and the divisions are bit-identical. Narrow
    per-row map — no shuffle.

    The quantized vector is emitted comma-joined as a STRING, not an
    array: array-typed output columns are unhashable by row-sorting
    pandas consumers (r4 driver err), so arrays stay internal and the
    external surface is scalar-only (enforced by
    ``tests/test_registry.py::test_no_unhashable_output_columns``)."""
    emb = Catalog(spark, sf_dir).embeddings
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(v, F.abs)) / 127.0
    return (
        emb.select(F.col("vec_id"), v.alias("_v"), scale.alias("scale"))
        .where(F.col("scale") > 0)
        .select(
            "vec_id",
            "scale",
            F.array_join(
                F.transform(
                    F.col("_v"),
                    lambda x: F.floor(x / F.col("scale") + 0.5).cast(
                        "string"
                    ),
                ),
                ",",
            ).alias("q"),
        )
    )


@query(
    "llm_corpus_stats",
    r"""
SELECT source, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
         AS total_tokens,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       SUM(length(text)) * 1.0 / COUNT(*) AS mean_chars
FROM documents
GROUP BY source, lang
""",
)
def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) corpus rollup — the curation dashboard query.
    One partial-aggregated shuffle on a low-cardinality key."""
    docs = Catalog(spark, sf_dir).documents
    return docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tx.ws_tokens(F.col("text")))).alias("total_tokens"),
        F.sum(F.length("text")).alias("total_chars"),
        (F.sum(F.length("text")) / F.count(F.lit(1))).alias("mean_chars"),
    )


@query(
    "llm_multimodal_frame_sample",
    """
SELECT doc_id, frame_offset, substr(text, 1, 8) AS frame_prefix
FROM documents,
     unnest(range(0, greatest(octet_length(encode(text)), 1), 1024))
       AS t(frame_offset)
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-frame-sampling plumbing: one row per 1024-byte offset of
    each opaque payload (operators/multimodal.py:sample_frames) — pure
    JVM-side explode over a sequence, no UDF, no shuffle."""
    from ..operators.multimodal import attach_payload, sample_frames

    docs = Catalog(spark, sf_dir).documents
    return sample_frames(attach_payload(docs))


_KMEANS_DIST = (
    "list_dot_product("
    "list_transform(range(0, 64), d -> {v}[d+1] - {c}.s[d+1] / {c}.n), "
    "list_transform(range(0, 64), d -> {v}[d+1] - {c}.s[d+1] / {c}.n))"
)

# k scales with the corpus as k = max(8, floor(0.35 * sqrt(n))).
# Why sqrt: Lloyd's assignment costs n*k distance evaluations while
# SemDeDup's within-cluster verification costs ~n²/k pair evaluations
# — a FIXED k leaves the verify stage quadratic (the r6 sf1.0 scale
# probe measured exponent 1.47 for llm_dedup_semantic_verified at
# k=8), while k ∝ n makes the assignment stage quadratic instead.
# k ∝ sqrt(n) balances both at O(n^1.5) — the same cost class as the
# repo's other sqrt-bucketed joins (pigeonhole blocks, triangle
# wedges). At the driver's correctness scale (500 vectors at sf0.01)
# the formula clamps to the historical k=8, so oracle results are
# unchanged there; both engines evaluate the identical
# double-precision sqrt/mul/floor, so the computed k always agrees.
_KMEANS_K_MIN = 8
_KMEANS_K_SQL = (
    f"(SELECT GREATEST({_KMEANS_K_MIN}, "
    f"CAST(floor(0.35 * sqrt(COUNT(*))) AS BIGINT)) FROM embeddings)"
)


def _kmeans_k(emb) -> int:
    """Corpus-scaled cluster count (see comment above)."""
    import math

    return max(_KMEANS_K_MIN, int(math.floor(0.35 * math.sqrt(emb.count()))))


@query(
    "llm_sim_kmeans_assign",
    f"""
{_VI_CTE}
c0 AS (SELECT vec_id AS cid, vi AS s, 1 AS n FROM v
       WHERE vec_id < {_KMEANS_K_SQL}),
d1 AS (
  SELECT v.vec_id, c0.cid, {_KMEANS_DIST.format(v="v.vi", c="c0")} AS dist
  FROM v, c0),
a1 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY dist, cid) AS rn
    FROM d1) WHERE rn = 1),
s1 AS (
  SELECT a1.cid, t.d, SUM(v.vi[t.d + 1]) AS sd, COUNT(*) AS cnt
  FROM a1 JOIN v USING (vec_id), range(64) t(d)
  GROUP BY a1.cid, t.d),
c1 AS (SELECT cid, list(sd ORDER BY d) AS s, MAX(cnt) AS n
       FROM s1 GROUP BY cid),
d2 AS (
  SELECT v.vec_id, c1.cid, {_KMEANS_DIST.format(v="v.vi", c="c1")} AS dist
  FROM v, c1),
a2 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY dist, cid) AS rn
    FROM d2) WHERE rn = 1)
SELECT vec_id, cid FROM a2
""",
)
def sim_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (corpus-scaled
    k = max(8, floor(0.35*sqrt(n))), 2 iterations) — learns the IVF centroids instead of taking them as
    given. The oracle unrolls both iterations in SQL with the same
    scalar-subquery k; integer-scaled sums + exactly-rounded mean
    division keep every iteration's argmin bit-identical (see
    operators/similarity.py:kmeans_assignments)."""
    emb = Catalog(spark, sf_dir).embeddings
    return sim.kmeans_assignments(emb, k=_kmeans_k(emb), iterations=2)


from .registry import ORACLES as _ORACLES  # noqa: E402  (needs kmeans above)


@query(
    "llm_dedup_semantic_kmeans",
    f"""
SELECT vec_id, cid,
       MIN(vec_id) OVER (PARTITION BY cid) AS keeper_id,
       vec_id <> MIN(vec_id) OVER (PARTITION BY cid) AS is_dup
FROM ({_ORACLES["llm_sim_kmeans_assign"]}) assign
""",
)
def dedup_semantic_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    public): cluster embeddings with k-means, then deduplicate WITHIN
    clusters — here the prototype form that keeps one representative
    (min vec_id) per cluster and marks the rest. The oracle reuses the
    unrolled two-iteration k-means SQL verbatim (so the hash covers the
    clustering too) plus a keeper window.

    Scale: the point of clustering first is that the quadratic step
    never runs globally — assignment is linear passes (k centroids
    broadcast), and any within-cluster refinement (e.g. cosine
    near-dup via ``llm_sim_near_dup_embeddings`` semantics per
    cluster) is bounded by cluster size, not corpus size. k scales
    with corpus/target-cluster-size; the keeper window shuffles once
    on ``cid``."""
    from pyspark.sql import Window as W

    emb = Catalog(spark, sf_dir).embeddings
    assign = sim.kmeans_assignments(emb, k=_kmeans_k(emb), iterations=2)
    keeper = F.min("vec_id").over(W.partitionBy("cid"))
    return assign.select(
        "vec_id",
        "cid",
        keeper.alias("keeper_id"),
        (F.col("vec_id") != keeper).alias("is_dup"),
    )


@query(
    "llm_dedup_cluster_histogram",
    f"""
SELECT cid, CAST(COUNT(*) AS BIGINT) AS cluster_size,
       CAST(COUNT(*) * (COUNT(*) - 1) / 2 AS BIGINT) AS verify_pairs
FROM ({_ORACLES["llm_sim_kmeans_assign"]}) assign
GROUP BY cid
""",
)
def dedup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size pre-flight for semantic dedup (the k-means analog
    of `llm_lsh_bucket_histogram`): per-cluster member count and the
    quadratic pair count the within-cluster verification would pay —
    run BEFORE `llm_dedup_semantic_verified` so a fat cluster (k too
    small, or a degenerate embedding mode) is a one-aggregation
    observation, not a task OOM inside the pair kernel.

    Scale: one aggregation over the assignment (k rows out); the
    decision rule is ``max(verify_pairs)`` vs task memory, the same
    contract `cluster_verified_pairs.max_cluster_rows` enforces.
    Delegates to ``operators/profiling.py`` (the unified pre-flight
    module)."""
    from ..operators import profiling

    emb = Catalog(spark, sf_dir).embeddings
    assign = sim.kmeans_assignments(emb, k=_kmeans_k(emb), iterations=2)
    return profiling.bucket_sizes(assign, ["cid"]).select(
        "cid",
        F.col("bucket_size").alias("cluster_size"),
        F.col("candidate_pairs").alias("verify_pairs"),
    )


@query(
    "llm_dedup_semantic_verified",
    f"""
WITH nv AS (
{_NORM_VEC_SELECT}
SELECT aa.vec_id AS i, bb.vec_id AS j, aa.cid,
       list_dot_product(na.v, nb.v) AS cosine
FROM ({_ORACLES["llm_sim_kmeans_assign"]}) aa
JOIN ({_ORACLES["llm_sim_kmeans_assign"]}) bb
  ON aa.cid = bb.cid AND aa.vec_id < bb.vec_id
JOIN nv na ON na.vec_id = aa.vec_id
JOIN nv nb ON nb.vec_id = bb.vec_id
WHERE list_dot_product(na.v, nb.v) >= 0.35
""",
)
def dedup_semantic_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full SemDeDup: k-means clustering, then exact cosine
    verification of pairs WITHIN each cluster — the threshold form of
    `llm_dedup_semantic_kmeans`'s prototype form. Output (i, j, cid,
    cosine) for within-cluster pairs at cosine >= 0.35; the oracle
    re-runs the unrolled k-means and the same normalized dot product.

    Scale: the pair join is keyed on the cluster id, so candidate
    generation is SUM of per-cluster quadratics, bounded by the
    largest cluster — k is chosen (corpus / target cluster size) to
    keep that term executor-sized, and a fat cluster shows up in
    `llm_lsh_bucket_histogram`-style pre-flight counts before any join
    runs. One shuffle on cid, one on the pair's id side for the
    vector fetch."""
    from ..caching import tracked_persist

    # persisted: feeds both the k-means rounds and the pair kernel's
    # two vector fetches — unpersisted it would re-scan the source per
    # consumer
    emb = tracked_persist(Catalog(spark, sf_dir).embeddings)
    assign = sim.kmeans_assignments(emb, k=_kmeans_k(emb), iterations=2)
    return sim.cluster_verified_pairs(assign, emb, threshold=0.35)


@query(
    "llm_text_repetition",
    r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
tri AS (
  SELECT doc_id, w,
         [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
          FOR i IN range(1, len(w) - 1)] AS t
  FROM toks)
SELECT doc_id,
  len(w) AS n_tokens,
  len(list_distinct(w)) AS n_distinct_tokens,
  CASE WHEN len(w) = 0 THEN 0.0
       ELSE (len(w) - len(list_distinct(w))) * 1.0 / len(w)
  END AS dup_token_frac,
  len(t) AS n_trigrams,
  len(list_distinct(t)) AS n_distinct_trigrams,
  CASE WHEN len(t) = 0 THEN 0.0
       ELSE (len(t) - len(list_distinct(t))) * 1.0 / len(t)
  END AS dup_trigram_frac
FROM tri
""",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signal: duplicate-token and
    duplicate-trigram fractions per document (degenerate/boilerplate
    detector). Narrow expressions only — no shuffle."""
    return tx.repetition_stats(Catalog(spark, sf_dir).documents)


@query(
    "llm_contamination_ngram",
    r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM toks, unnest(range(1, len(w) - 1)) AS t(i)),
ev AS (SELECT doc_id AS eval_id, shingle FROM sh WHERE doc_id % 50 = 0),
tr AS (SELECT doc_id AS train_id, shingle FROM sh WHERE doc_id % 50 <> 0)
SELECT train_id, eval_id, COUNT(*) AS shared_ngrams
FROM tr JOIN ev USING (shingle)
GROUP BY train_id, eval_id
HAVING COUNT(*) >= 2
""",
)
def contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: word-trigram overlap between the
    train corpus and a held-out eval slice (doc_id % 50 = 0 stands in
    for the benchmark). Eval postings broadcast; the train corpus is
    scanned once, map-side."""
    docs = Catalog(spark, sf_dir).documents
    return dd.cross_corpus_contamination(
        docs.where(F.col("doc_id") % 50 != 0),
        docs.where(F.col("doc_id") % 50 == 0),
        shingle_n=3,
        min_shared=2,
    )


_PQ_DIST = (
    "list_dot_product("
    "list_transform(range(0, 16), d -> sub.sv[d+1] - cent.cv[d+1]), "
    "list_transform(range(0, 16), d -> sub.sv[d+1] - cent.cv[d+1]))"
)


@query(
    "llm_sim_pq_codes",
    f"""
{_VI_CTE}
sub AS (
  SELECT vec_id, t.s, vi[t.s*16+1 : t.s*16+16] AS sv
  FROM v, range(4) t(s)),
cent AS (SELECT vec_id AS cid, s, sv AS cv FROM sub WHERE vec_id < 4),
scored AS (
  SELECT sub.vec_id, sub.s, cent.cid, {_PQ_DIST} AS dist
  FROM sub JOIN cent USING (s)),
best AS (
  SELECT vec_id, s, cid FROM (
    SELECT vec_id, s, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id, s
                              ORDER BY dist, cid) AS rn
    FROM scored) WHERE rn = 1)
SELECT vec_id,
  MAX(CASE WHEN s = 0 THEN cid END) AS code_0,
  MAX(CASE WHEN s = 1 THEN cid END) AS code_1,
  MAX(CASE WHEN s = 2 THEN cid END) AS code_2,
  MAX(CASE WHEN s = 3 THEN cid END) AS code_3
FROM best GROUP BY vec_id
""",
)
def sim_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codebook assignment (4 subspaces x 16 dims,
    k=4 per subspace): the ANN memory-compression path — 64 floats
    become 4 codes. Deterministic init + exact integer-scaled
    distances keep the argmin bit-equal to the oracle."""
    return sim.pq_codes(Catalog(spark, sf_dir).embeddings)


@query(
    "llm_quality_gate",
    rf"""
WITH t AS (
  SELECT doc_id, lang, source, text,
         regexp_split_to_array(trim(text), '\s+') AS w,
         regexp_split_to_array(trim(lower(text)), '\s+') AS wl
  FROM documents),
tri AS (
  SELECT doc_id, lang, source, w, wl,
         [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
          FOR i IN range(1, len(w) - 1)] AS tt
  FROM t),
sig AS (
  SELECT doc_id, lang, source,
    len(w) AS n_tokens,
    len(list_filter(wl, x -> x IN ({_STOP_SQL})))
      * 1.0 / greatest(len(w), 1) AS stopword_ratio,
    CASE WHEN len(tt) = 0 THEN 0.0
         ELSE (len(tt) - len(list_distinct(tt))) * 1.0 / len(tt)
    END AS dup_trigram_frac
  FROM tri)
SELECT doc_id, lang, source, n_tokens, stopword_ratio, dup_trigram_frac
FROM sig
WHERE n_tokens BETWEEN 20 AND 100000
  AND stopword_ratio >= 0.05
  AND dup_trigram_frac <= 0.5
""",
)
def quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite Gopher-style quality gate: token-count bounds,
    minimum stopword ratio (gibberish filter), maximum
    duplicate-trigram fraction (degenerate-repetition filter).

    Structured for single evaluation (r2 verdict "Next round" #4): the
    naive select-then-where form let predicate pushdown substitute the
    signal expressions into the Filter, and interpreted HOF evaluation
    has no common-subexpression elimination — the physical plan
    re-split the document 57 times per row. Here the token array and
    trigram array are bound ONCE as lambda variables (`transform` over
    a 1-element array evaluates its argument a single time; every
    reference inside the lambda shares the bound value), and the gate
    itself is folded into the same expression as a `filter` to a 0/1-
    element array consumed by `explode` — a Generate, which predicate
    pushdown cannot duplicate. Net plan: exactly one split, one
    shingle build, one array_distinct per document; still a single
    narrow shuffle-free stage."""
    docs = Catalog(spark, sf_dir).documents

    def trigrams(w):
        cnt = F.greatest(F.size(w) - F.lit(2), F.lit(0))
        p0, p1, p2 = (F.slice(w, F.lit(j + 1), cnt) for j in range(3))
        join2 = lambda a, b: F.concat(a, F.lit(" "), b)  # noqa: E731
        return F.zip_with(F.zip_with(p0, p1, join2), p2, join2)

    def signals(w, tt):
        n = F.size(w)
        n_stop = F.size(F.filter(w, lambda x: F.lower(x).isin(*tx.STOPWORDS)))
        n_tri, n_tri_d = F.size(tt), F.size(F.array_distinct(tt))
        dup = F.when(n_tri == 0, F.lit(0.0)).otherwise(
            (n_tri - n_tri_d) / n_tri.cast("double")
        )
        return F.struct(
            n.cast("long").alias("n_tokens"),
            (n_stop / F.greatest(n, F.lit(1)).cast("double")).alias(
                "stopword_ratio"
            ),
            dup.alias("dup_trigram_frac"),
        )

    gated = F.flatten(
        F.transform(
            F.array(tx.ws_tokens(F.col("text"))),
            lambda w: F.filter(
                F.transform(F.array(trigrams(w)), lambda tt: signals(w, tt)),
                lambda s: s.n_tokens.between(20, 100000)
                & (s.stopword_ratio >= 0.05)
                & (s.dup_trigram_frac <= 0.5),
            ),
        )
    )
    return docs.select(
        "doc_id", "lang", "source", F.explode(gated).alias("s")
    ).select(
        "doc_id",
        "lang",
        "source",
        F.col("s.n_tokens").alias("n_tokens"),
        F.col("s.stopword_ratio").alias("stopword_ratio"),
        F.col("s.dup_trigram_frac").alias("dup_trigram_frac"),
    )


@query(
    "llm_corpus_mix",
    r"""
WITH toks AS (
  SELECT doc_id, source,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tok
  FROM documents),
ranked AS (
  SELECT doc_id, source, n_tok,
         CAST(SUM(n_tok) OVER (PARTITION BY source
                          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS cum_tok
  FROM toks)
SELECT source, doc_id, n_tok, cum_tok
FROM ranked WHERE cum_tok <= 300
""",
)
def corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget data mixing: per source, admit documents in
    deterministic md5 order until the source's token budget is
    reached — the 'sample each source to a target token share'
    pipeline stage. Exact integer cumulative sums; one shuffle on
    source."""
    from pyspark.sql import Window as W

    docs = Catalog(spark, sf_dir).documents
    n_tok = F.size(tx.ws_tokens(F.col("text"))).cast("long")
    w = (
        W.partitionBy("source")
        .orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ranked = docs.select(
        "doc_id", "source", n_tok.alias("n_tok")
    ).withColumn("cum_tok", F.sum("n_tok").over(w))
    return ranked.where(F.col("cum_tok") <= 300).select(
        "source", "doc_id", "n_tok", "cum_tok"
    )


@query(
    "llm_corpus_rebalance",
    """
WITH k AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM k),
tgt AS (
  SELECT lang, n_docs,
         CASE WHEN lang = 'en' THEN 400000 ELSE 150000 END AS target_ppm
  FROM k)
SELECT lang,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST((n_docs * 1000000) // total AS BIGINT) AS share_ppm,
       CAST(target_ppm AS BIGINT) AS target_ppm,
       LEAST(1000000, CAST((target_ppm * total) // n_docs AS BIGINT))
         AS keep_rate_ppm
FROM tgt, t
""",
)
def corpus_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mix rebalancing plan: given a target language mix (40% en, 15%
    each other), compute the per-group deterministic keep-rate that
    moves the corpus toward it (clamped at 100% — down-sampling only;
    an over-represented target surfaces as rate 1e6, the signal to
    up-sample elsewhere or add data). The output feeds the same
    md5-bucket selection as ``llm_sample_importance`` — plan and
    apply stay separate so the plan is reviewable.

    Scale: one grouped count (map-side partials) + a broadcast 1-row
    total; output is group-cardinality-sized. Exact integer ppm
    arithmetic throughout."""
    docs = Catalog(spark, sf_dir).documents
    k = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    t = k.agg(F.sum("n_docs").alias("total"))
    target = F.when(F.col("lang") == "en", 400_000).otherwise(150_000)
    return k.crossJoin(F.broadcast(t)).select(
        "lang",
        "n_docs",
        F.expr("(n_docs * 1000000) div total").alias("share_ppm"),
        target.cast("long").alias("target_ppm"),
        F.least(
            F.lit(1_000_000).cast("long"),
            F.expr(
                "(CASE WHEN lang = 'en' THEN 400000 ELSE 150000 END"
                " * total) div n_docs"
            ),
        ).alias("keep_rate_ppm"),
    )


@query(
    "llm_tokenizer_fertility",
    r"""
WITH t AS (
  SELECT lang,
         strlen(text) AS n_bytes,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tok
  FROM documents)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST((SUM(n_bytes) * 1000) // SUM(n_tok) AS BIGINT)
         AS bytes_per_token_milli
FROM t GROUP BY lang
""",
)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility proxy per language: UTF-8 bytes per
    whitespace token (milli-units, exact integer division). The
    compression-rate table a tokenizer evaluation starts from — CJK
    languages show multi-byte inflation immediately (zh here runs ~3x
    the Latin-script languages). Byte lengths, not char lengths:
    that's what a byte-level BPE actually consumes.

    Scale: narrow per-row expressions + one grouped aggregate with
    map-side partials; output is language-cardinality-sized."""
    docs = Catalog(spark, sf_dir).documents
    return (
        docs.select(
            "lang",
            F.octet_length("text").cast("long").alias("n_bytes"),
            F.size(tx.ws_tokens(F.col("text"))).cast("long").alias("n_tok"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum("n_bytes").alias("total_bytes"),
            F.expr("(sum(n_bytes) * 1000) div sum(n_tok)").alias(
                "bytes_per_token_milli"
            ),
        )
    )


@query(
    "llm_sim_pq_adc_topk",
    f"""
{_VI_CTE}
sub AS (
  SELECT vec_id, t.s, vi[t.s*16+1 : t.s*16+16] AS sv
  FROM v, range(4) t(s)),
cent AS (SELECT vec_id AS cid, s, sv AS cv FROM sub WHERE vec_id < 4),
scored AS (
  SELECT sub.vec_id, sub.s, cent.cid, {_PQ_DIST} AS dist
  FROM sub JOIN cent USING (s)),
best AS (
  SELECT vec_id, s, cid FROM (
    SELECT vec_id, s, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id, s
                              ORDER BY dist, cid) AS rn
    FROM scored) WHERE rn = 1),
q AS (SELECT vec_id AS query_id, s, sv AS qv FROM sub WHERE vec_id < 5),
dt AS (
  SELECT q.query_id, cent.s, cent.cid,
         list_dot_product(
           list_transform(range(0, 16), d -> q.qv[d+1] - cent.cv[d+1]),
           list_transform(range(0, 16), d -> q.qv[d+1] - cent.cv[d+1]))
           AS dd
  FROM q JOIN cent ON q.s = cent.s),
adc AS (
  SELECT dt.query_id, best.vec_id AS neighbor_id, SUM(dt.dd) AS adist
  FROM best JOIN dt ON best.s = dt.s AND best.cid = dt.cid
  WHERE best.vec_id <> dt.query_id
  GROUP BY dt.query_id, best.vec_id),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY adist, neighbor_id) AS rank
  FROM adc)
SELECT query_id, neighbor_id, adist, rank FROM ranked WHERE rank <= 10
""",
)
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-10 for 5 queries: corpus vectors are
    scored via per-subspace distance-table lookups on their codes —
    the compressed-domain search that pairs with llm_sim_pq_codes."""
    return sim.pq_adc_topk(Catalog(spark, sf_dir).embeddings)


@query(
    "llm_sim_pq_recall",
    f"""
{_VI_CTE}
exact AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         list_dot_product(
           list_transform(range(0, 64), d -> e.vi[d+1] - q.vi[d+1]),
           list_transform(range(0, 64), d -> e.vi[d+1] - q.vi[d+1]))
           AS dist
  FROM v e, v q WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id),
eranked AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY dist, neighbor_id) AS rank
    FROM exact) t WHERE rank <= 10),
adc AS ({_ORACLES["llm_sim_pq_adc_topk"]})
SELECT e.query_id,
       CAST(COUNT(a.neighbor_id) AS BIGINT) AS hits,
       CAST(COUNT(*) AS BIGINT) AS k,
       CAST(COUNT(a.neighbor_id) * 100 // COUNT(*) AS BIGINT)
         AS recall_pct
FROM eranked e LEFT JOIN adc a
  ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
GROUP BY e.query_id
""",
)
def sim_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ quantization-loss audit: recall@10 of the compressed-domain
    ADC search against the EXACT top-10 under the SAME metric
    (integer-scaled squared L2) — so the residual is pure quantization
    error, not metric mismatch. Completes the audit family: IVF recall
    measures partition pruning loss, this measures code-book loss.

    Scale: the exact side runs only for the bounded query sample (5
    probes x corpus, one narrow fold per pair); the ADC side is the
    production compressed search. Recall estimation never needs
    corpus-sized query sets."""
    emb = Catalog(spark, sf_dir).embeddings
    vi = F.transform(
        _to_double_col("embedding"),
        lambda x: F.floor(x * 1_000_000 + F.lit(0.5)),
    )
    v = emb.select("vec_id", vi.alias("vi"))
    q = v.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("vi").alias("qv")
    )
    diff = F.zip_with(F.col("vi"), F.col("qv"), lambda a, b: a - b)
    dist = F.aggregate(
        F.zip_with(diff, diff, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        "dist", F.col("neighbor_id")
    )
    exact = (
        v.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            dist.alias("dist"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("query_id", "neighbor_id")
    )
    adc = sim.pq_adc_topk(emb).select(
        F.col("query_id").alias("qi"), F.col("neighbor_id").alias("ni")
    )
    j = exact.join(
        adc,
        (F.col("query_id") == F.col("qi"))
        & (F.col("neighbor_id") == F.col("ni")),
        "left",
    )
    return j.groupBy("query_id").agg(
        F.count("ni").alias("hits"),
        F.count(F.lit(1)).alias("k"),
        F.expr("count(ni) * 100 div count(*)").alias("recall_pct"),
    )


def _to_double_col(name: str):
    return F.transform(F.col(name), lambda x: x.cast("double"))


@query(
    "llm_sim_kmeans_purity",
    f"""
WITH a AS ({{assign}}),
cl AS (
  SELECT a.cid, e.label, COUNT(*) AS k
  FROM a JOIN embeddings e ON e.vec_id = a.vec_id
  GROUP BY a.cid, e.label),
r AS (
  SELECT cid, label, k,
         ROW_NUMBER() OVER (PARTITION BY cid
                            ORDER BY k DESC, label) AS rn
  FROM cl),
sz AS (SELECT cid, CAST(SUM(k) AS BIGINT) AS n FROM cl GROUP BY cid)
SELECT r.cid, sz.n AS n_members, r.label AS majority_label,
       CAST(r.k AS BIGINT) AS majority_count,
       CAST((r.k * 1000000) // sz.n AS BIGINT) AS purity_ppm
FROM r JOIN sz ON sz.cid = r.cid WHERE rn = 1
""".format(assign=_ORACLES["llm_sim_kmeans_assign"]),
)
def sim_kmeans_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-quality audit: per-cluster majority-label purity of
    the k-means assignment against the ground-truth label column —
    the number that says whether the IVF partitioning actually
    respects the data's structure before anyone trusts its recall.
    Ties break to the lower label (deterministic across engines);
    purity in exact integer ppm.

    Scale: one (cluster x label) grouped count (k x labels rows) +
    one window over it — evaluation never rescans the vectors beyond
    the assignment pass itself."""
    from pyspark.sql import Window

    emb = Catalog(spark, sf_dir).embeddings
    assign = sim.kmeans_assignments(emb, k=_kmeans_k(emb), iterations=2)
    cl = (
        assign.join(emb.select("vec_id", "label"), "vec_id")
        .groupBy("cid", "label")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    w = Window.partitionBy("cid").orderBy(F.desc("k"), F.asc("label"))
    r = cl.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    sz = cl.groupBy("cid").agg(F.sum("k").alias("n"))
    return r.join(sz, "cid").select(
        "cid",
        F.col("n").alias("n_members"),
        F.col("label").alias("majority_label"),
        F.col("k").alias("majority_count"),
        F.expr("(k * 1000000) div n").alias("purity_ppm"),
    )


@query(
    "llm_chunk_documents",
    r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
  FROM documents),
st AS (
  SELECT doc_id, w, CAST(s AS BIGINT) AS start_tok
  FROM toks, unnest(range(0, greatest(len(w), 1), 48)) AS t(s))
SELECT doc_id,
       start_tok // 48 AS chunk_idx,
       start_tok,
       len(list_slice(w, start_tok + 1, start_tok + 64)) AS n_tok,
       array_to_string(list_slice(w, start_tok + 1, start_tok + 64), ' ')
         AS chunk_text
FROM st
""",
)
def chunk_documents_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking, 64-token chunks on a 48-token stride
    (16-token overlap): the context-window packing step a training
    pipeline runs between cleaning and tokenization. Narrow flatMap
    (posexplode of a per-row starts sequence) — zero shuffle."""
    return tx.chunk_documents(Catalog(spark, sf_dir).documents)


@query(
    "llm_shard_assignment",
    """
WITH s AS (
  SELECT doc_id, n_chars,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 32
           AS shard
  FROM documents)
SELECT shard, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM s GROUP BY shard
""",
)
def shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic output sharding: stable md5-derived shard id per
    document plus per-shard balance stats. This is the assignment step
    ahead of a bucketed training-data write (repartition(n, shard) /
    bucketBy) — content-independent, retry-safe, and the stats verify
    the 32-way split stays balanced. One 32-key groupBy with map-side
    partial aggregation; no other shuffle."""
    docs = Catalog(spark, sf_dir).documents
    shard = (dd._md5_int(F.col("doc_id").cast("string")) % 32).alias("shard")
    return (
        docs.select(shard, "doc_id", "n_chars")
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@query(
    "llm_pack_sequences",
    r"""
WITH t AS (
  SELECT doc_id,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 32
           AS shard,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
           AS n_tok
  FROM documents),
c AS (
  SELECT doc_id, shard, n_tok,
         CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS cum_before
  FROM t)
SELECT shard, cum_before // 256 AS bin,
       COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM c GROUP BY shard, cum_before // 256
""",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard sequential sequence packing: documents are assigned to
    training bins of a 256-token budget by the running token count
    within their shard (a doc lands in the bin where it starts — the
    concatenate-and-split packing GPT-style pipelines use).

    The window is PARTITIONED BY the md5 shard, so at 100 TB the sort
    is per-shard-partition, never global — packing parallelism equals
    shard count, and composes with llm_shard_assignment's bucketed
    write."""
    from pyspark.sql.window import Window

    docs = Catalog(spark, sf_dir).documents
    t = docs.select(
        "doc_id",
        (dd._md5_int(F.col("doc_id").cast("string")) % 32).alias("shard"),
        F.size(tx.ws_tokens(F.col("text"))).cast("long").alias("n_tok"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = t.withColumn(
        "cum_before", F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    )
    return (
        c.withColumn("bin", F.expr("cum_before div 256"))
        .groupBy("shard", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@query(
    "llm_bpe_top_pairs",
    r"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
  FROM documents),
ch AS (SELECT split(w, '') AS cs FROM toks),
pairs AS (
  SELECT cs[i] || ' ' || cs[i+1] AS pair
  FROM ch, unnest(range(1, len(cs))) AS t(i))
SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
FROM pairs GROUP BY pair ORDER BY n DESC, pair LIMIT 20
""",
)
def bpe_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE tokenizer-training inner loop, one step: count every
    adjacent symbol pair within words across the corpus and rank —
    the top pair is the next merge a byte-pair encoder would learn.
    (A full trainer iterates this with the merged symbol substituted;
    each iteration is this exact aggregation over the rewritten
    symbol stream.)

    Scale: pair explosion is corpus-bytes-bounded and narrow; the
    count shuffles on the pair vocabulary (bounded by symbol-pair
    cardinality, with map-side partial aggregation eating the heavy
    hitters), then a top-k sort over vocabulary-sized counts."""
    docs = Catalog(spark, sf_dir).documents
    toks = docs.select(
        F.explode(tx.ws_tokens(F.lower(F.col("text")))).alias("w")
    )
    cs = F.split(F.col("w"), "")
    pairs = (
        toks.where(F.length("w") >= 2)
        .select(
            F.explode(
                F.zip_with(
                    F.slice(cs, 1, F.size(cs) - 1),
                    F.slice(cs, 2, F.size(cs) - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            ).alias("pair")
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(20)
    )


@query(
    "llm_pack_efficiency",
    f"""
WITH p AS ({{pack}})
SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_bins,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST((SUM(n_tokens) * 1000000) // (COUNT(*) * 256) AS BIGINT)
         AS fill_ppm,
       CAST(SUM(CASE WHEN n_tokens > 256 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_overflow_bins
FROM p GROUP BY shard
""".format(pack=_ORACLES["llm_pack_sequences"]),
)
def pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency report per shard: bin count, token fill
    ratio against the 256-token budget (exact ppm), and bins whose
    starting document overruns the budget — the padding-waste number a
    training team watches, since unfilled context windows burn compute
    pro rata. Derived from the registered packing plan, so the audit
    and the production packing can never disagree.

    Scale: one aggregation over the (shard x bin) packing output —
    metadata-sized relative to the corpus."""
    packed = pack_sequences(spark, sf_dir)
    n = F.count(F.lit(1))
    return packed.groupBy("shard").agg(
        n.alias("n_bins"),
        F.sum("n_tokens").alias("total_tokens"),
        F.expr("(sum(n_tokens) * 1000000) div (count(*) * 256)").alias(
            "fill_ppm"
        ),
        F.sum((F.col("n_tokens") > 256).cast("long")).alias(
            "n_overflow_bins"
        ),
    )


def _incremental_minhash_oracle(num_hashes: int = 16, rows_per_band: int = 2) -> str:
    return rf"""
{_mh_banded_cte(num_hashes, rows_per_band)}
cands AS (
  SELECT DISTINCT a.doc_id AS index_id, b.doc_id AS new_id
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id % 5 <> 0 AND b.doc_id % 5 = 0),
{_SIZES_CTE}
inter AS (
  SELECT c.index_id, c.new_id, COUNT(*) AS inter
  FROM cands c
  JOIN shing si ON si.doc_id = c.index_id
  JOIN shing sj ON sj.doc_id = c.new_id AND sj.shingle = si.shingle
  GROUP BY c.index_id, c.new_id)
SELECT new_id, index_id,
       inter * 1.0 / (sa.n + sb.n - inter) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = index_id
JOIN sizes sb ON sb.doc_id = new_id
WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8
"""


@query("llm_dedup_incremental", _incremental_minhash_oracle())
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: the deterministic 20% slice
    (doc_id % 5 = 0) plays the NEW batch, the remaining 80% the
    existing INDEX. Candidates pair batch docs against index docs only
    (the band equi-join never self-joins either side), which is the
    steady-state per-ingest cost a 100 TB corpus actually pays. The
    oracle replicates the whole two-sided LSH pipeline including its
    false negatives."""
    docs = Catalog(spark, sf_dir).documents
    index_df = docs.where(F.col("doc_id") % 5 != 0)
    batch_df = docs.where(F.col("doc_id") % 5 == 0)
    return dd.incremental_minhash_duplicates(
        index_df, batch_df, threshold=0.8, num_hashes=16, bands=8, shingle_n=3
    )


def _lsh_histogram_oracle(num_hashes: int = 16, rows_per_band: int = 2) -> str:
    return rf"""
{_mh_banded_cte(num_hashes, rows_per_band)}
buckets AS (
  SELECT band, band_key, COUNT(*) AS bucket_size
  FROM banded GROUP BY band, band_key)
SELECT bucket_size, COUNT(*) AS n_buckets,
       CAST(SUM(bucket_size * (bucket_size - 1) // 2) AS BIGINT)
         AS candidate_pairs
FROM buckets GROUP BY bucket_size
"""


@query("llm_lsh_bucket_histogram", _lsh_histogram_oracle())
def lsh_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH index health check: the bucket-size histogram and the
    candidate-pair count each size contributes (k docs -> k(k-1)/2
    pairs). This is the pre-flight a 100 TB dedup runs BEFORE the
    join: a fat bucket here is the quadratic blowup the band
    parameters exist to prevent, caught for the cost of one
    aggregation instead of a runaway join. Delegates to
    ``operators/profiling.py`` (the unified pre-flight module)."""
    from ..operators import profiling

    docs = Catalog(spark, sf_dir).documents
    sigs = dd.minhash_signatures(docs, num_hashes=16)
    banded = sigs.select(
        F.col("doc_id"),
        F.posexplode(dd._band_keys(8, 2)).alias("band", "band_key"),
    )
    return profiling.bucket_size_histogram(banded, ["band", "band_key"])


@query(
    "llm_dup_span_detect",
    r"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0),
toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM corpus),
spans AS (
  SELECT DISTINCT doc_id,
         ('0x' || substr(md5(array_to_string(list_slice(w, i, i + 7), ' ')),
                         1, 15))::BIGINT AS h
  FROM toks, unnest(range(1, len(w) - 6)) AS t(i)
  WHERE len(w) >= 8),
dup AS (
  SELECT h, COUNT(*) AS n_docs FROM spans GROUP BY h HAVING COUNT(*) >= 2),
per_doc AS (
  SELECT s.doc_id, COUNT(*) AS n_spans, COUNT(d.h) AS n_dup_spans
  FROM spans s LEFT JOIN dup d USING (h)
  GROUP BY s.doc_id)
SELECT doc_id, n_spans, n_dup_spans
FROM per_doc WHERE n_dup_spans > 0
""",
)
def dup_span_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplicate-span detection (8-token exact
    windows): per document, how many of its distinct spans also occur
    in at least one other document. Whole-doc dedup (`llm_dedup_exact`)
    misses boilerplate duplicated INSIDE unique pages; this is the
    span-granularity check that catches it. A deterministic 10%
    resample is unioned in as planted whole-copy documents (same
    convention as `llm_dedup_exact`), on top of whatever natural span
    sharing the corpus has.

    Scale: linear in corpus tokens, one shuffle of 60-bit hashes with
    map-side partials; see ``operators/dedup.py:duplicate_span_stats``.
    """
    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    planted = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return dd.duplicate_span_stats(
        docs.unionByName(planted), span_tokens=8, min_docs=2
    )


@query(
    "llm_winnow_fingerprint",
    r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
hs AS (
  SELECT doc_id,
         list_transform(range(1, len(w) - 1),
             i -> ('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]),
                                  1, 7))::BIGINT) AS h
  FROM toks WHERE len(w) >= 3),
win AS (
  SELECT doc_id, h,
         list_distinct(list_transform(range(1, len(h) - 2),
             i -> least(h[i], h[i+1], h[i+2], h[i+3]))) AS s
  FROM hs WHERE len(h) >= 4)
SELECT doc_id, len(h) AS n_kgrams, len(s) AS n_selected,
       CAST(list_aggregate(s, 'sum') AS BIGINT) AS fp_checksum
FROM win
""",
)
def winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprint selection per document: min-hash of
    every 4-window of 3-word k-gram hashes, distinct — the classic
    guaranteed-recall document sketch (any shared 6-word run between
    two docs shares a fingerprint). Output is the fingerprint SIZE and
    an exact integer checksum (sum of the distinct selected 28-bit
    hashes), which pins the entire selected set bit-for-bit without
    emitting an array column (driver hash cannot sort arrays).

    Scale: zero shuffles — selection is a narrow per-row fold; see
    ``operators/dedup.py:winnow_fingerprints``."""
    docs = Catalog(spark, sf_dir).documents
    fp = dd.winnow_fingerprints(docs, shingle_n=3, window=4)
    return fp.select(
        "doc_id",
        "n_kgrams",
        F.size("fingerprint").alias("n_selected"),
        F.aggregate(
            F.col("fingerprint"), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("fp_checksum"),
    )


@query(
    "llm_emb_label_drift",
    """
WITH ex AS (
  SELECT label, i AS dim,
         CAST(floor(embedding[i]::DOUBLE * 1000000 + 0.5) AS BIGINT) AS vm
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
per AS (
  SELECT label, dim, SUM(vm) AS s, COUNT(*) AS n
  FROM ex GROUP BY label, dim),
gsum AS (SELECT dim, SUM(s) AS g FROM per GROUP BY dim),
v AS (
  SELECT label,
         list(s::DOUBLE ORDER BY dim) AS sl,
         list(g::DOUBLE ORDER BY dim) AS gl,
         MAX(n) AS n_vecs
  FROM per JOIN gsum USING (dim)
  GROUP BY label)
SELECT label, CAST(n_vecs AS BIGINT) AS n_vecs,
       CAST(floor(list_dot_product(sl, gl)
                  / (sqrt(list_dot_product(sl, sl))
                     * sqrt(list_dot_product(gl, gl)))
                  * 1000000 + 0.5) AS BIGINT) AS cos_to_global_micros
FROM v
""",
)
def emb_label_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift per label: cosine between each
    label's centroid and the global centroid — the monitoring query
    that catches a data source (or model version) whose embeddings
    have shifted away from the corpus before anyone retrains an IVF
    index on them. Cosine is scale-invariant, so it is computed on the
    per-(label, dim) SUM vectors directly — no per-dim division, and
    the sums are exact integer micros (floor(v*1e6+0.5) per element),
    making the heavy aggregation bit-portable; only the final
    32-element dot/sqrt/divide runs in doubles (sequential fold, same
    order both engines).

    Scale posture: posexplode is narrow (rows = vectors x dims);
    groupBy(label, dim) partial-aggregates map-side down to
    labels x dims rows; the global centroid is a dim-sized broadcast.
    One shuffle of pre-aggregated integers — this is how centroid
    drift is computed over billions of embeddings without moving a
    single raw vector twice."""
    emb = Catalog(spark, sf_dir).embeddings
    ex = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "p", "v"
        ),
    ).select(
        "label",
        (F.col("p") + 1).alias("dim"),
        F.floor(F.col("v") * 1_000_000 + F.lit(0.5)).cast("long").alias("vm"),
    )
    per = ex.groupBy("label", "dim").agg(
        F.sum("vm").alias("s"), F.count(F.lit(1)).alias("n")
    )
    gsum = per.groupBy("dim").agg(F.sum("s").alias("g"))
    j = per.join(F.broadcast(gsum), "dim")
    v = j.groupBy("label").agg(
        F.max("n").cast("long").alias("n_vecs"),
        F.sort_array(F.collect_list(F.struct("dim", "s"))).alias("_sl"),
        F.sort_array(F.collect_list(F.struct("dim", "g"))).alias("_gl"),
    )
    sl = F.transform(F.col("_sl"), lambda x: x["s"].cast("double"))
    gl = F.transform(F.col("_gl"), lambda x: x["g"].cast("double"))

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    cos = dot(sl, gl) / (F.sqrt(dot(sl, sl)) * F.sqrt(dot(gl, gl)))
    return v.select(
        "label",
        "n_vecs",
        F.floor(cos * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("cos_to_global_micros"),
    )
