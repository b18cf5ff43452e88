"""Tokenizer / LM / SFT-formatting queries — the driver-visible
surface for the round-5 text operators that previously existed only
behind pytest: distributed BPE training and encoding
(``operators/text.py:train_bpe``/``apply_bpe``), the bigram-LM
perplexity filter (``bigram_lm_scores``), chat-template rendering and
screening stats (``render_chat_template``/``chat_turn_stats``), and
winnowing candidate pairs (``operators/dedup.py:
winnow_candidate_pairs``).

Oracle strategy: everything SQL-expressible gets a full DuckDB twin
(the perplexity model, the chat stats, the winnowing join). The two
BPE queries pin their results with literal-VALUES oracles computed at
sf0.01 — iterative argmax training is not SQL-expressible, and the
result at the driver's correctness scale is fully deterministic
(tie-break: count desc, then pair text), so the literal table IS the
semantics being guarded. Reference analog: the same "queries are
proof" standard applied to the inferred sync diffs
(`jenzabar.py:51-59`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..operators import dedup as dd
from ..operators import text as tx
from .registry import query


@query(
    "llm_lm_perplexity",
    r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w
  FROM documents),
tb AS (
  SELECT w[i] AS p, w[i+1] AS t
  FROM toks, unnest(range(1, len(w))) AS u(i)
  WHERE doc_id % 2 = 0 AND len(w) >= 2),
bi AS (SELECT p, t, COUNT(*) AS n_bi FROM tb GROUP BY p, t),
uni AS (SELECT p, COUNT(*) AS n_p FROM tb GROUP BY p),
tot AS (SELECT COUNT(*) AS n FROM tb),
voc AS (SELECT COUNT(*) AS v FROM uni),
sb AS (
  SELECT doc_id, w[i] AS p, w[i+1] AS t
  FROM toks, unnest(range(1, len(w))) AS u(i)
  WHERE doc_id % 2 = 1 AND len(w) >= 2),
scored AS (
  SELECT sb.doc_id,
         CAST(floor(ln(
             0.75 * (coalesce(bi.n_bi, 0) + 1.0)
                  / (coalesce(uni.n_p, 0) + 1.0 * voc.v)
             + 0.25 * (coalesce(uw.n_p, 0) + 1.0)
                  / (tot.n + 1.0 * voc.v)
         ) * 1000000 + 0.5) AS BIGINT) AS m
  FROM sb
  LEFT JOIN bi ON bi.p = sb.p AND bi.t = sb.t
  LEFT JOIN uni ON uni.p = sb.p
  LEFT JOIN uni uw ON uw.p = sb.t
  CROSS JOIN tot CROSS JOIN voc)
SELECT doc_id, COUNT(*) AS n_bigrams,
       CAST(SUM(m) AS BIGINT) AS sum_logprob_micro
FROM scored GROUP BY doc_id
""",
)
def lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity filter (the CCNet-pipeline shape): train an
    interpolated bigram model on the even-doc_id half of the corpus,
    score the odd half by summed per-bigram log-probability in exact
    integer micro-nats. lam=0.75 so (1 - lam) is exactly representable
    and the oracle's literal 0.25 matches bit-for-bit.

    Scale posture (``operators/text.py:bigram_lm_scores``): the model
    is two vocabulary-sized aggregations with map-side partials;
    scoring joins candidate bigrams against the vocabulary-sized model
    (AQE broadcasts it); one groupBy(doc) sum. No Python in the path."""
    docs = Catalog(spark, sf_dir).documents
    train = docs.where(F.col("doc_id") % 2 == 0)
    score = docs.where(F.col("doc_id") % 2 == 1)
    out = tx.bigram_lm_scores(train, score, lam=0.75, alpha=1.0)
    return out.select("doc_id", "n_bigrams", "sum_logprob_micro")


@query(
    "llm_winnow_pairs",
    r"""
WITH base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0),
toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM base),
hs AS (
  SELECT doc_id,
         list_transform(range(1, len(w) - 1),
             i -> ('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]),
                                  1, 7))::BIGINT) AS h
  FROM toks WHERE len(w) >= 3),
win AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(h) - 2),
             i -> least(h[i], h[i+1], h[i+2], h[i+3]))) AS s
  FROM hs WHERE len(h) >= 4),
post AS (SELECT doc_id, unnest(s) AS fp FROM win),
hot AS (SELECT fp FROM post GROUP BY fp HAVING COUNT(*) > 64),
cold AS (SELECT doc_id, fp FROM post ANTI JOIN hot USING (fp))
SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS shared_fingerprints
FROM cold a JOIN cold b USING (fp)
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= 2
""",
)
def winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) candidate pairs: documents sharing >= 2
    selected fingerprints, with a 64-doc posting-list cap so one
    boilerplate fingerprint cannot go quadratic. A deterministic 1/7
    resample is unioned in as planted whole-copy documents so the
    no-miss guarantee has pairs to find on the synthetic corpus.

    Scale posture (``operators/dedup.py:winnow_candidate_pairs``):
    the same inverted-index-with-cap shape as the LSH banded join —
    pair cost is collision-bounded, never all-pairs; fingerprints are
    ~2/(window+1) of the k-gram postings an uncompressed join would
    move."""
    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    planted = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + F.lit(10**12)).alias("doc_id"), "text"
    )
    return dd.winnow_candidate_pairs(
        docs.unionByName(planted),
        shingle_n=3,
        window=4,
        min_shared=2,
        max_postings=64,
    ).select(F.col("i"), F.col("j"), F.col("shared_fingerprints"))


@query(
    "llm_bpe_train_vocab",
    """
SELECT * FROM (VALUES
  (CAST(1 AS BIGINT), 'e', 'r', CAST(4568 AS BIGINT)),
  (2, 'e', '▁', 4473),
  (3, 'n', '▁', 2834),
  (4, 'er', '▁', 2779),
  (5, 'o', 'w', 2747),
  (6, 'ow', '▁', 2747),
  (7, 'o', 'r', 2696),
  (8, 's', 't', 2676),
  (9, 'h', '▁', 1884),
  (10, 'a', 't', 1845),
  (11, 'l', 'u', 1831),
  (12, 'i', 'n', 1796),
  (13, 'a', '▁', 1788),
  (14, 'g', '▁', 1777),
  (15, 'y', '▁', 1767),
  (16, 'a', 'r', 1758)
) AS t(merge_rank, lhs, rhs, pair_count)
""",
)
def bpe_train_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (Sennrich word-level
    formulation, ``operators/text.py:train_bpe``): the first 16 merge
    rules learned from the documents corpus, in learned order with
    their pair counts. Training is an iterative distributed argmax —
    not SQL-expressible — so the oracle pins the literal result at
    sf0.01 (the driver's correctness scale); the result is fully
    deterministic (tie-break: count desc, then pair text), so the
    pinned table IS the guarded semantics, and any regression in the
    pair-count aggregation, the regexp merge apply, or the tie-break
    flips the row hash.

    Scale posture: the corpus is reduced ONCE to a vocabulary-sized
    word-frequency table; each merge round touches only that table
    (one bounded aggregation + one narrow regexp_replace +
    localCheckpoint). The single-row argmax is the only driver collect
    per round."""
    docs = Catalog(spark, sf_dir).documents
    merges, _table = tx.train_bpe(docs, n_merges=16)
    rows = [(i + 1, a, b, c) for i, (a, b, c) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "merge_rank long, lhs string, rhs string, pair_count long"
    )


# The tokenizer llm_bpe_encode applies: train_bpe's sf0.01 result,
# frozen here the way a production tokenizer is trained once and
# shipped to every encode job.
FROZEN_MERGES: list[tuple[str, str, int]] = [
    ("e", "r", 4568), ("e", "▁", 4473), ("n", "▁", 2834),
    ("er", "▁", 2779), ("o", "w", 2747), ("ow", "▁", 2747),
    ("o", "r", 2696), ("s", "t", 2676), ("h", "▁", 1884),
    ("a", "t", 1845), ("l", "u", 1831), ("i", "n", 1796),
    ("a", "▁", 1788), ("g", "▁", 1777), ("y", "▁", 1767),
    ("a", "r", 1758),
]


@query(
    "llm_bpe_encode",
    """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(63 AS BIGINT), CAST(3531 AS BIGINT),
   CAST(14372 AS BIGINT)),
  (1, 63, 3544, 14314),
  (2, 63, 3459, 13885),
  (3, 63, 3420, 13735),
  (4, 62, 2957, 11955),
  (5, 62, 3617, 14514),
  (6, 62, 3199, 13007),
  (7, 62, 3438, 13926)
) AS t(bucket, n_docs, sum_words, sum_tokens)
""",
)
def bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE encoding at corpus scale (``operators/text.py:apply_bpe``):
    tokenize every document with the frozen 16-rule merge table
    (trained once at sf0.01 — the production pattern: a tokenizer is
    trained once and shipped), then aggregate word/token counts into 8
    deterministic doc_id buckets. The ranked-merge encode loop is not
    SQL-expressible, so the oracle pins the literal bucket sums at
    sf0.01; any regression in the rank-ordered merge application or
    the word memo flips a sum.

    Scale posture: Arrow-batched ``mapInPandas`` with a per-batch word
    memo (Zipf: the corpus is mostly repeated words, so per-word work
    amortizes to a dict hit); the merge table broadcasts via task
    closure; one 8-group aggregation after."""
    docs = Catalog(spark, sf_dir).documents
    enc = tx.apply_bpe(docs, FROZEN_MERGES)
    return (
        enc.groupBy((F.col("doc_id") % 8).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("sum_words"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
    )


@query(
    "llm_chat_loss_mask",
    r"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w
  FROM documents),
c AS (
  SELECT doc_id,
         list_transform(range(0, CAST((len(w) + 7) // 8 AS INT)),
             i -> array_to_string(w[i*8+1:i*8+8], ' ')) AS chunks
  FROM t),
m AS (
  SELECT doc_id,
         ['system'] || list_transform(chunks,
             ch -> CASE WHEN substr(ch, 1, 1) < 'm'
                        THEN 'user' ELSE 'assistant' END) AS roles,
         ['You are a helpful assistant.'] || chunks AS contents
  FROM c),
o AS (
  SELECT doc_id, roles, contents,
         list_transform(range(1, len(roles) + 1),
             i -> 8 + length(roles[i]) + length(contents[i])) AS costs
  FROM m),
s AS (
  SELECT doc_id, roles, contents,
         list_transform(range(1, len(roles) + 1),
             i -> 3 + coalesce(list_sum(costs[1:i-1]), 0)
                  + 4 + length(roles[i])) AS starts,
         list_filter(range(1, len(roles) + 1),
             i -> roles[i] = 'assistant') AS idxs
  FROM o)
SELECT doc_id,
       CAST(len(idxs) AS BIGINT) AS n_spans,
       CAST(CASE WHEN len(idxs) = 0 THEN -1
            ELSE starts[idxs[1]] END AS BIGINT) AS first_start,
       CAST(CASE WHEN len(idxs) = 0 THEN -1
            ELSE starts[idxs[1]] + length(contents[idxs[1]])
            END AS BIGINT) AS first_end,
       CAST(coalesce(list_sum(list_transform(idxs,
            i -> length(contents[i]))), 0) AS BIGINT) AS total_span_chars
FROM s
""",
)
def chat_loss_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT loss-mask spans (``operators/text.py:assistant_spans``):
    exact [start, end) character spans of every ASSISTANT turn inside
    the rendered training string, computed as a running-offset fold
    over the structured turns — never re-parsed from the rendered
    text. The oracle rebuilds the same offsets arithmetically (prefix
    sums over per-turn render costs), so a drift in the template shape
    or the fold breaks the hash. Conversations are synthesized from
    documents exactly as in ``llm_chat_render_stats``.

    Scale posture: one codegen'd projection (struct-accumulator
    ``aggregate``), zero shuffles, zero UDFs."""
    docs = Catalog(spark, sf_dir).documents
    w = tx.ws_tokens(F.lower(F.col("text")))
    n_chunks = F.floor((F.size(w) + F.lit(7)) / F.lit(8)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(w, i * 8 + 1, 8)),
    )
    body = F.transform(
        chunks,
        lambda c: F.struct(
            F.when(F.substring(c, 1, 1) < F.lit("m"), F.lit("user"))
            .otherwise(F.lit("assistant"))
            .alias("role"),
            c.alias("content"),
        ),
    )
    msgs = F.concat(
        F.array(
            F.struct(
                F.lit("system").alias("role"),
                F.lit("You are a helpful assistant.").alias("content"),
            )
        ),
        body,
    )
    spans = tx.assistant_spans(F.col("messages"))
    prepared = docs.select("doc_id", msgs.alias("messages")).select(
        "doc_id", spans.alias("spans")
    )
    first = F.element_at(F.col("spans"), 1)
    has = F.size("spans") > 0
    return prepared.select(
        "doc_id",
        F.size("spans").cast("long").alias("n_spans"),
        F.when(has, first["start"]).otherwise(-1)
        .cast("long").alias("first_start"),
        F.when(has, first["end"]).otherwise(-1)
        .cast("long").alias("first_end"),
        F.aggregate(
            F.col("spans"),
            F.lit(0),
            lambda acc, sp: acc + (sp["end"] - sp["start"]),
        ).cast("long").alias("total_span_chars"),
    )


@query(
    "llm_chat_render_stats",
    r"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w
  FROM documents),
c AS (
  SELECT doc_id,
         list_transform(range(0, CAST((len(w) + 7) // 8 AS INT)),
             i -> array_to_string(w[i*8+1:i*8+8], ' ')) AS chunks
  FROM t),
r AS (
  SELECT doc_id, chunks,
         list_transform(chunks,
             ch -> CASE WHEN substr(ch, 1, 1) < 'm'
                        THEN 'user' ELSE 'assistant' END) AS roles
  FROM c),
s AS (
  SELECT doc_id,
         CAST(1 + len(chunks) AS BIGINT) AS n_turns,
         CAST(coalesce(list_sum(list_transform(range(1, len(chunks)),
             i -> CASE WHEN roles[i] <> roles[i+1] THEN 1 ELSE 0 END)), 0)
             AS BIGINT) = len(chunks) - 1 AS roles_alternate,
         coalesce(list_sum(list_transform(range(1, len(chunks) + 1),
             i -> CASE WHEN roles[i] = 'assistant'
                       THEN length(chunks[i]) ELSE 0 END)), 0) AS asst_chars,
         28 + coalesce(list_sum(list_transform(chunks,
             ch -> length(ch))), 0) AS total_chars,
         CAST(3 + 42
              + coalesce(list_sum(list_transform(range(1, len(chunks) + 1),
                  i -> 8 + length(roles[i]) + length(chunks[i]))), 0)
              AS BIGINT) AS rendered_len
  FROM r)
SELECT doc_id, n_turns, roles_alternate,
       CAST(floor(asst_chars / total_chars * 1000000 + 0.5) AS BIGINT)
           AS assistant_char_frac_micros,
       rendered_len
FROM s
""",
)
def chat_render_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT-data formatting end to end: synthesize a conversation per
    document (a system head plus 8-word chunks of the text, role
    chosen by each chunk's first character so alternation is
    data-dependent), render it with the ChatML-style template
    (``operators/text.py:render_chat_template``), and emit the
    screening stats (``chat_turn_stats``) plus the rendered length —
    which pins the template's exact output size per turn
    (3 + 42 for "<s>" and the system turn, then 8 + len(role) +
    len(content) per body turn).

    Scale posture: pure higher-order Column expressions — one
    codegen'd projection from raw text to stats, zero shuffles, zero
    UDFs."""
    docs = Catalog(spark, sf_dir).documents
    w = tx.ws_tokens(F.lower(F.col("text")))
    n_chunks = F.floor((F.size(w) + F.lit(7)) / F.lit(8)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(w, i * 8 + 1, 8)),
    )
    body = F.transform(
        chunks,
        lambda c: F.struct(
            F.when(F.substring(c, 1, 1) < F.lit("m"), F.lit("user"))
            .otherwise(F.lit("assistant"))
            .alias("role"),
            c.alias("content"),
        ),
    )
    msgs = F.concat(
        F.array(
            F.struct(
                F.lit("system").alias("role"),
                F.lit("You are a helpful assistant.").alias("content"),
            )
        ),
        body,
    )
    prepared = docs.select("doc_id", msgs.alias("messages"))
    stats = tx.chat_turn_stats(F.col("messages"))
    return prepared.select(
        "doc_id",
        stats["n_turns"].alias("n_turns"),
        stats["roles_alternate"].alias("roles_alternate"),
        F.floor(stats["assistant_char_frac"] * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("assistant_char_frac_micros"),
        F.length(tx.render_chat_template(F.col("messages")))
        .cast("long")
        .alias("rendered_len"),
    )
