"""Text-analysis operators over ``documents`` (north-star surface).

No reference counterpart (the reference's text ops stop at
tokenize/count — SURVEY.md §2.3); these are the per-document analyses
a training-data pipeline runs before filtering: token statistics,
stopword-profile language ID, rational-arithmetic quality scoring,
and simhash fingerprinting with banded near-dup pairing.

Everything is built-in Catalyst expressions — one pruned scan of
(doc_id, text[, lang]) and one shuffle per aggregate; no Python in
any hot path. Determinism notes:
- all ratios are +,-,*,/ on exact ints/doubles (no transcendentals,
  whose libm last-bits differ between engines);
- simhash bit hashes are md5-derived (hex prefix -> 60-bit int),
  reproduced verbatim in the DuckDB oracles via '0x' casts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens_col, tokens_sql
from ..sources.tables import load_table

# Small stopword profiles for the language-ID heuristic. Overlap
# between languages is fine — ties break deterministically.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "to", "and", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "es": ("el", "los", "las", "y", "es", "un", "una", "por", "del", "que"),
    "fr": ("le", "la", "les", "et", "est", "dans", "une", "des", "du", "qui"),
}
LANGS = tuple(sorted(STOPWORDS))  # deterministic tie-break order


def _hits(toks: Column, words: tuple[str, ...]) -> Column:
    """# of distinct tokens present in ``words`` (JVM array intersect)."""
    return F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in words])))


def _hits_sql(toks: str, words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(list_distinct({toks}), t -> list_contains([{lst}], t)))"


# -------------------------------------------------------- token stats


def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics: counts, vocabulary, mean token
    length, type-token ratio. Pure per-row expressions — no shuffle at
    all (the 100 TB plan: map-only over the scan)."""
    docs = load_table(spark, sf_dir, "documents")
    # token array materialized once per row (own projection — see
    # functions/text.py shingles_col performance note)
    d = docs.select("doc_id", "text", tokens_col("text").alias("toks"))
    toks = F.col("toks")
    tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.length("text").alias("n_chars"),
        (tok_chars.cast("double") / F.size(toks)).alias("mean_token_len"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias("ttr"),
    )


_T = tokens_sql("text")

DOC_TOKEN_STATS_ORACLE = f"""
SELECT doc_id,
       len({_T}) AS n_tokens,
       len(list_distinct({_T})) AS n_distinct,
       length(text) AS n_chars,
       CAST(list_reduce(list_transform({_T}, t -> length(t)), (a, x) -> a + x)
            AS DOUBLE) / len({_T}) AS mean_token_len,
       CAST(len(list_distinct({_T})) AS DOUBLE) / len({_T}) AS ttr
FROM documents
"""


def corpus_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus totals: docs, token occurrences, vocabulary size."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens_col("text")).alias("token"))
    return tok.agg(
        F.count("*").alias("total_tokens"),
        F.countDistinct("token").alias("vocab_size"),
    ).crossJoin(F.broadcast(docs.agg(F.count("*").alias("n_docs"))))


CORPUS_TOKEN_STATS_ORACLE = f"""
SELECT (SELECT count(*) FROM (SELECT unnest({_T}) FROM documents)) AS total_tokens,
       (SELECT count(DISTINCT t) FROM (SELECT unnest({_T}) AS t FROM documents)) AS vocab_size,
       (SELECT count(*) FROM documents) AS n_docs
"""

# ------------------------------------------------------- language ID


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID: predicted language = argmax of
    per-language distinct stopword hits, 'und' (undetermined) when no
    profile hits; ties break in LANGS order. Emits the stored ``lang``
    column too so accuracy is a trivial downstream query."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.col("toks")
    hit_cols = [_hits(toks, STOPWORDS[lg]).alias(f"hits_{lg}") for lg in LANGS]
    d = docs.select(
        "doc_id", "lang", tokens_col("text").alias("toks")
    ).select("doc_id", "lang", *hit_cols)
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in LANGS])
    pred = F.when(best <= 0, F.lit("und"))
    for lg in LANGS:  # first language reaching the max wins (tie-break)
        pred = pred.when(F.col(f"hits_{lg}") == best, F.lit(lg))
    return d.select(
        "doc_id", "lang", pred.alias("pred_lang"),
        *[f"hits_{lg}" for lg in LANGS],
    )


def _lang_id_oracle() -> str:
    hits = ",\n       ".join(
        f"{_hits_sql(_T, STOPWORDS[lg])} AS hits_{lg}" for lg in LANGS
    )
    best = f"greatest({', '.join(f'hits_{lg}' for lg in LANGS)})"
    tie = " ".join(f"WHEN hits_{lg} = {best} THEN '{lg}'" for lg in LANGS)
    return f"""
WITH h AS (
  SELECT doc_id, lang,
       {hits}
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN {best} <= 0 THEN 'und' {tie} END AS pred_lang,
       {', '.join(f'hits_{lg}' for lg in LANGS)}
FROM h
"""


LANG_ID_ORACLE = _lang_id_oracle()

# ------------------------------------------------------ quality score

_EN = STOPWORDS["en"]


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features + a composite score in [0, 1].

    Features: token count (saturating at 100), stopword occurrence
    ratio, alphanumeric character ratio. The composite is their
    rational-arithmetic mean — deliberately no exp/log so both engines
    produce bit-identical doubles.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "text",
        tokens_col("text").alias("toks"),
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9_ ]", "").alias("clean"),
    )
    toks = F.col("toks")
    n_tok = F.size(toks)
    sw = F.size(
        F.filter(
            toks,
            lambda t: F.array_contains(F.array(*[F.lit(w) for w in _EN]), t),
        )
    )
    alnum_ratio = F.length("clean").cast("double") / F.length("text")
    sw_ratio = sw.cast("double") / n_tok
    len_score = F.least(n_tok, F.lit(100)).cast("double") / F.lit(100.0)
    score = (len_score + sw_ratio + alnum_ratio) / F.lit(3.0)
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        sw_ratio.alias("stopword_ratio"),
        alnum_ratio.alias("alnum_ratio"),
        score.alias("quality"),
    )


_EN_LIST = ", ".join(f"'{w}'" for w in _EN)

QUALITY_SCORE_ORACLE = f"""
SELECT doc_id,
       len({_T}) AS n_tokens,
       CAST(len(list_filter({_T}, t -> list_contains([{_EN_LIST}], t))) AS DOUBLE)
         / len({_T}) AS stopword_ratio,
       CAST(length(regexp_replace(lower(text), '[^a-z0-9_ ]', '', 'g')) AS DOUBLE)
         / length(text) AS alnum_ratio,
       (CAST(least(len({_T}), 100) AS DOUBLE) / 100.0
        + CAST(len(list_filter({_T}, t -> list_contains([{_EN_LIST}], t))) AS DOUBLE)
          / len({_T})
        + CAST(length(regexp_replace(lower(text), '[^a-z0-9_ ]', '', 'g')) AS DOUBLE)
          / length(text)) / 3.0 AS quality
FROM documents
"""

# -------------------------------------------------- simhash fingerprint

SIMHASH_BITS = 60  # 15 hex digits of md5 -> fits a positive bigint


def _token_hash(c: Column) -> Column:
    """60-bit md5-derived token hash (engine-portable)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit simhash per document over the token multiset.

    Plan: explode tokens -> one shuffle keyed by doc_id with 60
    conditional partial sums (bit b contributes +1/-1 per token
    occurrence) -> bit assembly. Expression width is 60 plain
    columns — linear, no subtree duplication. Near-dup docs land
    within small hamming distance; see ``simhash_neardup``.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens_col("text")).alias("t")
    ).select("doc_id", _token_hash(F.col("t")).alias("h"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ]
    per_doc = tok.groupBy("doc_id").agg(*bit_sums)
    fp = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        fp = term if fp is None else fp + term
    return per_doc.select("doc_id", fp.alias("fingerprint"))


def _simhash_oracle_core() -> str:
    """CTE producing (doc_id, fingerprint) — mirrors the Spark plan."""
    bit_sums = ",\n         ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"CASE WHEN s{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
        for b in range(SIMHASH_BITS)
    )
    return f"""
tok AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(t.t), 1, 15)) AS BIGINT) AS h
  FROM documents, unnest({_T}) AS t(t)
),
bits AS (
  SELECT doc_id,
         {bit_sums}
  FROM tok GROUP BY doc_id
),
fp AS (SELECT doc_id, {fp} AS fingerprint FROM bits)
"""


SIMHASH_ORACLE = f"WITH {_simhash_oracle_core()} SELECT doc_id, fingerprint FROM fp"

# banded near-dup over fingerprints: 4 bands x 15 bits; semantics =
# "shares >= 1 band AND hamming <= K" (the banded definition IS the
# query contract, so the oracle mirrors it exactly; for hamming <= 3
# the pigeonhole over 4 bands makes banding lossless)
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = 15
SIMHASH_HAMMING_MAX = 10
# Oversized-bucket guard (r10, mirroring media_image_neardup): a
# 15-bit band pattern shared by > SIMHASH_BUCKET_CAP docs is
# non-discriminative boilerplate and stops generating candidates —
# a k-member (band, bucket) group emits O(k^2) candidate rows, the
# exact fanout the image probe measured blowing up 81x at 10x data.
# No-op at driver scales (max bucket 269 of 5000 docs at sf0.1 —
# measured r10), so stamped outputs are unchanged; pairs with any
# discriminative shared band still surface.
SIMHASH_BUCKET_CAP = 1024


def simhash_neardup(
    spark: SparkSession,
    sf_dir: str,
    max_hamming: int = SIMHASH_HAMMING_MAX,
    bucket_cap: int | None = SIMHASH_BUCKET_CAP,
) -> DataFrame:
    """Near-dup pairs by simhash: banded candidate join + hamming
    filter with the oversized-bucket guard (constant comment above),
    fully SQL-expressible (bit_count/xor in both engines)."""
    from pyspark.storagelevel import StorageLevel

    # both sides of the band self-join read the fingerprints: persist
    # or the 60-sum aggregation runs twice (LRU-evicted later)
    fp = simhash_fingerprints(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    mask = (1 << SIMHASH_BAND_BITS) - 1
    banded = fp.select(
        "doc_id",
        "fingerprint",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("fingerprint", b * SIMHASH_BAND_BITS)
                        .bitwiseAND(F.lit(mask))
                        .alias("bucket"),
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "fingerprint", "bb.band", "bb.bucket")
    if bucket_cap is not None:
        # the hot-bucket set is bounded by BANDS * |docs| / cap rows,
        # so it broadcasts at any scale (image_neardup_pairs shape)
        hot_buckets = (
            banded.groupBy("band", "bucket")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > bucket_cap)
            .select("band", "bucket")
        )
        banded = banded.join(
            F.broadcast(hot_buckets), ["band", "bucket"], "left_anti"
        )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.fingerprint").bitwiseXOR(F.col("b.fingerprint"))
            ).alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def simhash_neardup_oracle(max_hamming: int = SIMHASH_HAMMING_MAX) -> str:
    mask = (1 << SIMHASH_BAND_BITS) - 1
    return f"""
WITH {_simhash_oracle_core()},
banded0 AS (
  SELECT doc_id, fingerprint, b.b AS band,
         (fingerprint >> (b.b * {SIMHASH_BAND_BITS})) & {mask} AS bucket
  FROM fp, unnest([{', '.join(str(b) for b in range(SIMHASH_BANDS))}]) AS b(b)
),
hot_buckets AS (
  SELECT band, bucket FROM banded0
  GROUP BY band, bucket HAVING count(*) > {SIMHASH_BUCKET_CAP}
),
banded AS (
  SELECT b0.* FROM banded0 b0
  WHERE NOT EXISTS (
    SELECT 1 FROM hot_buckets h
    WHERE h.band = b0.band AND h.bucket = b0.bucket
  )
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.fingerprint, b.fingerprint)) AS hamming
FROM banded a JOIN banded b
  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.fingerprint, b.fingerprint)) <= {max_hamming}
"""


SIMHASH_NEARDUP_ORACLE = simhash_neardup_oracle()

# ----------------------------------------------------------- tf-idf

TFIDF_K = 5


def tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K most characteristic terms per document by tf x rarity.

    Rarity is the raw inverse document frequency N/df — a monotonic
    stand-in for the usual log(N/df) chosen because +,*,/ on exact
    integers are bit-identical across engines while log's last libm
    bit is not; the ranking (the operator's actual contract) is the
    same either way at a fixed N.

    Plan: explode -> (doc, term) hash agg (map-side combined) ->
    per-term doc-freq agg on the already-tiny tf frame -> broadcast
    the 1-row corpus count -> per-doc row_number window. The only
    full-corpus pass is the first aggregate; everything after is
    O(vocabulary) / O(docs x K). Tie-break (score DESC, term ASC) is
    total, so top-K is deterministic.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens_col("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("doc_freq"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "doc_freq",
            (
                F.col("tf").cast("double")
                * (F.col("n_docs").cast("double") / F.col("doc_freq").cast("double"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_K)
        .select("doc_id", "term", "tf", "doc_freq", "score", "rank")
    )


TFIDF_TOPK_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, t.t AS term FROM documents, unnest({_T}) AS t(t)
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term, tf, doc_freq,
         CAST(tf AS DOUBLE) * (CAST(n_docs AS DOUBLE) / CAST(doc_freq AS DOUBLE))
           AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
),
r AS (
  SELECT doc_id, term, tf, doc_freq, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC)
           AS rank
  FROM scored
)
SELECT doc_id, term, tf, doc_freq, score, rank FROM r WHERE rank <= {TFIDF_K}
"""

# ----------------------------------------------- token counting (BPE-ish)

# GPT-2-style pretokenizer, simplified to the RE2 ∩ Java-regex common
# dialect (no lookahead): a token is an optional leading space plus a
# run of letters, digits, or punctuation. Disjoint char classes make
# leftmost-first (Java) and RE2 matching identical.
BPE_PATTERN = r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+"


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts: whitespace tokens, BPE-ish subword
    tokens, and chars-per-token — the budget numbers an LLM data
    pipeline tracks (context-window sizing, tokens-per-doc pricing).

    Map-only plan: two regex counts per row over one pruned scan, no
    shuffle. At 100 TB this is embarrassingly parallel and scales with
    scan bandwidth alone.
    """
    docs = load_table(spark, sf_dir, "documents")
    ws = F.when(F.length(F.trim(F.col("text"))) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
    )
    bpe = F.size(F.regexp_extract_all(F.lower("text"), F.lit(BPE_PATTERN), F.lit(0)))
    return docs.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        (
            F.length("text").cast("double")
            / F.when(bpe == 0, F.lit(None)).otherwise(bpe)
        ).alias("chars_per_token"),
    )


TOKEN_COUNTS_ORACLE = rf"""
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS ws_tokens,
       len(regexp_extract_all(lower(text), '{BPE_PATTERN}')) AS bpe_tokens,
       CAST(length(text) AS DOUBLE)
         / nullif(len(regexp_extract_all(lower(text), '{BPE_PATTERN}')), 0)
         AS chars_per_token
FROM documents
"""

# ------------------------------------------------- document chunking

CHUNK_TOKENS = 128
CHUNK_STRIDE = 96
CHUNK_OVERLAP = CHUNK_TOKENS - CHUNK_STRIDE  # 32 tokens shared


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window token chunking — the map-only step that turns a
    document corpus into fixed-budget training sequences (CHUNK_TOKENS
    per chunk, CHUNK_OVERLAP carried between neighbors for context).

    Plan shape: tokenize once per doc (attribute projection), explode
    the start offsets, slice per chunk — zero shuffles, so at 100 TB
    the operator is pure scan bandwidth and inherits the input
    partitioning. Trailing windows that would only re-emit overlap
    tokens (no new content) are dropped; every kept chunk is
    reconstructable from (doc_id, chunk_id) alone, which is what makes
    downstream dedup/shuffling of chunks safe.

    Output: (doc_id, chunk_id, chunk_tokens, chunk_text).
    """
    return chunk_documents(load_table(spark, sf_dir, "documents"))


def chunk_documents(docs: DataFrame) -> DataFrame:
    """Library-level chunker over any (doc_id, text) frame — the body
    of :func:`doc_chunks`, factored so the property tests can drive it
    with hypothesis-generated corpora."""
    toked = (
        docs.select("doc_id", tokens_col("text").alias("toks"))
        .select("doc_id", "toks", F.size("toks").alias("n_toks"))
        .filter(F.col("n_toks") > 0)
    )
    starts = F.sequence(F.lit(0), F.col("n_toks") - 1, F.lit(CHUNK_STRIDE))
    chunked = toked.select(
        "doc_id",
        "toks",
        F.posexplode(starts).alias("chunk_id", "start"),
    )
    ct = F.slice(F.col("toks"), F.col("start") + 1, F.lit(CHUNK_TOKENS))
    return (
        chunked.select(
            "doc_id",
            "chunk_id",
            F.size(ct).alias("chunk_tokens"),
            F.concat_ws(" ", ct).alias("chunk_text"),
        )
        .filter((F.col("chunk_id") == 0) | (F.col("chunk_tokens") > CHUNK_OVERLAP))
    )


DOC_CHUNKS_ORACLE = f"""
WITH toked AS (
  SELECT doc_id, {_T} AS toks FROM documents
),
t2 AS (
  SELECT doc_id, toks, len(toks) AS n_toks FROM toked WHERE len(toks) > 0
),
chunked AS (
  SELECT doc_id, s.start AS start,
         list_slice(toks, s.start + 1, least(s.start + {CHUNK_TOKENS}, n_toks))
           AS ct
  FROM t2, unnest(generate_series(0, n_toks - 1, {CHUNK_STRIDE})) AS s(start)
)
SELECT doc_id,
       CAST(start // {CHUNK_STRIDE} AS INT) AS chunk_id,
       CAST(len(ct) AS INT) AS chunk_tokens,
       array_to_string(ct, ' ') AS chunk_text
FROM chunked
WHERE start = 0 OR len(ct) > {CHUNK_OVERLAP}
"""

# ----------------------------------------------- sequence packing

PACK_BUDGET = 1024  # tokens per packed training sequence
PACK_BUCKETS = 64  # independent packing streams (parallelism knob)


def pack_bucket_col(doc_id_col: F.Column) -> F.Column:
    """The md5 packing-stream bucket — ONE definition shared by
    pack_sequences and bpe_encode.pack_token_ids so the two packers
    can never desynchronize (round-7 review)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("pk|"), doc_id_col.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        % PACK_BUCKETS
    ).cast("int")


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack document chunks into fixed token-budget training sequences.

    Parallel-deterministic packing: chunks are split into PACK_BUCKETS
    independent streams by an md5 hash of doc_id, each stream ordered
    by (doc_id, chunk_id), and a chunk lands in bin
    floor(prefix_tokens_before_it / PACK_BUDGET). One shuffle keyed by
    bucket; every stream packs independently, so at 100 TB the bucket
    count is the parallelism knob and packing quality is unaffected by
    it. Semantics note (documented, standard for offline packing): a
    bin may exceed the budget by less than one chunk (the straddling
    chunk is not split); exact-budget pipelines split or truncate the
    straddler downstream.

    Output: one row per packed sequence —
    (bucket, bin_id, n_chunks, bin_tokens, fill_ratio).
    """
    chunks = doc_chunks(spark, sf_dir).select(
        "doc_id", "chunk_id", "chunk_tokens"
    )
    bucket = pack_bucket_col(F.col("doc_id"))
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = chunks.withColumn("bucket", bucket).withColumn(
        "bin_id",
        F.floor(
            F.coalesce(F.sum("chunk_tokens").over(w), F.lit(0)) / PACK_BUDGET
        ),
    )
    return binned.groupBy("bucket", "bin_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum("chunk_tokens").alias("bin_tokens"),
        (F.sum("chunk_tokens") / F.lit(float(PACK_BUDGET))).alias("fill_ratio"),
    )


PACK_SEQUENCES_ORACLE = f"""
WITH chunks AS (
  SELECT doc_id, chunk_id, chunk_tokens FROM ({DOC_CHUNKS_ORACLE}) c
),
bucketed AS (
  SELECT doc_id, chunk_id, chunk_tokens,
         CAST(CAST(concat('0x', substr(md5(concat('pk|', CAST(doc_id AS VARCHAR))), 1, 15))
                   AS BIGINT) % {PACK_BUCKETS} AS INT) AS bucket
  FROM chunks
),
binned AS (
  SELECT bucket, chunk_tokens,
         CAST(floor(coalesce(sum(chunk_tokens) OVER (
                 PARTITION BY bucket ORDER BY doc_id, chunk_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              / {PACK_BUDGET}) AS BIGINT) AS bin_id
  FROM bucketed
)
SELECT bucket, bin_id, count(*) AS n_chunks,
       CAST(sum(chunk_tokens) AS BIGINT) AS bin_tokens,
       sum(chunk_tokens) / CAST({PACK_BUDGET} AS DOUBLE) AS fill_ratio
FROM binned
GROUP BY bucket, bin_id
"""

# -------------------------------------------- token length histogram


def token_len_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed histogram of document token counts — the first
    diagnostic any corpus curation pass runs (truncation cliffs,
    boilerplate spikes, and empty-doc mass all show up here before
    any filter is tuned).

    Bucket index is floor(log2(n_tokens)) computed INTEGER-only as
    length(bin(n)) - 1 (identical in Spark and DuckDB — no
    floating-point log whose last bit could differ); empty documents
    land in bucket -1. Map-only feature pass + one tiny keyed
    aggregate: scan-bound at any scale.

    Output: (bucket_log2, lo_tokens, n_docs, sum_tokens).
    """
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(tokens_col("text"))
    bucket = F.when(n <= 0, F.lit(-1)).otherwise(
        F.length(F.bin(n.cast("bigint"))) - 1
    )
    return (
        docs.select(n.alias("n_tokens"), bucket.alias("bucket_log2"))
        .groupBy("bucket_log2")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("sum_tokens"))
        .select(
            F.col("bucket_log2").cast("int").alias("bucket_log2"),
            F.when(F.col("bucket_log2") < 0, F.lit(0))
            .otherwise(F.expr("shiftleft(CAST(1 AS BIGINT), bucket_log2)"))
            .alias("lo_tokens"),
            "n_docs",
            "sum_tokens",
        )
    )


TOKEN_LEN_HISTOGRAM_ORACLE = f"""
WITH feat AS (
  SELECT len({_T}) AS n_tokens,
         CASE WHEN len({_T}) <= 0 THEN -1
              ELSE length(bin(CAST(len({_T}) AS BIGINT))) - 1 END AS bucket_log2
  FROM documents
)
SELECT CAST(bucket_log2 AS INT) AS bucket_log2,
       CAST(CASE WHEN bucket_log2 < 0 THEN 0
                 ELSE (CAST(1 AS BIGINT) << bucket_log2) END AS BIGINT)
         AS lo_tokens,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
FROM feat
GROUP BY bucket_log2
"""


# ---------------------------------------------- boilerplate detection

BOILER_MIN_DOCS = 2  # a chunk seen in this many DISTINCT docs is boilerplate


def chunk_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate profile: the fraction of a document's
    chunks whose text also appears in other documents — the
    header/footer/template signal curation pipelines subtract before
    quality scoring (distinct from whole-doc dedup: a doc can be 90%
    unique with a boilerplate banner in every copy).

    Composes :func:`doc_chunks`: chunk the corpus, hash each chunk
    text, count DISTINCT docs per hash (map-side-combined aggregate
    over hashes — chunk text never shuffles), broadcast the
    boilerplate hash set back onto the chunk frame, aggregate per doc.

    Output: (doc_id, n_chunks, n_tokens, n_boiler_chunks,
    n_boiler_tokens, boiler_frac). The driver corpus has no shared
    chunks below sf0.1 (zero boiler counts there — correct, and the
    per-doc chunk/token counts keep the hash check substantive);
    tests seed boilerplate corpora to exercise the detection path,
    and sf0.1's 8 duplicated token streams light it up for real.
    """
    chunks = chunk_documents(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "chunk_tokens", F.md5("chunk_text").alias("h")
    )
    boiler = (
        chunks.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= BOILER_MIN_DOCS)
        .select("h")
        .withColumn("is_boiler", F.lit(1))
    )
    per_doc = (
        chunks.join(F.broadcast(boiler), "h", "left")
        .select(
            "doc_id",
            "chunk_tokens",
            F.coalesce(F.col("is_boiler"), F.lit(0)).alias("b"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("chunk_tokens").alias("n_tokens"),
            F.sum("b").alias("n_boiler_chunks"),
            F.sum(F.col("chunk_tokens") * F.col("b")).alias("n_boiler_tokens"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_chunks",
        "n_tokens",
        "n_boiler_chunks",
        "n_boiler_tokens",
        (
            F.col("n_boiler_tokens").cast("double")
            / F.col("n_tokens").cast("double")
        ).alias("boiler_frac"),
    )


CHUNK_BOILERPLATE_ORACLE = f"""
WITH chunks_src AS ({DOC_CHUNKS_ORACLE}),
chunks AS (
  SELECT doc_id, chunk_tokens, md5(chunk_text) AS h FROM chunks_src
),
boiler AS (
  SELECT h FROM (
    SELECT h, count(DISTINCT doc_id) AS nd FROM chunks GROUP BY h
  ) WHERE nd >= {BOILER_MIN_DOCS}
),
flagged AS (
  SELECT c.doc_id, c.chunk_tokens,
         CASE WHEN b.h IS NULL THEN 0 ELSE 1 END AS bb
  FROM chunks c LEFT JOIN boiler b ON c.h = b.h
)
SELECT doc_id,
       count(*) AS n_chunks,
       CAST(sum(chunk_tokens) AS BIGINT) AS n_tokens,
       CAST(sum(bb) AS BIGINT) AS n_boiler_chunks,
       CAST(sum(chunk_tokens * bb) AS BIGINT) AS n_boiler_tokens,
       CAST(sum(chunk_tokens * bb) AS DOUBLE) / CAST(sum(chunk_tokens) AS DOUBLE)
         AS boiler_frac
FROM flagged
GROUP BY doc_id
"""
