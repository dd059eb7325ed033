"""Text-analysis query registrations — every one oracle-checked.

The Spark expressions live in ``operators/text.py``; the SQL here mirrors
them construct-for-construct (same regexes, same marker literals, same
fold arithmetic).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..operators import text as T
from ..registry import query
from ..sources import read_table


@query(
    "text_token_stats",
    sql=r"""
    WITH toks AS (
      SELECT doc_id, lang, regexp_split_to_array(lower(text), '\s+') AS t, text FROM documents
    )
    SELECT doc_id, lang,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct_tokens,
           CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)
             AS n_bpeish_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_measured,
           CAST(len(t) AS DOUBLE) / len(list_distinct(t)) AS token_repetition
    FROM toks
    """,
    tags=("text", "tokens"),
)
def text_token_stats(spark, sf_dir):
    """Token counting: whitespace tokens, distinct tokens, BPE-ish regex
    tokens, repetition ratio — all codegen'd string/array ops."""
    docs = read_table(spark, sf_dir, "documents")
    toks = T.ws_tokens(F.col("text"))
    return docs.select(
        "doc_id",
        "lang",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        T.bpeish_token_count(F.col("text")).alias("n_bpeish_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
        (F.size(toks).cast("double") / F.size(F.array_distinct(toks))).alias(
            "token_repetition"
        ),
    )


@query(
    "text_quality_scores",
    sql=r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t, text FROM documents
    ), feats AS (
      SELECT doc_id,
        least(length(text)::DOUBLE / 500.0, 1.0) AS len_score,
        len(list_filter(t, x -> list_contains(['the','a','of','to','and','in','is','it'], x)))::DOUBLE
          / len(t) AS sw_ratio,
        (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE
          / length(text) AS punct_ratio,
        (length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))::DOUBLE
          / length(text) AS upper_ratio
      FROM toks
    )
    SELECT doc_id,
           round(sw_ratio, 6) AS stopword_ratio,
           round(punct_ratio, 6) AS punct_ratio,
           round(upper_ratio, 6) AS uppercase_ratio,
           round(len_score * 0.4 + least(sw_ratio * 4, 1.0) * 0.3
                 + greatest(1.0 - punct_ratio * 10, 0.0) * 0.3, 6) AS quality_score
    FROM feats
    """,
    tags=("text", "quality"),
)
def text_quality_scores(spark, sf_dir):
    """Quality filtering features + composite score (length/punct/stopword/
    case ratios — the standard public pretraining-filter heuristics)."""
    docs = read_table(spark, sf_dir, "documents")
    toks = T.ws_tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.round(T.stopword_ratio(toks), 6).alias("stopword_ratio"),
        F.round(T.punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        F.round(T.uppercase_ratio(F.col("text")), 6).alias("uppercase_ratio"),
        F.round(T.quality_score(F.col("text"), toks), 6).alias("quality_score"),
    )


@query(
    "text_language_id",
    sql=r"""
    WITH toks AS (
      SELECT doc_id, lang, regexp_split_to_array(lower(text), '\s+') AS t FROM documents
    ), scores AS (
      SELECT doc_id, lang,
        len(list_intersect(t, ['the','fast','data','query']))  AS score_en,
        len(list_intersect(t, ['window','merge','batch']))      AS score_de,
        len(list_intersect(t, ['table','scan','row']))          AS score_es,
        len(list_intersect(t, ['join','filter','group']))       AS score_fr,
        len(list_intersect(t, ['hash','sort','key']))           AS score_zh
      FROM toks
    )
    SELECT doc_id, lang AS labeled_lang,
      CAST(score_en AS BIGINT) AS score_en,
      CAST(score_de AS BIGINT) AS score_de,
      CAST(score_es AS BIGINT) AS score_es,
      CAST(score_fr AS BIGINT) AS score_fr,
      CAST(score_zh AS BIGINT) AS score_zh,
      CASE
        WHEN score_en >= greatest(score_de, score_es, score_fr, score_zh) THEN 'en'
        WHEN score_es > greatest(score_de, score_fr, score_zh) THEN 'es'
        WHEN score_fr > greatest(score_de, score_zh) THEN 'fr'
        WHEN score_zh > score_de THEN 'zh'
        ELSE 'de'
      END AS predicted_lang
    FROM scores
    """,
    tags=("text", "langid"),
)
def text_language_id(spark, sf_dir):
    """Marker-token language-ID heuristic with a deterministic argmax
    (earlier language in (de,en,es,fr,zh)... wins ties per the explicit
    cascade mirrored in the SQL).  With a real corpus the markers become
    per-language stopword n-grams; the mechanism is identical."""
    docs = read_table(spark, sf_dir, "documents")
    toks = T.ws_tokens(F.col("text"))
    score = {}
    for lang, markers in T.LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        score[lang] = F.size(F.array_intersect(toks, arr)).cast("long")
    predicted = (
        F.when(
            score["en"]
            >= F.greatest(score["de"], score["es"], score["fr"], score["zh"]),
            "en",
        )
        .when(score["es"] > F.greatest(score["de"], score["fr"], score["zh"]), "es")
        .when(score["fr"] > F.greatest(score["de"], score["zh"]), "fr")
        .when(score["zh"] > score["de"], "zh")
        .otherwise("de")
    )
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        score["en"].alias("score_en"),
        score["de"].alias("score_de"),
        score["es"].alias("score_es"),
        score["fr"].alias("score_fr"),
        score["zh"].alias("score_zh"),
        predicted.alias("predicted_lang"),
    )


@query(
    "text_fingerprint",
    sql=r"""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint,
           md5(text) AS raw_md5
    FROM documents
    """,
    tags=("text", "fingerprint"),
)
def text_fingerprint(spark, sf_dir):
    """Content fingerprints: raw md5 + normalized md5 (the exact-dedup key)."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.normalized_fingerprint(F.col("text")).alias("fingerprint"),
        F.md5("text").alias("raw_md5"),
    )


@query(
    "text_redact_pii",
    # patterns interpolated from operators.text so Spark and the oracle can
    # never drift (explicit mixed-case classes — see EMAIL_PATTERN comment)
    sql=f"""
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0
                  THEN text || ' reach user' || CAST(doc_id AS VARCHAR)
                       || '@example.com or https://example.org/d/'
                       || CAST(doc_id AS VARCHAR)
                  ELSE text END AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
                '{T.EMAIL_PATTERN}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{T.URL_PATTERN}')) AS BIGINT) AS n_urls,
           regexp_replace(
             regexp_replace(text,
               '{T.EMAIL_PATTERN}', '<EMAIL>', 'g'),
             '{T.URL_PATTERN}', '<URL>', 'g') AS redacted
    FROM corpus
    """,
    tags=("text", "pii", "curation"),
)
def text_redact_pii(spark, sf_dir):
    """PII scrub pass (training-data curation): mask emails/URLs, count
    hits per document.  The fixture corpus is PII-free, so every 5th doc
    gets a deterministic synthetic email+URL appended (mirrored in the
    oracle) and the redaction must mask exactly those.  Pure codegen
    regexp ops — map-only, no shuffle, scales linearly."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    injected = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(
            F.col("text"),
            F.lit(" reach user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or https://example.org/d/"),
            F.col("doc_id").cast("string"),
        ),
    ).otherwise(F.col("text"))
    corpus = docs.select("doc_id", injected.alias("text"))
    n_emails, n_urls = T.pii_counts(F.col("text"))
    return corpus.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_urls.alias("n_urls"),
        T.redact_pii(F.col("text")).alias("redacted"),
    )


@query(
    "text_repetition_ratio",
    sql=r"""
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 11 = 0 THEN text || ' ' || text ELSE text END AS text
      FROM documents
    ),
    toks AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t FROM corpus
    ),
    grams AS (
      SELECT doc_id,
             [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
              for i in range(1, len(t) - 1)] AS g
      FROM toks WHERE len(t) >= 3
    )
    SELECT doc_id,
           CAST(len(g) AS BIGINT) AS total_ngrams,
           CAST(len(list_distinct(g)) AS BIGINT) AS distinct_ngrams,
           round(1.0 - len(list_distinct(g))::DOUBLE / len(g), 6) AS repetition_ratio
    FROM grams
    """,
    tags=("text", "quality", "repetition"),
)
def text_repetition_ratio(spark, sf_dir):
    """Within-document repetition filter (duplicate 3-gram fraction — the
    Gopher-style boilerplate/keyword-stuffing signal).  Every 11th doc is
    self-concatenated (mirrored in the oracle) so planted high-repetition
    docs exist: their ratio must exceed ~0.5 while organic docs stay low.
    Pure codegen HOFs, map-only, no shuffle."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    boosted = F.when(
        F.col("doc_id") % 11 == 0, F.concat_ws(" ", "text", "text")
    ).otherwise(F.col("text"))
    # materialize the token array BEFORE the per-element gram lambda —
    # feeding the raw split expression into transform makes codegen rerun
    # the split per element (the text_ngram_novelty 14× lesson, round 9)
    base = docs.select("doc_id", T.ws_tokens(boosted).alias("t"))
    tk = F.col("t")
    # when-guard: the filter below and this projection may collapse into
    # one stage, so grams must be short-doc-safe on its own (see
    # operators/text.py::ngram_repetition_ratio)
    grams = F.when(
        F.size(tk) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 2),
            lambda i: F.concat_ws(" ", F.slice(tk, i, 3)),
        ),
    )
    return (
        base.select("doc_id", "t", grams.alias("g"))
        .where(F.size("t") >= 3)
        .select(
            "doc_id",
            F.size("g").cast("long").alias("total_ngrams"),
            F.size(F.array_distinct("g")).cast("long").alias("distinct_ngrams"),
            F.round(
                F.lit(1.0) - F.size(F.array_distinct("g")).cast("double") / F.size("g"), 6
            ).alias("repetition_ratio"),
        )
    )


# Corpus vocabulary: global token/bigram frequencies — the input to
# tokenizer/vocab training.  Explode → hash-groupBy count (map-side
# combined) → in-plan global top-N with deterministic (count desc, gram
# asc) ordering so the cut is engine-independent.
_VOCAB_TOP_N = 200

_VOCAB_SQL = f"""
WITH toks AS (
  SELECT regexp_split_to_array(lower(text), '\\s+') AS t FROM documents
),
unigrams AS (
  SELECT unnest(t) AS gram, 1 AS n FROM toks
),
bigrams AS (
  -- position list derived from each row's own token count (no fixed cap
  -- that a >=10k-token document could silently overflow — r5 advice)
  SELECT t[i] || ' ' || t[i+1] AS gram, 2 AS n
  FROM (SELECT t, unnest(range(1, len(t))) AS i FROM toks)
),
counted AS (
  SELECT gram, CAST(n AS BIGINT) AS gram_len, count(*) AS freq
  FROM (SELECT * FROM unigrams UNION ALL SELECT * FROM bigrams)
  GROUP BY gram, n
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY freq DESC, gram) AS rank
  FROM counted
)
SELECT gram, gram_len, freq, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {_VOCAB_TOP_N}
"""


@query("vocab_top_ngrams", sql=_VOCAB_SQL, tags=("text", "vocab", "curation"))
def vocab_top_ngrams(spark, sf_dir):
    """Corpus vocabulary extraction: global top-200 unigrams + bigrams by
    frequency (tokenizer/vocab training input).  Explode + map-side-
    combined count, then an in-plan global top-N — the ORDER BY LIMIT
    form Catalyst executes as per-partition TakeOrdered + single merge of
    N rows, never a full global sort.  Ties broken by the gram string so
    the cut is deterministic across engines."""
    docs = read_table(spark, sf_dir, "documents")
    # ONE corpus scan and ONE tokenize: unigram and bigram structs concat
    # into a single array before the explode (the earlier two-branch union
    # scanned and re-tokenized the parquet twice — round-7 rewrite).  The
    # token array is materialized to a column first — per-element lambdas
    # over the raw split expression rerun the split per element (round-9
    # novelty lesson: 14× on the gram build).
    base = docs.select(T.ws_tokens(F.col("text")).alias("t"))
    tk = F.col("t")
    grams = F.concat(
        F.transform(
            tk, lambda t: F.struct(t.alias("gram"), F.lit(1).alias("n"))
        ),
        F.when(
            F.size(tk) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - 1),
                lambda i: F.struct(
                    F.concat_ws(" ", F.slice(tk, i, 2)).alias("gram"),
                    F.lit(2).alias("n"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<gram:string,n:int>>")),
    )
    counted = (
        base.select(F.explode(grams).alias("g"))
        .groupBy(F.col("g.gram").alias("gram"), F.col("g.n").alias("n"))
        .agg(F.count("*").alias("freq"))
        .select("gram", F.col("n").cast("long").alias("gram_len"), "freq")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("freq"), "gram")
    return (
        counted.orderBy(F.desc("freq"), "gram")
        .limit(_VOCAB_TOP_N)
        .withColumn("rank", F.row_number().over(w).cast("long"))
    )


# --- cross-document boilerplate n-gram share ------------------------------

_BOILER_N = 3        # trigram shingles
_BOILER_MIN_DF = 4   # a gram in >= this many docs is "boilerplate"

_BOILER_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t FROM documents
),
grams AS (
  -- per-doc DISTINCT trigrams (each doc contributes a gram once, so the
  -- per-gram window count below IS the document frequency)
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(t) - 1), i -> array_to_string(t[i : i + {_BOILER_N} - 1], ' ')
         ))) AS gram
  FROM toks
  WHERE len(t) >= {_BOILER_N}
),
with_df AS (
  SELECT doc_id, gram, count(*) OVER (PARTITION BY gram) AS df FROM grams
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(CASE WHEN df >= {_BOILER_MIN_DF} THEN 1 END) AS BIGINT) AS n_boilerplate,
       round(CAST(count(CASE WHEN df >= {_BOILER_MIN_DF} THEN 1 END) AS DOUBLE)
             / count(*), 6) AS boilerplate_share
FROM with_df
GROUP BY doc_id
"""


@query("text_boilerplate_ngram_share", sql=_BOILER_SQL, tags=("text", "quality", "dedup"))
def text_boilerplate_ngram_share(spark, sf_dir):
    """CCNet/RefinedWeb-style boilerplate detection: the fraction of each
    document's distinct trigrams whose corpus document-frequency is >=
    {_BOILER_MIN_DF} (headers, footers, license blurbs repeat across
    docs; high share => near-template page).  Scale shape: explode
    per-doc DISTINCT shingles, document frequency via a window count
    partitioned by gram (ONE hash exchange on gram — no count+join-back
    second shuffle), then re-aggregate per doc.  At 100 TB both
    exchanges are key-partitioned; no all-pairs comparison anywhere."""
    from pyspark.sql import Window

    from ..operators.dedup import shingles, tokens

    docs = read_table(spark, sf_dir, "documents")
    grams = (
        docs.select(
            "doc_id", shingles(tokens(F.col("text")), _BOILER_N).alias("__g")
        )
        .where(F.size("__g") >= 1)
        .select("doc_id", F.explode("__g").alias("gram"))
    )
    with_df = grams.withColumn("df", F.count("*").over(Window.partitionBy("gram")))
    boiler = F.count(F.when(F.col("df") >= _BOILER_MIN_DF, 1))
    return with_df.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        boiler.alias("n_boilerplate"),
        F.round(boiler.cast("double") / F.count("*"), 6).alias("boilerplate_share"),
    )


# --- per-source TF-IDF top terms ------------------------------------------

_TFIDF_TOP_K = 5

_TFIDF_SQL = f"""
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
  FROM documents
),
tf AS (
  SELECT source, term, count(*) AS tf FROM toks GROUP BY source, term
),
with_df AS (
  SELECT source, term, tf,
         count(*) OVER (PARTITION BY term) AS df,
         (SELECT count(DISTINCT source) FROM documents) AS n_sources
  FROM tf
),
scored AS (
  SELECT source, term, CAST(tf AS BIGINT) AS tf,
         CAST(df AS BIGINT) AS df,
         round(tf * round(ln(CAST(n_sources AS DOUBLE) / df), 6), 6) AS tfidf
  FROM with_df
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY tfidf DESC, term) AS rank
  FROM scored
)
SELECT source, term, tf, df, tfidf, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {_TFIDF_TOP_K}
"""


@query("tfidf_top_terms", sql=_TFIDF_SQL, tags=("text", "analytics"))
def tfidf_top_terms(spark, sf_dir):
    """Per-source top-{_TFIDF_TOP_K} terms by TF-IDF (source = the
    "document" unit; term frequencies within a source vs how many sources
    carry the term).  Shape: explode -> map-side-combined (source, term)
    counts, document frequency via a window count partitioned by term
    (no join-back), row_number per source with the term as tie-break.
    The idf is rounded to 6 decimals BEFORE the tf multiply so the 1-ulp
    libm ln() divergence across engines can't reach the final rounding
    (determinism contract, registry docstring)."""
    from pyspark.sql import Window

    from ..operators.dedup import tokens

    docs = read_table(spark, sf_dir, "documents")
    n_sources = docs.select(
        F.countDistinct("source").cast("double").alias("__n")
    )
    tf = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").alias("tf"))
    )
    with_df = tf.withColumn(
        "df", F.count("*").over(Window.partitionBy("term"))
    ).crossJoin(F.broadcast(n_sources))
    scored = with_df.select(
        "source",
        "term",
        F.col("tf").cast("long").alias("tf"),
        F.col("df").cast("long").alias("df"),
        F.round(
            F.col("tf") * F.round(F.log(F.col("__n") / F.col("df")), 6), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _TFIDF_TOP_K)
    )


# --- unigram language-model quality proxy ---------------------------------

_UNIGRAM_LP_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS term
  FROM documents
),
vocab AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term),
tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM vocab)
SELECT t.doc_id,
       count(*) AS n_tokens,
       CAST(sum(CAST(round(-ln(CAST(v.cnt AS DOUBLE) / tot.total), 6)
                     AS DECIMAL(18,6))) AS DOUBLE) / count(*)
         AS avg_neg_logprob
FROM toks t JOIN vocab v ON t.term = v.term CROSS JOIN tot
GROUP BY t.doc_id
"""


@query("quality_unigram_logprob", sql=_UNIGRAM_LP_SQL, tags=("text", "quality", "lm"))
def quality_unigram_logprob(spark, sf_dir):
    """CCNet-style language-model quality proxy with the corpus itself as
    the LM: a unigram model fit on the corpus scores every document by
    mean negative log-probability per token (high = surprising = either
    rare-content or noise; CCNet buckets head/middle/tail on exactly this
    kind of score).  Two shuffles at 100 TB, both unavoidable and both
    map-side combined: (1) token -> count for the vocab (vocab tables at
    web scale are millions of rows — far too big to broadcast, hence the
    keyed equi-join rather than a broadcast), (2) doc_id regroup for the
    per-doc mean.  Determinism contract: each token's -ln(p) is rounded
    to 6 dp and cast to DECIMAL(18,6) BEFORE the sum, so the mean is
    order-insensitive and the 1-ulp libm ln() divergence across engines
    dies at the rounding (same trick as tfidf_top_terms)."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(T.ws_tokens(F.col("text"))).alias("term")
    )
    vocab = toks.groupBy("term").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").cast("double").alias("_total"))
    neg_lp = F.round(
        -F.log(F.col("cnt").cast("double") / F.col("_total")), 6
    ).cast("decimal(18,6)")
    return (
        toks.join(vocab, "term")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            (F.sum(neg_lp).cast("double") / F.count("*")).alias("avg_neg_logprob"),
        )
    )


# --- token-length histogram (shard-size planning) -------------------------

_LENGTH_HIST_SQL = r"""
WITH n AS (
  SELECT len(regexp_split_to_array(lower(text), '\s+')) AS n_tokens
  FROM documents
)
SELECT CAST(length(printf('%b', n_tokens)) - 1 AS BIGINT) AS log2_bucket,
       CAST(1::BIGINT << (length(printf('%b', n_tokens)) - 1) AS BIGINT)
         AS bucket_lo,
       count(*) AS n_docs,
       CAST(min(n_tokens) AS BIGINT) AS min_tokens,
       CAST(max(n_tokens) AS BIGINT) AS max_tokens,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
FROM n
GROUP BY 1, 2
ORDER BY log2_bucket
"""


@query("tokens_length_histogram", sql=_LENGTH_HIST_SQL, tags=("text", "stats"))
def tokens_length_histogram(spark, sf_dir):
    """Power-of-two document-length histogram — the sequence-length
    distribution a packing/sharding planner needs before choosing context
    budgets.  The bucket is floor(log2(n_tokens)) computed WITHOUT libm:
    length(bin(n)) - 1 is exact integer arithmetic on both engines
    (DuckDB mirrors it as length(printf('%%b', n)) - 1), so no float-log
    boundary can flip a bucket.  Map-only until the final tiny
    aggregation on ~40 buckets."""
    docs = read_table(spark, sf_dir, "documents")
    n = docs.select(F.size(T.ws_tokens(F.col("text"))).alias("n_tokens"))
    bucket = (F.length(F.bin(F.col("n_tokens"))) - 1).cast("long")
    return (
        n.groupBy(
            bucket.alias("log2_bucket"),
            F.expr(
                "CAST(shiftleft(CAST(1 AS BIGINT),"
                " CAST(length(bin(n_tokens)) - 1 AS INT)) AS BIGINT)"
            ).alias("bucket_lo"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_tokens").cast("long").alias("min_tokens"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
        )
        .orderBy("log2_bucket")
    )


# --- vocabulary coverage / OOV rate ---------------------------------------

_OOV_VOCAB_K = 100

_OOV_SQL = rf"""
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(lower(text), '\s+')) AS gram
  FROM documents
),
vocab AS (
  SELECT gram FROM (
    SELECT gram, row_number() OVER (ORDER BY count(*) DESC, gram) AS rank
    FROM toks GROUP BY gram
  ) WHERE rank <= {_OOV_VOCAB_K}
)
SELECT t.source,
       count(*) AS n_tokens,
       CAST(count(*) - count(v.gram) AS BIGINT) AS n_oov,
       CAST(count(*) - count(v.gram) AS DOUBLE) / count(*) AS oov_rate
FROM toks t LEFT JOIN vocab v ON t.gram = v.gram
GROUP BY t.source
"""


@query("vocab_oov_rate", sql=_OOV_SQL, tags=("text", "vocab", "curation"))
def vocab_oov_rate(spark, sf_dir):
    """Vocabulary coverage audit: per-source share of token occurrences
    NOT covered by the global top-100 vocabulary — the out-of-vocabulary
    rate a tokenizer-training loop watches per data source.  Plan: one
    explode + map-side-combined count builds the vocab (in-plan TakeOrdered
    for the top-K, (freq desc, gram) tie-break so the cut is engine-
    independent), which is top-K-sized and therefore BROADCAST to the
    token stream — the coverage join is map-only, no shuffle of the corpus.
    The rate is one double division of two exact counts (no rounding
    needed)."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(T.ws_tokens(F.col("text"))).alias("gram")
    )
    vocab = (
        toks.groupBy("gram")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "gram")
        .limit(_OOV_VOCAB_K)
        .select("gram", F.lit(1).alias("in_vocab"))
    )
    n_oov = F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
    return (
        toks.join(F.broadcast(vocab), "gram", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_tokens"),
            n_oov.cast("long").alias("n_oov"),
            (n_oov.cast("double") / F.count("*")).alias("oov_rate"),
        )
    )


# --- BM25 query-conditioned retrieval -------------------------------------

_BM25_TOP_K = 5
# (query_id, term) — pre-lowercased; 'hyperloglog' is deliberately OOV and
# 'join' is shared between queries 1 and 3 to exercise the term fan-out.
_BM25_QUERIES = [
    (1, "hash"), (1, "join"),
    (2, "stream"), (2, "window"), (2, "slow"),
    (3, "vector"), (3, "scan"), (3, "filter"), (3, "join"), (3, "hyperloglog"),
]

_BM25_VALUES = ", ".join(f"({q}, '{t}')" for q, t in _BM25_QUERIES)

_BM25_SQL = rf"""
WITH qterms(query_id, term) AS (VALUES {_BM25_VALUES}),
docs AS (
  SELECT doc_id, len(regexp_split_to_array(lower(text), '\s+')) AS dl,
         regexp_split_to_array(lower(text), '\s+') AS toks
  FROM documents
),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM docs
),
tok AS (SELECT doc_id, dl, unnest(toks) AS term FROM docs),
postings AS (
  SELECT doc_id, term, count(*) AS tf, max(dl) AS dl
  FROM tok WHERE term IN (SELECT DISTINCT term FROM qterms)
  GROUP BY doc_id, term
),
idf AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df,
         floor(ln((s.n_docs - count(*) + 0.5) / (count(*) + 0.5) + 1.0)
               * 1000000.0 + 0.5) / 1000000.0 AS idf
  FROM postings CROSS JOIN stats s
  GROUP BY term, s.n_docs
),
contrib AS (
  SELECT q.query_id, p.doc_id,
         CAST(floor(i.idf * (p.tf * 2.2)
                    / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl))
                    * 1000000.0 + 0.5) AS BIGINT) AS c_micro
  FROM postings p
  JOIN idf i ON p.term = i.term
  JOIN qterms q ON p.term = q.term
  CROSS JOIN stats s
),
scored AS (
  SELECT query_id, doc_id,
         CAST(count(*) AS BIGINT) AS n_terms_matched,
         sum(c_micro) AS score_micro
  FROM contrib GROUP BY query_id, doc_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score_micro DESC, doc_id) AS rank
  FROM scored
)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, n_terms_matched,
       CAST(score_micro AS DOUBLE) / 1000000.0 AS score,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {_BM25_TOP_K}
"""


@query("retrieval_bm25_topk", sql=_BM25_SQL, tags=("text", "retrieval"))
def retrieval_bm25_topk(spark, sf_dir):
    """BM25 (k1=1.2, b=0.75) top-{_BM25_TOP_K} document retrieval for a
    literal query set — the lexical half of a RAG / eval-retrieval
    pipeline, next to the embedding ANN family.

    Plan shape at 100 TB: the corpus scan is map-only (tokenize + doc
    length inline); only postings whose term appears in SOME query survive
    the broadcast term filter, so the one (doc_id, term) shuffle is
    proportional to MATCHED postings, not the corpus.  df comes from a
    window count over those postings (candidate-sized term reshuffle, no
    second corpus scan), the per-(query, doc) regroup is candidate-sized,
    and the final row_number runs per query over candidates only — never
    a global sort.  Two corpus scans total: postings and the (N, avgdl)
    statistics row.

    Determinism contract: tf/dl/df are exact integers; idf's ln() is
    quantized with the portable floor(x*1e6+0.5) grid BEFORE the multiply;
    each term contribution is quantized to integer MICRO-units and summed
    as BIGINT (order-independent, codegen-friendly — the integer-scaled
    form of the decimal-sum trick), so ranking compares exact integers
    with a doc_id tie-break and the one double division happens after the
    sum."""
    from pyspark.sql import Window

    qterms = spark.createDataFrame(_BM25_QUERIES, "query_id long, term string")

    docs = read_table(spark, sf_dir, "documents")
    toks = T.ws_tokens(F.col("text"))
    base = docs.select("doc_id", F.size(toks).alias("dl"), toks.alias("toks"))

    stats = base.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )

    postings = (
        base.select("doc_id", "dl", F.explode("toks").alias("term"))
        .join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.max("dl").alias("dl"))
    )

    # df via a window count over the postings themselves (tfidf_top_terms
    # pattern): a candidate-sized reshuffle on term instead of re-deriving
    # the postings subtree, which would scan the corpus a second time.
    idf = F.floor(
        F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
        * 1000000.0
        + 0.5
    ) / 1000000.0

    contrib = (
        postings.withColumn("df", F.count("*").over(Window.partitionBy("term")))
        .crossJoin(F.broadcast(stats))
        .withColumn("idf", idf)
        .join(F.broadcast(qterms), "term")
        .select(
            "query_id",
            "doc_id",
            F.floor(
                F.col("idf")
                * (F.col("tf") * 2.2)
                / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl")))
                * 1000000.0
                + 0.5
            )
            .cast("long")
            .alias("c_micro"),
        )
    )

    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.count("*").cast("long").alias("n_terms_matched"),
        F.sum("c_micro").alias("score_micro"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score_micro"), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _BM25_TOP_K)
        .select(
            "query_id",
            "doc_id",
            "n_terms_matched",
            (F.col("score_micro").cast("double") / 1000000.0).alias("score"),
            "rank",
        )
    )


# --- Jensen-Shannon source drift ------------------------------------------

_JS_VOCAB_K = 100

_JS_SQL = rf"""
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(lower(text), '\s+')) AS gram
  FROM documents
),
vocab AS (
  SELECT gram, cnt FROM (
    SELECT gram, CAST(count(*) AS BIGINT) AS cnt,
           row_number() OVER (ORDER BY count(*) DESC, gram) AS rank
    FROM toks GROUP BY gram
  ) WHERE rank <= {_JS_VOCAB_K}
),
corpus AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM vocab),
sv AS (
  SELECT t.source, t.gram, CAST(count(*) AS BIGINT) AS scnt
  FROM toks t JOIN vocab v ON t.gram = v.gram
  GROUP BY t.source, t.gram
),
stot AS (SELECT source, CAST(sum(scnt) AS BIGINT) AS sn FROM sv GROUP BY source),
grid AS (
  SELECT s.source, s.sn, v.gram, v.cnt, c.n, coalesce(x.scnt, 0) AS scnt
  FROM stot s CROSS JOIN vocab v CROSS JOIN corpus c
  LEFT JOIN sv x ON x.source = s.source AND x.gram = v.gram
),
terms AS (
  SELECT source, sn,
         CAST(scnt AS DOUBLE) / sn AS p,
         CAST(cnt AS DOUBLE) / n AS q
  FROM grid
),
nano AS (
  SELECT source, sn,
         CASE WHEN p > 0
              THEN CAST(floor(p * (floor(ln(p / (0.5 * (p + q))) * 1000000.0
                                         + 0.5) / 1000000.0)
                              * 1000000000.0 + 0.5) AS BIGINT)
              ELSE 0 END AS tp,
         CAST(floor(q * (floor(ln(q / (0.5 * (p + q))) * 1000000.0
                               + 0.5) / 1000000.0)
                    * 1000000000.0 + 0.5) AS BIGINT) AS tq
  FROM terms
)
SELECT source, CAST(max(sn) AS BIGINT) AS n_vocab_tokens,
       CAST(sum(tp) + sum(tq) AS DOUBLE) / 1000000000.0 * 0.5
         AS js_divergence
FROM nano GROUP BY source
"""


@query("drift_js_source_tokens", sql=_JS_SQL, tags=("text", "drift", "curation"))
def drift_js_source_tokens(spark, sf_dir):
    """Jensen-Shannon divergence of each source's token distribution from
    the corpus-wide distribution — the text-side drift monitor next to
    the value-side PSI: a source whose language shifts (new domain,
    template change, spam influx) moves before its row counts do.

    Distributions live on the tie-broken global top-{_JS_VOCAB_K} vocab
    (the OOV-audit cut), so the source×vocab grid is BOUNDED regardless
    of corpus size and joins broadcast.  Determinism: p and q are single
    IEEE divisions of exact counts; each ln() quantizes on the 1e-6
    floor grid BEFORE its multiply; each p·ln-term quantizes to 1e-9
    NANO-units and sums as BIGINT (terms are ≤ ln 2, so the grid is
    safe); zero-count terms take the KL 0·ln0 = 0 convention via an
    explicit guard.  One corpus explode feeds both the vocab cut and
    the per-source counts."""
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(T.ws_tokens(F.col("text"))).alias("gram")
    )
    vocab = (
        toks.groupBy("gram")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), "gram")
        .limit(_JS_VOCAB_K)
    )
    corpus = vocab.agg(F.sum("cnt").cast("long").alias("n"))
    sv = (
        toks.join(F.broadcast(vocab.select("gram")), "gram")
        .groupBy("source", "gram")
        .agg(F.count("*").cast("long").alias("scnt"))
    )
    stot = sv.groupBy("source").agg(F.sum("scnt").cast("long").alias("sn"))
    grid = (
        stot.crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(corpus))
        .join(sv, ["source", "gram"], "left")
        .select(
            "source",
            "sn",
            (F.coalesce(F.col("scnt"), F.lit(0)).cast("double") / F.col("sn")).alias("p"),
            (F.col("cnt").cast("double") / F.col("n")).alias("q"),
        )
    )
    ln6 = lambda x: F.floor(F.log(x) * 1000000.0 + 0.5) / 1000000.0
    nano = lambda t: F.floor(t * 1000000000.0 + 0.5).cast("long")
    m = 0.5 * (F.col("p") + F.col("q"))
    tp = F.when(F.col("p") > 0, nano(F.col("p") * ln6(F.col("p") / m))).otherwise(
        F.lit(0).cast("long")
    )
    tq = nano(F.col("q") * ln6(F.col("q") / m))
    return (
        grid.select("source", "sn", tp.alias("tp"), tq.alias("tq"))
        .groupBy("source")
        .agg(
            F.max("sn").cast("long").alias("n_vocab_tokens"),
            (
                (F.sum("tp") + F.sum("tq")).cast("double") / 1000000000.0 * 0.5
            ).alias("js_divergence"),
        )
    )


# --- PMI collocations over the bounded vocab ------------------------------

_PMI_VOCAB_K = 30
_PMI_MIN_DF = 5

_PMI_SQL = rf"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS gram
  FROM documents
),
vocab AS (
  SELECT gram FROM (
    SELECT gram, row_number() OVER (ORDER BY count(*) DESC, gram) AS rank
    FROM toks GROUP BY gram
  ) WHERE rank <= {_PMI_VOCAB_K}
),
dt AS (
  SELECT DISTINCT t.doc_id, t.gram
  FROM toks t JOIN vocab v ON t.gram = v.gram
),
n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM dt),
df AS (SELECT gram, CAST(count(*) AS BIGINT) AS df FROM dt GROUP BY gram),
pairs AS (
  SELECT a.gram AS term_a, b.gram AS term_b,
         CAST(count(*) AS BIGINT) AS df_ab
  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.gram < b.gram
  GROUP BY a.gram, b.gram
)
SELECT p.term_a, p.term_b, p.df_ab,
       fa.df AS df_a, fb.df AS df_b,
       floor(ln(CAST(p.df_ab * n.n_docs AS DOUBLE) / (fa.df * fb.df))
             * 1000000.0 + 0.5) / 1000000.0 AS pmi
FROM pairs p
JOIN df fa ON p.term_a = fa.gram
JOIN df fb ON p.term_b = fb.gram
CROSS JOIN n
WHERE p.df_ab >= {_PMI_MIN_DF}
"""


@query("text_pmi_collocations", sql=_PMI_SQL, tags=("text", "analytics"))
def text_pmi_collocations(spark, sf_dir):
    """Pointwise mutual information over document co-occurrence of the
    global top-{_PMI_VOCAB_K} vocabulary — collocation mining ('which
    terms travel together beyond chance?'), the association score behind
    phrase detection and topic seeding.

    The pair space is BOUNDED at K·(K−1)/2 by the tie-broken vocab cut,
    so this never explodes with the corpus: one (doc, term) dedup keyed
    by doc, an in-doc pair fan-out capped at K²/2 per document, and
    vocab-sized count tables broadcast back.  Determinism: df·N and
    df_a·df_b are exact BIGINT products meeting in ONE IEEE division,
    and the only transcendental quantizes on the 1e-6 floor grid.
    Low-support pairs (df_ab < {_PMI_MIN_DF}) are cut identically on
    both sides."""
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(T.ws_tokens(F.col("text"))).alias("gram")
    )
    vocab = (
        toks.groupBy("gram")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "gram")
        .limit(_PMI_VOCAB_K)
        .select("gram")
    )
    dt = toks.join(F.broadcast(vocab), "gram").select("doc_id", "gram").distinct()
    # per_doc is the ONE materialization of the tokenize→vocab→dedup
    # subtree (persisted: ≤K terms per doc, doc-bounded).  n and df are
    # derived FROM it instead of from dt — without this, each of the
    # three dt consumers re-ran the full tokenization + vocab top-K
    # (~8 corpus scans total; the scaling audit's former worst line).
    per_doc = (
        dt.groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("gram")).alias("terms"))
        .persist()
    )
    n = per_doc.agg(F.count("*").cast("long").alias("n_docs"))
    df = (
        per_doc.select(F.explode("terms").alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").cast("long").alias("df"))
    )
    pair_arrays = per_doc.select(
        F.explode(
            F.flatten(
                F.transform(
                    "terms",
                    lambda a: F.filter(
                        F.transform("terms", lambda b: F.struct(a.alias("a"), b.alias("b"))),
                        lambda s: s["a"] < s["b"],
                    ),
                )
            )
        ).alias("p")
    )
    pairs = pair_arrays.select(
        F.col("p.a").alias("term_a"), F.col("p.b").alias("term_b")
    ).groupBy("term_a", "term_b").agg(F.count("*").cast("long").alias("df_ab"))
    fa = df.select(F.col("gram").alias("term_a"), F.col("df").alias("df_a"))
    fb = df.select(F.col("gram").alias("term_b"), F.col("df").alias("df_b"))
    result = (
        pairs.where(F.col("df_ab") >= _PMI_MIN_DF)
        .join(F.broadcast(fa), "term_a")
        .join(F.broadcast(fb), "term_b")
        .crossJoin(F.broadcast(n))
        .select(
            "term_a",
            "term_b",
            "df_ab",
            "df_a",
            "df_b",
            (
                F.floor(
                    F.log(
                        (F.col("df_ab") * F.col("n_docs")).cast("double")
                        / (F.col("df_a") * F.col("df_b"))
                    )
                    * 1000000.0
                    + 0.5
                )
                / 1000000.0
            ).alias("pmi"),
        )
    )
    # Scope the corpus-sized per_doc cache to this build (ADVICE r12: the
    # persist leaked across a long driver session).  The FINAL surface is
    # vocab-bounded (≤ K·(K−1)/2 = 435 rows at K=30), so an eager
    # localCheckpoint materializes it once — per_doc serves its three
    # consumers during that single job — and the cache can be released
    # before returning; the caller's action replays only the tiny
    # checkpointed blocks, which the ContextCleaner reclaims on GC.
    # Single-JVM local mode ONLY (ADVICE r13, tightened r16): localCheckpoint
    # blocks live on executors, so on a cluster (incl. local-cluster[n,c,m],
    # whose executors are separate JVMs) an executor loss after the
    # unpersist would make the result unrecomputable — there we keep the
    # persist and accept recompute of per_doc after the caller's action.
    from ..sources.sinks import is_single_jvm_master

    if is_single_jvm_master(spark.sparkContext):
        result = result.localCheckpoint(eager=True)
        per_doc.unpersist()
    return result


# --- positional skip-gram co-occurrence (embedding-training prep) ---------
# Word2vec-style (center, context) pair extraction with window ±2, the
# counting pass every embedding/collocation trainer starts from.  Unlike
# text_pmi_collocations (document-level co-occurrence of the top vocab),
# this is POSITIONAL: only tokens 1 or 2 positions apart pair up, kept
# directional (left→right).
#
# Scale design: there is NO join at all — each document pairs its own
# token array with itself via an indexed transform (token i with i+1 and
# i+2), a pure map-side array op bounded at 2 pairs per token, then one
# vocab-filtered count aggregation.  The vocab cut (top-30, tie-broken)
# bounds the count table at K²·2 cells before the top-50 TakeOrdered.
# At 100 TB: scan-bound flatten, broadcast vocab filter, postings-sized
# shuffle — corpus-linear.

_SKIPGRAM_VOCAB_K = 30
_SKIPGRAM_TOP = 50

_SKIPGRAM_SQL = rf"""
WITH arrs AS (
  SELECT regexp_split_to_array(lower(text), '\s+') AS arr FROM documents
),
vocab AS (
  SELECT gram FROM (
    SELECT gram, row_number() OVER (ORDER BY count(*) DESC, gram) AS r
    FROM (SELECT unnest(arr) AS gram FROM arrs) GROUP BY gram
  ) WHERE r <= {_SKIPGRAM_VOCAB_K}
),
pairs AS (
  SELECT unnest(filter(
           flatten(list_transform(arr, (x, i) ->
             [{{'a': x, 'b': arr[i + 1]}}, {{'a': x, 'b': arr[i + 2]}}])),
           p -> p.b IS NOT NULL)) AS p
  FROM arrs
),
counted AS (
  SELECT p.a AS term_a, p.b AS term_b, CAST(count(*) AS BIGINT) AS n_pairs
  FROM pairs
  WHERE p.a IN (SELECT gram FROM vocab) AND p.b IN (SELECT gram FROM vocab)
  GROUP BY p.a, p.b
)
SELECT term_a, term_b, n_pairs,
       CAST(row_number() OVER (ORDER BY n_pairs DESC, term_a, term_b)
            AS BIGINT) AS rank
FROM counted
ORDER BY n_pairs DESC, term_a, term_b
LIMIT {_SKIPGRAM_TOP}
"""


@query("text_skipgram_pairs", sql=_SKIPGRAM_SQL, tags=("text", "analytics"))
def text_skipgram_pairs(spark, sf_dir):
    """Top-{_SKIPGRAM_TOP} directional skip-gram pairs (window ±2) over
    the top-{_SKIPGRAM_VOCAB_K} vocabulary — see block comment for the
    join-free indexed-array design."""
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    arrs = docs.select(T.ws_tokens(F.col("text")).alias("arr"))
    vocab = (
        arrs.select(F.explode("arr").alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "gram")
        .limit(_SKIPGRAM_VOCAB_K)
        .select("gram")
    )
    # Spark transform's index is 0-based (DuckDB's is 1-based): neighbor
    # at 1-based position i+2 == 0-based index+2, skip-1 at +3.
    pairs = arrs.select(
        F.explode(
            F.filter(
                F.flatten(
                    F.transform(
                        "arr",
                        lambda x, i: F.array(
                            F.struct(
                                x.alias("a"),
                                F.try_element_at("arr", i + F.lit(2)).alias("b"),
                            ),
                            F.struct(
                                x.alias("a"),
                                F.try_element_at("arr", i + F.lit(3)).alias("b"),
                            ),
                        ),
                    )
                ),
                lambda p: p["b"].isNotNull(),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("term_a"), F.col("p.b").alias("term_b"))
    va = vocab.select(F.col("gram").alias("term_a"))
    vb = vocab.select(F.col("gram").alias("term_b"))
    counted = (
        pairs.join(F.broadcast(va), "term_a")
        .join(F.broadcast(vb), "term_b")
        .groupBy("term_a", "term_b")
        .agg(F.count("*").cast("long").alias("n_pairs"))
    )
    wr = Window.orderBy(F.desc("n_pairs"), "term_a", "term_b")
    return (
        counted.orderBy(F.desc("n_pairs"), "term_a", "term_b")
        .limit(_SKIPGRAM_TOP)
        .withColumn("rank", F.row_number().over(wr).cast("long"))
        .select("term_a", "term_b", "n_pairs", "rank")
    )


# --- tokenizer fertility audit (chars/token, subword/word ratios) ---------
# "How many subword tokens does this corpus cost per language?" — the
# budgeting number behind every multilingual data mix (fertility = BPE-ish
# tokens per whitespace word; compression = chars per BPE-ish token).
# Map-only token counting (the text_token_stats kernels) + one 5-group
# aggregate; exact BIGINT sums meet in single IEEE divisions.

_FERTILITY_SQL = r"""
WITH t AS (
  SELECT lang,
         CAST(len(regexp_split_to_array(lower(text), '\s+')) AS BIGINT) AS ws,
         CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))
              AS BIGINT) AS bpe,
         CAST(length(text) AS BIGINT) AS chars
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(chars) AS BIGINT) AS total_chars,
       CAST(sum(ws) AS BIGINT) AS total_ws_tokens,
       CAST(sum(bpe) AS BIGINT) AS total_bpeish_tokens,
       round(CAST(sum(chars) AS DOUBLE) / CAST(sum(bpe) AS DOUBLE), 6)
         AS chars_per_token,
       round(CAST(sum(bpe) AS DOUBLE) / CAST(sum(ws) AS DOUBLE), 6)
         AS fertility
FROM t GROUP BY lang
"""


@query("tokenizer_fertility_by_lang", sql=_FERTILITY_SQL, tags=("text", "tokens", "audit"))
def tokenizer_fertility_by_lang(spark, sf_dir):
    """Per-language tokenizer fertility and compression-ratio audit — see
    block comment."""
    docs = read_table(spark, sf_dir, "documents")
    t = docs.select(
        "lang",
        F.size(T.ws_tokens(F.col("text"))).cast("long").alias("ws"),
        T.bpeish_token_count(F.col("text")).alias("bpe"),
        F.length("text").cast("long").alias("chars"),
    )
    return t.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("chars").cast("long").alias("total_chars"),
        F.sum("ws").cast("long").alias("total_ws_tokens"),
        F.sum("bpe").cast("long").alias("total_bpeish_tokens"),
        F.round(
            F.sum("chars").cast("double") / F.sum("bpe").cast("double"), 6
        ).alias("chars_per_token"),
        F.round(F.sum("bpe").cast("double") / F.sum("ws").cast("double"), 6).alias(
            "fertility"
        ),
    )


# --- per-document keyword extraction (top TF-IDF terms per doc) -----------
# tfidf_top_terms' per-SOURCE rollup answers "what characterizes this
# corpus slice"; this extracts top-3 keywords per DOCUMENT — the tagging
# pass behind search indexing and doc clustering.  Shape: (doc, term)
# counts (map-side combined), document frequency via a term-partitioned
# window count (no join-back), then the per-doc rank filter compiles to
# WindowGroupLimit — each doc keeps its top-3 map-side before the window
# shuffle, so the ranked exchange carries ~3 rows per doc, not the
# vocabulary.  Same 6-dp-idf-before-multiply rule as the source variant.

_DOC_KW_TOP = 3

_DOC_KW_SQL = rf"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
),
with_df AS (
  SELECT doc_id, term, tf,
         count(*) OVER (PARTITION BY term) AS df,
         (SELECT count(*) FROM documents) AS n_docs
  FROM tf
),
scored AS (
  SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
         round(tf * round(ln(CAST(n_docs AS DOUBLE) / df), 6), 6) AS tfidf
  FROM with_df
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term) AS rank
  FROM scored
)
SELECT doc_id, term, tf, df, tfidf, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {_DOC_KW_TOP}
"""


@query("text_doc_keywords", sql=_DOC_KW_SQL, tags=("text", "analytics"))
def text_doc_keywords(spark, sf_dir):
    """Top-{_DOC_KW_TOP} TF-IDF keywords per document — see block
    comment for the WindowGroupLimit rank shape."""
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(T.ws_tokens(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    w_term = Window.partitionBy("term")
    scored = (
        tf.withColumn("df", F.count("*").over(w_term))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.round(
                F.col("tf")
                * F.round(
                    F.log(F.col("n_docs").cast("double") / F.col("df")), 6
                ),
                6,
            ).alias("tfidf"),
        )
    )
    w_doc = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w_doc).cast("long"))
        .where(F.col("rank") <= _DOC_KW_TOP)
    )


# --- language-label disagreement audit ------------------------------------
# The per-source confusion readout over text_language_id's heuristic:
# how often does the n-gram predictor disagree with the corpus's own
# language labels, and what does the (labeled, predicted) confusion look
# like?  In a crawl pipeline this is the signal that a source's labels
# (or the detector) need attention.  Same deterministic tie-broken
# argmax as text_language_id, rolled up to a confusion-cell table —
# map-only scan plus a tiny aggregate.

_LANG_MISMATCH_SQL = r"""
WITH toks AS (
  SELECT doc_id, source, lang,
         regexp_split_to_array(lower(text), '\s+') AS t
  FROM documents
), scores AS (
  SELECT doc_id, source, lang,
    len(list_intersect(t, ['the','fast','data','query']))  AS score_en,
    len(list_intersect(t, ['window','merge','batch']))      AS score_de,
    len(list_intersect(t, ['table','scan','row']))          AS score_es,
    len(list_intersect(t, ['join','filter','group']))       AS score_fr,
    len(list_intersect(t, ['hash','sort','key']))           AS score_zh
  FROM toks
), pred AS (
  SELECT source, lang AS labeled_lang,
    CASE
      WHEN score_en >= greatest(score_de, score_es, score_fr, score_zh) THEN 'en'
      WHEN score_es > greatest(score_de, score_fr, score_zh) THEN 'es'
      WHEN score_fr > greatest(score_de, score_zh) THEN 'fr'
      WHEN score_zh > score_de THEN 'zh'
      ELSE 'de'
    END AS predicted_lang
  FROM scores
)
SELECT source, labeled_lang, predicted_lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(labeled_lang = predicted_lang AS BOOLEAN) AS agrees
FROM pred GROUP BY source, labeled_lang, predicted_lang
"""


@query("quality_langid_mismatch", sql=_LANG_MISMATCH_SQL, tags=("text", "quality", "audit"))
def quality_langid_mismatch(spark, sf_dir):
    """Per-source (labeled, predicted) language confusion cells from the
    n-gram language-id heuristic — see block comment."""
    docs = read_table(spark, sf_dir, "documents")
    toks = T.ws_tokens(F.col("text"))
    probes = {
        "en": ["the", "fast", "data", "query"],
        "de": ["window", "merge", "batch"],
        "es": ["table", "scan", "row"],
        "fr": ["join", "filter", "group"],
        "zh": ["hash", "sort", "key"],
    }
    scored = docs.select(
        "source",
        F.col("lang").alias("labeled_lang"),
        *[
            F.size(
                F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
            ).alias(f"score_{code}")
            for code, words in probes.items()
        ],
    )
    en, de, es, fr, zh = (F.col(f"score_{c}") for c in ("en", "de", "es", "fr", "zh"))
    predicted = (
        F.when(en >= F.greatest(de, es, fr, zh), "en")
        .when(es > F.greatest(de, fr, zh), "es")
        .when(fr > F.greatest(de, zh), "fr")
        .when(zh > de, "zh")
        .otherwise("de")
    )
    return (
        scored.select("source", "labeled_lang", predicted.alias("predicted_lang"))
        .groupBy("source", "labeled_lang", "predicted_lang")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .withColumn(
            "agrees", F.col("labeled_lang") == F.col("predicted_lang")
        )
    )


# --- per-source unigram entropy (diversity / templating signal) -----------
# Low token entropy = templated or boilerplate-heavy source; the
# diversity number mixture designers read next to OOV and JS-drift.
# H = −Σ p·ln p over the source's unigram distribution: p = c/N is an
# exact BIGINT ratio in ONE division, each −p·ln(p) term quantizes onto
# the 1e-9 floor grid before a BIGINT sum (the chi-square rule — the
# only transcendental never meets a float accumulator), and H rounds
# once at 6 dp.  Shape: one (source, token) count shuffle (map-side
# combined), then source-sized aggregates.

_ENTROPY_SQL = r"""
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
  FROM documents
),
counts AS (
  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
  FROM toks GROUP BY source, tok
),
totals AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS vocab
  FROM counts GROUP BY source
),
terms AS (
  SELECT c.source, t.n, t.vocab,
         CAST(floor(-(CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE))
                    * ln(CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE))
                    * 1000000000.0 + 0.5) AS BIGINT) AS term_nano
  FROM counts c JOIN totals t ON c.source = t.source
)
SELECT source, CAST(max(n) AS BIGINT) AS n_tokens,
       CAST(max(vocab) AS BIGINT) AS vocab_size,
       round(CAST(sum(term_nano) AS DOUBLE) / 1000000000.0, 6) AS entropy_nats,
       round(exp(CAST(sum(term_nano) AS DOUBLE) / 1000000000.0), 6)
         AS perplexity
FROM terms GROUP BY source
"""


@query("text_source_entropy", sql=_ENTROPY_SQL, tags=("text", "quality", "analytics"))
def text_source_entropy(spark, sf_dir):
    """Per-source unigram Shannon entropy and perplexity — see block
    comment for the nano-grid term quantization."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(T.ws_tokens(F.col("text"))).alias("tok")
    )
    counts = toks.groupBy("source", "tok").agg(
        F.count("*").cast("long").alias("c")
    )
    totals = counts.groupBy("source").agg(
        F.sum("c").cast("long").alias("n"),
        F.count("*").cast("long").alias("vocab"),
    )
    p = F.col("c").cast("double") / F.col("n").cast("double")
    term = F.floor(-p * F.log(p) * 1000000000.0 + F.lit(0.5)).cast("long")
    terms = counts.join(F.broadcast(totals), "source").select(
        "source", "n", "vocab", term.alias("term_nano")
    )
    h = F.sum("term_nano").cast("double") / 1000000000.0
    return terms.groupBy("source").agg(
        F.max("n").cast("long").alias("n_tokens"),
        F.max("vocab").cast("long").alias("vocab_size"),
        F.round(h, 6).alias("entropy_nats"),
        F.round(F.exp(h), 6).alias("perplexity"),
    )


# --- vocabulary richness: type-token ratio and hapax share ----------------
# The corpus-health diagnostic that catches template spam (TTR collapses)
# and OCR noise (hapax share explodes) before either poisons a training
# mix.  One token explosion -> one (source, term) rollup (map-side
# combined, postings-sized) -> one per-source reduction; everything after
# the first shuffle is vocabulary-sized.  All counts are exact BIGINTs;
# the two ratios are single guarded divisions rounded to 6 dp.

_HAPAX_SQL = r"""
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(lower(text), '\s+')) AS term
  FROM documents
),
freq AS (
  SELECT source, term, CAST(count(*) AS BIGINT) AS c
  FROM toks GROUP BY source, term
)
SELECT source,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       round(CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6)
         AS type_token_ratio,
       round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS hapax_share
FROM freq GROUP BY source
"""


@query("text_hapax_ratio", sql=_HAPAX_SQL, tags=("text", "quality"))
def text_hapax_ratio(spark, sf_dir):
    """Per-source type-token ratio and hapax-legomena share — see block
    comment."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(T.ws_tokens(F.col("text"))).alias("term")
    )
    freq = toks.groupBy("source", "term").agg(
        F.count("*").cast("long").alias("c")
    )
    n_types = F.count("*").cast("long")
    n_tokens = F.sum("c").cast("long")
    n_hapax = F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long")
    return freq.groupBy("source").agg(
        n_tokens.alias("n_tokens"),
        n_types.alias("n_types"),
        n_hapax.alias("n_hapax"),
        F.round(
            n_types.cast("double") / n_tokens.cast("double"), 6
        ).alias("type_token_ratio"),
        F.round(
            n_hapax.cast("double") / n_types.cast("double"), 6
        ).alias("hapax_share"),
    )


# --- Zipf rank-frequency slope ---------------------------------------------
# Natural corpora obey freq ~ rank^(-s) with s near 1; templated or
# machine-generated text bends the log-log line.  The corpus reduces to
# the top-200 vocabulary (bounded grid, rank tie-broken by term), each
# (ln rank, ln freq) point quantizes to the 1e-6 BIGINT grid (the
# transcendental rule: round ln BEFORE any multiply/sum), the OLS
# moments are exact integer sums over 200 cells, and the closed-form
# slope/intercept/r2 are shared double expressions on exact inputs.

_ZIPF_K = 200

_ZIPF_SQL = rf"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS term
  FROM documents
),
vocab AS (
  SELECT term, cnt, rank FROM (
    SELECT term, CAST(count(*) AS BIGINT) AS cnt,
           row_number() OVER (ORDER BY count(*) DESC, term) AS rank
    FROM toks GROUP BY term
  ) WHERE rank <= {_ZIPF_K}
),
pts AS (
  SELECT CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
           AS x,
         CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
           AS y
  FROM vocab
),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM pts
)
SELECT n AS n_terms,
       CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
            THEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
       END AS zipf_slope,
       CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
            THEN round((CAST(sy AS DOUBLE)
                        - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                          / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          * CAST(sx AS DOUBLE))
                       / CAST(n AS DOUBLE) / 1000000.0, 6)
       END AS intercept_ln,
       CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0.0
             AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0.0
            THEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       / (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 6)
       END AS r_squared
FROM mom
"""


@query("text_zipf_slope", sql=_ZIPF_SQL, tags=("text", "stats"))
def text_zipf_slope(spark, sf_dir):
    """Log-log OLS slope of the top-200 rank-frequency curve — see block
    comment."""
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(T.ws_tokens(F.col("text"))).alias("term"))
    counts = toks.groupBy("term").agg(F.count("*").cast("long").alias("cnt"))
    # Cut to the top-K via orderBy+limit (distributed TakeOrdered with
    # per-partition pruning) BEFORE ranking — a partitionless row_number
    # over the full vocabulary would funnel every distinct term through a
    # single reducer (VERDICT r8 item 2).  The K survivors then get their
    # rank from a window that only ever sees K rows.
    w = Window.orderBy(F.col("cnt").desc(), F.col("term"))
    vocab = (
        counts.orderBy(F.col("cnt").desc(), F.col("term"))
        .limit(_ZIPF_K)
        .withColumn("rank", F.row_number().over(w))
    )
    pts = vocab.select(
        F.floor(F.log(F.col("rank").cast("double")) * 1000000.0 + F.lit(0.5))
        .cast("long")
        .alias("x"),
        F.floor(F.log(F.col("cnt").cast("double")) * 1000000.0 + F.lit(0.5))
        .cast("long")
        .alias("y"),
    )
    mom = pts.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    dx = nd * sxx - sx * sx
    dy = nd * syy - sy * sy
    num = nd * sxy - sx * sy
    slope = num / dx
    return mom.select(
        F.col("n").alias("n_terms"),
        F.when(dx > 0.0, F.round(slope, 6)).alias("zipf_slope"),
        F.when(
            dx > 0.0,
            F.round((sy - slope * sx) / nd / 1000000.0, 6),
        ).alias("intercept_ln"),
        F.when(
            (dx > 0.0) & (dy > 0.0), F.round(num * num / dx / dy, 6)
        ).alias("r_squared"),
    )


# --- term burstiness (variance-to-mean ratio) --------------------------------
# Church & Gale's observation: content words are BURSTY (a doc that uses
# one tends to reuse it; VMR >> 1) while function words spread evenly
# (VMR ~= 1, Poisson-like) — the signal that separates topical terms
# from glue without any stopword list.  The corpus reduces once to
# (term, doc) tf cells, then to top-100 term moments; docs missing a
# term contribute 0 to both moments, so only the observed cells are
# touched and N enters the closed form.  Exact BIGINT moments, one
# shared double expression, round 6.

_BURSTY_K = 100

_BURSTY_SQL = rf"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS term
  FROM documents
),
cells AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY term, doc_id
),
terms AS (
  SELECT term,
         CAST(sum(tf) AS BIGINT) AS s,
         CAST(sum(tf * tf) AS BIGINT) AS sq,
         CAST(count(*) AS BIGINT) AS doc_freq,
         row_number() OVER (ORDER BY sum(tf) DESC, term) AS rank
  FROM cells GROUP BY term
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
SELECT t.term, t.s AS corpus_tf, t.doc_freq,
       round(CAST(t.s AS DOUBLE) / CAST(n.n_docs AS DOUBLE), 6)
         AS mean_tf_per_doc,
       CASE WHEN n.n_docs > 1 AND t.s > 0
            THEN round(((CAST(t.sq AS DOUBLE)
                         - CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE)
                           / CAST(n.n_docs AS DOUBLE))
                        / (CAST(n.n_docs AS DOUBLE) - 1.0))
                       / (CAST(t.s AS DOUBLE) / CAST(n.n_docs AS DOUBLE)), 6)
       END AS vmr
FROM terms t CROSS JOIN n WHERE t.rank <= {_BURSTY_K}
"""


@query("text_term_burstiness", sql=_BURSTY_SQL, tags=("text", "stats"))
def text_term_burstiness(spark, sf_dir):
    """Variance-to-mean burstiness of the top-100 terms — see block
    comment."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(T.ws_tokens(F.col("text"))).alias("term")
    )
    cells = toks.groupBy("term", "doc_id").agg(
        F.count("*").cast("long").alias("tf")
    )
    terms = cells.groupBy("term").agg(
        F.sum("tf").cast("long").alias("s"),
        F.sum(F.col("tf") * F.col("tf")).cast("long").alias("sq"),
        F.count("*").cast("long").alias("doc_freq"),
    )
    # Top-K cut via orderBy+limit (distributed TakeOrdered) instead of a
    # partitionless full-vocabulary row_number (VERDICT r8 item 2); the
    # rank itself is not an output column, so no post-limit window needed.
    top = terms.orderBy(F.col("s").desc(), F.col("term")).limit(_BURSTY_K)
    n = docs.agg(F.count("*").cast("long").alias("n_docs"))
    nd = F.col("n_docs").cast("double")
    sd_ = F.col("s").cast("double")
    mean = sd_ / nd
    var = (F.col("sq").cast("double") - sd_ * sd_ / nd) / (nd - F.lit(1.0))
    return top.crossJoin(F.broadcast(n)).select(
        "term",
        F.col("s").alias("corpus_tf"),
        "doc_freq",
        F.round(mean, 6).alias("mean_tf_per_doc"),
        F.when(
            (F.col("n_docs") > 1) & (F.col("s") > 0), F.round(var / mean, 6)
        ).alias("vmr"),
    )


# --- n-gram novelty (memorization / originality audit) ---------------------
# For each document: what share of its distinct word trigrams had already
# appeared in an EARLIER document (doc_id order = ingestion order)?  The
# repeated-gram share is the memorization-risk signal curation pipelines
# track when deciding how much of a source is boilerplate recycled across
# crawls.  Shape: per-doc DISTINCT trigrams, one gram-keyed min(doc_id)
# aggregate (first-seen doc), join back, per-source BIGINT rollup with a
# single final division — linear, map-side combined, nothing corpus².

_NOVELTY_SQL = r"""
WITH toks AS (
  SELECT doc_id, source,
         regexp_split_to_array(lower(text), '\s+') AS t
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, source,
         t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
  FROM toks, LATERAL unnest(generate_series(1, len(t) - 2)) AS g(i)
  WHERE len(t) >= 3
),
first_seen AS (
  SELECT gram, min(doc_id) AS first_doc FROM grams GROUP BY gram
)
SELECT g.source,
       CAST(count(DISTINCT g.doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(CASE WHEN f.first_doc < g.doc_id THEN 1 END) AS BIGINT)
         AS n_repeated,
       CAST(count(CASE WHEN f.first_doc < g.doc_id THEN 1 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS repeated_share
FROM grams g JOIN first_seen f ON g.gram = f.gram
GROUP BY g.source
"""


@query("text_ngram_novelty", sql=_NOVELTY_SQL, tags=("text", "novelty"))
def text_ngram_novelty(spark, sf_dir):
    """Per-source share of distinct doc trigrams first seen in an earlier
    document — see block comment."""
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    # materialize the token array ONCE before the gram transform: passing
    # the raw ws_tokens expression into per-element lambdas makes codegen
    # re-run the split for every element_at (14× at sf0.1: 7.1 s → 0.5 s
    # for the gram build alone)
    base = docs.select(
        "doc_id", "source", T.ws_tokens(F.col("text")).alias("t")
    )
    tk = F.col("t")
    grams_arr = F.when(
        F.size(tk) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(tk, i),
                F.element_at(tk, i + 1),
                F.element_at(tk, i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # per-doc dedup happens IN-MAP (array_distinct before the explode) and
    # first-seen attribution is one gram-partitioned window — two total
    # shuffles of the gram table, vs the naive distinct + groupBy + join
    # back (three shuffles + a join)
    grams = base.select(
        "doc_id", "source", F.explode(F.array_distinct(grams_arr)).alias("gram")
    )
    j = grams.withColumn(
        "first_doc", F.min("doc_id").over(Window.partitionBy("gram"))
    )
    rep = F.count(F.when(F.col("first_doc") < F.col("doc_id"), 1))
    return j.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count("*").cast("long").alias("n_grams"),
        rep.cast("long").alias("n_repeated"),
        (rep.cast("double") / F.count("*").cast("double")).alias(
            "repeated_share"
        ),
    )


# --- type-token ratio by source (lexical diversity) ------------------------
# Corpus-level TTR per source: distinct terms / token occurrences, plus
# the source's hapax count (terms used exactly once WITHIN the source) —
# the lexical-diversity profile that separates template-generated sources
# from organic text.  Distinct from text_hapax_ratio (corpus-global) and
# text_source_entropy (token-share distribution): this is the per-source
# vocabulary shape.  Exact BIGINTs + one division.

_TTR_SQL = r"""
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(lower(text), '\s+')) AS term
  FROM documents
),
term_counts AS (
  SELECT source, term, CAST(count(*) AS BIGINT) AS c
  FROM toks GROUP BY source, term
)
SELECT source,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(count(CASE WHEN c = 1 THEN 1 END) AS BIGINT) AS n_hapax,
       CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS ttr
FROM term_counts
GROUP BY source
"""


@query("text_ttr_by_source", sql=_TTR_SQL, tags=("text", "diversity"))
def text_ttr_by_source(spark, sf_dir):
    """Per-source type-token ratio and within-source hapax count — see
    block comment."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(T.ws_tokens(F.col("text"))).alias("term")
    )
    tc = toks.groupBy("source", "term").agg(
        F.count("*").cast("long").alias("c")
    )
    return tc.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.count(F.when(F.col("c") == 1, 1)).cast("long").alias("n_hapax"),
        (F.count("*").cast("double") / F.sum("c").cast("double")).alias("ttr"),
    )


# --- interpolated bigram LM quality proxy -----------------------------------
# The bigram upgrade of quality_unigram_logprob: every adjacent token
# pair is scored by an interpolated bigram model fit on the corpus
# itself (p = 0.9·c12/c1 + 0.1·c2/ctot, all counts over bigram
# positions, so the model is self-contained), and documents roll up to a
# per-source mean negative log-probability — the fluency signal that
# separates scrambled/templated text from organic word order, which a
# unigram model cannot see.  Scale: ONE pair scan reduces to
# (source, w1, w2) tf cells; every model count (c12, c1, c2, total)
# DERIVES from those cells by further aggregation — the corpus is never
# touched again, and all joins are vocab²-sized keyed equi-joins.
# Determinism: each type's -ln(p) rounds to 6dp and casts to
# DECIMAL(18,6) BEFORE the tf-weighted sum (the quality_unigram_logprob
# contract); counts are exact BIGINTs; one final division.

_BIGRAM_LP_SQL = r"""
WITH toks AS (
  SELECT source, regexp_split_to_array(lower(text), '\s+') AS t
  FROM documents
),
pairs AS (
  SELECT source, t[i] AS w1, t[i+1] AS w2
  FROM toks, LATERAL unnest(generate_series(1, len(t) - 1)) AS g(i)
  WHERE len(t) >= 2
),
cells AS (
  SELECT source, w1, w2, CAST(count(*) AS BIGINT) AS tf
  FROM pairs GROUP BY source, w1, w2
),
big AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS c12 FROM cells GROUP BY w1, w2),
ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM big GROUP BY w1),
nxt AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS c2 FROM big GROUP BY w2),
tot AS (SELECT CAST(sum(c12) AS DOUBLE) AS ctot FROM big),
typed AS (
  SELECT b.w1, b.w2,
         CAST(round(-ln(0.9 * CAST(b.c12 AS DOUBLE) / CAST(x.c1 AS DOUBLE)
                        + 0.1 * CAST(n.c2 AS DOUBLE) / t.ctot), 6)
              AS DECIMAL(18,6)) AS q
  FROM big b JOIN ctx x ON b.w1 = x.w1
             JOIN nxt n ON b.w2 = n.w2
             CROSS JOIN tot t
)
SELECT c.source,
       CAST(sum(c.tf) AS BIGINT) AS n_bigrams,
       CAST(sum(c.tf * ty.q) AS DOUBLE) / CAST(sum(c.tf) AS DOUBLE)
         AS avg_neg_logprob
FROM cells c JOIN typed ty ON c.w1 = ty.w1 AND c.w2 = ty.w2
GROUP BY c.source
"""


@query("quality_bigram_logprob", sql=_BIGRAM_LP_SQL, tags=("text", "quality", "lm"))
def quality_bigram_logprob(spark, sf_dir):
    """Interpolated bigram-LM mean negative log-probability per source —
    see block comment."""
    docs = read_table(spark, sf_dir, "documents")
    # materialize the token array before per-element lambdas (round-9 rule)
    base = docs.select("source", T.ws_tokens(F.col("text")).alias("t"))
    tk = F.col("t")
    pair_arr = F.when(
        F.size(tk) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 1),
            lambda i: F.struct(
                F.element_at(tk, i).alias("w1"),
                F.element_at(tk, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    cells = (
        base.select("source", F.explode(pair_arr).alias("p"))
        .groupBy("source", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count("*").cast("long").alias("tf"))
    )
    big = cells.groupBy("w1", "w2").agg(F.sum("tf").cast("long").alias("c12"))
    ctx = big.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    nxt = big.groupBy("w2").agg(F.sum("c12").cast("long").alias("c2"))
    tot = big.agg(F.sum("c12").cast("double").alias("ctot"))
    p = (
        F.lit(0.9) * F.col("c12").cast("double") / F.col("c1").cast("double")
        + F.lit(0.1) * F.col("c2").cast("double") / F.col("ctot")
    )
    typed = (
        big.join(ctx, "w1")
        .join(nxt, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1", "w2",
            F.round(-F.log(p), 6).cast("decimal(18,6)").alias("q"),
        )
    )
    return (
        cells.join(typed, ["w1", "w2"])
        .groupBy("source")
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            (
                F.sum(F.col("tf") * F.col("q")).cast("double")
                / F.sum("tf").cast("double")
            ).alias("avg_neg_logprob"),
        )
    )


# --- Heaps' law fit ----------------------------------------------------------
# Heaps' law: vocabulary size grows as V = k * N^beta (beta ~ 0.4-0.6 for
# natural text).  Fit beta/ln(k) by log-log OLS across the per-SOURCE
# (token count, type count) points — the cross-source companion to the
# within-source Zipf slope above, and a corpus-health audit: a source
# family whose vocab growth falls far off the fitted line is either
# boilerplate-heavy (beta too low) or noise/ID-heavy (too high).  Same
# determinism treatment as Zipf: micro-quantized ln as BIGINT points,
# exact integer moments, final double divisions.

_HEAPS_SQL = r"""
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(lower(text), '\s+')) AS term
  FROM documents
),
per_source AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(count(DISTINCT term) AS BIGINT) AS n_types
  FROM toks GROUP BY source
),
pts AS (
  SELECT CAST(floor(ln(CAST(n_tokens AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
           AS x,
         CAST(floor(ln(CAST(n_types AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
           AS y
  FROM per_source
),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM pts
)
SELECT n AS n_sources,
       CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
            THEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
       END AS heaps_beta,
       CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
            THEN round((CAST(sy AS DOUBLE)
                        - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                          / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          * CAST(sx AS DOUBLE))
                       / CAST(n AS DOUBLE) / 1000000.0, 6)
       END AS ln_k,
       CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
             AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0.0
            THEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       / (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 6)
       END AS r_squared
FROM mom
"""


@query("text_heaps_law_fit", sql=_HEAPS_SQL, tags=("text", "stats"))
def text_heaps_law_fit(spark, sf_dir):
    """Heaps' law vocabulary-growth fit across sources — see block
    comment.  One token scan → 20 per-source (N, V) cells → 1-row OLS;
    every aggregate is map-side combined, the regression itself is
    driver-row-sized."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(T.ws_tokens(F.col("text"))).alias("term")
    )
    per_source = toks.groupBy("source").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.countDistinct("term").cast("long").alias("n_types"),
    )
    pts = per_source.select(
        F.floor(F.log(F.col("n_tokens").cast("double")) * 1000000.0 + F.lit(0.5))
        .cast("long")
        .alias("x"),
        F.floor(F.log(F.col("n_types").cast("double")) * 1000000.0 + F.lit(0.5))
        .cast("long")
        .alias("y"),
    )
    mom = pts.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    dx = nd * sxx - sx * sx
    dy = nd * syy - sy * sy
    num = nd * sxy - sx * sy
    slope = num / dx
    return mom.select(
        F.col("n").alias("n_sources"),
        F.when(dx > 0.0, F.round(slope, 6)).alias("heaps_beta"),
        F.when(
            dx > 0.0, F.round((sy - slope * sx) / nd / 1000000.0, 6)
        ).alias("ln_k"),
        F.when(
            (dx > 0.0) & (dy > 0.0), F.round(num * num / dx / dy, 6)
        ).alias("r_squared"),
    )


# --- perplexity-bucket quality filter (CCNet shape) --------------------------
# The standard LM-quality curation step (CCNet / Wenzek et al.): score
# every document by LM perplexity, bucket the corpus, and keep/downsample
# buckets.  Scoring model = the same interpolated bigram LM as
# quality_bigram_logprob (trained on the WHOLE corpus — every model count
# derives from one (w1,w2) cell scan); per-DOC mean negative logprob is
# then banded at 0.05-nat width (floor(nlp*20) — the synthetic corpus
# spans ~3.27-3.65 nats, so integer bands would collapse to one).  Per-type 6-dp
# DECIMAL quantization before every cross-row sum keeps the fold exact;
# all joins are vocab-sized equi-joins; nothing scales with pairs.

_PPL_BUCKET_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t
  FROM documents
),
pairs AS (
  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
  FROM toks, LATERAL unnest(generate_series(1, len(t) - 1)) AS g(i)
  WHERE len(t) >= 2
),
cells AS (
  SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS tf
  FROM pairs GROUP BY doc_id, w1, w2
),
big AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS c12 FROM cells GROUP BY w1, w2),
ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM big GROUP BY w1),
nxt AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS c2 FROM big GROUP BY w2),
tot AS (SELECT CAST(sum(c12) AS DOUBLE) AS ctot FROM big),
typed AS (
  SELECT b.w1, b.w2,
         CAST(round(-ln(0.9 * CAST(b.c12 AS DOUBLE) / CAST(x.c1 AS DOUBLE)
                        + 0.1 * CAST(n.c2 AS DOUBLE) / t.ctot), 6)
              AS DECIMAL(18,6)) AS q
  FROM big b JOIN ctx x ON b.w1 = x.w1
             JOIN nxt n ON b.w2 = n.w2
             CROSS JOIN tot t
),
doc_scores AS (
  SELECT c.doc_id,
         CAST(sum(c.tf) AS BIGINT) AS n_bigrams,
         CAST(round(CAST(sum(c.tf * ty.q) AS DOUBLE)
                    / CAST(sum(c.tf) AS DOUBLE), 6)
              AS DECIMAL(18,6)) AS nlp
  FROM cells c JOIN typed ty ON c.w1 = ty.w1 AND c.w2 = ty.w2
  GROUP BY c.doc_id
)
SELECT CAST(floor(nlp * 20) AS BIGINT) AS ppl_band,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_bigrams) AS BIGINT) AS n_bigrams,
       round(CAST(sum(nlp) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         AS avg_neg_logprob
FROM doc_scores GROUP BY 1
"""


@query(
    "quality_perplexity_buckets",
    sql=_PPL_BUCKET_SQL,
    tags=("text", "quality", "lm", "curation"),
)
def quality_perplexity_buckets(spark, sf_dir):
    """Perplexity-bucketed corpus profile (CCNet-style quality filter) —
    see block comment."""
    docs = read_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", T.ws_tokens(F.col("text")).alias("t"))
    tk = F.col("t")
    # adjacent bigram pairs as zip(t[1:n-1], t[2:n]) — two slices + one
    # arrays_zip, all non-lambda expressions (r17, guide §4.1: the
    # previous per-element transform + 2×element_at HOF chain was
    # interpreted per row; this form produces the identical pair
    # multiset).  arrays_zip names its struct fields "0"/"1".
    pair_arr = F.when(
        F.size(tk) >= 2,
        F.arrays_zip(
            F.slice(tk, 1, F.size(tk) - 1), F.slice(tk, 2, F.size(tk) - 1)
        ),
    )
    cells = (
        base.select("doc_id", F.explode(pair_arr).alias("p"))
        .groupBy("doc_id", F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
        .agg(F.count("*").cast("long").alias("tf"))
    )
    big = cells.groupBy("w1", "w2").agg(F.sum("tf").cast("long").alias("c12"))
    ctx = big.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    nxt = big.groupBy("w2").agg(F.sum("c12").cast("long").alias("c2"))
    tot = big.agg(F.sum("c12").cast("double").alias("ctot"))
    typed = (
        big.join(ctx, "w1")
        .join(nxt, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.round(
                -F.log(
                    F.lit(0.9)
                    * F.col("c12").cast("double")
                    / F.col("c1").cast("double")
                    + F.lit(0.1) * F.col("c2").cast("double") / F.col("ctot")
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("q"),
        )
    )
    doc_scores = (
        cells.join(typed, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.round(
                F.sum(F.col("tf") * F.col("q")).cast("double")
                / F.sum("tf").cast("double"),
                6,
            )
            .cast("decimal(18,6)")
            .alias("nlp"),
        )
    )
    band = (
        F.floor(F.col("nlp") * 20).cast("long").alias("ppl_band")
    )
    return doc_scores.groupBy(band).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_bigrams").cast("long").alias("n_bigrams"),
        F.round(
            F.sum("nlp").cast("double") / F.count("*").cast("double"), 6
        ).alias("avg_neg_logprob"),
    )


# --- reciprocal-rank-fusion hybrid retrieval ---------------------------------
# The standard hybrid-search fusion (Cormack/Clarke/Buettcher RRF):
# combine the LEXICAL ranking (BM25 above) with the DENSE ranking (exact
# cosine over the aligned embeddings table — vec_id == doc_id in the
# fixtures) as score = Σ_lists 1/(60 + rank), which needs no score
# calibration between the two retrievers.  Fixture pairing: BM25 query_id
# q's dense representation is embedding vec_id q.  Both input rankings
# are top-5 with deterministic tie-breaks; the fusion sum has at most two
# IEEE-exact terms, so ordering is engine-exact.  At 100 TB each side is
# its own bounded retrieval (broadcast terms / broadcast probes); the
# fusion is a candidate-sized full-outer equi-join.

_RRF_K = 60
_RRF_TOP_K = 5

from ..functions.vector import duck_cosine as _dc_rrf  # noqa: E402

_duck_cos = _dc_rrf("a.v", "b.v")

_RRF_SQL = rf"""
WITH qterms(query_id, term) AS (VALUES {_BM25_VALUES}),
docs AS (
  SELECT doc_id, len(regexp_split_to_array(lower(text), '\s+')) AS dl,
         regexp_split_to_array(lower(text), '\s+') AS toks
  FROM documents
),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM docs
),
tok AS (SELECT doc_id, dl, unnest(toks) AS term FROM docs),
postings AS (
  SELECT doc_id, term, count(*) AS tf, max(dl) AS dl
  FROM tok WHERE term IN (SELECT DISTINCT term FROM qterms)
  GROUP BY doc_id, term
),
idf AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df,
         floor(ln((s.n_docs - count(*) + 0.5) / (count(*) + 0.5) + 1.0)
               * 1000000.0 + 0.5) / 1000000.0 AS idf
  FROM postings CROSS JOIN stats s
  GROUP BY term, s.n_docs
),
contrib AS (
  SELECT q.query_id, p.doc_id,
         CAST(floor(i.idf * (p.tf * 2.2)
                    / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl))
                    * 1000000.0 + 0.5) AS BIGINT) AS c_micro
  FROM postings p
  JOIN idf i ON p.term = i.term
  JOIN qterms q ON p.term = q.term
  CROSS JOIN stats s
),
lex_scored AS (
  SELECT query_id, doc_id, sum(c_micro) AS score_micro
  FROM contrib GROUP BY query_id, doc_id
),
lex AS (
  SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY score_micro DESC, doc_id) AS BIGINT) AS lex_rank
  FROM lex_scored
  QUALIFY lex_rank <= {_RRF_TOP_K}
),
v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sims AS (
  SELECT a.vec_id AS query_id, b.vec_id AS doc_id,
         round({_duck_cos}, 6) AS cosine_sim
  FROM v a JOIN v b ON a.vec_id IN (1, 2, 3) AND b.vec_id != a.vec_id
),
dense AS (
  SELECT query_id, doc_id,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cosine_sim DESC, doc_id) AS BIGINT) AS dense_rank
  FROM sims
  QUALIFY dense_rank <= {_RRF_TOP_K}
),
fused AS (
  SELECT coalesce(l.query_id, d.query_id) AS query_id,
         coalesce(l.doc_id, d.doc_id) AS doc_id,
         l.lex_rank, d.dense_rank,
         coalesce(1.0 / ({_RRF_K} + l.lex_rank), 0.0)
           + coalesce(1.0 / ({_RRF_K} + d.dense_rank), 0.0) AS rrf
  FROM lex l FULL OUTER JOIN dense d
    ON l.query_id = d.query_id AND l.doc_id = d.doc_id
)
SELECT query_id, doc_id, lex_rank, dense_rank,
       round(rrf, 6) AS rrf_score,
       CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY rrf DESC, doc_id) AS BIGINT) AS fused_rank
FROM fused
QUALIFY fused_rank <= {_RRF_TOP_K}
"""


@query(
    "retrieval_rrf_hybrid_topk",
    sql=_RRF_SQL,
    tags=("text", "retrieval", "hybrid"),
)
def retrieval_rrf_hybrid_topk(spark, sf_dir):
    """RRF hybrid retrieval (BM25 ∪ exact-cosine, k=60) — see block
    comment."""
    from pyspark.sql import Window

    from ..operators import similarity as S
    from ..sources import read_table as _rt

    lex = retrieval_bm25_topk(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rank").alias("lex_rank")
    ).where(F.col("lex_rank") <= _RRF_TOP_K)

    emb = _rt(spark, sf_dir, "embeddings")
    dense = S.brute_force_topk(
        emb, emb.where(F.col("vec_id").isin(1, 2, 3)), k=_RRF_TOP_K
    ).select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").cast("long").alias("dense_rank"),
    )

    fused = lex.join(dense, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        "lex_rank",
        "dense_rank",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(_RRF_K) + F.col("lex_rank")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(_RRF_K) + F.col("dense_rank")), F.lit(0.0)
            )
        ).alias("rrf"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("doc_id")
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w).cast("long"))
        .where(F.col("fused_rank") <= _RRF_TOP_K)
        .select(
            "query_id",
            "doc_id",
            "lex_rank",
            "dense_rank",
            F.round("rrf", 6).alias("rrf_score"),
            "fused_rank",
        )
    )


# --- code-like document share ------------------------------------------------
# The code-vs-prose router every training-data pipeline needs: a
# deterministic symbol-density heuristic (share of {}();=<>[]# chars)
# with a fixed threshold routes docs to the code or prose pipeline.  The
# synthetic corpus is pure prose (symbol ratio 0.0 on every doc), so the
# fixture plants code-ified variants of every 23rd doc (spaces replaced
# by ' ; ', ratio ~0.15) that the threshold must catch — same planted-
# role pattern as the dedup fixtures.  Exact integer char counts; one
# map pass + one source-keyed aggregate.

_CODE_SYM = r"[{}();=<>\[\]#]"
_CODE_T = 0.02

_CODE_SHARE_SQL = rf"""
WITH corpus AS (
  SELECT source, doc_id, text FROM documents
  UNION ALL
  SELECT source, doc_id + 5000000 AS doc_id,
         replace(text, ' ', ' ; ') AS text
  FROM documents WHERE doc_id % 23 = 0
),
scored AS (
  SELECT source,
         (length(text) - length(regexp_replace(text, '{_CODE_SYM}', '', 'g')))
           ::DOUBLE / length(text) AS sr
  FROM corpus WHERE length(text) > 0
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(CASE WHEN sr >= {_CODE_T} THEN 1 END) AS BIGINT)
         AS n_code_like,
       round(CAST(count(CASE WHEN sr >= {_CODE_T} THEN 1 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS code_share,
       round(CAST(sum(CAST(round(sr, 6) AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS avg_symbol_ratio
FROM scored GROUP BY source
"""


@query("text_code_like_share", sql=_CODE_SHARE_SQL, tags=("text", "routing"))
def text_code_like_share(spark, sf_dir):
    """Code-vs-prose routing share per source — see block comment."""
    docs = read_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "text"
    )
    variants = docs.where(F.col("doc_id") % 23 == 0).select(
        "source",
        (F.col("doc_id") + 5000000).alias("doc_id"),
        F.regexp_replace(F.col("text"), " ", " ; ").alias("text"),
    )
    corpus = docs.unionByName(variants).where(F.length("text") > 0)
    sr = (
        F.length("text")
        - F.length(F.regexp_replace(F.col("text"), _CODE_SYM, ""))
    ).cast("double") / F.length("text").cast("double")
    scored = corpus.select("source", sr.alias("sr"))
    code = F.count(F.when(F.col("sr") >= _CODE_T, 1))
    return scored.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        code.cast("long").alias("n_code_like"),
        F.round(code.cast("double") / F.count("*").cast("double"), 6).alias(
            "code_share"
        ),
        F.round(
            F.sum(F.round(F.col("sr"), 6).cast("decimal(18,6)")).cast("double")
            / F.count("*").cast("double"),
            6,
        ).alias("avg_symbol_ratio"),
    )
