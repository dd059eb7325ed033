"""Edge-case tests for the curation text operators (PII redaction,
repetition ratio) on crafted inputs the fixture corpus can't cover."""

import pyspark.sql.functions as F

from big_data_analytics_project_spark.operators import text as T


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_redact_pii_masks_and_counts(spark):
    texts = [
        "mail me at alice@example.com today",
        "see https://example.org/a?x=1 and http://ex.io/b",
        "both bob@ex.co https://ex.co/path end",
        "no pii here",
    ]
    n_emails, n_urls = T.pii_counts(F.col("text"))
    out = _df(spark, texts).select(
        "doc_id", n_emails.alias("e"), n_urls.alias("u"),
        T.redact_pii(F.col("text")).alias("r"),
    ).collect()
    rows = {r.doc_id: r for r in out}
    assert (rows[0].e, rows[0].u) == (1, 0)
    assert rows[0].r == "mail me at <EMAIL> today"
    assert (rows[1].e, rows[1].u) == (0, 2)
    assert rows[1].r == "see <URL> and <URL>"
    assert (rows[2].e, rows[2].u) == (1, 1)
    assert rows[2].r == "both <EMAIL> <URL> end"
    assert (rows[3].e, rows[3].u) == (0, 0)
    assert rows[3].r == "no pii here"


def test_redact_pii_mixed_case(spark):
    """Mixed-case emails/URLs are PII too — (?i) must catch them in both
    the redaction and the counts (and DuckDB's RE2 agrees, so the oracle
    query stays hash-green)."""
    texts = [
        "reach Alice@Example.COM now",
        "go to HTTPS://Example.ORG/Path today",
        "mixed Bob@EX.io and HtTp://ex.IO/q end",
    ]
    n_emails, n_urls = T.pii_counts(F.col("text"))
    out = _df(spark, texts).select(
        "doc_id", n_emails.alias("e"), n_urls.alias("u"),
        T.redact_pii(F.col("text")).alias("r"),
    ).collect()
    rows = {r.doc_id: r for r in out}
    assert (rows[0].e, rows[0].u) == (1, 0)
    assert rows[0].r == "reach <EMAIL> now"
    assert (rows[1].e, rows[1].u) == (0, 1)
    assert rows[1].r == "go to <URL> today"
    assert (rows[2].e, rows[2].u) == (1, 1)
    assert rows[2].r == "mixed <EMAIL> and <URL> end"


def test_redact_pii_is_idempotent(spark):
    texts = ["x alice@example.com y https://e.io/z", "plain"]
    once = T.redact_pii(F.col("text"))
    twice = T.redact_pii(once)
    out = _df(spark, texts).select(once.alias("a"), twice.alias("b")).collect()
    for r in out:
        assert r.a == r.b


def test_shingles_empty_for_short_docs(spark):
    """Docs shorter than n tokens must shingle to an empty array, not
    crash (Spark's sequence(1, m) descends through 0 when m < 1)."""
    from big_data_analytics_project_spark.operators.dedup import shingles, tokens

    out = _df(spark, ["one two", "a", "", "one two three"]).select(
        "doc_id", shingles(tokens(F.col("text")), 3).alias("s")
    ).collect()
    sizes = {r.doc_id: len(r.s) for r in out}
    assert sizes == {0: 0, 1: 0, 2: 0, 3: 1}


def test_repetition_ratio_bounds_and_null(spark):
    texts = [
        "a b c a b c a b c",      # heavy repetition of the same 3-grams
        "one two three four five", # all distinct 3-grams
        "too short",               # < 3 tokens -> null
    ]
    toks = T.ws_tokens(F.col("text"))
    out = _df(spark, texts).select(
        "doc_id", T.ngram_repetition_ratio(toks, 3).alias("r")
    ).collect()
    rows = {r.doc_id: r.r for r in out}
    # 7 grams, 3 distinct -> 4/7
    assert abs(rows[0] - 4 / 7) < 1e-12
    assert rows[1] == 0.0
    assert rows[2] is None
