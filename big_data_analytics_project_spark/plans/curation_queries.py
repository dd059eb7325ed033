"""Training-data curation registrations: deterministic sampling, sequence
packing, embedding quantization — the storage/split/shard operators a
100 TB pretraining pipeline runs after dedup/quality filtering.

All three are fully oracle-checked: the sampling hash is the
engine-portable md5-60-bit hash, packing is a window cumsum, and
quantization rounds via floor(x+0.5) — every step chosen to be
bit-reproducible across engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..operators import packing as PK
from ..operators import sampling as S
from ..operators.embeddings import absmax_scale, quantize_int8
from ..registry import query
from ..sources import read_table
from ._duck import hash60

# --- deterministic stratified sampling ------------------------------------

_RATES = {"purchase": 60, "cart": 30}
_DEFAULT_PCT = 10

_SAMPLE_SQL = f"""
WITH hashed AS (
  SELECT event_id, user_id, event_type, value,
         {hash60("CAST(event_id AS VARCHAR)")} % 100 AS bucket
  FROM events
)
SELECT event_id, user_id, event_type,
       CAST(bucket AS BIGINT) AS bucket
FROM hashed
WHERE bucket < CASE event_type
                 WHEN 'purchase' THEN {_RATES["purchase"]}
                 WHEN 'cart' THEN {_RATES["cart"]}
                 ELSE {_DEFAULT_PCT} END
"""


@query("sample_hash_stratified", sql=_SAMPLE_SQL, tags=("sampling", "curation"))
def sample_hash_stratified(spark, sf_dir):
    """Deterministic stratified sampling: keep 60% of rare purchases, 30%
    of carts, 10% of everything else, membership decided ONLY by an
    engine-portable hash of the row key (operators/sampling.py) — the
    split is identical across engines, re-runs, repartitions, and late
    arrivals, unlike seeded-RNG sample().  Map-only, no shuffle."""
    ev = read_table(spark, sf_dir, "events")
    sampled = S.stratified_hash_sample(
        ev, key=F.col("event_id"), stratum=F.col("event_type"),
        rates=_RATES, default_pct=_DEFAULT_PCT,
    )
    return sampled.select(
        "event_id", "user_id", "event_type",
        S.hash_bucket(F.col("event_id")).alias("bucket"),
    )


# --- sequence packing -----------------------------------------------------

_PACK_BUDGET = 2048

_PACK_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
  FROM documents
),
packed AS (
  SELECT doc_id, lang, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS start
  FROM toks
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(floor(start / {_PACK_BUDGET}) AS BIGINT) AS bin_id,
       CAST(start AS BIGINT) AS bin_offset_tokens
FROM packed
"""


@query("pack_token_budget_bins", sql=_PACK_SQL, tags=("packing", "curation"))
def pack_token_budget_bins(spark, sf_dir):
    """LLM context-window packing: documents assigned to {_PACK_BUDGET}-token
    bins per language shard via linear packing (one window cumsum — a
    document starts in the bin where its first token lands;
    operators/packing.py).  One shuffle on the shard key, no global sort;
    the assignment is deterministic so every re-run shards identically."""
    docs = read_table(spark, sf_dir, "documents")
    with_tokens = docs.select(
        "doc_id", "lang", PK.whitespace_token_count(F.col("text")).alias("n_tokens")
    )
    packed = PK.pack_linear(
        with_tokens, shard_col="lang", order_col="doc_id",
        tokens_col="n_tokens", budget=_PACK_BUDGET,
    )
    return packed.select("doc_id", "lang", "n_tokens", "bin_id", "bin_offset_tokens")


# --- embedding int8 quantization ------------------------------------------

_QUANT_SQL = """
WITH scaled AS (
  SELECT vec_id,
         list_max(list_transform(embedding,
                                 x -> abs(CAST(x AS DOUBLE)))) AS scale,
         embedding
  FROM embeddings
), quantized AS (
  SELECT vec_id, scale,
         list_transform(embedding,
           x -> CAST(CASE WHEN scale = 0 THEN 0
                          ELSE floor(127.0 * CAST(x AS DOUBLE) / scale + 0.5)
                     END AS BIGINT)) AS q
  FROM scaled
)
SELECT vec_id, scale,
       CAST(unnest(range(len(q))) AS BIGINT) AS pos,
       unnest(q) AS code
FROM quantized
"""


@query("embedding_quantize_int8", sql=_QUANT_SQL, tags=("embedding", "curation"))
def embedding_quantize_int8(spark, sf_dir):
    """Symmetric per-vector int8 quantization of the embedding corpus
    (4× storage; operators/embeddings.py) — all higher-order array
    functions, map-only at scan speed.  Rounding is floor(x+0.5) for
    cross-engine determinism; codes are checked element-exact vs DuckDB.
    Output is flattened to (vec_id, scale, pos, code) scalar rows: the
    driver's canonicalizer factorizes column values for order-insensitive
    hashing, and array cells are unhashable there (r5 advice)."""
    emb = read_table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "vec_id", absmax_scale(F.col("embedding")).alias("scale"), "embedding"
        )
        .select(
            "vec_id",
            "scale",
            F.posexplode(quantize_int8(F.col("embedding"), F.col("scale"))).alias(
                "pos", "code"
            ),
        )
        .select("vec_id", "scale", F.col("pos").cast("bigint").alias("pos"), "code")
    )


# --- z-order clustering ---------------------------------------------------

# Explicit quantization ranges (constants shared by both engines; valid
# for every fixture SF — clamped beyond them).  Events span Jan 2024.
_Z_USER_LO, _Z_USER_HI = 0, 2_048
_Z_TS_LO, _Z_TS_HI = 1_704_067_200, 1_706_745_600  # 2024-01-01 .. 2024-02-01
_Z_BITS = 16


def _duck_quant(expr: str, lo: int, hi: int) -> str:
    return (
        f"CAST(floor((least(greatest({expr}, {lo}), {hi}) - {lo})"
        f" * {(1 << _Z_BITS) - 1} / {hi - lo}) AS BIGINT)"
    )


def _zorder_sql() -> str:
    from ..operators.zorder import duck_zvalue

    qu = _duck_quant("user_id", _Z_USER_LO, _Z_USER_HI)
    qt = _duck_quant(
        "CAST(floor(epoch(ts)) AS BIGINT)", _Z_TS_LO, _Z_TS_HI
    )
    return f"""
    SELECT event_id, {duck_zvalue([qu, qt], _Z_BITS)} AS zval
    FROM events
    """


@query("zorder_code_events", sql=_zorder_sql(), tags=("zorder", "layout"))
def zorder_code_events(spark, sf_dir):
    """Morton z-codes over (user_id, event time) — the clustering key for
    multi-dimensional data skipping (operators/zorder.py; Delta/Iceberg
    OPTIMIZE ZORDER rebuilt on plain parquet).  Pure codegen'd bit
    arithmetic from explicit quantization ranges, so the layout is a
    deterministic function of the row; the skipping benefit (per-file
    bounding boxes shrink in BOTH dimensions) is pinned in
    tests/test_zorder.py."""
    from ..operators.zorder import quantize, zvalue

    ev = read_table(spark, sf_dir, "events")
    qu = quantize(F.col("user_id"), _Z_USER_LO, _Z_USER_HI, _Z_BITS)
    qt = quantize(
        F.unix_timestamp("ts"), _Z_TS_LO, _Z_TS_HI, _Z_BITS
    )
    return ev.select("event_id", zvalue([qu, qt], _Z_BITS).alias("zval"))


# --- SCD2 dimension merge -------------------------------------------------

_SCD_T0, _SCD_T1 = 1_704_067_200, 1_706_745_600  # initial load / update batch

_SCD_SQL = f"""
WITH current AS (
  SELECT c_custkey, c_mktsegment,
         CAST({_SCD_T0} AS BIGINT) AS valid_from_epoch,
         CAST(NULL AS BIGINT) AS valid_to_epoch
  FROM customer
),
upd AS (
  SELECT c_custkey, 'MOBILE' AS new_seg FROM customer WHERE c_custkey % 7 = 0
),
joined AS (
  SELECT c.*, u.new_seg FROM current c LEFT JOIN upd u USING (c_custkey)
)
SELECT c_custkey, c_mktsegment, valid_from_epoch, valid_to_epoch
FROM joined WHERE new_seg IS NULL OR new_seg = c_mktsegment
UNION ALL
SELECT c_custkey, c_mktsegment, valid_from_epoch,
       CAST({_SCD_T1} AS BIGINT) AS valid_to_epoch
FROM joined WHERE new_seg IS NOT NULL AND new_seg != c_mktsegment
UNION ALL
SELECT c_custkey, new_seg AS c_mktsegment,
       CAST({_SCD_T1} AS BIGINT) AS valid_from_epoch,
       CAST(NULL AS BIGINT) AS valid_to_epoch
FROM joined WHERE new_seg IS NOT NULL AND new_seg != c_mktsegment
"""


@query("scd2_customer_segments", sql=_SCD_SQL, tags=("scd", "dimension", "curation"))
def scd2_customer_segments(spark, sf_dir):
    """SCD2 dimension merge (operators/scd.py): the customer dimension is
    loaded as all-open history rows, then an update batch (every 7th
    customer moves to segment 'MOBILE') is applied — changed keys get
    their open row closed and a new open row appended, unchanged keys
    pass through.  One equi-join shuffle + shuffle-free projections; the
    oracle is the equivalent relational CASE-split."""
    from ..operators.scd import scd2_merge

    cust = read_table(spark, sf_dir, "customer")
    current = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.lit(_SCD_T0).cast("long").alias("valid_from_epoch"),
        F.lit(None).cast("long").alias("valid_to_epoch"),
    )
    updates = cust.where(F.col("c_custkey") % 7 == 0).select(
        "c_custkey", F.lit("MOBILE").alias("c_mktsegment")
    )
    return scd2_merge(
        current, updates, key="c_custkey", attr="c_mktsegment",
        effective_epoch=_SCD_T1,
    )


# --- unpivot / melt -------------------------------------------------------

_UNPIVOT_SQL = """
SELECT l_orderkey, l_linenumber, measure, value
FROM (
  SELECT l_orderkey, l_linenumber,
         l_quantity, l_extendedprice, l_discount, l_tax
  FROM lineitem
)
UNPIVOT (value FOR measure IN (l_quantity, l_extendedprice, l_discount, l_tax))
"""


@query("unpivot_lineitem_measures", sql=_UNPIVOT_SQL, tags=("reshape", "unpivot"))
def unpivot_lineitem_measures(spark, sf_dir):
    """Wide→long reshape (melt): the four lineitem measures unpivoted to
    (measure, value) rows — the inverse of pivot_event_counts, map-only
    (each input row expands to 4 output rows in place, no shuffle)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    ).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "value",
    )


# --- data-quality audit ---------------------------------------------------

_DQ_SQL = """
SELECT 'events_value_not_null' AS rule,
       count(CASE WHEN value IS NULL THEN 1 END) AS n_violations FROM events
UNION ALL
SELECT 'events_event_id_unique',
       (SELECT count(*) FROM (
          SELECT event_id FROM events GROUP BY event_id HAVING count(*) > 1))
UNION ALL
SELECT 'events_type_enum',
       count(CASE WHEN event_type IS NOT NULL
                   AND NOT regexp_full_match(event_type, '[a-z_]+')
             THEN 1 END) FROM events
UNION ALL
SELECT 'lineitem_quantity_range',
       count(CASE WHEN l_quantity IS NOT NULL
                   AND (l_quantity < 1 OR l_quantity > 50) THEN 1 END)
FROM lineitem
UNION ALL
SELECT 'orders_custkey_fk',
       (SELECT count(*) FROM orders o
        WHERE o.o_custkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey))
"""


@query("dq_constraint_audit", sql=_DQ_SQL, tags=("quality", "audit", "curation"))
def dq_constraint_audit(spark, sf_dir):
    """Declarative data-quality gate (operators/quality.py): five
    constraint rules — null check, key uniqueness, enum/regex shape,
    numeric range, and referential integrity — each reduced to a
    violation COUNT so the audit output stays driver-sized at any data
    scale.  The fixtures ship real nulls in events.value, so the audit
    exercises a genuinely failing rule alongside passing ones."""
    from ..operators import quality as Q

    ev = read_table(spark, sf_dir, "events")
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    return Q.audit([
        # both events predicate rules fused into ONE scan
        Q.predicate_rules(ev, [
            ("events_value_not_null", Q.not_null("value")),
            ("events_type_enum", Q.matches("event_type", "[a-z_]+")),
        ]),
        Q.unique("events_event_id_unique", ev, ["event_id"]),
        Q.predicate_rules(li, [
            ("lineitem_quantity_range", Q.in_range("l_quantity", 1, 50)),
        ]),
        Q.references("orders_custkey_fk", orders, "o_custkey", cust, "c_custkey"),
    ])


# --- document chunking ----------------------------------------------------

_CHUNK_TOKENS, _CHUNK_OVERLAP = 64, 16
_CHUNK_STRIDE = _CHUNK_TOKENS - _CHUNK_OVERLAP

_CHUNK_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
sized AS (
  SELECT doc_id, t, len(t) AS n,
         1 + CAST(ceil(greatest(len(t) - {_CHUNK_TOKENS}, 0)
                       / {_CHUNK_STRIDE}) AS INT) AS n_chunks
  FROM toks
)
SELECT doc_id,
       CAST(chunk_id AS INT) AS chunk_id,
       CAST(chunk_id * {_CHUNK_STRIDE} AS BIGINT) AS chunk_start_token,
       array_to_string(t[chunk_id * {_CHUNK_STRIDE} + 1 :
                         chunk_id * {_CHUNK_STRIDE} + {_CHUNK_TOKENS}], ' ')
         AS chunk_text,
       least({_CHUNK_TOKENS}, n - chunk_id * {_CHUNK_STRIDE})::BIGINT
         AS chunk_n_tokens
-- chunk-id list derived per row from n_chunks (no fixed 10k cap — r5 advice)
FROM (SELECT doc_id, t, n, unnest(range(0, n_chunks)) AS chunk_id FROM sized)
"""


@query("chunk_long_documents", sql=_CHUNK_SQL, tags=("chunking", "curation"))
def chunk_long_documents(spark, sf_dir):
    """Long-document chunking (operators/packing.py::chunk_documents):
    each doc split into {_CHUNK_TOKENS}-token windows with
    {_CHUNK_OVERLAP}-token overlap — the other half of context-window
    prep (packing joins short docs, chunking splits long ones).
    Map-only explode + array slice, no shuffle; chunk boundaries are a
    pure function of the token count, mirrored exactly in DuckDB."""
    from ..operators.packing import chunk_documents

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = chunk_documents(docs, "text", _CHUNK_TOKENS, _CHUNK_OVERLAP)
    return out.select(
        "doc_id", "chunk_id", "chunk_start_token", "chunk_text", "chunk_n_tokens"
    )
