"""Explicit StructTypes for every table the engine reads.

The reference relies on ``inferSchema=True`` for batch CSV
(``src/spark/preprocessing.py:32``) — which both double-scans the input and
mis-types ``event_time`` as string (SURVEY §1.4).  Policy here: explicit
schemas everywhere; inference is opt-in ingest convenience only.

Two families:
 A. Reference-shaped clickstream schema (``src/streaming/stream_processor.py:50-61``,
    ``src/streaming/config.py:144-156``).
 B. Driver fixture tables (/root/testdata/sf*/ — see FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# -- A. reference clickstream ------------------------------------------------

# Timestamp strings look like "2019-10-01 00:00:00 UTC"
# (format at reference src/streaming/config.py:156).
EVENT_TIME_FORMAT = "yyyy-MM-dd HH:mm:ss 'UTC'"

CLICKSTREAM_RAW = StructType(
    [
        StructField("event_time", StringType()),  # parsed via EVENT_TIME_FORMAT at ingest
        StructField("event_type", StringType()),
        StructField("product_id", LongType()),
        StructField("category_id", LongType()),
        StructField("category_code", StringType()),
        StructField("brand", StringType()),
        StructField("price", DoubleType()),
        StructField("user_id", LongType()),
        StructField("user_session", StringType()),
    ]
)

SESSION_FEATURES = StructType(
    [
        StructField("user_session", StringType()),
        StructField("label", LongType()),
        StructField("view_count", LongType()),
        StructField("cart_count", LongType()),
        StructField("session_duration", LongType()),
        StructField("avg_price", DoubleType()),
        StructField("max_price", DoubleType()),
        StructField("unique_items", LongType()),
    ]
)

# -- B. driver fixture tables ------------------------------------------------

REGION = StructType(
    [StructField("r_regionkey", IntegerType()), StructField("r_name", StringType())]
)

NATION = StructType(
    [
        StructField("n_nationkey", IntegerType()),
        StructField("n_name", StringType()),
        StructField("n_regionkey", IntegerType()),
    ]
)

CUSTOMER = StructType(
    [
        StructField("c_custkey", LongType()),
        StructField("c_name", StringType()),
        StructField("c_nationkey", IntegerType()),
        StructField("c_acctbal", DoubleType()),
        StructField("c_mktsegment", StringType()),
    ]
)

SUPPLIER = StructType(
    [
        StructField("s_suppkey", LongType()),
        StructField("s_name", StringType()),
        StructField("s_nationkey", IntegerType()),
        StructField("s_acctbal", DoubleType()),
    ]
)

PART = StructType(
    [
        StructField("p_partkey", LongType()),
        StructField("p_name", StringType()),
        StructField("p_brand", StringType()),
        StructField("p_type", StringType()),
        StructField("p_size", IntegerType()),
        StructField("p_retailprice", DoubleType()),
    ]
)

ORDERS = StructType(
    [
        StructField("o_orderkey", LongType()),
        StructField("o_custkey", LongType()),
        StructField("o_orderstatus", StringType()),
        StructField("o_totalprice", DoubleType()),
        StructField("o_orderdate", TimestampType()),
        StructField("o_orderpriority", StringType()),
    ]
)

LINEITEM = StructType(
    [
        StructField("l_orderkey", LongType()),
        StructField("l_partkey", LongType()),
        StructField("l_suppkey", LongType()),
        StructField("l_linenumber", IntegerType()),
        StructField("l_quantity", DoubleType()),
        StructField("l_extendedprice", DoubleType()),
        StructField("l_discount", DoubleType()),
        StructField("l_tax", DoubleType()),
        StructField("l_returnflag", StringType()),
        StructField("l_linestatus", StringType()),
        StructField("l_shipdate", TimestampType()),
    ]
)

EVENTS = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),  # JSON, e.g. {"k": 87}
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)

FIXTURE_TABLES: dict[str, StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# JSON payload schema for events.props
EVENT_PROPS = StructType([StructField("k", LongType())])
