"""Explicit StructType schemas for every source table.

The reference infers all schemas from parquet footers (SURVEY.md §1.4);
at 100 TB that costs a footer-listing pass per job and silently admits
schema drift. Every read in this engine goes through these declarations.

Two groups:
  * the driver-generated TPC-H-ish testdata tables (TESTDATA.md),
  * the reference-shaped messenger geo-event model (SURVEY.md §1.2) for
    users who bring data in the reference's own layout.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Driver testdata tables (/root/testdata/sf*/). Types verified against the
# parquet footers (FIXTURES.md §A).
# ---------------------------------------------------------------------------

REGION = T.StructType([
    T.StructField("r_regionkey", T.IntegerType(), False),
    T.StructField("r_name", T.StringType(), False),
])

NATION = T.StructType([
    T.StructField("n_nationkey", T.IntegerType(), False),
    T.StructField("n_name", T.StringType(), False),
    T.StructField("n_regionkey", T.IntegerType(), False),
])

CUSTOMER = T.StructType([
    T.StructField("c_custkey", T.LongType(), False),
    T.StructField("c_name", T.StringType(), False),
    T.StructField("c_nationkey", T.IntegerType(), False),
    T.StructField("c_acctbal", T.DoubleType(), False),
    T.StructField("c_mktsegment", T.StringType(), False),
])

SUPPLIER = T.StructType([
    T.StructField("s_suppkey", T.LongType(), False),
    T.StructField("s_name", T.StringType(), False),
    T.StructField("s_nationkey", T.IntegerType(), False),
    T.StructField("s_acctbal", T.DoubleType(), False),
])

PART = T.StructType([
    T.StructField("p_partkey", T.LongType(), False),
    T.StructField("p_name", T.StringType(), False),
    T.StructField("p_brand", T.StringType(), False),
    T.StructField("p_type", T.StringType(), False),
    T.StructField("p_size", T.IntegerType(), False),
    T.StructField("p_retailprice", T.DoubleType(), False),
])

ORDERS = T.StructType([
    T.StructField("o_orderkey", T.LongType(), False),
    T.StructField("o_custkey", T.LongType(), False),
    T.StructField("o_orderstatus", T.StringType(), False),
    T.StructField("o_totalprice", T.DoubleType(), False),
    T.StructField("o_orderdate", T.TimestampType(), False),
    T.StructField("o_orderpriority", T.StringType(), False),
])

LINEITEM = T.StructType([
    T.StructField("l_orderkey", T.LongType(), False),
    T.StructField("l_partkey", T.LongType(), False),
    T.StructField("l_suppkey", T.LongType(), False),
    T.StructField("l_linenumber", T.IntegerType(), False),
    T.StructField("l_quantity", T.DoubleType(), False),
    T.StructField("l_extendedprice", T.DoubleType(), False),
    T.StructField("l_discount", T.DoubleType(), False),
    T.StructField("l_tax", T.DoubleType(), False),
    T.StructField("l_returnflag", T.StringType(), False),
    T.StructField("l_linestatus", T.StringType(), False),
    T.StructField("l_shipdate", T.TimestampType(), False),
])

EVENTS = T.StructType([
    T.StructField("event_id", T.LongType(), False),
    T.StructField("ts", T.TimestampType(), False),
    T.StructField("user_id", T.LongType(), False),
    T.StructField("event_type", T.StringType(), False),
    T.StructField("value", T.DoubleType(), False),
    T.StructField("props", T.StringType(), True),  # JSON, e.g. {"k": 87}
])

# Physical read schema for events when ts is parquet TIMESTAMP(NANOS), which
# Spark only reads as epoch-nanos long (spark.sql.legacy.parquet.nanosAsLong).
# sources.io.read_table sniffs the footer (events_ts_is_nanos) and applies
# this schema + long->timestamp conversion only when the file needs it;
# TIMESTAMP(MICROS) files read directly with the logical EVENTS schema.
EVENTS_PHYSICAL = T.StructType([
    T.StructField("event_id", T.LongType(), False),
    T.StructField("ts", T.LongType(), False),
    T.StructField("user_id", T.LongType(), False),
    T.StructField("event_type", T.StringType(), False),
    T.StructField("value", T.DoubleType(), False),
    T.StructField("props", T.StringType(), True),
])

DOCUMENTS = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField("n_chars", T.LongType(), True),
])

EMBEDDINGS = T.StructType([
    T.StructField("vec_id", T.LongType(), False),
    T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    T.StructField("label", T.IntegerType(), True),
])

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
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

# ---------------------------------------------------------------------------
# Reference-shaped messenger model (SURVEY.md §1.2; column accesses cited
# from reference src/scripts/project_step_{1,2,3}.py). Declared so users of
# the reference's data layout can point this engine at the same parquet.
# ---------------------------------------------------------------------------

GEO_EVENT_STRUCT = T.StructType([
    T.StructField("message_from", T.LongType(), True),
    T.StructField("message_to", T.LongType(), True),
    T.StructField("message_id", T.LongType(), True),
    T.StructField("message_ts", T.TimestampType(), True),
    T.StructField("datetime", T.TimestampType(), True),
    T.StructField("reaction_from", T.LongType(), True),
    T.StructField("user", T.LongType(), True),
    T.StructField("subscription_channel", T.LongType(), True),
])

GEO_EVENTS = T.StructType([
    T.StructField("event", GEO_EVENT_STRUCT, True),
    T.StructField("event_type", T.StringType(), False),
    T.StructField("lat", T.DoubleType(), True),
    T.StructField("lon", T.DoubleType(), True),
    T.StructField("date", T.StringType(), True),  # Hive partition col YYYY-MM-DD
])

GEO_CITIES = T.StructType([
    T.StructField("id", T.IntegerType(), False),
    T.StructField("city", T.StringType(), False),
    T.StructField("lat", T.DoubleType(), False),
    T.StructField("lon", T.DoubleType(), False),
])
