"""Fixed schemas for the reference's seven input beans plus the
driver's synthetic testdata tables.

The reference declares schemas as Java bean classes with positional
CSV parsing (SURVEY.md section 1.2); here they are explicit
StructTypes. Timestamps are normalized to TimestampType at read time
(reference keeps epoch seconds and multiplies to ms in the watermark
extractor, e.g. hot-items-analysis HotItem.java:65).

Reference bean sources:
- UserBehavior.java:11-15      -> USER_BEHAVIOR
- ApacheLogEvent.java:10-14    -> APACHE_LOG_EVENT
- MarketingUserBehavior.java:10-13 -> MARKETING_USER_BEHAVIOR
- AdClickEvent.java:10-14      -> AD_CLICK_EVENT
- LoginEvent.java:10-13        -> LOGIN_EVENT
- OrderEvent.java:10-13        -> ORDER_EVENT
- ReceiptEvent.java:10-12      -> RECEIPT_EVENT
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- raw CSV schemas (epoch seconds / ms kept as long; readers convert) ---

USER_BEHAVIOR_RAW = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("item_id", T.LongType(), False),
        T.StructField("category_id", T.IntegerType(), True),
        T.StructField("behavior", T.StringType(), False),  # pv|buy|cart|fav
        T.StructField("ts_sec", T.LongType(), False),
    ]
)

MARKETING_USER_BEHAVIOR_RAW = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("behavior", T.StringType(), False),  # CLICK|DOWNLOAD|INSTALL|UNINSTALL
        T.StructField("channel", T.StringType(), False),
        T.StructField("ts_ms", T.LongType(), False),
    ]
)

AD_CLICK_EVENT_RAW = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("ad_id", T.LongType(), False),
        T.StructField("province", T.StringType(), False),
        T.StructField("city", T.StringType(), True),
        T.StructField("ts_sec", T.LongType(), False),
    ]
)

LOGIN_EVENT_RAW = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("ip", T.StringType(), True),
        T.StructField("login_state", T.StringType(), False),  # success|fail
        T.StructField("ts_sec", T.LongType(), False),
    ]
)

ORDER_EVENT_RAW = T.StructType(
    [
        T.StructField("order_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),  # create|pay
        T.StructField("tx_id", T.StringType(), True),  # "" on create
        T.StructField("ts_sec", T.LongType(), False),
    ]
)

RECEIPT_EVENT_RAW = T.StructType(
    [
        T.StructField("tx_id", T.StringType(), False),
        T.StructField("pay_channel", T.StringType(), True),  # wechat|alipay
        T.StructField("ts_sec", T.LongType(), False),
    ]
)

# --- driver testdata tables (/root/testdata/sf*/; see TESTDATA.md) ---

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),  # JSON, e.g. {"k": 87}
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        T.StructField("label", T.IntegerType(), True),
    ]
)
