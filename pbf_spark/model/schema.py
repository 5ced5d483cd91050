"""Spark + Arrow schemas for the engine's tables.

Data model per SURVEY.md §1.2: one unified entity DataFrame (discriminator
column ``entity_type``) instead of three per-type frames, mirroring the
reference's single decode pass emitting all types in file order
(/root/reference/internal/decoder/primitive.go:36-41). Tags are stored as
``array<struct<key,value>>`` in WIRE ORDER — decode does not reorder. The
encoder canonicalizes to key-sorted order on write (same as the reference:
/root/reference/internal/encoder/primitive.go:282-297), so the
sorted-tags invariant holds for self-encoded files only; round-trip digest
tests canonicalize tags before hashing for that reason.
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# entity table (decode output)
# ---------------------------------------------------------------------------

TAG_STRUCT = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
    ]
)

MEMBER_STRUCT = T.StructType(
    [
        T.StructField("ref", T.LongType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("role", T.StringType(), True),
    ]
)

INFO_STRUCT = T.StructType(
    [
        T.StructField("version", T.IntegerType(), True),
        T.StructField("uid", T.IntegerType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("changeset", T.LongType(), True),
        T.StructField("user", T.StringType(), True),
        T.StructField("visible", T.BooleanType(), True),
    ]
)

ENTITY_SCHEMA = T.StructType(
    [
        T.StructField("entity_type", T.StringType(), False),
        T.StructField("id", T.LongType(), False),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("lon", T.DoubleType(), True),
        # full nano-degrees (offset + granularity*coord): bit-exact tile math
        T.StructField("lat_nano", T.LongType(), True),
        T.StructField("lon_nano", T.LongType(), True),
        T.StructField("tags", T.ArrayType(TAG_STRUCT, False), True),
        T.StructField("refs", T.ArrayType(T.LongType(), False), True),
        T.StructField("members", T.ArrayType(MEMBER_STRUCT, False), True),
        T.StructField("info", INFO_STRUCT, True),
        # provenance back to the interleaved document table
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("span_idx", T.IntegerType(), True),
        T.StructField("blob_seq", T.LongType(), True),
    ]
)

ENTITY_ARROW_SCHEMA = pa.schema(
    [
        pa.field("entity_type", pa.string(), False),
        pa.field("id", pa.int64(), False),
        pa.field("lat", pa.float64()),
        pa.field("lon", pa.float64()),
        pa.field("lat_nano", pa.int64()),
        pa.field("lon_nano", pa.int64()),
        pa.field(
            "tags",
            pa.list_(
                pa.struct([pa.field("key", pa.string(), False), pa.field("value", pa.string())])
            ),
        ),
        pa.field("refs", pa.list_(pa.int64())),
        pa.field(
            "members",
            pa.list_(
                pa.struct(
                    [
                        pa.field("ref", pa.int64(), False),
                        pa.field("type", pa.string(), False),
                        pa.field("role", pa.string()),
                    ]
                )
            ),
        ),
        pa.field(
            "info",
            pa.struct(
                [
                    pa.field("version", pa.int32()),
                    pa.field("uid", pa.int32()),
                    pa.field("ts", pa.timestamp("us", tz="UTC")),
                    pa.field("changeset", pa.int64()),
                    pa.field("user", pa.string()),
                    pa.field("visible", pa.bool_()),
                ]
            ),
        ),
        pa.field("doc_id", pa.string()),
        pa.field("span_idx", pa.int32()),
        pa.field("blob_seq", pa.int64()),
    ]
)

# ---------------------------------------------------------------------------
# interleaved document table (north-rule input, BASELINE.json input_hint)
# ---------------------------------------------------------------------------

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT, False), False),
    ]
)

MEDIA_BLOB_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("blob_seq", T.LongType(), False),
        T.StructField("blob_type", T.StringType(), False),
        T.StructField("codec", T.StringType(), False),
        T.StructField("raw_size", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

# decode input: joined spans × blobs (what the decode UDF consumes)
DECODE_INPUT_ARROW_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("span_idx", pa.int32()),
        pa.field("blob_seq", pa.int64()),
        pa.field("blob_type", pa.string()),
        pa.field("codec", pa.string()),
        pa.field("raw_size", pa.int32()),
        pa.field("payload", pa.binary()),
    ]
)

# ---------------------------------------------------------------------------
# spatial layers
# ---------------------------------------------------------------------------

POLYGON_SCHEMA = T.StructType(
    [
        T.StructField("polygon_id", T.StringType(), False),
        T.StructField(
            "ring",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("lat", T.DoubleType(), False),
                        T.StructField("lon", T.DoubleType(), False),
                    ]
                ),
                False,
            ),
            False,
        ),
        T.StructField("category", T.StringType(), True),
    ]
)
