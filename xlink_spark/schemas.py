"""Explicit StructType schemas for every engine table.

The reference keeps schemas implicit in TSV conventions
(utils/dictionary.py:82, utils/entity.py:38); here they are first-class.
The ``documents`` shape is the authoritative input_hint from BASELINE.json:
``(doc_id: string, spans: array<struct<kind, text, media_ref, offset>>)``.
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
)

# A span is one interleaved unit of a document. kind ∈ {text, anchor, media}.
# An XLink anchor "[[eid|mention]]" (utils/mention.py:5-10) is
# (kind='anchor', text=<surface>, media_ref=<entity_id>, offset=<char offset
# in the reconstructed plain text>). media spans carry media_ref=<asset uri>.
SPAN = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("text", StringType(), True),
        StructField("media_ref", StringType(), True),
        StructField("offset", IntegerType(), False),
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN), False),
    ]
)

# Entity dictionary — utils/dictionary.py:57-114 (4-col TSV) + derived cols.
KB_ENTITIES = StructType(
    [
        StructField("entity_id", StringType(), False),
        StructField("title", StringType(), False),
        StructField("sub_title", StringType(), True),
        StructField("full_title", StringType(), False),
        StructField("surface_norm", StringType(), False),  # blocking key (dictionary.py:141-147)
        StructField("uris", ArrayType(StringType()), True),
        StructField("source", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

# mention → entity anchor counts — extract_mention_anchors.py:16-61
MENTION_ANCHORS = StructType(
    [
        StructField("mention", StringType(), False),
        StructField("entity_id", StringType(), False),
        StructField("cnt", LongType(), False),
    ]
)

OUT_LINKS = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("entity_id", StringType(), False),
    ]
)

SELF_LINKS = StructType(
    [
        StructField("mention", StringType(), False),
        StructField("cnt", LongType(), False),
    ]
)

FREQ_M = StructType(
    [
        StructField("mention", StringType(), False),
        StructField("freq", LongType(), False),
    ]
)

# Probability tables — generate_prob_files.py:84-153
ENTITY_PRIOR = StructType(
    [
        StructField("entity_id", StringType(), False),
        StructField("prior", DoubleType(), False),
    ]
)

M_GIVEN_E = StructType(
    [
        StructField("entity_id", StringType(), False),
        StructField("mention", StringType(), False),
        StructField("p", DoubleType(), False),
    ]
)

E_GIVEN_M = StructType(
    [
        StructField("mention", StringType(), False),
        StructField("entity_id", StringType(), False),
        StructField("p", DoubleType(), False),
    ]
)

LINK_PROB = StructType(
    [
        StructField("mention", StringType(), False),
        StructField("link_m", LongType(), False),
        StructField("freq_m", LongType(), False),
        StructField("link_prob", DoubleType(), False),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("key", StringType(), False),
        StructField("vec", ArrayType(FloatType()), False),
    ]
)

# Detected mentions (pre-candidate) — models.py:58-107 reshaped set-oriented.
MENTIONS = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("start", IntegerType(), False),
        StructField("end", IntegerType(), False),
        StructField("surface", StringType(), False),
        StructField("parse_from", StringType(), False),  # 'ma' | 'tt'
    ]
)

# Gold labels — evaluation/DatasetLoader.py:8-27
GOLD_MENTIONS = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("start", IntegerType(), False),
        StructField("end", IntegerType(), False),
        StructField("surface", StringType(), False),
        StructField("entity_id", StringType(), False),  # "NIL" allowed
    ]
)
