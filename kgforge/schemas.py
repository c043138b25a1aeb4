"""Spark schemas for every stage boundary (checkpointable contracts)."""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), True),
    StructField("html", BinaryType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
])

SENTENCES = StructType([
    StructField("url", StringType(), False),
    StructField("sent_idx", IntegerType(), False),
    StructField("sent_begin", IntegerType(), False),   # char offset into page text
    StructField("sentence", StringType(), False),
    StructField("n_tok", IntegerType(), False),
    StructField("bucket", IntegerType(), False),       # ceil(log2(n_tok+1))
])

ENTITY = StructType([
    StructField("word", StringType(), False),
    StructField("label", StringType(), False),          # PER | ORG | LOC | MISC
    StructField("score", DoubleType(), False),
    StructField("begin", IntegerType(), False),         # char offsets, sentence-local
    StructField("end", IntegerType(), False),
])

SENTENCE_ENTITIES = StructType(
    SENTENCES.fields[:4] + [StructField("entities", ArrayType(ENTITY), False)]
)

CANDIDATE = StructType([
    StructField("subj_word", StringType(), False),
    StructField("subj_type", StringType(), False),
    StructField("subj_begin", IntegerType(), False),
    StructField("subj_end", IntegerType(), False),
    StructField("obj_word", StringType(), False),
    StructField("obj_type", StringType(), False),
    StructField("obj_begin", IntegerType(), False),
    StructField("obj_end", IntegerType(), False),
    StructField("pred", StringType(), False),
    StructField("hypothesis", StringType(), False),
])

MENTIONS = StructType([
    StructField("url", StringType(), False),
    StructField("sent_idx", IntegerType(), False),
    StructField("sentence", StringType(), False),
    StructField("word", StringType(), False),
    StructField("label", StringType(), False),
    StructField("begin", IntegerType(), False),
    StructField("end", IntegerType(), False),
    StructField("norm", StringType(), False),
])

RESOLVED = StructType(MENTIONS.fields + [
    StructField("entity_id", StringType(), True),       # null => unresolved
])

TRIPLES = StructType([
    StructField("url", StringType(), False),
    StructField("sent_idx", IntegerType(), False),
    StructField("subj_id", StringType(), False),
    StructField("pred", StringType(), False),
    StructField("obj_id", StringType(), False),
    StructField("subj_word", StringType(), False),
    StructField("obj_word", StringType(), False),
    StructField("score", DoubleType(), False),
])

ALIAS_DICT = StructType([
    StructField("alias", StringType(), False),
    StructField("entity_id", StringType(), False),
    StructField("canonical_name", StringType(), False),
    StructField("desc", StringType(), False),
    StructField("prior", DoubleType(), False),
])

GOLD_TRIPLES = StructType([
    StructField("subj_id", StringType(), False),
    StructField("pred", StringType(), False),
    StructField("obj_id", StringType(), False),
    StructField("url", StringType(), False),
])
