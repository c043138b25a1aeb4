"""Dataset sources from the reference's inventory (SURVEY §2.1).

- squad_processor (reference: src/pipelines/question_answering.rs:1085
  parses a SQuAD-format JSON file into Vec<QaInput{question, context}>)
  -> here: spark.read.json + explode of the nested structure.
- ss2_processor (reference: benches/sst2_benchmark.rs:50-63 parses the
  SST-2 TSV with a `sentence\tlabel` header) -> spark.read.csv(sep='\\t').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_squad(spark: SparkSession, path: str) -> DataFrame:
    """SQuAD JSON -> (question, context) rows, document order preserved.

    SQuAD layout: {"data": [{"paragraphs": [{"context", "qas":
    [{"question", ...}]}]}]} — one output row per (question, context) pair,
    matching the reference's QaInput (question_answering.rs:84-89).
    """
    raw = spark.read.option("multiLine", "true").json(path)
    return (
        raw.select(F.explode("data").alias("article"))
        .select(F.explode("article.paragraphs").alias("para"))
        .select(F.col("para.context").alias("context"),
                F.explode("para.qas").alias("qa"))
        .select(F.col("qa.question").alias("question"), "context")
    )


def read_sst2(spark: SparkSession, path: str) -> DataFrame:
    """SST-2 TSV -> (sentence, label:int) rows (header `sentence\tlabel`)."""
    return (
        spark.read.option("header", "true").option("sep", "\t").csv(path)
        .select("sentence", F.col("label").cast("int").alias("label"))
    )
