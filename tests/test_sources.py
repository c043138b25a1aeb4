"""SQuAD / SST-2 source readers (SURVEY §2.1) -> pipeline-ready DataFrames."""

from __future__ import annotations

import json

from kgforge.sources import read_sst2, read_squad


def test_read_squad(spark, tmp_path):
    squad = {"data": [{"title": "t", "paragraphs": [
        {"context": "The Eiffel Tower stands in Paris .",
         "qas": [{"id": "1", "question": "Where does the tower stand ?"},
                 {"id": "2", "question": "What stands in Paris ?"}]},
        {"context": "Acme Corp was founded by John Smith .",
         "qas": [{"id": "3", "question": "Who founded Acme Corp ?"}]},
    ]}]}
    p = tmp_path / "squad.json"
    p.write_text(json.dumps(squad))
    df = read_squad(spark, str(p))
    rows = {(r["question"], r["context"]) for r in df.collect()}
    assert len(rows) == 3
    assert ("Who founded Acme Corp ?",
            "Acme Corp was founded by John Smith .") in rows


def test_squad_feeds_qa_pipeline(spark, tmp_path):
    squad = {"data": [{"paragraphs": [
        {"context": "The answer is Quito today .",
         "qas": [{"question": "What is the answer ?"}]}]}]}
    p = tmp_path / "squad2.json"
    p.write_text(json.dumps(squad))
    pairs = [(r["question"], r["context"])
             for r in read_squad(spark, str(p)).collect()]
    from kgforge.qa import predict_qa
    out = predict_qa(pairs, answer_map={"What is the answer ?": "Quito"})
    assert out[0][0].answer == "Quito"


def test_read_sst2(spark, tmp_path):
    p = tmp_path / "sst2.tsv"
    p.write_text("sentence\tlabel\nfast good growth\t1\nslow bad error\t0\n")
    df = read_sst2(spark, str(p))
    rows = {(r["sentence"], r["label"]) for r in df.collect()}
    assert rows == {("fast good growth", 1), ("slow bad error", 0)}
