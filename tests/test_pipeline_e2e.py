"""End-to-end pipeline tests on tiny synthetic pages (the P/R gate at pytest
scale) + local-vs-Spark equivalence + checkpoint/resume."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kgforge import schemas
from kgforge.config import PipelineConfig
from kgforge.metrics import triple_pr
from kgforge.pipeline import (
    repartition_by_length,
    run_pipeline,
    stage_candidates,
    stage_extract,
    stage_link,
    stage_mentions,
    stage_ner,
    stage_score,
    stage_sentences,
)


@pytest.fixture(scope="module")
def cfg():
    return PipelineConfig()


@pytest.fixture(scope="module")
def triples(spark, tiny_pages_df, alias_df, cfg):
    t = run_pipeline(spark, tiny_pages_df, alias_df, cfg)
    t.cache().count()
    return t


def test_distributed_cc_branch_matches_driver_unionfind(spark, tiny_pages_df,
                                                        alias_df, cfg):
    """The at-scale fallback (surface graph > collect_threshold -> the
    distributed large-star/small-star operator) must produce exactly the
    driver-side union-find mapping, and must release its edges cache."""
    from kgforge.pipeline import (repartition_by_length, stage_extract_sentences,
                                  stage_link, stage_mentions, stage_ner_score,
                                  surface_components)

    def n_cached():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    ner = stage_ner_score(
        repartition_by_length(stage_extract_sentences(tiny_pages_df), cfg),
        cfg).persist()
    resolved = stage_link(stage_mentions(ner), alias_df, cfg).persist()
    resolved.count()

    comp_dict = surface_components(resolved, resolved)
    assert isinstance(comp_dict, dict) and comp_dict

    before = n_cached()
    comp_df = surface_components(resolved, resolved, collect_threshold=0)
    assert not isinstance(comp_df, dict)
    mapping = {r["surf"]: r["component"] for r in comp_df.collect()}
    assert mapping == comp_dict
    # cache discipline: edges and every retired CC iteration state are
    # freed eagerly; only the materialized mapping itself remains
    assert n_cached() - before <= 1, (n_cached(), before)
    ner.unpersist()
    resolved.unpersist()


def test_empty_and_degenerate_pages(spark, alias_df, cfg):
    """At 100 TB empty partitions, null blobs and empty documents are
    routine — the pipeline must produce zero triples, not crash."""
    import datetime

    empty = spark.createDataFrame([], schema=schemas.PAGES)
    assert run_pipeline(spark, empty, alias_df, cfg).count() == 0

    ts = datetime.datetime(2024, 1, 1)
    degen = spark.createDataFrame(
        [("https://a/1", ts, None, "", "en"),          # null html
         ("https://a/2", ts, b"", "", "en"),           # empty html
         ("https://a/3", ts, b"<html></html>", "", "en"),   # no text
         ("https://a/4", ts, b"x", "text", "xx")],     # pruned lang
        schema=schemas.PAGES)
    assert run_pipeline(spark, degen, alias_df, cfg).count() == 0


def test_no_lingering_intermediate_caches(spark, tiny_pages_df, alias_df, cfg):
    """run_pipeline must release every intermediate cache (ner_scored,
    resolved, surface edges) — long-lived sessions must not accumulate
    cached stages. Only the returned result's own localCheckpoint survives."""
    def n_cached():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    before = n_cached()
    t = run_pipeline(spark, tiny_pages_df, alias_df, cfg)
    assert t.count() > 0
    assert n_cached() - before <= 1  # just the eager result checkpoint


def test_pr_gate(triples, gold_triples_df):
    """BASELINE.json: P/R >= 0.95 vs gold triples."""
    pr = triple_pr(triples, gold_triples_df)
    assert pr.precision >= 0.95, pr
    assert pr.recall >= 0.95, pr


def test_pr_gate_wordpiece_tokenizer(spark, tiny_pages_df, alias_df,
                                     gold_triples_df):
    """Same e2e gate with the WordPiece tokenizer swapped in via config:
    featurization runs longest-match-first WordPiece (entity words one
    piece via the catalog vocab, other words ##-char pieces) and the
    gazetteer keys on the SAME pieces — P/R must stay exact."""
    t = run_pipeline(spark, tiny_pages_df, alias_df,
                     PipelineConfig(tokenizer="wordpiece"))
    pr = triple_pr(t, gold_triples_df)
    assert pr.precision == 1.0 and pr.recall == 1.0, pr


def test_pr_gate_bpe_tokenizer(spark, tiny_pages_df, alias_df,
                               gold_triples_df):
    """Same e2e gate with byte-level BPE swapped in: convergence-trained
    merges make entity words single pieces (multibyte surfaces key on their
    byte-proxy piece), and the gazetteer keys on the SAME pieces."""
    t = run_pipeline(spark, tiny_pages_df, alias_df,
                     PipelineConfig(tokenizer="bpe"))
    pr = triple_pr(t, gold_triples_df)
    assert pr.precision == 1.0 and pr.recall == 1.0, pr


def test_pr_gate_unigram_tokenizer(spark, tiny_pages_df, alias_df,
                                   gold_triples_df):
    """Same e2e gate with the SentencePiece-style unigram tokenizer:
    Viterbi segments in-vocab entity words as one piece."""
    t = run_pipeline(spark, tiny_pages_df, alias_df,
                     PipelineConfig(tokenizer="unigram"))
    pr = triple_pr(t, gold_triples_df)
    assert pr.precision == 1.0 and pr.recall == 1.0, pr


def test_triples_schema_and_values(triples):
    assert set(triples.columns) == {
        "url", "sent_idx", "subj_id", "pred", "obj_id",
        "subj_word", "obj_word", "score"}
    rows = triples.collect()
    assert rows
    for r in rows:
        assert r["score"] >= 0.5
        assert r["pred"] in ("lives_in", "works_for", "located_in", "founded_by")
        # canonical ids resolved through the alias dictionary
        assert r["subj_id"].startswith(("PER_", "ORG_"))
        assert r["obj_id"].startswith(("PER_", "ORG_", "LOC_"))


def test_extract_matches_text_column(spark, tiny_pages_df):
    """Stage-1 invariant on the Spark side: extracted == stored text."""
    ext = stage_extract(tiny_pages_df, langs=("en", "fr", "de", "es"))
    joined = ext.alias("e").join(tiny_pages_df.alias("p"), "url")
    n_bad = joined.where(F.col("e.text") != F.col("p.text")).count()
    assert n_bad == 0


def test_spark_ner_matches_local(spark, tiny_pages_df, cfg):
    """UDF output == single-process reference implementation row-for-row
    (SURVEY §5 local-vs-Spark equivalence)."""
    from kgforge.encoders import StandInTokenClassifier
    from kgforge.ner import consolidate_entities, predict_tokens
    from kgforge.synth import build_gazetteer
    from kgforge.tokenization import split_sentences

    sent_ents = stage_ner(
        repartition_by_length(stage_sentences(stage_extract(tiny_pages_df)), cfg),
        cfg,
    )
    got = {
        (r["url"], r["sent_idx"]): [
            (e["word"], e["label"], e["begin"], e["end"], round(e["score"], 12))
            for e in r["entities"]
        ]
        for r in sent_ents.collect()
    }

    enc = StandInTokenClassifier(build_gazetteer(), seed=cfg.seed)
    pages = {r["url"]: r["text"] for r in
             tiny_pages_df.where(F.col("lang") == "en").select("url", "text").collect()}
    checked = 0
    for url, text in pages.items():
        sents = split_sentences(text)
        texts = [s for _, s in sents]
        toks = predict_tokens(texts, enc, cfg)
        for i, t in enumerate(toks):
            want = [(e.word, e.label, e.begin, e.end, round(e.score, 12))
                    for e in consolidate_entities(t)]
            assert got[(url, i)] == want, (url, i)
            checked += 1
    assert checked > 100


def test_ambiguous_alias_resolved_by_context(spark, alias_df, cfg):
    """The 'Apex' alias must resolve via the ANN rerank to the entity whose
    signature words appear in the sentence."""
    pages = [{
        "url": "https://t/1", "warc_ts": None, "html": None,
        "text": ("t\nIt is known that Amy Smith works for Apex near the "
                 "mining shipping harbor."),
        "lang": "en",
    }, {
        "url": "https://t/2", "warc_ts": None, "html": None,
        "text": ("t\nIt is known that Amy Smith works for Apex near the "
                 "software campus banking."),
        "lang": "en",
    }]
    pages_df = spark.createDataFrame(pages, schema=schemas.PAGES)
    mentions = stage_mentions(stage_ner(
        stage_sentences(pages_df.select("url", "lang", "text")), cfg))
    resolved = stage_link(mentions, alias_df, cfg)
    by_url = {(r["url"], r["word"]): r["entity_id"] for r in resolved.collect()}
    assert by_url[("https://t/1", "Apex")] == "ORG_0100"  # Apex Mining Group
    assert by_url[("https://t/2", "Apex")] == "ORG_0101"  # Apex Software Labs


def test_unlinked_mentions_cluster_via_cc(spark, alias_df, cfg):
    """'Orla Quizzle' (not in the alias dict) on two pages + a bare 'Quizzle'
    mention must all share one canonical id via connected components."""
    from kgforge.pipeline import stage_canon

    pages = [
        {"url": "https://t/a", "warc_ts": None, "html": None,
         "text": "t\nOrla Quizzle visited Paris yesterday. Quizzle praised Berlin yesterday.",
         "lang": "en"},
        {"url": "https://t/b", "warc_ts": None, "html": None,
         "text": "t\nOrla Quizzle visited Berlin yesterday.",
         "lang": "en"},
    ]
    pages_df = spark.createDataFrame(pages, schema=schemas.PAGES)
    sent_ents = stage_ner(stage_sentences(pages_df.select("url", "lang", "text")), cfg)
    mentions = stage_mentions(sent_ents)
    resolved = stage_link(mentions, alias_df, cfg)
    canon = stage_canon(resolved, resolved)
    joined = (
        resolved.withColumn("node", F.concat(F.lit("o:"), F.concat_ws(
            "#", "url", "sent_idx", "begin", "end")))
        .join(canon, "node")
    )
    rows = joined.where(F.col("word").contains("Quizzle")).collect()
    assert len(rows) == 3
    canonical = {r["canonical_id"] for r in rows}
    assert len(canonical) == 1, rows
    # Paris/Berlin resolved normally
    locs = {r["word"]: r["canonical_id"] for r in joined.collect()
            if r["word"] in ("Paris", "Berlin")}
    assert locs["Paris"].startswith("LOC_") and locs["Berlin"].startswith("LOC_")


def test_distractors_produce_no_triples(spark, alias_df, cfg):
    pages = [{
        "url": "https://t/d", "warc_ts": None, "html": None,
        "text": "t\nAmy Smith visited Paris yesterday. Amy Smith criticized Acme Corp yesterday.",
        "lang": "en",
    }]
    pages_df = spark.createDataFrame(pages, schema=schemas.PAGES)
    sent_ents = stage_ner(stage_sentences(pages_df.select("url", "lang", "text")), cfg)
    scored = stage_score(stage_candidates(sent_ents, cfg), cfg)
    assert scored.count() == 0


def test_non_english_pages_pruned(spark, tiny_pages_df, cfg):
    ext = stage_extract(tiny_pages_df)  # default langs=("en",)
    langs = {r["lang"] for r in ext.select("lang").distinct().collect()}
    assert langs == {"en"}


def test_checkpoint_resume_identical(spark, tiny_pages_df, alias_df, cfg, tmp_path):
    wd = str(tmp_path / "wd")
    t1 = run_pipeline(spark, tiny_pages_df, alias_df, cfg, workdir=wd)
    rows1 = sorted(map(tuple, t1.collect()))
    assert os.path.exists(os.path.join(wd, "s5_triples", "_kg_manifest.json"))
    t2 = run_pipeline(spark, tiny_pages_df, alias_df, cfg, workdir=wd)
    rows2 = sorted(map(tuple, t2.collect()))
    assert rows1 == rows2


def test_length_bucketing_partitions_are_homogeneous(spark, tiny_pages_df, cfg):
    """Within a partition, token counts must be sorted (the anti-skew
    contract that keeps Arrow batches length-homogeneous)."""
    sents = repartition_by_length(stage_sentences(stage_extract(tiny_pages_df)), cfg)

    def check(it):
        import pandas as pd
        for pdf in it:
            ok = bool((pdf["n_tok"].diff().dropna() >= 0).all())
            yield pd.DataFrame({"ok": [ok]})

    from pyspark.sql.types import BooleanType, StructField, StructType
    res = sents.mapInPandas(check, StructType([StructField("ok", BooleanType())]))
    assert all(r["ok"] for r in res.collect())


def test_hot_domain_and_giant_doc_skew_balance(spark, cfg):
    """Anti-skew contract: with 90% of pages on one domain plus giant
    documents, the post-repartition sentence partitions stay balanced
    (max/mean row ratio bounded)."""
    from kgforge.pipeline import repartition_by_length, stage_sentences
    from kgforge.synth import _filler_sentence
    import random

    rng = random.Random(0)
    rows = []
    for i in range(300):
        domain = "hot.example.com" if i % 10 else f"cold{i}.example.com"
        n_sent = 120 if i % 37 == 0 else rng.randint(2, 6)  # giant-doc tail
        text = "t\n" + "\n".join(_filler_sentence(rng) for _ in range(n_sent))
        rows.append({"url": f"https://{domain}/p/{i}", "lang": "en", "text": text})
    df = spark.createDataFrame(rows)
    sents = repartition_by_length(stage_sentences(df), cfg)
    counts = [r["cnt"] for r in
              sents.groupBy(F.spark_partition_id().alias("pid"))
                   .agg(F.count(F.lit(1)).alias("cnt")).collect()]
    assert len(counts) > 4
    mean = sum(counts) / len(counts)
    assert max(counts) <= 2.0 * mean, (sorted(counts), mean)
