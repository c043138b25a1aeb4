"""The five-stage KG-construction pipeline as Spark DataFrame plans.

Physical design (SURVEY §4):
- ONE shuffle between sentence production and inference: a repartition on
  (length bucket, salted url hash) followed by sortWithinPartitions(n_tok),
  so no Arrow batch mixes wildly different sequence lengths and hot domains
  cannot concentrate in one task (anti-skew per BASELINE.json).
- Models are per-worker singletons (kgforge.workers); all UDFs are
  Arrow-batched mapInPandas / pandas_udf — no per-row Python.
- The alias dictionary joins with an explicit ``broadcast()`` hint.
- Cheap filters run before expensive stages (sentences with <2 entities
  never reach the NLI scorer; non-target languages are pruned at the scan).
- Stage boundaries can checkpoint to parquet with lineage manifests
  (kgforge.checkpoint) for exact resume.
"""

from __future__ import annotations

import math
from dataclasses import asdict

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import ArrayType, DoubleType, StringType, StructField, StructType

from . import schemas
from .config import PipelineConfig
from .extract import extract_text, extractor_hash
from .ner import consolidate_entities, predict_tokens
from .link import normalize_mention, rerank_ambiguous
from .canon import connected_components
from .checkpoint import checkpointed
from .tokenization import _SUBWORD_CHUNK, _WORD_RE, split_sentences
from .triples import generate_candidates, score_candidates
from .workers import get_embedder, get_nli, get_token_classifier


# --------------------------------------------------------------------------
# stage 1 — extract
# --------------------------------------------------------------------------

@F.pandas_udf(StringType())
def extract_udf(html: pd.Series) -> pd.Series:
    return html.map(lambda b: extract_text(bytes(b)) if b is not None else "")


def stage_extract(pages: DataFrame, langs: tuple[str, ...] = ("en",)) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> (url, lang, text).

    The language filter is applied BEFORE extraction so Catalyst pushes it to
    the scan (partition pruning on a lang-partitioned table); only url/html/
    lang columns are read (column pruning: never read `text` when extracting
    from `html`).

    This is the UNFUSED modular form (kept for stage-level tests and for
    callers that only need extraction); the production pipeline uses the
    fused ``stage_extract_sentences`` so one Python eval holds one worker.
    The per-element ``.map`` inside ``extract_udf`` is inherent: extract_text
    is per-document Python either way — Arrow batching amortizes transfer,
    not the parse itself."""
    return (
        pages
        .where(F.col("lang").isin(list(langs)))
        .select("url", "lang", extract_udf("html").alias("text"))
    )


# --------------------------------------------------------------------------
# stage 2a — sentence split + length bucketing
# --------------------------------------------------------------------------

def _piece_count(sentence: str) -> int:
    return sum(
        (len(m.group(0)) + _SUBWORD_CHUNK - 1) // _SUBWORD_CHUNK
        for m in _WORD_RE.finditer(sentence)
    )


def stage_sentences(extracted: DataFrame) -> DataFrame:
    def gen(batches):
        for pdf in batches:
            out = {k: [] for k in
                   ("url", "sent_idx", "sent_begin", "sentence", "n_tok", "bucket")}
            for url, text in zip(pdf["url"], pdf["text"]):
                for i, (begin, sent) in enumerate(split_sentences(text or "")):
                    n_tok = _piece_count(sent)
                    out["url"].append(url)
                    out["sent_idx"].append(i)
                    out["sent_begin"].append(begin)
                    out["sentence"].append(sent)
                    out["n_tok"].append(n_tok)
                    out["bucket"].append(int(math.ceil(math.log2(n_tok + 1))))
            yield pd.DataFrame(out)

    return extracted.mapInPandas(gen, schema=schemas.SENTENCES)


def stage_extract_sentences(
    pages: DataFrame, langs: tuple[str, ...] = ("en",)
) -> DataFrame:
    """Fused stage 1 + 2a: one Python eval instead of two.

    Each Python expression in a pipelined task chain holds its OWN worker
    process concurrently (Arrow streams through all of them), so every fused
    eval removes width x (worker spawn + numpy/pandas import) overhead —
    measured at ~2 CPU-seconds per worker, the dominant fixed cost at high
    parallelism. Same rationale as the reference doing featurize+forward in
    one process instead of piping between binaries."""
    def gen(batches):
        for pdf in batches:
            out = {k: [] for k in
                   ("url", "sent_idx", "sent_begin", "sentence", "n_tok", "bucket")}
            for url, html in zip(pdf["url"], pdf["html"]):
                text = extract_text(bytes(html)) if html is not None else ""
                for i, (begin, sent) in enumerate(split_sentences(text)):
                    n_tok = _piece_count(sent)
                    out["url"].append(url)
                    out["sent_idx"].append(i)
                    out["sent_begin"].append(begin)
                    out["sentence"].append(sent)
                    out["n_tok"].append(n_tok)
                    out["bucket"].append(int(math.ceil(math.log2(n_tok + 1))))
            yield pd.DataFrame(out)

    return (
        pages
        .where(F.col("lang").isin(list(langs)))   # pushed to the scan
        .select("url", "html")                    # column pruning
        .mapInPandas(gen, schema=schemas.SENTENCES)
    )


def repartition_by_length(sentences: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Anti-skew shuffle: uniform hash over (url, sent_idx) — every partition
    gets the same row count AND the same length distribution (a hot domain or
    a burst of giant documents cannot concentrate in one task) — then sort
    within partitions by token count so consecutive Arrow batches are
    length-homogeneous (tight padding; the reference pads to batch max,
    token_classification.rs:1044-1090, so mixed lengths waste FLOPs).

    Hashing on the length bucket itself would co-locate whole buckets and
    reintroduce stragglers; the in-partition sort achieves the same batch
    homogeneity without unbalancing partition work."""
    return (
        sentences
        .repartition(cfg.shuffle_partitions, F.xxhash64("url", "sent_idx"))
        .sortWithinPartitions("n_tok")
    )


# --------------------------------------------------------------------------
# stage 2b — NER inference
# --------------------------------------------------------------------------

def stage_ner(sentences: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """-> (url, sent_idx, sent_begin, sentence, entities[]) with char offsets
    sentence-local. Encoder is a worker singleton; micro-batching and padding
    happen inside predict_tokens exactly as the reference's batch loop."""
    seed = cfg.seed
    cfg_kwargs = asdict(cfg)

    def gen(batches):
        local_cfg = PipelineConfig(**cfg_kwargs)
        enc = get_token_classifier(seed, local_cfg.tokenizer)
        for pdf in batches:
            texts = pdf["sentence"].tolist()
            token_lists = predict_tokens(texts, enc, local_cfg)
            entities = [
                [
                    {"word": e.word, "label": e.label, "score": e.score,
                     "begin": e.begin, "end": e.end}
                    for e in consolidate_entities(toks)
                ]
                for toks in token_lists
            ]
            yield pd.DataFrame({
                "url": pdf["url"], "sent_idx": pdf["sent_idx"],
                "sent_begin": pdf["sent_begin"], "sentence": pdf["sentence"],
                "entities": entities,
            })

    return sentences.mapInPandas(gen, schema=schemas.SENTENCE_ENTITIES)


# --------------------------------------------------------------------------
# stage 3 — candidate generation + zero-shot scoring
# --------------------------------------------------------------------------

def stage_candidates(sentence_entities: DataFrame, cfg: PipelineConfig) -> DataFrame:
    max_dist = cfg.max_pair_distance

    @F.pandas_udf(ArrayType(schemas.CANDIDATE))
    def cand_udf(entities: pd.Series) -> pd.Series:
        return entities.map(
            lambda ents: [asdict(c) for c in generate_candidates(list(ents), max_dist)]
        )

    return (
        sentence_entities
        .where(F.size("entities") >= 2)      # cheap gate before the NLI stage
        .withColumn("candidate", F.explode(cand_udf("entities")))
        .select("url", "sent_idx", "sentence", "candidate.*")
    )


def stage_ner_score(sentences: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Fused model stage: NER + consolidation + BIOES + candidate generation
    + NLI scoring in ONE Python eval. The sentence stream crosses the
    JVM<->Python boundary once for all model work; downstream branches are
    pure-JVM explodes of the two array columns. (Separate stage_ner /
    stage_candidates_score remain as the modular forms used by tests and
    ad-hoc queries.)"""
    seed = cfg.seed
    cfg_kwargs = asdict(cfg)
    scored_cand = StructType(
        list(schemas.CANDIDATE.fields) + [StructField("score", DoubleType(), False)]
    )
    out_schema = StructType(
        schemas.SENTENCES.fields[:4]
        + [StructField("entities", ArrayType(schemas.ENTITY), False),
           StructField("cands", ArrayType(scored_cand), False)]
    )

    def gen(batches):
        local_cfg = PipelineConfig(**cfg_kwargs)
        enc = get_token_classifier(seed, local_cfg.tokenizer)
        nli = get_nli(seed)
        for pdf in batches:
            texts = pdf["sentence"].tolist()
            token_lists = predict_tokens(texts, enc, local_cfg)
            all_entities = []
            row_cands: list[list[dict]] = []
            flat_prem: list[str] = []
            flat_hyp: list[str] = []
            for text, toks in zip(texts, token_lists):
                ents = consolidate_entities(toks)
                eds = [{"word": e.word, "label": e.label, "score": e.score,
                        "begin": e.begin, "end": e.end} for e in ents]
                all_entities.append(eds)
                if len(eds) >= 2:
                    cands = [asdict(c) for c in
                             generate_candidates(eds, local_cfg.max_pair_distance)]
                else:
                    cands = []
                row_cands.append(cands)
                for c in cands:
                    flat_prem.append(text)
                    flat_hyp.append(c["hypothesis"])
            if flat_prem:
                scores = score_candidates(flat_prem, flat_hyp, nli,
                                          local_cfg.batch_size,
                                          local_cfg.nli_max_length)
            pos = 0
            out_cands = []
            for cands in row_cands:
                kept = []
                for c in cands:
                    sc = float(scores[pos]); pos += 1
                    if sc >= local_cfg.relation_threshold:
                        c = dict(c)
                        c["score"] = sc
                        kept.append(c)
                out_cands.append(kept)
            yield pd.DataFrame({
                "url": pdf["url"], "sent_idx": pdf["sent_idx"],
                "sent_begin": pdf["sent_begin"], "sentence": pdf["sentence"],
                "entities": all_entities, "cands": out_cands,
            })

    return sentences.mapInPandas(gen, schema=out_schema)


def stage_candidates_score(sent_ents: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Fused stage 3: candidate generation + NLI scoring + threshold in ONE
    Python eval (see stage_extract_sentences for why fusion matters). The
    <2-entities gate still runs JVM-side before any Python."""
    max_dist = cfg.max_pair_distance
    bsz, thr = cfg.batch_size, cfg.relation_threshold
    out_cols = ["url", "sent_idx", "sentence",
                "subj_word", "subj_type", "subj_begin", "subj_end",
                "obj_word", "obj_type", "obj_begin", "obj_end",
                "pred", "hypothesis"]
    out_schema = StructType(
        [schemas.SENTENCES.fields[0], schemas.SENTENCES.fields[1],
         StructField("sentence", StringType(), False)]
        + list(schemas.CANDIDATE.fields)
        + [StructField("score", DoubleType(), False)]
    )

    def gen(batches):
        nli = get_nli(cfg.seed)
        for pdf in batches:
            rows = {c: [] for c in out_cols}
            for url, sent_idx, sentence, ents in zip(
                    pdf["url"], pdf["sent_idx"], pdf["sentence"], pdf["entities"]):
                for c in generate_candidates(list(ents), max_dist):
                    rows["url"].append(url)
                    rows["sent_idx"].append(sent_idx)
                    rows["sentence"].append(sentence)
                    rows["subj_word"].append(c.subj_word)
                    rows["subj_type"].append(c.subj_type)
                    rows["subj_begin"].append(c.subj_begin)
                    rows["subj_end"].append(c.subj_end)
                    rows["obj_word"].append(c.obj_word)
                    rows["obj_type"].append(c.obj_type)
                    rows["obj_begin"].append(c.obj_begin)
                    rows["obj_end"].append(c.obj_end)
                    rows["pred"].append(c.pred)
                    rows["hypothesis"].append(c.hypothesis)
            out = pd.DataFrame(rows)
            if len(out):
                out["score"] = score_candidates(
                    out["sentence"].tolist(), out["hypothesis"].tolist(), nli,
                    bsz, cfg.nli_max_length)
                out = out[out["score"] >= thr]
            else:
                out["score"] = pd.Series(dtype="float64")
            yield out

    return (
        sent_ents
        .where(F.size("entities") >= 2)
        .mapInPandas(gen, schema=out_schema)
    )


def stage_score(candidates: DataFrame, cfg: PipelineConfig) -> DataFrame:
    seed, bsz, thr = cfg.seed, cfg.batch_size, cfg.relation_threshold
    nli_max_len = cfg.nli_max_length
    out_schema = StructType(candidates.schema.fields + [
        StructField("score", DoubleType(), False)
    ])

    def gen(batches):
        nli = get_nli(seed)
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(score=pd.Series(dtype="float64"))
                continue
            scores = score_candidates(
                pdf["sentence"].tolist(), pdf["hypothesis"].tolist(), nli,
                bsz, nli_max_len
            )
            yield pdf.assign(score=scores)

    return (
        candidates.mapInPandas(gen, schema=out_schema)
        .where(F.col("score") >= thr)
    )


# --------------------------------------------------------------------------
# stage 4 — entity linking
# --------------------------------------------------------------------------

def stage_mentions(sentence_entities: DataFrame) -> DataFrame:
    """Pure-JVM explode (no Python eval); normalization happens inside the
    linking stage's single Python eval."""
    return (
        sentence_entities
        .select("url", "sent_idx", "sentence", F.explode("entities").alias("e"))
        .select(
            "url", "sent_idx", "sentence",
            F.col("e.word").alias("word"), F.col("e.label").alias("label"),
            F.col("e.begin").alias("begin"), F.col("e.end").alias("end"),
        )
    )


def _collect_alias_map(alias_dict: DataFrame) -> dict[str, list[tuple[str, str, float]]]:
    """Tiny driver-side aggregation of the alias dimension table."""
    alias_map: dict[str, list[tuple[str, str, float]]] = {}
    for r in alias_dict.select("alias", "entity_id", "desc", "prior").collect():
        alias_map.setdefault(r["alias"], []).append(
            (r["entity_id"], r["desc"], float(r["prior"])))
    for v in alias_map.values():
        v.sort()
    return alias_map


def stage_link(mentions: DataFrame, alias_dict: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Alias-dictionary resolution + embedding rerank for ambiguous aliases.

    The dictionary is the SMALL side (that is why the north star broadcasts
    it); we pre-aggregate it per alias and ship it as an explicit Spark
    broadcast variable, so resolution is map-side over the mention stream —
    the big side is NEVER shuffled. (A broadcast hash JOIN would also avoid
    a shuffle, but the 1-alias-to-N-entities fanout would then need a
    groupBy-per-occurrence to regroup candidates — a full shuffle of all
    mentions — which this formulation eliminates.)

    Output: RESOLVED (entity_id null => unresolved).
    """
    dim, seed = cfg.embedding_dim, cfg.seed
    alias_map = _collect_alias_map(alias_dict)
    bc = mentions.sparkSession.sparkContext.broadcast(alias_map)

    def gen(batches):
        emb = get_embedder(dim, seed)
        amap = bc.value
        for pdf in batches:
            norms = [normalize_mention(w) for w in pdf["word"]]
            pdf = pdf.assign(norm=norms)
            ids: list[str | None] = [None] * len(pdf)
            amb_idx, amb_ctx, amb_cands = [], [], []
            for i, norm in enumerate(norms):
                cands = amap.get(norm)
                if not cands:
                    continue
                if len(cands) == 1:
                    ids[i] = cands[0][0]
                else:
                    amb_idx.append(i)
                    amb_ctx.append(pdf["sentence"].iloc[i])
                    amb_cands.append(cands)
            if amb_idx:
                picked = rerank_ambiguous(amb_ctx, amb_cands, emb)
                for i, eid in zip(amb_idx, picked):
                    ids[i] = eid
            out = pdf[["url", "sent_idx", "sentence", "word", "label",
                       "begin", "end", "norm"]].copy()
            out["entity_id"] = ids
            yield out

    return mentions.mapInPandas(gen, schema=schemas.RESOLVED)


# --------------------------------------------------------------------------
# stage 5 — canonicalization (connected components) + final triples
# --------------------------------------------------------------------------

def _occ_node(prefix: str = "o:") -> F.Column:
    return F.concat(F.lit(prefix), F.concat_ws(
        "#", F.col("url"), F.col("sent_idx"), F.col("begin"), F.col("end")))


def stage_canon(resolved: DataFrame, mentions: DataFrame,
                max_cc_iterations: int = 20,
                comp: DataFrame | dict | None = None) -> DataFrame:
    """Same-as evidence -> connected components -> occurrence->canonical.

    Dictionary/ANN-resolved occurrences already have a canonical id (the
    entity), so they NEVER enter the graph — that keeps two entities sharing
    an ambiguous alias from being merged, and shrinks the CC input from
    O(mention occurrences) to O(distinct unresolved surfaces), which is the
    property that keeps this stage viable at 10^12 documents (surface
    vocabulary grows sub-linearly in corpus size).

    Graph over surface nodes only:
      s:norm       — s:norm          (self edge: every unresolved surface)
      s:last_word  — s:full_norm     (within-page partial-name coreference)
    Component canonical = min surface node id (deterministic).
    """
    occ = resolved.withColumn("node", _occ_node())
    resolved_map = (
        occ.where(F.col("entity_id").isNotNull())
        .select("node", F.col("entity_id").alias("canonical_id"))
    )
    unresolved = occ.where(F.col("entity_id").isNull())
    if comp is None:
        comp = surface_components(resolved, mentions, max_cc_iterations)
    # else: caller already ran surface_components (run_pipeline branches on
    # its type) — reuse it rather than re-running the whole CC
    if isinstance(comp, dict):
        spark = resolved.sparkSession
        cc = F.broadcast(spark.createDataFrame(
            [(k, v) for k, v in comp.items()],
            schema="surf string, component string"))
    else:
        cc = comp
    unresolved_map = (
        unresolved.select("node", F.concat(F.lit("s:"), F.col("norm")).alias("surf"))
        .join(cc, "surf")
        .select("node", F.col("component").alias("canonical_id"))
    )
    return resolved_map.unionByName(unresolved_map)


def surface_components(
    resolved: DataFrame,
    mentions: DataFrame | None = None,
    max_cc_iterations: int = 20,
    collect_threshold: int = 200_000,
) -> dict[str, str] | DataFrame:
    """Connected components over the UNRESOLVED-surface graph.

    Scale-adaptive physical strategy (AQE-style): the surface graph is tiny
    relative to the corpus (vocabulary, not occurrences), so under
    ``collect_threshold`` edges it is solved driver-side with union-find and
    returned as a dict (broadcastable); past the threshold the distributed
    large-star/small-star operator runs and a (surf, component) DataFrame is
    returned."""
    mentions = mentions if mentions is not None else resolved
    if mentions is resolved:
        # common case (run_pipeline passes the same frame twice): ONE
        # distinct pass over the mention stream feeds all three derived
        # sets — the old shape ran three separate (url, norm) distincts
        # over the full 253k-row resolved frame (~1s at sf1.0). The
        # unresolved flag rides the distinct for free: a norm resolves
        # identically wherever it occurs (deterministic dictionary), so
        # distinct (url, norm, unres) == distinct (url, norm).
        uniq = resolved.select(
            "url", "norm", F.col("entity_id").isNull().alias("unres")).distinct()
        unresolved_pairs = uniq.where(F.col("unres"))
        mention_pairs = uniq
    else:
        unresolved_pairs = (resolved.where(F.col("entity_id").isNull())
                            .select("url", "norm").distinct())
        mention_pairs = mentions.select("url", "norm").distinct()
    surface_nodes = (
        unresolved_pairs.select(F.concat(F.lit("s:"), F.col("norm")).alias("src"))
        .distinct()
        .withColumn("dst", F.col("src"))       # self edge keeps singletons
    )
    multiword = (
        mention_pairs.select(F.col("url").alias("m_url"),
                             F.col("norm").alias("full_norm"))
        .where(F.size(F.split("full_norm", " ")) > 1)
        .withColumn("lastw", F.element_at(F.split("full_norm", " "), -1))
    )
    coref_edges = (
        unresolved_pairs.select(F.col("url").alias("u_url"),
                                F.col("norm").alias("u_norm"))
        .join(multiword,
              (F.col("u_url") == F.col("m_url")) & (F.col("u_norm") == F.col("lastw")),
              "inner")
        .select(F.concat(F.lit("s:"), F.col("u_norm")).alias("src"),
                F.concat(F.lit("s:"), F.col("full_norm")).alias("dst"))
        .distinct()
    )
    # persist (not localCheckpoint): DataFrame.unpersist() cannot release
    # localCheckpoint blocks (RDD-level, invisible to the CacheManager), and
    # this frame must be releasable once the graph moves driver-side.
    # connected_components localCheckpoints its own iteration state anyway.
    edges = surface_nodes.unionByName(coref_edges).persist()
    if edges.count() <= collect_threshold:
        from .canon import cc_unionfind
        pairs = [(r["src"], r["dst"]) for r in edges.collect()]
        edges.unpersist(blocking=True)
        return cc_unionfind(pairs)
    # distributed branch: materialize the (much smaller) mapping so the
    # edges cache AND the CC iteration state can be released here — a lazy
    # plan would pin edges in storage for the session lifetime
    comp = connected_components(
        edges, max_iterations=max_cc_iterations, materialize=True
    ).withColumnRenamed("node", "surf")
    edges.unpersist(blocking=True)
    return comp


def stage_triples_inline(
    scored: DataFrame,
    alias_dict: DataFrame,
    surface_comp: dict[str, str],
    cfg: PipelineConfig,
) -> DataFrame:
    """Canonical triples WITHOUT occurrence-level joins: candidate args are
    resolved map-side against the broadcast alias dictionary (+ embedding
    rerank on the sentence context, identical to stage_link) and the tiny
    surface-component map from connected components. The only shuffle left
    in stage 5 is the final (url, subj, pred, obj) dedup aggregation — the
    two big scored ⋈ canon_map joins are gone. Resolution is deterministic,
    so re-resolving here yields exactly stage_link's answer per occurrence."""
    dim, seed = cfg.embedding_dim, cfg.seed
    sc = scored.sparkSession.sparkContext
    bc_alias = sc.broadcast(_collect_alias_map(alias_dict))
    bc_cc = sc.broadcast(surface_comp)

    def gen(batches):
        emb = get_embedder(dim, seed)
        amap, ccm = bc_alias.value, bc_cc.value
        for pdf in batches:
            resolved_cols = {}
            for side in ("subj", "obj"):
                words = pdf[f"{side}_word"]
                ids: list[str] = [""] * len(pdf)
                amb_idx, amb_ctx, amb_cands = [], [], []
                for i, w in enumerate(words):
                    norm = normalize_mention(w)
                    cands = amap.get(norm)
                    if not cands:
                        surf = "s:" + norm
                        ids[i] = ccm.get(surf, surf)
                    elif len(cands) == 1:
                        ids[i] = cands[0][0]
                    else:
                        amb_idx.append(i)
                        amb_ctx.append(pdf["sentence"].iloc[i])
                        amb_cands.append(cands)
                if amb_idx:
                    picked = rerank_ambiguous(amb_ctx, amb_cands, emb)
                    for i, eid in zip(amb_idx, picked):
                        ids[i] = eid
                resolved_cols[f"{side}_id"] = ids
            out = pdf[["url", "sent_idx", "pred", "subj_word", "obj_word",
                       "score"]].copy()
            out["subj_id"] = resolved_cols["subj_id"]
            out["obj_id"] = resolved_cols["obj_id"]
            yield out

    from pyspark.sql.types import StructType as _St
    out_schema = _St([
        schemas.TRIPLES["url"], schemas.TRIPLES["sent_idx"],
        schemas.TRIPLES["pred"], schemas.TRIPLES["subj_word"],
        schemas.TRIPLES["obj_word"], schemas.TRIPLES["score"],
        schemas.TRIPLES["subj_id"], schemas.TRIPLES["obj_id"],
    ])
    return (
        scored.mapInPandas(gen, schema=out_schema)
        .groupBy("url", "subj_id", "pred", "obj_id")
        .agg(
            F.min("sent_idx").alias("sent_idx"),
            # min, not first: first() is nondeterministic across
            # partitionings; materialized triples must be run-identical
            F.min("subj_word").alias("subj_word"),
            F.min("obj_word").alias("obj_word"),
            F.max("score").alias("score"),
        )
        .select("url", "sent_idx", "subj_id", "pred", "obj_id",
                "subj_word", "obj_word", "score")
    )


def stage_triples(scored: DataFrame, canon_map: DataFrame) -> DataFrame:
    """Attach canonical ids to scored candidates; aggregate duplicates."""
    subj_map = canon_map.select(F.col("node").alias("subj_node"),
                                F.col("canonical_id").alias("subj_id"))
    obj_map = canon_map.select(F.col("node").alias("obj_node"),
                               F.col("canonical_id").alias("obj_id"))
    with_nodes = (
        scored
        .withColumn("subj_node", F.concat(F.lit("o:"), F.concat_ws(
            "#", "url", "sent_idx", "subj_begin", "subj_end")))
        .withColumn("obj_node", F.concat(F.lit("o:"), F.concat_ws(
            "#", "url", "sent_idx", "obj_begin", "obj_end")))
    )
    return (
        with_nodes
        .join(subj_map, "subj_node")
        .join(obj_map, "obj_node")
        .groupBy("url", "subj_id", "pred", "obj_id")
        .agg(
            F.min("sent_idx").alias("sent_idx"),
            # min, not first: first() is nondeterministic across
            # partitionings; materialized triples must be run-identical
            F.min("subj_word").alias("subj_word"),
            F.min("obj_word").alias("obj_word"),
            F.max("score").alias("score"),
        )
        .select("url", "sent_idx", "subj_id", "pred", "obj_id",
                "subj_word", "obj_word", "score")
    )


# --------------------------------------------------------------------------
# end-to-end
# --------------------------------------------------------------------------

def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    alias_dict: DataFrame,
    cfg: PipelineConfig | None = None,
    workdir: str | None = None,
) -> DataFrame:
    """pages + alias_dict -> canonical triples DataFrame.

    With ``workdir`` set, each stage materializes to parquet with a lineage
    manifest and resumes from it when re-run with the same config."""
    cfg = cfg or PipelineConfig()
    ch = cfg.config_hash()
    mh = f"{cfg.model_name}:{extractor_hash()}"

    sentences = checkpointed(
        lambda: repartition_by_length(stage_extract_sentences(pages), cfg),
        spark, workdir, "s1_sentences", ch, mh)
    ner_scored = checkpointed(lambda: stage_ner_score(sentences, cfg),
                              spark, workdir, "s2s3_ner_scored", ch, mh)
    persisted: list[DataFrame] = []
    if workdir is None:
        # feeds BOTH the triples branch and the linking branch; without a
        # parquet checkpoint, persist so inference runs once
        ner_scored = ner_scored.persist()
        persisted.append(ner_scored)
    scored = (
        ner_scored
        .where(F.size("cands") >= 1)
        .select("url", "sent_idx", "sentence", F.explode("cands").alias("c"))
        .select("url", "sent_idx", "sentence", "c.*")
    )
    resolved = checkpointed(
        lambda: stage_link(stage_mentions(ner_scored), alias_dict, cfg),
        spark, workdir, "s4_resolved", ch, mh)
    if workdir is None:
        resolved = resolved.persist()
        persisted.append(resolved)
    # resolved carries (url, norm) so it doubles as the coref mention source
    comp = surface_components(resolved, resolved)
    if isinstance(comp, dict):
        # common case: surface graph fit the driver -> broadcast it and
        # resolve candidate args map-side (no occurrence-level joins)
        triples = checkpointed(
            lambda: stage_triples_inline(scored, alias_dict, comp, cfg),
            spark, workdir, "s5_triples", ch, mh)
    else:
        # at-scale fallback: distributed CC + occurrence-keyed equi-joins;
        # reuse the already-materialized component mapping (recomputing CC
        # here would double the most expensive stage-5 work)
        canon_map = stage_canon(resolved, resolved, comp=comp)
        if workdir is None:
            canon_map = canon_map.persist()
            persisted.append(canon_map)
        triples = checkpointed(lambda: stage_triples(scored, canon_map),
                               spark, workdir, "s5_triples", ch, mh)
    if persisted:
        # cache discipline for long-lived sessions: materialize the (small)
        # triples result once, then release every intermediate cache. With a
        # workdir the stages live in parquet and nothing was persisted.
        triples = triples.localCheckpoint(eager=True)
        for df in persisted:
            df.unpersist()
    if not isinstance(comp, dict):
        # the component mapping was a materialized localCheckpoint; triples
        # are now materialized (parquet checkpoint or localCheckpoint above),
        # so its blocks can be released
        from .canon import _release_local_checkpoint
        _release_local_checkpoint(comp)
    return triples


def materialize_triples(triples: DataFrame, path: str,
                        write_buckets: int = 8) -> None:
    """Partitioned table write: predicate-partitioned, url-sorted within
    partitions (the parquet analog of the Iceberg layout in the north star;
    the writer is isolated here so an Iceberg `writeTo` is a one-line swap).

    Write parallelism: repartitioning on `pred` alone would funnel the whole
    output through <= n_predicates tasks (4 here) and one hot predicate would
    serialize ~everything — a scale-killer invisible at sf0.1. Instead we
    repartition on (pred, pmod(xxhash64(url), B)) so each predicate directory
    is written by B tasks, while partitionBy('pred') still gives the
    one-directory-per-predicate layout."""
    (
        triples
        .repartition(
            F.col("pred"),
            F.pmod(F.xxhash64("url"), F.lit(write_buckets)))
        .sortWithinPartitions("url")
        .write.mode("overwrite")
        .partitionBy("pred")
        .parquet(path)
    )
