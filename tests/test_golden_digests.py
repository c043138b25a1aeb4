"""Golden value-digests for the rows-only driver queries at sf0.01.

The driver's CORRECTNESS gate can only check row counts for queries with no
SQL oracle (model math is not SQL-expressible). This suite backs that weaker
check with a VALUE-exact local gate at the same scale the driver runs:
md5 over the canonicalized result (columns sorted by name, floats rounded to
6dp, rows sorted) — pinned per query, verified parallelism-invariant
(recomputed identical under local[8]/16 partitions and local[4]/7
partitions). Any change to model heads, decode math, codecs, or pipeline
stages that moves a single value at sf0.01 fails here loudly.
"""

from __future__ import annotations

import hashlib
import math

import pytest

SF_DIR = "/root/testdata/sf0.01"

# (query, md5-of-canonicalized-rows, row count) — regenerate via the recipe
# in the module docstring ONLY when an intentional semantic change lands.
GOLDEN = [
    ("gen_greedy", "03582d1c7fdf4ec129270edc8a347357", 200),
    ("summarize_beam", "0bcce63b5ddf81d26a6fb0921c6947ca", 200),
    ("translate_m2m", "bbd580d63ee95772a034cf2cc53c010e", 200),
    ("converse", "0b4b462c9d1bc9bfcefaf3e48fd69a9c", 200),
    ("seq_classify", "a012a183cc828cd441ea85175c01213d", 500),
    ("masked_fill", "36237184497c6ca0620da9c6fe579749", 500),
    ("qa_extractive", "ad3ef8aeab50b03464d95d4b47073697", 500),
    ("media_image_features", "6b4cc1e1bf337cd4f8d74871a75f7d20", 167),
    ("media_audio_stats", "fb94169b2a426416e915c9661d7adc9c", 167),
    ("media_video_frames", "7c8fad49d7e9393aed6ae5f22952710f", 910),
    ("kg_zero_shot", "a2aa7265f22b7ef5b05c27aa5d3c3494", 500),
    ("kg_doc_embeddings", "4f1c2a9a2d93ab21b6eeb40a4ba10a74", 500),
    ("embedding_ann_topk", "5d149b1c468482ea44716dda1242fd61", 25),
    ("embedding_ivf_topk", "3707f1b0a87af26e2a2d1f853ba23358", 25),
    ("kgram_cardinality_sketch", "f45c178e3ea11e1c99ab4db803c34619", 6),
    # keywords_mmr regenerated 2026-08-17: full 318-entry reference
    # stopword registry replaced the pinned subset (intentional semantic
    # change — candidate sets now match the reference)
    ("keywords_mmr", "77d43f0e9c218d43dd603c29596db5f9", 600),
    ("kg_entities", "4f20b5679d0b6ea924c0f1cc6fe3027f", 2430),
    ("kg_linked", "618ee191cb4b83c411404d06a56d63c6", 2430),
    ("kg_triples", "087d41896149280a863a79fc36789e6d", 816),
    # pinned 2026-08-17 (round 5, new operator): deterministic sorted-fold
    # PageRank over the triple graph; digest verified identical under
    # 16 and 7 shuffle partitions
    ("kg_pagerank", "165b0b989c8d8fd6661754c93a92a309", 124),
]


def _digest(df) -> tuple[str, int]:
    pdf = df.toPandas()
    cols = sorted(pdf.columns)

    def canon(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return format(round(v, 6), ".6f")
        return str(v)

    rows = sorted("|".join(canon(r[c]) for c in cols)
                  for _, r in pdf[cols].iterrows())
    return hashlib.md5("\n".join(rows).encode()).hexdigest(), len(rows)


@pytest.mark.parametrize("name,want_md5,want_rows",
                         GOLDEN, ids=[g[0] for g in GOLDEN])
def test_rows_only_query_value_digest(spark, name, want_md5, want_rows):
    import __spark_entry__ as entry
    got_md5, got_rows = _digest(entry.queries()[name](spark, SF_DIR))
    assert got_rows == want_rows, f"{name}: row count drifted"
    assert got_md5 == want_md5, f"{name}: value digest drifted"
