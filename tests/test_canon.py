"""Connected components: Spark large-star/small-star vs pure union-find."""

from __future__ import annotations

import random


from kgforge.canon import cc_unionfind, connected_components


def _check(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    want = cc_unionfind(edges)
    assert got == want


def test_cc_simple_chain(spark):
    _check(spark, [("a", "b"), ("b", "c"), ("c", "d")])


def test_cc_two_components_and_self_loop(spark):
    _check(spark, [("a", "b"), ("x", "y"), ("p", "p"), ("m", "n"), ("n", "o")])


def test_cc_star_and_cycle(spark):
    _check(spark, [("h", "a"), ("h", "b"), ("h", "c"),
                   ("c1", "c2"), ("c2", "c3"), ("c3", "c1")])


def test_cc_entity_prefix_wins(spark):
    # 'e:' < 'o:' < 's:' — component canonical is the entity node
    edges = [("o:occ1", "e:PER_1"), ("o:occ2", "e:PER_1"), ("o:occ3", "s:bob"),
             ("s:bob", "s:bob smith")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got["o:occ1"] == "e:PER_1"
    assert got["o:occ2"] == "e:PER_1"
    assert got["o:occ3"] == got["s:bob smith"] == "o:occ3"


def test_cc_random_graphs_match_unionfind(spark):
    rng = random.Random(7)
    nodes = [f"n{i:03d}" for i in range(120)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(150)]
    _check(spark, edges)


def test_cc_long_path_log_rounds(spark):
    # a 64-node path converges well within max_iterations (log-rounds claim)
    edges = [(f"p{i:02d}", f"p{i + 1:02d}") for i in range(63)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["component"] for r in
           connected_components(df, max_iterations=10).collect()}
    assert set(got.values()) == {"p00"}
    assert len(got) == 64


def test_release_local_checkpoint_frees_blocks_through_projections(spark):
    """ADVICE r2: surface_components returns the checkpointed frame wrapped
    in withColumnRenamed, so the release helper must find the LogicalRDD
    through Project nodes — releasing via analyzed().rdd() directly was a
    silent no-op and the CC mapping leaked storage every at-scale run."""
    from kgforge.canon import _release_local_checkpoint

    def persisted_rdd_ids():
        jsc = spark.sparkContext._jsc.sc()
        return {info.id() for info in jsc.getRDDStorageInfo()}

    for wrap in (lambda df: df,                                  # raw leaf
                 lambda df: df.withColumnRenamed("id", "x"),     # Project
                 lambda df: df.withColumnRenamed("id", "x")
                             .where("x >= 0").select("x")):      # deeper tree
        raw = spark.range(1000).localCheckpoint(eager=True)
        rid = raw._jdf.queryExecution().analyzed().rdd().id()
        assert rid in persisted_rdd_ids()
        _release_local_checkpoint(wrap(raw))
        assert rid not in persisted_rdd_ids()
