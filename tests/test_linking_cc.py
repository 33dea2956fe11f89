"""M4/M5 — entity linking + connected-components parity and determinism."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from cyclegraph_spark.operators.cc import (
    canonicalize_triples,
    connected_components,
    reference_components,
)
from cyclegraph_spark.operators.linking import (
    link_mentions,
    link_mentions_window,
    reference_link,
)
from cyclegraph_spark.sources.pages import alias_df, build_alias_rows, pages_with_text

EDGE_SCHEMA = T.StructType(
    [T.StructField("src", T.StringType()), T.StructField("dst", T.StringType())]
)


def test_link_parity_with_oracle(spark):
    n = 120
    aliases = alias_df(spark, n_entities=200)
    alias_rows = build_alias_rows(n_entities=200)
    pages = pages_with_text(spark, n, n_entities=200, partitions=4).select("url", "text")

    got_rows = link_mentions(pages, aliases).collect()
    got = {(r.url, r.pos, r.alias, r.entity_id, r.score) for r in got_rows}

    exp = set()
    for r in pages.collect():
        for pos, alias, eid, score in reference_link(r.text, alias_rows):
            exp.add((r.url, pos, alias, eid, score))

    assert got == exp, (
        f"missing={sorted(exp - got)[:3]} extra={sorted(got - exp)[:3]}"
    )
    # window variant computes the same relation
    got_w = {
        (r.url, r.pos, r.alias, r.entity_id, r.score)
        for r in link_mentions_window(pages, aliases).collect()
    }
    assert got_w == got


def test_link_context_feature_flips_ambiguous_alias(spark):
    """Document coherence: an ambiguous alias resolves to the entity the
    rest of the document supports once ln-support outweighs the prior
    gap (score = prior × (1 + 0.1·ln(1 + support−1)))."""
    aliases = spark.createDataFrame(
        [("X", "e9", 0.5), ("X", "e1", 0.45), ("B", "e1", 0.9)],
        "alias string, entity_id string, prior double",
    )
    # 'X' once, 'B' (an e1 alias) four times → e1 support=5, e9 support=1
    doc = [(u"d1", "X w B w B w B w B")]
    pages = spark.createDataFrame(doc, "url string, text string")
    links = {r.pos: r.entity_id for r in link_mentions(pages, aliases).collect()}
    assert links[0] == "e1"  # flipped by context (prior alone picks e9)
    # and with context off, the prior wins
    links0 = {
        r.pos: r.entity_id
        for r in link_mentions(pages, aliases, context_weight=0.0).collect()
    }
    assert links0[0] == "e9"
    # oracle agrees on the flip
    got = reference_link("X w B w B w B w B", [("X", "e9", 0.5), ("X", "e1", 0.45), ("B", "e1", 0.9)])
    assert got[0][2] == "e1"


def test_link_deterministic_across_parallelism(spark):
    aliases = alias_df(spark, n_entities=100)
    out = []
    for parts in (2, 8):
        pages = pages_with_text(spark, 80, n_entities=100, partitions=parts).select(
            "url", "text"
        )
        rows = link_mentions(pages, aliases).collect()
        out.append(sorted((r.url, r.pos, r.entity_id, r.score) for r in rows))
    assert out[0] == out[1]


def test_cc_parity_chain_and_stars(spark):
    edges = (
        # chain a-b-c-d (diameter test)
        [("b", "a"), ("c", "b"), ("d", "c")]
        # star with hub z
        + [("z", f"leaf{i}") for i in range(20)]
        # singleton pair + disjoint component
        + [("m", "n"), ("q", "p")]
        # self-loop-only vertex: must label itself, not vanish
        + [("solo", "solo")]
    )
    df = spark.createDataFrame(edges, EDGE_SCHEMA)
    got = {(r.id, r.component) for r in connected_components(df).collect()}
    exp = set(reference_components(edges).items())
    assert got == exp


def test_cc_nonconvergence_is_loud(spark):
    """Exhausting max_iter without an edge-fingerprint fixpoint must
    surface (warning + stats flag), never silently label from a
    mid-contraction edge set (ADVICE r2)."""
    import warnings

    edges = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(64)]
    df = spark.createDataFrame(edges, EDGE_SCHEMA)
    stats: dict = {}
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        connected_components(df, max_iter=1, stats=stats).collect()
    assert stats["converged"] is False
    assert any("fixpoint" in str(w.message) for w in caught)
    # and the healthy path reports converged=True with no warning
    stats2: dict = {}
    with warnings.catch_warnings(record=True) as caught2:
        warnings.simplefilter("always")
        got = {
            (r.id, r.component)
            for r in connected_components(df, stats=stats2).collect()
        }
    assert stats2["converged"] is True
    assert not [w for w in caught2 if "fixpoint" in str(w.message)]
    assert got == set(reference_components(edges).items())


def test_cc_long_chain_converges_logarithmically(spark):
    """Pointer doubling: a 300-link path must converge well under the
    chain length (O(log n) rounds; max_iter=15 would fail without it)."""
    n = 300
    edges = [(f"n{i:04d}", f"n{i + 1:04d}") for i in range(n)]
    df = spark.createDataFrame(edges, EDGE_SCHEMA)
    got = {(r.id, r.component) for r in connected_components(df, max_iter=15).collect()}
    assert got == {(f"n{i:04d}", "n0000") for i in range(n + 1)}


def test_cc_10k_chain_multi_hub_topology(spark):
    """Nasty topology: a 10k-link path (worst case for plain min-label
    propagation — O(n) rounds without shortcutting) fused with four
    1.5k-leaf hubs (degree > hot_degree → exercises the salted path),
    plus a disjoint pair to catch cross-component label leaks.

    Asserts union-find parity AND that star contraction converges in
    O(log n) rounds (log2(10001) ≈ 13.3; bound 18 leaves slack for the
    hub merge; plain label propagation would need ~5,000 rounds here
    because the hub's smaller label arrives after the chain's left half
    has already converged to its regional minimum)."""
    n = 10_000
    edges = [(f"n{i:05d}", f"n{i + 1:05d}") for i in range(n)]
    for h in range(4):
        edges += [(f"hub{h}", f"hub{h}-leaf{i:04d}") for i in range(1_500)]
    # ring the hubs together and graft them onto the chain's midpoint
    edges += [(f"hub{h}", f"hub{(h + 1) % 4}") for h in range(4)]
    edges += [("hub0", f"n{n // 2:05d}"), ("x1", "x2")]

    df = spark.createDataFrame(edges, EDGE_SCHEMA).repartition(32)
    stats: dict = {}
    # skew_factor=0: pure absolute threshold so the 1.5k-degree hubs
    # trip the split (the relative default would put the bar at
    # ~8*4n/32 ≈ 16k here and leave the armed path unexercised)
    labels = connected_components(
        df, max_iter=20, hot_degree=1000, skew_factor=0, stats=stats
    )
    got = {(r.id, r.component) for r in labels.collect()}
    exp = set(reference_components(edges).items())
    assert got == exp
    assert stats["rounds"] <= 18, stats
    # the contracted edge set must reach a fixpoint, not plateau mid-merge
    assert stats["edge_counts"][-1] == stats["edge_counts"][-2]


def test_cc_relative_hot_threshold_telemetry(spark):
    """The effective hot threshold is max(floor, skew_factor*4n//P),
    re-derived per round, and the pigeonhole gate skips probes (None in
    stats) exactly when 2n ≤ threshold. Labels are identical across all
    three policies (the levers only change the physical plan)."""
    shuffle_p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = [("h", f"leaf{i:03d}") for i in range(200)]
    df = spark.createDataFrame(edges, EDGE_SCHEMA)
    exp = set(reference_components(edges).items())

    # relative term dominates a tiny floor; probes armed (2n > thr)
    stats: dict = {}
    got = {
        (r.id, r.component)
        for r in connected_components(
            df, hot_degree=50, skew_factor=8, stats=stats
        ).collect()
    }
    assert got == exp
    thr0 = max(50, 8 * 4 * 200 // shuffle_p)
    assert stats["hot_thresholds"][0] == thr0
    assert 2 * 200 > thr0  # the telemetry proves the probes ran

    # default floor ≫ 2n: every round pigeonhole-skips its probes
    stats2: dict = {}
    got2 = {
        (r.id, r.component)
        for r in connected_components(df, stats=stats2).collect()
    }
    assert got2 == exp
    assert stats2["hot_thresholds"] == [None] * stats2["rounds"]

    # skew_factor=0 → pure absolute threshold (the forced-split tests'
    # escape hatch)
    stats3: dict = {}
    got3 = {
        (r.id, r.component)
        for r in connected_components(
            df, hot_degree=50, skew_factor=0, stats=stats3
        ).collect()
    }
    assert got3 == exp
    assert stats3["hot_thresholds"][0] == 50


def test_cc_salted_path_equals_unsalted(spark):
    """Targeted salting (hot_degree low enough to trip on the corpus's
    hot entity) must produce the identical labeling as the plain path."""
    from cyclegraph_spark.operators.triples import OWL_SAMEAS, lift_html_pages
    from cyclegraph_spark.sources.pages import pages_df

    triples = lift_html_pages(pages_df(spark, 300, partitions=8))
    edges = triples.filter(F.col("pred") == OWL_SAMEAS).select(
        F.col("subj").alias("src"), F.col("dst_") if False else F.col("obj").alias("dst")
    )
    plain = {(r.id, r.component) for r in connected_components(edges, salt=0).collect()}
    salted = {
        (r.id, r.component)
        for r in connected_components(
            edges, salt=8, hot_degree=10, skew_factor=0
        ).collect()
    }
    assert plain == salted
    exp = reference_components([(r.src, r.dst) for r in edges.collect()])
    assert salted == set(exp.items())


def test_cc_hot_entity_skew_from_corpus(spark):
    """End-to-end: sameAs edges lifted from the corpus; hot entity e0000
    appears on ~20% of pages → one big star component."""
    from cyclegraph_spark.operators.triples import OWL_SAMEAS, lift_html_pages
    from cyclegraph_spark.sources.pages import pages_df

    triples = lift_html_pages(pages_df(spark, 400, partitions=8))
    edges = triples.filter(F.col("pred") == OWL_SAMEAS).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    labels = connected_components(edges)
    exp = reference_components([(r.src, r.dst) for r in edges.collect()])
    got = {(r.id, r.component) for r in labels.collect()}
    assert got == set(exp.items())

    # the hot component has many members (site-local URIs from many sites)
    sizes = labels.groupBy("component").count()
    hot = sizes.orderBy(F.col("count").desc()).first()
    assert "e0000" in hot.component or hot["count"] >= 50


def test_canonicalize_triples_dedup(spark):
    triples = spark.createDataFrame(
        [
            ("site1/ent/7", "p:knows", "site2/ent/9", "uri"),
            ("kg/e7", "p:knows", "kg/e9", "uri"),  # same fact post-canon
            ("kg/e7", "p:name", "Alice", "str"),
        ],
        T.StructType(
            [T.StructField(c, T.StringType()) for c in ["subj", "pred", "obj", "obj_dtype"]]
        ),
    )
    labels = spark.createDataFrame(
        [("site1/ent/7", "kg/e7"), ("site2/ent/9", "kg/e9"), ("kg/e7", "kg/e7"), ("kg/e9", "kg/e9")],
        T.StructType([T.StructField("id", T.StringType()), T.StructField("component", T.StringType())]),
    )
    out = {(r.subj, r.pred, r.obj) for r in canonicalize_triples(triples, labels).collect()}
    assert out == {("kg/e7", "p:knows", "kg/e9"), ("kg/e7", "p:name", "Alice")}
