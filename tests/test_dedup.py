"""Parity + quality checks for the non-SQL dedup/similarity operators
(MinHash LSH, SimHash, hyperplane-LSH ANN) against single-node oracles."""

import pytest
from pyspark.sql import functions as F

from cyclegraph_spark.operators.dedup import (
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    reference_jaccard,
    simhash,
    simhash_near_pairs,
)
from cyclegraph_spark.operators.similarity import (
    cosine_topk,
    lsh_topk,
    reference_cosine_topk,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def doc_texts(docs):
    return {r.doc_id: r.text for r in docs.collect()}


def test_ngram_jaccard_matches_oracle_exactly(spark, docs, doc_texts):
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.12).collect()
    }
    assert len(got) > 0, "threshold too high — 0 pairs is no evidence"
    for (a, b), j in got.items():
        assert abs(j - reference_jaccard(doc_texts[a], doc_texts[b])) < 1e-9


def test_minhash_estimates_jaccard(spark, docs, doc_texts):
    sigs = minhash_signatures(docs, k=64)
    pairs = minhash_lsh_pairs(sigs, bands=16, rows=4, est_threshold=0.1).collect()
    assert len(pairs) > 0
    for r in pairs:
        exact = reference_jaccard(doc_texts[r.doc_a], doc_texts[r.doc_b])
        # 64-hash estimate: tolerance ~3σ = 3·sqrt(j(1-j)/64) ≤ 0.19
        assert abs(r.est_jaccard - exact) <= 0.25, (
            f"pair ({r.doc_a},{r.doc_b}): est {r.est_jaccard} vs exact {exact}"
        )


def test_minhash_lsh_recall_vs_exact(spark, docs):
    """Every truly-similar pair (jaccard >= 0.3) must be surfaced by LSH
    with 16 bands × 4 rows (collision prob at j=0.3: 1-(1-0.3^4)^16 ≈ 0.12;
    at j=0.5: ≈ 0.64; at j=0.7: ≈ 0.99) — so assert recall only at ≥0.7."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.7).collect()
    }
    sigs = minhash_signatures(docs, k=64)
    lsh = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(sigs, bands=16, rows=4, est_threshold=0.0).collect()
    }
    missed = exact - lsh
    assert not missed, f"LSH missed high-similarity pairs: {missed}"


def test_minhash_signatures_parallelism_invariant(spark, docs):
    s1 = {r.doc: tuple(r.sig) for r in minhash_signatures(docs, k=64).collect()}
    s2 = {
        r.doc: tuple(r.sig)
        for r in minhash_signatures(docs.repartition(16), k=64).collect()
    }
    assert s1 == s2
    assert all(len(v) == 64 for v in s1.values())


def test_simhash_deterministic_and_near_pairs(spark, docs):
    s1 = {r.doc: r.simhash for r in simhash(docs).collect()}
    s2 = {r.doc: r.simhash for r in simhash(docs.repartition(16)).collect()}
    assert s1 == s2  # parallelism-invariant signatures
    assert all(v >= 0 for v in s1.values())  # 63-bit, non-negative
    pairs = simhash_near_pairs(simhash(docs), max_hamming=6).collect()
    assert all(r.hamming <= 6 for r in pairs)


def test_simhash_banding_full_recall(spark, docs):
    """Pigeonhole guarantee: with bands = max_hamming + 1, the banded
    plan must surface EVERY pair within the hamming budget — compare
    exactly against brute force over the collected signatures."""
    sigs = {r.doc: r.simhash for r in simhash(docs).collect()}
    ids = sorted(sigs)
    for max_h in (4, 6):
        brute = {
            (a, b): bin(sigs[a] ^ sigs[b]).count("1")
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
            if bin(sigs[a] ^ sigs[b]).count("1") <= max_h
        }
        got = {
            (r.doc_a, r.doc_b): r.hamming
            for r in simhash_near_pairs(simhash(docs), max_hamming=max_h).collect()
        }
        assert got == brute, f"banding lost/invented pairs at max_hamming={max_h}"
    assert len(got) > 0, "0-pair parity is no evidence"


def test_simhash_banding_rejects_too_few_bands(spark, docs):
    """bands <= max_hamming breaks the pigeonhole full-recall guarantee —
    the operator must refuse loudly, not silently lose pairs."""
    import pytest

    sigs = simhash(docs)
    with pytest.raises(ValueError, match="must exceed max_hamming"):
        simhash_near_pairs(sigs, max_hamming=6, bands=6)
    with pytest.raises(ValueError, match="must exceed max_hamming"):
        simhash_near_pairs(sigs, max_hamming=6, bands=3)


def test_ngram_cap_counts_before_collect_set(spark, docs):
    """Scale audit: the df cap must be applied by a count aggregate (a
    child of the collect_set agg), never by filtering collect_set output
    — an unbounded posting set on a boilerplate shingle OOMs a reducer.
    Audited on the pre-checkpoint posting-list plan (the operator
    eagerly checkpoints it, which truncates the visible lineage). In
    the optimized plan tree children print BELOW parents, so the
    count-filter text must appear after 'collect_set'."""
    from cyclegraph_spark.operators.dedup import (
        _capped_posting_lists,
        _doc_shingles,
    )

    sh = _doc_shingles(docs, "doc_id", "text").distinct()
    plan = _capped_posting_lists(
        sh, 16
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "collect_set" in plan
    filters = [ln for ln in plan.splitlines() if "<= 16" in ln and "Filter" in ln]
    assert filters, "df-cap filter missing from the plan"
    assert plan.index("collect_set") < plan.index(filters[0]), (
        "df-cap filter sits above collect_set — posting sets unbounded"
    )
    # the old post-hoc shape applied the cap to collect_set output
    assert not [
        ln for ln in plan.splitlines() if "size(docs" in ln and "<= 16" in ln
    ]


def test_embedding_near_dups_lsh_recall(spark):
    """LSH-bucketed near-dup pairs must be a subset of exact pairs with
    exact cosine scores, and recall the top pair."""
    from cyclegraph_spark.operators.similarity import embedding_near_dups

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = {
        (r.id_a, r.id_b): r.cos_sim
        for r in embedding_near_dups(emb, threshold=0.4).collect()
    }
    assert len(exact) > 0
    lsh = {
        (r.id_a, r.id_b): r.cos_sim
        for r in embedding_near_dups(emb, threshold=0.4, n_planes=4).collect()
    }
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert abs(v - exact[k]) < 1e-9  # scores are true cosines
    top_pair = max(exact, key=exact.get)
    assert exact[top_pair] < 0.55  # random embeddings sanity
    # 4-plane buckets keep vectors agreeing on all planes; the most
    # similar pair should usually survive — assert non-trivial recall
    assert len(lsh) >= max(1, len(exact) // 20)


def test_cosine_topk_matches_oracle(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = [(r.vec_id, list(r.embedding)) for r in emb.collect()]
    query = next(v for vid, v in rows if vid == 0)
    cands = [(vid, v) for vid, v in rows if vid != 0]

    got = [(r.vec_id, r.cos_sim) for r in cosine_topk(
        emb.filter(F.col("vec_id") != 0), query, k=10
    ).collect()]
    exp = reference_cosine_topk(cands, query, k=10)
    assert [v for v, _ in got] == [v for v, _ in exp]
    for (gv, gs), (ev, es) in zip(got, exp):
        assert abs(gs - es) < 1e-9


def test_lsh_topk_subset_of_brute_force_ranking(spark):
    """ANN results must be true cosines (no approximation of the score)
    and rank consistently with brute force on the candidate subset."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    query = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    brute = {r.vec_id: r.cos_sim for r in cosine_topk(
        emb.filter(F.col("vec_id") != 0), query, k=500
    ).collect()}
    approx = [(r.vec_id, r.cos_sim) for r in lsh_topk(
        emb.filter(F.col("vec_id") != 0), query, k=10, n_planes=8, probe_hamming=4
    ).collect()]
    assert len(approx) > 0
    for vid, sim in approx:
        assert abs(brute[vid] - sim) < 1e-9
    # recall@10 of the ANN path: top-1 true neighbor should be found with
    # 2-bit multiprobe on 8 planes most of the time; assert ≥ 3 of top 10
    true_top = [vid for vid, _ in sorted(brute.items(), key=lambda t: (-t[1], t[0]))[:10]]
    hit = len(set(vid for vid, _ in approx) & set(true_top))
    assert hit >= 3, f"ANN recall too low: {hit}/10"


def test_dedup_clusters_matches_unionfind_twin(spark, docs, doc_texts):
    """pairs→CC→canonical must equal reference_jaccard over all pairs
    fed through the union-find twin (transitive closure included)."""
    from itertools import combinations

    from cyclegraph_spark.operators.cc import reference_components
    from cyclegraph_spark.operators.dedup import dedup_clusters

    got = {
        (r.doc_id, r.canonical_id)
        for r in dedup_clusters(docs, threshold=0.3).collect()
    }
    pairs = [
        (a, b)
        for a, b in combinations(sorted(doc_texts), 2)
        if reference_jaccard(doc_texts[a], doc_texts[b]) >= 0.3
    ]
    exp = set(reference_components(pairs).items())
    assert got == exp
    assert len(got) > 2, "corpus yielded no multi-doc clusters — no evidence"
    # transitivity: at least one cluster of size >= 2 shares a canonical id
    by_canon: dict = {}
    for d, c in got:
        by_canon.setdefault(c, []).append(d)
    assert max(len(v) for v in by_canon.values()) >= 2


def test_pii_redaction_semantics(spark):
    """Counts come from progressively-redacted text (an IPv4 must not
    double-count as a phone) and redaction replaces every occurrence."""
    from cyclegraph_spark.operators.textstats import pii_counts, redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b@x.io and c@y.co.uk ip 10.0.0.1 tel +47 22 33 44 55 end"),
            (2, "no pii here at all"),
        ],
        "id long, text string",
    )
    c = pii_counts(F.col("text"))
    rows = {
        r.id: r
        for r in df.select(
            "id", *[c[k].alias(k) for k in ("n_email", "n_ipv4", "n_phone")],
            redact_pii(F.col("text")).alias("red"),
        ).collect()
    }
    assert (rows[1].n_email, rows[1].n_ipv4, rows[1].n_phone) == (2, 1, 1)
    assert "[EMAIL]" in rows[1].red and "[IP]" in rows[1].red and "[PHONE]" in rows[1].red
    assert "@" not in rows[1].red and "10.0.0.1" not in rows[1].red
    assert rows[2].red == "no pii here at all"


def test_split_contamination_planted(spark):
    """A copied doc across splits must read contamination 1.0; a unique
    eval doc 0.0 (no shingle in train)."""
    from cyclegraph_spark.operators.dedup import split_contamination

    df = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),   # train
            (8, "alpha beta gamma delta epsilon zeta"),   # eval copy → 1.0
            (9, "one two three four five six"),           # eval unique → 0.0
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in split_contamination(df, is_train=(F.col("doc_id") % 10) < 8).collect()
    }
    assert set(out) == {8, 9}
    assert out[8].contamination == 1.0
    assert out[9].contamination == 0.0


def test_canonical_url_rules(spark):
    from cyclegraph_spark.functions.urls import canonical_url

    cases = [
        ("HTTP://WWW.Ex.COM:80/A/b?z=2&a=1#frag", "http://www.ex.com/A/b?a=1&z=2"),
        ("https://ex.com:443", "https://ex.com/"),
        ("https://ex.com:8443/x", "https://ex.com:8443/x"),  # non-default port kept
        ("http://ex.com/p?utm_source=x&utm_campaign=y", "http://ex.com/p"),
        ("http://ex.com/p?", "http://ex.com/p"),
        ("http://ex.com:443/p", "http://ex.com:443/p"),  # 443 on http kept
        # non-absolute inputs pass through unchanged (no ':///' collapse)
        ("mailto:someone@ex.com", "mailto:someone@ex.com"),
        ("/relative/path?a=1", "/relative/path?a=1"),
        ("bare-host.example", "bare-host.example"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.c for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == [e for _, e in cases]


def test_hash_split_stable_and_proportional(spark):
    from cyclegraph_spark.operators.dedup import hash_split

    df = spark.range(10_000).select(F.col("id").alias("doc_id"))
    out = {
        r.split: r.n
        for r in df.select(hash_split(F.col("doc_id")).alias("split"))
        .groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = sum(out.values())
    assert total == 10_000
    assert abs(out["train"] / total - 0.797) < 0.02  # cc/256
    assert abs(out["val"] / total - 0.102) < 0.01
    # stable under repartitioning
    out2 = {
        r.split: r.n
        for r in df.repartition(32)
        .select(hash_split(F.col("doc_id")).alias("split"))
        .groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert out2 == out


def test_check_unique_guard_raises_on_duplicate_ids(spark):
    """Opt-in unique-id precondition guard (round-4 VERDICT #6): library
    callers with a non-keyed input get a loud ValueError instead of
    silently wrong jaccard / merged signatures; unique inputs pass and
    produce identical results with the guard on."""
    import pytest as _pytest

    from cyclegraph_spark.operators.dedup import (
        minhash_signatures,
        ngram_jaccard_pairs,
    )

    dup = spark.createDataFrame(
        [(1, "a b c d e"), (1, "a b c x y"), (2, "a b c d e")],
        "doc_id long, text string",
    )
    with _pytest.raises(ValueError, match="duplicates"):
        ngram_jaccard_pairs(dup, check_unique=True).collect()
    with _pytest.raises(ValueError, match="duplicates"):
        minhash_signatures(dup, check_unique=True).collect()

    uniq = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "q r s t u")],
        "doc_id long, text string",
    )
    guarded = sorted(
        map(tuple, ngram_jaccard_pairs(uniq, check_unique=True).collect())
    )
    plain = sorted(map(tuple, ngram_jaccard_pairs(uniq).collect()))
    assert guarded == plain and len(guarded) == 1


def test_check_unique_guard_raises_on_null_ids(spark):
    """NULL ids evade a rows-vs-distinct comparison (count(col) and
    count_distinct both skip nulls) yet merge into one groupBy key
    downstream — the guard must catch them explicitly (ADVICE r5)."""
    import pytest as _pytest

    from cyclegraph_spark.operators.dedup import (
        minhash_signatures,
        ngram_jaccard_pairs,
    )

    nulls = spark.createDataFrame(
        [(None, "a b c d e"), (None, "a b c x y"), (2, "q r s t u")],
        "doc_id long, text string",
    )
    with _pytest.raises(ValueError, match="NULL"):
        ngram_jaccard_pairs(nulls, check_unique=True).collect()
    with _pytest.raises(ValueError, match="NULL"):
        minhash_signatures(nulls, check_unique=True).collect()
