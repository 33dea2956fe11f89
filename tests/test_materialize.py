"""M6 — materialization, lineage, checkpoint manifest, idempotent resume."""

import json
import os

import pytest
from pyspark.sql import functions as F

from cyclegraph_spark.plans.materialize import (
    CheckpointManifest,
    compact_store,
    materialize_triples,
)
from cyclegraph_spark.plans.pipeline import run_pipeline
from cyclegraph_spark.sources.pages import alias_df, pages_df


@pytest.fixture()
def triples(spark):
    from cyclegraph_spark.operators.triples import lift_html_pages

    return lift_html_pages(pages_df(spark, 150, partitions=4))


def test_materialize_and_manifest(spark, triples, tmp_path):
    out = str(tmp_path / "store")
    res = materialize_triples(triples, out, run_id="r1", n_buckets=8, bucket_on="src")
    assert res["rows"] == triples.count()
    assert res["skipped"] == []
    man = json.loads((tmp_path / "store" / "manifest.json").read_text())
    assert len(man["partitions"]) == len(res["written"])
    assert os.path.exists(out + "/lineage.jsonl")


def test_resume_skips_completed_buckets(spark, triples, tmp_path):
    out = str(tmp_path / "store")
    first = materialize_triples(triples, out, run_id="r1", n_buckets=8, bucket_on="src")
    total = spark.read.parquet(out + "/data").count()

    # full re-run: everything skipped, nothing appended
    second = materialize_triples(triples, out, run_id="r2", n_buckets=8, bucket_on="src")
    assert second["rows"] == 0
    assert second["skipped"] == first["written"]
    assert spark.read.parquet(out + "/data").count() == total


def test_partial_resume_completes_store(spark, triples, tmp_path):
    """Simulate a crash after half the buckets committed: resume writes
    exactly the missing buckets; final content equals a one-shot run."""
    out = str(tmp_path / "store")
    ref_out = str(tmp_path / "ref")
    materialize_triples(triples, ref_out, run_id="ref", n_buckets=8, bucket_on="src")
    ref_fp = {
        (r.part_id, r.rows, r.xhash)
        for r in spark.read.parquet(ref_out + "/data")
        .groupBy("part_id")
        .agg(F.count(F.lit(1)).alias("rows"),
             F.expr("bit_xor(xxhash64(src, subj, pred, obj, obj_dtype))").alias("xhash"))
        .collect()
    }

    # crashed run: only buckets 0..3 committed
    crashed = triples.withColumn(
        "part_id", F.pmod(F.xxhash64(F.col("src")), F.lit(8)).cast("int")
    ).filter(F.col("part_id") < 4)
    materialize_triples(crashed, out, run_id="crash", n_buckets=8)
    assert set(CheckpointManifest(out).completed()) == {0, 1, 2, 3}

    res = materialize_triples(triples, out, run_id="resume", n_buckets=8, bucket_on="src")
    assert sorted(res["skipped"]) == [0, 1, 2, 3]
    got_fp = {
        (r.part_id, r.rows, r.xhash)
        for r in spark.read.parquet(out + "/data")
        .groupBy("part_id")
        .agg(F.count(F.lit(1)).alias("rows"),
             F.expr("bit_xor(xxhash64(src, subj, pred, obj, obj_dtype))").alias("xhash"))
        .collect()
    }
    assert got_fp == ref_fp


def test_fingerprint_parallelism_invariant(spark, tmp_path):
    """Same corpus at different parallelism → identical manifest
    fingerprints (determinism precondition for the scaling bench)."""
    from cyclegraph_spark.operators.triples import lift_html_pages

    fps = []
    for parts in (2, 8):
        out = str(tmp_path / f"store{parts}")
        tr = lift_html_pages(pages_df(spark, 100, partitions=parts))
        materialize_triples(tr, out, run_id="x", n_buckets=4, bucket_on="src")
        man = json.loads((tmp_path / f"store{parts}" / "manifest.json").read_text())
        fps.append(man["partitions"])
    assert fps[0] == fps[1]


def test_full_pipeline_and_compaction(spark, tmp_path):
    from pathlib import Path

    from cyclegraph_spark.operators.shacl import parse_shapes_ttl

    out = str(tmp_path / "kg")
    shapes = parse_shapes_ttl(Path("/root/reference/shapes/session_shape.ttl").read_text())
    aliases = alias_df(spark, n_entities=100)
    pages = pages_df(spark, 120, n_entities=100, partitions=4)

    m = run_pipeline(spark, pages, out, run_id="r1", shapes=shapes, aliases=aliases, n_buckets=8)
    assert m["materialize"]["rows"] > 0
    assert m["validate"]["rows"] > 0  # corpus has malformed power values
    assert m["link"]["rows"] > 0

    # canonicalization rewired site-local URIs to global kg ids
    store = spark.read.parquet(out + "/data")
    assert store.filter(F.col("subj").contains("kg.example/entity/")).count() > 0

    # resume: second run writes nothing new; links stay stable (dynamic
    # overwrite with an empty frame touches no partitions)
    n_links = spark.read.parquet(out + "/links").count()
    m2 = run_pipeline(spark, pages, out, run_id="r2", n_buckets=8, aliases=aliases)
    assert m2["materialize"]["rows"] == 0
    assert spark.read.parquet(out + "/links").count() == n_links

    # crash-replay: wipe the manifest (simulates dying before the commit)
    # and re-run — neither links NOR store triples may double
    # (idempotent dynamic partition overwrite on both writers)
    n_store = spark.read.parquet(out + "/data").count()
    os.remove(out + "/manifest.json")
    run_pipeline(spark, pages, out, run_id="r3", n_buckets=8, aliases=aliases)
    assert spark.read.parquet(out + "/links").count() == n_links
    assert spark.read.parquet(out + "/data").count() == n_store

    # compaction dedups globally and re-buckets by subject (re-read the
    # store: the pre-replay DataFrame references replaced files)
    store2 = spark.read.parquet(out + "/data")
    n = compact_store(spark, out, str(tmp_path / "compact"), n_buckets=8)
    assert 0 < n <= store2.select("subj", "pred", "obj", "obj_dtype").distinct().count()
