"""The flagship triple factory — end-to-end KG construction pipeline.

pages(url, warc_ts, html, [text], lang)
  → resume-prune (anti-filter completed source buckets — BEFORE the
    expensive stages, so a resumed run re-reads only missing buckets)
  → extract text        (vectorized pandas UDF, the only Python stage)
  → lift triples        (microdata/RDFa/JSON-LD islands, P1 coercion)
  → SHACL validate      (SQL predicates → violations table)
  → link mentions       (n-gram candidates × broadcast alias dict)
  → canonicalize        (sameAs CC label propagation + dedup)
  → materialize         (bucketed parquet + manifest + lineage)

Per-stage lineage rows mirror the reference's per-step duration logging
(/root/reference/cli/session.py:338-352 ``_timed``).

The pipeline is lazy end-to-end until materialize; stage row counts are
collected from the materialized outputs (one extra partition-pruned
scan), not from mid-plan ``.count()`` actions that would re-execute the
expensive prefix.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cyclegraph_spark.extract.text import extract_text_udf
from cyclegraph_spark.operators.cc import canonicalize_triples, connected_components
from cyclegraph_spark.operators.linking import link_mentions
from cyclegraph_spark.operators.shacl import NodeShape, validate
from cyclegraph_spark.operators.triples import OWL_SAMEAS, lift_html_pages
from cyclegraph_spark.plans.materialize import (
    CheckpointManifest,
    append_lineage,
    materialize_triples,
    read_labels,
    recanonicalize_store,
    write_labels,
)


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    run_id: str,
    shapes: list[NodeShape] | None = None,
    aliases: DataFrame | None = None,
    n_buckets: int = 32,
) -> dict:
    """Run the factory; returns per-stage metrics {stage: {rows, sec}}."""
    os.makedirs(out_dir, exist_ok=True)
    metrics: dict[str, dict] = {}

    # --- resume prune on source bucket (high-watermark analog)
    done = CheckpointManifest(out_dir).completed()
    pages = pages.withColumn(
        "part_id", F.pmod(F.xxhash64(F.col("url")), F.lit(n_buckets)).cast("int")
    )
    if done:
        pages = pages.filter(~F.col("part_id").isin(*[int(d) for d in done]))

    # --- extract (skipped when the corpus already carries text).
    # Eagerly materialized: BOTH lift (html) and linking (text) consume
    # pages — without the checkpoint the pandas-UDF extraction re-runs
    # per consumer (measured: the link stage quadrupled).
    t0 = time.time()
    if "text" not in pages.columns:
        pages = pages.withColumn("text", extract_text_udf(F.col("html")))
    if aliases is not None:
        pages = pages.localCheckpoint(eager=True)
        metrics["extract"] = {"sec": round(time.time() - t0, 3)}

    # --- lift. Materialize ONCE (eager localCheckpoint): CC, canonicalize
    # and the store write all consume `triples`; without this the
    # extract+lift prefix would re-execute for each consumer (measured:
    # the CC stage tripled in cost from lift recomputation).
    t0 = time.time()
    triples = (
        lift_html_pages(pages)
        .withColumn("part_id", F.pmod(F.xxhash64(F.col("src")), F.lit(n_buckets)).cast("int"))
        .localCheckpoint(eager=True)
    )
    metrics["lift"] = {"sec": round(time.time() - t0, 3)}

    # --- canonicalize (CC over sameAs edges, then rewrite + dedup).
    # RESUME CORRECTNESS: a pruned run only sees the remaining buckets'
    # sameAs edges — entities spanning completed and new buckets would get
    # component minima computed over a SUBGRAPH, diverging from a fresh
    # run. Fix: union the persisted labels table (id→component rows are
    # connectivity facts capturing everything earlier runs learned) into
    # the CC input, then remap any store rows whose canonical id changed.
    t0 = time.time()
    edges = triples.filter(F.col("pred") == OWL_SAMEAS).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    prior = read_labels(spark, out_dir) if done else None
    if prior is not None:
        edges = edges.unionByName(
            prior.select(F.col("id").alias("src"), F.col("component").alias("dst"))
        )
    cc_stats: dict = {}
    labels = connected_components(edges, stats=cc_stats)
    if prior is not None:
        # stale ids: old canonical assignment != new one. Store rows hold
        # OLD canonical values (old component minima or never-labeled raw
        # ids), so remap FROM the old canonical TO the new component.
        remap = (
            labels.join(
                prior.select("id", F.col("component").alias("_old_comp")), "id", "left"
            )
            .withColumn("_old_canon", F.coalesce(F.col("_old_comp"), F.col("id")))
            .filter(F.col("component") != F.col("_old_canon"))
            .select(
                F.col("_old_canon").alias("from_id"),
                F.col("component").alias("to_id"),
            )
            .distinct()
        )
        rc = recanonicalize_store(spark, out_dir, remap, run_id)
        if rc["partitions"]:
            metrics["recanonicalize"] = {"rows": rc["rows"], "sec": round(time.time() - t0, 3)}
    # persist AFTER the store rewrite: if we crash in between, the next
    # resume recomputes the same merge against the OLD labels and the
    # rewrite replays as a no-op; persisting first would hide the merge
    # (prior == new ⇒ empty remap) and leave stale rows forever.
    write_labels(labels, out_dir)
    # canonicalize against the labels JUST WRITTEN, read back from
    # parquet, not the in-memory CC plan: the file-backed side (a) stops
    # the materialize action from re-executing the whole CC tail (verts
    # distinct + star agg + join — measured 9 Exchanges → 3 in the canon
    # plan, 2.1 s → 0.9 s at 20k pages), and (b) carries accurate
    # file-based size stats, so the planner's broadcast-vs-shuffle choice
    # for the labels join stays correct at any scale (guide §3.1: size
    # estimates through joins/aggs are unreliable; file stats are not).
    canon = canonicalize_triples(
        triples, read_labels(spark, out_dir), keep_cols=("src", "part_id")
    )
    metrics["cc"] = {
        "sec": round(time.time() - t0, 3),
        "rounds": cc_stats.get("rounds"),
        "edges": (cc_stats.get("edge_counts") or [None])[-1],
    }

    # --- link BEFORE the manifest commit, idempotently: links are
    # partitioned by the same provenance bucket and written with DYNAMIC
    # partition overwrite, so a crashed-then-resumed run rewrites exactly
    # its buckets instead of double-appending. The checkpoint manifest
    # (committed in materialize, below) is the LAST step — a bucket is
    # only marked complete once every derived output for it has landed.
    if aliases is not None:
        t0 = time.time()
        links = link_mentions(
            pages.select("url", "text", "part_id"), aliases, key_cols=("url", "part_id")
        ).select("url", "pos", "alias", "entity_id", "score", "part_id")
        (
            # rebalance-by-bucket before the write: one file per bucket
            # instead of (write tasks × buckets) splinters (guide §6)
            links.hint("rebalance", "part_id")
            .write.partitionBy("part_id")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(os.path.join(out_dir, "links"))
        )
        spark.catalog.refreshByPath(os.path.join(out_dir, "links"))
        n = spark.read.parquet(os.path.join(out_dir, "links")).count()
        metrics["link"] = {"rows": n, "sec": round(time.time() - t0, 3)}

    # --- materialize canonical triples (manifest + lineage; bucket =
    # provenance/url bucket so resume-prune and manifest ids agree).
    # Commits the checkpoint manifest — completion marker for the run.
    t0 = time.time()
    res = materialize_triples(
        canon, out_dir, run_id, n_buckets=n_buckets, stage="materialize"
    )
    metrics["materialize"] = {
        "rows": res["rows"],
        "sec": round(time.time() - t0, 3),
        "written": res["written"],
        "skipped": res["skipped"],
    }

    # --- validate (a REPORT over the whole materialized store: full
    # recompute + overwrite each run, so it is idempotent by design and
    # correct even for subjects whose triples span buckets)
    if shapes:
        t0 = time.time()
        store = spark.read.parquet(os.path.join(out_dir, "data"))
        report = validate(store, shapes)
        report.write.mode("overwrite").parquet(os.path.join(out_dir, "violations"))
        n = spark.read.parquet(os.path.join(out_dir, "violations")).count()
        metrics["validate"] = {"rows": n, "sec": round(time.time() - t0, 3)}

    # --- node table (north-rule companion artifact): derived wholly
    # from the materialized store, full recompute + overwrite per run —
    # idempotent by construction, same discipline as the validate report
    t0 = time.time()
    from cyclegraph_spark.operators.nodes import node_table

    store = spark.read.parquet(os.path.join(out_dir, "data"))
    nodes = node_table(store).withColumn(
        "bucket", F.pmod(F.xxhash64("id"), F.lit(n_buckets)).cast("int")
    )
    (
        # rebalance (AQE-splittable) rather than a hard repartition: same
        # one-file-per-bucket layout locally, but a hot bucket can still
        # fan out over several write tasks at scale
        nodes.hint("rebalance", "bucket")
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(os.path.join(out_dir, "nodes"))
    )
    spark.catalog.refreshByPath(os.path.join(out_dir, "nodes"))
    n = spark.read.parquet(os.path.join(out_dir, "nodes")).count()
    metrics["nodes"] = {"rows": n, "sec": round(time.time() - t0, 3)}

    append_lineage(
        out_dir,
        [
            {"run_id": run_id, "stage": k, **{kk: vv for kk, vv in v.items() if kk != "written"}}
            for k, v in metrics.items()
        ],
    )
    return metrics
