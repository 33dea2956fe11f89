"""Graph materialization — partitioned triple store with per-partition
lineage rows and a sha256 checkpoint manifest for idempotent resume.

Reference semantics transplanted:
- deterministic export pack: sorted JSONL + sha256 manifest
  (/root/reference/server/analysis/final14.py:18-32,248-254;
  /root/reference/server/analysis/export13.py:26-39) → here: a
  content-addressed per-partition fingerprint (order-independent
  bit_xor of row hashes — stable at any parallelism, unlike a hash of
  a row ORDER, which a distributed write cannot guarantee cheaply);
- atomic write+rename (/root/reference/server/routes/sessions.py:85-96)
  → manifest written to a temp file then os.replace;
- high-watermark resume (/root/reference/cli/strava_import.py:289-313,
  state/last_import.json) → completed-partition set; a re-run
  anti-filters completed buckets BEFORE the expensive stages, so the
  filter prunes at the source (predicate pushdown on the bucket id).

Layout (Iceberg-style: data files + manifest metadata):
    out_dir/data/part_id=<k>/*.parquet
    out_dir/manifest.json        {run_id, partitions: {k: {rows, xhash}}}
    out_dir/lineage.jsonl        one row per (run, stage, partition)

Partitioning: part_id = pmod(xxhash64(subj), n_buckets) — subject-hash
bucketing co-locates all triples of an entity (the access pattern of
SHACL validation and star queries) and spreads hot predicates evenly.
n_buckets is explicit (north rule: explicit partition counts); at 100 TB
you'd raise it to O(10⁴-10⁵) so each bucket stays ≲ 1 GB.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MANIFEST = "manifest.json"
LINEAGE = "lineage.jsonl"


class CheckpointManifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, MANIFEST)
        self.state: dict = {"run_id": None, "partitions": {}}
        if os.path.exists(self.path):
            with open(self.path, encoding="utf-8") as f:
                self.state = json.load(f)

    def completed(self) -> set[int]:
        return {int(k) for k in self.state["partitions"]}

    def record(self, part_id: int, rows: int, xhash: int) -> None:
        self.state["partitions"][str(part_id)] = {"rows": rows, "xhash": xhash}

    def save(self, run_id: str) -> None:
        self.state["run_id"] = run_id
        body = json.dumps(self.state, sort_keys=True, indent=1)
        self.state["sha256"] = hashlib.sha256(body.encode()).hexdigest()
        tmp = self.path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(self.state, f, sort_keys=True, indent=1)
        os.replace(tmp, self.path)  # atomic write+rename


def append_lineage(out_dir: str, rows: list[dict]) -> None:
    path = os.path.join(out_dir, LINEAGE)
    with open(path, "a", encoding="utf-8") as f:
        for r in rows:
            f.write(json.dumps(r, sort_keys=True) + "\n")


def with_bucket(triples: DataFrame, n_buckets: int, on: str = "subj") -> DataFrame:
    """Attach the bucket id. ``on="subj"`` gives the entity-co-located
    store layout; ``on="src"`` (source url) buckets by provenance so a
    resumed run can prune completed buckets BEFORE extraction."""
    return triples.withColumn(
        "part_id", F.pmod(F.xxhash64(F.col(on)), F.lit(n_buckets)).cast("int")
    )


def materialize_triples(
    triples: DataFrame,
    out_dir: str,
    run_id: str,
    n_buckets: int = 32,
    stage: str = "materialize",
    bucket_on: str = "subj",
) -> dict:
    """Write triples bucketed by hash; skip buckets already in the
    checkpoint manifest; record lineage + fingerprints.

    Returns {written: [part_ids], skipped: [part_ids], rows: n}.
    """
    os.makedirs(out_dir, exist_ok=True)
    manifest = CheckpointManifest(out_dir)
    done = manifest.completed()
    data_dir = os.path.join(out_dir, "data")

    bt = triples if "part_id" in triples.columns else with_bucket(triples, n_buckets, bucket_on)
    if done:
        bt = bt.filter(~F.col("part_id").isin(*[int(d) for d in done]))

    t0 = time.time()
    # REBALANCE by bucket before the partitioned write (guide §6): with
    # the source's own partitioning every task holding rows of bucket k
    # opens a file under part_id=k — measured 589 files / 1.84 s for a
    # 25 MB store vs 32 files / 0.60 s rebalanced. The hint (vs a plain
    # repartition) lets AQE split oversized buckets into several write
    # tasks at scale, so one hot bucket cannot serialize the write.
    bt = bt.hint("rebalance", "part_id")
    # DYNAMIC partition overwrite, not append: a bucket that is being
    # (re)processed replaces its directory atomically on job commit, so
    # replaying a crashed run (manifest never committed) cannot
    # double-append rows; completed buckets are filtered out above and
    # therefore never touched.
    (
        bt.write.partitionBy("part_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(data_dir)
    )
    # the overwrite replaced files under data_dir — drop the session's
    # cached file listing or later reads resolve to deleted parquet parts
    bt.sparkSession.catalog.refreshByPath(data_dir)

    # per-partition stats from what we just wrote (scan is partition-pruned
    # to the new buckets); bit_xor of row hashes = order-independent
    # content fingerprint, reproducible at any parallelism. Hash covers
    # every data column (incl. provenance) so duplicate quads from two
    # sources can't cancel out of the xor.
    store = bt.sparkSession.read.parquet(data_dir)
    hash_cols = ", ".join(c for c in store.columns if c != "part_id")
    written = (
        store.filter(
            ~F.col("part_id").isin(*[int(d) for d in done]) if done else F.lit(True)
        )
        .groupBy("part_id")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.expr(f"bit_xor(xxhash64({hash_cols}))").alias("xhash"),
        )
        .collect()
    )
    dur = time.time() - t0
    lineage_rows = []
    for r in written:
        manifest.record(int(r.part_id), int(r.rows), int(r.xhash))
        lineage_rows.append(
            {
                "run_id": run_id,
                "stage": stage,
                "partition": int(r.part_id),
                "output_rows": int(r.rows),
                "xhash": int(r.xhash),
                "duration_s": round(dur, 3),
            }
        )
    manifest.save(run_id)
    append_lineage(out_dir, lineage_rows)
    return {
        "written": sorted(int(r.part_id) for r in written),
        "skipped": sorted(done),
        "rows": sum(int(r.rows) for r in written),
    }


LABELS = "labels"


def write_labels(labels: DataFrame, out_dir: str) -> None:
    """Persist the CC labels table (id → canonical component) with an
    atomic-ish directory swap: write to ``labels.tmp``, rotate the old
    dir to ``labels.old``, rename tmp into place. A crash between the
    renames leaves ``labels.old`` for the reader's fallback — prior
    connectivity facts are never lost to a torn overwrite (labels-as-
    edges are monotone facts: component membership stays true forever).
    """
    import shutil

    labels_dir = os.path.join(out_dir, LABELS)
    tmp, old = labels_dir + ".tmp", labels_dir + ".old"
    labels.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(labels_dir):
        os.rename(labels_dir, old)
    os.rename(tmp, labels_dir)
    shutil.rmtree(old, ignore_errors=True)
    labels.sparkSession.catalog.refreshByPath(labels_dir)


def read_labels(spark, out_dir: str) -> DataFrame | None:
    """Prior labels table, or None on first run. Falls back to
    ``labels.old`` if a crash interrupted the swap in write_labels."""
    for cand in (os.path.join(out_dir, LABELS), os.path.join(out_dir, LABELS) + ".old"):
        if os.path.exists(os.path.join(cand, "_SUCCESS")):
            return spark.read.parquet(cand)
    return None


def recanonicalize_store(
    spark, out_dir: str, remap: DataFrame, run_id: str
) -> dict:
    """Rewrite already-materialized buckets whose canonical ids went
    STALE on resume: new edges merged an old component into a smaller
    id, so rows written in earlier runs still carry the old component.

    ``remap(from_id, to_id)`` is small (only the ids whose canonical
    assignment CHANGED — empty when the resumed buckets don't touch old
    components), so both probes broadcast. Only partitions that actually
    contain a stale id are rewritten (dynamic overwrite), their manifest
    fingerprints recomputed, and a ``recanonicalize`` lineage row logged.
    Idempotent: a replay finds no stale ids and no-ops.
    """
    data_dir = os.path.join(out_dir, "data")
    if not os.path.exists(data_dir) or remap.isEmpty():
        return {"rows": 0, "partitions": []}
    rm = remap.select(
        F.col("from_id").alias("_from"), F.col("to_id").alias("_to")
    ).localCheckpoint(eager=True)

    store = spark.read.parquet(data_dir)
    affected = (
        store.join(F.broadcast(rm), store["subj"] == rm["_from"], "left_semi")
        .select("part_id")
        .unionByName(
            store.join(F.broadcast(rm), store["obj"] == rm["_from"], "left_semi")
            .select("part_id")
        )
        .distinct()
        .collect()
    )
    parts = sorted(int(r.part_id) for r in affected)
    if not parts:
        return {"rows": 0, "partitions": []}

    sub = store.filter(F.col("part_id").isin(parts))
    rm_s = rm.select(F.col("_from").alias("_sf"), F.col("_to").alias("_st"))
    rm_o = rm.select(F.col("_from").alias("_of"), F.col("_to").alias("_ot"))
    data_cols = [c for c in store.columns if c != "part_id"]
    rewritten = (
        sub.join(F.broadcast(rm_s), sub["subj"] == rm_s["_sf"], "left")
        .join(F.broadcast(rm_o), sub["obj"] == rm_o["_of"], "left")
        .select(
            F.coalesce(F.col("_st"), F.col("subj")).alias("subj"),
            *[F.col(c) for c in data_cols if c not in ("subj", "obj")],
            F.coalesce(F.col("_ot"), F.col("obj")).alias("obj"),
            F.col("part_id"),
        )
        .select(*data_cols, "part_id")  # restore canonical column order
        .distinct()  # merged components can collapse previously-distinct rows
        .localCheckpoint(eager=True)  # materialize BEFORE overwriting the source
    )
    (
        rewritten.write.partitionBy("part_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(data_dir)
    )
    spark.catalog.refreshByPath(data_dir)

    manifest = CheckpointManifest(out_dir)
    hash_cols = ", ".join(data_cols)
    stats = (
        spark.read.parquet(data_dir)
        .filter(F.col("part_id").isin(parts))
        .groupBy("part_id")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.expr(f"bit_xor(xxhash64({hash_cols}))").alias("xhash"),
        )
        .collect()
    )
    lineage_rows = []
    for r in stats:
        manifest.record(int(r.part_id), int(r.rows), int(r.xhash))
        lineage_rows.append(
            {
                "run_id": run_id,
                "stage": "recanonicalize",
                "partition": int(r.part_id),
                "output_rows": int(r.rows),
                "xhash": int(r.xhash),
            }
        )
    manifest.save(run_id)
    append_lineage(out_dir, lineage_rows)
    return {"rows": sum(int(r.rows) for r in stats), "partitions": parts}


def compact_store(spark, out_dir: str, compact_dir: str, n_buckets: int = 32) -> int:
    """Compaction: provenance-partitioned append log → globally deduped,
    subject-bucketed layout (the query-optimized table; Iceberg rewrite
    analog). One shuffle (distinct) + one repartition-by-bucket write.
    """
    store = spark.read.parquet(os.path.join(out_dir, "data"))
    quads = store.select("subj", "pred", "obj", "obj_dtype").distinct()
    bq = with_bucket(quads, n_buckets, on="subj").repartition(n_buckets, "part_id")
    bq.write.partitionBy("part_id").mode("overwrite").parquet(compact_dir)
    return spark.read.parquet(compact_dir).count()
