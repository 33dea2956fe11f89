"""S12 — deterministic export pack: sorted JSONL + sha256 manifest,
round-6 floats.

Reference semantics (/root/reference/server/analysis/final14.py:18-32,
248-254; export13.py:26-39): stable key order, compact separators,
row-sorted output, per-file sha256 manifest, floats rounded to 6
decimals, env pinned for determinism.

Spark restatement: ``to_json(sort_keys-equivalent struct)`` after
``F.round(c, 6)`` on every double, a global ``orderBy`` on the export
key, ``coalesce(n_shards)`` for a fixed shard count, and a manifest JSON
listing per-shard sha256 — byte-stable across runs and parallelism
levels (asserted in tests).
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def deterministic_jsonl(
    df: DataFrame, order_by: list[str], n_shards: int = 1
) -> DataFrame:
    """→ single-column 'line' DataFrame, globally ordered, rounded.

    Columns are emitted in sorted-name order (the reference sorts keys);
    doubles rounded to 6 (export13.py:26-32).
    """
    cols = []
    for f in sorted(df.schema.fields, key=lambda f: f.name):
        c = F.col(f.name)
        if isinstance(f.dataType, T.DoubleType):
            c = F.round(c, 6)
        cols.append(c.alias(f.name))
    ordered = df.select(*cols).orderBy(*order_by).coalesce(n_shards)
    return ordered.select(
        F.to_json(F.struct(*[F.col(f) for f in sorted(df.columns)])).alias("line")
    )


def write_export_pack(
    df: DataFrame, out_dir: str, order_by: list[str], n_shards: int = 1
) -> dict:
    """Write JSONL shards + manifest.json with per-shard sha256.

    Returns the manifest dict. Shard boundaries are deterministic
    (global sort → coalesce), so shard hashes are byte-stable.
    ``n_shards`` is an upper bound: AQE may coalesce the sorted output
    below it for small data (range-partition shard boundaries would be
    sample-based and thus nondeterministic, so we deliberately don't
    use repartitionByRange here).
    """
    os.makedirs(out_dir, exist_ok=True)
    lines_dir = os.path.join(out_dir, "lines")
    deterministic_jsonl(df, order_by, n_shards).write.mode("overwrite").text(lines_dir)

    shards = sorted(
        f for f in os.listdir(lines_dir) if f.startswith("part-") and f.endswith(".txt")
    )
    # key shards by ordinal — Spark part filenames embed a per-run UUID,
    # which must not leak into the content-addressed manifest
    manifest = {"shards": {}}
    for i, s in enumerate(shards):
        with open(os.path.join(lines_dir, s), "rb") as f:
            manifest["shards"][f"shard-{i:05d}"] = hashlib.sha256(f.read()).hexdigest()
    body = json.dumps(manifest["shards"], sort_keys=True)
    manifest["sha256"] = hashlib.sha256(body.encode()).hexdigest()
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(manifest, f, sort_keys=True, indent=1)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))  # atomic rename
    return manifest
