#!/usr/bin/env python
"""Skew stress for the linking + CC path at bench scale (round-5 #5).

The CC worst-case topology is pinned at 10k edges in
tests/test_linking_cc.py, and the 800k-page scaling corpus is
star-friendly (its hot entity converges in one round). This one-off
recorded run plants REAL skew at bench scale and times the claims:

- link: 200k pages where every 2nd page carries an extra hot-alias
  mention (~100k planted + ~40k natural hot mentions) through
  ``link_mentions`` — the hot alias rides the broadcast join (no
  shuffle on the dictionary side) and the support window partitions by
  (url, entity), so the hot ENTITY never concentrates in one task.
- cc: a 100k-degree hub + 25k 8-node chains (300k edges total) through
  ``connected_components`` twice — hot-split machinery armed (salt=8,
  the default) vs disarmed (salt=1) on the SAME checkpointed input;
  chains force multiple star rounds so the comparison is not a 1-round
  fluke. With the r5 defaults the two should be within host noise: this
  graph sits below the pigeonhole bound (2n ≤ hot_degree), so the armed
  path provably skips its per-round hot probes — the A/B is the
  regression guard for that. (The original run at hot_degree=1000
  measured the premium being eliminated: 36.8 s armed vs 25.7 s
  disarmed, identical labels.)

Runs pinned to $SPARK_GRAFT_SCALE_4N cores (default 16 = the bench's 4N
level) in a subprocess. Prints ONE JSON line; paste the numbers into
BENCH/BASELINE.md.

For the ABOVE-floor A/B (hub degree over the 10^6 absolute floor, so
the armed path's probes/split actually engage — recorded r5 at 2M
degree: armed 40-45 s vs disarmed 27-29 s, identical labels; see
BENCH/BASELINE.md "Above-the-floor A/B"), set
SPARK_GRAFT_SKEW_HUB=2000000.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORES = int(os.environ.get("SPARK_GRAFT_SCALE_4N", "16"))
PAGES = int(os.environ.get("SPARK_GRAFT_SKEW_PAGES", "200000"))
HUB_DEGREE = int(os.environ.get("SPARK_GRAFT_SKEW_HUB", "100000"))

_SNIPPET = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from cyclegraph_spark.session import get_spark
from cyclegraph_spark.operators.cc import connected_components
from cyclegraph_spark.operators.linking import link_mentions
from cyclegraph_spark.sources.pages import _name, alias_df, pages_with_text

spark = get_spark(app_name="skew-stress", master="local[{cores}]")
spark.sparkContext.setLogLevel("ERROR")
out = {{"cores": {cores}, "pages": {pages}, "hub_degree": {hub}}}

# --- corpus with a planted hot mention on every 2nd page (untimed) ---
hot_sentence = " Report filed by " + _name(42) + " near the harbour."
pages = pages_with_text(spark, {pages}, partitions={cores} * 8).withColumn(
    "text",
    F.when(
        F.xxhash64("url") % 2 == 0, F.concat("text", F.lit(hot_sentence))
    ).otherwise(F.col("text")),
).localCheckpoint(eager=True)
aliases = alias_df(spark, 1000)

# --- link stage under mention skew ---
t0 = time.time()
links = link_mentions(pages, aliases)
links.write.format("noop").mode("overwrite").save()
link_sec = round(time.time() - t0, 2)
hot_rows = links.filter(F.col("entity_id") == "e0000").count()
out["link"] = {{
    "sec": link_sec,
    "rows": links.count(),
    "hot_entity_rows": hot_rows,
}}

# --- CC under hub skew: 100k-degree hub + 25k 8-node chains ---
hub = spark.range(1, {hub} + 1).select(
    F.lit(0).alias("src"), F.col("id").alias("dst")
)
# chains live on ids >= 10^6; each chain is 8 consecutive ids
chain = (
    spark.range(0, 25_000 * 8)
    .filter(F.col("id") % 8 != 7)
    .select(
        (F.col("id") + 1_000_000).alias("src"),
        (F.col("id") + 1_000_001).alias("dst"),
    )
)
edges = hub.unionByName(chain).repartition({cores} * 4).localCheckpoint(eager=True)

for label, salt in (("split_on", 8), ("split_off", 1)):
    stats = {{}}
    t0 = time.time()
    labels = connected_components(edges, salt=salt, stats=stats)
    n_labeled = labels.count()
    n_comp = labels.select("component").distinct().count()
    out[f"cc_{{label}}"] = {{
        "sec": round(time.time() - t0, 2),
        "salt": salt,
        "rounds": stats.get("rounds"),
        "vertices": n_labeled,
        "components": n_comp,
    }}

# identical results either way is part of the claim
assert out["cc_split_on"]["components"] == out["cc_split_off"]["components"]
assert out["cc_split_on"]["vertices"] == out["cc_split_off"]["vertices"]
print(json.dumps(out))
"""


def main() -> None:
    sys.path.insert(0, REPO)
    from bench import _external_running

    pre = _external_running()
    code = _SNIPPET.format(repo=REPO, cores=CORES, pages=PAGES, hub=HUB_DEGREE)
    res = subprocess.run(
        ["taskset", "-c", f"0-{CORES - 1}", sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=3600,
        check=True,
    )
    out = json.loads(res.stdout.strip().splitlines()[-1])
    out["pre_load"] = round(pre, 1)
    out["post_load"] = round(_external_running(), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
