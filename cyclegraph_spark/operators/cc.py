"""Connected-components canonicalization (entity resolution).

North-rule custom operator (SURVEY.md §4 item 1): collapse clusters of
equivalent entity URIs (owl:sameAs edges from JSON-LD islands + link
equivalences) to one canonical id = the MINIMUM id in the component —
a deterministic choice at any parallelism (the reference's newest-wins /
sorted-glob tie-break discipline, SURVEY.md §2.6 O3/O6, applied to ids).

Algorithm: iterative min-label propagation (hash joins), the
alternating-direction variant of large-star/small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — public
literature). Each round:

    label(v) ← min(label(v), min over neighbors u of label(u))

- Edges are symmetrized once; each round is one shuffle-join
  (labels ⨝ edges) + one hash aggregation (min per vertex). Both have
  map-side partial aggregation, so a hot vertex (the "Boris Johnson
  problem" — one entity on 20% of pages) does NOT funnel through one
  reducer for the agg; the join side is covered by AQE skew-split
  (spark.sql.adaptive.skewJoin.enabled=true in our session factory).
- ``localCheckpoint`` every round truncates the lineage chain — without
  it the plan doubles per iteration and the driver OOMs compiling it
  (this is the Spark analog of the reference's incremental checkpoint
  state, /root/reference/cli/strava_import.py:289-313).
- Convergence: stop when no label changed; rounds = O(component
  diameter) — sameAs graphs are star-shaped (diameter ≤ 4), so 3-5
  rounds in practice; ``max_iter`` bounds pathological chains.

Returns labels(id, component) — join it back to the triple table to
rewrite subj/obj to canonical ids, then dedup (O3 keep-best).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """edges(src, dst) → labels(id, component); component = min id."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
    )
    # symmetrize once so each round is a single join direction
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # neighbor labels: for each edge (a,b), b receives label(a)
        nbr = (
            sym.join(labels, sym["a"] == labels["id"], "inner")
            .select(F.col("b").alias("id"), F.col("component"))
            .groupBy("id")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
                (F.col("nbr_min") < F.col("component")).alias("changed"),
            )
        ).localCheckpoint(eager=True)  # truncate lineage every round
        n_changed = new_labels.filter(F.col("changed")).count()
        labels = new_labels.drop("changed")
        if n_changed == 0:
            break
    return labels


def canonicalize_triples(
    triples: DataFrame,
    labels: DataFrame,
    id_col: str = "id",
    comp_col: str = "component",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Rewrite subj/obj through canonical component ids and dedup.

    Two left joins (labels is usually much smaller than triples after
    the distinct — broadcast when it fits) + one distinct (exact dedup,
    O3 analog). Non-entity nodes pass through unchanged via coalesce.
    ``keep_cols`` (e.g. the provenance bucket id) ride along; dedup is
    then per keep-cols group — global compaction is ``compact_store``'s
    job in plans.materialize.
    """
    lab_s = labels.select(
        F.col(id_col).alias("_s_id"), F.col(comp_col).alias("_s_comp")
    )
    lab_o = labels.select(
        F.col(id_col).alias("_o_id"), F.col(comp_col).alias("_o_comp")
    )
    out = (
        triples.join(lab_s, triples["subj"] == lab_s["_s_id"], "left")
        .join(lab_o, triples["obj"] == lab_o["_o_id"], "left")
        .select(
            F.coalesce(F.col("_s_comp"), F.col("subj")).alias("subj"),
            F.col("pred"),
            F.coalesce(F.col("_o_comp"), F.col("obj")).alias("obj"),
            F.col("obj_dtype"),
            *[F.col(c) for c in keep_cols],
        )
        .distinct()
    )
    return out


# --------------------------------------------------------------------------
# Single-node oracle (union-find) for parity tests
# --------------------------------------------------------------------------

def reference_components(edges: list[tuple[str, str]]) -> dict[str, str]:
    """Union-find twin: id → min-id-of-component."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        for v in (a, b):
            parent.setdefault(v, v)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}
