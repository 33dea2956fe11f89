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
    salt: int = 8,
    hot_degree: int = 1000,
) -> DataFrame:
    """edges(src, dst) → labels(id, component); component = min id.

    Two scale levers beyond the basic loop:

    - **Targeted salting** (``salt`` > 1): a hot vertex's edge rows all
      hash to ONE reducer in the edges⨝labels shuffle (the
      "Boris Johnson problem" — our corpus mentions one entity on ~20%
      of pages). Senders with degree > ``hot_degree`` get their edges
      spread over ``salt`` deterministic shards
      (pmod(xxhash64(dst), salt)), and ONLY those few hot label rows are
      replicated per shard — cold vertices pay nothing. Complements
      AQE's skew-join (which needs its size thresholds tripped);
      deterministic, so results are parallelism-invariant.
    - **Frontier propagation**: after round 1 only vertices whose label
      CHANGED last round send messages — an unchanged label was already
      delivered to every neighbor in an earlier round and can't lower
      their minimum again, so each round's join shrinks to the active
      frontier (star-shaped sameAs clusters mostly converge in round 1).
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
    )
    # symmetrize once so each round is a single join direction
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()

    # hot-sender detection (one pass): degree > hot_degree → salted path
    hot = (
        sym.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
        .filter(F.col("deg") > hot_degree)
        .select(F.col("a").alias("hot_id"))
        .localCheckpoint(eager=True)
        if salt > 1
        else None
    )
    use_salt = salt > 1 and not hot.isEmpty()
    if use_salt:
        sym_hot = (
            sym.join(F.broadcast(hot), sym["a"] == hot["hot_id"], "left_semi")
            .withColumn("shard", F.pmod(F.xxhash64("b"), F.lit(salt)).cast("int"))
            .localCheckpoint(eager=True)
        )
        sym_cold = sym.join(
            F.broadcast(hot), sym["a"] == hot["hot_id"], "left_anti"
        ).localCheckpoint(eager=True)
    else:
        sym_cold = sym.localCheckpoint(eager=True)
        sym_hot = None

    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    frontier = labels  # round 1: everyone sends

    for _ in range(max_iter):
        senders = frontier
        msgs = sym_cold.join(senders, sym_cold["a"] == senders["id"], "inner").select(
            F.col("b").alias("id"), F.col("component")
        )
        if use_salt:
            # replicate ONLY hot senders' labels across shards
            shards = senders.sparkSession.range(salt).select(
                F.col("id").cast("int").alias("shard")
            )
            hot_senders = senders.join(
                F.broadcast(hot), senders["id"] == hot["hot_id"], "left_semi"
            ).crossJoin(F.broadcast(shards))
            msgs_hot = sym_hot.join(
                hot_senders,
                (sym_hot["a"] == hot_senders["id"])
                & (sym_hot["shard"] == hot_senders["shard"]),
                "inner",
            ).select(F.col("b").alias("id"), F.col("component"))
            msgs = msgs.unionByName(msgs_hot)
        nbr = msgs.groupBy("id").agg(F.min("component").alias("nbr_min"))
        stepped = labels.join(nbr, "id", "left").select(
            "id",
            F.least(
                F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
            ).alias("component"),
            (F.col("nbr_min") < F.col("component")).alias("changed"),
        )
        # pointer doubling (shortcutting): follow component → its own
        # component once per round, turning O(chain length) convergence
        # into O(log n) — the large-star idea from Kiveris et al. applied
        # to the label table. One extra self-join per round.
        ptr = stepped.select(
            F.col("id").alias("p_id"), F.col("component").alias("p_comp")
        )
        new_labels = (
            stepped.join(ptr, stepped["component"] == ptr["p_id"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("p_comp"), F.col("component"))
                ).alias("component"),
                (
                    F.col("changed")
                    | (F.coalesce(F.col("p_comp"), F.col("component")) < F.col("component"))
                ).alias("changed"),
            )
        ).localCheckpoint(eager=True)  # truncate lineage every round
        frontier = new_labels.filter(F.col("changed")).drop("changed")
        n_changed = frontier.count()
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
