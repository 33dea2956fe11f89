"""Node table — the per-entity companion artifact to the triple store.

North-rule deliverable ("materializing deduplicated triples and node
tables back to partitioned Iceberg"): one row per graph node with its
degree profile and display name, derived wholly from the canonical
triple relation, so it can be recomputed idempotently from the store
(no separate state to resume).

Plan shape: two map-side-combined aggregations (one keyed on subj, one
on uri-valued obj) + one full-outer join on the node id — no window, no
self-join; a hot node (the corpus's 20%-of-pages entity) is exactly one
output row per aggregation, so skew lives only in the agg's partial
buffers, which combine map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cyclegraph_spark.operators.triples import RDF_TYPE, SCHEMA

NAME_PRED = SCHEMA + "name"


def node_table(triples: DataFrame) -> DataFrame:
    """(subj, pred, obj, obj_dtype) → (id, n_out, n_in, n_types, name).

    - ``n_out``: triples with this node as subject;
    - ``n_in``: uri-valued triples pointing at it;
    - ``n_types``: distinct rdf:type values;
    - ``name``: MIN schema.org/name literal (deterministic tie-break,
      the O3/O6 discipline), NULL when the node has none.
    """
    subs = triples.groupBy(F.col("subj").alias("id")).agg(
        F.count(F.lit(1)).alias("n_out"),
        F.count_distinct(
            F.when(F.col("pred") == RDF_TYPE, F.col("obj"))
        ).alias("n_types"),
        F.min(F.when(F.col("pred") == NAME_PRED, F.col("obj"))).alias("name"),
    )
    objs = (
        triples.filter(F.col("obj_dtype") == "uri")
        .groupBy(F.col("obj").alias("id"))
        .agg(F.count(F.lit(1)).alias("n_in"))
    )
    return (
        subs.join(objs, "id", "full_outer")
        .select(
            "id",
            F.coalesce(F.col("n_out"), F.lit(0)).alias("n_out"),
            F.coalesce(F.col("n_in"), F.lit(0)).alias("n_in"),
            F.coalesce(F.col("n_types"), F.lit(0)).alias("n_types"),
            "name",
        )
    )
