"""cyclegraph_spark — a from-scratch PySpark-native knowledge-graph
construction and analytics engine with the query/data-processing
capabilities of the CycleGraph reference (JohnnyBravo1983/CycleGraph).

Layout
------
- ``session``     : tuned SparkSession factory (AQE, Arrow, UTC).
- ``sources``     : synthetic pages corpus generator (Iceberg-style layout),
                    testdata loaders, checkpoint-manifest reader.
- ``extract``     : deterministic HTML→text extractor (pure-Python oracle
                    + vectorized pandas-UDF twin; byte-identical per url).
- ``operators``   : triple lifting, SHACL-as-SQL validation, entity linking,
                    connected-components canonicalization, materialize,
                    windowed metrics, aggregations, joins, dedup, similarity,
                    text analysis, multimodal plumbing.
- ``functions``   : scalar column helpers (loose numeric parse, wrap360,
                    uri minting, air density, ...).
- ``plans``       : lineage/metrics rows, checkpoint manifests, resume logic.
- ``streaming``   : incremental/high-watermark batch-resume idioms.

Everything is DataFrame/Catalyst-first; Python executes only inside
vectorized pandas UDFs (Arrow-batched), never per-row.
"""

__version__ = "0.1.0"
