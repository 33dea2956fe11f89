"""M3 — SHACL-as-SQL conformance parity.

Golden pair from the reference (/root/reference/data/sample.ttl ×
/root/reference/shapes/session_shape.ttl, FIXTURES.md §2.2): the
conforming graph yields zero violations; mutated graphs yield exactly
the pyshacl-style violation rows (minCount / maxCount / datatype).
"""

from pathlib import Path

import pytest
from pyspark.sql import types as T

from cyclegraph_spark.operators.shacl import (
    RDF_TYPE,
    conforms,
    parse_shapes_ttl,
    reference_validate,
    validate,
)

SHAPES_TTL = Path("/root/reference/shapes/session_shape.ttl")
EX = "http://example.org/cyclegraph/"
SCHEMA = "http://schema.org/"
XSD = "http://www.w3.org/2001/XMLSchema#"

TRIPLE_SCHEMA = T.StructType(
    [T.StructField(c, T.StringType(), True) for c in ["subj", "pred", "obj", "obj_dtype"]]
)


def _sample_graph() -> set[tuple[str, str, str, str]]:
    """Triple set of /root/reference/data/sample.ttl (4 ExerciseActions,
    float power/heartRate literals)."""
    g = set()
    vals = [(200, 150), (220, 152), (210, 148), (230, 151)]
    for i, (p, h) in enumerate(vals, start=1):
        s = f"{EX}session{i}"
        g.add((s, RDF_TYPE, SCHEMA + "ExerciseAction", "uri"))
        g.add((s, SCHEMA + "power", f"{p}", XSD + "float"))
        g.add((s, SCHEMA + "heartRate", f"{h}", XSD + "float"))
    return g


@pytest.fixture(scope="module")
def shapes():
    return parse_shapes_ttl(SHAPES_TTL.read_text())


def _df(spark, graph):
    return spark.createDataFrame(sorted(graph), TRIPLE_SCHEMA)


def test_parse_reference_shapes(shapes):
    assert len(shapes) == 1
    sh = shapes[0]
    assert sh.target_class == SCHEMA + "ExerciseAction"
    assert {p.path for p in sh.properties} == {SCHEMA + "power", SCHEMA + "heartRate"}
    for p in sh.properties:
        assert p.datatype == XSD + "float"
        assert p.min_count == 1 and p.max_count == 1
        assert "must be a single float value" in p.message


def test_conforming_graph(spark, shapes):
    assert conforms(_df(spark, _sample_graph()), shapes)


def _assert_parity(spark, graph, shapes):
    got = {
        (r.focus_node, r.path, r.constraint, r.value)
        for r in validate(_df(spark, graph), shapes).collect()
    }
    exp = reference_validate(graph, shapes)
    assert got == exp, f"missing={exp - got} extra={got - exp}"
    return got


def test_min_count_violation(spark, shapes):
    g = _sample_graph()
    g.discard((f"{EX}session2", SCHEMA + "power", "220", XSD + "float"))
    got = _assert_parity(spark, g, shapes)
    assert (f"{EX}session2", SCHEMA + "power", "minCount", None) in got
    assert len(got) == 1


def test_max_count_violation(spark, shapes):
    g = _sample_graph()
    g.add((f"{EX}session3", SCHEMA + "heartRate", "99", XSD + "float"))
    got = _assert_parity(spark, g, shapes)
    assert (f"{EX}session3", SCHEMA + "heartRate", "maxCount", None) in got
    assert len(got) == 1


def test_datatype_violation(spark, shapes):
    g = _sample_graph()
    g.discard((f"{EX}session1", SCHEMA + "power", "200", XSD + "float"))
    g.add((f"{EX}session1", SCHEMA + "power", "200", XSD + "integer"))
    got = _assert_parity(spark, g, shapes)
    assert (f"{EX}session1", SCHEMA + "power", "datatype", "200") in got


def test_ill_typed_lexical_violation(spark, shapes):
    # "abc"^^xsd:float is ill-typed — pyshacl flags DatatypeConstraint
    g = _sample_graph()
    g.discard((f"{EX}session4", SCHEMA + "heartRate", "151", XSD + "float"))
    g.add((f"{EX}session4", SCHEMA + "heartRate", "abc", XSD + "float"))
    got = _assert_parity(spark, g, shapes)
    assert (f"{EX}session4", SCHEMA + "heartRate", "datatype", "abc") in got


def test_untargeted_nodes_ignored(spark, shapes):
    # nodes without rdf:type ExerciseAction are not focus nodes
    g = _sample_graph()
    g.add((f"{EX}other1", SCHEMA + "power", "nope", XSD + "string"))
    _assert_parity(spark, g, shapes)
    assert conforms(_df(spark, g), shapes)


def test_lifted_corpus_violations_shape(spark, shapes):
    """End-to-end: lifted synthetic pages validated against the
    reference shapes — malformed power values (skip-on-error drops the
    triple) surface as minCount violations."""
    from cyclegraph_spark.operators.triples import lift_html_pages
    from cyclegraph_spark.sources.pages import pages_df

    triples = lift_html_pages(pages_df(spark, 200, partitions=4)).drop("src")
    report = validate(triples, shapes)
    rows = report.collect()
    # corpus has ~2/17 of pages with malformed/empty power → minCount
    kinds = {r.constraint for r in rows}
    assert "minCount" in kinds
    # microdata+rdfa both emit power for healthy pages → no maxCount
    # (different subjects), and integer-typed power → datatype violations
    assert "datatype" in kinds
    assert report.columns == ["focus_node", "path", "constraint", "message", "value"]
