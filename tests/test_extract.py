"""M1 — byte-identical HTML→text extraction (BASELINE.md per-row invariant)."""

from pyspark.sql import functions as F

from cyclegraph_spark.extract.text import extract_text
from cyclegraph_spark.sources.pages import page_record, pages_df


def test_extractor_deterministic_pure():
    url, ts, html, lang = page_record(7)
    a = extract_text(html)
    b = extract_text(bytes(html))
    assert a == b
    assert "Training session 7" in a
    assert "tracker" not in a  # script stripped
    assert "color:" not in a  # style stripped
    assert "&amp;" not in a and "&" in a  # entity decoded


def test_extractor_encoding_fallback():
    # cp1252 bytes that are invalid utf-8 (mirrors cli/io.py:12-32 chain)
    s = "<p>Øst før vind</p>".encode("cp1252") + b"\x96"
    out = extract_text(s)
    assert "Øst" in out and "–" in out  # 0x96 = en-dash in cp1252


def test_udf_matches_reference_two_parallelism_levels(spark):
    n = 200
    expected = {}
    for i in range(n):
        url, ts, html, lang = page_record(i)
        expected[url] = extract_text(html)

    for parts in (2, 8):
        df = pages_df(spark, n, partitions=parts)
        from cyclegraph_spark.extract.text import extract_text_udf

        got = dict(
            df.select("url", extract_text_udf(F.col("html")).alias("text"))
            .collect()
        )
        assert got == expected, f"extraction diverged at partitions={parts}"
