"""Freshness + provenance of the generated VALUES oracles.

The committed ``oracles_values.py`` must equal what the single-node twins
produce TODAY — if an operator parameter, the seeded generator, or the
corpus changes without re-running tools/gen_value_oracles.py, this fails
before the driver's gate does.
"""

import importlib.util
import os
import sys

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _gen_module():
    spec = importlib.util.spec_from_file_location(
        "gen_value_oracles", os.path.join(REPO, "tools", "gen_value_oracles.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["gen_value_oracles"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_xxh64_twin_matches_spark(spark):
    """The pure-Python XXH64 (public-spec implementation) must reproduce
    Spark's JVM xxhash64 bit-for-bit — strings across every length class
    (empty/tail/4-byte/8-byte/32-byte block) and chained int seeds."""
    from cyclegraph_spark.functions.xxh64 import (
        spark_xxhash64_str,
        spark_xxhash64_str_int,
    )

    cases = ["", "a", "abc", "hello world", "x" * 7, "y" * 8, "z" * 31,
             "w" * 32, "q" * 100, "æøå ✓", "tri gram shingle"]
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    rows = df.select(
        "s",
        F.xxhash64("s").alias("h0"),
        F.xxhash64("s", F.lit(7)).alias("h7"),
        F.xxhash64("s", F.lit(63)).alias("h63"),
    ).collect()
    for r in rows:
        assert r.h0 == spark_xxhash64_str(r.s), r.s
        assert r.h7 == spark_xxhash64_str_int(r.s, 7), r.s
        assert r.h63 == spark_xxhash64_str_int(r.s, 63), r.s


def test_committed_oracles_are_fresh():
    """Regenerate every VALUES oracle from the twins and compare against
    the committed module (full regeneration is ~6 s)."""
    gen = _gen_module()
    from cyclegraph_spark.operators.oracles_values import VALUES_ORACLES

    fresh = gen.build_oracles(gen.load_documents())
    assert set(fresh) == set(VALUES_ORACLES)
    for name, sql in fresh.items():
        assert VALUES_ORACLES[name] == sql, f"{name}: stale — re-run tools/gen_value_oracles.py"
