"""Composite melt gates — driver-visible correctness for the extended
registry.

The driver grades only the first 50 ``all_queries()`` entries; round 3
held 60 (10 structurally invisible).  Round 4 moves 12 analytics/text
variants to the extended registry and re-exposes them through TWO
composite gates that union their outputs in a normalized long ("melt")
form::

    (probe STRING, k STRING, m STRING, v DOUBLE)

where ``k`` is the probe's key columns joined with '|', ``m`` the metric
column name, and ``v`` the metric cast to double.  Every probe's full
result multiset is therefore value-hashed by the driver — the composite
is exactly as strict as the 12 singleton gates were, in 2 registry slots.

The matching DuckDB oracle is assembled mechanically from the SAME
per-probe oracle SQL strings (extended registry), melted with identical
key/metric expressions — there is one source of truth per probe.

Catalyst note: the Spark side melts each probe with ONE
``explode(array(struct...))`` pass (not one union arm per metric, which
would recompute the probe's aggregation per metric), then unions the
probes.  Probe outputs here are tiny aggregates; the union is trivial.
The extended probes deliberately return UNORDERED frames: every
consumer (driver hash, parity test, preflight) sorts rows itself, and a
trailing per-probe ``orderBy`` would survive under this composite's
final sort as a redundant global range-exchange per probe (EliminateSorts
does not fire through the explode/union — verified on the optimized
plan, which carried 6 extra Sort nodes before the probes were unordered).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the probe modules must be registered before the melt oracles below are
# assembled — import them explicitly so this module is also safe to
# import standalone (outside _load_family_modules' ordering).
import cyclegraph_spark.operators.queries_analytics  # noqa: F401
import cyclegraph_spark.operators.queries_text  # noqa: F401
from cyclegraph_spark.operators.queries import (
    _ORACLES_EXT,
    _QUERIES_EXT,
    query,
)

# probe name -> (key columns, metric columns); metrics are numeric in
# every probe (ints/doubles/nullable doubles), so DOUBLE is lossless at
# these magnitudes.
_ANALYTICS_PROBES: dict[str, tuple[tuple[str, ...], tuple[str, ...]]] = {
    "a3_tw_mean_moving_only": (("user_id",), ("tw_mean_moving",)),
    "a10_w_per_beat": (("user_id",), ("w_per_beat",)),
    "w4_trend_last3": (("event_id",), ("prev3_avg", "cur_value")),
    "w5_duration_infer": (("user_id",), ("duration_s", "n_samples")),
    "p13_efficiency_classify": (("status",), ("n", "avg_value")),
    "p17_running_integration": (("user_id", "event_id"), ("cum_value",)),
}
_SOURCES_PROBES: dict[str, tuple[tuple[str, ...], tuple[str, ...]]] = {
    "o8_union_sources": (("src_kind",), ("n", "avg_metric")),
    "j3_canonical_key_cache": (
        (),
        ("n_sessions", "n_distinct_keys", "cache_hit_rate"),
    ),
    "json_extract_props": (("event_type",), ("avg_k",)),
    "a12_grouped_pivot_stats": (
        ("o_orderstatus", "o_orderpriority"),
        ("mean_price", "std_price", "n"),
    ),
    "j2_weather_context": (
        ("user_id",),
        (
            "s_wind_ms", "s_wind_dir_deg", "s_air_temp_c", "s_air_pressure_hpa",
            "e_wind_ms", "e_wind_dir_deg", "e_air_temp_c", "e_air_pressure_hpa",
        ),
    ),
    "t_token_count_bpe": (("doc_id",), ("n_ws_tokens", "n_bpe_tokens")),
}


# |v| above this loses bits in the melt's DOUBLE cast — on BOTH engines
# at once, so a divergence past it could hash-match spuriously.
_DOUBLE_EXACT_MAX = 2**53


def melt_contract_violations(
    df: DataFrame, probe: str, keys, metrics
) -> list[str]:
    """Check the two preconditions the melt gates rely on; returns a
    human-readable violation list (empty = contract holds).

    1. Precision: every INTEGRAL metric value must fit in a double's
       53-bit mantissa. The melt casts v to DOUBLE on both engines, so a
       probe emitting a count beyond 2^53 would silently lose the same
       low bits on both sides and could mask a real divergence
       (round-4 VERDICT watch item #2).
    2. Key uniqueness: the key columns must uniquely key the probe's
       rows (keyless probes must emit exactly one row) — the composite
       orders by (probe, k, m) only, so duplicate keys would make tie
       order engine-dependent (round-4 ADVICE).

    Probe outputs are tiny aggregates (the composites union them in 2
    registry slots), so the collect here is bounded by construction.
    """
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    integral = {
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ByteType, ShortType, IntegerType, LongType))
    }
    rows = df.collect()
    out: list[str] = []
    if keys:
        kvals = [tuple(r[k] for k in keys) for r in rows]
        if len(kvals) != len(set(kvals)):
            out.append(f"{probe}: key columns {keys} do not uniquely key rows")
    elif len(rows) != 1:
        out.append(f"{probe}: keyless probe emitted {len(rows)} rows (want 1)")
    for m in metrics:
        if m not in integral:
            continue
        for r in rows:
            v = r[m]
            if v is not None and abs(v) > _DOUBLE_EXACT_MAX:
                out.append(
                    f"{probe}.{m}: |{v}| > 2^53 — DOUBLE melt would lose bits"
                )
                break
    return out


def _melt_df(df: DataFrame, probe: str, keys, metrics) -> DataFrame:
    k = (
        F.concat_ws(
            "|",
            *[F.coalesce(F.col(c).cast("string"), F.lit("NULL")) for c in keys],
        )
        if keys
        else F.lit("")
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"), F.col(m).cast("double").alias("v")
            )
            for m in metrics
        ]
    )
    return df.select(
        F.lit(probe).alias("probe"), k.alias("k"), F.explode(pairs).alias("p")
    ).select("probe", "k", F.col("p.m").alias("m"), F.col("p.v").alias("v"))


def _melt_sql(probes: dict[str, tuple[tuple[str, ...], tuple[str, ...]]]) -> str:
    """UNION ALL of every probe's melted oracle; each probe's original
    oracle SQL becomes a CTE so it is stated (and parsed) exactly once."""
    ctes, arms = [], []
    for probe, (keys, metrics) in probes.items():
        inner = _ORACLES_EXT[probe]
        cte = f"src_{probe}"
        ctes.append(f"{cte} AS (\n{inner}\n)")
        k = (
            " || '|' || ".join(
                f"COALESCE(CAST({c} AS VARCHAR), 'NULL')" for c in keys
            )
            if keys
            else "''"
        )
        for m in metrics:
            arms.append(
                f"SELECT '{probe}' AS probe, {k} AS k, "
                f"'{m}' AS m, CAST({m} AS DOUBLE) AS v FROM {cte}"
            )
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\n"
        + "\nUNION ALL\n".join(arms)
        + "\nORDER BY probe, k, m"
    )


def _composite(spark: SparkSession, sf_dir: str, probes) -> DataFrame:
    melted = [
        _melt_df(_QUERIES_EXT[p](spark, sf_dir), p, keys, metrics)
        for p, (keys, metrics) in probes.items()
    ]
    return reduce(DataFrame.unionByName, melted).orderBy("probe", "k", "m")


@query("analytics_misc_block", oracle=_melt_sql(_ANALYTICS_PROBES))
def analytics_misc_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite gate for the extended analytics probes (a3 moving-only
    time-weighted mean, a10 ratio metric, w4 prev-3 trend, w5 duration
    inference, p13 classify, p17 running integration — SURVEY §2.2/§2.3/
    §2.5 variants whose base operators have their own in-window gates)."""
    return _composite(spark, sf_dir, _ANALYTICS_PROBES)


@query("sources_misc_block", oracle=_melt_sql(_SOURCES_PROBES))
def sources_misc_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite gate for the extended source/join/text probes (o8 union
    of sources, j3 canonical-key cache rate, JSON extraction, a12 grouped
    pivot, j2b weather as-of context, BPE-ish token counting)."""
    return _composite(spark, sf_dir, _SOURCES_PROBES)
