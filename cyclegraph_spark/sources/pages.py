"""Deterministic synthetic Common-Crawl-style pages corpus.

Schema (BASELINE.json input_hint):
    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Every page is a pure function of its integer id — generation is therefore
partition-order independent and scales to any row count via
``spark.range(n).mapInPandas`` with no driver-side materialization
(design point: at 10^12 docs the generator itself must be distributed).

Embedded semantics (FIXTURES.md §1):
- schema.org **microdata** island (`itemscope/itemtype/itemprop`) with
  power/heartRate values — a controlled fraction malformed (non-numeric,
  empty) to exercise skip-on-error literal coercion
  (/root/reference/cli/csv_to_rdf.py:22-62 semantics);
- **RDFa** island (`typeof/property`);
- **JSON-LD** island carrying `sameAs` edges between entity URIs
  (drives connected-components canonicalization);
- seeded **entity mentions** from the alias dictionary, with one hot
  entity mentioned on ~20% of pages (drives salted-repartition / AQE
  skew handling in linking + CC).
"""

from __future__ import annotations

import hashlib
import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

BASE_EPOCH = 1704067200  # 2024-01-01T00:00:00Z
N_SITES = 97
HOT_ENTITY = "e0000"
HOT_FRACTION = 5  # 1-in-5 pages mention the hot entity (~20%)

_SYL = ["ka", "ro", "vin", "tel", "mar", "sol", "dag", "lin", "bru", "fos",
        "hei", "vik", "nor", "lund", "berg", "stad", "nes", "moe", "havn", "fjell"]


def _h(i: int, salt: str) -> int:
    """Deterministic 64-bit hash of (i, salt) — stable across platforms."""
    d = hashlib.sha256(f"{salt}:{i}".encode()).digest()
    return int.from_bytes(d[:8], "big")


def _name(k: int) -> str:
    a, b, c = _SYL[k % 20], _SYL[(k // 20) % 20], _SYL[(k // 400) % 20]
    return (a + b).capitalize() + " " + (c + _SYL[(k * 7 + 3) % 20]).capitalize()


def build_alias_rows(n_entities: int = 1000, seed: int = 42) -> list[tuple[str, str, float]]:
    """alias(alias, entity_id, prior) — ~1-5 aliases per entity (FIXTURES.md §5).

    Deterministic in (n_entities, seed). A handful of aliases are shared
    by two entities (ambiguity the link scorer must resolve by prior).
    """
    rows: list[tuple[str, str, float]] = []
    for k in range(n_entities):
        eid = f"e{k:04d}"
        base = _name(k * 31 + seed)
        n_alias = 1 + _h(k, f"na{seed}") % 5
        variants = [base, base.split(" ")[0], base.upper(), base + " AS", "Dr. " + base]
        for j in range(n_alias):
            prior = round(0.95 - 0.17 * j, 4)
            rows.append((variants[j], eid, prior))
    # deliberate ambiguity: first word of entity k also aliases entity k+1 (low prior)
    for k in range(0, n_entities - 1, 50):
        rows.append((_name(k * 31 + seed).split(" ")[0], f"e{k + 1:04d}", 0.25))
    # dedup (alias, entity_id) keeping highest prior — deterministic order
    best: dict[tuple[str, str], float] = {}
    for a, e, p in rows:
        key = (a, e)
        if key not in best or p > best[key]:
            best[key] = p
    return sorted((a, e, p) for (a, e), p in best.items())


def alias_df(spark: SparkSession, n_entities: int = 1000, seed: int = 42) -> DataFrame:
    schema = T.StructType(
        [
            T.StructField("alias", T.StringType(), False),
            T.StructField("entity_id", T.StringType(), False),
            T.StructField("prior", T.DoubleType(), False),
        ]
    )
    return spark.createDataFrame(build_alias_rows(n_entities, seed), schema)


def _mention_entities(i: int, n_entities: int) -> list[int]:
    """Entity ids mentioned on page i. Hot entity on 1-in-HOT_FRACTION pages."""
    ments = []
    if i % HOT_FRACTION == 0:
        ments.append(0)
    for j in range(1 + _h(i, "nm") % 3):
        ments.append(1 + _h(i, f"m{j}") % (n_entities - 1))
    return ments


def page_record(i: int, n_entities: int = 1000, seed: int = 42) -> tuple[str, int, bytes, str]:
    """Pure function id → (url, warc_ts_epoch, html_bytes, lang)."""
    site = i % N_SITES
    url = f"https://site{site}.example/p/{i}"
    ts = BASE_EPOCH + (_h(i, "ts") % (30 * 24 * 3600))  # 30-day crawl window
    lang = "no" if _h(i, "lang") % 3 == 0 else "en"

    # --- values, some deliberately malformed (skip-on-error coercion)
    power_raw = str(120 + _h(i, "pw") % 260)
    hr_raw = str(90 + _h(i, "hr") % 95)
    malform = _h(i, "bad") % 17
    if malform == 0:
        power_raw = "N/A"
    elif malform == 1:
        power_raw = ""
    elif malform == 2:
        hr_raw = "12,5"  # decimal comma: int(float(x)) raises → skip
    alt_raw = f"{(_h(i, 'alt') % 25000) / 10.0}"
    moving_raw = ["true", "false", "1", "0", "True", "False"][_h(i, "mv") % 6]

    sid = f"session{i}"
    ments = _mention_entities(i, n_entities)
    mention_txt = " ".join(
        f"Report filed by {_name(k * 31 + seed)} near the harbour." for k in ments
    )

    # JSON-LD sameAs island: link this page's entity URIs (CC edges).
    # Pages about the same entity across sites produce overlapping URI
    # aliases site{site}/ent/{k} <-> global ent:{k}.
    sameas = [
        {
            "@id": f"https://site{site}.example/ent/{k}",
            "sameAs": f"https://kg.example/entity/e{k:04d}",
        }
        for k in ments
    ]
    jsonld = json.dumps(
        {
            "@context": "https://schema.org",
            "@type": "ExerciseAction",
            "@id": f"https://site{site}.example/act/{sid}",
            "identifier": sid,
            "agent": sameas,
        },
        sort_keys=True,
    )

    html = f"""<!DOCTYPE html>
<html lang="{lang}"><head><title>Session {i} — site{site}</title>
<style>body {{ color: #222 }}</style>
<script>var tracker = {{ id: {i} }};</script>
<script type="application/ld+json">{jsonld}</script>
</head><body>
<nav><ul><li>Home</li><li>Sessions</li></ul></nav>
<div itemscope itemtype="http://schema.org/ExerciseAction" itemid="https://site{site}.example/act/{sid}">
  <h1 itemprop="name">Training session {i}</h1>
  <span itemprop="power">{power_raw}</span>
  <span itemprop="heartRate">{hr_raw}</span>
  <span itemprop="altitude">{alt_raw}</span>
  <span itemprop="moving">{moving_raw}</span>
  <span itemprop="timeS">{_h(i, "t") % 7200}</span>
</div>
<div typeof="schema:ExerciseAction" about="https://site{site}.example/act/{sid}-rdfa">
  <span property="schema:power" content="{power_raw}">{power_raw} W</span>
  <span property="schema:heartRate" content="{hr_raw}">{hr_raw} bpm</span>
</div>
<article><p>{mention_txt}</p>
<p>Boilerplate &amp; filler text about training &#8212; day {i % 30}.</p></article>
<footer>&copy; site{site}</footer>
</body></html>"""
    return url, ts, html.encode("utf-8"), lang


def resume_chain_records(n_buckets: int = 8) -> list[tuple[str, int, bytes, str]]:
    """Two crafted pages whose JSON-LD sameAs edges form a CHAIN across
    the resume bucket split: a run over source buckets < n_buckets/2
    sees only b—c (local component min b); the full corpus adds a—b
    (global min a), forcing a resumed run to REMAP rows already written
    by the partial run. Pure function of n_buckets — shared by the
    kg_resume_parity gate and its fresh-run twin
    (tools/gen_value_oracles.py)."""
    from cyclegraph_spark.functions.xxh64 import spark_xxhash64_str

    def bucket(u: str) -> int:
        # twin of pmod(xxhash64(url), n_buckets): for power-of-two n the
        # low bits of the signed and unsigned value agree
        return spark_xxhash64_str(u) % n_buckets

    u_sub = next(
        f"https://z.example/sub/{i}"
        for i in range(1000)
        if bucket(f"https://z.example/sub/{i}") < n_buckets // 2
    )
    u_rest = next(
        f"https://z.example/rest/{i}"
        for i in range(1000)
        if bucket(f"https://z.example/rest/{i}") >= n_buckets // 2
    )

    def mk(url: str, subj: str, same: str) -> tuple[str, int, bytes, str]:
        doc = {"@id": subj, "@type": "Thing", "sameAs": same}
        html = (
            '<html><head><script type="application/ld+json">'
            + json.dumps(doc, sort_keys=True)
            + "</script></head><body>x</body></html>"
        ).encode("utf-8")
        return (url, BASE_EPOCH, html, "en")

    return [
        mk(u_sub, "https://z.example/ent/b", "https://z.example/ent/c"),
        mk(u_rest, "https://a.example/ent/a", "https://z.example/ent/b"),
    ]


def _gen_batches(iterator, n_entities: int, seed: int):
    for pdf in iterator:
        recs = [page_record(int(i), n_entities, seed) for i in pdf["id"]]
        out = pd.DataFrame(recs, columns=["url", "warc_ts", "html", "lang"])
        out["warc_ts"] = pd.to_datetime(out["warc_ts"], unit="s")
        yield out


def pages_df(
    spark: SparkSession,
    n: int,
    n_entities: int = 1000,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic corpus: spark.range → mapInPandas.

    Partition-count independent output (each row depends only on its id),
    so the same corpus is reproducible at local[8] and local[32] — the
    determinism precondition for the two-parallelism scaling bench.
    """
    rng = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(
        lambda it: _gen_batches(it, n_entities, seed), schema=PAGES_SCHEMA
    )


def pages_with_text(spark: SparkSession, n: int, **kw) -> DataFrame:
    """Full input-hint shape: (url, warc_ts, html, text, lang)."""
    from cyclegraph_spark.extract.text import extract_text_udf

    df = pages_df(spark, n, **kw)
    return df.select(
        "url", "warc_ts", "html", extract_text_udf(F.col("html")).alias("text"), "lang"
    )
