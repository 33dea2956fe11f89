"""URL canonicalization — page-node identity for the KG.

Two pages are the same node iff their canonical URLs agree; without
this, `http://Site.com/a?utm_source=x` and `http://site.com:80/a`
create two entities and the sameAs graph has to stitch them later.
Rules (the common-crawl-style subset that is safe without fetching):

- scheme and host lowercased;
- default port stripped (``:80`` for http, ``:443`` for https);
- fragment dropped;
- empty path → ``/``;
- query params: split on ``&``, drop empties and ``utm_*`` tracking
  params, sort, re-join (param ORDER never changes the resource for
  GET semantics; sorting makes the key deterministic).

Everything is regex + array ops chosen to evaluate identically under
Java regex (Spark) and RE2 (the DuckDB oracle): no lookaround, no
backrefs. Pure Column expressions — whole-stage codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def canonical_url(url: Column) -> Column:
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(url, _AUTH_RE, 1))
    auth = F.when(
        (scheme == "http") & auth.endswith(":80"),
        F.regexp_replace(auth, r":80$", ""),
    ).when(
        (scheme == "https") & auth.endswith(":443"),
        F.regexp_replace(auth, r":443$", ""),
    ).otherwise(auth)
    path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.array_sort(
        F.filter(
            F.split(F.regexp_extract(url, _QUERY_RE, 1), "&"),
            lambda p: (p != "") & ~p.startswith("utm_"),
        )
    )
    query = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    # non-absolute inputs (relative paths, mailto:, bare hosts) extract
    # an empty scheme — pass them through unchanged rather than collapse
    # every malformed page into the garbage key ':///' (ADVICE r2)
    return F.when(scheme == "", url).otherwise(
        F.concat(scheme, F.lit("://"), auth, path, query)
    )
