"""S10 — Turtle serialization of a triple DataFrame.

The reference serializes via rdflib (/root/reference/cli/csv_to_rdf.py:
79-92, prefix binding :80). rdflib isn't available in this environment,
so this is a from-scratch deterministic serializer for the engine's
triple model (subj, pred, obj, obj_dtype): grouped by subject, sorted
(subject, predicate, object) — the sorted-glob/stable-order discipline —
with prefix compaction for the bound namespaces.

Intended for fixture-scale output (tests, goldens): callers collect a
SMALL DataFrame and serialize driver-side; the at-scale sink is the
bucketed parquet store (plans/materialize.py).
"""

from __future__ import annotations

PREFIXES = {
    "cg": "https://cyclegraph.dev/ns#",
    "act": "https://cyclegraph.dev/activity/",
    "smp": "https://cyclegraph.dev/sample/",
    "schema": "http://schema.org/",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
}

_XSD = "http://www.w3.org/2001/XMLSchema#"

# Conservative PN_CHARS subset: ASCII alnum only. Python's str.isalnum()
# admits codepoints outside Turtle's PN_CHARS ranges (e.g. '²' — 'pow²'
# would compact to the invalid PN_LOCAL schema:pow²), so membership is
# explicit (ADVICE r5).
_PN_ASCII = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
)
# IRIREF production forbids controls/space and <>"{}|^`\ raw; emit them
# as UCHAR (\uXXXX) escapes in the <uri> fallback — spec-valid AND
# reversible (raw '\' is itself forbidden, so every backslash in output
# starts an escape; a uri containing a space previously serialized as
# the unparseable <https://x/a b> — ADVICE r5).
_IRI_FORBIDDEN = frozenset('<>"{}|^`\\') | frozenset(chr(c) for c in range(0x21))


def _iri(uri: str) -> str:
    if any(c in _IRI_FORBIDDEN for c in uri):
        uri = "".join(
            f"\\u{ord(c):04X}" if c in _IRI_FORBIDDEN else c for c in uri
        )
    return f"<{uri}>"


def _compact(uri: str) -> str:
    for pfx, ns in PREFIXES.items():
        if uri.startswith(ns):
            local = uri[len(ns):]
            # PN_LOCAL: dots allowed inside but not at the end, and the
            # first char may not be '-' or '.' — fall back to <uri> form
            if (
                local
                and all(c in _PN_ASCII or c in "_-." for c in local)
                and not local.endswith(".")
                and (local[0] in _PN_ASCII or local[0] == "_")
            ):
                return f"{pfx}:{local}"
    return _iri(uri)


def _term(obj: str, obj_dtype: str) -> str:
    if obj_dtype == "uri":
        return _compact(obj)
    # STRING_LITERAL_QUOTE excludes raw #x22 #x5C #xA #xD — escape all four
    escaped = (
        obj.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
    )
    if obj_dtype and obj_dtype.startswith(_XSD):
        return f'"{escaped}"^^{_compact(obj_dtype)}'
    return f'"{escaped}"'


def to_turtle(rows: list[tuple[str, str, str, str]]) -> str:
    """[(subj, pred, obj, obj_dtype)] → Turtle text, deterministic.

    Grouped per subject with ';' continuation, sorted everywhere.
    """
    used = sorted({p for p in PREFIXES})
    out = [f"@prefix {p}: <{PREFIXES[p]}> ." for p in used]
    out.append("")
    by_subj: dict[str, list[tuple[str, str, str]]] = {}
    for s, p, o, d in rows:
        by_subj.setdefault(s, []).append((p, o, d))
    for subj in sorted(by_subj):
        triples = sorted(set(by_subj[subj]))
        lines = [f"{_compact(subj)} {_compact(triples[0][0])} {_term(triples[0][1], triples[0][2])}"]
        for p, o, d in triples[1:]:
            lines.append(f"    {_compact(p)} {_term(o, d)}")
        out.append(" ;\n".join(lines) + " .")
        out.append("")
    return "\n".join(out).rstrip() + "\n"


def dataframe_to_turtle(triples_df) -> str:
    """Collect a SMALL triple DataFrame and serialize (fixture path)."""
    rows = [
        (r["subj"], r["pred"], r["obj"], r["obj_dtype"])
        for r in triples_df.select("subj", "pred", "obj", "obj_dtype").collect()
    ]
    return to_turtle(rows)
