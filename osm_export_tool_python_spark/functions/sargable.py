"""Sargable hot-key pushdown: route theme predicates through
top-level parquet columns so the SCAN prunes row groups.

The tags live inside `spans` (and, decoded, inside a map column) —
neither shape reaches parquet min/max or dictionary statistics, so a
themed export always scans every row group no matter how selective
its `where` is.  The production fix is an INGEST-time projection: the
hot keys (the reference hard-codes 17 closed-way area keys,
osm_export_tool/tabular.py; any mapping's select keys qualify) are
materialized as plain nullable string columns ``hk_<key>`` next to
`spans` (sources/synth.synthesize(hot_keys=...) models this).  A
predicate over those columns is sargable: Catalyst pushes it into the
scan (`PushedFilters`) and the parquet reader skips row groups whose
stats exclude it — the verified scan-bytes drop lives in
tests/test_sargable.py.

``theme_candidate_condition`` derives a NECESSARY condition over the
available hk_ columns from a mapping's matchers: every document whose
entity can match ANY theme satisfies it (leaves on non-materialized
keys relax to TRUE, and the geometry-type gate is dropped — both only
widen the set).  Soundness boundary: the condition restricts which
documents can become THEMED FEATURES via their own tags; documents
serving purely as geometry (nodes referenced by ways, ways referenced
by relations) do NOT satisfy it in general, so apply it only to the
feature-candidate side of a pipeline — point-only mappings end to end,
or the tag-bearing branch of an assembly (exactly the contract of the
reference's osmium-tool tags-filter prefilter, README.md:61).
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import Column
from pyspark.sql import functions as F

HOT_PREFIX = "hk_"

_RANGE_OPS = {">", "<", ">=", "<="}


def hot_column(key: str) -> str:
    """Tag key → materialized column name.  The launder is INJECTIVE
    (parquet/Spark field names can't carry ':' etc., but two distinct
    keys must never share a column — 'addr:street' collapsing onto a
    column that holds tags['addr_street'] would silently filter on
    the wrong tag): ASCII alphanumerics pass through, '_' doubles to
    '__', any other char becomes '_x<2-hex>' (or '_u<4-hex>' beyond
    U+00FF).  Decoding is deterministic — after '_', a second '_' is
    a literal underscore and 'x'/'u'+hex is an escape — so distinct
    keys always produce distinct columns.  Plain alphanumeric keys
    (the common case: building, amenity, height …) are unchanged."""
    out = []
    for ch in key:
        if ch.isascii() and ch.isalnum():
            out.append(ch)
        elif ch == "_":
            out.append("__")
        elif ord(ch) <= 0xFF:
            out.append("_x%02x" % ord(ch))
        else:
            out.append("_u%04x" % ord(ch))
    return HOT_PREFIX + "".join(out)


def necessary_condition(expr, available) -> Column:
    """Matcher AST → Column over the hk_ columns in `available`,
    implied by the matcher (leaf on a non-materialized key → TRUE).
    Mirrors functions/compile.compile_expr's semantics exactly on
    materialized keys — including the `!=`-absent-true and
    lexicographic-range traps — since ``hk_<key>`` holds precisely
    ``tags[key]`` (NULL when absent).

    Correctness: and/or are monotone in Kleene 3VL, so replacing any
    leaf with TRUE can only raise the expression's value — the result
    dominates the real matcher row-wise, i.e. a WHERE on it keeps
    every row the matcher could keep.

    Deliberately NOT coalesced to two-valued: the result may be NULL
    only on rows where the matcher itself is NULL-or-false (which a
    WHERE drops identically), and a Coalesce wrapper would make the
    whole predicate untranslatable to a parquet source filter — the
    raw and/or/comparison/isNull shape is what reaches PushedFilters.
    Use it in WHERE clauses; wrap in F.coalesce(c, F.lit(False))
    yourself if you need a two-valued projection."""
    avail = set(available)

    def rec(e):
        if not e:  # Matcher.null(): match nothing
            return F.lit(False)
        op = e[0]
        if op == "and":
            return rec(e[1]) & rec(e[2])
        if op == "or":
            return rec(e[1]) | rec(e[2])
        col = hot_column(e[1])
        if col not in avail:
            return F.lit(True)
        v = F.col(col)
        if op == "notnull":
            return v.isNotNull()
        if op == "=":
            return v == F.lit(e[2])
        if op == "!=":
            return v.isNull() | (v != F.lit(e[2]))
        if op == "in":
            return v.isin(*[str(x) for x in e[2]])
        if op in _RANGE_OPS:
            w = F.lit(str(e[2]))
            return {">": v > w, "<": v < w, ">=": v >= w, "<=": v <= w}[op]
        raise ValueError("unknown operator %r" % (op,))

    return rec(expr)


def theme_candidate_condition(mapping, columns):
    """OR of every theme's necessary condition, or None when no theme
    references a materialized hot key (filtering would be a no-op —
    the caller should skip the `where` entirely so the plan stays
    clean)."""
    conds = []
    references_hot = False
    for theme in mapping.themes:
        conds.append(necessary_condition(theme.matcher.expr, columns))
        references_hot = references_hot or _references_hot(
            theme.matcher.expr, set(columns)
        )
    if not conds or not references_hot:
        return None
    return reduce(or_, conds)


def _references_hot(expr, avail) -> bool:
    if not expr:
        return False
    op = expr[0]
    if op in ("and", "or"):
        return _references_hot(expr[1], avail) or _references_hot(expr[2], avail)
    return hot_column(expr[1]) in avail
