"""Relaxed-predicate pushdown compilers.

The reference compiles the one Matcher AST to three remote filter
dialects (Overpass QL strings — sources.py:207-224; osmium tags-filter
strings — sources.py:89-105; Galaxy JSON — sources.py:461-483).  The
shared structure is *monotone relaxation*: AND and OR both flatten to a
candidate list, range/notnull predicates weaken to key-presence,
because the exact predicate is re-applied locally afterwards.  That is
exactly Spark's pushed-filters + residual-filter model, so these
compilers serve two roles here:

  1. behavioral parity with the reference test suite
     (test/test_sources.py), and
  2. ``pushdown_keys`` feeds the scan-level coarse filter
     (``size(tags)>0 AND (tags has any candidate key)``) that the
     Catalyst residual predicate then refines.
"""

from __future__ import annotations


def _flatten(expr, leaf):
    """Walk an AST flattening and/or into one candidate list."""
    op = expr[0]
    if op in ("and", "or"):
        return _flatten(expr[1], leaf) + _flatten(expr[2], leaf)
    return leaf(expr)


class Overpass:
    """Overpass-QL filter backend (parity: reference sources.py:188-230)."""

    @classmethod
    def parts(cls, expr):
        def leaf(e):
            op = e[0]
            if op == "=":
                return ["['{0}'='{1}']".format(e[1], e[2])]
            if op == "!=":
                return ["['{0}'!='{1}']".format(e[1], e[2])]
            if op == "in":
                return ["['{0}'~'{1}']".format(e[1], "|".join(e[2]))]
            # ranges and notnull relax to key presence
            return ["['{0}']".format(e[1])]

        return _flatten(expr, leaf)

    @classmethod
    def sql(cls, s):
        from .dsl import to_prefix

        return cls.parts(to_prefix(s))

    @classmethod
    def filters(cls, mapping):
        """Per-entity-kind filter sets: points→nodes, lines→ways,
        polygons→ways+relations (reference sources.py:188-205)."""
        nodes, ways, relations = set(), set(), set()
        for t in mapping.themes:
            for part in cls.parts(t.matcher.expr):
                if t.points:
                    nodes.add(part)
                if t.lines:
                    ways.add(part)
                if t.polygons:
                    ways.add(part)
                    relations.add(part)
        return nodes, ways, relations


class TagsFilter:
    """osmium tags-filter backend (parity: reference sources.py:89-132).

    Stricter than Overpass: range and notnull predicates are not
    expressible, so compilation refuses (ValueError) rather than relax."""

    @classmethod
    def parts(cls, expr):
        def leaf(e):
            op = e[0]
            if op == "=":
                return ["{0}={1}".format(e[1], e[2])]
            if op == "!=":
                return ["{0}!={1}".format(e[1], e[2])]
            if op == "in":
                return ["{0}={1}".format(e[1], ",".join(e[2]))]
            raise ValueError("{0} where clause not supported".format(op))

        return _flatten(expr, leaf)

    @classmethod
    def element_filters(cls, theme, part):
        out = []
        if theme.points:
            out.append("n/{0}".format(part))
        if theme.lines:
            out.append("w/{0}".format(part))
        if theme.polygons:
            out.append("r/{0}".format(part))
        return out

    @classmethod
    def filters(cls, mapping):
        out = set()
        for t in mapping.themes:
            for part in cls.parts(t.matcher.expr):
                out.update(cls.element_filters(t, part))
        return out


def pushdown_keys(expr):
    """All tag keys a predicate can touch — the sargable candidate set.

    Any row matching ``expr`` must have at least one of these keys
    present, EXCEPT when the expression contains a ``!=`` leaf (true on
    absent keys, so no presence guarantee survives an OR with it) —
    then returns None (= not sargable)."""
    keys = []
    sargable = [True]

    def walk(e):
        if not e:
            return
        op = e[0]
        if op in ("and", "or"):
            walk(e[1])
            walk(e[2])
        else:
            if op == "!=":
                sargable[0] = False
            keys.append(e[1])

    walk(expr)
    # An AND still guarantees presence of the non-'!=' side, but keep the
    # conservative rule: any '!=' anywhere → not sargable.
    return None if not sargable[0] else list(dict.fromkeys(keys))
