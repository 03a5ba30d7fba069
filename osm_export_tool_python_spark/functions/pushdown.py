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

    # -- full QL query assembly (reference Overpass.fetch, sources.py:252-296)

    _MAPPED_TEMPLATE = """(
                (
                    {0}
                );
                (
                    {1}
                );>;
                (
                    {2}
                );>>;>;)"""

    @classmethod
    def region_clause(cls, rings=None, bbox=None):
        """Region selector: polygon AOI → ``poly:"lat lon …"`` over the
        exterior ring (note the reference's lat-lon order, "{1} {0}"),
        else a clamped south,west,north,east bbox (sources.py:257-267)."""
        if rings is not None:
            ring = rings[0]
            return 'poly:"{0}"'.format(
                " ".join("{1} {0}".format(float(x), float(y)) for x, y in ring)
            )
        west, south, east, north = bbox
        west, south = max(west, -180), max(south, -90)
        east, north = min(east, 180), min(north, 90)
        return "{1},{0},{3},{2}".format(west, south, east, north)

    @classmethod
    def query(cls, rings=None, bbox=None, mapping=None,
              maxsize=2147483648, timeout=1600):
        """The complete Overpass request body: [maxsize][timeout]
        headers, region clause, per-kind filter statements with member
        recursion (> / >>), ``out meta`` footer (sources.py:252-288)."""
        geom = cls.region_clause(rings=rings, bbox=bbox)
        if mapping is not None:
            nodes, ways, relations = cls.filters(mapping)
            q = cls._MAPPED_TEMPLATE.format(
                "\n".join("node({0}){1};".format(geom, f) for f in sorted(nodes)),
                "\n".join("way({0}){1};".format(geom, f) for f in sorted(ways)),
                "\n".join("relation({0}){1};".format(geom, f) for f in sorted(relations)),
            )
        else:
            q = "(node({0});<;>>;>;)".format(geom)
        return "[maxsize:{0}][timeout:{1}];{2};out meta;".format(maxsize, timeout, q)


class Galaxy:
    """Galaxy / HDX raw-data-API JSON filter backend (parity: reference
    sources.py:397-512).

    The third compiler over the shared Matcher AST: predicates become a
    ``{key: [values]}`` JSON filter — ``=`` → one value, ``IN`` → the
    value list, ranges / ``IS NOT NULL`` relax to key-presence
    (``key: []``), and leaves under an AND go to ``join_and`` while the
    rest go to ``join_or``.  Deliberate deviations from the reference:
    no mutable-default ``and_clause=[]`` leaking state across calls
    (sources.py:462), and values are merged as real lists instead of
    round-tripping through hand-assembled JSON strings (which left
    stray spaces inside IN values, sources.py:469-471)."""

    @classmethod
    def parts(cls, expr):
        """Flattened (key, values) leaves plus the leaves under every
        AND node (reference parts(), sources.py:462-483)."""
        and_clause = []

        def _parts(prefix):
            op = prefix[0]
            if op == "=":
                return [(prefix[1], [prefix[2]])]
            if op == "!=":
                raise ValueError(
                    "!= is not supported by the raw-data API (sources.py:466)"
                )
            if op in ("<", ">", "<=", ">=", "notnull"):
                return [(prefix[1], [])]
            if op == "in":
                return [(prefix[1], [str(v) for v in prefix[2]])]
            if op == "and":
                both = _parts(prefix[1]) + _parts(prefix[2])
                and_clause.append(both)
                return both
            if op == "or":
                return _parts(prefix[1]) + _parts(prefix[2])
            raise ValueError("unknown operator %r" % (op,))

        return _parts(expr), and_clause

    @classmethod
    def where_filter(cls, parts, filter_dict):
        """Merge (key, values) pairs into the running filter dict
        (reference where_filter, sources.py:487-512): key-presence
        (``[]``) dominates value lists; otherwise values accumulate."""
        for key, value in parts:
            if key not in filter_dict:
                filter_dict[key] = list(value)
            elif filter_dict[key] != []:
                if value == []:
                    filter_dict[key] = []
                else:
                    filter_dict[key] = filter_dict[key] + list(value)
        return filter_dict

    @classmethod
    def remove_duplicates(cls, entries_dict):
        for key, value in entries_dict.items():
            entries_dict[key] = list(dict.fromkeys(value))
        return entries_dict

    @classmethod
    def attribute_filter(cls, theme):
        """Selected columns; '*'/'all' means no attribute filter
        (reference sources.py:485-489)."""
        columns = theme.keys
        if "*" in columns or "all" in columns:
            return []
        return list(columns)

    @classmethod
    def _split_filters(cls, theme, or_filter, and_filter):
        parts, and_clauses = cls.parts(theme.matcher.expr)
        if and_clauses:
            flat = [leaf for clause in and_clauses for leaf in clause]
            for leaf in flat:
                if leaf in parts:
                    parts.remove(leaf)
            and_filter = cls.remove_duplicates(cls.where_filter(flat, and_filter))
        or_filter = cls.remove_duplicates(cls.where_filter(parts, or_filter))
        return or_filter, and_filter

    @classmethod
    def hdx_filters(cls, theme):
        """Per-theme HDX filter tuple (reference hdx_filters,
        sources.py:397-452): (point_filter, line_filter, poly_filter,
        geometry types, point/line/poly attribute columns)."""
        or_filter, and_filter = cls._split_filters(theme, {}, {})
        geometry_type = []
        point_filter, line_filter, poly_filter = {}, {}, {}
        point_columns, line_columns, poly_columns = [], [], []
        joined = {"join_or": or_filter, "join_and": and_filter}
        if theme.points:
            point_columns = cls.attribute_filter(theme)
            geometry_type.append("point")
            point_filter = joined
        if theme.lines:
            line_columns = cls.attribute_filter(theme)
            geometry_type.append("line")
            line_filter = joined
        if theme.polygons:
            poly_columns = cls.attribute_filter(theme)
            geometry_type.append("polygon")
            poly_filter = joined
        return (
            point_filter, line_filter, poly_filter, geometry_type,
            point_columns, line_columns, poly_columns,
        )

    @classmethod
    def filters(cls, mapping):
        """All-themes variant (reference filters, sources.py:454-512):
        or/and filters accumulate ACROSS themes into one shared dict."""
        or_filter, and_filter = {}, {}
        geometry_type = []
        point_filter, line_filter, poly_filter = {}, {}, {}
        # plain assignment per geometry kind: a later theme of the same
        # kind REPLACES the column list (not merged) — faithful to the
        # reference's loop (reference sources.py:430,435,440), where
        # *_columns carry the LAST matching theme's attribute_filter
        point_columns, line_columns, poly_columns = [], [], []
        for t in mapping.themes:
            or_filter, and_filter = cls._split_filters(t, or_filter, and_filter)
            joined = {"join_or": or_filter, "join_and": and_filter}
            if t.points:
                point_columns = cls.attribute_filter(t)
                geometry_type.append("point")
                point_filter = joined
            if t.lines:
                line_columns = cls.attribute_filter(t)
                geometry_type.append("line")
                line_filter = joined
            if t.polygons:
                poly_columns = cls.attribute_filter(t)
                geometry_type.append("polygon")
                poly_filter = joined
        return (
            point_filter, line_filter, poly_filter, geometry_type,
            point_columns, line_columns, poly_columns,
        )


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
    """Presence-guarantee key set for the scan-level coarse filter:
    every row matching ``expr`` is guaranteed to carry at least one of
    the returned keys; None = no guarantee (not sargable).

    Computed structurally, so a ``!=`` leaf (true on absent keys — no
    presence guarantee by itself) only poisons the branches it can
    actually satisfy alone:
      - leaf ``!=``            → None,
      - other leaves on key k  → {k} (presence semantics: =, range,
        IN, IS NOT NULL are all false/NULL when the key is absent),
      - AND(a, b)              → either side's guarantee (a matching
        row satisfies both, so pick the SMALLER valid set — smaller
        sets prune more rows at the scan); None only if both are None,
      - OR(a, b)               → union; None if either side is None,
      - ()  (match-nothing)    → ∅ (vacuous: no row matches at all).

    So ``(a != 'x') AND b IS NOT NULL`` → ['b'] (the r2 version
    returned None for any expression containing a ``!=``)."""

    def walk(e):
        if not e:
            return []
        op = e[0]
        if op == "and":
            k1, k2 = walk(e[1]), walk(e[2])
            if k1 is None:
                return k2
            if k2 is None:
                return k1
            return k1 if len(k1) <= len(k2) else k2
        if op == "or":
            k1, k2 = walk(e[1]), walk(e[2])
            if k1 is None or k2 is None:
                return None
            return k1 + [k for k in k2 if k not in k1]
        if op == "!=":
            return None
        return [e[1]]

    out = walk(expr)
    return None if out is None else list(dict.fromkeys(out))
