"""Ported verbatim from reference test/test_sources.py (Overpass filter
compilation), plus tags-filter backend and sargable-key extraction."""

import pytest

from osm_export_tool_python_spark.functions.dsl import to_prefix
from osm_export_tool_python_spark.functions.mapping import Mapping
from osm_export_tool_python_spark.functions.pushdown import (
    Overpass,
    TagsFilter,
    pushdown_keys,
)


class TestMappingToOverpass:
    def test_mapping(self):
        y = """
        buildings:
            types:
                - points
            select:
                - column1
            where: column2 IS NOT NULL

        other1:
            types:
                - points
                - polygons
            select:
                - column1
                - irrelevant
            where: column2 IS NOT NULL AND column3 IN ('foo','bar')

        other2:
            types:
                - lines
            select:
                - column5:key
        """
        nodes, ways, relations = Overpass.filters(Mapping(y))
        assert sorted(nodes) == sorted(["['column3'~'foo|bar']", "['column2']"])
        assert sorted(ways) == sorted(
            ["['column5:key']", "['column3'~'foo|bar']", "['column2']"]
        )
        assert sorted(relations) == sorted(["['column3'~'foo|bar']", "['column2']"])


class TestSQLToOverpass:
    def test_basic(self):
        assert Overpass.sql("name = 'somename'") == ["['name'='somename']"]
        assert Overpass.sql("level > 4") == ["['level']"]

    def test_basic_list(self):
        assert Overpass.sql("name IN ('val1','val2')") == ["['name'~'val1|val2']"]

    def test_whitespace(self):
        assert Overpass.sql("name = 'some value'") == ["['name'='some value']"]

    def test_notnull(self):
        assert Overpass.sql("name is not null") == ["['name']"]

    def test_and_or(self):
        assert Overpass.sql("name1 = 'foo' or name2 = 'bar'") == [
            "['name1'='foo']",
            "['name2'='bar']",
        ]
        assert Overpass.sql("(name1 = 'foo' and name2 = 'bar') or name3 = 'baz'") == [
            "['name1'='foo']",
            "['name2'='bar']",
            "['name3'='baz']",
        ]


class TestTagsFilter:
    def test_eq_and_in(self):
        assert TagsFilter.parts(to_prefix("building = 'yes'")) == ["building=yes"]
        assert TagsFilter.parts(to_prefix("building IN ('a','b')")) == ["building=a,b"]
        assert TagsFilter.parts(to_prefix("a != 'x'")) == ["a!=x"]

    def test_range_unsupported(self):
        with pytest.raises(ValueError):
            TagsFilter.parts(to_prefix("height > 20"))
        with pytest.raises(ValueError):
            TagsFilter.parts(to_prefix("height IS NOT NULL"))

    def test_element_prefixes(self):
        y = """
        t:
          types:
            - points
            - polygons
          select:
            - building
          where: building = 'yes'
        """
        assert TagsFilter.filters(Mapping(y)) == {"n/building=yes", "r/building=yes"}


class TestPushdownKeys:
    def test_simple(self):
        assert pushdown_keys(to_prefix("building = 'yes'")) == ["building"]
        assert pushdown_keys(
            to_prefix("building = 'yes' or amenity IN ('a','b')")
        ) == ["building", "amenity"]

    def test_not_sargable(self):
        assert pushdown_keys(to_prefix("building != 'yes'")) is None
        assert pushdown_keys(to_prefix("a = 'x' or b != 'y'")) is None

    def test_and_recovers_guarantee_from_non_neq_side(self):
        # a '!=' no longer poisons the whole expression: the AND's other
        # side still guarantees presence (VERDICT r2 next #6)
        assert pushdown_keys(to_prefix("a != 'x' and b is not null")) == ["b"]
        assert pushdown_keys(to_prefix("b = '1' and a != 'x'")) == ["b"]
        # OR of two such ANDs unions the recovered guarantees
        assert pushdown_keys(
            to_prefix("(a != 'x' and b = '1') or (c != 'y' and d > '2')")
        ) == ["b", "d"]
        # but an OR with a bare '!=' side still has no guarantee
        assert pushdown_keys(to_prefix("b = '1' or a != 'x'")) is None

    def test_and_picks_smaller_side(self):
        # both sides sargable: the smaller set prunes more at the scan
        assert pushdown_keys(
            to_prefix("(a = '1' or b = '2') and c is not null")
        ) == ["c"]

    def test_empty(self):
        assert pushdown_keys(()) == []


class TestOverpassQueryAssembly:
    """Full QL request body (reference Overpass.fetch, sources.py:252-296)."""

    Y = """
    buildings:
        types: [polygons]
        select: [building]
        where: building IS NOT NULL
    pois:
        types: [points]
        select: [amenity]
        where: amenity = 'cafe'
    """

    def test_bbox_no_mapping(self):
        q = Overpass.query(bbox=(-200.0, -95.0, 200.0, 95.0))
        assert q.startswith("[maxsize:2147483648][timeout:1600];")
        assert q.endswith(";out meta;")
        # clamped, in south,west,north,east order (sources.py:260-266)
        assert "(node(-90,-180,90,180);<;>>;>;)" in q

    def test_poly_region(self):
        import numpy as np

        ring = np.array([[10.0, 50.0], [11.0, 50.0], [11.0, 51.0]])
        clause = Overpass.region_clause(rings=[ring])
        # lat lon order ("{1} {0}", sources.py:258)
        assert clause == 'poly:"50.0 10.0 50.0 11.0 51.0 11.0"'

    def test_mapped_statements(self):
        q = Overpass.query(bbox=(0.0, 0.0, 1.0, 1.0), mapping=Mapping(self.Y))
        geom = "0.0,0.0,1.0,1.0"
        assert "node(%s)['amenity'='cafe'];" % geom in q
        assert "way(%s)['building'];" % geom in q
        assert "relation(%s)['building'];" % geom in q
        # member recursion clauses between statement groups
        assert ");>;" in q and ");>>;>;)" in q
        # points-only filters never appear as way/relation statements
        assert "way(%s)['amenity'='cafe'];" % geom not in q

    def test_headers_configurable(self):
        q = Overpass.query(bbox=(0.0, 0.0, 1.0, 1.0), maxsize=1024, timeout=25)
        assert q.startswith("[maxsize:1024][timeout:25];")


class TestGalaxyFilters:
    """AST → Galaxy/HDX JSON filters (reference sources.py:397-512)."""

    def _theme(self, y):
        return Mapping(y).themes[0]

    def test_simple_or(self):
        from osm_export_tool_python_spark.functions.pushdown import Galaxy

        t = self._theme(
            "a:\n types: [points]\n select: [amenity]\n"
            " where: amenity = 'cafe' OR shop IN ('bakery','deli')\n"
        )
        pf, lf, gf, geoms, pc, lc, gc = Galaxy.hdx_filters(t)
        assert geoms == ["point"]
        assert pf == {
            "join_or": {"amenity": ["cafe"], "shop": ["bakery", "deli"]},
            "join_and": {},
        }
        assert lf == {} and gf == {}
        assert pc == ["amenity"] and lc == [] and gc == []

    def test_and_clause_split(self):
        from osm_export_tool_python_spark.functions.pushdown import Galaxy

        t = self._theme(
            "a:\n types: [polygons]\n select: [building]\n"
            " where: building = 'yes' AND height IS NOT NULL\n"
        )
        pf, lf, gf, geoms, *_ = Galaxy.hdx_filters(t)
        assert geoms == ["polygon"]
        assert gf == {
            "join_or": {},
            "join_and": {"building": ["yes"], "height": []},
        }

    def test_notnull_dominates_values(self):
        from osm_export_tool_python_spark.functions.pushdown import Galaxy

        t = self._theme(
            "a:\n types: [points]\n select: [amenity]\n"
            " where: amenity = 'cafe' OR amenity IS NOT NULL\n"
        )
        pf, *_ = Galaxy.hdx_filters(t)
        # key-presence ([]) swallows the value list (sources.py:500-510)
        assert pf["join_or"] == {"amenity": []}

    def test_no_state_leak_between_calls(self):
        """The reference's mutable-default and_clause=[] accumulates
        across calls (sources.py:462); this port must not."""
        from osm_export_tool_python_spark.functions.pushdown import Galaxy

        t = self._theme(
            "a:\n types: [points]\n select: [x]\n"
            " where: x = '1' AND y = '2'\n"
        )
        first = Galaxy.hdx_filters(t)
        second = Galaxy.hdx_filters(t)
        assert first == second

    def test_wildcard_columns(self):
        from osm_export_tool_python_spark.functions.pushdown import Galaxy

        t = self._theme(
            "a:\n types: [points]\n select: ['*']\n where: x = '1'\n"
        )
        assert Galaxy.attribute_filter(t) == []

    def test_neq_unsupported(self):
        from osm_export_tool_python_spark.functions.pushdown import Galaxy

        t = self._theme(
            "a:\n types: [points]\n select: [x]\n where: x != '1'\n"
        )
        with pytest.raises(ValueError):
            Galaxy.hdx_filters(t)

    def test_mapping_level_filters_accumulate(self):
        from osm_export_tool_python_spark.functions.pushdown import Galaxy

        m = Mapping(
            "a:\n types: [points]\n select: [amenity]\n where: amenity = 'cafe'\n"
            "b:\n types: [lines]\n select: [highway]\n where: highway = 'primary'\n"
        )
        pf, lf, gf, geoms, pc, lc, gc = Galaxy.filters(m)
        assert geoms == ["point", "line"]
        # shared accumulation across themes (reference filters, sources.py:454+)
        assert lf["join_or"] == {"amenity": ["cafe"], "highway": ["primary"]}
        assert pc == ["amenity"] and lc == ["highway"]
