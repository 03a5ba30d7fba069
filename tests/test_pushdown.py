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

    def test_empty(self):
        assert pushdown_keys(()) == []
