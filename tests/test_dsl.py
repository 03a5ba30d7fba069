"""Ported verbatim from reference test/test_sql.py (TestSql + TestMatcher):
same inputs, same expected values, against our hand-rolled parser."""

from osm_export_tool_python_spark.functions.dsl import Matcher, SQLValidator


class TestSql:
    def test_basic(self):
        assert SQLValidator("name = 'a name'").valid

    def test_identifier_list(self):
        assert SQLValidator("natural in ('water','cliff')").valid

    def test_float_value(self):
        assert SQLValidator("height > 20").valid

    def test_not_null(self):
        assert SQLValidator("height IS NOT NULL").valid

    def test_and_or(self):
        assert SQLValidator("height IS NOT NULL and height > 20").valid
        assert SQLValidator("height IS NOT NULL or height > 20").valid
        assert SQLValidator("height IS NOT NULL or height > 20 and height < 30").valid

    def test_parens(self):
        assert SQLValidator("(admin IS NOT NULL and level > 4)").valid
        assert SQLValidator("(admin IS NOT NULL and level > 4) AND height is not null").valid

    def test_colons_etc(self):
        assert SQLValidator("addr:housenumber IS NOT NULL").valid
        assert SQLValidator("admin_level IS NOT NULL").valid

    def test_invalid_sql(self):
        s = SQLValidator("drop table planet_osm_polygon")
        assert not s.valid
        assert s.errors == ["SQL could not be parsed."]
        s = SQLValidator("(drop table planet_osm_polygon)")
        assert not s.valid
        assert s.errors == ["SQL could not be parsed."]
        s = SQLValidator("")
        assert not s.valid
        assert s.errors == ["SQL could not be parsed."]
        s = SQLValidator("name = 'a name'; blah")
        assert not s.valid
        assert s.errors == ["SQL could not be parsed."]

    def test_column_names(self):
        s = SQLValidator("(admin IS NOT NULL and level > 4) AND height is not null")
        assert s.valid
        assert s.column_names == ["admin", "level", "height"]


class TestMatcher:
    def test_matcher_binop(self):
        m = Matcher.from_sql("building = 'yes'")
        assert m.matches({"building": "yes"})
        assert not m.matches({"building": "no"})

        m = Matcher.from_sql("building != 'yes'")
        assert not m.matches({"building": "yes"})
        assert m.matches({"building": "no"})
        # contractual: '!=' true on absent key (reference sql.py:89)
        assert m.matches({})

    def test_matcher_colon(self):
        m = Matcher.from_sql("addr:housenumber = 1")
        assert m.matches({"addr:housenumber": "1"})

    def test_matcher_doublequote(self):
        m = Matcher.from_sql('"addr:housenumber" = 1')
        assert m.matches({"addr:housenumber": "1"})

        m = Matcher.from_sql("\"addr:housenumber\" IN ('foo')")
        assert m.matches({"addr:housenumber": "foo"})

        m = Matcher.from_sql('"addr:housenumber" IS NOT NULL')
        assert m.matches({"addr:housenumber": "foo"})

    def test_matcher_or(self):
        m = Matcher.from_sql("building = 'yes' OR amenity = 'bank'")
        assert m.matches({"building": "yes"})
        assert m.matches({"amenity": "bank"})
        assert not m.matches({})

    def test_matcher_and(self):
        m = Matcher.from_sql("building = 'yes' AND amenity = 'bank'")
        assert not m.matches({"building": "yes"})
        assert not m.matches({"amenity": "bank"})
        assert m.matches({"building": "yes", "amenity": "bank"})

    def test_matcher_is_not_null(self):
        m = Matcher.from_sql("building IS NOT NULL")
        assert m.matches({"building": "one"})
        assert m.matches({"building": "two"})
        assert not m.matches({})

    def test_in(self):
        m = Matcher.from_sql("building IN ('one','two')")
        assert m.matches({"building": "one"})
        assert m.matches({"building": "two"})
        assert not m.matches({})
        assert not m.matches({"building": "three"})

    def test_any(self):
        assert Matcher.any("building").matches({"building": "one"})

    def test_union(self):
        m = Matcher.any("building").union(Matcher.any("parking"))
        assert m.matches({"building": "one"})
        assert m.matches({"parking": "one"})

    def test_null(self):
        assert not Matcher.null().matches({"building": "one"})

    def test_to_sql(self):
        for sql in [
            "building = 'yes'",
            "building IS NOT NULL",
            "building IN ('one','two')",
            "building != 'yes'",
            "building >= 0",
            "building <= 0",
            "building > 0",
            "building < 0",
            "building > 0 AND building < 5",
            "building > 0 OR building < 5",
        ]:
            assert Matcher.from_sql(sql).to_sql() == sql

    def test_lexicographic_trap(self):
        # reference sql.py:91-97 compares str() lexicographically
        m = Matcher.from_sql("height > 20")
        assert m.matches({"height": "9"})  # '9' > '2...'
        assert m.matches({"height": 21})
        assert not m.matches({"height": 20})
        assert not m.matches({})

    def test_precedence_right_assoc(self):
        # 'a or b and c' parses as ('or', a, ('and', b, c))
        m = Matcher.from_sql("a = '1' or b = '1' and c = '1'")
        assert m.expr == (
            "or", ("=", "a", "1"), ("and", ("=", "b", "1"), ("=", "c", "1")),
        )
        assert m.matches({"a": "1"})
        assert not m.matches({"b": "1"})
        assert m.matches({"b": "1", "c": "1"})
