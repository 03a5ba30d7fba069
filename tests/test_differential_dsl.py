"""Differential test: our parser/evaluator vs the reference's actual
osm_export_tool/sql.py (imported by file path — it only needs pyparsing),
over a seeded random corpus of expressions and tag dicts."""

import importlib.util
import random

import pytest

from osm_export_tool_python_spark.functions.dsl import Matcher, to_prefix

REF_SQL = "/root/reference/osm_export_tool/sql.py"


def _load_ref():
    spec = importlib.util.spec_from_file_location("ref_sql", REF_SQL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


try:
    ref = _load_ref()
    HAVE_REF = True
except Exception:  # pragma: no cover - reference absent outside sandbox
    HAVE_REF = False

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference repo not present")

KEYS = ["building", "amenity", "height", "addr:housenumber", "natural", "x_1"]
VALS = ["yes", "no", "1", "20", "9", "bank", "water", "some value"]


def gen_expr(rng, depth=0):
    r = rng.random()
    if depth < 3 and r < 0.35:
        op = rng.choice(["and", "or"])
        return "(%s) %s (%s)" % (gen_expr(rng, depth + 1), op, gen_expr(rng, depth + 1))
    k = rng.choice(KEYS)
    kq = '"%s"' % k if (":" in k and rng.random() < 0.5) else k
    kind = rng.choice(["=", "!=", "<", ">", "<=", ">=", "notnull", "in"])
    if kind == "notnull":
        return "%s IS NOT NULL" % kq
    if kind == "in":
        vals = rng.sample(VALS, rng.randint(1, 3))
        return "%s IN (%s)" % (kq, ",".join("'%s'" % v for v in vals))
    v = rng.choice(VALS)
    rval = v if v.isdigit() and rng.random() < 0.5 else "'%s'" % v
    return "%s %s %s" % (kq, kind, rval)


def gen_tags(rng):
    tags = {}
    for k in KEYS:
        if rng.random() < 0.45:
            v = rng.choice(VALS)
            tags[k] = int(v) if v.isdigit() and rng.random() < 0.3 else v
    return tags


def test_differential_fuzz():
    rng = random.Random(20260816)
    for _ in range(400):
        sql = gen_expr(rng)
        ours = to_prefix(sql)
        theirs = ref.to_prefix(sql)

        def norm(e):
            if not e:
                return e
            if e[0] in ("and", "or"):
                return (e[0], norm(e[1]), norm(e[2]))
            if e[0] == "in":
                return (e[0], e[1], list(e[2]))
            return tuple(e)

        assert norm(ours) == norm(theirs), sql
        for _ in range(8):
            tags = gen_tags(rng)
            assert Matcher(ours).matches(tags) == ref.Matcher(theirs).matches(tags), (
                sql,
                tags,
            )


def test_differential_invalid():
    rng = random.Random(7)
    bad = [
        "drop table x",
        "a = ",
        "= 'x'",
        "a in ()",
        "a in ('x'",
        "(a = 'x'",
        "a = 'x') ",
        "a is null",
        "not a = 'x'",
        "a like 'x'",
        "a = b",  # column-to-column comparison is not in the dialect
    ]
    for sql in bad:
        ours_ok = True
        try:
            to_prefix(sql)
        except Exception:
            ours_ok = False
        theirs_ok = True
        try:
            ref.to_prefix(sql)
        except Exception:
            theirs_ok = False
        assert ours_ok == theirs_ok, sql
