"""Span decoder: interleaved documents → typed entity DataFrames.

The reference gets pre-parsed entities from libosmium callbacks
(tabular.py:263,279,308); this engine's scan is a parquet/Iceberg read
of the documents table followed by a *pure-Column* decode projection —
`filter`/`transform`/`map_from_entries` higher-order functions, fully
inside Catalyst/codegen.  The only Python crossing is the vectorized
WKB-point hex decoder (numpy frombuffer over a whole Arrow batch).

Loss-free contract: ``reencode_spans`` reconstructs the span sequence
from the decoded columns; per-row equality with the original array
(kind, text, media_ref, order) is the input_hint invariant, tested in
tests/test_synth_decode.py.
"""

from __future__ import annotations

import binascii

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


#: When True (default), trust that span arrays arrive in offset order —
#: the input_hint guarantees offsets are strictly increasing and
#: parquet/Iceberg preserve array element order, so re-sorting is
#: redundant.  The comparator-lambda sort is interpreted (not codegen)
#: and costs ~25% of total decode time at scale; flip this to False for
#: producers that shuffle spans.  `spans_out_of_order_count` audits the
#: assumption cheaply.
ASSUME_SPANS_SORTED = True


def _spans_sorted(spans=None):
    """Offset-order restoring sort (identity under ASSUME_SPANS_SORTED)."""
    if spans is None:
        spans = F.col("spans")
    if ASSUME_SPANS_SORTED:
        return spans
    return F.array_sort(
        spans,
        lambda a, b: F.when(a.offset < b.offset, -1)
        .when(a.offset > b.offset, 1)
        .otherwise(0),
    )


def spans_out_of_order_count(docs: DataFrame) -> int:
    """Audit query for ASSUME_SPANS_SORTED: number of documents whose
    span offsets are not strictly increasing."""
    bad = F.exists(
        F.zip_with(
            F.slice("spans", 1, F.greatest(F.size("spans") - 1, F.lit(0))),
            F.slice("spans", 2, F.greatest(F.size("spans") - 1, F.lit(0))),
            lambda a, b: a.offset >= b.offset,
        ),
        lambda x: x,
    )
    return docs.where(bad).count()


def with_entity_meta(docs: DataFrame) -> DataFrame:
    """Add src ('node'|'way'|'rel'), orig_id (long), tags (map)."""
    spans = _spans_sorted()
    tag_spans = F.filter(spans, lambda s: s.kind == F.lit("tag"))

    def tag_entry(s):
        # split on the FIRST '=' only (values may contain '=').  One
        # instr + two substrs — the split_part form allocated two split
        # arrays per tag, measurable allocation pressure at 10^12 docs.
        pos = F.instr(s.text, "=")
        return F.struct(
            F.when(pos == 0, s.text)
            .otherwise(F.substr(s.text, F.lit(1), pos - 1))
            .alias("key"),
            F.when(pos == 0, F.lit(""))
            .otherwise(F.substr(s.text, pos + 1, F.length(s.text)))
            .alias("value"),
        )

    tags = F.map_from_entries(F.transform(tag_spans, tag_entry))
    return docs.select(
        "*",
        F.split_part("doc_id", F.lit("/"), F.lit(1)).alias("src"),
        F.split_part("doc_id", F.lit("/"), F.lit(2)).cast("long").alias("orig_id"),
        tags.alias("tags"),
    )


_UDF_CACHE = {}


def wkb_point_decode(col):
    """Vectorized WKB POINT (little-endian) hex → struct<lon,lat>.  One
    unhexlify over the concatenated batch, zero per-row Python.
    (pandas_udf is built lazily: pyspark 4 needs an active session to
    parse the DDL return type.)"""
    if "decode" not in _UDF_CACHE:

        @pandas_udf("struct<lon:double,lat:double>")
        def _decode(hex_s: pd.Series) -> pd.DataFrame:
            n = len(hex_s)
            if n == 0:
                return pd.DataFrame({"lon": [], "lat": []})
            isnull = hex_s.isna().to_numpy()
            filled = hex_s.fillna("0" * 42)
            joined = "".join(filled.tolist())
            raw = np.frombuffer(binascii.unhexlify(joined), dtype=np.uint8).reshape(n, 21)
            lon = raw[:, 5:13].copy().view("<f8").ravel()
            lat = raw[:, 13:21].copy().view("<f8").ravel()
            lon = np.where(isnull, np.nan, lon)
            lat = np.where(isnull, np.nan, lat)
            return pd.DataFrame({"lon": lon, "lat": lat})

        _UDF_CACHE["decode"] = _decode
    return _UDF_CACHE["decode"](col)


#: Use the pure-Column (JVM codegen) WKB decoder instead of the pandas
#: UDF.  Same bit-exact doubles either way (tests/test_synth_decode.py
#: asserts equality).  r6 default: FALSE — the conv/substring double
#: reconstruction is the decode scan's hottest expression (~2/3 of
#: decode CPU; 140 task-cpu-seconds at the 550k-doc driver scale), and
#: the vectorized numpy decoder (one unhexlify + frombuffer per Arrow
#: batch) measured consistently faster at every width tried:
#: 0.79 vs 1.54 s at local[32]/550k docs, 1.89 vs 7.60 s at
#: local[2]/550k docs, 0.60 vs 0.82 s at local[32]/55k docs
#: (interleaved min-of-N noop timings, OPTIMIZATION_r06.md).  The
#: Arrow crossing ships only the 42-char media hex of node rows and
#: the pipeline already runs Python workers (clip kernel, relation
#: stitcher), so the worker pool is warm.  Set True to pin the
#: zero-Python-crossing Column path.
WKB_DECODE_JVM = False


def _le_double(col, start_byte):
    """IEEE-754 double from 8 little-endian bytes of a hex string,
    reconstructed with exact Column arithmetic (no Python, no UDF):

      hi word (bits 32-63) and lo word (bits 0-31) each fit a LONG via
      conv(hex8, 16, 10); mantissa = (hi & 0xFFFFF)*2^32 + lo is ≤ 2^52
      so the long is exact, mant/2^52 is a power-of-two division (exact
      in binary), and multiplying by pow(2, exp-1023) is exact — the
      reconstruction is bit-identical to frombuffer('<f8'), including
      the exp==0x7FF specials (±Inf / NaN)."""

    def byte_hex(i):
        return F.substring(col, 2 * (start_byte + i) + 1, 2)

    hi = F.conv(
        F.concat(byte_hex(7), byte_hex(6), byte_hex(5), byte_hex(4)), 16, 10
    ).cast("long")
    lo = F.conv(
        F.concat(byte_hex(3), byte_hex(2), byte_hex(1), byte_hex(0)), 16, 10
    ).cast("long")
    sign = F.shiftright(hi, 31).bitwiseAND(F.lit(1))
    exp = F.shiftright(hi, 20).bitwiseAND(F.lit(0x7FF))
    mant = hi.bitwiseAND(F.lit(0xFFFFF)) * F.lit(4294967296) + lo
    frac = mant.cast("double") / F.lit(float(2**52))
    mag = (
        F.when(exp == 0x7FF, F.when(mant == 0, F.lit(float("inf"))).otherwise(F.lit(float("nan"))))
        .when(exp == 0, frac * F.lit(float(2.0**-1022)))
        .otherwise((F.lit(1.0) + frac) * F.pow(F.lit(2.0), (exp - 1023).cast("double")))
    )
    return F.when(sign == 1, -mag).otherwise(mag)


def wkb_point_decode_col(col):
    """Pure-Column WKB POINT (little-endian) hex → struct<lon,lat>.
    Layout: byte 0 = order, 1-4 = type, 5-12 = x, 13-20 = y."""
    return F.struct(
        _le_double(col, 5).alias("lon"), _le_double(col, 13).alias("lat")
    )


def _pt_decode(col):
    """Dispatch: JVM Column decoder (default) or pandas-UDF fallback."""
    return wkb_point_decode_col(col) if WKB_DECODE_JVM else wkb_point_decode(col)


def entities_table(docs_meta: DataFrame) -> DataFrame:
    """ONE-PASS decode of every entity kind into a narrow frame:

        src, orig_id, tags,
        lon, lat                       (nodes)
        ref_ids, n_refs, is_closed     (ways)
        member_roles, member_way_ids   (relations)

    This is the scan-economy keystone at 100 TB: the wide `spans`
    payload is read ONCE; downstream tables (nodes_table / ways /
    refs / members) are cheap projections of this frame, so persisting
    it turns the assembly pipeline's five full-table scans into one."""
    spans = _spans_sorted()
    media = F.try_element_at(
        F.filter(spans, lambda s: s.kind == F.lit("media")), F.lit(1)
    )
    refs = F.filter(spans, lambda s: s.kind == F.lit("ref"))
    ref_ids = F.transform(
        refs, lambda s: F.split_part(s.media_ref, F.lit("/"), F.lit(2)).cast("long")
    )
    members = F.filter(spans, lambda s: s.kind == F.lit("member"))
    first = F.try_element_at(refs, F.lit(1)).media_ref
    last = F.try_element_at(refs, F.lit(-1)).media_ref
    pt = _pt_decode(media.media_ref)
    return docs_meta.select(
        "src",
        "orig_id",
        "tags",
        F.when(F.col("src") == "node", pt.lon).alias("lon"),
        F.when(F.col("src") == "node", pt.lat).alias("lat"),
        F.when(F.col("src") == "way", ref_ids).alias("ref_ids"),
        F.when(F.col("src") == "way", F.size(refs)).alias("n_refs"),
        # osmium is_closed() is first==last regardless of length; rings
        # too short to be areas are rejected by the polygon path instead
        F.when(
            F.col("src") == "way", F.coalesce(first == last, F.lit(False))
        ).alias("is_closed"),
        F.when(
            F.col("src") == "rel", F.transform(members, lambda s: s.text)
        ).alias("member_roles"),
        F.when(
            F.col("src") == "rel",
            F.transform(
                members,
                lambda s: F.split_part(s.media_ref, F.lit("/"), F.lit(2)).cast("long"),
            ),
        ).alias("member_way_ids"),
    )


def nodes_from_entities(entities: DataFrame) -> DataFrame:
    return entities.where(F.col("src") == "node").select(
        F.col("orig_id").alias("node_id"), "tags", "lon", "lat"
    )


def way_refs_from_entities(entities: DataFrame) -> DataFrame:
    return entities.where(F.col("src") == "way").select(
        F.col("orig_id").alias("way_id"),
        F.posexplode("ref_ids").alias("seq", "node_id"),
    )


def ways_from_entities(entities: DataFrame) -> DataFrame:
    return entities.where(F.col("src") == "way").select(
        F.col("orig_id").alias("way_id"), "tags", "n_refs", "is_closed"
    )


def rel_members_from_entities(entities: DataFrame) -> DataFrame:
    mp = entities.where(
        (F.col("src") == "rel")
        & (F.try_element_at("tags", F.lit("type")) == "multipolygon")
    )
    pairs = F.zip_with(
        "member_roles",
        "member_way_ids",
        lambda r, w: F.struct(r.alias("role"), w.alias("way_id")),
    )
    return mp.select(
        F.col("orig_id").alias("rel_id"),
        "tags",
        F.posexplode(pairs).alias("member_seq", "m"),
    ).select(
        "rel_id", "tags", "member_seq",
        F.col("m.role").alias("role"), F.col("m.way_id").alias("way_id"),
    )


def nodes_table(docs_meta: DataFrame) -> DataFrame:
    """(node_id, tags, lon, lat) — every node, tagged or not (untagged
    nodes still anchor way geometry, reference location index)."""
    media = F.try_element_at(
        F.filter(_spans_sorted(), lambda s: s.kind == F.lit("media")), F.lit(1)
    )
    df = docs_meta.where(F.col("src") == "node").select(
        F.col("orig_id").alias("node_id"),
        "tags",
        _pt_decode(media.media_ref).alias("pt"),
    )
    return df.select("node_id", "tags", F.col("pt.lon").alias("lon"), F.col("pt.lat").alias("lat"))


def way_refs_table(docs_meta: DataFrame) -> DataFrame:
    """(way_id, seq, node_id) — the explicit form of osmium's node
    location index (reference cmd.py:58 locations=True)."""
    refs = F.filter(_spans_sorted(), lambda s: s.kind == F.lit("ref"))
    ref_ids = F.transform(
        refs, lambda s: F.split_part(s.media_ref, F.lit("/"), F.lit(2)).cast("long")
    )
    return (
        docs_meta.where(F.col("src") == "way")
        .select(F.col("orig_id").alias("way_id"), F.posexplode(ref_ids).alias("seq", "node_id"))
    )


def ways_table(docs_meta: DataFrame) -> DataFrame:
    """(way_id, tags, n_refs, is_closed)."""
    refs = F.filter(_spans_sorted(), lambda s: s.kind == F.lit("ref"))
    first = F.try_element_at(refs, F.lit(1)).media_ref
    last = F.try_element_at(refs, F.lit(-1)).media_ref
    return docs_meta.where(F.col("src") == "way").select(
        F.col("orig_id").alias("way_id"),
        "tags",
        F.size(refs).alias("n_refs"),
        # osmium semantics: closed iff first==last (length-independent)
        F.coalesce(first == last, F.lit(False)).alias("is_closed"),
    )


def rel_members_table(docs_meta: DataFrame) -> DataFrame:
    """(rel_id, member_seq, role, way_id) for type=multipolygon relations."""
    members = F.filter(_spans_sorted(), lambda s: s.kind == F.lit("member"))
    entries = F.transform(
        members,
        lambda s: F.struct(
            s.text.alias("role"),
            F.split_part(s.media_ref, F.lit("/"), F.lit(2)).cast("long").alias("way_id"),
        ),
    )
    return (
        docs_meta.where(
            (F.col("src") == "rel")
            & (F.try_element_at("tags", F.lit("type")) == "multipolygon")
        )
        .select(F.col("orig_id").alias("rel_id"), "tags", F.posexplode(entries).alias("member_seq", "m"))
        .select("rel_id", "tags", "member_seq", F.col("m.role").alias("role"), F.col("m.way_id").alias("way_id"))
    )


def rels_table(docs_meta: DataFrame) -> DataFrame:
    return docs_meta.where(F.col("src") == "rel").select(
        F.col("orig_id").alias("rel_id"), "tags"
    )


def wkb_point_encode(lon_col, lat_col):
    """Inverse of wkb_point_decode — vectorized lon/lat → WKB hex."""
    if "encode" not in _UDF_CACHE:

        @pandas_udf("string")
        def _encode(lon: pd.Series, lat: pd.Series) -> pd.Series:
            from ..sources.synth import point_wkb_hex

            return pd.Series(
                point_wkb_hex(lon.to_numpy(np.float64), lat.to_numpy(np.float64)),
                dtype="object" if len(lon) == 0 else None,
            )

        _UDF_CACHE["encode"] = _encode
    return _UDF_CACHE["encode"](lon_col, lat_col)


def reencode_spans(docs_meta: DataFrame) -> DataFrame:
    """Rebuild each document's span sequence FROM the decoded typed
    columns (tags map, ref/member targets, re-encoded WKB from decoded
    lon/lat) to prove decode is loss-free — the input_hint's per-row
    span-sequence (kind, text, media_ref, order) equality invariant.

    Relies on Spark maps preserving entry order (they are stored as
    paired arrays), which map_from_entries/map_entries guarantee."""
    spans = _spans_sorted()
    tag_spans = F.transform(
        F.map_entries("tags"),
        lambda e: F.struct(
            F.lit("tag").alias("kind"),
            F.concat(e.key, F.lit("="), e.value).alias("text"),
            F.lit("").alias("media_ref"),
        ),
    )
    refs = F.filter(spans, lambda s: s.kind == F.lit("ref"))
    ref_spans = F.transform(
        F.transform(refs, lambda s: F.split_part(s.media_ref, F.lit("/"), F.lit(2)).cast("long")),
        lambda nid: F.struct(
            F.lit("ref").alias("kind"),
            F.lit("").alias("text"),
            F.concat(F.lit("node/"), nid.cast("string")).alias("media_ref"),
        ),
    )
    members = F.filter(spans, lambda s: s.kind == F.lit("member"))
    member_spans = F.transform(
        members,
        lambda s: F.struct(
            F.lit("member").alias("kind"),
            s.text.alias("text"),
            F.concat(
                F.lit("way/"),
                F.split_part(s.media_ref, F.lit("/"), F.lit(2)).cast("long").cast("string"),
            ).alias("media_ref"),
        ),
    )
    media = F.try_element_at(F.filter(spans, lambda s: s.kind == F.lit("media")), F.lit(1))
    pt = _pt_decode(media.media_ref)
    media_spans = F.when(
        F.col("src") == "node",
        F.array(
            F.struct(
                F.lit("media").alias("kind"),
                F.lit("point").alias("text"),
                wkb_point_encode(pt.lon, pt.lat).alias("media_ref"),
            )
        ),
    ).otherwise(F.array().cast("array<struct<kind:string,text:string,media_ref:string>>"))

    rebuilt = F.concat(tag_spans, ref_spans, member_spans, media_spans)
    original = F.transform(
        spans,
        lambda s: F.struct(
            s.kind.alias("kind"), s.text.alias("text"), s.media_ref.alias("media_ref")
        ),
    )
    return docs_meta.select(
        "doc_id", original.alias("original"), rebuilt.alias("rebuilt")
    )
