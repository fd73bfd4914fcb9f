"""GeoJSON writer/reader (functions/geojson.py): interop via python's real
json parser, exact decimal text, text/Column parity, roundtrip exactness."""

import json

from pyspark.sql import functions as F

from osmgraft.functions.geojson import (
    dec7_col,
    parse_linestring_features,
    sql_dec7,
    sql_linestring_feature,
    sql_position,
)

CASES = [
    0,
    1,
    -1,
    50,
    -50,
    10**7,
    -(10**7),
    899_999_999,
    -900_000_000,
    1_799_999_999,
    -1_800_000_000,
    404_052_891,
]


def test_dec7_text_and_column_parity(spark):
    df = spark.createDataFrame([(v,) for v in CASES], "x long")
    rows = df.select(
        "x", F.expr(sql_dec7("x")).alias("t"), dec7_col(F.col("x")).alias("c")
    ).collect()
    for r in rows:
        assert r["t"] == r["c"]
        # exact decimal: parse back with Python and compare integers
        assert round(float(r["t"]) * 1e7) == r["x"]
        # canonical form: sign, no leading zeros on int part, 7-digit fraction
        ip, fr = r["t"].lstrip("-").split(".")
        assert len(fr) == 7 and ip == str(abs(r["x"]) // 10**7)


def test_feature_is_real_json_and_roundtrips(spark):
    verts = [(-900_000_000, -1_800_000_000), (0, 0), (404_052_891, -739_797_031)]
    df = spark.createDataFrame(
        [(7, i, la, lo) for i, (la, lo) in enumerate(verts)],
        "ent long, seq long, lat7 long, lon7 long",
    )
    pos = df.select("ent", "seq", F.expr(sql_position("lon7", "lat7")).alias("s"))
    feat_df = (
        pos.groupBy("ent")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("seq").alias("seq"), F.col("s").alias("s"))
                        )
                    ),
                    lambda e: e["s"],
                ),
                ",",
            ).alias("coords")
        )
        .select(F.expr(sql_linestring_feature("ent", "coords")).alias("feature"))
    )
    (feature,) = feat_df.collect()[0]
    # 1. a real JSON parser accepts it and sees the RFC 7946 structure
    obj = json.loads(feature)
    assert obj["type"] == "Feature"
    assert obj["properties"] == {"ent": 7}
    assert obj["geometry"]["type"] == "LineString"
    coords = obj["geometry"]["coordinates"]
    assert [[round(c[1] * 1e7), round(c[0] * 1e7)] for c in coords] == [
        [la, lo] for la, lo in verts
    ]
    # 2. the Spark-side reader recovers the exact fixed-point integers
    parsed = parse_linestring_features(feat_df).orderBy("pos").collect()
    assert [(r["lat7"], r["lon7"]) for r in parsed] == verts
    assert [r["ent"] for r in parsed] == [7, 7, 7]


def test_malformed_feature_yields_no_rows(spark):
    df = spark.createDataFrame(
        [("{not json",), ('{"type":"Feature"}',)], "feature string"
    )
    out = parse_linestring_features(df).collect()
    assert out == []
