from __future__ import annotations

import pytest
from pyspark.sql import types as T

from dbtwiz_spark.types import (
    bq_to_spark,
    flatten_fields,
    spark_to_bq,
    with_descriptions,
)


def test_bq_to_spark_core_map():
    assert bq_to_spark("INT64") == T.LongType()
    assert bq_to_spark("FLOAT64") == T.DoubleType()
    assert bq_to_spark("NUMERIC") == T.DecimalType(38, 9)
    assert bq_to_spark("BIGNUMERIC") == T.DecimalType(38, 18)  # documented lossy
    assert bq_to_spark("DATETIME") == T.TimestampNTZType()
    assert bq_to_spark("TIMESTAMP") == T.TimestampType()
    assert bq_to_spark("STRING", "REPEATED") == T.ArrayType(T.StringType())
    with pytest.raises(ValueError):
        bq_to_spark("FROBNICATE")


def test_spark_to_bq_round_trip():
    assert spark_to_bq(T.LongType()) == "INT64"
    assert spark_to_bq(T.ArrayType(T.StringType())) == "array<string>"
    assert spark_to_bq(T.StructType([T.StructField("a", T.LongType())])).startswith(
        "STRUCT<"
    )


def test_flatten_and_describe_nested():
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField(
                "geo",
                T.StructType(
                    [
                        T.StructField("nation", T.StringType()),
                        T.StructField("region", T.StringType()),
                    ]
                ),
            ),
        ]
    )
    paths = [p for p, _ in flatten_fields(schema)]
    assert paths == ["id", "geo", "geo.nation", "geo.region"]
    out = with_descriptions(schema, {"geo.nation": "ISO name", "id": "pk"})
    assert out["id"].metadata["comment"] == "pk"
    geo = out["geo"].dataType
    assert geo["nation"].metadata["comment"] == "ISO name"
    assert geo["region"].metadata == {}
