"""BigQuery ↔ Spark type mapping (SURVEY §1.2).

The reference reads schemas from the warehouse and writes them back into
model YAML (dbtwiz/model/validate.py:97-108, dbtwiz/integrations/
bigquery.py:570-642, including recursive RECORD flattening at :619-624).
The engine keeps the same vocabulary so declared model schemas round-trip.

Documented lossy mappings:
- BIGNUMERIC (76 digits) → DecimalType(38,18): Spark's max precision is 38.
- TIME → StringType (no time-of-day type in Spark).
- GEOGRAPHY → StringType (WKT), out of parity scope.
"""

from __future__ import annotations

from pyspark.sql import types as T

_BQ_TO_SPARK: dict[str, T.DataType] = {
    "INT64": T.LongType(),
    "INTEGER": T.LongType(),
    "INT": T.LongType(),
    "SMALLINT": T.LongType(),
    "BIGINT": T.LongType(),
    "TINYINT": T.LongType(),
    "BYTEINT": T.LongType(),
    "FLOAT64": T.DoubleType(),
    "FLOAT": T.DoubleType(),
    "NUMERIC": T.DecimalType(38, 9),
    "DECIMAL": T.DecimalType(38, 9),
    "BIGNUMERIC": T.DecimalType(38, 18),  # lossy: BQ allows 76 digits
    "BIGDECIMAL": T.DecimalType(38, 18),
    "STRING": T.StringType(),
    "BYTES": T.BinaryType(),
    "BOOL": T.BooleanType(),
    "BOOLEAN": T.BooleanType(),
    "DATE": T.DateType(),
    "DATETIME": T.TimestampNTZType(),
    "TIME": T.StringType(),  # lossy: no Spark time-of-day type
    "TIMESTAMP": T.TimestampType(),
    "JSON": T.StringType(),
    "GEOGRAPHY": T.StringType(),  # WKT; out of parity scope
}

_SPARK_TO_BQ: dict[type, str] = {
    T.LongType: "INT64",
    T.IntegerType: "INT64",
    T.ShortType: "INT64",
    T.ByteType: "INT64",
    T.DoubleType: "FLOAT64",
    T.FloatType: "FLOAT64",
    T.StringType: "STRING",
    T.BinaryType: "BYTES",
    T.BooleanType: "BOOL",
    T.DateType: "DATE",
    T.TimestampNTZType: "DATETIME",
    T.TimestampType: "TIMESTAMP",
}


def bq_to_spark(bq_type: str, mode: str = "NULLABLE") -> T.DataType:
    """Map a BigQuery type name (optionally REPEATED mode) to a Spark type."""
    base = _BQ_TO_SPARK.get(bq_type.upper())
    if base is None:
        raise ValueError(f"unmapped BigQuery type: {bq_type}")
    if mode.upper() == "REPEATED":
        return T.ArrayType(base)
    return base


def spark_to_bq(dt: T.DataType) -> str:
    """Map a Spark type to its BigQuery name (dbtwiz bigquery.py:627-629
    renders arrays as ``array<type>``)."""
    if isinstance(dt, T.ArrayType):
        return f"array<{spark_to_bq(dt.elementType).lower()}>"
    if isinstance(dt, T.MapType):
        return f"map<{spark_to_bq(dt.keyType).lower()},{spark_to_bq(dt.valueType).lower()}>"
    if isinstance(dt, T.StructType):
        inner = ", ".join(f"{f.name} {spark_to_bq(f.dataType).lower()}" for f in dt.fields)
        return f"STRUCT<{inner}>"
    if isinstance(dt, T.DecimalType):
        return "BIGNUMERIC" if dt.scale > 9 else "NUMERIC"
    name = _SPARK_TO_BQ.get(type(dt))
    if name is None:
        raise ValueError(f"unmapped Spark type: {dt}")
    return name


_SPARK_TO_SQL: dict[type, str] = {
    T.LongType: "BIGINT",
    T.IntegerType: "INTEGER",
    T.ShortType: "SMALLINT",
    T.ByteType: "TINYINT",
    T.DoubleType: "DOUBLE",
    T.FloatType: "FLOAT",
    T.StringType: "VARCHAR",
    T.BinaryType: "BLOB",
    T.BooleanType: "BOOLEAN",
    T.DateType: "DATE",
    T.TimestampNTZType: "TIMESTAMP",
    T.TimestampType: "TIMESTAMP",
}


def spark_type_to_sql(dt: T.DataType) -> str:
    """Render a Spark type in ANSI/DuckDB spelling (DESCRIBE vocabulary) —
    the cross-engine face of the §1.2 type map, used when the engine prints
    an introspected source schema."""
    if isinstance(dt, T.ArrayType):
        return f"{spark_type_to_sql(dt.elementType)}[]"
    if isinstance(dt, T.MapType):
        return (
            f"MAP({spark_type_to_sql(dt.keyType)}, "
            f"{spark_type_to_sql(dt.valueType)})"
        )
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    if isinstance(dt, T.StructType):
        inner = ", ".join(
            f"{f.name} {spark_type_to_sql(f.dataType)}" for f in dt.fields
        )
        return f"STRUCT({inner})"
    name = _SPARK_TO_SQL.get(type(dt))
    if name is None:
        raise ValueError(f"unmapped Spark type: {dt}")
    return name


def flatten_fields(schema: T.StructType, prefix: str = "") -> list[tuple[str, T.DataType]]:
    """Dotted-path flattening of nested structs — the reference's
    description-sync walk (dbtwiz/admin/descriptions.py:43-53)."""
    out: list[tuple[str, T.DataType]] = []
    for f in schema.fields:
        path = f"{prefix}{f.name}"
        out.append((path, f.dataType))
        if isinstance(f.dataType, T.StructType):
            out.extend(flatten_fields(f.dataType, prefix=f"{path}."))
    return out


def with_descriptions(schema: T.StructType, descriptions: dict[str, str]) -> T.StructType:
    """Rebuild a schema attaching comments by dotted path, preserving fields
    without descriptions (dbtwiz/admin/descriptions.py:56-82 semantics)."""

    def rebuild(s: T.StructType, prefix: str) -> T.StructType:
        fields = []
        for f in s.fields:
            path = f"{prefix}{f.name}"
            dt = f.dataType
            if isinstance(dt, T.StructType):
                dt = rebuild(dt, f"{path}.")
            meta = dict(f.metadata or {})
            if path in descriptions:
                meta["comment"] = descriptions[path]
            fields.append(T.StructField(f.name, dt, f.nullable, meta))
        return T.StructType(fields)

    return rebuild(schema, "")
