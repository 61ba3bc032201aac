"""Stream schema model: physical/metadata/computed fields, watermarks,
primary-key constraints — the Spark-native analogue of the reference's
``decodable/client/schema.py:32-149`` (SchemaV2).

Adds what the reference delegates to Flink:

- ``to_struct_type()`` — materialize the physical fields as a Spark
  ``StructType`` via the :mod:`dbt_decodable_spark.ftypes` converter,
- ``apply_computed_fields(df)`` — computed fields become
  ``withColumn(name, F.expr(expression))`` generated columns
  (``schema.py:86-94`` semantics),
- ``watermark_delay()`` — parse the canonical Flink watermark expression
  `` `col` - INTERVAL '0.001' SECOND `` into the ``(column, delay_string)``
  pair Spark's ``withWatermark`` needs (SURVEY §7.2: anything outside that
  shape is rejected loudly).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field
from typing import Any

from pyspark.sql import Column, DataFrame, functions as F, types as T

from dbt_decodable_spark import ftypes


class SchemaError(ValueError):
    pass


@dataclass(frozen=True)
class SchemaField:
    """One stream field. ``kind`` ∈ {physical, metadata, computed}
    (reference factory: ``decodable/client/schema.py:97-106``)."""

    name: str
    kind: str = "physical"
    type: str | None = None  # Flink type string (physical / metadata)
    key: str | None = None  # metadata key (metadata kind only)
    expression: str | None = None  # SQL expression (computed kind only)

    def __post_init__(self) -> None:
        if self.kind == "physical":
            if not self.type:
                raise SchemaError(f"physical field {self.name!r} needs a type")
        elif self.kind == "metadata":
            if not self.type or self.key is None:
                raise SchemaError(f"metadata field {self.name!r} needs type and key")
        elif self.kind == "computed":
            if not self.expression:
                raise SchemaError(f"computed field {self.name!r} needs an expression")
        else:
            raise SchemaError(f"unknown field kind {self.kind!r}")

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> SchemaField:
        kind = d.get("kind", "physical")
        return cls(
            name=d["name"],
            kind=kind,
            type=d.get("type"),
            key=d.get("key"),
            expression=d.get("expression"),
        )

    def to_dict(self) -> dict[str, Any]:
        d: dict[str, Any] = {"kind": self.kind, "name": self.name}
        if self.type is not None:
            d["type"] = self.type
        if self.key is not None:
            d["key"] = self.key
        if self.expression is not None:
            d["expression"] = self.expression
        return d

    def spark_field(self) -> T.StructField:
        if self.type is None:
            raise SchemaError(f"field {self.name!r} ({self.kind}) has no declared type")
        parsed = ftypes.parse(self.type)
        return T.StructField(self.name, parsed.to_spark(), nullable=parsed.nullable)


@dataclass(frozen=True)
class Watermark:
    """Named field + lateness expression
    (``decodable/client/schema.py:114-117``)."""

    name: str
    expression: str

    _RE = re.compile(
        r"^\s*`?(?P<col>[A-Za-z_][A-Za-z0-9_]*)`?\s*-\s*"
        r"INTERVAL\s+'(?P<amount>[0-9.]+)'\s+(?P<unit>SECOND|MINUTE|HOUR|DAY)S?\s*$",
        re.IGNORECASE,
    )

    def delay(self) -> tuple[str, str]:
        """Parse `` `col` - INTERVAL 'x' UNIT `` → (col, Spark delay string).

        Fractional SECOND amounts become milliseconds (Spark delay strings
        take integer amounts). Any other expression shape is rejected.
        """
        m = self._RE.match(self.expression)
        if not m:
            raise SchemaError(
                f"unsupported watermark expression {self.expression!r}; "
                "expected `col` - INTERVAL '<amount>' <UNIT>"
            )
        col, amount, unit = m.group("col"), m.group("amount"), m.group("unit").lower()
        if "." in amount:
            if unit != "second":
                raise SchemaError(f"fractional interval only supported for SECOND: {amount}")
            try:
                millis = round(float(amount) * 1000)
            except ValueError as e:  # '1.2.3' etc. — keep the error typed
                raise SchemaError(
                    f"malformed watermark interval amount {amount!r}"
                ) from e
            return col, f"{millis} milliseconds"
        return col, f"{int(amount)} {unit}s"

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> Watermark:
        return cls(name=d["name"], expression=d["expression"])

    def to_dict(self) -> dict[str, Any]:
        return {"name": self.name, "expression": self.expression}


@dataclass(frozen=True)
class StreamSchema:
    """fields + watermarks + constraints (``schema.py:120-143``)."""

    fields: tuple[SchemaField, ...] = ()
    watermarks: tuple[Watermark, ...] = ()
    primary_key: tuple[str, ...] = ()

    # -- construction -------------------------------------------------------

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> StreamSchema:
        """JSON round-trip form, mirroring SchemaV2 serde
        (``test_schema.py:85-133``)."""
        fields = tuple(SchemaField.from_dict(f) for f in d.get("fields", []))
        watermarks = tuple(Watermark.from_dict(w) for w in d.get("watermarks", []))
        pk = tuple(d.get("constraints", {}).get("primary_key", []) or [])
        return cls(fields=fields, watermarks=watermarks, primary_key=pk)

    def to_dict(self) -> dict[str, Any]:
        return {
            "fields": [f.to_dict() for f in self.fields],
            "watermarks": [w.to_dict() for w in self.watermarks],
            "constraints": {"primary_key": list(self.primary_key)},
        }

    @classmethod
    def from_spark(cls, st: T.StructType, primary_key: list[str] | None = None) -> StreamSchema:
        fields = tuple(
            SchemaField(name=f.name, kind="physical", type=ftypes.from_spark(f.dataType, f.nullable))
            for f in st.fields
        )
        return cls(fields=fields, primary_key=tuple(primary_key or ()))

    # -- Spark materialization ----------------------------------------------

    def physical_fields(self) -> list[SchemaField]:
        return [f for f in self.fields if f.kind == "physical"]

    def to_struct_type(self, include_metadata: bool = False) -> T.StructType:
        kinds = {"physical", "metadata"} if include_metadata else {"physical"}
        return T.StructType([f.spark_field() for f in self.fields if f.kind in kinds])

    def computed_columns(self) -> dict[str, Column]:
        return {
            f.name: F.expr(f.expression)
            for f in self.fields
            if f.kind == "computed" and f.expression
        }

    def apply_computed_fields(self, df: DataFrame) -> DataFrame:
        for name, col in self.computed_columns().items():
            df = df.withColumn(name, col)
        return df

    def apply_watermarks(self, df: DataFrame) -> DataFrame:
        """Streaming DataFrames only; Spark supports a single watermark."""
        for wm in self.watermarks[:1]:
            col, delay = wm.delay()
            df = df.withWatermark(col, delay)
        return df
