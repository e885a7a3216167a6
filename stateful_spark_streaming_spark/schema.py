"""Tagged-schema layer: semantic roles on columns via StructField metadata.

The reference declares a JSON ``FeatureSchema`` whose attributes carry *tags*
(``TRACK_ID`` on the key column, ``START_TIME`` on the event-time column) and
resolves "the track-id value of this feature" by tag, not by name
(reference: StreamWithStates.scala:86-165, FeatureFunctions.scala:9-20).

Spark already has everything needed: ``StructField.metadata`` carries the
tags; geometry is a plain ``struct<x:double,y:double>`` column (no UDT); time
is ``TimestampType``.  This module is the thin helper layer — no engine
machinery, just builders and resolvers.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DataType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Semantic tags (reference: Tag.TRACK_ID / Tag.START_TIME in FeatureFunctions.scala).
TAG_TRACK_ID = "TRACK_ID"
TAG_START_TIME = "START_TIME"
TAG_GEOMETRY = "GEOMETRY"

TAGS_KEY = "tags"  # metadata key under which the tag list is stored
CRS_KEY = "wkid"  # spatial reference carried as column metadata

#: geometry is an ordinary struct column — printable as (x, y), null-able
#: (one reference branch deliberately nulls it:
#: StatefulStreamingWithMultipleStates.scala:112).
GEOMETRY_TYPE = StructType(
    [StructField("x", DoubleType(), True), StructField("y", DoubleType(), True)]
)


@dataclass
class FeatureSchemaBuilder:
    """Builds a StructType with tag metadata — the FeatureSchema equivalent."""

    fields: list[StructField] = field(default_factory=list)

    def attribute(
        self,
        name: str,
        dtype: DataType,
        nullable: bool = True,
        tags: tuple[str, ...] = (),
        **metadata,
    ) -> "FeatureSchemaBuilder":
        md = dict(metadata)
        if tags:
            md[TAGS_KEY] = list(tags)
        self.fields.append(StructField(name, dtype, nullable, metadata=md))
        return self

    def track_id(self, name: str, dtype: DataType = StringType()) -> "FeatureSchemaBuilder":
        return self.attribute(name, dtype, nullable=False, tags=(TAG_TRACK_ID,))

    def start_time(self, name: str) -> "FeatureSchemaBuilder":
        return self.attribute(name, TimestampType(), nullable=True, tags=(TAG_START_TIME,))

    def geometry(self, name: str = "geometry", wkid: int = 4326) -> "FeatureSchemaBuilder":
        # geometry must be nullable (see module docstring)
        return self.attribute(name, GEOMETRY_TYPE, nullable=True, tags=(TAG_GEOMETRY,), wkid=wkid)

    def build(self) -> StructType:
        return StructType(self.fields)


def tags_of(field_: StructField) -> list[str]:
    md = field_.metadata or {}
    return list(md.get(TAGS_KEY, []))


def tagged_columns(schema: StructType, tag: str) -> list[str]:
    """All column names carrying ``tag`` (reference: schema.taggedAttributes)."""
    return [f.name for f in schema.fields if tag in tags_of(f)]


def tagged_column(schema: StructType, tag: str) -> str:
    """The unique column carrying ``tag``; raises if absent/ambiguous.

    Mirrors FeatureFunctions.trackId's resolve-by-tag-then-index lookup
    (FeatureFunctions.scala:9-20) — but by name, since Spark rows are named.
    """
    cols = tagged_columns(schema, tag)
    if len(cols) != 1:
        raise ValueError(f"expected exactly one column tagged {tag!r}, found {cols}")
    return cols[0]


def track_id_column(df: DataFrame) -> str:
    return tagged_column(df.schema, TAG_TRACK_ID)


def start_time_column(df: DataFrame) -> str:
    return tagged_column(df.schema, TAG_START_TIME)


def geometry_col(x: str = "longitude", y: str = "latitude"):
    """(lon, lat) → struct<x,y> point, the reference's Point(x, y) construct
    (StreamWithStates.scala:171-173)."""
    return F.struct(F.col(x).alias("x"), F.col(y).alias("y"))


def flight_schema() -> StructType:
    """The reference's flight FeatureSchema (StreamWithStates.scala:86-165).

    altitude is declared Int32 there but parsed as Long
    (StreamWithStates.scala:185) — we standardize on LongType (SURVEY §1.2).
    """
    return (
        FeatureSchemaBuilder()
        .track_id("flightId")
        .start_time("flightTime")
        .attribute("longitude", DoubleType(), nullable=False)
        .attribute("latitude", DoubleType(), nullable=False)
        .attribute("origin", StringType())
        .attribute("destination", StringType())
        .attribute("aircraft", StringType())
        .attribute("altitude", LongType())
        .build()
    )


#: CSV-carried column order of the FlightSim fixture (FIXTURES.md §1).
FLIGHT_CSV_COLUMNS = [
    "flightId",
    "flightTime",
    "longitude",
    "latitude",
    "origin",
    "destination",
    "aircraft",
    "altitude",
]

#: Joda "MM/dd/yyyy hh:mm:ss a" → Spark pattern (StreamWithStates.scala:174).
FLIGHT_TIME_FORMAT = "M/d/yyyy hh:mm:ss a"
