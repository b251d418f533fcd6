"""GeoSpatial column support, preview-gated (reference
DeltaGeoSpatial.scala; TableFeature.scala:687 GeoSpatialTableFeature —
auto-enabled by metadata, gated behind the `geo.preview.enabled` conf;
shims/GeoTypesShim.scala for the Spark 4.1 GeometryType/GeographyType
catalyst types, SPARK-53760).

Tables may carry GEOMETRY / GEOGRAPHY columns. Creating or evolving to
a schema that contains one auto-adds the `geospatial` reader+writer
table feature; both writes and reads require
``delta_spark.geo.preview.enabled=true`` in the session conf (the
reference's `delta.geo.preview.enabled`), so pre-preview clients fail
closed on both sides.

Physical encoding: geo values are stored in parquet as their WKB bytes
(plain BINARY) and reconstructed at the read seam with
st_geomfromwkb/st_geogfromwkb + st_setsrid. The reference writes the
Parquet GEOMETRY/GEOGRAPHY logical type through its own write support
(DeltaParquetWriteSupport.scala); vanilla Spark's parquet writer has no
geo support, and WKB-in-BINARY is byte-identical payload-wise — the
logical geo type (with its SRID) round-trips through the table schema,
exactly like the column-mapping physical/logical seam. Documented as a
deviation in ARCHITECTURE.md.

Scope (matching Spark 4.1's own support envelope): SRIDs {0, 4326} for
GEOMETRY, {4326} for GEOGRAPHY; geo columns at the TOP level of the
schema (nested geo is rejected at commit); geo partition columns and
geo streaming sources/sinks are rejected.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F, types as T

GEO_FEATURE = "geospatial"
# reference: DeltaSQLConf.scala:3382 buildConf("geo.preview.enabled")
GEO_PREVIEW_CONF = "delta_spark.geo.preview.enabled"
# Spark's own master switch for geo types / ST_ expressions; our read
# and write seams need the ST functions, so it is enabled alongside.
_SPARK_GEO_CONF = "spark.sql.geospatial.enabled"

try:  # Spark 4.1+ (SPARK-53760)
    from pyspark.sql.types import GeographyType, GeometryType

    _GEO_TYPES: tuple = (GeometryType, GeographyType)
except ImportError:  # pragma: no cover - older pyspark
    _GEO_TYPES = ()


class GeoNotSupportedException(Exception):
    """Raised when geo columns are used without the preview conf, or in
    an unsupported position (reference DeltaErrors.scala
    geoSpatialNotSupportedException)."""


def is_geo_type(dt: T.DataType) -> bool:
    return bool(_GEO_TYPES) and isinstance(dt, _GEO_TYPES)


def _contains_geo(dt: T.DataType) -> bool:
    if is_geo_type(dt):
        return True
    if isinstance(dt, T.StructType):
        return any(_contains_geo(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return _contains_geo(dt.elementType)
    if isinstance(dt, T.MapType):
        return _contains_geo(dt.keyType) or _contains_geo(dt.valueType)
    return False


def contains_geo_columns(schema: T.StructType) -> bool:
    """DeltaGeoSpatial.containsGeoColumns: any geo type anywhere in the
    schema tree."""
    return _contains_geo(schema)


def schema_string_may_have_geo(schema_string: str) -> bool:
    """Cheap pre-parse test on a metadata schemaString (geo types
    serialize as `"geometry(SRID:0)"` / `"geography(OGC:CRS84, ...)"`)."""
    s = schema_string or ""
    return '"geometry(' in s or '"geography(' in s


def top_level_geo_fields(schema: T.StructType) -> list[T.StructField]:
    return [f for f in schema.fields if is_geo_type(f.dataType)]


def has_nested_geo(schema: T.StructType) -> bool:
    return any(_contains_geo(f.dataType) and not is_geo_type(f.dataType)
               for f in schema.fields)


def _preview_enabled(spark) -> bool:
    try:
        return str(spark.conf.get(GEO_PREVIEW_CONF, "false")).lower() == "true"
    except Exception:
        return False


def _enable_spark_geo(spark) -> None:
    # ST_ functions are themselves feature-flagged in Spark; the seam
    # cannot run without them. Only reached once the table-level
    # preview conf has been checked.
    spark.conf.set(_SPARK_GEO_CONF, "true")


def _srid(dt) -> int:
    return int(getattr(dt, "srid", 0))


def validate_schema(schema: T.StructType,
                    partition_columns: Optional[list] = None,
                    spark=None) -> None:
    """Commit-time validation (DeltaGeoSpatial.validateCommitActions):
    conf gate + the support envelope. No-op for geo-free schemas."""
    if not contains_geo_columns(schema):
        return
    # fail CLOSED when no session is resolvable (getActiveSession is
    # thread-local; a commit from a worker thread must not slip past
    # the preview gate)
    if spark is None or not _preview_enabled(spark):
        raise GeoNotSupportedException(
            "the table schema contains GEOMETRY/GEOGRAPHY columns but "
            f"geospatial support is in preview: set {GEO_PREVIEW_CONF}=true "
            "to enable it (reference delta.geo.preview.enabled)")
    if has_nested_geo(schema):
        raise GeoNotSupportedException(
            "GEOMETRY/GEOGRAPHY columns nested inside struct/array/map are "
            "not supported by this engine (top-level geo columns only)")
    part = set(partition_columns or [])
    for f in schema.fields:
        if not is_geo_type(f.dataType):
            continue
        if f.name in part:
            raise GeoNotSupportedException(
                f"cannot partition table by geo column {f.name!r}")
        srid = _srid(f.dataType)
        ok = {4326} if f.dataType.typeName() == "geography" else {0, 4326}
        if srid not in ok:
            raise GeoNotSupportedException(
                f"unsupported SRID {srid} for column {f.name!r} "
                f"(supported: {sorted(ok)})")


def assert_readable(spark, schema: T.StructType) -> None:
    """Read-side conf gate (DeltaGeoSpatial.assertTableReadable)."""
    if contains_geo_columns(schema) and not _preview_enabled(spark):
        raise GeoNotSupportedException(
            "this table contains GEOMETRY/GEOGRAPHY columns; set "
            f"{GEO_PREVIEW_CONF}=true to read it")


def wkb_out(df: DataFrame) -> DataFrame:
    """Writer seam, logical → physical: project geo columns to their
    WKB bytes under the same names. No-op (same df) when geo-free."""
    geo = top_level_geo_fields(df.schema)
    if not geo:
        return df
    _enable_spark_geo(df.sparkSession)
    names = {f.name for f in geo}
    return df.select(*[
        F.expr(f"st_asbinary(`{f.name}`)").alias(f.name) if f.name in names
        else F.col(f"`{f.name}`")
        for f in df.schema.fields])


def binary_read_schema(schema: T.StructType) -> T.StructType:
    """The parquet-side schema: geo fields read as BINARY (WKB)."""
    if not top_level_geo_fields(schema):
        return schema
    return T.StructType([
        T.StructField(f.name, T.BinaryType(), f.nullable, f.metadata)
        if is_geo_type(f.dataType) else f
        for f in schema.fields])


def restore(df: DataFrame, logical_schema: T.StructType) -> DataFrame:
    """Reader seam, physical → logical: rebuild geo values from WKB
    with the SRID recorded in the table schema. No-op when geo-free."""
    geo = {f.name: f.dataType for f in top_level_geo_fields(logical_schema)}
    if not geo:
        return df
    _enable_spark_geo(df.sparkSession)
    cols = []
    for f in df.schema.fields:
        dt = geo.get(f.name)
        if dt is None:
            cols.append(F.col(f"`{f.name}`"))
            continue
        if dt.typeName() == "geography":
            e = f"st_geogfromwkb(`{f.name}`)"
        else:
            srid = _srid(dt)
            e = f"st_geomfromwkb(`{f.name}`)"
            if srid:
                e = f"st_setsrid({e}, {srid})"
        cols.append(F.expr(e).alias(f.name))
    return df.select(*cols)
