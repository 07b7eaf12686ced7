package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial kernels for the zone join.
  *
  * The reference stores zones as `GEOGRAPHY(POLYGON, 4326)` and labels every
  * telemetry point by `ST_Intersects(zone_polygon, position)`
  * (reference: `STEP 4 - Feature Engineering/04_worker_script.sql:12-16`;
  * shapely duplicate `STEP 3 - EDA Analysis/run_advanced_eda.py:55-69`).
  * Every consumer immediately deconstructs the geography to plain lon/lat
  * (`database_pipeline.py:101-103`), so here zones are plain vertex arrays
  * and the join predicate is a ray-casting point-in-polygon test.
  *
  * Scale design: the zone table is tiny (7 polygons in the reference), so the
  * join is a broadcast nested-loop join — zero shuffle of the fact table at
  * any scale. The predicate is a deterministic pure function, safe for
  * whole-stage codegen as a Scala UDF; at 100 TB the per-row cost is a few
  * dozen flops against a broadcast array.
  */
object Geo {

  /** Even-odd (ray casting) point-in-polygon. Vertices are (lon, lat) pairs
    * of a closed ring (first vertex does NOT need repeating). Points exactly
    * on an edge follow the half-open convention of the crossing test.
    */
  def pointInPolygon(lon: Double, lat: Double,
      verts: Seq[(Double, Double)]): Boolean = {
    var inside = false
    var j = verts.length - 1
    var i = 0
    while (i < verts.length) {
      val (xi, yi) = verts(i)
      val (xj, yj) = verts(j)
      if ((yi > lat) != (yj > lat) &&
          lon < (xj - xi) * (lat - yi) / (yj - yi) + xi)
        inside = !inside
      j = i
      i += 1
    }
    inside
  }

  /** Column form: `pip(lon, lat, vertices)` where vertices is
    * `array<struct<lon:double,lat:double>>` (typically a literal or a
    * broadcast-joined zone column).
    */
  val pipUdf = udf { (lon: Double, lat: Double,
      verts: Seq[org.apache.spark.sql.Row]) =>
    pointInPolygon(lon, lat, verts.map(r => (r.getDouble(0), r.getDouble(1))))
  }

  def pointInPolygonCol(lon: Column, lat: Column, verts: Column): Column =
    pipUdf(lon, lat, verts)

  /** Parse the raw telemetry position text `{lat, lon, alt}` into a
    * `struct(lon, lat, alt)`, null on malformed input — the semantics of the
    * reference's (undefined-in-repo) `convert_position_array`
    * (call site `02_raw_telemetry_transform.py:278`; raw shape
    * `STEP 1 - Ingest Raw Telemetry/README.md:30`; output renders as
    * `POINT Z (lon lat alt)` in the exported parquet).
    *
    * Pure `functions._` composition (regex extract + cast) so it stays
    * inside codegen; no UDF.
    */
  def parsePosition(raw: Column): Column = {
    val num = "([+-]?\\d+(?:\\.\\d+)?(?:[eE][+-]?\\d+)?)"
    val pat = s"^\\s*\\{\\s*$num\\s*,\\s*$num\\s*,\\s*$num\\s*\\}\\s*$$"
    val lat = regexp_extract(raw, pat, 1)
    val lon = regexp_extract(raw, pat, 2)
    val alt = regexp_extract(raw, pat, 3)
    val ok = raw.isNotNull && raw.rlike(pat)
    when(ok, struct(
      lon.cast("double").as("lon"),
      lat.cast("double").as("lat"),
      alt.cast("double").as("alt")))
      .otherwise(lit(null))
  }

  /** Render a position struct as PostGIS-style WKT `POINT Z (lon lat alt)`
    * (`05_export_features_to_parquet.py:199` / `ST_AsText`). */
  def toWktPointZ(pos: Column): Column =
    when(pos.isNotNull, concat(lit("POINT Z ("),
      pos.getField("lon").cast("string"), lit(" "),
      pos.getField("lat").cast("string"), lit(" "),
      pos.getField("alt").cast("string"), lit(")")))
      .otherwise(lit(null))
}
