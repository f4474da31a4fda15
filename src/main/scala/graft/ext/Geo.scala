package graft.ext

import graft.ops.{table, Q}
import org.apache.spark.sql.functions._

/** Geospatial operators over synthetic point data — the grid-cell
  * discipline every planet-scale spatial join uses (geohash / S2 / H3
  * all reduce to it): assign each point an integer cell, join on cell
  * ids (k-neighborhood for radius queries), and run the exact predicate
  * only inside the bounded candidate set — never a cross join of points
  * against regions.
  *
  * Determinism: everything is INTEGER microdegree arithmetic — cell
  * assignment is integer division, the radius predicate is an exact
  * `dlat² + dlon² ≤ r²` comparison in BIGINT (no haversine: libm trig is
  * not correctly rounded, so sin/cos would differ by ulps between the
  * JVM and DuckDB and flip boundary points; the squared-degree metric is
  * the documented operator semantics, exact on both engines). The grid
  * does not wrap at the dateline/poles — cells are a flat
  * [0,2e6]² µ° lattice, stated operator semantics restated
  * identically by the oracle.
  *
  * Coordinates are synthesized from fixture keys (the driver tables
  * carry no lat/lng): `lat_e6 = (key·7919) mod 2e6+1`, `lon_e6 = (key·104729) mod 2e6+1` —
  * a 2°×2° urban-area-sized band (dense enough for real cell
  * occupancies at fixture scale), identical in both engines' integer
  * arithmetic.
  */
object Geo {

  /** Cell edge: 0.1° (~11 km N-S) in microdegrees. The radius query uses
    * r = 0.05°, so a 3×3 cell neighborhood provably covers the disk
    * (r ≤ cell edge ⇒ any point within r of a center lies in the
    * center's cell or an 8-neighbor). */
  private val CellE6 = 100000L
  private val LonCells = 3601L // 360e6 / 1e5 + 1

  private def latE6(key: org.apache.spark.sql.Column) =
    (key * 7919L) % 2000001L
  private def lonE6(key: org.apache.spark.sql.Column) =
    (key * 104729L) % 2000001L

  private def cellId(lat: org.apache.spark.sql.Column,
      lon: org.apache.spark.sql.Column) =
    (lat / CellE6).cast("long") * LonCells + (lon / CellE6).cast("long")

  /** ext110 — grid-cell assignment + density: every point mapped to its
    * integer cell (one map-side pass — the spatial analogue of a date
    * bucket), then the top-occupancy cells. At 100 TB this is the
    * partitioning/clustering key a spatial table would be written by
    * (cf. the z-order rewrite, q151 — cells ARE the 2-D layout). */
  val geoCells: Q = (s, d) => {
    val pts = table(s, d, "customer").select(col("c_custkey").as("key"))
      .select(col("key"), latE6(col("key")).as("lat_e6"),
        lonE6(col("key")).as("lon_e6"))
    pts.select(col("key"), cellId(col("lat_e6"), col("lon_e6")).as("cell"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_points"), sum(col("key")).as("key_sum"))
      .filter(col("n_points") >= 2)
      .orderBy(col("n_points").desc, col("cell"))
  }

  /** ext111 — radius join (points within r of each center) via the
    * 3×3 cell neighborhood: centers explode to their 9 candidate cells
    * (a 9-row-per-center broadcast), the join is KEYED on the cell id,
    * and the exact integer distance predicate runs only inside the
    * bounded candidate set. The shape that replaces the
    * BroadcastNestedLoop a naive `dist(p, c) < r` theta-join would plan
    * — candidates per center are bounded by 9 cells' occupancy, not the
    * corpus. */
  val geoRadiusJoin: Q = (s, d) => {
    val r = 50000L // 0.05° in µ°
    val pts = table(s, d, "customer").select(col("c_custkey").as("key"))
      .select(col("key"), latE6(col("key")).as("lat_e6"),
        lonE6(col("key")).as("lon_e6"))
      .withColumn("cell", cellId(col("lat_e6"), col("lon_e6")))
    val centers = table(s, d, "supplier")
      .filter(col("s_suppkey") < 8).select(col("s_suppkey").as("cid"))
      .select(col("cid"), (latE6(col("cid") + 1000L)).as("c_lat"),
        (lonE6(col("cid") + 1000L)).as("c_lon"))
    val probe = centers
      .withColumn("dl", explode(array((-1L to 1L).map(lit): _*)))
      .withColumn("dn", explode(array((-1L to 1L).map(lit): _*)))
      .select(col("cid"), col("c_lat"), col("c_lon"),
        (cellId(col("c_lat"), col("c_lon")) + col("dl") * LonCells + col("dn"))
          .as("cell"))
    val d2 = (col("lat_e6") - col("c_lat")) * (col("lat_e6") - col("c_lat")) +
      (col("lon_e6") - col("c_lon")) * (col("lon_e6") - col("c_lon"))
    pts.join(broadcast(probe), Seq("cell"))
      .filter(d2 <= lit(r * r))
      .groupBy("cid")
      .agg(count(lit(1)).as("n_within"), sum(col("key")).as("key_sum"))
      .orderBy("cid")
  }

  val queries: Map[String, Q] = Map(
    "ext110_geo_cells" -> geoCells,
    "ext111_geo_radius_join" -> geoRadiusJoin)

  val oracleSql: Map[String, String] = Map(
    "ext110_geo_cells" ->
      """WITH pts AS (
        |  SELECT c_custkey AS key,
        |    (c_custkey * 7919) % 2000001 AS lat_e6,
        |    (c_custkey * 104729) % 2000001 AS lon_e6
        |  FROM customer)
        |SELECT (lat_e6 // 100000) * 3601 + (lon_e6 // 100000) AS cell,
        |  COUNT(*) AS n_points, CAST(SUM(key) AS BIGINT) AS key_sum
        |FROM pts GROUP BY 1 HAVING COUNT(*) >= 2
        |ORDER BY n_points DESC, cell""".stripMargin,
    // the oracle states the radius predicate DIRECTLY (no cells) — the
    // hash match proves the 3x3 neighborhood loses no candidate
    "ext111_geo_radius_join" ->
      """WITH pts AS (
        |  SELECT c_custkey AS key,
        |    (c_custkey * 7919) % 2000001 AS lat_e6,
        |    (c_custkey * 104729) % 2000001 AS lon_e6
        |  FROM customer),
        |ctr AS (
        |  SELECT s_suppkey AS cid,
        |    ((s_suppkey + 1000) * 7919) % 2000001 AS c_lat,
        |    ((s_suppkey + 1000) * 104729) % 2000001 AS c_lon
        |  FROM supplier WHERE s_suppkey < 8)
        |SELECT cid, COUNT(*) AS n_within, CAST(SUM(key) AS BIGINT) AS key_sum
        |FROM pts, ctr
        |WHERE (lat_e6 - c_lat) * (lat_e6 - c_lat) +
        |      (lon_e6 - c_lon) * (lon_e6 - c_lon) <= 2500000000
        |GROUP BY 1 ORDER BY cid""".stripMargin)
}
