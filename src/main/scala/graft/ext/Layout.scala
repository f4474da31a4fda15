package graft.ext

import graft.ops.{table, Q}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators: z-order (Morton) clustering for multi-column
  * data skipping.
  *
  * Why this matters at 100 TB: zone-map/min-max file skipping (parquet
  * row groups, our catalog's segment zone-maps, Iceberg/Delta file
  * stats) only prunes on columns the physical row order correlates
  * with. Sorting by `x` makes `x` ranges narrow per file but leaves `y`
  * ranges full-width — a predicate on `y` scans everything. Interleaving
  * the bits of `x` and `y` into one Morton key and sorting by THAT gives
  * every file a bounding BOX: with 16 buckets over an 8+8-bit key each
  * bucket spans a 64×64 cell instead of a 16-row-tall full-width slab,
  * so predicates on EITHER column (or both) skip most files. This is
  * Delta's `OPTIMIZE ZORDER BY` / the classic UB-tree layout.
  *
  * The bit-spread uses the standard mask-and-shift magic numbers — plain
  * integer arithmetic, so the DuckDB oracle states the identical
  * computation and the whole pipeline stays inside whole-stage codegen
  * (no UDF). `SourcesSpec` additionally writes the z-ordered rows into a
  * catalog table and asserts the segment zone-maps now prune a
  * two-column box predicate to a handful of files — the end-to-end
  * skipping win, not just the key math.
  */
object Layout {

  /** Spread the low 8 bits of `c` so bit i lands at position 2i
    * (0b00001111 → 0b01010101 pattern): the classic binary-magic-numbers
    * interleave, 3 mask-and-shift rounds for 8-bit inputs. */
  private def spread8(c: Column): Column = {
    val s4 = (c.bitwiseOR(shiftleft(c, 4))).bitwiseAND(lit(0x0F0F))
    val s2 = (s4.bitwiseOR(shiftleft(s4, 2))).bitwiseAND(lit(0x3333))
    (s2.bitwiseOR(shiftleft(s2, 1))).bitwiseAND(lit(0x5555))
  }

  /** 16-bit Morton key of two 8-bit coordinates (x even bits, y odd). */
  private[graft] def morton8(x: Column, y: Column): Column =
    spread8(x).bitwiseOR(shiftleft(spread8(y), 1))

  /** Events projected to an 8-bit × 8-bit grid with their Morton key —
    * the clustering key a layout rewrite would sort by. */
  private[graft] def zEvents(ev: DataFrame): DataFrame = {
    val x = col("user_id") % 256
    val y = (col("event_id") % 997) % 256
    ev.select(col("event_id"), x.as("x"), y.as("y"),
      morton8(x, y).as("zkey"))
  }

  /** Per-z-bucket bounding boxes over events: 16 buckets of the 16-bit
    * key; each bucket's (x, y) ranges stay ~64 wide — the quantitative
    * claim behind z-order skipping, stated bucket by bucket so the
    * oracle hash-checks the whole layout, not an anecdote. */
  val zorderLayout: Q = (s, d) => {
    zEvents(table(s, d, "events"))
      .groupBy((col("zkey") / 4096).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
      .orderBy("bucket")
  }

  val queries: Map[String, Q] = Map(
    "ext57_zorder_layout" -> zorderLayout)

  val oracleSql: Map[String, String] = Map(
    "ext57_zorder_layout" ->
      """WITH g AS (
        |  SELECT event_id, user_id % 256 AS x, (event_id % 997) % 256 AS y
        |  FROM events),
        |s4 AS (
        |  SELECT x, y,
        |    (x | (x << 4)) & 3855 AS xs4, (y | (y << 4)) & 3855 AS ys4
        |  FROM g),
        |s2 AS (
        |  SELECT x, y,
        |    (xs4 | (xs4 << 2)) & 13107 AS xs2, (ys4 | (ys4 << 2)) & 13107 AS ys2
        |  FROM s4),
        |z AS (
        |  SELECT x, y,
        |    ((xs2 | (xs2 << 1)) & 21845) | (((ys2 | (ys2 << 1)) & 21845) << 1)
        |      AS zkey
        |  FROM s2)
        |SELECT zkey // 4096 AS bucket, COUNT(*) AS n,
        |  MIN(x) AS x_min, MAX(x) AS x_max, MIN(y) AS y_min, MAX(y) AS y_max
        |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin)
}
