package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Local tuning grid for the graph-ANN recall ladder (VERDICT r12 #3):
  * prints mean recall_global / recall_cell for each (probes, lloyd,
  * beam, hops) configuration so a new committed rung is chosen from
  * MEASURED numbers, not guesses. Not part of the driver contract. */
object RecallProbeMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.ops.configure(spark)
    // both round-13 sweeps; measured recall_global at sf0.01 in the
    // trailing comments (recall_cell varies inversely with probes —
    // the breadth trade SURVEY §19.3 documents)
    val grid = Seq(
      (2, 1, 16, 5), // 0.433 — ext166, the r12 ceiling
      (3, 1, 16, 5), // 0.400 — probes REGRESS at fixed width
      (2, 2, 16, 5), // 0.433
      (2, 1, 32, 5), // 0.500
      (3, 2, 16, 5), // 0.400
      (3, 1, 32, 5), // 0.567
      (3, 2, 32, 5), // 0.533
      (4, 2, 32, 5), // 0.567
      (3, 2, 32, 7), // 0.567
      (4, 1, 32, 5), // 0.600
      (4, 2, 48, 5), // 0.667
      (6, 1, 48, 5), // 0.667
      (6, 2, 48, 5), // 0.633
      (6, 2, 64, 5), // 0.700
      (8, 2, 64, 5), // 0.833 — committed as ext168
      (4, 2, 64, 7)) // 0.700
    grid.foreach { case (p, l, b, h) =>
      val t0 = System.nanoTime()
      val r = ext.Similarity.recallConfig(spark, d, p, l, b, h)
        .agg(avg("recall_global"), avg("recall_cell")).head
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"""{"probes":$p,"lloyd":$l,"beam":$b,"hops":$h,"recall_global":${r.getDouble(0)}%.3f,"recall_cell":${r.getDouble(1)}%.3f,"s":$dt%.1f}""")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
