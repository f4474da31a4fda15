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
    val grid = Seq(
      (4, 1, 32, 5),
      (4, 2, 48, 5),
      (6, 1, 48, 5),
      (6, 2, 48, 5),
      (6, 2, 64, 5),
      (8, 2, 64, 5),
      (4, 2, 64, 7))
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
