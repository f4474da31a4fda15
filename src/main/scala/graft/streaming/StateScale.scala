package graft.streaming

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode}

/** Standalone rehearsal of the 100 TB streaming-state risk: a key
  * population whose state exceeds the JVM heap, driven through a TTL'd
  * `transformWithState` op on the RocksDB state-store provider.
  *
  * Run as its OWN JVM with a deliberately TIGHT heap
  * (StateScaleSpec launches `java -Xmx<tight> … graft.streaming.
  * StateScaleMain <ckpt> <nKeys>`): RocksDB keeps committed state
  * off-heap and on local disk, so the run completes and enforces TTL
  * under a heap that could not hold the state as JVM objects — the
  * default HashMapStateStoreProvider retains every loaded version's
  * map ON-HEAP (payload + UnsafeRow + map overhead per key), which is
  * exactly what breaks first on a 1000-executor cluster when a
  * stateful pipeline's key population grows past memory. The tight
  * -Xmx is the point: the run is green only because state never lives
  * on the heap.
  *
  * Each phase runs as its own short-lived query over ONE shared
  * checkpoint (state survives restarts — itself part of the claim):
  * drain-the-input-then-stop, because processing-time semantics
  * busy-spin empty micro-batches whenever a query is left running,
  * committing a RocksDB snapshot per spin. The restart-per-phase shape
  * is also how a maintenance-window batch pipeline drives streaming
  * state in production.
  *
  * Three properties, printed as one machine-readable line:
  *   - scale: all `nKeys` keys report no prior state in phase 1 and
  *     a 1/1000 probe subset finds its state ALIVE in phase 2;
  *   - TTL expiry: phase 3 runs after the TTL elapses and every probe
  *     finds its state GONE (TTLConfig is real wall-clock expiry);
  *   - heap honesty: `Runtime.maxMemory` is printed so the spec can
  *     refuse a run that silently launched with a default heap.
  */
object StateScaleMain {

  case class In(k: Long, phase: Int)
  case class Out(k: Long, phase: Int, had: Boolean)

  /** 256-byte payload per key under a processing-time TTL; emits
    * whether the key had live (unexpired) state when the row arrived. */
  class TtlPayloadProcessor(ttlMs: Long)
      extends StatefulProcessor[Long, In, Out] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[String] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[String]("payload", Encoders.STRING,
        TTLConfig(java.time.Duration.ofMillis(ttlMs)))
    override def handleInputRows(key: Long, rows: Iterator[In],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[Out] = {
      val phase = rows.map(_.phase).max
      val had = st.exists()
      if (!had) st.update("p" * 256)
      Iterator.single(Out(key, phase, had))
    }
  }

  def main(args: Array[String]): Unit = {
    val ckpt = args(0)
    val nKeys = args(1).toLong
    // long enough that phase 1 (bulk write) + phase 2 (probe) land
    // INSIDE the TTL even under this box's interference windows; the
    // phase-3 sleep is computed from the measured phase-1 end, so the
    // wall cost tracks the real batch time instead of a worst case
    val ttlMs = args.lift(2).map(_.toLong).getOrElse(60000L)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-state-scale")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // changelog checkpointing: each commit uploads the batch's DELTA
      // instead of a full RocksDB snapshot — at 100 TB of state the
      // per-batch checkpoint cost tracks churn, not state size. The
      // phase restarts below then genuinely exercise changelog REPLAY
      // (recovery = last snapshot + replayed deltas), and the run
      // asserts .changelog files actually landed in the checkpoint.
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[In]
    // one short-lived query per phase over the SAME checkpoint. The
    // sink must be foreachBatch: a memory-sink query REFUSES to recover
    // from an existing checkpoint ("does not support recovering"), and
    // restart-over-one-checkpoint is the state-survives-restarts claim.
    // Each batch folds to one (phase, n, nHad) summary on the driver;
    // rows carry their phase, so a replayed batch from a previous phase
    // can never pollute the current phase's tally.
    val sums = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long)]()
    def runPhase(data: Seq[In]): (Long, Long) = {
      val phase = data.head.phase
      in.addData(data)
      val q = in.toDS()
        .groupByKey(_.k)
        .transformWithState(new TtlPayloadProcessor(ttlMs),
          TimeMode.ProcessingTime(), OutputMode.Update())
        .writeStream
        .outputMode(OutputMode.Update())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[Out], _: Long) =>
          b.groupBy(col("phase"))
            .agg(count(lit(1)).as("n"),
              sum(when(col("had"), 1L).otherwise(0L)).as("n_had"))
            .collect()
            .foreach(r => sums.add((r.getInt(0), r.getLong(1), r.getLong(2))))
        }
        .start()
      // processing-time TimeMode keeps scheduling batches for timer/TTL
      // work, so the query NEVER self-terminates — `AvailableNow` and
      // even `processAllAvailable()` spin empty micro-batches forever
      // (observed: ~2 RocksDB-snapshot commits/sec, >1000 commits),
      // because TTL work keeps "data available" true. The only reliable
      // drain signal is the sink's own tally: wait until committed
      // batches account for every row this phase fed, then stop.
      def tally: (Long, Long) = {
        val mine = sums.toArray(Array.empty[(Int, Long, Long)])
          .filter(_._1 == phase)
        (mine.map(_._2).sum, mine.map(_._3).sum)
      }
      val deadline = System.currentTimeMillis() + 600000L
      while (tally._1 < data.size) {
        q.exception.foreach(throw _)
        require(System.currentTimeMillis() < deadline,
          s"phase $phase never drained: ${tally._1}/${data.size} rows")
        Thread.sleep(100)
      }
      q.stop()
      q.awaitTermination()
      tally
    }

    try {
      // phase 1: the full key population — every key is fresh
      val (n1, had1) = runPhase((0L until nKeys).map(In(_, 1)))
      val t1End = System.currentTimeMillis() // last state write is before this
      val freshOk = n1 == nKeys && had1 == 0L

      // phase 2 (inside TTL): a 1/1000 probe subset sees its state alive
      val probes = (0L until nKeys by math.max(nKeys / 1000, 1)).toSeq
      val (n2, had2) = runPhase(probes.map(In(_, 2)))
      val aliveOk = n2 == probes.size && had2 == n2

      // phase 3 (after TTL): the same probes find their state expired —
      // wake when even the LAST phase-1 write has aged past the TTL
      val wait = t1End + ttlMs + 2000 - System.currentTimeMillis()
      if (wait > 0) Thread.sleep(wait)
      val (n3, had3) = runPhase(probes.map(In(_, 3)))
      val expiredOk = n3 == probes.size && had3 == 0L

      val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
      // changelog checkpointing really engaged: delta files on disk
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
      val changelogs =
        try {
          val it = walk.iterator()
          var nCl = 0L
          while (it.hasNext)
            if (it.next().getFileName.toString.endsWith(".changelog")) nCl += 1
          nCl
        } finally walk.close()
      // the one spec-parsed line (StateScaleSpec greps it)
      println(s"STATE_SCALE keys=$nKeys heapMaxMb=$heapMb " +
        s"changelogs=$changelogs " +
        s"fresh_ok=$freshOk alive_ok=$aliveOk expired_ok=$expiredOk")
    } finally spark.stop()
  }
}
