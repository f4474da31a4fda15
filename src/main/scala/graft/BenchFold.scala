package graft

/** Folds a raw bench run (BENCH_RUN.json, written by `graft.Bench`) into
  * the committed cross-run-minimum pin (BENCH_LOCAL.json) as elementwise
  * per-query minima — the only code path allowed to write the pin.
  *
  * Bench itself never touches BENCH_LOCAL.json (round-10 post-mortem: the
  * driver's per-round bench landed in one of this host's multi-minute
  * interference windows and rewrote the committed 237 s minimum pin with
  * a 574 s run in place). The pin's sf tag is preserved; a run against a
  * different sf directory is refused rather than silently mixed in
  * (round-7 post-mortem: cross-fixture comparisons hid real deltas).
  *
  * Usage: sbt "runMain graft.BenchFold [runFile]" — reads ./BENCH_RUN.json
  * (or the named file, e.g. BENCH_RUN.partial.json after an isolated
  * SPARK_GRAFT_BENCH_ONLY adjudication run — the established protocol
  * for outlier re-measure feeds the pin through the same minimum fold),
  * rewrites ./BENCH_LOCAL.json. Prints a one-line delta summary.
  */
object BenchFold {
  import org.json4s._
  import org.json4s.jackson.JsonMethods
  private implicit val fmts: Formats = DefaultFormats

  private def readJson(path: String): Option[JValue] = {
    val f = new java.io.File(path)
    if (f.isFile) Some(JsonMethods.parse(f)) else None
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.props("user.dir")
    val runFile = args.headOption.getOrElse("BENCH_RUN.json")
    val run = readJson(s"$dir/$runFile").getOrElse(
      sys.error(s"$runFile not found — run graft.Bench first"))
    def mapOf(j: JValue, key: String): Map[String, Double] = j \ key match {
      case JNothing => Map.empty
      case v => v.extract[Map[String, Double]]
    }
    val runQ = (run \ "queries").extract[Map[String, Double]]
    val runP = mapOf(run, "probe") // absent on pre-split runs
    val runSf = (run \ "sf").extract[String]
    val pinOpt = readJson(s"$dir/BENCH_LOCAL.json")
    val pinQ = pinOpt.map(p => (p \ "queries").extract[Map[String, Double]])
      .getOrElse(Map.empty)
    val pinP = pinOpt.map(mapOf(_, "probe")).getOrElse(Map.empty)
    val pinSf = pinOpt.map(p => (p \ "sf").extract[String]).getOrElse(runSf)
    require(runSf == pinSf,
      s"refusing to fold a $runSf run into a $pinSf pin — re-pin explicitly")
    val merged = Bench.foldMin(pinQ, runQ)
    // probe minima fold independently (a probe min may come from a
    // different round than its total's min — both are per-metric pins)
    val mergedP = Bench.foldMin(pinP, runP)
    val improved = merged.count { case (k, v) => pinQ.get(k).exists(v < _) }
    val added = merged.size - pinQ.size
    val total = merged.values.sum
    def detail(x: Map[String, Double]): String = x.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + Bench.r2(v) }
      .mkString("{", ",", "}")
    val w = new java.io.PrintWriter(s"$dir/BENCH_LOCAL.json")
    try w.println(
      s"""{"total":${Bench.r2(total)},"sf":"$pinSf","queries":${detail(merged)},"probe":${detail(mergedP)}}""")
    finally w.close()
    println(s"[bench-fold] pin=${pinQ.size}q run=${runQ.size}q -> " +
      s"${merged.size}q total=${Bench.r2(total)}s " +
      s"(improved=$improved added=$added probes=${mergedP.size})")
  }
}
