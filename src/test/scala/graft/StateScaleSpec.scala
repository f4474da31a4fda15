package graft

/** The 100 TB streaming-state rehearsal (VERDICT r10 #5): launches
  * [[graft.streaming.StateScaleMain]] in its OWN JVM with a tight heap
  * and asserts the contract line — 500k keys × 256 B of TTL'd state
  * flow through a RocksDB-backed `transformWithState` under a heap that
  * could not hold the state as on-heap objects, and the TTL really
  * expires. See StateScaleMain's scaladoc for why the tight -Xmx IS the
  * assertion.
  */
class StateScaleSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("500k-key TTL state under a tight heap: RocksDB completes, TTL expires") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft_state_scale")
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "java")
      .getAbsolutePath
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cp = "target/scala-2.13/classes:/opt/spark/jars/*"
    val heap = "-Xmx560m" // Spark refuses drivers under ~450 MB usable
    val cmd = Seq(javaBin, heap) ++ addOpens ++ Seq(
      "-Dspark.ui.enabled=false", "-cp", cp,
      "graft.streaming.StateScaleMain", ckpt.toString, "500000")
    val out = new StringBuilder
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val rd = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    var line = rd.readLine()
    while (line != null) { out.append(line).append('\n'); line = rd.readLine() }
    val code = proc.waitFor()
    val contract = out.toString.linesIterator
      .find(_.startsWith("STATE_SCALE ")).getOrElse(
        fail(s"no STATE_SCALE line (exit $code):\n" +
          out.toString.linesIterator.toSeq.takeRight(40).mkString("\n")))
    assert(code === 0, s"subprocess failed:\n$contract")
    def field(k: String): String =
      contract.split(' ').collectFirst {
        case kv if kv.startsWith(s"$k=") => kv.drop(k.length + 1)
      }.getOrElse(fail(s"missing $k in: $contract"))
    assert(field("keys") === "500000")
    // heap honesty: the subprocess really ran under the tight cap
    assert(field("heapMaxMb").toLong <= 640L,
      s"subprocess escaped the tight heap: $contract")
    // changelog checkpointing engaged: per-batch deltas, not snapshots
    assert(field("changelogs").toLong > 0L, contract)
    assert(field("fresh_ok") === "true", contract)
    assert(field("alive_ok") === "true", contract)
    assert(field("expired_ok") === "true", contract)
  }
}
