package graft

/** Conf-hygiene sweep over the ENTIRE catalog: no query may leave the
  * shared session's SQLConf different from how it found it. This
  * generalizes the round-5 q82 incident (a query toggled a session conf
  * for its own needs and leaked it, silently re-planning every later
  * query in the same JVM — caught at judge time, not test time). Every
  * entry runs at sf0.001 against one session; the conf map is diffed
  * after each, and a leak is reported per offending query. Leaked keys
  * are restored before the next entry so one offender can't cascade
  * false positives onto the rest of the catalog.
  */
class ConfLeakSpec extends SparkTestBase {

  test("no catalog query mutates the shared session's SQLConf") {
    val baseline = spark.conf.getAll
    val leaks = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try fn(spark, sf).count() catch { case _: Throwable => () }
        spark.catalog.clearCache()
        val after = spark.conf.getAll
        val changed = (after.keySet ++ baseline.keySet).toSeq.sorted.filter {
          k => baseline.get(k) != after.get(k)
        }
        // restore so the next query is judged against the same baseline
        changed.foreach { k =>
          baseline.get(k) match {
            case Some(v) => spark.conf.set(k, v)
            case None => spark.conf.unset(k)
          }
        }
        if (changed.isEmpty) None
        else Some(s"$name leaked: " + changed.map { k =>
          s"$k (${baseline.get(k).getOrElse("<unset>")} -> ${after.get(k).getOrElse("<unset>")})"
        }.mkString(", "))
    }
    assert(leaks.isEmpty, leaks.mkString("\n"))
  }
}
