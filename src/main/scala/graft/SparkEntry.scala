package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-module catalogs; every key has a matching
  * `oracleSql` entry unless the operator is not SQL-expressible in DuckDB
  * (those get the driver's weaker rows-only check).
  *
  * Rows-only allowlist (the FULL current list — ContractSpec pins it, so
  * adding an entry without updating both is a test failure, not a silent
  * coverage hole): exactly one entry, `q38_approx_distinct` — HLL sketch
  * state is engine-private and not reproducible in DuckDB; its
  * deterministic KMV twin `q38b` is hash-checked instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star join + agg + top-N over the fixture schema (SURVEY.md §7.2 step 1).
    */
  def entry(spark: SparkSession): DataFrame = {
    ops.configure(spark)
    ops.Relational.q04StarJoin(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. Every query is
    * wrapped with `ops.configure` — the one documented place the catalog
    * sets its session confs (ANSI off, parquet nanos-as-long).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (ops.Relational.queries ++
      ops.SemiStructured.queries ++
      ops.WarehouseDemo.queries ++
      dw.DateDimQueries.queries ++
      ext.Dedup.queries ++
      ext.Similarity.queries ++
      ext.TextAnalysis.queries ++
      ext.TrainingPrep.queries ++
      ext.CorpusOps.queries ++
      ext.Behavior.queries ++
      ext.Search.queries ++
      ext.GraphRank.queries ++
      ext.Multimodal.queries ++
      ext.Layout.queries ++
      ext.Geo.queries ++
      ext.Expectations.queries ++
      streaming.Streams.queries ++
      plans.AsOfQueries.queries ++
      ops.Advanced.queries ++
      ops.DecisionSupport.queries ++
      ops.IncrementalMv.queries ++
      ext.Pipeline.queries)
      .map { case (name, fn) =>
        name -> { (s: SparkSession, d: String) => ops.configure(s); fn(s, d) }
      }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    ops.Relational.oracleSql ++
      ops.SemiStructured.oracleSql ++
      ops.WarehouseDemo.oracleSql ++
      dw.DateDimQueries.oracleSql ++
      ext.Dedup.oracleSql ++
      ext.Similarity.oracleSql ++
      ext.TextAnalysis.oracleSql ++
      ext.TrainingPrep.oracleSql ++
      ext.CorpusOps.oracleSql ++
      ext.Behavior.oracleSql ++
      ext.Search.oracleSql ++
      ext.GraphRank.oracleSql ++
      ext.Multimodal.oracleSql ++
      ext.Layout.oracleSql ++
      ext.Geo.oracleSql ++
      ext.Expectations.oracleSql ++
      streaming.Streams.oracleSql ++
      plans.AsOfQueries.oracleSql ++
      ops.Advanced.oracleSql ++
      ops.DecisionSupport.oracleSql ++
      ops.IncrementalMv.oracleSql ++
      ext.Pipeline.oracleSql
}
