package graft

import graft.ext.Similarity
import graft.functions.CosineSimilarity
import org.apache.spark.sql.functions._

class NativeExprSpec extends SparkTestBase {

  test("GraftExtensions registers graft_cosine at session build (no manual register)") {
    // SparkTestBase sets spark.sql.extensions=graft.functions.GraftExtensions;
    // this must resolve without CosineSimilarity.register having run
    val r = spark.sql("SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
  }

  test("graft_cosine equals the higher-order-function formulation bit for bit") {
    CosineSimilarity.register(spark)
    val vecs = ops.table(spark, sf, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .limit(50)
    val both = vecs.as("a").join(vecs.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        expr("graft_cosine(a.v, b.v)").as("native"),
        (expr("aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)") /
          (expr("sqrt(aggregate(a.v, 0D, (acc, x) -> acc + x * x))") *
            expr("sqrt(aggregate(b.v, 0D, (acc, x) -> acc + x * x))"))).as("hof"))
      .collect()
    both.foreach(r => assert(r.getDouble(0) === r.getDouble(1),
      "native and HOF cosine diverged"))
  }

  test("graft_cosine stays inside whole-stage codegen (no fallback)") {
    CosineSimilarity.register(spark)
    val vecs = ops.table(spark, sf, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    // exchange-free plan so no AQE wrapper hides the codegen spans; the
    // "*(n)" prefix is how toString marks a WholeStageCodegen member
    val plan = vecs.select(expr("graft_cosine(v, v)").as("c"))
      .queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[graft_cosine""".r.findFirstIn(plan).isDefined,
      s"graft_cosine Project not inside a codegen span:\n$plan")
  }

  test("graft_cosine nulls propagate, self-similarity is 1") {
    CosineSimilarity.register(spark)
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(1.0, 2.0, 3.0))),
      (None, Some(Seq(1.0, 2.0, 3.0))))
      .toDF("a", "b")
      .select(expr("graft_cosine(a, b)").as("c")).collect()
    assert(math.abs(df(0).getDouble(0) - 1.0) < 1e-12)
    assert(df(1).isNullAt(0))
  }

  test("native-expr search query matches the HOF search query exactly") {
    val hof = Similarity.bruteForceTopK(spark, sf)
    val native = Similarity.bruteForceNativeExpr(spark, sf)
    assert(native.except(hof).count() === 0)
    assert(hof.except(native).count() === 0)
  }

  test("graft_rolling_hash equals the HOF fold and stays in codegen") {
    graft.functions.RollingHash.register(spark)
    val docs = ops.table(spark, sf, "documents")
      .select(lower(trim(col("text"))).as("t"))
    val both = docs.select(
        expr("graft_rolling_hash(t)").as("native"),
        expr("""IF(length(t) = 0, CAST(0 AS BIGINT),
                 aggregate(sequence(1, length(t)), CAST(0 AS BIGINT),
                   (acc, i) -> (acc * 31 + ascii(substring(t, i, 1))) % 1000000007))""").as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(0) === r.getLong(1), "rolling hash diverged"))
    // empty and null inputs
    import spark.implicits._
    val edge = Seq(Some(""), None).toDF("t")
      .select(expr("graft_rolling_hash(t)").as("h")).collect()
    assert(edge(0).getLong(0) === 0L && edge(1).isNullAt(0))
    val plan = docs.select(expr("graft_rolling_hash(t)").as("h"))
      .queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined,
      s"graft_rolling_hash Project not inside a codegen span:\n$plan")
  }

  test("graft_sqdist equals the HOF fold bit for bit and stays in codegen") {
    graft.functions.SquaredDistance.register(spark)
    val vecs = ops.table(spark, sf, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .limit(40)
    val both = vecs.as("a").join(vecs.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        expr("graft_sqdist(a.v, b.v)").as("native"),
        expr("aggregate(zip_with(a.v, b.v, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)")
          .as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getDouble(0) === r.getDouble(1), "sqdist diverged"))
    val plan = vecs.select(expr("graft_sqdist(v, v)").as("z"))
      .queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined,
      s"graft_sqdist Project not inside a codegen span:\n$plan")
  }

  test("graft_simhash equals the relational sign-table formulation bit for bit") {
    graft.functions.SimHash64.register(spark)
    val toks = ops.table(spark, sf, "documents")
      .select(col("doc_id"), explode(split(lower(trim(col("text"))), " ")).as("tok"))
      .filter(col("tok") =!= "").distinct()
    val signCols = (0 to 31).map(j =>
      when(substring(md5(concat(col("tok"), lit(s"#$j"))), 1, 1) >= "8", 1)
        .otherwise(-1).as(s"s$j"))
    val balCols = (0 to 31).map(j => sum(col(s"s$j")).as(s"bal$j"))
    val fpExpr = (0 to 31)
      .map(j => s"IF(bal$j > 0, CAST(shiftleft(CAST(1 AS BIGINT), $j) AS BIGINT), CAST(0 AS BIGINT))")
      .mkString(" + ")
    val relational = toks.select(col("doc_id") +: col("tok") +: signCols: _*)
      .groupBy("doc_id").agg(balCols.head, balCols.tail: _*)
      .select(col("doc_id"), expr(fpExpr).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = ops.table(spark, sf, "documents")
      .select(col("doc_id"),
        expr("array_distinct(filter(split(lower(trim(text)), ' '), t -> t <> ''))").as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), expr("graft_simhash(toks)").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native === relational, "native simhash diverged from sign-table formulation")
  }

  test("graft_simhash stays inside whole-stage codegen; empty array -> 0") {
    graft.functions.SimHash64.register(spark)
    val plan = ops.table(spark, sf, "documents")
      .select(expr("graft_simhash(split(text, ' '))").as("h"))
      .queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[graft_simhash""".r.findFirstIn(plan).isDefined,
      s"graft_simhash Project not inside a codegen span:\n$plan")
    import spark.implicits._
    val r = Seq(Seq.empty[String]).toDF("t")
      .select(expr("graft_simhash(t)")).collect()
    assert(r(0).getLong(0) === 0L)
  }

  test("graft_rolling_hash rejects non-string input at analysis time") {
    graft.functions.RollingHash.register(spark)
    import spark.implicits._
    // non-string input -> analysis-time DATATYPE_MISMATCH, not a runtime
    // ClassCastException
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(42).toDF("n")
        .select(expr("graft_rolling_hash(n)")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("graft_rolling_hash"))
  }
}
