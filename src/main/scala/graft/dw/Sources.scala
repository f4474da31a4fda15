package graft.dw

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-enforced readers for the warehouse inputs (SURVEY.md §2.1 S1-S5).
  *
  * The reference streams NDJSON/CSV bytes from a MinIO bucket in 100k-row
  * chunks (`/root/reference/transformation.py:53-87`); on Spark a
  * partitioned file scan subsumes both the chunking and the thread-pool
  * parallelism — each file split is a task. The same readers take
  * `s3a://bucket/key` URIs unchanged on a real cluster (hadoop-aws),
  * which replaces the reference's `load.py` MinIO client wholesale.
  *
  * Missing input => typed empty DataFrame, reproducing the reference's
  * empty-frame fallbacks (X3, transformation.py:170-171 etc.) without the
  * per-transform boilerplate.
  */
object Sources {

  /** NDJSON scan (pd.read_json(lines=True), transformation.py:63-67). */
  def ndjson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    readOrEmpty(spark, path, schema)(p => spark.read.schema(schema).json(p))

  /** CSV scan with header (pd.read_csv, transformation.py:84). */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    readOrEmpty(spark, path, schema)(p =>
      spark.read.schema(schema).option("header", "true").csv(p))

  private def readOrEmpty(spark: SparkSession, path: String, schema: StructType)(
      read: String => DataFrame): DataFrame = {
    // conf is owned by ops.configure at the entry boundary — a read
    // helper must not write session state (round-2 hygiene rule).
    val exists = path.nonEmpty && {
      val fsPath = new org.apache.hadoop.fs.Path(path)
      fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(fsPath)
    }
    if (exists) read(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }
}
