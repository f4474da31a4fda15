package graft.dw

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** Raw-layer ingest (SURVEY.md §2.1 S3-S5; `/root/reference/load.py`).
  *
  * The reference uploads local NDJSON/CSV files into a MinIO bucket with a
  * make-bucket-if-missing guard (load.py:9-32). The Spark-native analogue
  * is the Hadoop FileSystem API: the same three calls work unchanged
  * against `file://`, `hdfs://` or `s3a://bucket/prefix` destinations
  * (hadoop-aws wires s3a to any S3-compatible store, MinIO included), so
  * this utility IS the load.py replacement on a real cluster. Byte-level
  * copy only — no parsing, matching the reference.
  */
object Ingest {

  /** Ensure the destination "bucket"/prefix exists (load.py:9-20). */
  def ensureBucket(spark: SparkSession, dest: String): Boolean = {
    val destPath = new Path(dest)
    val fs = destPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(destPath) || fs.mkdirs(destPath)
  }

  /** Copy every file under `srcDir` whose name ends with one of
    * `extensions` into `dest`, returning the copied names
    * (load.py:22-32: listdir + extension filter + per-file put).
    */
  def ingest(spark: SparkSession, srcDir: String, dest: String,
      extensions: Seq[String] = Seq(".json", ".csv")): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new Path(srcDir)
    val srcFs = src.getFileSystem(conf)
    ensureBucket(spark, dest)
    val destPath = new Path(dest)
    val destFs = destPath.getFileSystem(conf)
    srcFs.listStatus(src).toSeq
      .filter(st => st.isFile && extensions.exists(st.getPath.getName.endsWith))
      .map { st =>
        FileUtil.copy(srcFs, st.getPath, destFs,
          new Path(destPath, st.getPath.getName),
          false /* keep source */, true /* overwrite */, conf)
        st.getPath.getName
      }
  }
}
