package graft

import java.net.URI
import org.apache.hadoop.fs.{FileStatus, Path => HPath, RawLocalFileSystem}

/** Object-store FILESYSTEM SHIM: local storage with the two semantics
  * that break naive committers on S3-class stores —
  *   1. NO ATOMIC RENAME: `rename` refuses (returns false, the Hadoop
  *      contract for "cannot rename"); a committer that depends on it
  *      must fail LOUDLY, never publish silently;
  *   2. EVENTUAL LISTING: `listStatus` omits files younger than the
  *      configured lag (list-after-write is not guaranteed on object
  *      stores; read-after-write BY KEY is — `open` serves fresh files).
  * Mirrors the reference's MinIO raw layer (`load.py:4-32`), which the
  * sandbox cannot run; the shim makes its semantics testable. */
class ObjStoreFS extends RawLocalFileSystem {
  override def getScheme: String = "objstore"
  override def getUri: URI = URI.create("objstore:///")
  override def rename(src: HPath, dst: HPath): Boolean = {
    ObjStoreFS.renameCalls.incrementAndGet()
    false // object stores have no rename; COPY+DELETE is not atomic
  }
  override def listStatus(f: HPath): Array[FileStatus] = {
    val lag = ObjStoreFS.listingLagMs.get()
    val now = System.currentTimeMillis()
    super.listStatus(f).filter(st =>
      st.isDirectory || now - st.getModificationTime >= lag)
  }
}

object ObjStoreFS {
  val renameCalls = new java.util.concurrent.atomic.AtomicLong(0)
  val listingLagMs = new java.util.concurrent.atomic.AtomicLong(0)
}

/** The object-store commit-protocol proof the q65 file:// run cannot
  * give: under rename-less, eventually-listing semantics the raw-layer
  * ingest (S3–S5, `dw/Ingest`) still lands byte-identical objects
  * without EVER calling rename, while a rename-dependent committer
  * fails loudly instead of publishing a torn result. */
class ObjectStoreCommitSpec extends SparkTestBase {

  private def conf = spark.sparkContext.hadoopConfiguration

  private def withObjStore[T](body: String => T): T = {
    conf.set("fs.objstore.impl", classOf[ObjStoreFS].getName)
    conf.setBoolean("fs.objstore.impl.disable.cache", true)
    val dir = java.nio.file.Files.createTempDirectory("graft_objstore")
    try body(s"objstore://${dir.toAbsolutePath}")
    finally ObjStoreFS.listingLagMs.set(0)
  }

  test("raw-layer ingest is rename-free: works unchanged on a rename-less store") {
    withObjStore { dest =>
      val src = java.nio.file.Files.createTempDirectory("graft_objsrc")
      java.nio.file.Files.write(src.resolve("a.json"),
        "{\"x\":1}\n{\"x\":2}\n".getBytes("UTF-8"))
      java.nio.file.Files.write(src.resolve("b.csv"), "x\n7\n".getBytes("UTF-8"))
      java.nio.file.Files.write(src.resolve("skip.txt"), "no".getBytes("UTF-8"))
      ObjStoreFS.renameCalls.set(0)
      assert(dw.Ingest.ensureBucket(spark, s"$dest/raw"))
      val copied = dw.Ingest.ingest(spark, src.toString, s"$dest/raw")
      assert(copied.toSet === Set("a.json", "b.csv"))
      assert(ObjStoreFS.renameCalls.get() === 0L,
        "ingest must never depend on rename (object stores have none)")
      // bytes round-trip through the store's own FileSystem
      val fs = new HPath(dest).getFileSystem(conf)
      val in = fs.open(new HPath(s"$dest/raw/a.json"))
      val bytes = org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
      in.close()
      assert(new String(bytes, "UTF-8") === "{\"x\":1}\n{\"x\":2}\n")
      // idempotent re-run (load.py's fput overwrite semantics)
      assert(dw.Ingest.ingest(spark, src.toString, s"$dest/raw").toSet ===
        Set("a.json", "b.csv"))
    }
  }

  test("ingest read-back is by exact key: immune to eventual listing") {
    withObjStore { dest =>
      val src = java.nio.file.Files.createTempDirectory("graft_objsrc2")
      java.nio.file.Files.write(src.resolve("c.json"),
        "{\"y\":9}\n".getBytes("UTF-8"))
      // freshly-written objects are invisible to LISTING for 1 hour...
      ObjStoreFS.listingLagMs.set(3600 * 1000L)
      dw.Ingest.ingest(spark, src.toString, s"$dest/raw2")
      val fs = new HPath(dest).getFileSystem(conf)
      // ...so the dest listing lies (this is the store semantics)...
      assert(fs.listStatus(new HPath(s"$dest/raw2"))
        .forall(_.isDirectory), "lag shim should hide the fresh object")
      // ...but read-after-write BY KEY sees the object immediately —
      // the guarantee every ingest consumer must key off (and the
      // reason the warehouse reads manifests/names, never directory
      // listings, to discover committed data)
      assert(fs.exists(new HPath(s"$dest/raw2/c.json")))
      val in = fs.open(new HPath(s"$dest/raw2/c.json"))
      val bytes = org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
      in.close()
      assert(new String(bytes, "UTF-8") === "{\"y\":9}\n")
    }
  }

  test("rename-dependent commit fails LOUDLY on the store, never silently") {
    withObjStore { dest =>
      // Spark's default FileOutputCommitter publishes by renaming the
      // task's _temporary file into place; on a rename-less store that
      // must surface as a job failure — a silent no-op would look like
      // a successful (empty) publish
      val e = intercept[Exception] {
        spark.range(0, 10).toDF("id").write.mode("overwrite")
          .json(s"$dest/out")
      }
      assert(ObjStoreFS.renameCalls.get() > 0L,
        "the default committer should have attempted a rename")
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(m =>
        m.toLowerCase.contains("rename") || m.toLowerCase.contains("commit")),
        s"failure should name the commit/rename problem: ${messages(e)}")
    }
  }
}
