package graft.sources

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** K5 — object-store file sink (reference:
  * okta-sync/okta_sync_utils.py:398-433 `upload_to_gcs`): put a
  * driver-local result file into a bucket under a blob name.
  *
  * Spark-first form: the Hadoop FileSystem API already speaks every
  * object store the cluster is configured for (gs://, s3a://, abfss://,
  * hdfs://, file://), so the "upload" is one FS-agnostic copy — no
  * store-specific client in engine code. Credentials are deployment
  * configuration on the Hadoop conf (the reference's Secret-Manager
  * lookup is the platform's concern, SURVEY §2.1), not engine state.
  *
  * Unlike the reference, failures THROW rather than log-and-continue: a
  * swallowed upload error there means a silently missing artifact; a
  * Spark job step should fail loudly and let the scheduler retry.
  */
object ObjectStoreSink {

  /** Upload one local file to `destUri` (overwrite, like
    * `blob.upload_from_filename`). Returns the fully-qualified
    * destination path. */
  def uploadFile(spark: SparkSession, localFile: String, destUri: String): Path = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new Path(localFile)
    val srcFs = src.getFileSystem(conf)
    require(srcFs.getFileStatus(src).isFile, s"not a file: $localFile")
    val dst = new Path(destUri)
    val dstFs = dst.getFileSystem(conf)
    Option(dst.getParent).foreach(dstFs.mkdirs)
    if (!FileUtil.copy(srcFs, src, dstFs, dst, false, true, conf))
      throw new java.io.IOException(s"upload failed: $localFile -> $destUri")
    dstFs.makeQualified(dst)
  }

  /** Upload every data file under a result directory (e.g. a written
    * parquet/csv dir, INCLUDING partitioned layouts — the walk is
    * recursive with relative paths preserved) to `destDirUri`, skipping
    * job-tracker markers (_SUCCESS, .crc) wherever they appear in the
    * tree. Throws when no data file ships — a result dir with nothing
    * to upload is an upstream failure, not a success. Returns the
    * qualified destination paths — the multi-file form the reference
    * loops by hand. */
  def uploadResultDir(spark: SparkSession, localDir: String, destDirUri: String): Seq[Path] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new Path(localDir)
    val srcFs = src.getFileSystem(conf)
    require(srcFs.getFileStatus(src).isDirectory, s"not a directory: $localDir")
    val base = srcFs.makeQualified(src).toUri
    val files = scala.collection.mutable.ArrayBuffer.empty[(String, Path)]
    val it = srcFs.listFiles(src, true)
    while (it.hasNext) {
      val st = it.next()
      val rel = base.relativize(st.getPath.toUri).getPath
      val marker = rel.split('/').exists(seg => seg.startsWith("_") || seg.startsWith("."))
      if (!marker) files += rel -> st.getPath
    }
    if (files.isEmpty)
      throw new java.io.IOException(s"no data files to upload under $localDir")
    files.toSeq.map { case (rel, p) => uploadFile(spark, p.toString, s"$destDirUri/$rel") }
  }
}
