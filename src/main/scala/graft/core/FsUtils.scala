package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}

/** Tiny Hadoop-FS helpers shared by the publish/ingest protocols. */
private[graft] object FsUtils {
  /** Read a small control file (manifest/marker) fully as UTF-8. */
  def readUtf8(fs: FileSystem, path: Path): String = {
    val in = fs.open(path)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
      new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Write a small control file fully as UTF-8 (overwrites). */
  def writeUtf8(fs: FileSystem, path: Path, text: String): Unit = {
    val out = fs.create(path, true)
    try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}
