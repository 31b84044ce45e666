package graft.table

import java.io.File
import java.net.URI

import org.apache.hadoop.fs.{FSDataOutputStream, FileStatus, Path => HPath}
import org.apache.hadoop.fs.RawLocalFileSystem
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** TEST DOUBLE: an "object store" FileSystem (registered as scheme `s3a`
  * via `fs.s3a.impl` in the suites that use it) backed by the local tree,
  * whose `create(overwrite = false)` is a TRUE conditional create — NIO
  * `createFile` (O_CREAT|O_EXCL) — modelling connectors that do S3
  * `If-None-Match: *` / GCS `ifGenerationMatch: 0` / ABFS conditional
  * create. This is exactly the deployment state the
  * `spark.graft.commit.objectStoreLocks=conditional` opt-in asserts
  * ([[CommitLocks]]), so racing real table writers against it exercises
  * the conditional OCC path end-to-end without a network.
  *
  * The authority is a fake bucket; the URI path maps 1:1 onto the local
  * filesystem. Everything else (rename, list, delete) inherits
  * RawLocalFileSystem, whose statuses qualify against [[getUri]], so
  * callers only ever see `s3a://` paths.
  */
class CondCreateS3Fs extends RawLocalFileSystem {
  override def getScheme: String = "s3a"
  override def getUri: URI = URI.create("s3a://graft-test")

  // the fake bucket is the authority; the path IS the local path
  override def pathToFile(path: HPath): File =
    new File(path.toUri.getPath)

  // RawLocal's deprecated statuses lazy-load permissions via
  // `new File(status.getPath.toUri)`, which rejects non-file schemes —
  // return plain, fully-loaded statuses instead
  private def mkStatus(f: File, qualified: HPath): FileStatus =
    new FileStatus(f.length, f.isDirectory, 1,
      getDefaultBlockSize(qualified), f.lastModified, f.lastModified,
      if (f.isDirectory) FsPermission.getDirDefault
      else FsPermission.getFileDefault,
      null, null, qualified)

  override def getFileStatus(f: HPath): FileStatus = {
    val file = pathToFile(f)
    if (!file.exists) throw new java.io.FileNotFoundException(f.toString)
    mkStatus(file, makeQualified(f))
  }

  override def listStatus(f: HPath): Array[FileStatus] = {
    val file = pathToFile(f)
    if (!file.exists) throw new java.io.FileNotFoundException(f.toString)
    if (file.isFile) Array(getFileStatus(f))
    else file.listFiles().sortBy(_.getName).map(c =>
      mkStatus(c, makeQualified(new HPath(f, c.getName))))
  }

  override def create(f: HPath, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    if (!overwrite) {
      // the conditional-put: atomically fails if the object exists
      val file = pathToFile(f).toPath
      val parent = file.getParent
      if (parent != null) java.nio.file.Files.createDirectories(parent)
      try java.nio.file.Files.createFile(file)
      catch {
        case e: java.nio.file.FileAlreadyExistsException =>
          throw new java.io.IOException(
            s"conditional create failed (already exists): $f", e)
      }
    }
    // the object now exists (we just created it), so open for overwrite
    super.create(f, true, bufferSize, replication, blockSize, progress)
  }
}
