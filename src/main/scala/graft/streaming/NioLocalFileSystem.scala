package graft.streaming

import java.nio.file.Files
import java.nio.file.attribute.PosixFilePermission
import java.nio.file.attribute.PosixFilePermission._

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.hadoop.fs.RawLocalFileSystem
import org.apache.hadoop.fs.permission.FsPermission

/** Local `file://` Hadoop filesystem that never forks. Without libhadoop
  * (none ships in this container, and none can be fetched offline) Hadoop's
  * local filesystems fall back to `exec`ing `chmod` for every
  * `setPermission` — and `create()` calls it once per file, so every
  * streaming-checkpoint artifact (offset WAL, commit WAL, one state-store
  * delta PER STORE PER PARTITION PER BATCH) pays a process fork from a
  * many-GiB JVM: measured ~15-50 ms apiece, which made the micro-batch
  * replays fork-bound, not compute-bound. This subclass reroutes
  * `setPermission` through `java.nio.file.Files.setPosixFilePermissions`
  * (an in-process syscall) and inherits everything else from
  * `RawLocalFileSystem` — which also skips the checksum-sidecar layer
  * (`LocalFileSystem`'s .crc twin files; parquet carries its own page
  * checksums, and the WALs are single-writer rename-published).
  *
  * Registered by the harness mains via
  * `spark.hadoop.fs.file.impl = graft.streaming.NioLocalFileSystem`; a
  * production deploy on S3/HDFS never touches this class (scheme-scoped
  * to `file://`).
  */
class NioLocalFileSystem extends RawLocalFileSystem {

  override def setPermission(p: HPath, permission: FsPermission): Unit = {
    val m: Int = permission.toShort.toInt
    val set = java.util.EnumSet.noneOf(classOf[PosixFilePermission])
    def add(bit: Int, perm: PosixFilePermission): Unit =
      if ((m & bit) != 0) { set.add(perm); () }
    add(0x100, OWNER_READ); add(0x80, OWNER_WRITE); add(0x40, OWNER_EXECUTE)
    add(0x20, GROUP_READ); add(0x10, GROUP_WRITE); add(0x8, GROUP_EXECUTE)
    add(0x4, OTHERS_READ); add(0x2, OTHERS_WRITE); add(0x1, OTHERS_EXECUTE)
    Files.setPosixFilePermissions(pathToFile(p).toPath, set)
  }
}
