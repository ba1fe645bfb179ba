package graft.streaming

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

/** RAM-backed scratch for the replay harness. The micro-batch replays are
  * fsync-bound, not compute-bound, on an ext4 /tmp: every trigger commits
  * an offset WAL + a commit WAL + one state delta PER STORE PER PARTITION
  * (a stream-stream join keeps four stores per partition), and a 1-row
  * batch through that machinery measured 2.3 s on this box's virtio disk.
  * Production checkpoints live on S3/HDFS whose commit latency is a
  * deployment property, not an engine one — so the harness mains redirect
  * `java.io.tmpdir` (FileReplay staging, temp memory-sink checkpoints, the
  * gates' explicit checkpoint roots, and Spark's local shuffle dirs all
  * derive from it) to /dev/shm when a real tmpfs with headroom is there,
  * and measure the engine instead of the box's fsync.
  *
  * Install is opt-in per MAIN (Bench / Verify / TimeOne), not ambient:
  * the ScalaTest suites keep whatever tmpdir the JVM started with.
  */
object Scratch {

  /** Minimum usable space to accept a scratch filesystem (the biggest
    * per-run footprint is the sf1 events corpus staged a few times over,
    * single-digit GiB).
    */
  private val MinUsableBytes = 16L * 1024 * 1024 * 1024

  /** The chosen scratch root: /dev/shm when present, writable, and roomy;
    * else the JVM's original tmpdir.
    */
  lazy val root: String = {
    val shm = Paths.get("/dev/shm")
    val ok = Files.isDirectory(shm) && Files.isWritable(shm) &&
      shm.toFile.getUsableSpace >= MinUsableBytes
    if (ok) "/dev/shm" else System.getProperty("java.io.tmpdir")
  }

  /** Point `java.io.tmpdir` at the scratch root (before the SparkSession
    * is built, so spark.local.dir follows) and sweep leftovers from
    * crashed earlier runs. Idempotent.
    */
  def install(): Unit = {
    sweepStale()
    System.setProperty("java.io.tmpdir", root)
  }

  /** Best-effort removal of this harness's own stale scratch dirs
    * (graft_* older than 6 h — anything that old belongs to a dead JVM;
    * live runs clean up behind themselves or are younger).
    */
  private def sweepStale(): Unit = {
    val cutoff = System.currentTimeMillis() - 6L * 3600 * 1000
    val dir = Paths.get(root)
    def rm(p: Path): Unit = {
      if (Files.isDirectory(p))
        Files.list(p).iterator().asScala.foreach(rm)
      Files.deleteIfExists(p)
    }
    try {
      Files.list(dir).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("graft_"))
        .filter(p => Files.getLastModifiedTime(p).toMillis < cutoff)
        .foreach(p => try rm(p) catch { case _: Throwable => () })
    } catch { case _: Throwable => () }
  }
}
