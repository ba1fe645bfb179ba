package graft.streaming

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Executor-fed micro-batch replay on Spark's FILE streaming source — the
  * harness that drives a bounded corpus through a Structured Streaming
  * topology with deterministic batch boundaries and NO data through the
  * driver.
  *
  * Earlier rounds used `MemoryStream`: the corpus was `collect()`ed and
  * re-shipped from the driver — fine as Spark's own test idiom, but it was
  * the one driver-side data path left in the inventory, and at sf1 it
  * serialized the whole events table twice through one JVM thread. Here
  * each intended micro-batch is STAGED instead: executors write the batch
  * DataFrame as parquet into a staging dir, and the part files are then
  * renamed (a metadata-only move, no bytes copied) into the directory the
  * streaming query watches. `FileStreamSource` picks up every file that
  * appeared since the last trigger as ONE micro-batch (no
  * `maxFilesPerTrigger` cap), so
  *
  *   feed.stage(batchDf); query.processAllAvailable()
  *
  * is the exact analogue of `mem.addData(rows); processAllAvailable()` —
  * same batch split, same watermark advance points — with the feed running
  * distributed. The production shape differs only in who writes the files
  * (Kafka partitions / an upstream job instead of this staging rename);
  * offsets live in the checkpoint's file-source log either way, which also
  * makes the two-run restart replays (`Trigger.AvailableNow` over one
  * checkpoint) portable across processes — something MemoryStream offsets
  * never were.
  *
  * Batch DataFrames must share one schema (pass it at construction; the
  * file source cannot infer streaming schemas). `close()` after
  * `query.stop()` — the staged corpus is transient harness state, not a
  * result.
  */
final class FileReplay private (spark: SparkSession, schema: StructType,
    root: Path) {

  private val watchDir = root.resolve("in")
  private var n = 0

  /** The streaming side: a parquet `readStream` over the watched dir. */
  def stream: DataFrame =
    spark.readStream.schema(schema).parquet(watchDir.toString)

  /** Stage `df` as the NEXT micro-batch: distributed parquet write to a
    * staging dir, then rename each part file into the watched dir under a
    * batch-ordered name. Returns after the files are visible, so a
    * following `processAllAvailable()` consumes exactly this batch.
    */
  def stage(df: DataFrame): Unit = {
    val dir = root.resolve(f"stage_b$n%05d")
    df.write.mode("overwrite").parquet(dir.toString)
    val parts = Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .toSeq.sortBy(_.getFileName.toString)
    parts.zipWithIndex.foreach { case (p, i) =>
      Files.move(p, watchDir.resolve(f"b$n%05d_$i%05d.parquet"))
    }
    n += 1
  }

  /** Delete the staged corpus (watch dir + empty staging skeletons). */
  def close(): Unit = {
    def rm(p: Path): Unit = {
      if (Files.isDirectory(p))
        Files.list(p).iterator().asScala.foreach(rm)
      Files.deleteIfExists(p)
    }
    rm(root)
  }
}

object FileReplay {
  /** Fresh replay feed under java.io.tmpdir; `schema` is the shared schema
    * of every batch that will be staged.
    */
  def apply(spark: SparkSession, schema: StructType): FileReplay = {
    val root = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_replay_" + java.util.UUID.randomUUID().toString.replace("-", ""))
    Files.createDirectories(root.resolve("in"))
    new FileReplay(spark, schema, root)
  }
}
