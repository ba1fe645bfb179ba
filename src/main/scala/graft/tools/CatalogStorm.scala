package graft.tools

import graft.catalog.{CommitConflictException, TableCatalog, VacuumedVersionException}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One ROLE of the cross-JVM catalog storm (VERDICT r10 task 5): the
  * FIFO `_LOCKQ`, PID-liveness sweeping, and rename-CAS had only ever
  * raced threads inside one JVM — one `lockqReady` set, one process
  * handle, one commitLock object. This main is spawned as a REAL child
  * process (CrossJvmStormSpec) so every cross-process mechanism is
  * exercised for real: intent files from different PIDs, liveness tests
  * against foreign processes, rename exclusivity with no shared JVM
  * lock to hide behind.
  *
  * Usage: `CatalogStorm <root> <role> <iters>` with role one of
  *   append  — `commitWithRetry` of a unique (proc, seq) batch per iter
  *             (the commutative OCC path; conflicts retry internally)
  *   vacuum  — explicit `vacuum(keepLast = 2)` loop (the lock-storm verb)
  *   restore — restore to currentVersion (self-restore: always retained,
  *             exercises pin + staged copy + publish under contention);
  *             `VacuumedVersionException` and CAS conflicts are benign
  *             races by contract and retried, anything else fails
  *   read    — lock-free `currentVersion` + full `read` count loop; any
  *             FNF/checksum leak through the pointer protocol fails
  * Exit 0 = all iterations clean; exit 2 = a contract violation, with
  * the stack on stderr.
  */
object CatalogStorm {
  def main(args: Array[String]): Unit = {
    val Array(root, role, itersS) = args.take(3)
    val iters = itersS.toInt
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.hadoop.fs.file.impl",
        "graft.streaming.NioLocalFileSystem")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val cat = new TableCatalog(spark, root, keepVersions = 4)
    val pid = ProcessHandle.current().pid()
    try {
      var i = 0
      while (i < iters) {
        role match {
          case "append" =>
            val batch = Seq((pid, i.toLong)).toDF("proc", "seq")
            cat.commitWithRetry("silver", "t", maxAttempts = 60) {
              case None => batch
              case Some(base) => base.unionByName(batch)
            }
          case "vacuum" =>
            cat.vacuum("silver", "t", keepLast = 2)
            Thread.sleep(5)
          case "restore" =>
            cat.currentVersion("silver", "t").foreach { v =>
              try cat.restore("silver", "t", v)
              catch {
                // benign by contract: the live version advanced and was
                // vacuumed between resolve and pin, or the target slot
                // was claimed by a concurrent committer — both retried
                // next iteration
                case _: VacuumedVersionException => ()
                case _: CommitConflictException => ()
              }
            }
            Thread.sleep(5)
          case "read" =>
            cat.currentVersion("silver", "t").foreach { _ =>
              try {
                val n = cat.read("silver", "t").count()
                require(n >= 0)
              } catch {
                // a scan that STARTED on a live version can lose files to
                // a concurrent keepLast=2 vacuum mid-execution — the
                // documented aggressive-vacuum-below-reader-lag hazard
                // (Delta semantics), benign here. ONLY task-execution
                // failures qualify (a SparkException from the running job
                // with FNF in its cause chain): a bare/unwrapped FNF or an
                // AnalysisException raised while CONSTRUCTING the
                // DataFrame is the window read()'s re-resolve retry owns,
                // and excusing it would blind the storm to exactly the
                // defect class it exists to catch (r11: the half-deleted
                // dir escape).
                case e: org.apache.spark.SparkException if {
                  var c: Throwable = e.getCause; var fnf = false
                  while (c != null && !fnf) {
                    fnf = c.isInstanceOf[java.io.FileNotFoundException]
                    c = c.getCause
                  }
                  fnf
                } => System.err.println(s"[storm:read:$pid] benign mid-scan FNF")
              }
            }
          case other => sys.error(s"unknown role $other")
        }
        i += 1
        if (i % 5 == 0) System.err.println(s"[storm:$role:$pid] $i/$iters")
      }
      println(s"[storm:$role:$pid] OK $iters iterations")
      spark.stop()
      System.exit(0)
    } catch {
      case e: Throwable =>
        System.err.println(s"[storm:$role:$pid] FAILED at: $e")
        e.printStackTrace()
        spark.stop()
        System.exit(2)
    }
  }
}
