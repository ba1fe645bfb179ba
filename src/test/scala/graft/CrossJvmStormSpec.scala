package graft

import org.apache.spark.sql.functions._

/** The cross-PROCESS catalog storm (VERDICT r10 task 5): every prior
  * storm spec raced threads inside one JVM, where the FIFO `_LOCKQ`
  * shares one `lockqReady` set, PID-liveness always tests the SAME live
  * process, and `commitLockFor`'s JVM lock shadows the on-disk CAS. Here
  * four REAL child JVMs (spawned from this forked test JVM's own
  * classpath) hammer one table concurrently — OCC appends, explicit
  * vacuums, restores, lock-free reads — under extra CPU load, so the
  * rename-CAS, foreign-PID intent sweeping, and pointer-swap atomicity
  * are exercised across genuine process boundaries for the first time.
  *
  * Pass = all children exit 0 (20+ clean iterations each — the appender
  * runs 25) and the final table state satisfies the OCC invariants:
  * pointer resolves, every (proc, seq) row unique, and the surviving
  * rows of each process form a seq-prefix (commitWithRetry re-derives
  * from the restored base, so a restore may drop a TAIL, never punch a
  * hole).
  */
class CrossJvmStormSpec extends SparkSpec {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def spawn(root: String, role: String, iters: Int): Process = {
    val java = System.getProperty("java.home") + "/bin/java"
    val cmd = Seq(java) ++ addOpens ++ Seq(
      "-Xmx2g", "-cp", System.getProperty("java.class.path"),
      "-Dspark.ui.enabled=false",
      "graft.tools.CatalogStorm", root, role, iters.toString)
    new ProcessBuilder(cmd: _*).inheritIO().start()
  }

  test("cross-JVM storm: OCC appends + vacuum + restore + reads race " +
      "across real process boundaries; all roles exit clean") {
    import spark.implicits._
    val root = tmpDir("storm-xjvm")
    // seed version 1 through the same OCC path the children use, so the
    // appender child's first CAS lands on a real base
    val cat = new graft.catalog.TableCatalog(spark, root, keepVersions = 4)
    cat.commitWithRetry("silver", "t") {
      case None => Seq((0L, 0L)).toDF("proc", "seq")
      case Some(b) => b
    }
    // background CPU load: saturate the box the way the r10 single-JVM
    // storms did, so lock-queue polling happens under scheduler pressure
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val burners = (1 to 8).map { _ =>
      val t = new Thread(() => {
        var x = 0L
        while (!stop.get()) { x += java.util.UUID.randomUUID().hashCode() }
      })
      t.setDaemon(true); t.start(); t
    }
    try {
      val procs = Seq(
        spawn(root, "append", 25),
        spawn(root, "vacuum", 40),
        spawn(root, "restore", 20),
        spawn(root, "read", 30))
      val deadline = System.currentTimeMillis() + 10 * 60 * 1000
      procs.zip(Seq("append", "vacuum", "restore", "read")).foreach {
        case (p, role) =>
          val remain = math.max(1000, deadline - System.currentTimeMillis())
          assert(p.waitFor(remain,
              java.util.concurrent.TimeUnit.MILLISECONDS),
            s"$role child did not finish in time")
          assert(p.exitValue() === 0, s"$role child failed")
      }
    } finally {
      stop.set(true)
      burners.foreach(_.interrupt())
    }
    // final-state invariants over the surviving snapshot
    assert(cat.currentVersion("silver", "t").isDefined)
    val rows = cat.read("silver", "t")
      .groupBy(col("proc")).agg(
        count(lit(1)).as("n"),
        count_distinct(col("seq")).as("nd"),
        max(col("seq")).as("mx"))
      .collect()
    rows.foreach { r =>
      // unique seqs per proc, and a clean prefix 0..mx (restore can only
      // truncate the tail; commitWithRetry re-derives from the new base)
      assert(r.getLong(1) === r.getLong(2), s"duplicate seq for $r")
      assert(r.getLong(3) === r.getLong(1) - 1, s"seq hole for $r")
    }
  }
}
