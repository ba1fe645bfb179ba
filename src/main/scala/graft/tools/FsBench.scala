package graft.tools
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
object FsBench {
  def main(args: Array[String]): Unit = {
    val conf = new Configuration()
    if (args.contains("nio"))
      conf.set("fs.file.impl", "graft.streaming.NioLocalFileSystem")
    val dir = new HPath("file:///dev/shm/graft_fsbench")
    val fs = FileSystem.get(dir.toUri, conf)
    fs.mkdirs(dir)
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[fsb] $tag ${(System.nanoTime() - t0) / 1e6}%.1f ms")
    }
    time("create+write+close x20") {
      for (i <- 1 to 20) {
        val o = fs.create(new HPath(dir, s"f$i"), true)
        o.write(42); o.close()
      }
    }
    time("getFileStatus x20") {
      for (i <- 1 to 20) fs.getFileStatus(new HPath(dir, s"f$i"))
    }
    time("listStatus x20") { for (_ <- 1 to 20) fs.listStatus(dir) }
    time("rename x20") {
      for (i <- 1 to 20)
        fs.rename(new HPath(dir, s"f$i"), new HPath(dir, s"g$i"))
    }
    time("delete x20") {
      for (i <- 1 to 20) fs.delete(new HPath(dir, s"g$i"), false)
    }
    fs.delete(dir, true)
  }
}
