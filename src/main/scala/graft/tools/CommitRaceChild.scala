package graft.tools

import java.nio.file.{Files, Paths}

import graft.etl.AtomicTable

/** Second-JVM driver for CrossProcessCommitSpec: performs `n` AtomicTable
  * commits against a table root OWNED BY ANOTHER OS PROCESS (the test
  * JVM), each staging a marker data dir and then running the full
  * [[AtomicTable.commitManifest]] claim loop. The in-JVM commit lock is
  * useless across the process boundary — every guarantee exercised here
  * rests on the POSIX link(2) create-new version claim alone. No Spark
  * session: the race under test is the metadata commit protocol, and
  * keeping the child JVM light lets the spec fork real processes in
  * seconds. Usage: CommitRaceChild <tableRoot> <tag> <nCommits> <retain>
  */
object CommitRaceChild {
  def main(args: Array[String]): Unit = {
    val Array(table, tag, nStr, retainStr) = args.take(4)
    val n = nStr.toInt
    val retain = retainStr.toInt
    val root = Paths.get(table)
    try {
      for (k <- 1 to n) {
        val part = s"${tag}_$k"
        val dir = root.resolve("data").resolve(s"txn-$tag-$k").resolve(s"part=$part")
        Files.createDirectories(dir)
        Files.writeString(dir.resolve("marker.parquet"), s"$tag $k")
        AtomicTable.commitManifest(root,
          written = Map(part -> Seq(s"data/txn-$tag-$k/part=$part")),
          properties = Map(s"last_$tag" -> k.toString),
          retain = retain)
        ()
      }
      println(s"DONE $tag")
    } catch {
      case t: Throwable =>
        t.printStackTrace()
        sys.exit(1)
    }
  }
}
