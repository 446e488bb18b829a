package graft.tools

import java.nio.file.Files

import graft.etl.AtomicTable

/** Measures the manifest ROOT's ceiling at extreme partition counts
  * (r12 missing #2): the two-tier split made commits O(touched blobs),
  * but every plan and commit still PARSES the whole O(partitions) root
  * (dir lists + partition zone maps + blob pointers). Years of hourly
  * partitions ≈ 50-100k entries — this tool commits a synthetic table
  * at that width and times the three operations that touch the root on
  * every query/commit: root parse (rootOpt), a ONE-partition
  * incremental commit over the wide root (steady state at scale), and
  * pruned planning's root-only partition filter. Pure metadata — no
  * data files are written; absent dirs read as zero-count, which is
  * irrelevant to the parse/render numbers being measured.
  *
  * Usage: runMain graft.tools.RootScaleBench [nPartitions] (default
  * 100000). Prints one JSON line; record it in BASELINE.md. If parse or
  * steady-state commit exceeds ~1 s, shard the root (manifest-list of
  * roots — the blob tier already proves the pattern).
  */
object RootScaleBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val dir = Files.createTempDirectory("graft-rootscale")

    def timeMs[A](f: => A): (Long, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1000000L, a)
    }

    // one wide commit: n partitions, each with one dir and a zone map
    // (the root shape a long-lived hourly table converges to)
    val written = (0 until n).map { i =>
      f"p$i%06d" -> Seq(f"data/txn-seed/p=p$i%06d")
    }.toMap
    val stats = (0 until n).map { i =>
      f"p$i%06d" -> AtomicTable.PartStats(1000L,
        Map("k" -> (i * 1000L).toString),
        Map("k" -> (i * 1000L + 999L).toString))
    }.toMap
    val (seedMs, _) = timeMs(AtomicTable.commitManifest(dir, written,
      newStats = stats, retain = 2, operation = "seed"))

    // the numbers that bound every query and every later commit.
    // Cold parse carries JIT warm-up; the warm minimum is what a
    // long-lived driver pays per plan.
    val (parseMs, root) = timeMs(AtomicTable.rootOpt(dir).get)
    val parseWarmMs = (1 to 5).map(_ =>
      timeMs(AtomicTable.rootOpt(dir).get)._1).min
    require(root.partitions.size == n)
    val (commit1Ms, _) = timeMs(AtomicTable.commitManifest(dir,
      Map(f"p${n / 2}%06d" -> Seq("data/txn-one/p=mid")),
      newStats = Map(f"p${n / 2}%06d" -> AtomicTable.PartStats(10L,
        Map("k" -> "1"), Map("k" -> "2"))),
      retain = 2, operation = "steady"))
    // root-only pruning pass (the planning tier): admit ~1% by zone map
    val lo = (n / 2) * 1000L
    val hi = lo + (n / 100) * 1000L
    val (pruneMs, kept) = timeMs(root.partitions.keysIterator.count { p =>
      root.stats.get(p).exists(s =>
        s.mins("k").toLong <= hi && s.maxs("k").toLong >= lo)
    })
    val rootFile = dir.resolve("_manifests")
      .resolve(s"v${root.version}.json")
    val sizeBytes = Files.size(rootFile)

    println(s"""{"metric":"root_scale","n_partitions":$n,""" +
      s""""seed_commit_ms":$seedMs,"root_parse_ms":$parseMs,""" +
      s""""root_parse_warm_ms":$parseWarmMs,""" +
      s""""steady_commit_ms":$commit1Ms,"prune_pass_ms":$pruneMs,""" +
      s""""admitted":$kept,"root_bytes":$sizeBytes}""")
  }
}
