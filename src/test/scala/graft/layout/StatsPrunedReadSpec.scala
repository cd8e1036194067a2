package graft.layout

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The stats-pruned reader must (a) measure per-file min/max from the
  * files themselves, (b) cut the file list to exactly the
  * band-intersecting files, and (c) lose no matching row vs the full
  * scan — measured with input_file_name(), not trusted from the plan.
  */
class StatsPrunedReadSpec extends SparkTestBase {
  import spark.implicits._

  test("prunes to the intersecting files and loses nothing") {
    graft.tools.Scratch.withDir("graft_spr_spec") { dir =>
      // 8 flat files with disjoint known k-bands: file f holds k in
      // [100f, 100f+99] (staged per-file write, part file moved up so
      // the directory is a plain flat parquet table)
      (0 until 8).foreach { f =>
        val stage = s"$dir/_stage$f"
        (0 until 100).map(i => (f * 100L + i, s"v$f-$i"))
          .toDF("k", "payload")
          .coalesce(1).write.parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(s"$dir/f$f.parquet"))
        graft.tools.Scratch.deleteRecursively(new java.io.File(stage))
      }
      val stats = StatsPrunedRead.fileStats(spark, dir, Seq("k"))
      assert(stats.count() == 8)
      val sRows = stats.collect()
      assert(sRows.forall(_.getLong(1) == 100L)) // n_rows per file
      // band [250, 449] intersects files 2, 3, 4 only
      val intersects = col("min_k") <= 449L && col("max_k") >= 250L
      assert(StatsPrunedRead.pruneFiles(stats, intersects).size == 3)
      val pruned = StatsPrunedRead.readPruned(spark, stats, intersects)
      val touched = pruned.select(input_file_name().as("f"))
        .distinct().count()
      assert(touched == 3, s"expected 3 files actually read, got $touched")
      val got = pruned.filter(col("k").between(250L, 449L))
        .select("k", "payload").as[(Long, String)].collect().toSet
      val full = spark.read.parquet(dir)
        .filter(col("k").between(250L, 449L))
        .select("k", "payload").as[(Long, String)].collect().toSet
      assert(got == full && full.size == 200)
    }
  }

  test("refreshStats scans ONLY new files and drops vanished ones") {
    graft.tools.Scratch.withDir("graft_spr_refresh") { dir =>
      def writeFile(f: Int): Unit = {
        val stage = s"$dir/_stage$f"
        (0 until 50).map(i => (f * 100L + i, s"v$f-$i")).toDF("k", "payload")
          .coalesce(1).write.parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(s"$dir/f$f.parquet"))
        graft.tools.Scratch.deleteRecursively(new java.io.File(stage))
      }
      (0 until 3).foreach(writeFile)
      val stats0 = StatsPrunedRead.fileStats(spark, dir, Seq("k"))
        .localCheckpoint()
      assert(stats0.count() == 3)
      // append two files, delete one — refresh must scan exactly the
      // two new ones and drop the vanished row
      (3 until 5).foreach(writeFile)
      assert(new java.io.File(s"$dir/f0.parquet").delete())
      val (stats1, scanned) =
        StatsPrunedRead.refreshStats(spark, dir, stats0, Seq("k"))
      assert(scanned == 2, s"expected 2 new files scanned, got $scanned")
      val rows = stats1.orderBy("min_k").collect()
      assert(rows.length == 4) // f1..f4
      assert(rows.map(_.getLong(2)).toSeq == Seq(100L, 200L, 300L, 400L))
      // refreshed stats serve pruned reads exactly like fresh ones
      val pruned = StatsPrunedRead.readPruned(spark, stats1,
        col("min_k") <= 349L && col("max_k") >= 200L)
      assert(pruned.select(input_file_name()).distinct().count() == 2)
      // and a second refresh with nothing new scans nothing
      val (_, zero) = StatsPrunedRead.refreshStats(spark, dir, stats1, Seq("k"))
      assert(zero == 0)
    }
  }

  test("empty intersection degrades to an empty result with the data schema") {
    graft.tools.Scratch.withDir("graft_spr_empty") { base =>
      val dir = s"$base/t"
      Seq((1L, "a"), (2L, "b")).toDF("k", "payload")
        .coalesce(1).write.parquet(dir)
      val stats = StatsPrunedRead.fileStats(spark, dir, Seq("k"))
      val none = StatsPrunedRead.readPruned(spark, stats, col("min_k") > 100L)
      assert(none.columns.toSeq == Seq("k", "payload"))
      assert(none.count() == 0)
    }
  }
}
