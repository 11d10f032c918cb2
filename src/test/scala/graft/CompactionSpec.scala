package graft

import org.apache.spark.sql.functions._
import graft.sources.BatchIngest

class CompactionSpec extends SparkSpecBase {
  import spark.implicits._

  test("compaction rewrites many small files into few, preserving rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val df = spark.read.parquet(sf() + "/lineitem.parquet")
    df.repartition(24).write.parquet(s"$dir/t") // 24 small files
    val before = spark.read.parquet(s"$dir/t")
    val beforeFiles = before.inputFiles.length
    val beforeRows = before.count()
    BatchIngest.compact(spark, s"$dir/t")
    val after = spark.read.parquet(s"$dir/t")
    assert(after.count() == beforeRows)
    assert(after.inputFiles.length < beforeFiles)
    assert(after.inputFiles.length <= 2)
  }

  test("segments view reports per-file rows, size, and time interval") {
    val segs = BatchIngest.segments(spark, sf() + "/lineitem.parquet", "l_shipdate")
      .collect()
    assert(segs.nonEmpty)
    val total = segs.map(_.getAs[Long]("num_rows")).sum
    assert(total == spark.read.parquet(sf() + "/lineitem.parquet").count())
    assert(segs.forall(_.getAs[Long]("size_bytes") > 0))
    segs.foreach { r =>
      // timestamp_ntz surfaces as LocalDateTime
      val start = r.getAs[java.time.LocalDateTime]("interval_start")
      val end = r.getAs[java.time.LocalDateTime]("interval_end")
      assert(!start.isAfter(end))
    }
  }
}
