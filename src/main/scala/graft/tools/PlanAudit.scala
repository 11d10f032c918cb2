package graft.tools
import org.apache.spark.sql.SparkSession
/** Physical-plan audit helper: prints executedPlan for the named gate
  * queries (all of them when no args) against a testdata dir — the
  * `.explain`-and-iterate loop the scale mandate requires, one command.
  * Usage: runMain graft.tools.PlanAudit [sfDir] [q1,q2,...] */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .appName("plan-audit")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val qs = if (args.length > 1) args(1).split(",").toSeq
             else graft.SparkEntry.queries.keys.toSeq.sorted
    for (q <- qs) {
      println(s"===== $q =====")
      val df = graft.SparkEntry.queries(q)(spark, dir)
      println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
