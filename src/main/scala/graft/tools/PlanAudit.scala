package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev audit: dump formatted physical plans for the registered queries and
  * flag scans that read more columns than they should or miss pushed
  * filters. Usage: runMain graft.tools.PlanAudit [queryName ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val full = args.contains("-full")
    val rest = args.toSeq.filterNot(_ == "-full")
    val names = if (rest.nonEmpty) rest else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(FormattedMode)
      println(s"===== $name =====")
      if (full) println(plan)
      // scan lines: ReadSchema + PushedFilters
      plan.linesIterator.foreach { l =>
        val t = l.trim
        if (t.startsWith("ReadSchema") || t.startsWith("PushedFilters") ||
          t.startsWith("Location") && false || t.contains("Scan parquet"))
          println("  " + t.take(200))
      }
      val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).length
      val nSMJ = "SortMergeJoin".r.findAllIn(plan).length
      val nExchange = "Exchange".r.findAllIn(plan).length
      val nCodegen = "WholeStageCodegen".r.findAllIn(plan).length
      println(s"  joins: broadcast=$nBroadcast sortmerge=$nSMJ exchanges=$nExchange codegenSpans=$nCodegen")
    }
    spark.stop()
  }
}
