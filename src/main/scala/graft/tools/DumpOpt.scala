package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: dump the OPTIMIZED LOGICAL plan of a graded query (the
  * shape optimizer rules must pattern-match). */
object DumpOpt {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.sql.session.timeZone", "UTC").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args(0)
    val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    // scalastyle:off println
    println(df.queryExecution.optimizedPlan.treeString)
    println("---- executed ----")
    println(df.queryExecution.executedPlan.treeString)
    // scalastyle:on println
    spark.stop()
  }
}
