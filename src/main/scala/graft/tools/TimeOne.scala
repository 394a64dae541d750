package graft.tools
import org.apache.spark.sql.SparkSession
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.sql.session.timeZone", "UTC").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    args.foreach { name =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.1").count()
      println(f"[time] $name: ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
      val t1 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.1").count()
      println(f"[time] $name (2nd): ${(System.nanoTime()-t1)/1e9}%.2f s")
    }
    spark.stop()
  }
}
