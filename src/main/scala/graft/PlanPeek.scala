package graft
import org.apache.spark.sql.SparkSession
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().withExtensions(new GraftExtensions)
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args.drop(1))
      println(s"==== $q ====\n" + SparkEntry.queries(q)(spark, args(0))
        .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode))
  }
}
