package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Plan-inspection helper: writes the FormattedMode physical plan of
  * one SparkEntry query (at sf0.001) to a file, for iterating on
  * PlanSpec pins without driving a whole suite.
  *
  *   runMain graft.DumpPlan <queryName> <outFile>
  */
object DumpPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().withExtensions(new GraftExtensions)
      .master("local[4]").config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // planOnly: eager operators (reliable-checkpoint finishers) show
    // their full lazy twin instead of a checkpoint-scan leaf — the
    // same view PlanSpec pins read. "quality_train_loopbody" is the
    // trainer's one-round update frame (VERDICT r18 item 5: the
    // artifact queries' own dumps only show the memoized artifact
    // scan, so the loop body gets its own lazy twin).
    val p = graft.etl.Fixpoint.planOnly {
      val df =
        if (args(0) == "quality_train_loopbody")
          graft.etl.QualityTrain.loopBodyForPlan(spark, "/root/testdata/sf0.001")
        else SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001")
      df.queryExecution.explainString(FormattedMode)
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(args(1)), p)
    spark.stop()
  }
}
