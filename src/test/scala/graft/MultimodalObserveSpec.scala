package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.{Multimodal, Observability}

class MultimodalObserveSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("frameSample emits bounded, in-payload slices") {
    val assets = Multimodal.assetTable(spark, dir).limit(50)
    val frames = Multimodal.frameSample(assets, col("payload"), 4)
      .select(col("asset_id"), col("frame_idx"), col("frame_off"),
        length(col("frame")).as("flen"))
      .as[(Long, Int, Int, Int)].collect()
    assert(frames.nonEmpty)
    val byAsset = frames.groupBy(_._1)
    byAsset.values.foreach { fs =>
      assert(fs.length <= 4)
      assert(fs.map(_._2).sorted.toSeq == (0 until fs.length))
      assert(fs.forall(_._4 >= 0))
    }
    // empty payloads produce no frames
    val emptyIds = spark.read.parquet(s"$dir/documents.parquet")
      .filter(length(coalesce(col("text"), lit(""))) === 0 && col("doc_id") < 50)
      .select("doc_id").as[Long].collect().toSet
    assert(emptyIds.forall(id => !byAsset.contains(id)))
  }

  test("observe() metrics accumulate during the normal pass (A10)") {
    val docs = Observability.withDocStats(
      spark.read.parquet(s"$dir/documents.parquet"))
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    docs.collect() // same QueryExecution instance; count() shortcuts via metadata
    val m = docs.queryExecution.observedMetrics("graft_stats")
    assert(m.getAs[Long]("docs_seen") == n)
    assert(m.getAs[Long]("chars_total") > 0)
    assert(m.getAs[Long]("docs_empty") >= 0)
  }
}
