package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming form of the crawl fixpoint (SURVEY.md §2.11): the frontier
  * is a WATCHED DIRECTORY (the queue), each micro-batch expands one
  * frontier slice against the edge table and — via foreachBatch —
  * writes the next slice back into the watched directory. The stream
  * literally feeds itself until the frontier drains, which is exactly
  * the reference's queue-driven loop with Spark supplying incremental
  * execution, rate limiting (maxFilesPerTrigger / Trigger), and
  * restartable state (checkpointed visited output).
  *
  * The visited set is maintained as the accumulated output of processed
  * batches; dedup against it uses a left-anti join per batch (J1), with
  * the graph's monotone depth guard bounding re-expansion.
  */
object StreamingCrawl {

  /** Run the self-feeding crawl until the frontier drains; returns the
    * visited (node, depth) table. `edges` must have (src, dst) columns;
    * expansion prunes by relevance (dst % 11 >= threshold) and depth.
    */
  def run(spark: SparkSession, edges: DataFrame, workDir: String,
      maxDepth: Int = 3, threshold: Int = 5): DataFrame = {
    import spark.implicits._
    val frontierDir = s"$workDir/frontier"
    val visitedDir = s"$workDir/visited"
    Files.createDirectories(Paths.get(frontierDir))
    Files.createDirectories(Paths.get(visitedDir))
    // seed: level 0 = node 0
    Seq((0L, 0)).toDF("node", "depth")
      .write.mode("overwrite").parquet(s"$frontierDir/seed")
    val e = edges.persist()
    e.count()

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("depth",
        org.apache.spark.sql.types.IntegerType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "8") // the crawl rate limit
      .parquet(s"$frontierDir/*")

    val query = stream.writeStream
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation", s"$workDir/ckpt")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val sp = batch.sparkSession
        // visited so far = everything already emitted; only the
        // nothing-written-yet case (no matching files) may degrade to
        // empty — any other failure must surface, or dedup silently
        // turns off and every batch re-expands the whole graph
        val visited = try sp.read.parquet(s"$visitedDir/*")
          catch {
            // structured error classes, not message text
            case e: org.apache.spark.sql.AnalysisException
                if Option(e.getCondition).exists(c =>
                  c == "PATH_NOT_FOUND" || c == "UNABLE_TO_INFER_SCHEMA") =>
              sp.emptyDataFrame
          }
        val newlyVisited =
          if (visited.columns.contains("node"))
            batch.join(visited.select("node"), Seq("node"), "left_anti")
          else batch
        val level = newlyVisited.persist()
        if (!level.isEmpty) {
          // overwrite, not append: replay of a batch after restart must
          // be idempotent (append into the same b$id dir would duplicate)
          level.write.mode("overwrite").parquet(s"$visitedDir/b$id")
          // next slice: expand, prune, depth = parent depth + 1
          val nextLevel = e
            .join(broadcast(level.filter(col("depth") < maxDepth)
              .select(col("node").as("src"), col("depth"))), Seq("src"))
            .filter(col("dst") % 11 >= threshold)
            .groupBy(col("dst"))
            .agg((min(col("depth")) + 1).cast("int").as("depth"))
            .select(col("dst").as("node"), col("depth"))
          if (!nextLevel.isEmpty)
            nextLevel.write.mode("overwrite").parquet(s"$frontierDir/next_$id")
        }
        level.unpersist()
        ()
      }
      .start()
    // drain: process until no new frontier files appear
    def frontierEntries(): Long = {
      val s = Files.list(Paths.get(frontierDir))
      try s.count() finally s.close() // Files.list holds an open fd
    }
    var stable = 0
    while (stable < 3) {
      query.processAllAvailable()
      val before = frontierEntries()
      query.processAllAvailable()
      val after = frontierEntries()
      if (after == before) stable += 1 else stable = 0
    }
    query.stop()
    // the crawl state lives in the visited parquet files — release the
    // edge cache before returning (round-10 lifecycle: no pinned
    // blocks outlive the operator)
    e.unpersist(blocking = false)
    spark.read.parquet(s"$visitedDir/*")
      .groupBy(col("node")).agg(min(col("depth")).as("depth"))
      .orderBy("node")
  }
}
