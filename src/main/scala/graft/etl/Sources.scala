package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** State-file and landing-zone sources (SURVEY.md §2.1).
  *
  * The reference's coordinator may read exactly four state files —
  * config.json, queue.json, visited.json, links/NNN.json
  * (crawler-coordinator.md:62,113-176) — all with fixed documented
  * shapes. Schemas here are EXPLICIT (never inferred), mirroring
  * §1.3's design decision: schema-on-read inference at 100 TB is a
  * full extra pass and a correctness hazard.
  */
object Sources {

  /** queue.json items (crawler-queue.sh:45-51). */
  val QueueSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("depth", IntegerType),
    StructField("priority", IntegerType),
    StructField("parent_id", StringType),
    StructField("anchor_text", StringType)))

  /** visited.json entries, normalized to rows (crawler-queue.sh:137-145).
    * The reference stores a url→entry map; the relational form is a row
    * per url so membership tests are anti-joins, not driver-side maps.
    */
  val VisitedSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("id", StringType),
    StructField("depth", IntegerType),
    StructField("relevance", IntegerType),
    StructField("title", StringType),
    StructField("processed_at", StringType)))

  /** links/NNN.json (extractor.md:506-522): per-page scored link array. */
  val LinksFileSchema: StructType = StructType(Seq(
    StructField("page_id", StringType),
    StructField("page_url", StringType),
    StructField("page_relevance", IntegerType),
    StructField("links", ArrayType(StructType(Seq(
      StructField("url", StringType),
      StructField("anchor_text", StringType),
      StructField("context", StringType),
      StructField("relevance_score", IntegerType)))))))

  /** config.json (crawler-coordinator.md:113-126). */
  val ConfigSchema: StructType = StructType(Seq(
    StructField("entry_url", StringType),
    StructField("topic", StringType),
    StructField("max_depth", IntegerType),
    StructField("max_pages", IntegerType),
    StructField("same_domain", BooleanType),
    StructField("domain", StringType),
    StructField("pipe", StringType),
    StructField("created_at", StringType)))

  def readQueue(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(QueueSchema).json(path)

  def readVisited(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(VisitedSchema).json(path)

  /** links files → one exploded row per link, carrying page relevance
    * (the J2 join input shape).
    */
  def readLinks(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(LinksFileSchema).json(path)
      .select(col("page_id"), col("page_url"), col("page_relevance"),
        explode(col("links")).as("l"))
      .select(col("page_id"), col("page_url"), col("page_relevance"),
        col("l.url").as("url"), col("l.anchor_text").as("anchor_text"),
        col("l.context").as("context"),
        col("l.relevance_score").as("relevance_score"))

  def readConfig(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(ConfigSchema).json(path)

  /** Landing-zone text reader (S3/S4/S5 output side): one row per file
    * with its path — pages fetched by external engines land as text and
    * enter the relational pipeline here.
    */
  def readLandingZone(spark: SparkSession, glob: String): DataFrame =
    spark.read.option("wholetext", "true").text(glob)
      .withColumn("path", input_file_name())
      .withColumnRenamed("value", "body")

  /** S2: recursive directory scan with extension whitelist and exclude
    * patterns — Spark-native: pathGlobFilter + recursiveFileLookup do
    * the enumeration on the executors; excludes are a filter on the
    * file path column (never a driver-side listing).
    */
  def scanDirectory(spark: SparkSession, root: String,
      includeExts: Seq[String] = Seq("md", "txt"),
      excludePattern: String = "/(node_modules|\\.git)/|~$|\\.lock$"): DataFrame = {
    val globs = includeExts.mkString("*.{", ",", "}")
    spark.read
      .option("pathGlobFilter", globs)
      .option("recursiveFileLookup", "true")
      .option("wholetext", "true")
      .text(root)
      .withColumn("path", input_file_name())
      .filter(!col("path").rlike(excludePattern))
      .withColumnRenamed("value", "body")
      .withColumn("size_chars", length(col("body")))
  }

  /** X8: bytes → human display (B/KB/MB) as a case expression. */
  def formatBytes(bytes: Column): Column =
    when(bytes < 1024, concat(bytes.cast("string"), lit(" B")))
      .when(bytes < 1024 * 1024,
        concat(round(bytes / 1024.0, 1).cast("string"), lit(" KB")))
      .otherwise(concat(round(bytes / (1024.0 * 1024.0), 1).cast("string"), lit(" MB")))

  /** Engine limits (config/limits.yaml mirror — constants become plan
    * literals, Catalyst constant-folds them).
    */
  case class Limits(
    maxDepth: Int = 3,            // limits.yaml:102
    maxPagesDefault: Int = 20,    // limits.yaml:103
    maxPagesHard: Int = 50,       // limits.yaml:104
    skipThreshold: Int = 5,       // limits.yaml:119
    maxCharsPerFile: Int = 20000, // limits.yaml:87
    maxSnapshotChars: Int = 30000,// limits.yaml:88
    maxTotalOutput: Int = 50000,  // limits.yaml:89
    summaryChars: Int = 500,      // limits.yaml:153
    chunkChars: Int = 1000,       // limits.yaml:166-170
    chunkOverlap: Int = 100,
    maxChunksPerFile: Int = 50,
    imageMinPx: Int = 100,        // limits.yaml:57
    imagesPerSession: Int = 15)   // limits.yaml:48

  val DefaultLimits: Limits = Limits()
}
