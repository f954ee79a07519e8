package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic ~N× scale-up of the heavy-family input tables
  * (documents, embeddings, customer) from an existing SF dir — the
  * generator behind BASELINE.md's "10× data → ~10× time" evidence
  * table. Copy c re-keys ids by +c·(max id+1) and makes the TEXT
  * content disjoint across copies (every document word suffixed `_c`,
  * customer names prefixed `c<c>_` ahead of the 17-char block prefix)
  * so duplicate DENSITY, LSH bucket occupancy, and edit-distance block
  * sizes are all preserved rather than multiplied — this scales the
  * data, not the quadratic structure, which is what an honest
  * throughput scaling measurement requires. Embeddings keep their
  * float payloads (clones tie-break by vec_id; queries/centroids stay
  * the copy-0 slices, so IVF lists grow ×N while the probe set stays
  * fixed — the production shape).
  *
  * Usage: runMain graft.ScaleData <srcDir> <outDir> [factor=10]
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val src = args(0); val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val copies = explode(sequence(lit(0), lit(factor - 1))).as("c")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val nDoc = docs.agg(max("doc_id")).head.getLong(0) + 1
    docs.select(col("*"), copies)
      .select(
        (col("doc_id") + col("c") * nDoc).as("doc_id"),
        when(col("c") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1_"), col("c")))).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val embs = spark.read.parquet(s"$src/embeddings.parquet")
    val nVec = embs.agg(max("vec_id")).head.getLong(0) + 1
    embs.select(col("*"), copies)
      .select((col("vec_id") + col("c") * nVec).as("vec_id"),
        col("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val cust = spark.read.parquet(s"$src/customer.parquet")
    val nCust = cust.agg(max("c_custkey")).head.getLong(0) + 1
    cust.select(col("*"), copies)
      .withColumn("c_custkey", col("c_custkey") + col("c") * nCust)
      .withColumn("c_name",
        when(col("c") === 0, col("c_name"))
          .otherwise(concat(lit("c"), col("c"), lit("_"), col("c_name"))))
      .drop("c")
      .write.mode("overwrite").parquet(s"$out/customer.parquet")

    println(s"[scaledata] wrote ${factor}x documents/embeddings/customer to $out")
    spark.stop()
  }
}
