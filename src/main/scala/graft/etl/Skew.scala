package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Skew-handling patterns (builder brief: "salting for skew, AQE for
  * runtime re-plan").
  *
  * `saltedAgg` is the classic two-phase aggregation: key is salted into
  * S shards, partially aggregated per (key, salt), then finally
  * aggregated per key. For a hot key this turns one straggler reducer
  * into S parallel ones. Results are EXACT (integer cents sums are
  * associative), so the query is oracle-checked against the plain
  * single-phase SQL — proving the rewrite is semantics-preserving.
  *
  * Salt derivation must be deterministic here (oracle!): orderkey % S.
  * In production use a random salt (`floor(rand()*S)`) — distribution
  * matters, determinism doesn't.
  */
object Skew {

  val Salts = 16

  def saltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val partial = Tables.lineitem(spark, dir)
      .withColumn("salt", (col("l_orderkey") % Salts).cast("int"))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(sum(Relational.cents(col("l_extendedprice"))).as("cents"),
        count(lit(1)).as("n"))
    partial
      .groupBy(col("l_returnflag"))
      .agg((sum(col("cents")) / lit(100.0)).as("total_price"),
        sum(col("n")).as("n_items"))
      .orderBy("l_returnflag")
  }

  /** Join/shuffle-key health audit — the MEASUREMENT leg of the skew
    * story ([[saltedAgg]] is the static fix, the AQE PlanSpec test the
    * runtime fix; this tells you whether you need either): per
    * candidate shuffle key, the exact key-count distribution summary —
    * rows, distinct keys, max single-key count, and the hot-key skew
    * factor max·keys/rows in basis points (10000 = perfectly uniform;
    * a 64-partition shuffle stalls once one key's share nears a
    * partition's worth). Two keyed aggs per audited column, partial
    * combined; the audited columns are the repo's real join keys.
    */
  def joinSkewReport(spark: SparkSession, dir: String): DataFrame = {
    def audit(df: DataFrame, keyName: String, k: Column): DataFrame =
      df.select(k.cast("string").as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("cnt"))
        .agg(sum(col("cnt")).as("n_rows"),
          count(lit(1)).as("n_keys"),
          max(col("cnt")).as("max_key_rows"))
        .select(lit(keyName).as("join_key"), col("n_rows"), col("n_keys"),
          col("max_key_rows"),
          expr("(10000 * max_key_rows * n_keys) div n_rows").as("skew_bp"))
    audit(Tables.lineitem(spark, dir), "lineitem.l_orderkey", col("l_orderkey"))
      .unionByName(audit(Tables.orders(spark, dir), "orders.o_custkey",
        col("o_custkey")))
      .unionByName(audit(keyStream(spark, dir), "derived.hot_tail", col("k")))
      .orderBy("join_key")
  }

  /** Sketch capacity and the heavy-hitter threshold divisor. The
    * exactness proof needs Hitters <= Capacity + 1: any key with
    * count > N/Hitters >= N/(Capacity+1) is guaranteed into the
    * Misra-Gries candidate set, so recount+filter equals the exact
    * answer STRUCTURALLY — not because of anything in the data.
    */
  val Capacity = 32
  val Hitters = 16

  /** The deterministic hot-key + long-tail key stream (shared with the
    * streaming twin's stream==batch test): derived from lineitem the
    * way Urls.linkCorpus derives its corpus — even order keys collapse
    * onto 4 hot keys (~12.5% of the stream each), odd rows stay unique
    * tail, the URL/n-gram/user-id shape that makes a raw GROUP BY
    * reducer-state-bound at 100 TB.
    */
  def keyStream(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select(
      when(col("l_orderkey") % 2 === 0,
        concat(lit("hot_"), (col("l_orderkey") % 8).cast("string")))
        .otherwise(concat(lit("cold_"), col("l_orderkey").cast("string"),
          lit("_"), col("l_linenumber").cast("string"))).as("k"))

  /** Heavy hitters over the hot-key + long-tail stream via the two-pass
    * sketch-then-recount pattern ([[graft.functions.MisraGries]]):
    * pass 1 folds the stream into 32-entry per-partition summaries and
    * merges them (partial-agg combine — bounded state no matter the key
    * cardinality); pass 2 recounts ONLY the candidates (broadcast semi
    * join, then a keyed agg over the few surviving keys) and filters
    * count*16 > N.
    */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Encoders
    val stream = keyStream(spark, dir)
    val mg = new graft.functions.MisraGries(Capacity).toColumn
    val cands = stream.select(col("k")).as[String](Encoders.STRING)
      .select(mg.name("cands"))
      .select(explode(col("cands")).as("k"))
    val total = stream.agg(count(lit(1)).as("n"))
    stream.join(broadcast(cands), Seq("k"), "left_semi")
      .groupBy(col("k")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * Hitters > col("n"))
      .select(col("k"), col("cnt"),
        expr("(10000 * cnt) div n").as("share_bp"))
      .orderBy(col("cnt").desc, col("k"))
  }
}
