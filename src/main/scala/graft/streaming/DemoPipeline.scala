package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.DecimalType

import graft.operators.{Enrich, SinkPolicy}
import graft.storage.TieredTable

/** The whole reference workload (/root/reference/README.md:104-318),
  * Spark-native: five tiered tables, streaming ingest, a processing-time
  * temporal-join enrichment pipeline, and a continuously-maintained
  * revenue aggregation — each micro-batch also tiers hot→cold, playing
  * the reference's lake tiering service (docker-compose.yml:94-111).
  *
  * Semantics preserved:
  *  - temporal join is against the dim PK-state *as of batch start* and
  *    never retracts emitted rows (README.md:236-238; SURVEY §7 hard-part 3)
  *  - NOT NULL sink policy DROP on every sink (sql-client.sql:50)
  *  - revenue is an update-mode changelog merged into a PK table
  *    (README.md:247-250; SURVEY §7 hard-part 5)
  *  - every sink commit is tagged with the micro-batch id → replays after
  *    a crash are no-ops (exactly-once; SURVEY §7 hard-part 1)
  */
class DemoPipeline(spark: SparkSession, baseDir: String) {
  private val M = DecimalType(15, 2)

  val customer = TieredTable(spark, s"$baseDir/fluss_customer", pk = Seq("cust_key"))
  val nation   = TieredTable(spark, s"$baseDir/fluss_nation",   pk = Seq("nation_key"))
  val orders   = TieredTable(spark, s"$baseDir/fluss_order")
  val enriched = TieredTable(spark, s"$baseDir/enriched_orders")
  val revenue  = TieredTable(spark, s"$baseDir/nation_revenue", pk = Seq("nation_name"))

  /** Bounded dim ingest (README.md:213-214): upsert into PK tables;
    * NOT NULL keys enforced by DROP.
    */
  def loadDims(nCustomer: Long = 200, nNation: Long = 100): Unit = {
    // src_seq = arrival order: the faker stream's last row per key wins
    customer.commitUpsert(SinkPolicy.enforceNotNull(
      Datagen.sourceCustomer(spark, nCustomer), Seq("cust_key")),
      versionOrder = Seq(col("src_seq").desc))
    nation.commitUpsert(SinkPolicy.enforceNotNull(
      Datagen.sourceNation(spark, nNation), Seq("nation_key")),
      versionOrder = Seq(col("src_seq").desc))
  }

  /** Streaming order ingest (README.md:215): append-only log table. */
  def startIngest(source: DataFrame, checkpoint: String,
                  trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    source.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        orders.appendLog(batch, tag = Some(s"ingest-$batchId"))
        (): Unit
      }
      .trigger(trigger)
      .option("checkpointLocation", s"$checkpoint/ingest")
      .start()

  /** The enrichment micro-batch body (processing-time temporal join,
    * README.md:222-239): order batch ⟕ latest customer ⟕ latest nation,
    * project + alias, stamp ingest_ts, drop null keys, append to the
    * datalake table, tier within the same trigger (freshness = trigger
    * period, README.md:190).
    */
  def enrichBatch(batch: DataFrame, batchId: Long): Unit = {
    // dim state resolved AT BATCH START — emitted rows never retract
    val cust = customer.readCold().select(
      col("cust_key"), col("name").as("cust_name"),
      col("phone").as("cust_phone"), col("nation_key"),
      col("acctbal").as("cust_acctbal"),
      col("mktsegment").as("cust_mktsegment"))
    val nat = nation.readCold().select(
      col("nation_key"), col("name").as("nation_name"))
    val e = Enrich.lookupJoin2(batch, cust, "cust_key", nat, "nation_key")
      .withColumn("ingest_ts", current_timestamp())
      .select(col("order_key"), col("cust_key"),
        col("total_price").cast(M).as("total_price"),
        col("order_date"), col("order_priority"), col("clerk"),
        col("cust_name"), col("cust_phone"),
        col("cust_acctbal").cast(M).as("cust_acctbal"),
        col("cust_mktsegment"), col("nation_name"), col("ingest_ts"))
    // enriched_orders declares cust_key NOT NULL (README.md:177) → DROP
    val clean = SinkPolicy.enforceNotNull(e, Seq("cust_key"))
    enriched.appendLog(clean, tag = Some(s"enrich-$batchId"))
    enriched.tier()
  }

  /** Continuous enrichment (README.md:222-239 INSERT INTO SELECT). */
  def startEnrichment(source: DataFrame, checkpoint: String,
                      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    source.writeStream
      .foreachBatch { (b: DataFrame, id: Long) => enrichBatch(b, id) }
      .trigger(trigger)
      .option("checkpointLocation", s"$checkpoint/enrich")
      .start()

  /** Continuously-maintained revenue (README.md:247-250): streaming read
    * of the enriched log, keyed SUM in update mode, each update upserted
    * into the nation_revenue PK table. Partial (map-side) aggregation and
    * the keyed state store are Spark-native; state is small (≤ #nations).
    */
  def startRevenue(checkpoint: String,
                   trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery = {
    val schema = enriched.readCold().schema // requires ≥1 enriched commit
    enriched.readStreamLog(schema)
      .groupBy(col("nation_name"))
      // keep the widened DECIMAL(25,2) the sum produces: narrowing back
      // to (15,2) would silently overflow a large nation's cumulative
      // revenue to NULL (non-ANSI cast) at exactly the scale that
      // matters; (25,2) is also the reference's nation_revenue type
      .agg(sum(col("total_price")).cast(DecimalType(25, 2)).as("revenue"))
      .writeStream
      .outputMode("update")
      .foreachBatch { (b: DataFrame, id: Long) =>
        revenue.commitUpsert(
          SinkPolicy.enforceNotNull(b, Seq("nation_name")),
          tag = Some(s"revenue-$id"))
        (): Unit
      }
      .trigger(trigger)
      .option("checkpointLocation", s"$checkpoint/revenue")
      .start()
  }

  /** Batch top-k over the continuously-maintained aggregate
    * (README.md:280-283).
    */
  def topNations(k: Int = 5): DataFrame =
    revenue.readCold()
      .orderBy(col("revenue").desc, col("nation_name"))
      .limit(k)
}
