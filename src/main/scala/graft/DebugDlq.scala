package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DebugDlq {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val raw = graft.cdc.Fixture.ordersCdcEvents(spark, "/root/testdata/sf0.1")
    println("events=" + raw.count())
    val routed = raw.withColumn("table_name",
      graft.cdc.Envelope.route(col("topic"))).persist()
    routed.count()
    val parsed = graft.cdc.Envelope.parse(
        routed.filter(col("table_name").isin("orders_t0")),
        graft.cdc.Fixture.rowSchema)
      .withColumn("_wf", graft.cdc.Envelope.isWellFormed.cast("int")).persist()
    parsed.count()
    def t(name: String)(f: => Any): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val r = f
      println(f"$name run$i ${(System.nanoTime() - t0) / 1e9}%.3f s -> $r")
    }
    t("unroutable.isEmpty") {
      routed.filter(col("table_name") === "")
        .select(col("value").cast("string")).isEmpty }
    t("malformed.isEmpty") {
      parsed.filter(col("_wf") === 0)
        .select(col("value").cast("string")).isEmpty }
    t("malformed.count") { parsed.filter(col("_wf") === 0).count() }
    t("wfsum") { parsed.agg(sum(col("_wf"))).collect()(0) }
    val union = parsed.filter(col("_wf") === 0)
      .select(col("value").cast("string").as("payload_json"))
      .unionByName(routed.filter(col("table_name") === "")
        .select(col("value").cast("string").as("payload_json")))
    t("union.isEmpty") { union.isEmpty }
    spark.stop()
  }
}
