package graft.streaming

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.types.StructType

/** Connect/Debezium connector-declaration loader — the reference's
  * pipeline semantics live in `register-*.json` files POSTed to the
  * Connect REST API (register-postgres-sink.json,
  * register-mysql-connector.json); a user switching engines hands over
  * the SAME files and this maps each declared semantic onto its native
  * equivalent:
  *
  *   - `topics` / `topic.prefix`+`table.include.list` → the Kafka
  *     subscription ([[graft.sources.KafkaCdc.subscribeOptions]])
  *   - `max.buffered.records` → `maxOffsetsPerTrigger` backpressure cap
  *   - `linger.ms` → [[CdcPipeline.Config.triggerMs]] micro-batch cadence
  *   - `transforms` unwrap/route → [[graft.cdc.Envelope.unwrap]] /
  *     [[graft.cdc.Envelope.route]] (the route regex is validated, not
  *     re-implemented: [[Sink.tableNames]] applies the DECLARED
  *     RegexRouter rewrite so callers can cross-check the engine's
  *     router against the declaration)
  *   - `insert.mode=upsert` + `pk.mode=record_key` +
  *     `delete.enabled` → the versioned keyed merge (the engine's only
  *     mode — a declaration asking for anything else fails loudly
  *     instead of silently changing semantics)
  *   - `errors.tolerance=all` + `errors.deadletterqueue.topic.name` →
  *     the DLQ split ([[CdcPipeline.Config.dlqDir]])
  *   - `auto.evolve` → additive schema evolution (always on)
  *
  * Row schemas and primary-key columns are NOT in these files (Connect
  * reads them from the database / schema registry) — the caller
  * supplies them, exactly as the reference supplies a live database.
  */
object ConnectorConfig {

  private val mapper = new ObjectMapper()

  private def cfgNode(json: String): (String, JsonNode) = {
    val root = mapper.readTree(json)
    val cfg = root.path("config")
    require(!cfg.isMissingNode, "not a Connect connector declaration: no `config`")
    (root.path("name").asText(""), cfg)
  }

  private def opt(cfg: JsonNode, key: String): Option[String] = {
    val n = cfg.path(key)
    if (n.isMissingNode || n.isNull) None else Some(n.asText())
  }

  /** A parsed sink declaration (the JDBC-sink shape the reference
    * uses; field names are the public Connect/JDBC-sink config keys). */
  final case class Sink(
      name: String,
      topics: Seq[String],
      triggerMs: Long,
      maxBufferedRecords: Long,
      dlqTopic: Option[String],
      tolerateAllErrors: Boolean,
      autoEvolve: Boolean,
      routeRegex: Option[String],
      routeReplacement: Option[String]) {

    /** Destination table per subscribed topic, by the DECLARED
      * RegexRouter rewrite (`transforms.route.*`) — identity when no
      * route transform is declared. Lets callers cross-check the
      * engine's router against the declaration. */
    def tableNames: Seq[String] = (routeRegex, routeReplacement) match {
      case (Some(re), Some(repl)) => topics.map(_.replaceAll(re, repl))
      case _ => topics
    }

    /** Kafka source options realizing the subscription + backpressure
      * declaration. */
    def kafkaOptions(bootstrapServers: String): Map[String, String] =
      graft.sources.KafkaCdc.subscribeOptions(bootstrapServers, topics,
        maxOffsetsPerTrigger = maxBufferedRecords)

    /** The engine pipeline config this declaration describes. Schemas
      * and key columns come from the caller (Connect reads them from
      * the database); storage roots are engine-side concerns the JSON
      * never names. */
    def pipelineConfig(rowSchema: StructType, keyCols: Seq[String],
                       rootDir: String,
                       tableSpecs: Map[String, CdcPipeline.TableSpec] =
                         Map.empty): CdcPipeline.Config =
      CdcPipeline.Config(
        rowSchema, keyCols,
        mirrorRoot = s"$rootDir/mirror",
        dlqDir = s"$rootDir/${dlqTopic.getOrElse("dlq")}",
        checkpointDir = s"$rootDir/checkpoint",
        triggerMs = triggerMs,
        tableSpecs = tableSpecs)
  }

  /** Parse a sink-connector declaration. Declarations whose semantics
    * the engine does NOT implement (append-only insert mode, pk from
    * record value, deletes off) fail here — loudly, at load time —
    * instead of silently replicating with different semantics. */
  def parseSink(json: String): Sink = {
    val (name, cfg) = cfgNode(json)
    val insertMode = opt(cfg, "insert.mode").getOrElse("insert")
    require(insertMode == "upsert",
      s"insert.mode=$insertMode: the engine's merge is the idempotent " +
        "keyed upsert (register-postgres-sink.json:15) — append-only " +
        "replication would double rows under replay")
    val pkMode = opt(cfg, "pk.mode").getOrElse("none")
    require(pkMode == "record_key",
      s"pk.mode=$pkMode: keys ride the record key (the Debezium " +
        "envelope's key struct); value- or kafka-coordinate keying is " +
        "not implemented")
    require(opt(cfg, "delete.enabled").forall(_.toBoolean),
      "delete.enabled=false: the engine propagates deletes as " +
        "versioned tombstones; ignoring deletes would diverge the mirror")
    val transforms = opt(cfg, "transforms").toSeq
      .flatMap(_.split(',').map(_.trim).filter(_.nonEmpty))
    transforms.foreach { t =>
      val cls = opt(cfg, s"transforms.$t.type").getOrElse("")
      require(cls.endsWith("ExtractNewRecordState") ||
        cls.endsWith("RegexRouter"),
        s"transform $t ($cls): only the unwrap + route SMT chain is " +
          "implemented (Envelope.unwrap / Envelope.route)")
    }
    val route = transforms.find(t =>
      opt(cfg, s"transforms.$t.type").exists(_.endsWith("RegexRouter")))
    Sink(
      name = name,
      topics = opt(cfg, "topics").toSeq
        .flatMap(_.split(',').map(_.trim).filter(_.nonEmpty)),
      triggerMs = opt(cfg, "linger.ms").map(_.toLong).getOrElse(500L),
      maxBufferedRecords =
        opt(cfg, "max.buffered.records").map(_.toLong).getOrElse(20000L),
      dlqTopic = opt(cfg, "errors.deadletterqueue.topic.name"),
      tolerateAllErrors = opt(cfg, "errors.tolerance").contains("all"),
      autoEvolve = opt(cfg, "auto.evolve").forall(_.toBoolean),
      routeRegex = route.flatMap(t => opt(cfg, s"transforms.$t.regex")),
      routeReplacement =
        route.flatMap(t => opt(cfg, s"transforms.$t.replacement")))
  }

  /** Topics a Debezium SOURCE declaration will produce:
    * `<topic.prefix>.<db>.<table>` per included table
    * (register-mysql-connector.json:10-12) — lets a deployment verify
    * the sink's `topics` list covers everything the source emits. */
  def sourceTopics(json: String): Seq[String] = {
    val (_, cfg) = cfgNode(json)
    val prefix = opt(cfg, "topic.prefix").getOrElse(
      sys.error("source declaration has no topic.prefix"))
    opt(cfg, "table.include.list").toSeq
      .flatMap(_.split(',').map(_.trim).filter(_.nonEmpty))
      .map(t => s"$prefix.$t")
  }
}
