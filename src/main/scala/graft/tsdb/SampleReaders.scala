package graft.tsdb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Long-form sample readers (SURVEY.md §7.2): every source lands in the
  * same ingest-form relation `(time LONG ms, value DOUBLE,
  * labels MAP<STRING,STRING>)` that [[TsdbIngest]] pivots wide — the
  * Spark analogue of the reference's `Data{Value, Time, LABEL}` rows
  * (hello.go:29-38), source-agnostic by construction.
  *
  * All parsing is built-in expressions (regexp/str_to_map) — codegen'd,
  * no UDFs, so a 100 TB text backfill runs at scan speed and the
  * formatter⇄parser pair is replayable by the SQL oracle.
  */
object SampleReaders {

  /** Long-form parquet: (time, value, labels) as written. */
  def fromParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** CSV with columns `time,value,labels` where labels is encoded
    * `k1=v1;k2=v2` (no header assumptions beyond these names). */
  def fromCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(StructType(Seq(
        StructField("time", LongType), StructField("value", DoubleType),
        StructField("labels", StringType))))
      .option("header", "true")
      .csv(path)
      .select(col("time"), col("value"),
        str_to_map(col("labels"), lit(";"), lit("=")).as("labels"))

  /** Prometheus text-exposition / OpenMetrics sample lines:
    *
    *   metric_name{label="value",other="v2"} 1.5 1704067200000
    *
    * Comment (`#`) and blank lines are dropped; the metric name lands in
    * the label map as `__name__` (Prometheus convention). Timestamps are
    * read as epoch milliseconds (the text-exposition convention).
    * Simple-subset parser: label values must not contain escaped quotes,
    * commas or `=` (the reference's own fixture vocabulary is within
    * this subset). */
  def fromOpenMetricsLines(lines: DataFrame, lineCol: String = "line"): DataFrame = {
    // an exemplar rides after ` # ` on a sample line (OpenMetrics) —
    // strip it so the value/timestamp anchors see only the sample part
    val l = trim(regexp_replace(trim(col(lineCol)), "\\s#\\s.*$", ""))
    val name = regexp_extract(l, "^([a-zA-Z_:][a-zA-Z0-9_:]*)", 1)
    val labelBlob = regexp_extract(l, "\\{(.*)\\}", 1)
    val value = regexp_extract(l, "[}\\s]\\s*([-+0-9.eE]+)\\s+[0-9]+\\s*$", 1)
    val ts = regexp_extract(l, "([0-9]+)\\s*$", 1)
    lines
      .where(l =!= "" && !l.startsWith("#"))
      .select(
        ts.cast("long").as("time"),
        value.cast("double").as("value"),
        map_concat(
          map(lit("__name__"), name),
          when(labelBlob === "", map().cast("map<string,string>"))
            .otherwise(str_to_map(regexp_replace(labelBlob, "\"", ""),
              lit(","), lit("=")))).as("labels"))
  }

  /** OpenMetrics METADATA comment lines — `# TYPE <metric> <type>`,
    * `# UNIT <metric> <unit>`, `# HELP <metric> <help>` — pivoted to
    * one `(metric, type, unit, help)` row per metric: the text-format
    * source of the `/api/v1/metadata` view. Metadata is
    * metric-universe-sized; the pivot is one tiny groupBy. */
  def fromOpenMetricsMeta(lines: DataFrame, lineCol: String = "line"): DataFrame = {
    val l = trim(col(lineCol))
    val kind = regexp_extract(l, "^# (TYPE|UNIT|HELP) ", 1)
    val metric = regexp_extract(l, "^# (?:TYPE|UNIT|HELP) (\\S+)", 1)
    val rest = regexp_extract(l, "^# (?:TYPE|UNIT|HELP) \\S+ (.*)$", 1)
    lines
      .where(kind =!= "")
      .select(metric.as("metric"), kind.as("kind"), rest.as("rest"))
      .groupBy(col("metric"))
      .agg(
        coalesce(max(when(col("kind") === "TYPE", col("rest"))), lit(""))
          .as("type"),
        coalesce(max(when(col("kind") === "UNIT", col("rest"))), lit(""))
          .as("unit"),
        coalesce(max(when(col("kind") === "HELP", col("rest"))), lit(""))
          .as("help"))
  }

  /** The inverse — one TYPE/UNIT/HELP line triple per metric. */
  def toOpenMetricsMetaLines(meta: DataFrame): DataFrame =
    meta.select(explode(array(
      concat(lit("# TYPE "), col("metric"), lit(" "), col("type")),
      concat(lit("# UNIT "), col("metric"), lit(" "), col("unit")),
      concat(lit("# HELP "), col("metric"), lit(" "), col("help"))))
      .as("line"))

  /** OpenMetrics EXEMPLARS — the ` # {trace_id="…"} <value> <ts>` tail
    * a sample line may carry. Returns only annotated lines, as
    * `(time, value, labels, exemplar MAP, ex_value, ex_time)`. */
  def fromOpenMetricsExemplars(lines: DataFrame,
                               lineCol: String = "line"): DataFrame = {
    val l = trim(col(lineCol))
    val tail = regexp_extract(l, "\\s#\\s(\\{.*)$", 1)
    val exBlob = regexp_extract(tail, "^\\{(.*)\\}", 1)
    val exValue = regexp_extract(tail, "^\\{.*\\}\\s+([-+0-9.eE]+)", 1)
    val exTs = regexp_extract(tail, "^\\{.*\\}\\s+[-+0-9.eE]+\\s+([0-9]+)", 1)
    val core = trim(regexp_replace(l, "\\s#\\s.*$", ""))
    val name = regexp_extract(core, "^([a-zA-Z_:][a-zA-Z0-9_:]*)", 1)
    val labelBlob = regexp_extract(core, "\\{(.*)\\}", 1)
    val value = regexp_extract(core, "[}\\s]\\s*([-+0-9.eE]+)\\s+[0-9]+\\s*$", 1)
    val ts = regexp_extract(core, "([0-9]+)\\s*$", 1)
    lines
      .where(tail =!= "" && !l.startsWith("#"))
      .select(
        ts.cast("long").as("time"),
        value.cast("double").as("value"),
        map_concat(
          map(lit("__name__"), name),
          when(labelBlob === "", map().cast("map<string,string>"))
            .otherwise(str_to_map(regexp_replace(labelBlob, "\"", ""),
              lit(","), lit("=")))).as("labels"),
        when(exBlob === "", map().cast("map<string,string>"))
          .otherwise(str_to_map(regexp_replace(exBlob, "\"", ""),
            lit(","), lit("="))).as("exemplar"),
        exValue.cast("double").as("ex_value"),
        exTs.cast("long").as("ex_time"))
  }

  /** The inverse — sample lines with exemplar tails, from a frame
    * `(time, value, labels MAP, exemplar MAP, ex_value, ex_time)`. */
  def toOpenMetricsExemplarLines(rows: DataFrame): DataFrame = {
    val pairs = transform(
      array_sort(map_keys(col("labels"))),
      k => concat(k, lit("=\""), element_at(col("labels"), k), lit("\"")))
    val exPairs = transform(
      array_sort(map_keys(col("exemplar"))),
      k => concat(k, lit("=\""), element_at(col("exemplar"), k), lit("\"")))
    rows.select(concat(
      element_at(col("labels"), "__name__"),
      lit("{"),
      concat_ws(",", filter(pairs, p => !p.startsWith("__name__="))),
      lit("} "),
      col("value").cast("string"), lit(" "), col("time").cast("string"),
      lit(" # {"), concat_ws(",", exPairs), lit("} "),
      col("ex_value").cast("string"), lit(" "),
      col("ex_time").cast("string")).as("line"))
  }

  /** [[fromOpenMetricsLines]] over text files. */
  def fromOpenMetricsText(spark: SparkSession, path: String): DataFrame =
    fromOpenMetricsLines(spark.read.text(path), "value")

  /** JSON-lines samples — `{"time":…,"value":…,"labels":{"k":"v"}}`,
    * the interchange shape of most log shippers/collectors. Built-in
    * `from_json` (codegen'd, permissive: malformed lines parse to NULL
    * and are dropped rather than failing a 100 TB backfill). */
  def fromJsonLines(lines: DataFrame, lineCol: String = "line"): DataFrame = {
    val schema = StructType(Seq(
      StructField("time", LongType), StructField("value", DoubleType),
      StructField("labels", MapType(StringType, StringType))))
    lines
      .select(from_json(col(lineCol), schema).as("s"))
      .where(col("s").isNotNull && col("s.time").isNotNull)
      .select(col("s.time").as("time"), col("s.value").as("value"),
        col("s.labels").as("labels"))
  }

  /** The inverse — long-form rows to JSON lines (sorted label keys so
    * the encoding is deterministic; the round-trip pairs with
    * [[fromJsonLines]] under the identity oracle). */
  def toJsonLines(samples: DataFrame): DataFrame = {
    val sortedLabels = map_from_entries(transform(
      array_sort(map_keys(col("labels"))),
      k => struct(k, element_at(col("labels"), k))))
    samples.select(to_json(struct(
      col("time"), col("value"), sortedLabels.as("labels"))).as("line"))
  }

  /** OTLP/JSON metrics (the OpenTelemetry protocol's JSON encoding —
    * opentelemetry-proto `metrics.proto` mapped per the proto3 JSON
    * spec): each line is one ExportMetricsServiceRequest. Gauge and Sum
    * (counter) data points are read; attributes become labels and the
    * metric name lands as `__name__`. `timeUnixNano` arrives as a
    * string (uint64 per proto3-JSON) and converts to epoch ms. Built-in
    * `from_json` + explodes — codegen'd, permissive (malformed lines
    * drop), so an OTel-collector backfill parses at scan speed. */
  def fromOtlpJsonLines(lines: DataFrame, lineCol: String = "line"): DataFrame = {
    val attrType = ArrayType(StructType(Seq(
      StructField("key", StringType),
      StructField("value", StructType(Seq(
        StructField("stringValue", StringType)))))))
    val dataPointType = ArrayType(StructType(Seq(
      StructField("timeUnixNano", StringType),
      StructField("asDouble", DoubleType),
      StructField("asInt", StringType), // int64 is a JSON string too
      StructField("attributes", attrType))))
    val schema = StructType(Seq(StructField("resourceMetrics", ArrayType(
      StructType(Seq(StructField("scopeMetrics", ArrayType(StructType(Seq(
        StructField("metrics", ArrayType(StructType(Seq(
          StructField("name", StringType),
          StructField("gauge", StructType(Seq(
            StructField("dataPoints", dataPointType)))),
          StructField("sum", StructType(Seq(
            StructField("dataPoints", dataPointType))))))))))))))))))
    lines
      .select(from_json(col(lineCol), schema).as("r"))
      .where(col("r").isNotNull)
      .select(explode(col("r.resourceMetrics")).as("rm"))
      .select(explode(col("rm.scopeMetrics")).as("sm"))
      .select(explode(col("sm.metrics")).as("m"))
      .select(col("m.name").as("name"),
        explode(coalesce(col("m.gauge.dataPoints"), col("m.sum.dataPoints")))
          .as("dp"))
      .where(col("dp.timeUnixNano").isNotNull)
      .select(
        // integer DIV: nanos exceed 2^53, a double division would lose ms
        expr("CAST(dp.timeUnixNano AS BIGINT) DIV 1000000").as("time"),
        coalesce(col("dp.asDouble"), col("dp.asInt").cast("double")).as("value"),
        map_concat(
          map(lit("__name__"), col("name")),
          map_from_entries(transform(
            coalesce(col("dp.attributes"), array().cast(attrType)),
            a => struct(a.getField("key"),
              a.getField("value").getField("stringValue"))))).as("labels"))
  }

  /** The inverse — long-form rows to OTLP/JSON lines, one
    * single-data-point gauge request per sample (a valid
    * ExportMetricsServiceRequest each; sorted attribute keys make the
    * encoding deterministic, pairing with [[fromOtlpJsonLines]] under
    * the identity oracle). */
  def toOtlpJsonLines(samples: DataFrame): DataFrame = {
    val nonName = filter(
      array_sort(map_keys(col("labels"))), k => k =!= "__name__")
    val attrs = transform(nonName, k => struct(
      k.as("key"),
      struct(element_at(col("labels"), k).as("stringValue")).as("value")))
    samples.select(to_json(struct(array(struct(array(struct(array(struct(
      element_at(col("labels"), "__name__").as("name"),
      struct(array(struct(
        (col("time") * 1000000L).cast("string").as("timeUnixNano"),
        col("value").as("asDouble"),
        attrs.as("attributes"))).as("dataPoints")).as("gauge")))
      .as("metrics"))).as("scopeMetrics"))).as("resourceMetrics")))
      .as("line"))
  }

  /** The inverse — long-form rows to exposition lines (a text exporter;
    * also the round-trip harness that puts the parser under the oracle). */
  def toOpenMetricsLines(samples: DataFrame): DataFrame = {
    val pairs = transform(
      array_sort(map_keys(col("labels"))),
      k => concat(k, lit("=\""), element_at(col("labels"), k), lit("\"")))
    samples.select(concat(
      element_at(col("labels"), "__name__"),
      lit("{"),
      concat_ws(",", filter(pairs, p => !p.startsWith("__name__="))),
      lit("} "),
      col("value").cast("string"), lit(" "),
      col("time").cast("string")).as("line"))
  }
}
