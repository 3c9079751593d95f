package graft.tsdb

/** The Alertmanager CLIENT half of the alerting story: render firing
  * alerts as the Alertmanager v2 API's JSON shape and POST them to
  * `<alertmanager>/api/v2/alerts` — what a Prometheus's notifier queue
  * does after every rule evaluation (public API:
  * prometheus/alertmanager `api/v2/openapi.yaml`, `postAlerts`).
  * Driver-side by design: alert volume is rule-output-sized (the API
  * response shape), never sample-sized.
  */
object AlertNotifier {

  /** One outbound alert: `startsAt` = the run's activeAt; `endsAt` is
    * the validity horizon (Prometheus stamps now + 4 × resend interval
    * so the Alertmanager auto-expires it if the sender dies). */
  final case class AmAlert(labels: Map[String, String],
                           annotations: Map[String, String],
                           startsAtMs: Long, endsAtMs: Long,
                           generatorUrl: String = "")

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def rfc3339(ms: Long): String =
    java.time.Instant.ofEpochMilli(ms).toString

  private def mapJson(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")

  /** The v2 `postAlerts` body: a JSON array of alert objects. */
  def renderV2(alerts: Seq[AmAlert]): String =
    alerts.sortBy(a => a.labels.toSeq.sorted.mkString(","))
      .map { a =>
        s"""{"labels":${mapJson(a.labels)},""" +
          s""""annotations":${mapJson(a.annotations)},""" +
          s""""startsAt":${jstr(rfc3339(a.startsAtMs))},""" +
          s""""endsAt":${jstr(rfc3339(a.endsAtMs))},""" +
          s""""generatorURL":${jstr(a.generatorUrl)}}"""
      }
      .mkString("[", ",", "]")

  /** POST the alerts to one Alertmanager base URL; returns the HTTP
    * status (Alertmanager answers 200 on accepted batches). */
  def post(baseUrl: String, alerts: Seq[AmAlert]): Int = {
    val client = java.net.http.HttpClient.newHttpClient()
    val req = java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(s"$baseUrl/api/v2/alerts"))
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers
        .ofString(renderV2(alerts)))
      .build()
    client.send(req,
      java.net.http.HttpResponse.BodyHandlers.discarding()).statusCode()
  }
}
