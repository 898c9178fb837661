package graft.cdc

/** S5 create side — changefeed provisioning (reference
  * `pkg/cdc/connector.go:29-100`, `pkg/cdc/config.go:17-31`).
  *
  * The reference POSTs `/api/v2/changefeeds` with: csv protocol,
  * include-commit-ts, binary encoding method, storage sink URI carrying
  * `flush-interval`/`file-size`/`protocol` query knobs, cloud-storage
  * config repeating flush/file-size plus output-column-id, day date
  * separator, per-table filter rules, and `start_ts` = the snapshot TSO
  * (the exactly-once handoff pin, SURVEY §1.1(6)).
  *
  * There is no TiCDC server in this sandbox, so the builder is PURE —
  * config in, spec + JSON body out — and the one-method [[CdcTransport]]
  * seam carries the HTTP hop, the same pattern `SourceCatalog` uses for
  * its SQL executor: everything testable against canned responses,
  * nothing mocked inside the engine.
  */
final case class ChangefeedSpec(
    sinkUri: String,
    startTs: Long,
    protocol: String,
    includeCommitTs: Boolean,
    binaryEncodingMethod: String,
    flushInterval: String, // Go duration rendering, e.g. "1m0s"
    fileSize: Long,
    outputColumnId: Boolean,
    dateSeparator: String,
    filterRules: Seq[String]) {

  /** The `/api/v2/changefeeds` POST body (`ChangefeedConfig` +
    * `apiv2.ReplicaConfig` subset, `pkg/cdc/config.go:11-15` and
    * `pkg/cdc/connector.go:55-74`). `start_ts` is omitted when 0,
    * matching `if c.startTSO != 0` (`connector.go:70-72`). */
  def toJson: String = {
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val rules = filterRules.map(r => s""""${esc(r)}"""").mkString("[", ", ", "]")
    val startTsField = if (startTs != 0L) s""", "start_ts": $startTs""" else ""
    s"""{"replica_config": {""" +
      s""""sink": {""" +
      s""""csv": {"include_commit_ts": $includeCommitTs, "binary_encoding_method": "${esc(binaryEncodingMethod)}"}, """ +
      s""""cloud_storage_config": {"flush_interval": "$flushInterval", "file_size": $fileSize, "output_column_id": $outputColumnId}, """ +
      s""""date_separator": "${esc(dateSeparator)}"}, """ +
      s""""filter": {"rules": $rules}}, """ +
      s""""sink_uri": "${esc(sinkUri)}"""" +
      startTsField + "}"
  }
}

object ChangefeedSpec {

  /** Build the spec from pipeline config, reproducing the reference's
    * defaults: csv protocol, IncludeCommitTs=true, OutputColumnID=true,
    * day separator (`connector.go:31-48,55-63`); sink URI = storage URI
    * + `flush-interval`/`file-size`/`protocol` query params
    * (`config.go:24-31` genSinkURI). */
  def build(
      storageUri: String,
      tables: Seq[String],
      startTso: Long,
      flushIntervalSec: Long = 60L,
      fileSize: Long = 64L * 1024 * 1024,
      binaryEncodingMethod: String = "hex"): ChangefeedSpec = {
    val flush = goDuration(flushIntervalSec)
    val sep = if (storageUri.contains("?")) "&" else "?"
    ChangefeedSpec(
      sinkUri = s"$storageUri${sep}file-size=$fileSize&flush-interval=$flush&protocol=csv",
      startTs = startTso,
      protocol = "csv",
      includeCommitTs = true,
      binaryEncodingMethod = binaryEncodingMethod,
      flushInterval = flush,
      fileSize = fileSize,
      outputColumnId = true,
      dateSeparator = "day",
      filterRules = tables)
  }

  /** Go `time.Duration.String()` rendering for whole seconds — the wire
    * format TiCDC expects in both the sink URI and the cloud-storage
    * config ("1m0s" for 60 s, "12s", "1h0m0s"). */
  def goDuration(seconds: Long): String = {
    require(seconds >= 0, s"negative duration: $seconds")
    val h = seconds / 3600
    val m = (seconds % 3600) / 60
    val s = seconds % 60
    if (h > 0) s"${h}h${m}m${s}s"
    else if (m > 0) s"${m}m${s}s"
    else s"${s}s"
  }
}

/** The single network hop, isolated: POST a JSON body to a path under the
  * TiCDC server, return (status code, response body). */
trait CdcTransport {
  def post(path: String, jsonBody: String): (Int, String)
}

/** Production [[CdcTransport]]: the real HTTP hop the reference makes
  * (`client.Do(httpReq)`, `pkg/cdc/connector.go:78-90`) over the JDK
  * `java.net.http.HttpClient`. `serverUrl` mirrors the reference's
  * `http://{cdcHost}:{cdcPort}` (`connector.go:44`); the path is joined
  * the same way `url.JoinPath` does. */
final class HttpCdcTransport(
    serverUrl: String,
    timeout: java.time.Duration = java.time.Duration.ofSeconds(30))
  extends CdcTransport {

  private val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(timeout).build()

  override def post(path: String, jsonBody: String): (Int, String) = {
    val base = if (serverUrl.endsWith("/")) serverUrl else serverUrl + "/"
    val req = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(base + path))
      .timeout(timeout)
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
        jsonBody, java.nio.charset.StandardCharsets.UTF_8))
      .build()
    val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }
}

/** Changefeed provisioning client (`CreateChangefeed`,
  * `pkg/cdc/connector.go:53-100`): POST the spec, require HTTP 200, pull
  * the changefeed id out of the response. */
final class CdcClient(transport: CdcTransport) {

  def createChangefeed(spec: ChangefeedSpec): String = {
    val (code, body) = transport.post("api/v2/changefeeds", spec.toJson)
    if (code != 200)
      sys.error(s"create changefeed failed, status code: $code")
    // minimal id extraction ("id":"...") — the reference likewise only
    // reads `respData["id"]` from the full response (`connector.go:94-97`)
    val m = """"id"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(body)
    m.map(_.group(1)).getOrElse(sys.error(s"changefeed response carries no id: $body"))
  }
}
