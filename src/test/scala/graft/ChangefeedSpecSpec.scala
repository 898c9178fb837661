package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{CdcClient, CdcTransport, ChangefeedSpec, HttpCdcTransport}

/** S5 create side: the generated changefeed spec must match the
  * reference's field-for-field (`pkg/cdc/connector.go:53-74`,
  * `pkg/cdc/config.go:24-31`). */
class ChangefeedSpecSpec extends AnyFunSuite {

  test("spec fields mirror the reference's CreateChangefeed config") {
    val spec = ChangefeedSpec.build(
      storageUri = "s3://bucket/prefix/increment",
      tables = Seq("tpch.orders", "tpch.lineitem"),
      startTso = 441234567890L)
    // genSinkURI: storage uri + flush-interval/file-size/protocol knobs
    assert(spec.sinkUri ==
      "s3://bucket/prefix/increment?file-size=67108864&flush-interval=1m0s&protocol=csv")
    assert(spec.protocol == "csv")
    assert(spec.includeCommitTs, "IncludeCommitTs = true (connector.go:56)")
    assert(spec.binaryEncodingMethod == "hex")
    assert(spec.outputColumnId, "OutputColumnID = true (connector.go:62)")
    assert(spec.dateSeparator == "day", "DateSeparatorDay (connector.go:64)")
    assert(spec.filterRules == Seq("tpch.orders", "tpch.lineitem"))
    assert(spec.startTs == 441234567890L)
    assert(spec.flushInterval == "1m0s" && spec.fileSize == 64L * 1024 * 1024)
  }

  test("existing query string and custom knobs merge into the sink URI") {
    val spec = ChangefeedSpec.build(
      storageUri = "s3://b/p?endpoint=http%3A%2F%2Fminio%3A9000",
      tables = Seq("db.t"), startTso = 0L,
      flushIntervalSec = 12L, fileSize = 1024L, binaryEncodingMethod = "base64")
    assert(spec.sinkUri ==
      "s3://b/p?endpoint=http%3A%2F%2Fminio%3A9000&file-size=1024&flush-interval=12s&protocol=csv")
    assert(spec.binaryEncodingMethod == "base64")
  }

  test("goDuration renders like Go's time.Duration.String()") {
    assert(ChangefeedSpec.goDuration(60) == "1m0s")
    assert(ChangefeedSpec.goDuration(12) == "12s")
    assert(ChangefeedSpec.goDuration(3600) == "1h0m0s")
    assert(ChangefeedSpec.goDuration(3725) == "1h2m5s")
    assert(ChangefeedSpec.goDuration(0) == "0s")
  }

  test("JSON body carries the api/v2 field names; start_ts omitted when 0") {
    val spec = ChangefeedSpec.build("s3://b/p", Seq("db.t"), startTso = 42L)
    val json = spec.toJson
    assert(json.contains(""""include_commit_ts": true"""), json)
    assert(json.contains(""""binary_encoding_method": "hex""""), json)
    assert(json.contains(""""flush_interval": "1m0s""""), json)
    assert(json.contains(""""file_size": 67108864"""), json)
    assert(json.contains(""""output_column_id": true"""), json)
    assert(json.contains(""""date_separator": "day""""), json)
    assert(json.contains(""""rules": ["db.t"]"""), json)
    assert(json.contains(""""start_ts": 42"""), json)
    val noTso = ChangefeedSpec.build("s3://b/p", Seq("db.t"), startTso = 0L).toJson
    assert(!noTso.contains("start_ts"), s"start_ts must be omitted when TSO=0: $noTso")
  }

  test("client POSTs to api/v2/changefeeds and reads the id; non-200 fails") {
    var seenPath = ""; var seenBody = ""
    val ok = new CdcTransport {
      def post(path: String, body: String): (Int, String) = {
        seenPath = path; seenBody = body
        (200, """{"id": "cf-orders-1", "config": {}}""")
      }
    }
    val spec = ChangefeedSpec.build("s3://b/p", Seq("db.t"), 42L)
    val id = new CdcClient(ok).createChangefeed(spec)
    assert(id == "cf-orders-1")
    assert(seenPath == "api/v2/changefeeds")
    assert(seenBody == spec.toJson)
    val bad = new CdcTransport {
      def post(path: String, body: String): (Int, String) = (503, "unavailable")
    }
    val e = intercept[RuntimeException](new CdcClient(bad).createChangefeed(spec))
    assert(e.getMessage.contains("status code: 503"))
  }

  test("HttpCdcTransport round-trips createChangefeed over real HTTP") {
    // canned TiCDC endpoint shaped like the reference's response
    // (`respData["id"]` + `respData["config"]`, connector.go:94-97)
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var seenMethod = ""
    @volatile var seenPath = ""
    @volatile var seenBody = ""
    server.createContext("/", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        seenMethod = ex.getRequestMethod
        seenPath = ex.getRequestURI.getPath
        seenBody = new String(ex.getRequestBody.readAllBytes,
          java.nio.charset.StandardCharsets.UTF_8)
        val resp =
          if (seenPath == "/api/v2/changefeeds" && seenMethod == "POST")
            (200, """{"id": "cf-http-1", "config": {"sink": {}}}""")
          else (404, """{"error": "not found"}""")
        val bytes = resp._2.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        ex.sendResponseHeaders(resp._1, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val spec = ChangefeedSpec.build("s3://b/p", Seq("db.t"), 42L)
      val transport = new HttpCdcTransport(s"http://127.0.0.1:$port")
      val id = new CdcClient(transport).createChangefeed(spec)
      assert(id == "cf-http-1")
      assert(seenMethod == "POST")
      assert(seenPath == "/api/v2/changefeeds")
      assert(seenBody == spec.toJson, "the POSTed body must be the spec's JSON, byte for byte")
      // a failing endpoint surfaces the status code, like the reference
      val badTransport = new HttpCdcTransport(s"http://127.0.0.1:$port/missing")
      val e = intercept[RuntimeException](
        new CdcClient(badTransport).createChangefeed(spec))
      assert(e.getMessage.contains("status code: 404"))
    } finally server.stop(0)
  }
}
