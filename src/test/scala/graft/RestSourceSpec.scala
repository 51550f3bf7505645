package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.sources.{RestFixtureServer => Fx, RestSource}
import org.apache.spark.sql.functions._

/** S8 REST adapter: status branching, retry schedule (injected sleeper —
  * no wall-clock waits), 403 snapshot-fallback contract, declared-schema
  * JSON parse, and the reference's date-sentinel fill semantics
  * (my_eodhd.py:103-121).
  */
class RestSourceSpec extends SparkSpec {

  private val token = "t0k"
  private val listJson = Fx.jarr(Seq(
    Fx.jobj(Seq(
      "ID" -> Fx.jstr("IDX_A"), "Code" -> Fx.jstr("A"),
      "Name" -> Fx.jstr("A \"quoted\" Composite"),
      "Constituents" -> "2", "CurrencyCode" -> Fx.jstr("USD"),
      "LastUpdate" -> Fx.jstr("2024-06-30")))))
  private val compA =
    """{"HistoricalTickerComponents":{
      |"0":{"Code":"AAA","Name":"AAA Corp","Sector":"Energy",
      |     "StartDate":"","Weight":"12.5","IsActiveNow":true},
      |"1":{"Code":"BBB","Name":"BBB Corp","Sector":"Tech",
      |     "StartDate":"2001-02-03","EndDate":"2010-11-12",
      |     "Weight":"7.25","IsActiveNow":false}
      |}}""".stripMargin

  private def withServer[T](inject429: Boolean = false,
                            fail500: Option[String] = None)
                           (body: Fx.Handle => T): T = {
    val h = Fx.start(token, listJson, Map("IDX_A" -> compA),
      injectFirst429 = inject429, failOnce500Id = fail500)
    try body(h) finally h.stop()
  }

  test("200 returns the payload with no retries") {
    withServer() { h =>
      val slept = new AtomicInteger(0)
      val r = RestSource.get(s"${h.baseUrl}/api/list?api_token=$token",
        sleep = _ => slept.incrementAndGet())
      assert(r == RestSource.Ok(listJson))
      assert(slept.get == 0)
    }
  }

  test("429 honors Retry-After then succeeds; 500 backs off then succeeds") {
    withServer(inject429 = true, fail500 = Some("IDX_A")) { h =>
      val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
      val r = RestSource.get(s"${h.baseUrl}/api/list?api_token=$token",
        sleep = sleeps += _)
      assert(r == RestSource.Ok(listJson))
      assert(sleeps.toSeq == Seq(0L)) // Retry-After: 0, taken verbatim

      sleeps.clear()
      val c = RestSource.get(
        s"${h.baseUrl}/api/comp/IDX_A?api_token=$token",
        baseBackoffMs = 8L, sleep = sleeps += _)
      assert(c == RestSource.Ok(compA))
      assert(sleeps.toSeq == Seq(8L)) // one 500, exponential base
    }
  }

  test("persistent 500 exhausts retries with the exponential schedule") {
    // a context that always 500s: unknown-id path would 404 (fail-fast),
    // so drive the always-500 case through a dedicated server
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/boom", ex => {
      ex.sendResponseHeaders(500, -1); ex.close()
    })
    srv.start()
    try {
      val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
      val e = intercept[RestSource.HttpFetchException] {
        RestSource.get(
          s"http://127.0.0.1:${srv.getAddress.getPort}/boom",
          maxRetries = 3, baseBackoffMs = 2L, sleep = sleeps += _)
      }
      assert(e.code == 500)
      // 2 << attempt for the retried attempts; no sleep after the last
      assert(sleeps.toSeq == Seq(2L, 4L, 8L))
    } finally srv.stop(0)
  }

  test("connection refusal retries on the 5xx schedule, then throws") {
    // a port with nothing listening: bind-then-close to reserve one
    val probe = new java.net.ServerSocket(0)
    val port = probe.getLocalPort
    probe.close()
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val e = intercept[RestSource.HttpFetchException] {
      RestSource.get(s"http://127.0.0.1:$port/x", maxRetries = 2,
        baseBackoffMs = 4L, connectTimeoutMs = 500, sleep = sleeps += _)
    }
    assert(e.code == -1)
    assert(e.getMessage.contains("connection failure"))
    assert(sleeps.toSeq == Seq(4L, 8L)) // no sleep after the final attempt
  }

  test("a fetch recovers when the endpoint comes up mid-retry") {
    val probe = new java.net.ServerSocket(0)
    val port = probe.getLocalPort
    probe.close()
    var srv: Option[com.sun.net.httpserver.HttpServer] = None
    try {
      // the injected sleeper brings the server up between attempts —
      // deterministic "transient outage" with no wall-clock coupling
      val r = RestSource.get(s"http://127.0.0.1:$port/up",
        baseBackoffMs = 1L, connectTimeoutMs = 500,
        sleep = _ => if (srv.isEmpty) {
          val s = com.sun.net.httpserver.HttpServer.create(
            new java.net.InetSocketAddress("127.0.0.1", port), 0)
          s.createContext("/up", ex => {
            val b = "{\"up\":true}".getBytes
            ex.sendResponseHeaders(200, b.length)
            ex.getResponseBody.write(b); ex.close()
          })
          s.start()
          srv = Some(s)
        })
      assert(r == RestSource.Ok("""{"up":true}"""))
    } finally srv.foreach(_.stop(0))
  }

  // --- raw-socket server: scripted byte-level responses (truncated body,
  // hostile Retry-After) that com.sun HttpServer can't produce -----------
  private def withRawServer[T](responses: Seq[(String, Boolean)])
                              (body: Int => T): T = {
    val srv = new java.net.ServerSocket(0)
    val t = new Thread(() => {
      responses.foreach { case (resp, rstAbort) =>
        val s = srv.accept()
        try {
          // drain the request head (up to the blank line)
          val in = s.getInputStream
          var last4 = 0
          var b = in.read()
          var done = false
          while (b != -1 && !done) {
            last4 = ((last4 << 8) | b) & 0xffffffff
            if (last4 == 0x0d0a0d0a) done = true else b = in.read()
          }
          s.getOutputStream.write(
            resp.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
          s.getOutputStream.flush()
          // SO_LINGER 0 → close sends a TCP RST: the client's in-flight
          // body read throws (a clean FIN would read as EOF, which
          // HttpURLConnection accepts even short of Content-Length)
          if (rstAbort) s.setSoLinger(true, 0)
        } finally s.close()
      }
    })
    t.setDaemon(true)
    t.start()
    try body(srv.getLocalPort) finally srv.close()
  }

  test("a mid-body drop after a 200 status retries on the 5xx schedule") {
    // Content-Length promises 100 bytes, the connection is RST-aborted
    // after 7: the body read (not the status read) throws, and the
    // adapter must treat that as the same transient failure as a refused
    // connect rather than surfacing a raw IOException.
    val truncated =
      "HTTP/1.1 200 OK\r\nContent-Length: 100\r\nConnection: close\r\n\r\npartial"
    val full =
      "HTTP/1.1 200 OK\r\nContent-Length: 2\r\nConnection: close\r\n\r\nok"
    withRawServer(Seq(truncated -> true, full -> false)) { port =>
      val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
      val r = RestSource.get(s"http://127.0.0.1:$port/p",
        baseBackoffMs = 4L, readTimeoutMs = 2000, sleep = sleeps += _)
      assert(r == RestSource.Ok("ok"))
      assert(sleeps.toSeq == Seq(4L)) // one body failure, exponential base
    }
  }

  test("a mid-body drop after a 403 still surfaces Forbidden (the " +
    "snapshot-fallback signal does not depend on body bytes)") {
    // a consistently truncated 403 must not masquerade as a generic
    // connection failure: the status line is authoritative
    val truncated403 =
      "HTTP/1.1 403 Forbidden\r\nContent-Length: 100\r\n" +
        "Connection: close\r\n\r\npartial"
    withRawServer(Seq(truncated403 -> true)) { port =>
      val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
      val r = RestSource.get(s"http://127.0.0.1:$port/p",
        baseBackoffMs = 4L, readTimeoutMs = 2000, sleep = sleeps += _)
      assert(r == RestSource.Forbidden)
      assert(sleeps.isEmpty) // terminal: no retry schedule entered
    }
  }

  test("a mid-body drop after a 404 fails fast with the status, not as " +
    "a connection failure") {
    val truncated404 =
      "HTTP/1.1 404 Not Found\r\nContent-Length: 100\r\n" +
        "Connection: close\r\n\r\npartial"
    withRawServer(Seq(truncated404 -> true)) { port =>
      val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
      val e = intercept[RestSource.HttpFetchException] {
        RestSource.get(s"http://127.0.0.1:$port/p",
          baseBackoffMs = 4L, readTimeoutMs = 2000, sleep = sleeps += _)
      }
      assert(e.code == 404)
      assert(sleeps.isEmpty)
    }
  }

  test("persistently truncated 200 bodies exhaust retries with the " +
    "transport-failure sentinel, not a bogus HTTP-200 error code") {
    val truncated =
      "HTTP/1.1 200 OK\r\nContent-Length: 100\r\nConnection: close\r\n\r\npartial"
    withRawServer(Seq.fill(3)(truncated -> true)) { port =>
      val e = intercept[RestSource.HttpFetchException] {
        RestSource.get(s"http://127.0.0.1:$port/p", maxRetries = 2,
          baseBackoffMs = 4L, readTimeoutMs = 2000, sleep = _ => ())
      }
      assert(e.code == -1, s"exhausted mid-body retries surfaced ${e.code}")
      assert(e.getMessage.contains("mid-body failure (status 200)"))
    }
  }

  test("negative Retry-After falls back to the exponential schedule") {
    val tooSoon =
      "HTTP/1.1 429 Too Many\r\nRetry-After: -5\r\nContent-Length: 0\r\n" +
        "Connection: close\r\n\r\n"
    val full =
      "HTTP/1.1 200 OK\r\nContent-Length: 2\r\nConnection: close\r\n\r\nok"
    withRawServer(Seq(tooSoon -> false, full -> false)) { port =>
      val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
      val r = RestSource.get(s"http://127.0.0.1:$port/p",
        baseBackoffMs = 4L, sleep = sleeps += _)
      assert(r == RestSource.Ok("ok"))
      // -5 would make Thread.sleep throw; the adapter must ignore it
      assert(sleeps.toSeq == Seq(4L))
    }
  }

  test("an enormous Retry-After is capped, not honored verbatim") {
    // 9.3e15 seconds also overflows a seconds→millis multiply: the cap
    // must be applied BEFORE the unit conversion or the sleep goes
    // negative and Thread.sleep throws
    val parkMe =
      "HTTP/1.1 429 Too Many\r\nRetry-After: 9300000000000000\r\n" +
        "Content-Length: 0\r\nConnection: close\r\n\r\n"
    val full =
      "HTTP/1.1 200 OK\r\nContent-Length: 2\r\nConnection: close\r\n\r\nok"
    withRawServer(Seq(parkMe -> false, full -> false)) { port =>
      val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
      val r = RestSource.get(s"http://127.0.0.1:$port/p",
        baseBackoffMs = 4L, sleep = sleeps += _)
      assert(r == RestSource.Ok("ok"))
      assert(sleeps.toSeq == Seq(30000L)) // vendor can't park the driver
    }
  }

  test("403 is terminal (no retry) — the snapshot-fallback signal") {
    withServer() { h =>
      val slept = new AtomicInteger(0)
      val r = RestSource.get(s"${h.baseUrl}/api/list?api_token=WRONG",
        sleep = _ => slept.incrementAndGet())
      assert(r == RestSource.Forbidden)
      assert(slept.get == 0)
      // the reference's branch (my_eodhd.py:14-16): Forbidden → local
      // snapshot; getOk (no snapshot available) must throw instead
      val e = intercept[RestSource.HttpFetchException] {
        RestSource.getOk(s"${h.baseUrl}/api/list?api_token=WRONG")
      }
      assert(e.code == 403)
    }
  }

  test("404 fails fast without retries") {
    withServer() { h =>
      val slept = new AtomicInteger(0)
      val e = intercept[RestSource.HttpFetchException] {
        RestSource.get(s"${h.baseUrl}/api/comp/NOPE?api_token=$token",
          sleep = _ => slept.incrementAndGet())
      }
      assert(e.code == 404)
      assert(slept.get == 0)
    }
  }

  test("indexList parses the array with renames and JSON escapes intact") {
    withServer() { h =>
      val df = RestSource.indexList(spark,
        RestSource.getOk(s"${h.baseUrl}/api/list?api_token=$token"))
      val r = df.collect()
      assert(r.length == 1)
      assert(r(0).getAs[String]("full_symbol") == "IDX_A")
      assert(r(0).getAs[String]("name") == "A \"quoted\" Composite")
      assert(r(0).getAs[Long]("constituents_count") == 2L)
    }
  }

  test("historicalConstituents fills empty AND absent dates with sentinels") {
    val df = RestSource.historicalConstituents(
      spark, Seq("IDX_A" -> compA)).orderBy("symbol")
    val rows = df.collect()
    assert(rows.map(_.getAs[String]("symbol")).toSeq == Seq("AAA", "BBB"))
    val a = rows(0)
    assert(a.getAs[String]("start_date") == "1950-01-01") // "" → sentinel
    assert(a.getAs[String]("end_date") == "2199-12-31")   // absent → sentinel
    assert(a.getAs[Double]("weight") == 12.5)
    assert(a.getAs[Boolean]("is_active_in_index"))
    val b = rows(1)
    assert(b.getAs[String]("start_date") == "2001-02-03")
    assert(b.getAs[String]("end_date") == "2010-11-12")
    assert(!b.getAs[Boolean]("is_active_in_index"))
  }

  test("currentConstituents parses the Components map, no date columns") {
    val payload =
      """{"Components":{"0":{"Code":"AAA","Name":"AAA Corp",
        |"Sector":"Energy","Weight":"12.5","IsActiveNow":true}},
        |"HistoricalTickerComponents":{}}""".stripMargin
    val rows = RestSource.currentConstituents(
      spark, Seq("IDX_A" -> payload)).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[String]("index_symbol") == "IDX_A")
    assert(r.getAs[String]("symbol") == "AAA")
    assert(r.getAs[Double]("weight") == 12.5)
    assert(!r.schema.fieldNames.contains("start_date"))
  }

  test("empty constituents map yields zero rows, not a parse error") {
    val df = RestSource.historicalConstituents(
      spark, Seq("IDX_E" -> """{"HistoricalTickerComponents":{}}"""))
    assert(df.count() == 0)
  }

  test("jstr escapes quotes, backslashes, and control chars") {
    assert(Fx.jstr("a\"b\\c\nd") == "\"a\\\"b\\\\c\\u000ad\"")
    val round = spark.range(1)
      .select(get_json_object(
        lit(s"""{"k":${Fx.jstr("a\"b\\c")}}"""), "$.k"))
      .head().getString(0)
    assert(round == "a\"b\\c")
  }
}
