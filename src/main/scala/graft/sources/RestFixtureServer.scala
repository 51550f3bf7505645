package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicBoolean

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Loopback stand-in for the remote vendor API behind [[RestSource]].
  *
  * This is the SIMULATED UPSTREAM, not engine machinery: it plays the role
  * of `https://eodhd.com` in the reference (`my_eodhd.py:8,94`) so the
  * adapter's full network path — URL construction, token auth, status
  * branching, Retry-After, backoff, payload read — executes for real inside
  * verified rows and specs (the sandbox has no egress; production swaps the
  * base URL and nothing else). Payloads it serves are built by the CALLER
  * from fixture tables, so a DuckDB oracle over the same tables can verify
  * the ingested result end-to-end. Any driver-side row handling here models
  * the vendor's side of the wire, not engine data movement.
  *
  * Endpoints:
  *   - `GET /api/list?api_token=T`      → the index-list JSON array
  *   - `GET /api/comp/<ID>?api_token=T` → that index's detail JSON object
  *
  * Fault injection (to prove the adapter's retry machinery inside the
  * verified row, deterministically): the FIRST `/api/list` call of a
  * server's lifetime returns `429` with `Retry-After: 0`; the first call
  * for `failOnce500Id` returns `500`. Wrong/missing token → `403`
  * (the reference's snapshot-fallback trigger, `my_eodhd.py:14`).
  */
object RestFixtureServer {

  final case class Handle(baseUrl: String, stop: () => Unit)

  def start(token: String,
            listJson: String,
            compJsonById: Map[String, String],
            injectFirst429: Boolean = true,
            failOnce500Id: Option[String] = None): Handle = {
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val list429Pending = new AtomicBoolean(injectFirst429)
    val comp500Pending = new AtomicBoolean(failOnce500Id.isDefined)

    def tokenOf(ex: HttpExchange): Option[String] =
      Option(ex.getRequestURI.getQuery).toSeq
        .flatMap(_.split('&')).map(_.split("=", 2))
        .collectFirst { case Array("api_token", v) => v }

    def respond(ex: HttpExchange, code: Int, body: String,
                headers: Seq[(String, String)] = Nil): Unit = {
      val b = body.getBytes(StandardCharsets.UTF_8)
      headers.foreach { case (k, v) => ex.getResponseHeaders.add(k, v) }
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length)
      if (b.nonEmpty) ex.getResponseBody.write(b)
      ex.close()
    }

    srv.createContext("/api/list", (ex: HttpExchange) =>
      if (!tokenOf(ex).contains(token))
        respond(ex, 403, """{"error":"invalid api_token"}""")
      else if (list429Pending.getAndSet(false))
        respond(ex, 429, """{"error":"rate limited"}""",
          Seq("Retry-After" -> "0"))
      else respond(ex, 200, listJson))

    srv.createContext("/api/comp/", (ex: HttpExchange) => {
      val id = ex.getRequestURI.getPath.stripPrefix("/api/comp/")
      if (!tokenOf(ex).contains(token))
        respond(ex, 403, """{"error":"invalid api_token"}""")
      else if (failOnce500Id.contains(id) && comp500Pending.getAndSet(false))
        respond(ex, 500, """{"error":"upstream hiccup"}""")
      else compJsonById.get(id) match {
        case Some(body) => respond(ex, 200, body)
        case None => respond(ex, 404, s"""{"error":"unknown index $id"}""")
      }
    })

    srv.start()
    Handle(s"http://127.0.0.1:${srv.getAddress.getPort}",
      () => srv.stop(0))
  }

  // ---------------------------------------------------------------------
  // Minimal JSON writers for payload construction (vendor side)
  // ---------------------------------------------------------------------

  def jstr(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'           => sb.append("\\\"")
      case '\\'          => sb.append("\\\\")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c             => sb.append(c)
    }
    sb.append('"').toString
  }

  /** `{"k":v,...}` from pre-rendered value literals. */
  def jobj(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")

  def jarr(elems: Seq[String]): String = elems.mkString("[", ",", "]")
}
