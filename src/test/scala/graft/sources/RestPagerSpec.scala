package graft.sources

import graft.SparkSpecBase
import RestPager._
import scala.collection.mutable

/** Fixture-backed transport covering the reference's pagination,
  * retry-ladder and fan-out semantics (okta/woo client behavior). */
class RestPagerSpec extends SparkSpecBase {

  private def noSleep = RetryPolicy(sleeper = _ => ())

  test("page-number protocol reads total pages from header and pushes params") {
    val seen = mutable.Buffer[Map[String, String]]()
    val t = new Transport {
      def get(url: String, params: Map[String, String]): Response = {
        seen += params
        Response(200, s"""[{"page": ${params("page")}}]""",
          headers = Map("X-WP-TotalPages" -> "3"))
      }
    }
    val pages = pageNumber(t, "http://api/orders", perPage = 100,
      params = Map("modified_after" -> "2026-01-01T00:00:00")).toSeq
    assert(pages.size == 3)
    assert(seen.forall(_("modified_after") == "2026-01-01T00:00:00")) // P5 pushdown
    assert(seen.map(_("page")) == Seq("1", "2", "3"))
  }

  test("cursor protocol follows next links until absent") {
    val t = new Transport {
      def get(url: String, params: Map[String, String]): Response = url match {
        case "u1" => Response(200, """[{"id":"a"}]""", links = Map("next" -> "u2"))
        case "u2" => Response(200, """[{"id":"b"}]""", links = Map("next" -> "u3"))
        case "u3" => Response(200, """[{"id":"c"}]""")
      }
    }
    assert(cursor(t, "u1", limit = 200).toSeq.size == 3)
  }

  test("retry ladder: 429 retries with exponential backoff then succeeds") {
    val delays = mutable.Buffer[Long]()
    var calls = 0
    val t = new Transport {
      def get(url: String, params: Map[String, String]): Response = {
        calls += 1
        if (calls <= 3) Response(429, "slow down") else Response(200, "[]")
      }
    }
    val p = RetryPolicy(sleeper = delays += _)
    assert(cursor(t, "u", 10, policy = p).toSeq == Seq("[]"))
    assert(delays.toSeq == Seq(1000L, 2000L, 4000L)) // 1s * 2^n
  }

  test("retry ladder: http 500 uses 180s, gives up after maxRetries") {
    val delays = mutable.Buffer[Long]()
    val t = new Transport {
      def get(url: String, params: Map[String, String]) = Response(500, "boom")
    }
    val p = RetryPolicy(maxRetries = 2, sleeper = delays += _)
    intercept[HttpError] { cursor(t, "u", 10, policy = p).toSeq }
    assert(delays.toSeq == Seq(180000L, 180000L))
  }

  test("batched groups pages into okta-style upload batches") {
    val batches = batched(Iterator.tabulate(7)(i => s"p$i"), pagesPerBatch = 3).toSeq
    assert(batches.map(_.size) == Seq(3, 3, 1))
  }

  test("lateral fan-out tags child pages with parent id") {
    val t = new Transport {
      def get(url: String, params: Map[String, String]) =
        Response(200, s"""[{"user":"of-$url"}]""")
    }
    val out = lateral(t, Seq("g1", "g2"), id => s"groups/$id/users", 100).toSeq
    assert(out.map(_._1) == Seq("g1", "g2"))
    assert(out.head._2.contains("of-groups/g1/users"))
  }

  test("toDf parses page bodies into rows (ragged pages tolerated)") {
    val df = toDf(spark, Seq("""[{"id":"a","x":1}]""", """[{"id":"b"}]"""))
    assert(df.count() == 2)
    assert(df.columns.toSet == Set("id", "x"))
  }

  test("toDf strips a leading UTF-8 BOM — no _corrupt_record from BOM'd bodies") {
    val df = toDf(spark, Seq("\uFEFF" + """[{"id":"a","x":1}]"""))
    assert(df.columns.toSet == Set("id", "x")) // not _corrupt_record
    assert(df.count() == 1)
  }

  // --- production HttpTransport against a loopback server -------------------
  // (no egress in the sandbox; com.sun.net.httpserver is loopback-only
  // here, which is exactly the deployment seam worth proving: the real
  // java.net.http client + the real retry ladder end to end)

  private def withServer(
      routes: (String, com.sun.net.httpserver.HttpExchange => Unit)*)(
      body: String => Unit): Unit = {
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, h) => srv.createContext(path, ex => h(ex)) }
    srv.start()
    try body(s"http://127.0.0.1:${srv.getAddress.getPort}")
    finally srv.stop(0)
  }

  private def respond(ex: com.sun.net.httpserver.HttpExchange, status: Int,
                      bodyStr: String, headers: (String, String)*): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.add(k, v) }
    val b = bodyStr.getBytes("UTF-8")
    ex.sendResponseHeaders(status, if (b.isEmpty) -1 else b.length)
    if (b.nonEmpty) ex.getResponseBody.write(b)
    ex.close()
  }

  private def query(ex: com.sun.net.httpserver.HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&").filter(_.nonEmpty)
      .map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, "UTF-8") -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap

  test("HttpTransport + page-number protocol over real HTTP (lower-cased headers)") {
    withServer("/items" -> { ex =>
      val q = query(ex)
      // the JDK server also normalizes header names on the wire \u2014 the
      // case-insensitive Response.header lookup is what keeps
      // X-WP-TotalPages working
      respond(ex, 200, s"""[{"page":${q("page")},"mark":"${q.getOrElse("after", "")}"}]""",
        "X-WP-TotalPages" -> "3")
    }) { base =>
      val t = new HttpTransport()
      val pages = RestPager.pageNumber(t, s"$base/items", perPage = 2,
        params = Map("after" -> "2024-01-01T00:00:00")).toSeq
      assert(pages.size == 3)
      assert(pages.zipWithIndex.forall { case (b, i) => b.contains(s""""page":${i + 1}""") })
      // the watermark param reached every page request, URL-encoded
      assert(pages.forall(_.contains("2024-01-01T00:00:00")))
    }
  }

  test("HttpTransport + cursor protocol follows RFC 8288 Link headers") {
    withServer(
      "/start" -> { ex =>
        val self = s"http://127.0.0.1:${ex.getLocalAddress.getPort}"
        respond(ex, 200, """[{"id":1}]""",
          "Link" -> s"""<$self/mid>; rel="next", <$self/start>; rel="self"""")
      },
      "/mid" -> { ex =>
        val self = s"http://127.0.0.1:${ex.getLocalAddress.getPort}"
        respond(ex, 200, """[{"id":2}]""", "Link" -> s"""<$self/end>; rel="next"""")
      },
      "/end" -> { ex => respond(ex, 200, """[{"id":3}]""") }
    ) { base =>
      val bodies = RestPager.cursor(new HttpTransport(), s"$base/start", limit = 100).toSeq
      assert(bodies.map(b => b.charAt(b.indexOf("id\":") + 4)) == Seq('1', '2', '3'))
    }
  }

  test("HttpTransport: 429 drives the real exponential ladder, then succeeds") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer("/flaky" -> { ex =>
      if (hits.incrementAndGet() <= 2) respond(ex, 429, "slow down")
      else respond(ex, 200, """[{"ok":true}]""", "X-WP-TotalPages" -> "1")
    }) { base =>
      val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
      val pages = RestPager.pageNumber(new HttpTransport(), s"$base/flaky", perPage = 10,
        policy = RestPager.RetryPolicy(sleeper = slept += _)).toSeq
      assert(pages == Seq("""[{"ok":true}]"""))
      assert(slept.toSeq == Seq(1000L, 2000L)) // 1s \u00D7 2^attempt
      assert(hits.get() == 3)
    }
  }

  test("HttpTransport: 500 maps to HttpError and exhausts maxRetries") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer("/down" -> { ex => hits.incrementAndGet(); respond(ex, 500, "boom") }) { base =>
      val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
      val e = intercept[RestPager.HttpError] {
        RestPager.pageNumber(new HttpTransport(), s"$base/down", perPage = 10,
          policy = RestPager.RetryPolicy(maxRetries = 2, sleeper = slept += _)).toSeq
      }
      assert(e.status == 500)
      assert(slept.toSeq == Seq(180000L, 180000L))
      assert(hits.get() == 3) // initial + 2 retries
    }
  }

  test("HttpTransport: request timeout maps to TimeoutOrConnection (the 60s rung)") {
    withServer("/slow" -> { ex =>
      Thread.sleep(2000); respond(ex, 200, "late")
    }) { base =>
      val t = new HttpTransport(requestTimeout = java.time.Duration.ofMillis(200))
      val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
      intercept[RestPager.TimeoutOrConnection] {
        RestPager.pageNumber(t, s"$base/slow", perPage = 10,
          policy = RestPager.RetryPolicy(maxRetries = 1, sleeper = slept += _)).toSeq
      }
      assert(slept.toSeq == Seq(60000L))
    }
  }

  test("HttpTransport: connection refused maps to TimeoutOrConnection") {
    // a port nothing listens on \u2014 grab one, close it, then dial it
    val sock = new java.net.ServerSocket(0, 1, java.net.InetAddress.getByName("127.0.0.1"))
    val deadPort = sock.getLocalPort
    sock.close()
    intercept[RestPager.TimeoutOrConnection] {
      new HttpTransport().get(s"http://127.0.0.1:$deadPort/never", Map.empty)
    }
  }

  test("withQuery merges onto existing query strings and URL-encodes") {
    assert(HttpTransport.withQuery("http://h/p", Map.empty) == "http://h/p")
    assert(HttpTransport.withQuery("http://h/p?a=1", Map("b c" -> "d&e"))
      == "http://h/p?a=1&b+c=d%26e")
  }

  test("parseLinks handles multi-member and multi-instance Link headers") {
    assert(HttpTransport.parseLinks(Seq(
      """<http://x/2>; rel="next", <http://x/1>; rel="prev"""",
      """<http://x/9>; title="z"; rel=last""")) ==
      Map("next" -> "http://x/2", "prev" -> "http://x/1", "last" -> "http://x/9"))
    // first rel wins (cursor follows ONE next)
    assert(HttpTransport.parseLinks(Seq(
      """<http://x/a>; rel="next"""", """<http://x/b>; rel="next"""")) ==
      Map("next" -> "http://x/a"))
  }
}
