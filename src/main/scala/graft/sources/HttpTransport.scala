package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse, HttpTimeoutException}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** Production [[RestPager.Transport]] over the stock-JDK
  * `java.net.http.HttpClient` — the deployment half of the S1–S3 scan
  * protocols (the fixture transports stay the test half; this class is
  * constructor-injected exactly like them, so everything downstream —
  * paging, the T5 retry ladder, watermark params, batching — is
  * byte-identical whichever transport is plugged in).
  *
  * Division of labor with the ladder: this class NEVER retries or
  * sleeps. It returns the status/body/headers as received —
  * [[RestPager.checked]] turns 429 into [[RestPager.RateLimited]] and
  * ≥400 into [[RestPager.HttpError]], and [[RestPager.withRetries]]
  * applies the backoff policy (reference analog:
  * okta-sync/okta_sync_utils.py:72-193). The ONLY errors raised here
  * are transport-level (connect/timeout/IO), mapped to
  * [[RestPager.TimeoutOrConnection]] — the ladder's 60 s rung.
  *
  * Headers: HTTP header names are case-insensitive (the JDK client
  * reports them lower-cased); [[RestPager.Response.header]] does the
  * case-insensitive lookup, and RFC 8288 `Link` headers are parsed
  * into the `links` map the cursor protocol follows.
  *
  * One client per executor/partition in the distributed
  * (DataSourceV2) form — HttpClient is thread-safe and pools
  * connections, so a per-JVM instance is the right shape. */
final class HttpTransport(
    connectTimeout: Duration = Duration.ofSeconds(10),
    requestTimeout: Duration = Duration.ofSeconds(60),
    baseHeaders: Map[String, String] = Map.empty) extends RestPager.Transport {

  private val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(connectTimeout)
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  override def get(url: String, params: Map[String, String]): RestPager.Response = {
    val full = HttpTransport.withQuery(url, params)
    val b = HttpRequest.newBuilder(URI.create(full)).timeout(requestTimeout).GET()
    baseHeaders.foreach { case (k, v) => b.header(k, v) }
    val resp: HttpResponse[String] =
      try client.send(b.build(), HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8))
      catch {
        case e: HttpTimeoutException =>
          throw RestPager.TimeoutOrConnection(s"timeout: $full (${e.getMessage})")
        case e: java.net.ConnectException =>
          throw RestPager.TimeoutOrConnection(s"connect: $full (${e.getMessage})")
        case e: java.io.IOException =>
          throw RestPager.TimeoutOrConnection(s"io: $full (${e.getMessage})")
        case e: InterruptedException =>
          Thread.currentThread().interrupt()
          throw RestPager.TimeoutOrConnection(s"interrupted: $full (${e.getMessage})")
      }
    val headers: Map[String, String] = {
      import scala.jdk.CollectionConverters._
      // first value per name (the protocols read scalar headers);
      // Link is handled separately below with ALL its values
      resp.headers().map().asScala.iterator
        .filter { case (_, vs) => !vs.isEmpty }
        .map { case (k, vs) => k -> vs.get(0) }
        .toMap
    }
    val links = {
      import scala.jdk.CollectionConverters._
      HttpTransport.parseLinks(resp.headers().allValues("Link").asScala.toSeq)
    }
    RestPager.Response(resp.statusCode(), resp.body(), headers, links)
  }
}

object HttpTransport {

  /** Append URL-encoded params to a URL that may already carry a
    * query string. */
  private[sources] def withQuery(url: String, params: Map[String, String]): String =
    if (params.isEmpty) url
    else {
      val enc = params.iterator.map { case (k, v) =>
        java.net.URLEncoder.encode(k, "UTF-8") + "=" + java.net.URLEncoder.encode(v, "UTF-8")
      }.mkString("&")
      url + (if (url.contains("?")) "&" else "?") + enc
    }

  private val LinkRe = """<([^>]*)>\s*;([^,<]*)""".r
  private val RelRe = """rel\s*=\s*"?([^";]+)"?""".r

  /** RFC 8288 `Link` header values → rel → target map (first rel
    * wins, matching the follow-the-next-link cursor semantics).
    * Handles multiple header instances and comma-separated members
    * within one value. */
  private[sources] def parseLinks(values: Seq[String]): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    values.foreach { v =>
      LinkRe.findAllMatchIn(v).foreach { m =>
        RelRe.findFirstMatchIn(m.group(2)).foreach { r =>
          val rel = r.group(1).trim
          if (!out.contains(rel)) out(rel) = m.group(1)
        }
      }
    }
    out.toMap
  }
}
