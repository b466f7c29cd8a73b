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
}
