package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import Poller._

/** T4 poll-with-backoff (okta_sync_utils.py:541-611,
  * fivetran_client.py:80-118) — pure driver util, no Spark session;
  * the injected sleep records the schedule instead of waiting. */
class PollerSpec extends AnyFunSuite {

  private class Recorder {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    def sleep(ms: Long): Unit = sleeps += ms
  }

  test("await polls after each interval until Done; fixed interval like the reference") {
    val rec = new Recorder
    val statuses = Iterator[Status[String]](Pending, Pending, Done("ok"))
    val out = await(30000L, 10, sleep = rec.sleep)(() => statuses.next())
    assert(out == Right("ok"))
    assert(rec.sleeps.toSeq == Seq(30000L, 30000L, 30000L)) // sleep precedes every poll
  }

  test("await applies multiplicative backoff with ceiling") {
    val rec = new Recorder
    val statuses = Iterator[Status[String]](Pending, Pending, Pending, Done("ok"))
    assert(await(100L, 10, backoffMult = 1.5, sleep = rec.sleep)(() => statuses.next()).isRight)
    assert(rec.sleeps.toSeq == Seq(100L, 150L, 225L, 338L))
  }

  test("await gives up after maxPolls and reports a terminal failure reason") {
    val rec = new Recorder
    assert(await(10L, 3, sleep = rec.sleep)(() => Pending) ==
      Left("still pending after 3 polls"))
    assert(rec.sleeps.length == 3)
    assert(await(10L, 3, sleep = rec.sleep)(() => Failed("cancelled")) == Left("cancelled"))
  }

  test("runWithRetries re-triggers on failed runs and failed triggers, up to the cap") {
    val rec = new Recorder
    // attempt 1: trigger dies; attempt 2: run fails; attempt 3: succeeds
    val triggers = Iterator(None, Some("r1"), Some("r2"))
    val out = runWithRetries[String](maxRetries = 3, 10L, 5, sleep = rec.sleep)(
      () => triggers.next()) {
      case "r1" => Failed("Failed")
      case "r2" => Done("data")
      case other => fail(s"unexpected run $other")
    }
    assert(out == Right("data"))
  }

  test("runWithRetries surfaces the last error after exhausting attempts") {
    val rec = new Recorder
    val out = runWithRetries[String](maxRetries = 1, 10L, 2, sleep = rec.sleep)(
      () => Some("rX"))(_ => Failed("Cancelled"))
    assert(out == Left("gave up after 2 attempts: run rX: Cancelled"))
  }
}
