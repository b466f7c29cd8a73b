package graft.sources

import scala.annotation.tailrec

/** T4 — poll-with-backoff job await (reference:
  * okta-sync/okta_sync_utils.py:541-611 `dbt_run`'s trigger/poll/retry
  * ladder; fivetran-trigger/fivetran_client.py:80-118
  * `wait_for_completion`). The survey delegates this to the scheduler
  * tier — it stays a DRIVER-side utility (never per-row or per-task:
  * an executor that sleeps holds a core), provided here so the engine's
  * operator inventory is closed end to end.
  *
  * Clock-injectable (`sleep`) so specs verify the schedule without
  * wall-clock time; `interval` mirrors the reference's fixed 30 s poke,
  * `backoffMult` generalises it (1.0 = the reference's behavior).
  */
object Poller {

  sealed trait Status[+T]
  /** Terminal success (dbt status 10). */
  final case class Done[T](value: T) extends Status[T]
  /** Still queued/starting/running (dbt 0/1/2/3). */
  case object Pending extends Status[Nothing]
  /** Terminal failure/cancel (dbt 20/30) — retriable by a new trigger. */
  final case class Failed(reason: String) extends Status[Nothing]

  /** Await one run: poll `status` every `interval` (scaled by
    * `backoffMult` each poll) until terminal or `maxPolls` exhausted. */
  def await[T](interval: Long, maxPolls: Int, backoffMult: Double = 1.0,
               sleep: Long => Unit = Thread.sleep)(status: () => Status[T]): Either[String, T] = {
    require(interval > 0 && maxPolls > 0 && backoffMult >= 1.0,
      s"bad schedule: interval=$interval maxPolls=$maxPolls mult=$backoffMult")
    @tailrec def loop(n: Int, wait: Long): Either[String, T] =
      if (n >= maxPolls) Left(s"still pending after $maxPolls polls")
      else {
        sleep(wait) // poll AFTER the first sleep, like the reference
        status() match {
          case Done(v)        => Right(v)
          case Failed(reason) => Left(reason)
          case Pending        => loop(n + 1, math.ceil(wait * backoffMult).toLong)
        }
      }
    loop(0, interval)
  }

  /** The full trigger + await + retry ladder: start a run, await it,
    * re-trigger on failure (or on a failed trigger) up to `maxRetries`
    * additional attempts — the reference's outer `while retries <=
    * max_retries` loop. */
  def runWithRetries[T](maxRetries: Int, interval: Long, maxPolls: Int,
                        backoffMult: Double = 1.0, sleep: Long => Unit = Thread.sleep)(
      trigger: () => Option[String])(status: String => Status[T]): Either[String, T] = {
    require(maxRetries >= 0, s"maxRetries must be >= 0: $maxRetries")
    @tailrec def attempt(n: Int, lastErr: String): Either[String, T] =
      if (n > maxRetries) Left(s"gave up after ${maxRetries + 1} attempts: $lastErr")
      else trigger() match {
        case None => attempt(n + 1, "trigger failed to start a run")
        case Some(runId) =>
          await(interval, maxPolls, backoffMult, sleep)(() => status(runId)) match {
            case Right(v)  => Right(v)
            case Left(err) => attempt(n + 1, s"run $runId: $err")
          }
      }
    attempt(0, "")
  }
}
