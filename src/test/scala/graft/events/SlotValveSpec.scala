package graft.events

import org.scalatest.funsuite.AnyFunSuite
import SlotValve._

/** Exhaustive matrix over the valve's threshold table and drain state
  * machine — every level × state cell, the way ClassifierSpec covers
  * every verdict reason (reference thresholds:
  * docs/DESIGN_fivetran_slot_safety_valve.md:43-58). */
class SlotValveSpec extends AnyFunSuite {

  test("threshold ladder matches the documented per-instance GiB values") {
    // mpdx cap 100: act 50, warn 70, crit 90 — inclusive boundaries
    assert(level(49.999, 100.0) == "below_act")
    assert(level(50.0, 100.0) == "act")
    assert(level(69.999, 100.0) == "act")
    assert(level(70.0, 100.0) == "warn")
    assert(level(89.999, 100.0) == "warn")
    assert(level(90.0, 100.0) == "crit")
    assert(level(100.0, 100.0) == "crit")
    // global-registry caps 75: act 37.5, warn 52.5, crit 67.5
    assert(level(37.4, 75.0) == "below_act")
    assert(level(37.5, 75.0) == "act")
    assert(level(52.5, 75.0) == "warn")
    assert(level(67.5, 75.0) == "crit")
  }

  test("instance table is the reviewed map — caps and active connectors") {
    assert(Instances("mpdx-api-prod").capGib == 100.0)
    assert(Instances("global-registry-prod").capGib == 75.0)
    assert(Instances("global-registry-flat-prod").capGib == 75.0)
    assert(Instances.values.map(_.connectorId).toSet.size == 3) // distinct actives
  }

  test("full level x state decision matrix") {
    val states = Seq(Syncing, Paused, Broken, Healthy)
    for (lag <- Seq(55.0, 72.0, 95.0)) { // act, warn, crit on mpdx
      val byState = states.map(s => s -> decide("mpdx-api-prod", lag, s)).toMap
      // syncing: no-op, no actions, no signal (duplicate-trigger guard)
      assert(byState(Syncing).noOp && byState(Syncing).actions.isEmpty
        && byState(Syncing).signal.isEmpty && byState(Syncing).reason == "sync_in_flight")
      // paused: resume THEN force-sync, in that order
      assert(!byState(Paused).noOp
        && byState(Paused).actions == Seq("resume", "force_sync"))
      // broken: stop — no futile sync, structured failure signal emitted
      assert(byState(Broken).noOp && byState(Broken).actions.isEmpty
        && byState(Broken).signal.contains("valve_stop_broken:mpdx-api-prod"))
      // healthy: force-sync only
      assert(!byState(Healthy).noOp && byState(Healthy).actions == Seq("force_sync"))
      // every decision resolves the connector from the reviewed table
      states.foreach(s => assert(byState(s).connectorId.contains("loft_unabashed")))
    }
  }

  test("below the act threshold the valve never moves, whatever the state") {
    for (s <- Seq(Syncing, Paused, Broken, Healthy)) {
      val d = decide("global-registry-prod", 10.0, s)
      assert(d.level == "below_act" && d.noOp && d.actions.isEmpty
        && d.reason == "below_threshold")
    }
  }

  test("unknown instance refuses with a misconfiguration signal, never guesses") {
    val d = decide("mpdx-api-staging", 99.0, Healthy)
    assert(d.level == "invalid" && d.noOp && d.actions.isEmpty)
    assert(d.connectorId.isEmpty)
    assert(d.signal.contains("valve_misconfigured:mpdx-api-staging"))
  }

  test("invalid lag readings refuse with a bad-reading signal") {
    val d = decide("mpdx-api-prod", -1.0, Healthy)
    assert(d.level == "invalid" && d.noOp && d.actions.isEmpty)
    assert(d.signal.contains("valve_bad_reading:mpdx-api-prod"))
  }

  test("schedule-neutral: no decision in the whole matrix mutates scheduling") {
    val allowed = Set("resume", "force_sync")
    for {
      inst <- Instances.keys ++ Seq("nope")
      lag <- Seq(-1.0, 0.0, 30.0, 40.0, 55.0, 72.0, 95.0, 200.0)
      st <- Seq(Syncing, Paused, Broken, Healthy)
      d = decide(inst, lag, st)
    } {
      assert(d.actions.forall(allowed), s"$inst $lag $st -> ${d.actions}")
      // and a no-op decision carries no mutations at all
      if (d.noOp) assert(d.actions.isEmpty)
    }
  }
}
