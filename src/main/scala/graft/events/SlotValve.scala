package graft.events

/** Replication-slot safety-valve decision logic — a pure-Scala port of
  * the reference's documented rules engine (reference:
  * docs/DESIGN_fivetran_slot_safety_valve.md:41-92): when a Postgres
  * WAL slot backs up behind a paused/broken CDC connector, a
  * detection-side monitor fires BELOW the human warning and the valve
  * decides whether (and how) to drain the slot by forcing a sync.
  *
  * Like [[Classifier]], everything decision-shaped is pure and
  * driver-side (unit-testable, no I/O): the caller feeds the observed
  * slot lag and connector state, the valve returns a structured
  * decision; transports (webhook ingress, the sync POST) live
  * elsewhere.
  *
  * Threshold ladder (DESIGN:43-58 — per-instance caps; act fires
  * below the 70% human warning so the valve can self-heal first):
  *   act = 50% of cap · warn = 70% (humans paged) · crit = 90%.
  *
  * Drain state machine on an act-or-above trigger (DESIGN:85-92):
  *   syncing → no-op (a drain is already in flight; firing again would
  *             stack redundant syncs — this IS the cooldown/duplicate
  *             -trigger guard for at-least-once delivery);
  *   paused  → resume, then force-sync;
  *   broken  → stop + structured failure signal (a forced sync cannot
  *             drain a broken connector; never attempt a repair);
  *   healthy → force-sync.
  *
  * Required properties, both spec-pinned (ValveSpec):
  *  - Schedule-neutral: no decision ever mutates schedule_type; the
  *    only deliberate connector mutation is resuming a paused one.
  *  - The instance→connector map is a hard-coded, reviewed table
  *    (DESIGN:62-70), never inferred at runtime — instances host dead
  *    twin connectors and only the active one may be synced.
  */
object SlotValve {

  /** One guarded RDS instance: WAL-slot cap and its ACTIVE connector
    * (dead twins excluded by review, not by runtime inference). */
  final case class Instance(name: String, capGib: Double, connectorId: String)

  /** The reviewed instance table (DESIGN:43-47,62-70): caps 100 GiB
    * (mpdx) / 75 GiB (both global-registry instances). */
  val Instances: Map[String, Instance] = Seq(
    Instance("mpdx-api-prod", 100.0, "loft_unabashed"),
    Instance("global-registry-prod", 75.0, "centralized_mitigation"),
    Instance("global-registry-flat-prod", 75.0, "freebee_tuberculosis")
  ).map(i => i.name -> i).toMap

  /** Valve trigger threshold as a fraction of cap — deliberately below
    * the 70% human-warning monitor so the valve acts first. */
  val ActFraction = 0.5
  val WarnFraction = 0.7
  val CritFraction = 0.9

  sealed trait ConnectorState
  case object Syncing extends ConnectorState
  case object Paused extends ConnectorState
  case object Broken extends ConnectorState
  case object Healthy extends ConnectorState

  /** What the valve decided. `actions` is the ordered mutation list the
    * mechanism may apply — it never contains a schedule mutation.
    * `signal` is the structured failure signal for detection-side
    * alerting to consume (DESIGN: emit on stop, never page directly). */
  final case class Decision(
      level: String, // below_act | act | warn | crit | invalid
      actions: Seq[String], // of: resume, force_sync
      noOp: Boolean,
      reason: String,
      connectorId: Option[String] = None,
      signal: Option[String] = None)

  /** Severity level from observed lag alone (pure threshold ladder).
    * Boundary rule: thresholds are inclusive (at exactly 50% the valve
    * acts — the monitor fires "at" the threshold). */
  def level(lagGib: Double, capGib: Double): String =
    if (lagGib < 0 || capGib <= 0) "invalid"
    else if (lagGib >= capGib * CritFraction) "crit"
    else if (lagGib >= capGib * WarnFraction) "warn"
    else if (lagGib >= capGib * ActFraction) "act"
    else "below_act"

  /** The full valve decision for one observed (instance, lag, state).
    *
    * An unknown instance is a configuration fault, not a drain target:
    * the valve refuses (no-op + failure signal) rather than guessing a
    * connector (DESIGN:68-70). Below the act threshold the valve does
    * nothing — detection should not have fired, and acting on a
    * healthy-lag slot would stack syncs ahead of schedule. */
  def decide(instanceName: String, lagGib: Double, state: ConnectorState): Decision =
    Instances.get(instanceName) match {
      case None =>
        Decision("invalid", Nil, noOp = true, reason = "unknown_instance",
          signal = Some(s"valve_misconfigured:$instanceName"))
      case Some(inst) =>
        val lvl = level(lagGib, inst.capGib)
        lvl match {
          case "invalid" =>
            Decision(lvl, Nil, noOp = true, reason = "invalid_lag",
              connectorId = Some(inst.connectorId),
              signal = Some(s"valve_bad_reading:$instanceName"))
          case "below_act" =>
            Decision(lvl, Nil, noOp = true, reason = "below_threshold",
              connectorId = Some(inst.connectorId))
          case _ =>
            state match {
              case Syncing =>
                Decision(lvl, Nil, noOp = true, reason = "sync_in_flight",
                  connectorId = Some(inst.connectorId))
              case Paused =>
                Decision(lvl, Seq("resume", "force_sync"), noOp = false,
                  reason = "resume_then_drain", connectorId = Some(inst.connectorId))
              case Broken =>
                Decision(lvl, Nil, noOp = true, reason = "broken_connector",
                  connectorId = Some(inst.connectorId),
                  signal = Some(s"valve_stop_broken:$instanceName"))
              case Healthy =>
                Decision(lvl, Seq("force_sync"), noOp = false, reason = "drain",
                  connectorId = Some(inst.connectorId))
            }
        }
    }
}
