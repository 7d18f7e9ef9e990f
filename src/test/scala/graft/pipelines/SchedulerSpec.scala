package graft.pipelines

import graft.SparkSpecBase
import Scheduler._

class SchedulerSpec extends SparkSpecBase {
  import spark.implicits._

  // 8-hour slot; wide tolerance so the hand-computed fixture exercises the
  // slot-search geometry rather than the tolerance gate; horizon disabled
  // (elevation behavior is covered by AstroFunctionsSpec).
  private val cfg = Config(startMjd = 56000.0, endMjd = 56000.0 + 480.0 / 1440.0,
    horizonDeg = -91.0, transitToleranceMin = 120.0, gapMin = 1)

  private def sc(name: String, score: Double, obstime: Int,
                 transitMin: Double): Scored =
    Scored(name, 0.0, 52.0, obstime, score, cfg.startMjd + transitMin / 1440.0)

  test("greedy placement matches the hand-computed fixture") {
    val scored = Seq(
      sc("A", 100.0, 120, 240.0), // anchor at transit: [180, 300]
      sc("B", 90.0, 120, 250.0),  // conflicts with A → best gap right of A
      sc("C", 80.0, 60, 60.0),    // free slot, placed at transit: [30, 90]
      sc("D", 70.0, 400, 240.0),  // no gap of 400+2 min left → rejected
      sc("E", 60.0, 60, 10.0))    // clamped to [0,60], conflicts with C → [91,151]
    val placed = greedyPlace(scored, cfg)
    val byName = placed.map(p => p.name -> (p.startMin, p.endMin)).toMap
    assert(byName("A") === ((180, 300)))
    assert(byName("B") === ((301, 421)))
    assert(byName("C") === ((30, 90)))
    assert(!byName.contains("D"))
    assert(byName("E") === ((91, 151)))
    // output ordered by start time (`bfscheduler.py:500-506`)
    assert(placed.map(_.startMin) === placed.map(_.startMin).sorted)
  }

  test("tolerance gate rejects scans that drift too far from transit") {
    val tight = cfg.copy(transitToleranceMin = 60.0)
    val scored = Seq(
      sc("A", 100.0, 120, 240.0),
      sc("B", 90.0, 120, 250.0)) // best alternative is 111 min off transit
    val placed = greedyPlace(scored, tight)
    assert(placed.map(_.name) === Seq("A"))
  }

  test("scoring stage: priority overrides, invisible targets dropped") {
    val targets = Seq(
      ("vis", 83.6, 52.9, 60, 0.0),      // transit el ~90 → scored
      ("prio", 100.0, 40.0, 60, 5.0),    // priority forces score 5
      ("below", 10.0, -60.0, 60, 0.0))   // transit el < 0 → dropped
      .toDF("name", "ra_deg", "dec_deg", "obstime_min", "priority")
    val rows = scoreTargets(targets, cfg.copy(horizonDeg = 0.0))
      .as[Scored].collect().map(r => r.name -> r).toMap
    assert(!rows.contains("below"))
    assert(rows("prio").score === 5.0)
    assert(rows("vis").score > 0.0)
    // the anchor transit is within one sidereal day of the slot start
    assert(math.abs(rows("vis").transitMjd - cfg.startMjd) < 1.0)
  }

  test("end-to-end run places visible targets and renders K9 XML") {
    val targets = Seq(
      ("psrA", 83.6, 52.9, 60, 0.0),
      ("psrB", 200.0, 30.0, 60, 0.0))
      .toDF("name", "ra_deg", "dec_deg", "obstime_min", "priority")
    val placed = Scheduler.run(targets, cfg)
    assert(placed.nonEmpty)
    val xml = renderScheduleXml("LC0_011", cfg, placed)
    assert(xml.contains("<schedule project=\"LC0_011\">"))
    placed.foreach(p => assert(xml.contains(s"<name>${p.name}</name>")))
    assert(xml.contains("<startTime>"))
  }
}
