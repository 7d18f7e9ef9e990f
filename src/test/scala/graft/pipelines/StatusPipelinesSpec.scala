package graft.pipelines

import graft.SparkSpecBase

class StatusPipelinesSpec extends SparkSpecBase {
  import spark.implicits._

  test("GetFlaggedTiles: totals, class denominators, worst-tie fractions") {
    val flagged = Seq(
      ("2013-05-01", "12:00", "CS001", "3"),
      ("2013-05-01", "12:00", "CS002", "1"),
      ("2013-05-01", "12:00", "RS106", "5"),
      ("2013-05-01", "12:00", "DE601", "5"),
      ("2013-04-30", "12:00", "CS001", "9"), // other date — ignored
      ("2013-05-01", "12:00", "SE607", "7")) // not used — ignored
      .toDF("date", "time", "station", "ntiles")
    val used = Seq("CS001", "CS002", "RS106", "DE601").toDF("station")
    val row = GetFlaggedTiles.run(flagged, used, "2013-05-01", hba = true)
      .as[(Long, Long, Double, Int, Seq[String], Double)].head()
    assert(row._1 == 14) // 3+1+5+5
    assert(row._2 == 24 + 24 + 48 + 96)
    assert(math.abs(row._3 - 14.0 / 192.0) < 1e-12)
    assert(row._4 == 5)
    assert(row._5 == Seq("DE601", "RS106")) // tie kept, sorted
    // worst set has an RS but no CS → denominator 48
    assert(math.abs(row._6 - 5.0 / 48.0) < 1e-12)
  }

  test("GetFlaggedTiles aborts on missing coverage and conflicting lines") {
    val flagged = Seq(("2013-05-01", "12:00", "CS001", "3"))
      .toDF("date", "time", "station", "ntiles")
    val used = Seq("CS001", "CS002").toDF("station")
    // CS002 has no flagged-info line → the reference exits; we throw
    intercept[IllegalArgumentException] {
      GetFlaggedTiles.run(flagged, used, "2013-05-01", hba = true).collect()
    }
    val conflicting = Seq(
      ("2013-05-01", "12:00", "CS001", "3"),
      ("2013-05-01", "13:00", "CS001", "4"))
      .toDF("date", "time", "station", "ntiles")
    intercept[IllegalArgumentException] {
      GetFlaggedTiles.run(conflicting, Seq("CS001").toDF("station"),
        "2013-05-01", hba = true).collect()
    }
  }

  test("GetState: as-of state per element, OFF above value 10") {
    val lines = Seq(
      "LOFAR.PIC.Core.CS002.HBA01.status|20|2020-01-01 10:00:00|x",
      "LOFAR.PIC.Core.CS002.HBA01.status|5|2020-02-01 10:00:00|x",
      "LOFAR.PIC.Core.CS002.HBA02.status|3|2020-01-05 10:00:00|x",
      "LOFAR.PIC.Remote.RS106.LBA003.status|99|2020-03-01 09:00:00|x", // after
      "not a state line").toDF("value")
    val events = GetState.parseLog(lines)
    assert(events.count() == 4)
    // mid-January: HBA01 latest event says 20 → off; HBA02 on;
    // RS106 LBA element has no event yet → absent
    val jan = GetState.stateAt(events, "2020-01-15 00:00:00")
      .select($"station", $"element", $"state")
      .as[(String, String, String)].collect().toSet
    assert(jan == Set(("CS002", "01", "off"), ("CS002", "02", "on")))
    // after February the value-5 event flips HBA01 back on
    val mar = GetState.stateAt(events, "2020-03-02 00:00:00")
      .select($"station", $"element", $"state")
      .as[(String, String, String)].collect().toSet
    assert(mar == Set(("CS002", "01", "on"), ("CS002", "02", "on"),
      ("RS106", "003", "off")))
    val off = GetState.antennasOff(events, "2020-01-15 00:00:00")
      .as[(String, String, Seq[String], Long)].head()
    assert(off == (("CS002", "HBA", Seq("01"), 1L)))
  }

  test("StatusMap: chisq log joins geo and classifies zoom groups") {
    val lines = Seq(
      "# comment",
      "plot file=/p/L1_CS002HBA0_B0329.pfd.png obs=L1_SAP0_CS002HBA0_ar S/N=12.5",
      "plot file=/p/L1_RS106HBA_B0329.pfd.png obs=L1_SAP0_RS106HBA_ar S/N=",
      "plot file=/p/L1_DE601HBA_B0329.pfd.png obs=L1_SAP0_DE601HBA_ar S/N=3.25")
      .toDF("value")
    val geo = Seq(("CS002", 52.91, 6.87), ("RS106", 52.85, 6.90),
      ("DE601", 50.52, 6.88)).toDF("station", "lat", "lon")
    val rows = StatusMap.run(lines, geo)
      .select($"station", $"snr", $"zoom", $"lat")
      .as[(String, Double, String, Double)].collect().toSet
    assert(rows == Set(
      ("CS002", 12.5, "core", 52.91),
      ("RS106", 0.0, "remote", 52.85), // empty S/N → 0
      ("DE601", 3.25, "intl", 50.52)))
  }
}
