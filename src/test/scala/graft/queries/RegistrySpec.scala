package graft.queries

import graft.SparkSpecBase

class RegistrySpec extends SparkSpecBase {

  test("query names are unique and follow the qNN_ convention") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    assert(names.forall(_.matches("q\\d+_[a-z0-9_]+")), "bad name format")
  }

  test("every query declares a DuckDB oracle (full correctness gate)") {
    val missing = Registry.all.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("every query carries SURVEY §2 operator tags") {
    val untagged = Registry.all.filter(_.tags.isEmpty).map(_.name)
    assert(untagged.isEmpty, s"untagged queries: $untagged")
  }

  test("flagship entry query exists") {
    assert(Registry.byName.contains("q02_superquery_union"))
  }

  test("a sample of queries runs end-to-end on sf0.001 with rows > 0") {
    val sf = "/root/testdata/sf0.001"
    // one per batch file keeps the suite fast; Verify covers all of them
    val sample = Seq("q01_pricing_summary", "q11_islands", "q21_phase_fold",
      "q27_language_id", "q31_minhash_signature", "q39_pulsar_physics")
    sample.foreach { n =>
      val cnt = Registry.byName(n).run(spark, sf).count()
      assert(cnt > 0, s"$n returned no rows")
    }
  }
}
