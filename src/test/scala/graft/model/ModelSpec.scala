package graft.model

import java.nio.file.Files
import graft.SparkSpecBase
import graft.operators.{Cube, CubeFixture, ProfileOps}
import graft.sources.Sinks

class ModelSpec extends SparkSpecBase {

  test("typed views catch schema drift at analysis time and round-trip values") {
    val cube = CubeFixture.build(spark, CubeFixture.Spec(
      nsubint = 2, nchan = 4, nbin = 16, zapped = Seq((0, 3), (1, 2))))
    val s = Model.samples(cube)
    assert(s.head().obs_id == "L123456")
    assert(s.count() == 2 * 4 * 16)
    val w = Model.weights(cube)
    assert(w.filter((r: WeightRow) => r.weight == 0.0).count() == 2)
  }

  test("typed cube persists and reloads through the partitioned sink") {
    val dir = Files.createTempDirectory("graft-model")
    val cube = CubeFixture.build(spark, CubeFixture.Spec(nsubint = 2, nchan = 4, nbin = 16))
    Sinks.cubeParquet(cube.samples, dir.resolve("samples").toString)
    Sinks.cubeParquet(cube.weights, dir.resolve("weights").toString)
    val back = Model.loadCube(spark,
      dir.resolve("samples").toString, dir.resolve("weights").toString)
    assert(back.samples.count() == cube.samples.count())
    // operators compose on the reloaded cube
    val prof = ProfileOps.totalProfile(back)
    assert(prof.count() == 16)
  }
}
