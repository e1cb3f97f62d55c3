package graft.util

import graft.SparkSpec

class CollectsSpec extends SparkSpec {

  import spark.implicits._

  test("boundedCollect returns rows under the cap") {
    val df = (1 to 5).toDF("x")
    assert(Collects.boundedCollect(df, "test side", "an-alternative", max = 10).length == 5)
  }

  test("boundedCollect fails loud (not OOM) over the cap, naming the scale-safe alternative") {
    val df = (1 to 20).toDF("x")
    val e = intercept[IllegalArgumentException] {
      Collects.boundedCollect(df, "test side", "SpatialJoin.quadkeyRefineJoin", max = 10)
    }
    assert(e.getMessage.contains("quadkeyRefineJoin"))
    assert(e.getMessage.contains("test side"))
  }
}
