package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {

  import spark.implicits._

  private lazy val big = (1L to 1000L).map(k => (k, s"row$k")).toDF("k", "payload")
  private lazy val small = (1L to 1000L).filter(_ % 17 == 0).map(k => (k, "dim"))
    .toDF("sk", "attr")

  test("bloomSemiJoin equals the plain semi-join (long keys)") {
    val got = BloomJoin.bloomSemiJoin(big, small, "k", "sk", expectedItems = 100)
      .select("k").as[Long].collect().sorted
    val expected = big.join(small.select($"sk".as("k")).distinct(), Seq("k"), "left_semi")
      .select("k").as[Long].collect().sorted
    assert(got.toSeq == expected.toSeq && got.nonEmpty)
    assert(got.forall(_ % 17 == 0))
  }

  test("bloomAntiJoin equals the plain anti-join (long keys)") {
    val got = BloomJoin.bloomAntiJoin(big, small, "k", "sk", expectedItems = 100)
      .select("k").as[Long].collect().sorted
    assert(got.length == 1000 - 58 && got.forall(_ % 17 != 0))
  }

  test("string keys probe the filter's string path") {
    val bigS = big.select(concat(lit("u"), $"k").as("k"), $"payload")
    val smallS = small.select(concat(lit("u"), $"sk").as("sk"))
    val got = BloomJoin.bloomSemiJoin(bigS, smallS, "k", "sk", expectedItems = 100)
      .select("k").as[String].collect().toSet
    val expected = bigS.join(smallS.select($"sk".as("k")).distinct(), Seq("k"), "left_semi")
      .select("k").as[String].collect().toSet
    assert(got == expected && got.contains("u17"))
  }

  test("prefiltered keeps every true match (no false negatives)") {
    val pre = BloomJoin.prefiltered(big, small, "k", "sk",
        expectedItems = 100, fpp = 0.5) // deliberately sloppy filter
      .select("k").as[Long].collect().toSet
    assert((1L to 1000L).filter(_ % 17 == 0).forall(pre.contains))
  }
}
