package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSpec extends SparkSpec {
  import spark.implicits._

  // three shards with engineered overlap: A∩B = 0..199 (of 0..399 each),
  // C disjoint from both
  private def data = (
    (0 until 400).map(v => ("A", v.toLong)) ++
    (200 until 600).map(v => ("B", v.toLong)) ++
    (10000 until 10400).map(v => ("C", v.toLong))
  ).toDF("shard", "v")

  private def md5Of(v: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(v.toString.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  test("sketch holds exactly the k smallest distinct hashes per shard") {
    val got = Kmv.sketch(data, "shard", "v", k = 16)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    for ((shard, lo, hi) <- Seq(("A", 0, 400), ("B", 200, 600), ("C", 10000, 10400))) {
      val expect = (lo until hi).map(v => md5Of(v.toLong)).sorted.take(16)
      assert(got(shard) == expect, s"shard $shard sketch mismatch")
    }
  }

  test("salting never changes the sketch (two-level min-k == global min-k)") {
    val s1 = Kmv.sketch(data, "shard", "v", k = 32, salts = 1)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val s16 = Kmv.sketch(data, "shard", "v", k = 32, salts = 16)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(s1 == s16)
  }

  test("duplicate values collapse before min-k (sketch is over the SET)") {
    val dup = data.union(data) // every row twice
    val a = Kmv.sketch(data, "shard", "v", k = 16).orderBy("shard")
      .collect().map(_.getSeq[String](1)).toSeq
    val b = Kmv.sketch(dup, "shard", "v", k = 16).orderBy("shard")
      .collect().map(_.getSeq[String](1)).toSeq
    assert(a == b)
  }

  test("pairwise overlap: identical shards estimate Jaccard 1, disjoint 0") {
    val two = data.filter($"shard" =!= "B")
      .union(data.filter($"shard" === "A").withColumn("shard", lit("A2")))
    val got = Kmv.shardOverlap(two, "shard", "v", k = 32)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val (ukAA, bkAA) = got(("A", "A2"))
    assert(ukAA == 32 && bkAA == 32, "identical shards must fully overlap")
    val (_, bkAC) = got(("A", "C"))
    assert(bkAC == 0, "disjoint shards must not overlap")
  }

  test("sketchHashed merges partial sketches exactly (min-k mergeability)") {
    val full = Kmv.sketch(data, "shard", "v", k = 24)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    // sketch two halves independently, then merge by explode + re-select
    val half1 = Kmv.sketch(data.filter($"v" % 2 === 0), "shard", "v", k = 24)
    val half2 = Kmv.sketch(data.filter($"v" % 2 === 1), "shard", "v", k = 24)
    val merged = Kmv.sketchHashed(
      half1.union(half2).select(col("shard"), explode(col("kmv")).as("h")), k = 24)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(merged == full)
  }

  test("Jaccard estimate tracks the true overlap (A,B share 1/3 of union)") {
    val est = Kmv.shardOverlap(data, "shard", "v", k = 128)
      .filter($"shard_a" === "A" && $"shard_b" === "B")
      .head().getAs[Double]("jaccard_est")
    // true J(A,B) = 200/600 = 1/3; k=128 of 600 keeps the estimator tight
    assert(math.abs(est - 1.0 / 3) < 0.12, s"estimate $est far from 1/3")
  }
}
