package graft

import org.apache.spark.sql.functions._
import graft.operators.Shard

class ShardSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = (1L to 400L).map(i => (i, s"text$i"))
    .toDF("doc_id", "text")

  test("trainingOrder is a deterministic permutation: every doc exactly " +
    "once, positions dense per shard, identical across runs") {
    val a = Shard.trainingOrder(docs, "epoch0", nShards = 8)
      .orderBy("shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val b = Shard.trainingOrder(docs, "epoch0", nShards = 8)
      .orderBy("shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(a.toSeq === b.toSeq)
    assert(a.map(_._1).toSet === (1L to 400L).toSet)
    // positions are 1..count(shard) with no gaps
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.length).toSeq)
    }
    // every shard in [0, 8) is populated at this size and the draw is
    // not wildly skewed (uniform 1/8 ± generous slack)
    val sizes = a.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.keySet === (0 until 8).toSet)
    sizes.values.foreach(n => assert(n > 20 && n < 80, sizes.toString))
  }

  test("a new seed is an independent permutation (order actually changes)") {
    val e0 = Shard.trainingOrder(docs, "epoch0", 4)
      .orderBy("shard", "pos").select("doc_id").as[Long].collect()
    val e1 = Shard.trainingOrder(docs, "epoch1", 4)
      .orderBy("shard", "pos").select("doc_id").as[Long].collect()
    assert(e0.toSet === e1.toSet)
    assert(e0.toSeq !== e1.toSeq)
  }

  test("shardedForWrite carries payload, lands one sorted partition per " +
    "shard, and survives a round-trip through partitioned parquet") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_shard").toString + "/corpus"
    Shard.shardedForWrite(docs, "epoch0", nShards = 4)
      .write.partitionBy("shard").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() === 400)
    assert(back.select("shard").distinct().as[Int]
      .collect().sorted.toSeq === Seq(0, 1, 2, 3))
    // payload preserved and (shard, pos) agrees with trainingOrder
    val expected = Shard.trainingOrder(docs, "epoch0", 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val got = back.select("doc_id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got === expected)
    assert(back.where(col("text") === "text7").count() === 1)
  }

  test("nShards bounds are enforced") {
    val e = intercept[IllegalArgumentException] {
      Shard.trainingOrder(docs, "s", nShards = 5000)
    }
    assert(e.getMessage.contains("out of [1,4096]"))
  }
}
