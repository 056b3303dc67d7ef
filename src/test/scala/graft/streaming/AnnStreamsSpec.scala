package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Streaming embedding near-dup must agree with the batch operator
  * (`Ann.cosineNearDupPairs`) on the same corpus: same portable plane
  * family, same banding, same exact-cosine verification.
  */
class AnnStreamsSpec extends SparkSpec {

  // tiny corpus with two planted near-dup groups: vectors 1/2/3 are small
  // perturbations of one direction, 10/11 of another, 20 is isolated
  private def vec(seedDir: Int, jitter: Double, j: Int): Array[Float] = {
    val rnd = new scala.util.Random(seedDir)
    val base = Array.fill(64)(rnd.nextGaussian())
    val r2 = new scala.util.Random(1000 + j)
    base.map(x => (x + jitter * r2.nextGaussian()).toFloat)
  }
  private val corpus: Seq[(Long, Array[Float])] = Seq(
    1L -> vec(7, 0.05, 1), 2L -> vec(7, 0.05, 2), 3L -> vec(7, 0.05, 3),
    10L -> vec(13, 0.05, 4), 11L -> vec(13, 0.05, 5),
    20L -> vec(99, 0.0, 6))

  test("streamed matches equal the batch pair set across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val input = MemoryStream[(Long, Array[Float])]
    val q = AnnStreams.nearDupMatches(
        input.toDF().toDF("vec_id", "embedding"),
        "vec_id", "embedding", minSim = 0.9)
      .writeStream.format("memory").queryName("ann_matches")
      .outputMode("append").start()
    // split the corpus across micro-batches so matches must cross batch
    // boundaries through state
    input.addData(corpus.take(2): _*)
    q.processAllAvailable()
    input.addData(corpus.drop(2): _*)
    q.processAllAvailable()
    q.stop()

    val streamed = s.table("ann_matches")
      .select($"da", $"db").distinct()
      .as[(Long, Long)].collect().toSet

    val batch = graft.operators.Ann.cosineNearDupPairs(
        corpus.toDF("vec_id", "embedding"), "vec_id", "embedding",
        minSim = 0.9, bands = 8, planesPerBand = 6, portable = true)
      .select($"da", $"db").as[(Long, Long)].collect().toSet

    assert(batch.nonEmpty, "test corpus planted no near-dups")
    assert(streamed == batch,
      s"stream $streamed != batch $batch")
  }

  test("bucket cap bounds state and drops only capped-bucket matches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val input = MemoryStream[(Long, Array[Float])]
    val q = AnnStreams.nearDupMatches(
        input.toDF().toDF("vec_id", "embedding"),
        "vec_id", "embedding", minSim = 0.9, maxPerBucket = 1)
      .writeStream.format("memory").queryName("ann_capped")
      .outputMode("append").start()
    // three near-identical vectors, one per batch: with cap 1, each batch
    // sees only the previous vector in state — (1,2) and (2,3) match but
    // (1,3) cannot (1 was evicted), which is exactly the documented trade
    input.addData(corpus.take(1): _*); q.processAllAvailable()
    input.addData(corpus.slice(1, 2): _*); q.processAllAvailable()
    input.addData(corpus.slice(2, 3): _*); q.processAllAvailable()
    q.stop()

    val pairs = s.table("ann_capped")
      .select($"da", $"db").distinct().as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (2L, 3L)), s"got $pairs")
  }
}
