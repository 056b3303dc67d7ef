package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Ann

/** Streaming embedding near-duplicate detection — the ingestion-time
  * counterpart of `operators.Ann.cosineNearDupPairs` (batch, q35/q64): as
  * vectors arrive, each is checked against previously-seen vectors that
  * share a sign-LSH band bucket, and verified matches (exact cosine ≥
  * `minSim`) are emitted as a match stream.
  *
  * Spark-first shape: the banded projection reuses the SAME fused
  * `SignProjectionBits` kernel and portable hyperplane family as the batch
  * operator (one projection pass per row, band buckets sliced from the
  * packed bits), then `flatMapGroupsWithState` keyed by (band, bucket)
  * holds a bounded per-bucket vector list. State is the LSH index itself —
  * per key at most `maxPerBucket` embeddings (FIFO eviction, the same
  * hot-bucket cap philosophy as the batch `maxBucketSize`), so state size
  * is bounded by live-bucket count × cap, never by stream length.
  *
  * Output: one row per (band, verified pair) — a pair that collides in
  * several bands emits once per band; downstream consumers dedup with
  * `dropDuplicates("da","db")` (itself a streaming op) or feed the match
  * stream into the periodic batch clustering (q64) for survivor selection.
  * Within a micro-batch, rows are processed in ascending id order, so the
  * match stream is deterministic for a given batching.
  */
object AnnStreams {

  /** One banded input row. */
  private[streaming] final case class BandedVec(
      band: Int, bucket: Long, id: Long, emb: Array[Float])

  /** One verified near-dup match (da < db by id). */
  final case class NearDupMatch(da: Long, db: Long, band: Int, sim: Double)

  /** Bounded per-bucket state: insertion-ordered (id, embedding) pairs. */
  private[streaming] final case class BucketState(
      ids: List[Long], embs: List[Array[Float]])

  private[streaming] def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** The match stream. `vectors` must have `idCol` (long) and `embCol`
    * (array<float>). Works identically on a batch frame (Spark runs the
    * stateful function once with empty initial state), which is what the
    * batch-equivalence spec asserts.
    */
  def nearDupMatches(vectors: DataFrame, idCol: String, embCol: String,
      minSim: Double, bands: Int = 8, planesPerBand: Int = 6,
      dim: Int = 64, maxPerBucket: Int = 256): Dataset[NearDupMatch] = {
    require(bands * planesPerBand <= 63,
      "plane family must pack into one long (bands * planesPerBand <= 63)")
    val spark = vectors.sparkSession
    import spark.implicits._
    val planes = Ann.portableHyperplanes(dim, bands * planesPerBand)
    val mask = (1L << planesPerBand) - 1L
    val slices = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("__bits"), b * planesPerBand)
          .bitwiseAND(mask).as("bucket"))
    }
    val banded = vectors
      .select(col(idCol).cast("long").as("id"), col(embCol).as("emb"))
      .select(col("id"), col("emb"),
        Ann.bucketIdPortable(col("emb"), planes).as("__bits"))
      .select(col("id"), col("emb"), explode(array(slices: _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.bucket").as("bucket"),
        col("id"), col("emb"))
      .as[BandedVec]

    banded
      .groupByKey(v => (v.band, v.bucket))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(processBucket(minSim, maxPerBucket))
  }

  private def processBucket(minSim: Double, maxPerBucket: Int)(
      key: (Int, Long), rows: Iterator[BandedVec],
      state: GroupState[BucketState]): Iterator[NearDupMatch] = {
    var st = state.getOption.getOrElse(BucketState(Nil, Nil))
    val out = List.newBuilder[NearDupMatch]
    // ascending id order totalizes within-batch processing, so the emitted
    // match set is deterministic for a given micro-batching
    rows.toSeq.sortBy(_.id).foreach { v =>
      st.ids.iterator.zip(st.embs.iterator).foreach { case (oid, oemb) =>
        if (oid != v.id) {
          val sim = cosine(oemb, v.emb)
          if (sim >= minSim)
            out += NearDupMatch(math.min(oid, v.id), math.max(oid, v.id),
              key._1, sim)
        }
      }
      // FIFO cap: newest-first lists, truncated at the bucket budget
      st = BucketState((v.id :: st.ids).take(maxPerBucket),
        (v.emb :: st.embs).take(maxPerBucket))
    }
    state.update(st)
    out.result().iterator
  }
}
