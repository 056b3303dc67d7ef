package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}

/** Token-budget sequence packing (builder brief §LLM-data): group documents
  * into bins of at most `maxTokens` total tokens — the batch-construction
  * step of an LLM training pipeline (padding waste is proportional to
  * unused budget, so tighter packing = cheaper training).
  *
  * Algorithm: first-fit-decreasing PER PARTITION. Exact global FFD is
  * inherently sequential (every placement depends on all earlier ones), so
  * the scalable form runs FFD independently inside each partition and makes
  * bin ids globally unique by offsetting with the partition id. Packing
  * quality is within a whisker of global FFD when partitions hold many
  * documents (FFD is already an 11/9-OPT heuristic; partitioning costs at
  * most one under-filled bin per partition), and the whole operator is one
  * sort-within-partitions plus one mapPartitions — no shuffle beyond an
  * optional repartition for balance.
  *
  * Documents longer than `maxTokens` get a singleton bin (flagged
  * `oversize` — the caller's chunking problem, not silently dropped).
  */
object SequencePacking {

  /** Pack (idCol, tokenCol) into bins: returns one row per bin —
    * (bin_id, doc_ids array, total_tokens, n_docs, oversize).
    */
  def pack(df: DataFrame, idCol: String, tokenCol: String,
      maxTokens: Long): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    val spark = df.sparkSession
    val narrowed = df.select(col(idCol).cast("long"), col(tokenCol).cast("long"))
      // descending token count: first-fit-DECREASING inside each partition
      .sortWithinPartitions(col(tokenCol).cast("long").desc)
    val packed = narrowed.rdd.mapPartitionsWithIndex { (pid, it) =>
      // open bins as (remaining, buffer); FFD = place into the first bin
      // that fits, else open a new one
      val bins = scala.collection.mutable.ArrayBuffer[
        (Long, scala.collection.mutable.ArrayBuffer[Long])]()
      var binTotals = scala.collection.mutable.ArrayBuffer[Long]()
      it.foreach { r =>
        val id = r.getLong(0)
        val tok = r.getLong(1)
        val fit = bins.indexWhere(_._1 >= tok)
        if (fit >= 0) {
          val (rem, buf) = bins(fit)
          buf += id
          bins(fit) = (rem - tok, buf)
          binTotals(fit) += tok
        } else {
          // oversize docs open a bin with negative remaining — it can
          // never fit another doc, i.e. a flagged singleton
          bins += ((maxTokens - tok, scala.collection.mutable.ArrayBuffer(id)))
          binTotals += tok
        }
      }
      bins.iterator.zipWithIndex.map { case ((_, buf), i) =>
        Row(pid.toLong << 32 | i.toLong, buf.toArray.toSeq, binTotals(i),
          buf.length.toLong, binTotals(i) > maxTokens)
      }
    }
    spark.createDataFrame(packed, StructType(Seq(
      StructField("bin_id", LongType),
      StructField("doc_ids", ArrayType(LongType)),
      StructField("total_tokens", LongType),
      StructField("n_docs", LongType),
      StructField("oversize", org.apache.spark.sql.types.BooleanType))))
  }

  /** Packing efficiency of a `pack` result: used budget / allocated budget
    * over non-oversize bins (one tiny aggregate).
    */
  def efficiency(bins: DataFrame, maxTokens: Long): Double = {
    val r = bins.filter(!col("oversize"))
      .agg(sum(col("total_tokens")).as("used"), count(lit(1)).as("nbins"))
      .first()
    if (r.isNullAt(1) || r.getLong(1) == 0L) 1.0
    else r.getLong(0).toDouble / (r.getLong(1) * maxTokens)
  }

  /** Deterministic NEXT-FIT packing per group: within each `keyCol` group,
    * rows in `idCol` order fill a bin until the next row would overflow,
    * then a fresh bin opens (an item larger than the budget occupies its
    * own bin). Unlike the partition-local FFD above — which optimizes
    * bin count but yields partitioning-dependent bin ids — this layout is
    * a pure function of the data, so it is exactly replayable (q139's
    * recursive-CTE oracle) and STABLE across runs: re-packing an
    * unchanged source reproduces identical bins, which is what a
    * resumable training-data delivery needs.
    *
    * Scale shape: one hash exchange by group key, then a SECONDARY SORT —
    * `sortWithinPartitions(key, id)` puts every group's rows contiguous and
    * id-ordered inside its partition (Spark's external sort spills to disk,
    * so a giant group never has to fit in memory), and a streaming
    * `mapPartitions` fold emits rows one at a time with O(1) state (current
    * key, current bin, running total) that resets at group boundaries. No
    * per-group buffering anywhere: a billion-row source streams through one
    * task at sort speed instead of materializing in its heap.
    */
  def packGroupsSequential(df: DataFrame, keyCol: String, idCol: String,
      weightCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"), col(idCol).cast("long"),
        col(weightCol).cast("long"))
      .as[(String, Long, Long)]
      // all rows of a key into one partition, id-ordered within it: the
      // fold below never needs to look ahead or buffer
      .repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(idCol).cast("long"))
      .mapPartitions { it =>
        var curKey: String = null
        var started = false
        var bin = 0L
        var used = 0L
        it.map { case (key, id, w) =>
          if (!started || key != curKey) {
            curKey = key; started = true; bin = 0L; used = 0L
          }
          if (used + w > budget && used > 0) { bin += 1; used = 0L }
          used += w
          (key, id, w, bin)
        }
      }
      .toDF(keyCol, idCol, weightCol, "bin")
  }
}
