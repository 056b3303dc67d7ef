package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-duplicate contraction for the pair-generating dedup family
  * (round 12 — forced by the sf10 gate, where 100 exact copies per
  * document made every posting/bucket list grow by the copy count and
  * candidate pairs by its SQUARE: the uncontracted q122 and q19 joins
  * each overflowed ~78 GB of spill disk).
  *
  * The theorem (same one the scalable DuckDB oracles are proven under,
  * tools/scalable_oracles.py): when every emitted pair statistic and
  * every threshold predicate is a pure function of the two PAYLOADS,
  * running the candidate + verify pipeline on one representative per
  * distinct payload and expanding rep pairs to member pairs afterwards is
  * exact. Identical payloads form cliques (a non-empty shingle set has
  * Jaccard 1.0 with itself; identical signatures collide in every LSH
  * band; identical nonzero vectors share every sign bucket at cosine
  * 1.0), so within-group pairs carry the payload's self-statistics, and a
  * cross-group member pair carries exactly its rep pair's numbers.
  * Expansion joins are output-sized — member pairs are the true result —
  * and carry only ids plus the bounded stat columns.
  *
  * Global frequency caps (hot-shingle / hot-bucket filters) stay exact by
  * counting MEMBER documents: each rep's postings weigh `gsize`.
  */
object Contraction {

  /** Group `df` by `key` (a pure function of payload columns; rows with
    * equal keys must be interchangeable for the caller's pair semantics).
    * Returns (members(id, rep, gsize), reps = the min-id row per group
    * with the original columns).
    */
  def byKey(df: DataFrame, idCol: String, key: Column)
      : (DataFrame, DataFrame) = {
    // members carries the id as long; a non-integral id (e.g. string doc
    // ids) would CAST to null silently and the expansion joins would then
    // drop every pair — fail loudly instead (sf10-class silent-wrong
    // guard; callers with string ids must zip a surrogate long first).
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    val idType = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"Contraction.byKey requires an integral id column; '$idCol' is " +
        s"$idType — map it to a surrogate long id before contracting")
    // Round-14 A/B note: widening this window's exchange to the fan-out
    // conf (the Dedup.pairsWithinGroups pattern) was measured and
    // REJECTED — the contraction shuffle moves full payloads (texts,
    // vectors) for EVERY family operator, and at 16-wide the family
    // regressed 8.28 -> 8.93 s (7 of 9 queries slower, CPU +40%): the
    // reps frame is consumed by one downstream persist, so the wider
    // window only buys width the operators' own kernel exchanges already
    // provide, while paying more per-task setup on the biggest shuffle.
    val w = Window.partitionBy(col("__ck"))
    val keyed = df.withColumn("__ck", key)
      .withColumn("__rep", min(col(idCol)).over(w))
      .withColumn("__gsize", count(lit(1)).over(w))
    val members = keyed.select(col(idCol).cast("long").as("id"),
      col("__rep").cast("long").as("rep"), col("__gsize").as("gsize"))
    val reps = keyed.filter(col(idCol) === col("__rep"))
      .drop("__ck", "__rep", "__gsize")
    (members, reps)
  }

  /** Member gsize weights for the representatives only: (id, gsize) with
    * id = rep — the join side for member-weighted frequency caps.
    */
  def repWeights(members: DataFrame): DataFrame =
    members.filter(col("id") === col("rep"))
      .select(col("id").as("__wid"), col("gsize").as("__w"))

  /** Expand UNDIRECTED rep pairs (da < db over rep ids) to member pairs
    * (da < db over member ids). `swap` lists column pairs that follow the
    * pair's orientation (e.g. ("na", "nb")) and are exchanged when the
    * member order flips relative to the rep order; all other columns pass
    * through unchanged.
    */
  def expandUndirected(repPairs: DataFrame, members: DataFrame,
      swap: Seq[(String, String)] = Seq.empty): DataFrame = {
    val ma = members.select(col("rep").as("da"), col("id").as("__ma"))
    val mb = members.select(col("rep").as("db"), col("id").as("__mb"))
    val flip = col("__ma") > col("__mb")
    val aux = repPairs.columns.toSeq.filterNot(c => c == "da" || c == "db")
    val outCols =
      least(col("__ma"), col("__mb")).as("da") +:
      greatest(col("__ma"), col("__mb")).as("db") +:
      aux.map { c =>
        swap.collectFirst {
          case (a, b) if a == c => when(flip, col(b)).otherwise(col(a)).as(c)
          case (a, b) if b == c => when(flip, col(a)).otherwise(col(b)).as(c)
        }.getOrElse(col(c))
      }
    repPairs.join(ma, "da").join(mb, "db").select(outCols: _*)
  }

  /** Expand CROSS-corpus rep pairs (da from side A's reps, db from side
    * B's) to member pairs keeping the orientation — the q75 shape, where
    * the two sides are contracted independently and identical texts ACROSS
    * sides already meet as a rep-level pair (each side's rep carries the
    * text, so the banded join emits the pair and the exact verify scores
    * it 1.0), leaving no within-group special case at all. Aux columns are
    * payload-pure and ride unchanged.
    */
  def expandCross(repPairs: DataFrame, membersA: DataFrame,
      membersB: DataFrame): DataFrame = {
    val ma = membersA.select(col("rep").as("da"), col("id").as("__ma"))
    val mb = membersB.select(col("rep").as("db"), col("id").as("__mb"))
    val aux = repPairs.columns.toSeq.filterNot(c => c == "da" || c == "db")
    repPairs.join(ma, "da").join(mb, "db")
      .select(col("__ma").as("da") +: col("__mb").as("db") +:
        aux.map(col): _*)
  }

  /** Expand DIRECTED rep pairs: member pairs keep the rep orientation. */
  def expandDirected(repPairs: DataFrame, members: DataFrame): DataFrame = {
    val ma = members.select(col("rep").as("da"), col("id").as("__ma"))
    val mb = members.select(col("rep").as("db"), col("id").as("__mb"))
    val aux = repPairs.columns.toSeq.filterNot(c => c == "da" || c == "db")
    repPairs.join(ma, "da").join(mb, "db")
      .select(col("__ma").as("da") +: col("__mb").as("db") +:
        aux.map(col): _*)
  }

  /** All within-group member pairs, carrying the caller's per-rep
    * self-statistics. `repAux` must be (__rep0, aux...) — one row per rep
    * whose group SELF-PAIRS qualify (callers pre-filter: non-empty shingle
    * set, self-similarity over threshold, ...). Unordered (da < db) or
    * ordered (da != db, both directions).
    */
  def withinPairs(members: DataFrame, repAux: DataFrame,
      ordered: Boolean): DataFrame = {
    val cond = col("x.rep") === col("y.rep") &&
      (if (ordered) col("x.id") =!= col("y.id") else col("x.id") < col("y.id"))
    val aux = repAux.columns.toSeq.filterNot(_ == "__rep0")
    members.as("x").join(members.as("y"), cond)
      .join(repAux, col("x.rep") === col("__rep0"))
      .select(col("x.id").as("da") +: col("y.id").as("db") +:
        aux.map(col): _*)
  }
}
