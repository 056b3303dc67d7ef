package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints evaluated in ONE aggregate pass —
  * the data-level extension of the engine's schema validation (SURVEY §2.2
  * P2/P3 validate column presence/types; these validate the VALUES before
  * data ships to training): non-null, range, set membership, custom
  * predicates, and key uniqueness.
  *
  * Scale shape: every predicate compiles to a conditional-sum aggregate
  * over one scan (map-side partials, no shuffle of rows — only the
  * per-partition partial counters); uniqueness adds the one count-distinct
  * expansion. The audit result is a tall (constraint, violations, pass)
  * frame of |checks| rows. Fail-fast wrappers can `require` on it without
  * a second scan.
  */
object Constraints {

  /** One named row-level constraint: `holds` must be true for every row. */
  final case class Check(name: String, holds: Column)

  def notNull(c: String): Check = Check(s"not_null($c)", col(c).isNotNull)
  def between(c: String, lo: Double, hi: Double): Check =
    Check(s"between($c,$lo,$hi)", col(c) >= lo && col(c) <= hi)
  def isIn(c: String, values: Seq[Any]): Check =
    Check(s"in_set($c)", col(c).isin(values: _*))
  def matches(c: String, pattern: String): Check =
    Check(s"matches($c)", regexp_like(col(c), lit(pattern)))

  /** Row-level audit: per check, the number of violating rows and the
    * verdict, plus the scanned row count — all from one aggregate.
    * Returns (constraint, violations, n_rows, pass[int]).
    *
    * `uniqueKeys`: key-uniqueness checks FUSED into the same aggregate —
    * each key set adds a `count_distinct` to the agg list (Catalyst's
    * one-distinct-group rewrite keeps it a single scan + one exchange of
    * partial counters), instead of a second scan unioned on (the
    * standalone `unique` below). duplicates = rows − distinct keys.
    */
  def audit(df: DataFrame, checks: Seq[Check],
      uniqueKeys: Seq[Seq[String]] = Nil): DataFrame = {
    require(checks.nonEmpty || uniqueKeys.nonEmpty, "no checks given")
    val checkAggs = checks.zipWithIndex.map { case (ch, i) =>
      sum(when(!coalesce(ch.holds, lit(false)), 1L).otherwise(0L)).as(s"__v$i")
    }
    val uniqAggs = uniqueKeys.zipWithIndex.map { case (ks, i) =>
      count_distinct(struct(ks.map(col): _*)).as(s"__u$i")
    }
    val aggs = count(lit(1)).as("__n") +: (checkAggs ++ uniqAggs)
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = checks.zipWithIndex.map { case (ch, i) =>
      struct(lit(ch.name).as("check_name"), col(s"__v$i").as("violations"))
    } ++ uniqueKeys.zipWithIndex.map { case (ks, i) =>
      struct(lit(s"unique(${ks.mkString(",")})").as("check_name"),
        (col("__n") - col(s"__u$i")).as("violations"))
    }
    wide.select(explode(array(stacked: _*)).as("c"), col("__n"))
      .select(col("c.check_name").as("check_name"),
        col("c.violations").as("violations"),
        col("__n").as("n_rows"),
        (col("c.violations") === 0L).cast("int").as("pass"))
  }

  /** Key-uniqueness audit: duplicates = rows minus distinct keys. Exact
    * (count-distinct expansion), returned in the same audit row shape.
    */
  def unique(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val name = s"unique(${keyCols.mkString(",")})"
    df.agg(count(lit(1)).as("n"),
        count_distinct(struct(keyCols.map(col): _*)).as("d"))
      .select(lit(name).as("check_name"),
        (col("n") - col("d")).as("violations"),
        col("n").as("n_rows"),
        (col("n") === col("d")).cast("int").as("pass"))
  }
}
