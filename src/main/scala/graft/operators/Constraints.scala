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
  * per-partition partial counters); each uniqueness key set runs as its
  * own single-distinct aggregate, submitted concurrently with the check
  * pass. The audit result is a tall (constraint, violations, pass) frame
  * of |checks| rows. Fail-fast wrappers can `require` on it without a
  * second scan.
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
    * verdict, plus the scanned row count.
    * Returns (constraint, violations, n_rows, pass[int]).
    *
    * Execution shape: the row-level checks are ONE expand-free aggregate
    * (conditional sums — map-side partials, a single exchange of partial
    * counters, no row shuffle). Each `uniqueKeys` set is its own distinct
    * aggregate job — fusing a count_distinct into the check aggregate
    * plans an Expand that re-feeds every scanned row once per aggregate
    * group, doubling the scan's output. The jobs are submitted
    * CONCURRENTLY (the branch-split pattern) so wall time is the max of
    * the branches, and the bounded result rows assemble on the driver.
    *
    * The branch builders are exposed `private[graft]` so plan audits can
    * assert their shape (map-side partials, no Expand, no Join) — the
    * returned frame itself is a driver-assembled LocalTableScan.
    */
  private[graft] def checkAggPlan(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val checkAggs = checks.zipWithIndex.map { case (ch, i) =>
      sum(when(!coalesce(ch.holds, lit(false)), 1L).otherwise(0L)).as(s"__v$i")
    }
    val aggs = count(lit(1)).as("__n") +: checkAggs
    df.agg(aggs.head, aggs.tail: _*)
  }

  private[graft] def uniqueAggPlan(df: DataFrame, ks: Seq[String]): DataFrame =
    df.agg(count(lit(1)).as("n"),
      count_distinct(struct(ks.map(col): _*)).as("d"))

  def audit(df: DataFrame, checks: Seq[Check],
      uniqueKeys: Seq[Seq[String]] = Nil): DataFrame = {
    require(checks.nonEmpty || uniqueKeys.nonEmpty, "no checks given")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val checksF = Future {
      if (checks.isEmpty) None
      else Some(checkAggPlan(df, checks).head())
    }
    val uniqF = uniqueKeys.map { ks =>
      Future { uniqueAggPlan(df, ks).head() }
    }
    val checkRow = Await.result(checksF, Duration.Inf)
    val uniqRows = uniqF.map(Await.result(_, Duration.Inf))
    val n = checkRow.map(_.getLong(0))
      .orElse(uniqRows.headOption.map(_.getLong(0)))
      .getOrElse(0L)
    val out =
      checks.zipWithIndex.map { case (ch, i) =>
        (ch.name, checkRow.get.getLong(i + 1))
      } ++ uniqueKeys.zip(uniqRows).map { case (ks, r) =>
        (s"unique(${ks.mkString(",")})", r.getLong(0) - r.getLong(1))
      }
    val spark = df.sparkSession
    import spark.implicits._
    out.toDF("check_name", "violations")
      .select(col("check_name"), col("violations"),
        lit(n).as("n_rows"),
        (col("violations") === 0L).cast("int").as("pass"))
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

  /** Functional-dependency audit (FD discovery's verification step): does
    * `det` determine `dep`? Counts determinant keys carrying more than one
    * distinct dependent value. One hash aggregate by key (map-side
    * combined count-distinct per key), then a bounded summary row:
    * (n_keys, violating_keys, max_distinct, violation_share). Exact
    * integers + one double division.
    */
  def functionalDependency(df: DataFrame, det: Seq[String],
      dep: Seq[String]): DataFrame = {
    val name = s"fd(${det.mkString(",")} -> ${dep.mkString(",")})"
    df.groupBy(det.map(col): _*)
      .agg(count_distinct(struct(dep.map(col): _*)).as("nv"))
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col("nv") > 1L, 1L).otherwise(0L)).as("violating_keys"),
        max(col("nv")).as("max_distinct"))
      .select(lit(name).as("check_name"), col("n_keys"),
        col("violating_keys"), col("max_distinct"),
        (col("violating_keys").cast("double") / col("n_keys"))
          .as("violation_share"),
        (col("violating_keys") === 0L).cast("int").as("pass"))
  }
}
