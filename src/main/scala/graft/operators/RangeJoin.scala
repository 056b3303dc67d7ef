package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range self-join: all pairs of rows sharing `keyCols` whose event
  * times lie within `toleranceMicros` of each other (spark_guide "custom
  * operator" family: range join).
  *
  * Scale design: bucketize time into tolerance-width bands and equi-join on
  * (key, band), probing each row against bands {b-1, b, b+1} — a naive
  * theta-join (key equality + |Δt| ≤ tol) degenerates to a per-key cross
  * product under Spark's BroadcastNestedLoop/cartesian strategies; the
  * banded form is a plain shuffled equi-join whose cost is bounded by band
  * occupancy. Each qualifying pair matches exactly ONE (band, probe)
  * combination, so no distinct pass is needed.
  */
object RangeJoin {

  /** Pairs (da < db by `idCol`) within tolerance. Returns the left row's
    * columns suffixed `_a` / right's `_b` for the requested payload.
    */
  def pairsWithin(df: DataFrame, keyCols: Seq[String], tsCol: String,
      idCol: String, toleranceMicros: Long,
      payload: Seq[String]): DataFrame = {
    val tus = graft.core.Tables.epochUs(col(tsCol))
    val band = floor(tus / toleranceMicros)
    val base = df.select(
      (keyCols.map(col) :+ col(idCol).as("__id") :+
        tus.as("__us") :+ band.as("__band")) ++
        payload.map(col): _*)
    val probes = base
      .withColumn("__probe",
        explode(array(col("__band") - 1, col("__band"), col("__band") + 1)))
    // payload aliased per side up front — duplicate output names fail fast
    // in analysis instead of silently clobbering id_a/us_a
    val a = base.select(
      (keyCols.map(col) :+ col("__band").as("__probe") :+
        col("__id").as("id_a") :+ col("__us").as("us_a")) ++
        payload.map(c => col(c).as(s"${c}_a")): _*)
    val b = probes.select(
      (keyCols.map(col) :+ col("__probe") :+
        col("__id").as("id_b") :+ col("__us").as("us_b")) ++
        payload.map(c => col(c).as(s"${c}_b")): _*)
    a.join(b, keyCols :+ "__probe")
      .filter(col("id_a") < col("id_b") &&
        abs(col("us_a") - col("us_b")) <= toleranceMicros)
      .drop("__probe")
  }
}
