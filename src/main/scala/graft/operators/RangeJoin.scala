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
    val band = floor(unix_micros(col(tsCol)) / toleranceMicros)
    val base = df.select(
      (keyCols.map(col) :+ col(idCol).as("__id") :+
        unix_micros(col(tsCol)).as("__us") :+ band.as("__band")) ++
        payload.map(col): _*)
    val probes = base
      .withColumn("__probe",
        explode(array(col("__band") - 1, col("__band"), col("__band") + 1)))
    val a = base.select(
      keyCols.map(col) :+ col("__band").as("__probe") :+
        col("__id").as("id_a") :+ col("__us").as("us_a") :+
        struct(payload.map(col): _*).as("__pa"): _*)
    val b = probes.select(
      keyCols.map(col) :+ col("__probe") :+
        col("__id").as("id_b") :+ col("__us").as("us_b") :+
        struct(payload.map(col): _*).as("__pb"): _*)
    val joined = a.join(b, keyCols :+ "__probe")
      .filter(col("id_a") < col("id_b") &&
        abs(col("us_a") - col("us_b")) <= toleranceMicros)
    payload.foldLeft(joined) { (d, c) =>
      d.withColumn(s"${c}_a", col("__pa").getField(c))
        .withColumn(s"${c}_b", col("__pb").getField(c))
    }.drop("__pa", "__pb", "__probe")
  }
}
