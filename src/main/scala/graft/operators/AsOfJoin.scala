package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: each left row matched to the LATEST right row with
  * right.ts <= left.ts per key (the time-series join Spark lacks as a
  * built-in; spark_guide "custom operator" example).
  *
  * Implementation is the composed-built-ins route (preference order (a)):
  * tag both sides, union, and carry the most recent right payload forward
  * with a `last(ignoreNulls)` running window. ONE shuffle + one sort per
  * key — never the naive range-join (left ⋈ right on key AND ts-range then
  * top-1), whose intermediate explodes quadratically on busy keys. Equal
  * timestamps sort right-before-left, so `right.ts == left.ts` matches
  * (inclusive, DuckDB/pandas merge_asof semantics).
  */
object AsOfJoin {

  /** @param left left frame
    * @param right right frame
    * @param keyCols equi-join key columns (same names both sides)
    * @param tsCol event-time column name (same both sides)
    * @param rightPayload right columns to attach (emitted as-is; must not
    *   collide with left names)
    * @param inner drop left rows with no prior right row (ASOF JOIN
    *   default); false keeps them with null payload
    */
  def latestPrior(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, rightPayload: Seq[String], inner: Boolean = true): DataFrame = {
    val leftCols = left.columns.toSeq
    val l2 = left
      .withColumn("__side", lit(0))
      .withColumn("__r", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          rightPayload.map(c => org.apache.spark.sql.types.StructField(
            c, right.schema(c).dataType)))))
    val r2 = right.select(
      (keyCols :+ tsCol).map(col) :+
        lit(1).as("__side") :+
        struct(rightPayload.map(col): _*).as("__r"): _*)
    // align schemas: right side carries null left payload columns
    val leftOnly = leftCols.filterNot(c => keyCols.contains(c) || c == tsCol)
    val r3 = leftOnly.foldLeft(r2) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l2.columns.map(col): _*)

    // __r as the final sort key pins the tie-break: among right rows with
    // EQUAL timestamps the match is the largest payload tuple (lexicographic
    // in rightPayload order) — without it the window order among ties is
    // whatever the sort produced, and the sf10 gate's collided-user corpus
    // (duplicate (key, ts) click rows) showed engine and oracle legally
    // disagreeing on which tied row "the" latest prior is
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").desc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l2.unionByName(r3)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .drop("__side", "__r")
    val matched = if (inner) joined.filter(col("__match").isNotNull) else joined
    rightPayload.foldLeft(matched) { (df, c) =>
      df.withColumn(c, col("__match").getField(c))
    }.drop("__match")
  }

  /** Forward as-of: each left row matched to the EARLIEST right row with
    * right.ts >= left.ts per key (time-to-next-event joins: conversion
    * latency, next-maintenance lookup). Mirror of `latestPrior`: same
    * union + one-shuffle window plan, with the running `last` replaced by
    * a `first(ignoreNulls)` over the FOLLOWING frame. Equal timestamps
    * sort left-before-right, so `right.ts == left.ts` matches (inclusive,
    * matching DuckDB's `ASOF JOIN ... ON l.ts <= r.ts`).
    */
  def earliestAfter(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, rightPayload: Seq[String], inner: Boolean = true): DataFrame = {
    val leftCols = left.columns.toSeq
    val l2 = left
      .withColumn("__side", lit(0))
      .withColumn("__r", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          rightPayload.map(c => org.apache.spark.sql.types.StructField(
            c, right.schema(c).dataType)))))
    val r2 = right.select(
      (keyCols :+ tsCol).map(col) :+
        lit(1).as("__side") :+
        struct(rightPayload.map(col): _*).as("__r"): _*)
    val leftOnly = leftCols.filterNot(c => keyCols.contains(c) || c == tsCol)
    val r3 = leftOnly.foldLeft(r2) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l2.columns.map(col): _*)

    // __r pins the tie-break (see latestPrior): among right rows with
    // equal timestamps the match is the SMALLEST payload tuple
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val joined = l2.unionByName(r3)
      .withColumn("__match", first(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .drop("__side", "__r")
    val matched = if (inner) joined.filter(col("__match").isNotNull) else joined
    rightPayload.foldLeft(matched) { (df, c) =>
      df.withColumn(c, col("__match").getField(c))
    }.drop("__match")
  }
}
