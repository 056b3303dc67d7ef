package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** sf100 scale probe (round 14, VERDICT r13 #2): run the scale-critical
  * query families at 1,000x the driver SF. Queries with output linear in
  * the corpus dump parquet exactly like graft.Verify; the pair emitters and
  * other queries whose OUTPUT is itself corpus-scale (q19 at sf100 emits
  * ~2.8e9 member pairs — the true output, no engine avoids it) reduce to a
  * one-row INVARIANT frame instead: count(*) plus per-column exact
  * aggregates that both engines can compute from their own full result —
  * sum for integer columns, sum(floor(c * 2^20)) for doubles (both engines
  * derive bit-identical doubles from the same integer inputs, proven by the
  * sf10 hash gate, so the floor is deterministic), sum(length) +
  * count(distinct) for strings. tools/probe_compare.py computes the same
  * frame in DuckDB from the committed oracle SQL and compares cell-exactly.
  *
  * Usage: ScaleProbe <sfDir> <outDir> <queriesCsv> <aggCsv>
  * Env: SPARK_GRAFT_CPUS, GRAFT_XMX (launcher), SPARK_GRAFT_CONF overlay.
  */
object ScaleProbe {
  def invariantFrame(df: DataFrame): DataFrame = {
    // integer columns aggregate modulo a prime plus a bit_xor fold: exact,
    // order-independent, and overflow-free under ANSI mode even for
    // Long.MaxValue sentinels (q142's open-validity rows)
    val P = 1000003L
    val aggs = Seq(count(lit(1)).as("n")) ++
      df.schema.fields.sortBy(_.name).flatMap { f =>
        f.dataType match {
          case _: LongType | _: IntegerType | _: ShortType | _: ByteType =>
            Seq(sum(col(f.name).cast("long") % P).as(s"s_${f.name}"),
              expr(s"bit_xor(cast(${f.name} as bigint))").as(s"x_${f.name}"))
          case _: DoubleType | _: FloatType =>
            Seq(sum(floor(col(f.name).cast("double") * 1048576.0)
              .cast("long") % P).as(s"s_${f.name}"))
          case _: StringType =>
            Seq(sum(length(col(f.name)).cast("long")).as(s"s_${f.name}"),
              countDistinct(col(f.name)).as(s"d_${f.name}"))
          case other =>
            throw new IllegalArgumentException(
              s"invariantFrame: unsupported type $other for ${f.name}")
        }
      }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Probe-only unordered builders. A gated query whose OUTPUT is itself
    * corpus-quadratic may end in an ordering exchange that is correct at
    * the gate's SFs but single-box-impossible at sf100 (q122's smallOrdered
    * funnels 5.5e9 rows through one partition — ~50 GB of shuffle for rows
    * the invariant aggregate then collapses). The invariant frame is
    * order-independent, so probing the same operator expression WITHOUT
    * the final ordering gates identical math; the gate itself still runs
    * the ordered form at sf<=10 (hash-exact there).
    */
  private def rawBuilders: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "q122_containment_pairs" -> ((s, dir) =>
        graft.operators.SetSimilarity.containmentPairs(
          graft.core.Tables(s, dir).documentsFanned, "doc_id", "text",
          n = 3, tauNum = 8, tauDen = 10))
    )

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, queriesCsv, aggCsv) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/tmp"))
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val agg = aggCsv.split(",").filter(_.nonEmpty).toSet
    queriesCsv.split(",").filter(_.nonEmpty).foreach { name =>
      val t0 = System.nanoTime()
      val df =
        if (agg.contains(name) && rawBuilders.contains(name))
          rawBuilders(name)(spark, sfDir)
        else graft.SparkEntry.queries(name)(spark, sfDir)
      val (out, suffix) =
        if (agg.contains(name)) (invariantFrame(df), "__inv") else (df, "")
      out.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name$suffix")
      if (agg.contains(name)) {
        // sidecar: the SOURCE schema kinds, so probe_compare.py builds the
        // identical invariant SQL without probing the oracle's types
        val kinds = df.schema.fields.map { f =>
          val k = f.dataType match {
            case _: DoubleType | _: FloatType => "float"
            case _: StringType => "str"
            case _ => "int"
          }
          s"""["${f.name}", "$k"]"""
        }.mkString("[", ",", "]")
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/$name.schema.json"), kinds)
      }
      System.err.println(f"[probe] $name done in " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
      spark.catalog.clearCache()
      // release the finished query's shuffle files NOW: ContextCleaner
      // only deletes them once the shuffle dependencies are GC'd, and at
      // sf100 the accumulated spill of completed queries (40+ GB) pushed
      // a later query over the box's disk
      System.gc()
    }
    spark.stop()
  }
}
