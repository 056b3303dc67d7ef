package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{BloomJoin, Bucketing, Merge, Sampling, SkewJoin}

/** Join-at-scale + sampling operator surface (round 8): bloom-pruned
  * semi-joins, CDC merge/upsert, salted skew joins, grouped sketch
  * quantiles, set-similarity fuzzy joins, priority sampling, grouping
  * sets, and sketch-certified distinct counts.
  *
  * Scale notes: the bloom filter and the fuzzy join's blocking keys keep
  * every candidate-generation exchange narrow (8-byte hashes, never text);
  * the merge's changeset side broadcasts; the grouped KLL sketch and the
  * priority sample's bounded heap move O(k) state per partition through
  * map-side partials, never a sorted column.
  */
object Scale {

  /** Bloom-pruned exact semi-join: the dimension side's keys become a
    * bloom filter applied AT THE FACT SCAN (before any exchange), so the
    * exact left-semi join that follows shuffles only probable matches —
    * Spark's runtime row-level filter shape under explicit operator
    * control (`operators.BloomJoin`). No false negatives ⇒ exact result.
    */
  private val q65 = QueryDef.sql(
    "bloom-pruned exact semi-join: lineitems of urgent orders")(
    """SELECT l_returnflag, cast(sum(l_quantity) AS REAL) AS sum_qty,
      |  count(*) AS cnt
      |FROM lineitem WHERE l_orderkey IN (
      |  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val t = Tables(s, dir)
    val dim = t.orders
      .filter($"o_orderpriority" === "1-URGENT").select($"o_orderkey")
    BloomJoin.semiJoin(t.lineitem, "l_orderkey", dim, "o_orderkey")
      .groupBy($"l_returnflag")
      .agg(sum($"l_quantity").cast("float").as("sum_qty"),
        count(lit(1)).as("cnt"))
      .smallOrdered($"l_returnflag")
  }

  /** CDC merge: urgent-order customers get an account credit (SCD-1
    * update), suppliers are promoted to new customer rows (insert), and
    * deeply negative balances are purged (delete; tombstone wins over a
    * concurrent update for the same key). `operators.Merge` — the base
    * table never shuffles: both anti-joins broadcast the changeset.
    */
  private val q66 = QueryDef.sql(
    "CDC merge/upsert: credit updates + supplier inserts + balance purges")(
    """WITH upd AS (
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal + 10.0 AS c_acctbal,
      |         c_mktsegment
      |  FROM customer WHERE c_custkey IN (
      |    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')),
      |ins AS (
      |  SELECT 1000000 + s_suppkey AS c_custkey, s_name AS c_name,
      |         s_nationkey AS c_nationkey, s_acctbal AS c_acctbal,
      |         'SUPPLIER' AS c_mktsegment
      |  FROM supplier),
      |chg AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
      |del AS (SELECT c_custkey FROM customer WHERE c_acctbal < -500.0)
      |SELECT * FROM (
      |  SELECT * FROM customer
      |  WHERE c_custkey NOT IN (SELECT c_custkey FROM chg)
      |  UNION ALL SELECT * FROM chg) m
      |WHERE m.c_custkey NOT IN (SELECT c_custkey FROM del)
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    import s.implicits._
    val t = Tables(s, dir)
    val urgent = t.orders
      .filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
    val updates = t.customer
      .join(urgent, $"c_custkey" === $"o_custkey", "left_semi")
      .withColumn("c_acctbal", $"c_acctbal" + lit(10.0))
    val inserts = t.supplier.select(
      (lit(1000000L) + $"s_suppkey").as("c_custkey"),
      $"s_name".as("c_name"),
      $"s_nationkey".as("c_nationkey"),
      $"s_acctbal".as("c_acctbal"),
      lit("SUPPLIER").as("c_mktsegment"))
    val deletes = t.customer.filter($"c_acctbal" < -500.0).select($"c_custkey")
    Merge.upsertDelete(t.customer, updates.unionByName(inserts), deletes,
      "c_custkey")
      .cachedOrdered($"c_custkey")
  }

  /** Salted skew join gated against the plain-join oracle: the fact side
    * gets a deterministic per-row salt, the dim side replicates `salt`
    * ways, and the hot key's rows spread over `salt` tasks by plan shape
    * (`operators.SkewJoin` — AQE's skew split only rescues sort-merge
    * partitions after a stage materializes). Result must be IDENTICAL to
    * the unsalted join — that identity is what this gate certifies.
    */
  private val q67 = QueryDef.sql(
    "salted equi-join (skew-spread) == plain join: revenue by priority")(
    """SELECT o_orderpriority,
      |  cast(sum(l_extendedprice * (1 - l_discount)) AS REAL) AS revenue,
      |  count(*) AS cnt
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val t = Tables(s, dir)
    // Optimization round 14 (guide §2.3 + §3.1; plans/r14/q67_*.txt):
    // (a) the salt hashes ALL left columns, so feeding the full lineitem
    // row made the scan read 11 columns solely to salt them — project to
    // the three the query uses (salt = hash of those three: still
    // deterministic and retry-stable, all the operator requires);
    // (b) Catalyst broadcast the 8x-replicated dim (1.2M rows), whose
    // single-threaded driver-side HashedRelation build WAS the query
    // (ProfileJobs: taskSec 1.04 vs wall 2.34) — and a broadcast join is
    // the one shape salting exists to avoid (no skew under broadcast).
    // The shuffle_hash hint restores the production salted shape: both
    // sides exchange on (key, salt), the hot key spreads over `salt`
    // tasks by construction. Result identical (the gate certifies
    // salted == plain join); solo 5-rep wall 1.73 -> 1.09 s at sf0.1.
    SkewJoin.saltedEquiJoin(
      t.lineitem.select($"l_orderkey".as("o_orderkey"),
        $"l_extendedprice", $"l_discount"),
      t.orders.select($"o_orderkey", $"o_orderpriority")
        .hint("shuffle_hash"),
      Seq("o_orderkey"), salt = 8)
      .groupBy($"o_orderpriority")
      .agg(sum($"l_extendedprice" * (lit(1) - $"l_discount")).cast("float")
        .as("revenue"),
        count(lit(1)).as("cnt"))
      .smallOrdered($"o_orderpriority")
  }

  /** Grouped single-pass KLL quantiles: one sketch per group through
    * map-side partials — the per-group companion of q57 (global) and the
    * approximate companion of q13's exact grouped describe. Exact regime
    * at every gated SF (k = 65536 ≥ the largest group), same rank
    * semantics as q57.
    */
  private val q68 = QueryDef.sql(
    "grouped KLL sketch quantiles of events.value per event_type")(
    """WITH s AS (SELECT event_type, value AS v,
      |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM events)
      |SELECT event_type,
      |  min(CASE WHEN rn >= greatest(ceil(0.25::DOUBLE * n), 1) THEN v END) AS p25,
      |  min(CASE WHEN rn >= greatest(ceil(0.5::DOUBLE * n), 1) THEN v END) AS p50,
      |  min(CASE WHEN rn >= greatest(ceil(0.75::DOUBLE * n), 1) THEN v END) AS p75
      |FROM s GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.graft.{Bridge, KllSketchAgg}
    val sk = Bridge.column(
      KllSketchAgg(Bridge.expression(col("value")), k = 65536,
        qs = Seq(0.25, 0.5, 0.75)).toAggregateExpression())
    Tables(s, dir).events
      .groupBy($"event_type").agg(sk.as("q"))
      .select($"event_type", $"q"(0).as("p25"), $"q"(1).as("p50"),
        $"q"(2).as("p75"))
      .smallOrdered($"event_type")
  }

  /** Fuzzy string join (edit distance ≤ 1) via deletion-neighborhood
    * blocking (FastSS): each name emits itself plus every single-deletion
    * variant as a blocking key; two names within one edit share a variant,
    * so an equi-join on the variant's 8-byte hash generates candidates —
    * no all-pairs step anywhere — and `levenshtein` verifies exactly
    * (hash collisions and distance-2 collisions both die there). The
    * exchange carries (hash, id, name), never the variant strings.
    *
    * The scan side fans out (`Tables.fanOut`): Catalyst pushes the
    * levenshtein verify into the candidate join's condition, so the
    * verify's CPU runs in the probe-side stage — on a single-row-group
    * test file that stage is ONE task without the fan-out (measured 11.9 s
    * serial vs ~1 s fanned at sf0.1).
    */
  private val q69 = QueryDef.scalableSql(
    "fuzzy self-join: customer-name pairs within edit distance 1")(
    """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
      |  cast(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
      |FROM customer a JOIN customer b
      |  ON a.c_custkey < b.c_custkey
      |  AND abs(length(a.c_name) - length(b.c_name)) <= 1
      |WHERE levenshtein(a.c_name, b.c_name) <= 1
      |ORDER BY id_a, id_b""".stripMargin)(
    """WITH dv AS MATERIALIZED (
      |WITH v AS (
      |  SELECT c_custkey AS id, c_name AS nm,
      |    unnest(range(0, length(c_name) + 1)) AS i
      |  FROM customer)
      |SELECT id, nm,
      |  CASE WHEN i = 0 THEN nm
      |       ELSE substr(nm, 1, CAST(i - 1 AS INT))
      |            || substr(nm, CAST(i + 1 AS INT)) END AS var
      |FROM v)
      |SELECT DISTINCT a.id AS id_a, b.id AS id_b,
      |  cast(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
      |FROM dv a JOIN dv b ON a.var = b.var AND a.id < b.id
      |WHERE levenshtein(a.nm, b.nm) <= 1
      |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    import s.implicits._
    val t = Tables(s, dir)
    val vars = t.fanOut(t.customer)
      .select($"c_custkey".as("id"), $"c_name".as("nm"))
      .select($"id", $"nm", explode(expr(
        """transform(sequence(0, length(nm)), i ->
          |  CASE WHEN i = 0 THEN nm
          |  ELSE concat(substring(nm, 1, i - 1), substring(nm, i + 1)) END)"""
          .stripMargin)).as("v"))
      .select($"id", $"nm", xxhash64($"v").as("hv"))
    val kernelWidth = Tables.kernelWidth(s)
    vars.as("a").join(vars.as("b"),
        $"a.hv" === $"b.hv" && $"a.id" < $"b.id")
      .select($"a.id".as("id_a"), $"b.id".as("id_b"),
        $"a.nm".as("nm_a"), $"b.nm".as("nm_b"))
      // widen the candidate-distinct exchange to the kernel width (round
      // 14, the q122 pattern): the exact levenshtein verify runs in the
      // stage AFTER this exchange, and at the post-agg shuffle sizing it
      // held 0.41 s of the wall in 4 tasks (1.55 taskSec, even). The
      // repartition REPLACES the distinct's implicit exchange — same keys,
      // same bytes, wider stage. Re-adjudicated round 15 (VERDICT r14 #2):
      // interleaved suite-context pair, 2+2 legs — widened 1.82 s vs
      // reverted 1.96 s; the widening stands.
      .repartition(kernelWidth, $"id_a", $"id_b")
      .distinct()
      .withColumn("dist", levenshtein($"nm_a", $"nm_b").cast("long"))
      .filter($"dist" <= 1)
      .select($"id_a", $"id_b", $"dist")
      .cachedOrdered($"id_a", $"id_b")
  }

  /** Deterministic priority sampling (`Sampling.prioritySample`): weighted
    * size-40 document sample by n_chars with Horvitz-Thompson estimate
    * weights — sum(est_w) over the sample unbiasedly estimates total
    * corpus chars. Bit-portable: hash-uniform u = (m+1)/2^52, priority
    * w/u — field ops only (no ln), so the oracle replays the exact floats.
    */
  private val q70 = QueryDef.sql(
    "priority sample: 40 docs weighted by n_chars + HT estimate weights")(
    """WITH pr AS (
      |  SELECT doc_id, n_chars,
      |    CAST(n_chars AS DOUBLE) /
      |      (CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)
      |              AS BIGINT) + 1 AS DOUBLE) / 4503599627370496.0) AS p
      |  FROM documents),
      |r AS (SELECT *, row_number() OVER (ORDER BY p DESC, doc_id) AS rn FROM pr),
      |tau AS (SELECT coalesce(max(CASE WHEN rn = 41 THEN p END), 0.0) AS t FROM r)
      |SELECT doc_id, n_chars,
      |  greatest(CAST(n_chars AS DOUBLE), t) AS est_w
      |FROM r, tau WHERE rn <= 40
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Sampling.prioritySample(
      Tables(s, dir).documents.select($"doc_id", $"n_chars"),
      "doc_id", "n_chars", k = 40)
      .select($"doc_id", $"n_chars", $"est_w")
      .smallOrdered($"doc_id")
  }

  /** Non-hierarchical grouping sets — revenue by priority AND by status in
    * ONE Expand pass over one scan (a shape neither rollup nor cube
    * expresses: two independent one-dimension aggregates that would
    * otherwise each rescan the fact table).
    */
  private val q71 = QueryDef.sql(
    "grouping sets: order revenue by priority and by status, one pass")(
    """SELECT o_orderpriority, o_orderstatus,
      |  cast(sum(o_totalprice) AS REAL) AS revenue, count(*) AS n_orders
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
      |ORDER BY o_orderpriority ASC NULLS FIRST,
      |         o_orderstatus ASC NULLS FIRST""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables(s, dir).orders
      .groupingSets(
        Seq(Seq($"o_orderpriority"), Seq($"o_orderstatus")),
        $"o_orderpriority", $"o_orderstatus")
      .agg(sum($"o_totalprice").cast("float").as("revenue"),
        count(lit(1)).as("n_orders"))
      .smallOrdered($"o_orderpriority".asc_nulls_first,
        $"o_orderstatus".asc_nulls_first)
  }

  /** Sketch-certified distinct counts: the output is the EXACT per-type
    * distinct-user count, with Spark's HLL++ estimate
    * (`approx_count_distinct`, the one-pass 100 TB path) asserted in-plan
    * to within ±10% of it — a broken sketch merge fails the query loudly
    * instead of silently drifting (the q62/q63 certification pattern
    * applied to the built-in sketch).
    */
  private val q72 = QueryDef.sql(
    "distinct users per event type, HLL++ estimate certified in-plan")(
    """SELECT event_type, count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables(s, dir).events
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n_users"),
        approx_count_distinct($"user_id", 0.02).as("__est"))
      .filter(assert_true(
        $"__est" >= $"n_users" * 0.9 && $"__est" <= $"n_users" * 1.1,
        concat(lit("HLL++ estimate out of ±10% bound: est="), $"__est",
          lit(" exact="), $"n_users")).isNull)
      .select($"event_type", $"n_users")
      .smallOrdered($"event_type")
  }

  /** Per-label embedding centroids, gated bit-exactly: the reported value
    * is the FIXED-POINT centroid — elements quantized to 1e-6 as exact
    * integers, summed exactly (|q| ≤ 1e6, n ≤ 2^33 before 2^53 overflows),
    * one correctly-rounded division at the end — so accumulation ORDER
    * cannot move a single bit (a float32-cast mean demonstrably flips a
    * rounding-boundary ulp between engines; exact integer time math is the
    * same rule). The partial hash aggregate collapses the d×n melt to
    * (labels × d) rows per partition before the exchange. In the same
    * plan, MLlib's `Summarizer` vector mean (the float path: ONE 64-dim
    * buffer per partition per label through `array_to_vector`) is asserted
    * within quantization tolerance of the fixed-point truth — the
    * q62/q63/q72 certification pattern, here certifying the float
    * aggregate everyone would actually run at 100 TB.
    */
  private val q73 = QueryDef.sql(
    "per-label fixed-point embedding centroids, float path certified")(
    """SELECT label, i,
      |  CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0)
      |            AS BIGINT)) AS DOUBLE) / count(*) AS c
      |FROM embeddings, unnest(range(1, len(embedding) + 1)) AS r(i)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    import org.apache.spark.ml.stat.Summarizer
    val emb = Tables(s, dir).embeddings
    val fixed = emb
      .select($"label", posexplode(expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))"))
        .as(Seq("pos", "q")))
      .groupBy($"label", ($"pos" + 1).cast("long").as("i"))
      .agg((sum($"q").cast("double") / count(lit(1))).as("c"))
    val float = emb
      .groupBy($"label")
      .agg(Summarizer.mean(array_to_vector($"embedding")).as("m"))
      .select($"label", posexplode(vector_to_array($"m")).as(Seq("fpos", "cf")))
      .select($"label", ($"fpos" + 1).cast("long").as("i"),
        ($"cf" * 1000000.0).as("cf"))
    fixed.join(float, Seq("label", "i"))
      .filter(assert_true(abs($"c" - $"cf") <= 2.0,
        concat(lit("float centroid off fixed-point truth: "), $"c", lit(" vs "),
          $"cf")).isNull)
      .select($"label", $"i", $"c")
      .smallOrdered($"label", $"i")
  }

  /** Six-table star join with a cross-dimension predicate (the TPC-H Q5
    * shape): revenue from LOCAL suppliers (customer and supplier in the
    * same nation) for two regions and a date range. Exercises Catalyst's
    * join planning end-to-end: date + region filters push to the scans,
    * every dimension broadcasts, and the only big exchanges are the
    * unavoidable lineitem⋈orders key shuffle (both sides fact-sized at
    * scale) and the final per-nation aggregate.
    */
  private val q105 = QueryDef.sql(
    "six-table local-supplier revenue join (TPC-H Q5 shape)")(
    """SELECT n_name AS nation,
      |  CAST(sum(l_extendedprice * (1 - l_discount)) AS REAL) AS revenue,
      |  count(*) AS n_items
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name IN ('ASIA', 'EUROPE')
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1999-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, nation""".stripMargin) { (s, dir) =>
    import s.implicits._
    val t = Tables(s, dir)
    t.lineitem
      .join(t.orders
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1999-01-01").cast("timestamp")),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(t.customer), $"o_custkey" === $"c_custkey")
      .join(broadcast(t.supplier),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(t.nation), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(t.region.filter($"r_name".isin("ASIA", "EUROPE"))),
        $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name".as("nation"))
      .agg(sum($"l_extendedprice" * (lit(1) - $"l_discount"))
        .cast("float").as("revenue"),
        count(lit(1)).as("n_items"))
      .smallOrdered($"revenue".desc, $"nation")
  }

  /** Pairwise label-centroid geometry in EXACT integer arithmetic: per
    * label, the per-dimension sum of 1e4-scaled embedding values (longs);
    * per label pair, the dot product and squared norms of those sum
    * vectors. Cosine is scale-invariant, so cos(sum_a, sum_b) IS the
    * centroid cosine — the consumer divides dot/sqrt(na2*nb2) when it
    * wants the float; the GATE certifies the sufficient statistics
    * bit-exactly (integer folds are order-independent, so this is
    * partitioning-proof in a way no float summation can be). The
    * embedding-space class-separation audit behind "did my clusters
    * collapse after a data refresh".
    *
    * Overflow budget at scale 1e4, |x| <= 1, dim 64: per-dim sums carry
    * ~1e4 x rows-per-label; the dot stays inside a long up to ~1e8 rows
    * per label (documented headroom ~100x the sf1 corpus; a larger
    * deployment drops the scale a digit per 100x rows).
    */
  private val q113 = QueryDef.sql(
    "pairwise label-centroid cosine sufficient statistics (exact longs)")(
    """WITH q AS (SELECT label,
      |    list_transform(embedding, x ->
      |      CAST(floor(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)) AS qv
      |  FROM embeddings),
      |s AS (SELECT label, i, sum(qv[i])::BIGINT AS sd
      |  FROM q, LATERAL unnest(range(1, len(qv) + 1)) AS r(i)
      |  GROUP BY 1, 2),
      |v AS (SELECT label, list(sd ORDER BY i) AS sv FROM s GROUP BY 1)
      |SELECT a.label AS la, b.label AS lb,
      |  (SELECT sum(a.sv[k] * b.sv[k])
      |     FROM unnest(range(1, len(a.sv) + 1)) AS u(k))::BIGINT AS dot,
      |  (SELECT sum(a.sv[k] * a.sv[k])
      |     FROM unnest(range(1, len(a.sv) + 1)) AS u(k))::BIGINT AS na2,
      |  (SELECT sum(b.sv[k] * b.sv[k])
      |     FROM unnest(range(1, len(b.sv) + 1)) AS u(k))::BIGINT AS nb2
      |FROM v a JOIN v b ON a.label < b.label
      |ORDER BY la, lb""".stripMargin) { (s, dir) =>
    import s.implicits._
    val sums = Tables(s, dir).embeddings
      .select($"label", posexplode(expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000.0) AS BIGINT))"))
        .as(Seq("pos", "q")))
      .groupBy($"label", $"pos").agg(sum($"q").as("sd"))
      .groupBy($"label")
      .agg(expr("transform(sort_array(collect_list(struct(pos, sd))), p -> p.sd)")
        .as("sv"))
    val a = sums.select($"label".as("la"), $"sv".as("__sa"))
    val b = sums.select($"label".as("lb"), $"sv".as("__sb"))
    a.join(b, $"la" < $"lb")
      .select($"la", $"lb",
        expr("aggregate(zip_with(__sa, __sb, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")
          .as("dot"),
        expr("aggregate(__sa, 0L, (acc, v) -> acc + v * v)").as("na2"),
        expr("aggregate(__sb, 0L, (acc, v) -> acc + v * v)").as("nb2"))
      .smallOrdered($"la", $"lb")
  }

  /** The pruned scan-plus-aggregate under the q143 gate, shared with
    * PlanSpec so the partition-pruning assertion tests the EXACT gated
    * plan: read the date-partitioned layout, filter to [from, to] with
    * literal bounds (static pruning — PartitionFilters on the scan, no
    * data files outside the window ever opened), aggregate per type.
    */
  def prunedWindowAgg(s: org.apache.spark.sql.SparkSession, path: String,
      from: java.time.LocalDate, to: java.time.LocalDate)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    s.read.parquet(path)
      .filter($"event_date".between(
        lit(java.sql.Date.valueOf(from)), lit(java.sql.Date.valueOf(to))))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("events"),
        countDistinct($"user_id").as("users"),
        countDistinct($"event_date").as("days"))
  }

  /** Partition-pruned scan gate (round 10, VERDICT r9 #6): write the
    * events table date-partitioned (operators.Layout.writePartitioned),
    * then answer a 7-day window aggregate whose literal date filter MUST
    * prune — the first plan property that matters on a 100 TB
    * date-partitioned lake table (a scan that lists 30 days to answer a
    * 7-day question reads 4× the data before the first row group opens).
    * PlanSpec asserts the executed scan's `numPartitions` metric reads
    * exactly the window's directories; this gate pins the ANSWER over the
    * partitioned layout against the raw-table oracle. The window is
    * data-relative (days 7..13 from the corpus min date) so every SF
    * replays identically.
    */
  /** q143's partitioned layout, built once per corpus dir and kept for
    * the JVM's life (deleted by a shutdown hook): the gate's own claim is
    * pay-one-write-then-prune-forever, so re-laying-out per bench rep
    * would make the median price the WRITE, not the recurring pruned
    * scan. Rep 1 still pays (and records) the write. Also returns the
    * corpus min date, pinned with the layout.
    */
  private val layoutMemo = scala.collection.concurrent.TrieMap[
    String, (String, java.time.LocalDate)]()

  private def partitionedEvents(s: org.apache.spark.sql.SparkSession,
      dir: String): (String, java.time.LocalDate) =
    layoutMemo.getOrElseUpdate(dir, {
      val tmp = java.nio.file.Files.createTempDirectory("graft-prune-")
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        deleteRecursively(tmp.toFile)))
      val path = tmp.resolve("events_by_date").toString
      val t = Tables(s, dir)
      graft.operators.Layout.writePartitioned(
        t.events.withColumn("event_date", to_date(col("ts"))),
        path, "event_date")
      val d0 = t.events.agg(min(to_date(col("ts"))))
        .first().getDate(0).toLocalDate
      (path, d0)
    })

  private val q143 = QueryDef.sql(
    "date-partitioned events layout: partition-pruned 7-day window aggregate")(
    """WITH b AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events)
      |SELECT event_type, count(*)::BIGINT AS events,
      |  count(DISTINCT user_id)::BIGINT AS users,
      |  count(DISTINCT CAST(ts AS DATE))::BIGINT AS days
      |FROM events
      |WHERE CAST(ts AS DATE) BETWEEN (SELECT d0 + 7 FROM b)
      |                           AND (SELECT d0 + 13 FROM b)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val (path, d0) = partitionedEvents(s, dir)
    prunedWindowAgg(s, path, d0.plusDays(7), d0.plusDays(13))
      .smallOrdered($"event_type")
  }

  /** q153's bucketed pair: lineitem and orders persisted as catalog
    * tables bucketed (and sorted) by the join key under a COMMON column
    * name. Shared with PlanSpec so the no-shuffle assertion tests the
    * exact gated tables.
    */
  def writeBucketedPair(s: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    Seq("graft_q153_lineitem", "graft_q153_orders")
      .foreach(Bucketing.dropWithLocation(s, _))
    val t = Tables(s, dir)
    Bucketing.writeBucketed(
      t.lineitem.select(col("l_orderkey").as("okey"),
        col("l_extendedprice"), col("l_discount")),
      "graft_q153_lineitem", buckets = 8, keyCols = Seq("okey"))
    Bucketing.writeBucketed(
      t.orders.select(col("o_orderkey").as("okey"), col("o_orderpriority")),
      "graft_q153_orders", buckets = 8, keyCols = Seq("okey"))
  }

  /** The co-located rollup under the q153 gate: join the bucketed pair
    * (zero shuffle, zero per-task sort — the scans' output partitioning
    * and ordering already satisfy the join) and aggregate revenue per
    * priority; the only exchange in the whole plan is the final 5-group
    * rollup's.
    */
  def bucketedPriorityRevenue(s: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame =
    Bucketing.coLocatedJoin(s, "graft_q153_lineitem", "graft_q153_orders",
      Seq("okey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("items"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("float").as("revenue"))

  /** Bucketed co-located join gate (round 10): the amortized-shuffle
    * strategy a 100 TB fact table lives by — pay one bucketed write, then
    * every recurring join on the key plans WITHOUT an exchange on either
    * side (BucketingSpec + PlanSpec assert the executed plan; this gate
    * pins the ANSWER against the plain-join oracle). Bucket metadata
    * lives in the session catalog (plain parquet paths can't carry it),
    * so the gate materializes real catalog tables and drops them — table
    * AND warehouse location — after the result is pinned.
    */
  /** The bucketed pair is the amortized asset the gate is ABOUT: built
    * once per corpus dir and kept in the catalog for the JVM's life, so
    * the bench median prices the recurring no-shuffle join, not the
    * one-time write (rep 1 records the write). A different dir in the
    * same JVM rebuilds.
    */
  private val bucketMemo =
    scala.collection.concurrent.TrieMap[String, Boolean]()

  private val q153 = QueryDef.sql(
    "bucketed co-located join: revenue per priority with no join shuffle")(
    """SELECT o_orderpriority, count(*)::BIGINT AS items,
      |  CAST(sum(l_extendedprice * (1 - l_discount)) AS REAL) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    bucketMemo.synchronized {
      // existence re-check: PlanSpec builds and DROPS the same tables
      // around its no-shuffle assertion, so the memo alone can go stale
      val present = s.catalog.tableExists("graft_q153_lineitem") &&
        s.catalog.tableExists("graft_q153_orders")
      if (!bucketMemo.getOrElse(dir, false) || !present) {
        writeBucketedPair(s, dir)
        bucketMemo.clear()
        bucketMemo(dir) = true
      }
    }
    bucketedPriorityRevenue(s).smallOrdered(col("o_orderpriority"))
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(): Unit
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "q65_bloom_semi_join" -> q65,
    "q66_merge_upsert" -> q66,
    "q67_salted_join" -> q67,
    "q68_grouped_quantiles" -> q68,
    "q69_fuzzy_name_join" -> q69,
    "q70_priority_sample" -> q70,
    "q71_grouping_sets" -> q71,
    "q72_distinct_certified" -> q72,
    "q73_label_centroids" -> q73,
    "q105_local_supplier_revenue" -> q105,
    "q113_centroid_geometry" -> q113,
    "q143_partition_pruned_scan" -> q143,
    "q153_bucketed_join" -> q153
  )
}
