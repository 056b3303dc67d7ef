package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate nearest-neighbor search over embedding columns (builder
  * brief): brute-force cosine is the correctness baseline (TextVector
  * q22/q23); this module is the scale path — random-hyperplane LSH
  * bucketing so candidate generation is linear and only same-bucket pairs
  * are scored exactly.
  *
  * Scale design: `numPlanes` hyperplanes ⇒ 2^numPlanes buckets; expected
  * candidates per query shrink exponentially while sign-LSH preserves
  * cosine-similar pairs (collision probability 1 - θ/π per plane). The
  * hyperplanes are seeded literals baked into the plan — no driver state,
  * no join against a planes table. Multi-probe (flipping the weakest signs)
  * recovers recall without more buckets.
  *
  * Cache lifecycle: the PQ/IVFADC paths pin their encode and candidate
  * frames (MEMORY_AND_DISK) to hold a codegen stage boundary — fused past
  * it, the per-block argmin re-evaluates per PAIR and blows the
  * whole-stage-codegen budget. The pins are not explicitly unpersisted
  * (the returned DataFrames are lazy and still reference them); they are
  * reclaimed by ContextCleaner when the plan is dropped, the same
  * lifecycle as a caller's own `df.cache()`. Long-lived sessions should
  * `spark.catalog.clearCache()` between batches (the bench does, per rep).
  */
object Ann {

  /** Deterministic pseudo-random unit hyperplanes. */
  def hyperplanes(dim: Int, numPlanes: Int, seed: Long = 42L): Seq[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes) {
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / norm)
    }
  }

  /** Sign-LSH bucket id of an embedding column: bit p = 1 iff dot with
    * hyperplane p is >= 0. A long column (numPlanes <= 63). All planes are
    * projected in ONE fused codegen pass (SignProjectionBits) — float plane
    * components widen exactly to double, so the signs match the per-plane
    * promote-before-multiply dot.
    */
  def bucketId(emb: Column, planes: Seq[Array[Float]]): Column =
    packedSignBits(emb, planes.map(_.map(_.toDouble)))

  /** PORTABLE hyperplanes: component (p, j) derives from the md5 of
    * "plane_p_j" — leading 15 hex digits as a long, mapped to the exact
    * rational grid (h % 2001 - 1000) / 1000 in [-1, 1]. Seedless and
    * reproducible in any engine with md5 + integer arithmetic, so an
    * external oracle can replay the exact bucketing (q31). Uniform rather
    * than Gaussian components — fine for sign-LSH (only the projection
    * sign matters).
    */
  def portableHyperplanes(dim: Int, numPlanes: Int): Seq[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Seq.tabulate(numPlanes) { p =>
      Array.tabulate(dim) { j =>
        val hex = md.digest(s"plane_${p}_$j".getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString.substring(0, 15)
        val h = java.lang.Long.parseLong(hex, 16)
        ((h % 2001L) - 1000L).toDouble / 1000.0
      }
    }
  }

  /** Bucket id against double-precision portable planes: the projection is
    * float-promoted-to-double times exact double weights, sequentially
    * accumulated — bit-identical to `list_sum(list_transform(...))` over
    * the same numbers, so the sign (and therefore the bucket) matches the
    * SQL oracle exactly.
    */
  def bucketIdPortable(emb: Column, planes: Seq[Array[Double]]): Column =
    packedSignBits(emb, planes)

  /** One fused evaluation of every plane's sign bit (bit p = plane p). */
  private def packedSignBits(emb: Column, planes: Seq[Array[Double]]): Column = {
    import org.apache.spark.sql.graft.{Bridge, SignProjectionBits}
    Bridge.column(SignProjectionBits(Bridge.expression(emb), planes.toArray))
  }

  /** Exact top-k per query among same-bucket candidates. Input frames:
    * `data` (idCol, embCol), `queries` (idCol, embCol; broadcast).
    * Returns (qid, vec_id, sim, rn). Recall is governed by numPlanes; the
    * brute-force baseline (TextVector q23) is the oracle for recall specs.
    */
  def annTopK(data: DataFrame, queries: DataFrame, idCol: String, embCol: String,
      k: Int, numPlanes: Int = 8, dim: Int = 64, seed: Long = 42L,
      portable: Boolean = false): DataFrame = {
    def bucketOf(c: Column): Column =
      if (portable) bucketIdPortable(c, portableHyperplanes(dim, numPlanes))
      else bucketId(c, hyperplanes(dim, numPlanes, seed))
    val bucketed = data.select(col(idCol).as("vec_id"), col(embCol).as("emb"))
      .withColumn("bucket", bucketOf(col("emb")))
    val qBucketed = queries.select(col(idCol).as("qid"), col(embCol).as("qemb"))
      .withColumn("bucket", bucketOf(col("qemb")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    // rank on the float32-rounded similarity (the published value) so the
    // ordering is reproducible across engines — same shape as q23
    bucketed.join(broadcast(qBucketed), "bucket")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        VectorFunctions.cosineSim(col("emb"), col("qemb"))
          .cast("float").as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** IVF (inverted-file) ANN: a k-means coarse quantizer partitions the
    * corpus into `nLists` cells; each query probes its `nProbe` nearest
    * centroids and scores exactly within those cells only. The clustered
    * counterpart to sign-LSH (better when the corpus has cluster
    * structure; LSH when it doesn't). Scale shape: centroids are tiny and
    * ride the plan as literals (no join against a centroid table), cell
    * assignment is a codegen'd argmin over `nLists` dot products, probing
    * is a plain bucket equi-join — candidate generation linear, exact
    * verification bounded by nProbe/nLists of the corpus. With
    * nProbe = nLists the search degenerates to exact brute force (the
    * recall-1 correctness anchor in AnnSpec).
    */
  def ivfTopK(data: DataFrame, queries: DataFrame, idCol: String, embCol: String,
      k: Int, nLists: Int = 16, nProbe: Int = 4, seed: Long = 42L,
      maxTrainVectors: Int = 100000): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    require(nProbe >= 1 && nProbe <= nLists, s"nProbe $nProbe not in [1, $nLists]")
    // Fit the coarse quantizer on a bounded sample: an iterative k-means
    // over the FULL corpus is itself a multi-scan job at 100 TB, and
    // centroid quality saturates at ~10^3 vectors per list. One cheap
    // count sizes the fraction; the 1.2x margin + limit give an exact cap.
    val all = data.select(
      array_to_vector(col(embCol).cast("array<double>")).as("features"))
    val n = data.count()
    val train =
      if (n <= maxTrainVectors) all
      else all.sample(withReplacement = false,
        math.min(1.0, maxTrainVectors * 1.2 / n), seed).limit(maxTrainVectors)
    val model = new KMeans().setK(nLists).setSeed(seed).setFeaturesCol("features")
      .fit(train)
    ivfProbe(data, queries, idCol, embCol, k, nProbe,
      model.clusterCenters.toSeq.map(_.toArray))
  }

  /** PORTABLE centroids for the IVF probe path: component (c, j) derives
    * from md5("centroid_c_j") on the same exact rational grid as
    * `portableHyperplanes`. Not data-adapted (that is `ivfTopK`'s k-means
    * fit, covered by AnnSpec's recall anchor) — these exist so the probe
    * machinery (argmin cell assignment, nProbe expansion, cell equi-join,
    * exact re-score) is replayable bit-for-bit by an external SQL oracle
    * (q43).
    */
  def portableCentroids(dim: Int, nLists: Int): Seq[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Seq.tabulate(nLists) { c =>
      Array.tabulate(dim) { j =>
        val hex = md.digest(s"centroid_${c}_$j".getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString.substring(0, 15)
        val h = java.lang.Long.parseLong(hex, 16)
        ((h % 2001L) - 1000L).toDouble / 1000.0
      }
    }
  }

  /** The IVF probe against a FIXED centroid set — everything after the
    * quantizer fit. Centroids ride the plan as literals; cell assignment is
    * a codegen'd argmin over `centroids.length` fused dot products; probing
    * explodes each query into its `nProbe` nearest cells and equi-joins.
    * Distance arithmetic (float-promoted dot, sequentially accumulated,
    * `dot * -2 + |c|^2`) is exactly what a SQL engine computes over the
    * same numbers, so cell assignment is engine-portable.
    */
  /** (dist, idx) structs per centroid: array_min/array_sort order by dist
    * with idx tiebreak — argmin and top-nProbe both stay inside codegen.
    * Squared distance to centroid c is |v|^2 - 2 v.c + |c|^2; |v|^2 is
    * constant per row, so the ranking needs only -2 v.c + |c|^2.
    */
  private def centroidCells(emb: Column, centroids: Seq[Array[Double]]): Column = {
    def dist2(c: Array[Double]): Column = {
      import org.apache.spark.sql.graft.{Bridge, DotProductFD}
      val dot = Bridge.column(DotProductFD(
        Bridge.expression(emb), Bridge.expression(typedLit(c))))
      dot * -2.0 + lit(c.map(x => x * x).sum)
    }
    array(centroids.zipWithIndex.map {
      case (c, i) => struct(dist2(c).as("d"), lit(i).as("cell"))
    }: _*)
  }

  /** IVF cell assignment: each vector's nearest centroid as (vec_id, emb,
    * cell). Shared by `ivfProbe` and the recall-audit operator (q131) so
    * the assignment arithmetic exists in exactly one place.
    */
  def ivfAssign(data: DataFrame, idCol: String, embCol: String,
      centroids: Seq[Array[Double]]): DataFrame =
    data.select(col(idCol).as("vec_id"), col(embCol).as("emb"))
      .withColumn("cell",
        array_min(centroidCells(col("emb"), centroids)).getField("cell"))

  /** Every query's centroids ranked by distance: (qid, qemb, cell,
    * probe_rank) for probe_rank 1..maxProbe — the per-config probe
    * expansion is a filter on probe_rank.
    */
  def ivfProbeRanks(queries: DataFrame, idCol: String, embCol: String,
      centroids: Seq[Array[Double]], maxProbe: Int): DataFrame =
    queries.select(col(idCol).as("qid"), col(embCol).as("qemb"))
      .select(col("qid"), col("qemb"), posexplode(
          slice(array_sort(centroidCells(col("qemb"), centroids)), 1, maxProbe)
            .getField("cell")).as(Seq("__p", "cell")))
      .select(col("qid"), col("qemb"), col("cell"),
        (col("__p") + 1).as("probe_rank"))

  def ivfProbe(data: DataFrame, queries: DataFrame, idCol: String, embCol: String,
      k: Int, nProbe: Int, centroids: Seq[Array[Double]]): DataFrame = {
    require(nProbe >= 1 && nProbe <= centroids.length,
      s"nProbe $nProbe not in [1, ${centroids.length}]")
    val listed = ivfAssign(data, idCol, embCol, centroids)
    val probed = ivfProbeRanks(queries, idCol, embCol, centroids, nProbe)
      .select(col("qid"), col("qemb"), col("cell"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    listed.join(broadcast(probed), "cell")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        VectorFunctions.cosineSim(col("emb"), col("qemb"))
          .cast("float").as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  // ---------------------------------------------------------------- PQ ---

  /** PORTABLE product-quantization codebook (Jégou et al., "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011): the embedding
    * space splits into `subspaces` contiguous blocks of dim/subspaces
    * dims; each block gets `codewords` centroids whose component (s, c, j)
    * derives from md5("pq_s_c_j") on the same exact rational grid as
    * `portableCentroids` — deterministic and replayable by any engine with
    * md5 + integer arithmetic, so the ENCODE → ADC machinery is SQL-oracle
    * gateable end-to-end (q156). A data-adapted codebook (per-subspace
    * k-means) would drop quantization error further but is covered by the
    * recall anchor in AnnSpec; the portable grid is the contract surface.
    */
  def portableCodebook(dim: Int, subspaces: Int,
      codewords: Int): Seq[Seq[Array[Double]]] = {
    require(dim % subspaces == 0, s"dim $dim not divisible by $subspaces")
    val subDim = dim / subspaces
    val md = java.security.MessageDigest.getInstance("MD5")
    Seq.tabulate(subspaces) { s =>
      Seq.tabulate(codewords) { c =>
        Array.tabulate(subDim) { j =>
          val hex = md.digest(s"pq_${s}_${c}_$j".getBytes("UTF-8"))
            .map(b => f"$b%02x").mkString.substring(0, 15)
          val h = java.lang.Long.parseLong(hex, 16)
          ((h % 2001L) - 1000L).toDouble / 1000.0
        }
      }
    }
  }

  /** Rank-equivalent squared L2 distance of a float subvector to a double
    * codeword: |x|^2 is constant per (row, subspace) so argmin needs only
    * -2 x.c + |c|^2 — but the ADC SUM across subspaces also only shifts by
    * the per-query constant Σ_s |q_s|^2, so the same form serves both.
    * Sequential double accumulation (DotProductFD) keeps every engine's
    * replay bit-identical.
    */
  private def adcScore(sub: Column, cw: Array[Double]): Column = {
    import org.apache.spark.sql.graft.{Bridge, DotProductFD}
    val dot = Bridge.column(DotProductFD(
      Bridge.expression(sub), Bridge.expression(typedLit(cw))))
    dot * -2.0 + lit(cw.map(x => x * x).sum)
  }

  /** PQ encode: each vector compresses to `subspaces` small ints — the
    * argmin codeword per block (ties → lowest code, the array_min struct
    * order). 64 float dims become 8 bytes: 32× smaller, which at 100 TB is
    * the difference between an embedding corpus that fits executor memory
    * for ADC scans and one that doesn't. Codebook rides the plan as
    * literals; the whole encode is one codegen'd projection, no shuffle.
    */
  def pqEncode(data: DataFrame, idCol: String, embCol: String,
      codebook: Seq[Seq[Array[Double]]]): DataFrame = {
    val subDim = codebook.head.head.length
    val codes = array(codebook.zipWithIndex.map { case (cws, s) =>
      array_min(array(cws.zipWithIndex.map { case (cw, c) =>
        struct(adcScore(slice(col(embCol), s * subDim + 1, subDim), cw).as("d"),
          lit(c).as("c"))
      }: _*)).getField("c")
    }: _*)
    data.select(col(idCol).as("vec_id"), codes.as("codes"))
  }

  /** Asymmetric-distance top-k: the query stays UNCOMPRESSED; its distance
    * to every codeword precomputes into a per-query lookup table
    * (subspaces × codewords), and each database vector scores as the sum
    * of `subspaces` table lookups over its codes — no float math per
    * candidate at all, the property that makes a compressed linear scan of
    * a billion vectors feasible. Queries broadcast; the scan never
    * shuffles the embedding column (codes only).
    */
  def pqAdcTopK(data: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int, codebook: Seq[Seq[Array[Double]]]): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(embCol).as("qemb"))
      .withColumn("qtab", pqQueryTable(col("qemb"), codebook)).drop("qemb")
    val w = Window.partitionBy(col("qid")).orderBy(col("adc"), col("vec_id"))
    pqEncode(data, idCol, embCol, codebook)
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), pqAdcSum.as("adc"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** Per-query ADC lookup table: distance of each subspace block of `qemb`
    * to every codeword (subspaces × codewords doubles).
    */
  private def pqQueryTable(qemb: Column,
      codebook: Seq[Seq[Array[Double]]]): Column = {
    val subDim = codebook.head.head.length
    array(codebook.zipWithIndex.map { case (cws, s) =>
      array(cws.map(cw =>
        adcScore(slice(qemb, s * subDim + 1, subDim), cw)): _*)
    }: _*)
  }

  /** ADC score of a coded row against the broadcast `qtab`. */
  private def pqAdcSum: Column =
    aggregate(
      zip_with(col("codes"), col("qtab"),
        (code, tab) => element_at(tab, code + 1)),
      lit(0.0), (acc, x) => acc + x)

  /** PQ recall-vs-exact in ONE exchange (the q156 gate): the ADC rank and
    * the exact-L2 rank are two orderings of the SAME (query, candidate)
    * pair frame, so both compute as two sorts over one qid partitioning —
    * one scan, one broadcast, one shuffle — instead of two separately
    * windowed branches meeting in a sort-merge join (the previous shape
    * paid ~6 sequential AQE stage barriers to rank 20k pairs: 2.4 s wall
    * at 0.6 s CPU on the sf0.1 gate). Arithmetic is unchanged — identical
    * ADC and exact-distance expressions, so the oracle replay still
    * matches bit-exactly. Returns (qid, hits, k).
    */
  def pqAdcRecall(data: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int, codebook: Seq[Seq[Array[Double]]]): DataFrame = {
    import org.apache.spark.sql.graft.{Bridge, DotProductFD}
    def dotFD(a: Column, b: Column): Column =
      Bridge.column(DotProductFD(Bridge.expression(a),
        Bridge.expression(b.cast("array<double>"))))
    val subDim = codebook.head.head.length
    val codes = array(codebook.zipWithIndex.map { case (cws, s) =>
      array_min(array(cws.zipWithIndex.map { case (cw, c) =>
        struct(adcScore(slice(col(embCol), s * subDim + 1, subDim), cw).as("d"),
          lit(c).as("c"))
      }: _*)).getField("c")
    }: _*)
    // persist pins the encode in its OWN stage: fused into the pair
    // projection, the 128-block argmin would re-evaluate per PAIR (and the
    // combined method blows the whole-stage-codegen budget) — measured
    // +50% CPU without the boundary. The encoded frame is id+emb+codes,
    // tiny at any corpus size relative to the corpus itself.
    val d = data.select(col(idCol).as("vec_id"), col(embCol).as("emb"),
      codes.as("codes"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = queries.select(col(idCol).as("qid"), col(embCol).as("qemb"))
      .withColumn("qtab", pqQueryTable(col("qemb"), codebook))
    val w = Window.partitionBy(col("qid"))
    d.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), pqAdcSum.as("adc"),
        (dotFD(col("emb"), col("qemb")) * -2.0 +
          dotFD(col("emb"), col("emb"))).as("d"))
      .withColumn("rn_adc",
        row_number().over(w.orderBy(col("adc"), col("vec_id"))))
      .withColumn("rn_ex",
        row_number().over(w.orderBy(col("d"), col("vec_id"))))
      .filter(col("rn_ex") <= k)
      .groupBy(col("qid"))
      .agg(sum(when(col("rn_adc") <= k, 1L).otherwise(0L)).as("hits"))
      .withColumn("k", lit(k.toLong))
  }

  /** IVFADC recall + scan-fraction audit from ONE candidate materialization
    * (the q157 gate): the ADC top-k and the scanned-count both derive from
    * a single persisted candidate frame (previously the `scanned` column
    * recomputed assignment + probe from scratch), and the exact side joins
    * once. Returns (qid, hits, scanned, k).
    */
  def ivfPqRecall(data: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int, centroids: Seq[Array[Double]],
      codebook: Seq[Seq[Array[Double]]], nProbe: Int,
      prebuiltIndex: Option[DataFrame] = None,
      groundTruth: Option[DataFrame] = None): DataFrame = {
    // A/B-measured shape (sf0.1, direct JVM): deriving rank AND
    // scanned-count from one persisted candidate frame beats both the
    // original triple-recompute (assignment+probe rebuilt for `scanned`)
    // and a fully-fused single-window-frame variant (whose extra window
    // pass over the all-pairs frame cost more than its saved barriers).
    // `prebuiltIndex` (vec_id, cell, codes) and `groundTruth` (qid,
    // vec_id — the exact-L2 top-k) let an audit consume the once-per-
    // corpus assets instead of re-encoding / re-scanning the corpus:
    // the production shape, where the index is built once and recall
    // is audited against a stored ground truth (the q171/q157 split).
    val cands = (prebuiltIndex match {
      case Some(enc) => ivfPqCandidatesFrom(enc, queries, idCol, embCol,
        centroids, codebook, nProbe)
      case None => ivfPqCandidates(data, queries, idCol, embCol, centroids,
        codebook, nProbe)
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wq = Window.partitionBy(col("qid")).orderBy(col("adc"), col("vec_id"))
    val topk = cands
      .withColumn("rn_adc", row_number().over(wq))
      .filter(col("rn_adc") <= k)
      .select(col("qid"), col("vec_id"), col("rn_adc"))
    val scanned = cands.groupBy(col("qid")).agg(count(lit(1)).as("scanned"))
    val exact = groundTruth.getOrElse(
      l2TopK(data, queries, idCol, embCol, k).select(col("qid"), col("vec_id")))
    val hits = exact
      .select(col("qid"), col("vec_id"))
      .join(topk, Seq("qid", "vec_id"), "left")
      .groupBy(col("qid"))
      .agg(sum(when(col("rn_adc").isNotNull, 1L).otherwise(0L)).as("hits"))
    hits.join(scanned, "qid").withColumn("k", lit(k.toLong))
  }

  /** Data-adapted PQ codebook: per-subspace Lloyd iterations (the k-means
    * step of Jégou et al. §III). One exploded (vec, subspace) frame is
    * cached and re-scanned per iteration; assignment is a codegen'd HOF
    * argmin against the full codebook literal (array<array<array<double>>>,
    * S×K×subDim ≈ 1k doubles — plan-baked, no join); the update is one
    * groupBy(s, code, dim) mean. Driver state is the codebook only —
    * bounded at S*K*subDim doubles regardless of corpus size, so the loop
    * is cluster-safe at any scale; empty clusters keep their previous
    * codeword (standard Lloyd degeneracy handling, deterministic).
    * Init: the `codewords` lowest-id vectors' subvectors — deterministic,
    * no RNG.
    */
  def pqTrain(data: DataFrame, idCol: String, embCol: String, dim: Int,
      subspaces: Int, codewords: Int,
      iters: Int = 5): Seq[Seq[Array[Double]]] = {
    require(dim % subspaces == 0, s"dim $dim not divisible by $subspaces")
    val subDim = dim / subspaces
    val subs = data
      .select(col(idCol).as("vec_id"), col(embCol).cast("array<double>").as("emb"))
      .select(col("vec_id"), explode(array((0 until subspaces).map(s =>
        struct(lit(s).as("s"),
          slice(col("emb"), s * subDim + 1, subDim).as("sub"))): _*)).as("e"))
      .select(col("vec_id"), col("e.s").as("s"), col("e.sub").as("sub"))
      .persist()
    try {
      val seed = data
        .select(col(idCol).as("vec_id"),
          col(embCol).cast("array<double>").as("emb"))
        .orderBy(col("vec_id")).limit(codewords).collect()
        .map(_.getSeq[Double](1).toArray)
      require(seed.length == codewords,
        s"corpus has fewer than $codewords vectors")
      var cb: Array[Array[Array[Double]]] = Array.tabulate(subspaces) { s =>
        Array.tabulate(codewords)(c =>
          seed(c).slice(s * subDim, (s + 1) * subDim))
      }
      def dist2(sub: Column, cw: Column): Column =
        aggregate(zip_with(sub, cw, (x, c) => (x - c) * (x - c)),
          lit(0.0), (acc, x) => acc + x)
      for (_ <- 0 until iters) {
        val cbl = typedLit(cb.map(_.map(_.toSeq).toSeq).toSeq)
        val myCws = element_at(cbl, col("s") + 1)
        val best = array_min(array((0 until codewords).map(c =>
          struct(dist2(col("sub"), element_at(myCws, c + 1)).as("d"),
            lit(c).as("c"))): _*)).getField("c")
        val means = subs.withColumn("c", best)
          .select(col("s"), col("c"), posexplode(col("sub")).as(Seq("j", "x")))
          .groupBy(col("s"), col("c"), col("j")).agg(avg(col("x")).as("m"))
          .collect()
        val next = cb.map(_.map(_.clone()))
        means.foreach { r =>
          next(r.getAs[Int]("s"))(r.getAs[Int]("c"))(r.getAs[Int]("j")) =
            r.getAs[Double]("m")
        }
        cb = next
      }
      cb.map(_.toSeq).toSeq
    } finally { subs.unpersist(); () }
  }

  /** IVFADC (Jégou et al. §IV): the coarse quantizer routes each vector to
    * its nearest cell; PQ encodes the RESIDUAL v - centroid(cell); a query
    * probes its `nProbe` nearest cells and ADC-scans only those cells'
    * codes, with a residual lookup table built per (query, cell). Because
    * scores are FULL per-subspace squared distances ‖(q-c)_s - cw_s‖²
    * (not the rank-equivalent shortcut, which drops a per-cell constant
    * and would make cross-cell ranking meaningless), candidates from
    * different probed cells rank on one comparable scale. This is the
    * billion-vector architecture: the corpus stores cell + 8 bytes per
    * vector, a query touches nProbe/nLists of it, and no float vector
    * moves at scan time. All arithmetic is HOF zip/fold in ascending
    * index order — bit-replayable by the SQL oracle (q157).
    */
  /** The IVFADC candidate frame BEFORE ranking: (qid, vec_id, adc) for
    * every database vector in one of the query's probed cells. Split out
    * so recall auditing can derive the top-k AND the scanned-count from
    * ONE encode scan (q157 previously recomputed assignment + probe for
    * its `scanned` column).
    */
  def ivfPqCandidates(data: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, centroids: Seq[Array[Double]],
      codebook: Seq[Seq[Array[Double]]], nProbe: Int): DataFrame = {
    // own-stage boundary for the residual encode: fused past the probe
    // join it re-evaluates per (candidate, probe) pair and blows the
    // whole-stage-codegen budget (see pqAdcRecall)
    val enc = ivfPqEncode(data, idCol, embCol, centroids, codebook)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ivfPqCandidatesFrom(enc, queries, idCol, embCol, centroids, codebook,
      nProbe)
  }

  /** The IVFADC index itself: (vec_id, cell, codes) — coarse cell plus the
    * `subspaces` residual-PQ codes. This is the asset a production corpus
    * builds ONCE and every query-time scan consumes; split out so the q171
    * gate can time the build and q157 can consume a memoized copy instead
    * of re-encoding the corpus per bench rep.
    */
  def ivfPqEncode(data: DataFrame, idCol: String, embCol: String,
      centroids: Seq[Array[Double]],
      codebook: Seq[Seq[Array[Double]]]): DataFrame = {
    val subDim = codebook.head.head.length
    val centLit = typedLit(centroids.map(_.toSeq))
    def residOf(emb: Column, cell: Column): Column =
      zip_with(emb.cast("array<double>"), element_at(centLit, cell + 1),
        (x, c) => x - c)
    def l2(sub: Column, cw: Array[Double]): Column =
      aggregate(zip_with(sub, typedLit(cw.toSeq), (x, c) => (x - c) * (x - c)),
        lit(0.0), (acc, x) => acc + x)
    ivfAssign(data, idCol, embCol, centroids)
      .withColumn("resid", residOf(col("emb"), col("cell")))
      .select(col("vec_id"), col("cell"),
        array(codebook.zipWithIndex.map { case (cws, s) =>
          array_min(array(cws.zipWithIndex.map { case (cw, c) =>
            struct(l2(slice(col("resid"), s * subDim + 1, subDim), cw).as("d"),
              lit(c).as("c"))
          }: _*)).getField("c")
        }: _*).as("codes"))
  }

  /** Candidate generation over a PRE-BUILT index frame (vec_id, cell,
    * codes): the per-query-time work only — probe ranking, residual
    * lookup tables, and the broadcast join against the probed cells.
    */
  def ivfPqCandidatesFrom(enc: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, centroids: Seq[Array[Double]],
      codebook: Seq[Seq[Array[Double]]], nProbe: Int): DataFrame = {
    val subDim = codebook.head.head.length
    val centLit = typedLit(centroids.map(_.toSeq))
    def residOf(emb: Column, cell: Column): Column =
      zip_with(emb.cast("array<double>"), element_at(centLit, cell + 1),
        (x, c) => x - c)
    def l2(sub: Column, cw: Array[Double]): Column =
      aggregate(zip_with(sub, typedLit(cw.toSeq), (x, c) => (x - c) * (x - c)),
        lit(0.0), (acc, x) => acc + x)
    val probedT = ivfProbeRanks(queries, idCol, embCol, centroids, nProbe)
      .withColumn("qresid", residOf(col("qemb"), col("cell")))
      .select(col("qid"), col("cell"),
        array(codebook.zipWithIndex.map { case (cws, s) =>
          array(cws.map(cw =>
            l2(slice(col("qresid"), s * subDim + 1, subDim), cw)): _*)
        }: _*).as("qtab"))
    enc.join(broadcast(probedT), "cell")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        aggregate(
          zip_with(col("codes"), col("qtab"),
            (code, tab) => element_at(tab, code + 1)),
          lit(0.0), (acc, x) => acc + x).as("adc"))
  }

  def ivfPqTopK(data: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int, centroids: Seq[Array[Double]],
      codebook: Seq[Seq[Array[Double]]], nProbe: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("adc"), col("vec_id"))
    ivfPqCandidates(data, queries, idCol, embCol, centroids, codebook, nProbe)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** Exact squared-L2 top-k — PQ's ground truth (rank-equivalent form
    * -2 x.q + |x|^2; |q|^2 is constant per query). The right side widens
    * float→double (exact) so DotProductFD's sequential double accumulation
    * replays as `x[j]::DOUBLE * q[j]::DOUBLE` in any SQL engine.
    */
  def l2TopK(data: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.graft.{Bridge, DotProductFD}
    def dotFD(a: Column, b: Column): Column =
      Bridge.column(DotProductFD(Bridge.expression(a),
        Bridge.expression(b.cast("array<double>"))))
    val q = queries.select(col(idCol).as("qid"), col(embCol).as("qemb"))
    val w = Window.partitionBy(col("qid")).orderBy(col("d"), col("vec_id"))
    data.select(col(idCol).as("vec_id"), col(embCol).as("emb"))
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (dotFD(col("emb"), col("qemb")) * -2.0 +
          dotFD(col("emb"), col("emb"))).as("d"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** All near-neighbor PAIRS above a similarity threshold via MULTI-BAND
    * sign-LSH: `bands` independent plane sets (seeded per band), a pair is
    * a candidate iff it collides in at least one band — narrow per-band
    * buckets (2^planesPerBand) keep candidate sets small while the band
    * union keeps recall. Candidates come from the shared one-shuffle
    * group-and-explode generator (Dedup.pairsWithinGroups) — never a
    * bucket self-join, which would re-evaluate the bucketing on both
    * sides and blow up quadratically on a hot bucket. `maxBucketSize`
    * drops over-occupied buckets entirely (standard, slightly lossy,
    * off by default) — the skew cap for near-duplicate-heavy corpora.
    */
  /** Rep-level machinery shared by the pair emitter (cosineNearDupPairs)
    * and the component family (cosineNearDupComponents): contraction,
    * fused sign-LSH banding, bucket cap, candidate generation, exact
    * cosine verify. Returns (members, verified rep pairs at minSim,
    * within-group aux = reps whose group SELF-pairs qualify).
    */
  private def repCosineNearDups(data: DataFrame, idCol: String,
      embCol: String, minSim: Double, bands: Int, planesPerBand: Int,
      dim: Int, seed: Long, maxBucketSize: Option[Int],
      portable: Boolean): (DataFrame, DataFrame, DataFrame) = {
    // exact-duplicate contraction (operators.Contraction scaladoc): the
    // bucket index, candidate explode and cosine verify run on one rep per
    // distinct NONZERO embedding (identical nonzero vectors share every
    // sign bucket at cosine exactly 1.0); zero vectors get singleton keys
    // (no positive threshold admits them) and ride the committed path.
    // 128-bit md5 over the json rendering — collision-free in practice,
    // the 16-byte-fingerprint house pattern.
    val base0 = data.select(col(idCol).as("id"), col(embCol).as("emb"))
    val ckey = when(exists(col("emb"), x => x =!= lit(0.0f)),
      md5(to_json(struct(col("emb"))))).otherwise(concat(lit("z:"), col("id")))
    val (members, base) = Contraction.byKey(base0, "id", ckey)
    // one global plane family (portable: md5-derived, global plane index =
    // band * planesPerBand + bit, replayable in SQL; seeded: per-band
    // Gaussian draws concatenated). When the family fits a long (<= 63
    // planes) ALL band buckets come from ONE fused projection pass —
    // shiftright/& slices the packed bits per band; otherwise fall back to
    // one fused pass per band.
    val allPlanes: Seq[Array[Double]] =
      if (portable) portableHyperplanes(dim, bands * planesPerBand)
      else (0 until bands).flatMap(b =>
        hyperplanes(dim, planesPerBand, seed + b).map(_.map(_.toDouble)))
    val banded =
      if (allPlanes.length <= 63) {
        val mask = (1L << planesPerBand) - 1L
        val slices = (0 until bands).map { b =>
          struct(lit(b).as("band"),
            shiftright(col("__bits"), b * planesPerBand)
              .bitwiseAND(mask).as("bucket"))
        }
        // __bits in its own projection: the fused pass runs ONCE per row —
        // CollapseProject keeps a non-cheap expression referenced `bands`
        // times in its own operator rather than inlining it
        base.select(col("id"), bucketIdPortable(col("emb"), allPlanes).as("__bits"))
          .select(col("id"), explode(array(slices: _*)).as("bk"))
          .select(col("id"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
      } else {
        val bandStructs = (0 until bands).map { b =>
          val bid = bucketIdPortable(col("emb"),
            allPlanes.slice(b * planesPerBand, (b + 1) * planesPerBand))
          struct(lit(b).as("band"), bid.as("bucket"))
        }
        base.select(col("id"), explode(array(bandStructs: _*)).as("bk"))
          .select(col("id"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
      }
    val capped = maxBucketSize match {
      case Some(m) =>
        // member-weighted bucket size: each rep's row counts its whole
        // duplicate group, so the cap's semantics are contraction-invariant
        val wts = Contraction.repWeights(members)
        val hot = banded.join(wts, col("id") === col("__wid"))
          .groupBy("band", "bucket").agg(sum(col("__w")).as("cnt"))
          .filter(col("cnt") > m).select("band", "bucket")
        banded.join(broadcast(hot), Seq("band", "bucket"), "left_anti")
      case None => banded
    }
    val cand = Dedup.pairsWithinGroups(capped, Seq("band", "bucket")).distinct()
    val repPairs = cand
      .join(base.select(col("id").as("da"), col("emb").as("ea")), "da")
      .join(base.select(col("id").as("db"), col("emb").as("eb")), "db")
      .select(col("da"), col("db"),
        VectorFunctions.cosineSim(col("ea"), col("eb")).as("sim"))
      .filter(col("sim") >= minSim)
    // within-group pairs: the self-cosine (computed by the same kernel, so
    // the emitted double is bit-identical to the uncontracted pair's) must
    // clear the threshold, and under a cap the rep must retain >= 1 bucket
    val selfOk = base.select(col("id").as("__rep0"),
        VectorFunctions.cosineSim(col("emb"), col("emb")).as("sim"))
      .filter(col("sim") >= minSim)
    val withinAux = maxBucketSize match {
      case Some(_) =>
        selfOk.join(capped.select(col("id").as("__rep0")).distinct(), "__rep0")
      case None => selfOk
    }
    (members, repPairs, withinAux)
  }

  def cosineNearDupPairs(data: DataFrame, idCol: String, embCol: String,
      minSim: Double, bands: Int = 4, planesPerBand: Int = 12,
      dim: Int = 64, seed: Long = 42L,
      maxBucketSize: Option[Int] = None,
      portable: Boolean = false): DataFrame = {
    val (members, repPairs, withinAux) = repCosineNearDups(data, idCol,
      embCol, minSim, bands, planesPerBand, dim, seed, maxBucketSize,
      portable)
    Contraction.expandUndirected(repPairs, members)
      .unionByName(Contraction.withinPairs(members, withinAux, ordered = false))
  }

  /** Cosine near-dup connected components WITHOUT materializing the member
    * pair list (round 14, the q64 face of the sf100-probe defect: CC over
    * expanded member pairs shuffles O(multiplicity²) edges). Identical
    * nonzero embeddings are cliques at cosine 1.0, so components over the
    * VERIFIED rep pairs plus one member-attach join reproduce CC over the
    * expanded pairs exactly — the same theorem the committed q64 oracle's
    * scalable form uses. Returns (id, component).
    */
  def cosineNearDupComponents(data: DataFrame, idCol: String,
      embCol: String, minSim: Double, bands: Int = 4,
      planesPerBand: Int = 12, dim: Int = 64, seed: Long = 42L,
      maxBucketSize: Option[Int] = None,
      portable: Boolean = false): DataFrame = {
    val (members, repPairs, withinAux) = repCosineNearDups(data, idCol,
      embCol, minSim, bands, planesPerBand, dim, seed, maxBucketSize,
      portable)
    val repComp = ConnectedComponents
      .assign(repPairs.select(col("da"), col("db")))
      .select(col("id").as("__rid"), col("comp"))
    members
      .join(repComp, col("rep") === col("__rid"), "left")
      .join(withinAux.select(col("__rep0")), col("rep") === col("__rep0"),
        "left")
      .filter(col("comp").isNotNull ||
        (col("gsize") >= 2 && col("__rep0").isNotNull))
      .select(col("id"), coalesce(col("comp"), col("rep")).as("component"))
  }

  /** Non-minimum members of cosine near-dup components — the embedding-
    * space dedup drop set (see cosineNearDupComponents).
    */
  def cosineNearDupNonSurvivors(data: DataFrame, idCol: String,
      embCol: String, minSim: Double, bands: Int = 4,
      planesPerBand: Int = 12, portable: Boolean = false): DataFrame =
    cosineNearDupComponents(data, idCol, embCol, minSim, bands,
        planesPerBand, portable = portable)
      .filter(col("id") =!= col("component"))
      .select(col("id"))

  /** Config auto-pick over a recall audit frame (the q131 shape:
    * `(method, param, k, hits, candidates)` per configuration): for each
    * target recall percentage, the CHEAPEST configuration meeting it —
    * fewest candidates (candidates = exact re-scores paid per audit, the
    * index's cost proxy), ties broken by (method, param). The threshold
    * is integer math — `hits * 100 >= target_pct * k * nQueries` — so
    * the result is hash-gateable with no float tolerance. Targets no
    * config meets surface as an explicit ('none', 0, 0, 0) row.
    *
    * The audit frame is one row per configuration (a handful), so this
    * is driver-cheap by construction; it stays declarative anyway so it
    * composes into a gated plan.
    */
  def pickCheapestConfig(audit: DataFrame, nQueries: Long,
      targetsPct: Seq[Int]): DataFrame = {
    val spark = audit.sparkSession
    import spark.implicits._
    val targets = targetsPct.toDF("target_pct")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("target_pct"))
      .orderBy(col("candidates"), col("method"), col("param"))
    val met = audit.crossJoin(broadcast(targets))
      .filter(col("hits") * 100L >=
        col("target_pct").cast("long") * col("k") * lit(nQueries))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("target_pct"), col("method"), col("param"),
        col("hits"), col("candidates"))
    targets.join(met, Seq("target_pct"), "left")
      .select(col("target_pct").cast("int").as("target_pct"),
        coalesce(col("method"), lit("none")).as("method"),
        coalesce(col("param"), lit(0)).cast("int").as("param"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        coalesce(col("candidates"), lit(0L)).as("candidates"))
  }
}
