package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.KMeansLloyd

/** Pressure test for the exact Lloyd path (the regime the gated SFs never
  * reach — q163 clusters 2k vectors): 400k synthetic 16-dim vectors with
  * planted cluster structure, k=8, 3 full updates, checked EXACTLY
  * (assignments via per-cluster counts, component sums and inertia)
  * against a shared-nothing driver replay using plain arrays — no engine
  * code on the replay path. Also certifies the planted structure is
  * recovered (each seed's cluster ends within its planted blob).
  * Prints a summary block for PRESSURE.md.
  */
object PressureKmeans {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(cores = 32,
      appName = "pressure-kmeans")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = 400000
    val dim = 16
    val k = 8
    val iters = 3
    // deterministic generator: vector i belongs to planted blob i % 8 with
    // a blob-specific offset pattern plus an id-derived jitter — all
    // integer-exact arithmetic so the replay sees identical floats
    def gen(i: Int): Array[Float] = {
      val blob = i % 8
      Array.tabulate(dim) { j =>
        // (j + blob) % 8: all 8 blob patterns pairwise distinct (a % 4
        // pattern would alias blob b with b+4 and no clustering could
        // separate them — the planted-recovery assertion needs 8 real blobs)
        val base = if ((j + blob) % 8 == 0) 0.4f else -0.1f
        val jitter = (((i.toLong * 2654435761L + j * 40503L) >>> 16) %
          2001L - 1000L).toFloat / 10000.0f
        base + jitter
      }
    }
    val vecs = (0 until n).map(gen)
    val df = spark.range(n.toLong).select($"id".as("vec_id"))
      .map { r => (r.getLong(0), gen(r.getLong(0).toInt).toSeq) }
      .toDF("vec_id", "embedding")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"pressure-kmeans: $n vectors, dim $dim, k=$k, $iters updates")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }

    val got = timed("engine clusterStats") {
      KMeansLloyd.clusterStats(df, "vec_id", "embedding", dim, k, iters)
        .collect()
        .map(r => r.getAs[Int]("cluster") ->
          (r.getAs[Long]("n"), r.getAs[Double]("inertia")))
        .toMap
    }

    // shared-nothing replay: plain arrays, no engine code. S·S is widened
    // to BigInt exactly like the engine (a Long Σ S_j² wraps around ~10^6
    // rows per cluster); it is constant per centroid, so it precomputes
    // outside the per-vector loop — faster AND exact.
    val (expected, finalAssign) = timed("driver replay") {
      val q = vecs.map(_.map(x => math.floor(x.toDouble * 1000 + 0.5).toLong))
      var cents: Seq[(Int, Array[Long], Long)] =
        (0 until k).map(i => (i, q(i), 1L))
      def assign(): Map[Int, Seq[Int]] = {
        val ssOverN2 = cents.map { case (_, s, nn) =>
          s.map(x => BigInt(x) * BigInt(x)).sum.toDouble / (nn.toDouble * nn)
        }.toArray
        q.indices.groupBy { i =>
          val v = q(i)
          cents.zipWithIndex.map { case ((id, s, nn), ci) =>
            var dot = 0L; var j = 0
            while (j < dim) { dot += v(j) * s(j); j += 1 }
            ((dot * -2L).toDouble / nn.toDouble + ssOverN2(ci), id)
          }.min._2
        }
      }
      for (_ <- 1 to iters) {
        cents = assign().toSeq.sortBy(_._1).map { case (id, members) =>
          val sums = Array.tabulate(dim)(j => members.iterator.map(q(_)(j)).sum)
          (id, sums, members.size.toLong)
        }
      }
      val fin = assign()
      val stats = fin.map { case (id, members) =>
        val sums = Array.tabulate(dim)(j => members.iterator.map(q(_)(j)).sum)
        val svv = members.iterator.map(i => q(i).map(x => x * x).sum).sum
        val ss = sums.map(x => BigInt(x) * BigInt(x)).sum
        id -> (members.size.toLong, svv.toDouble - ss.toDouble / members.size)
      }
      (stats, fin)
    }

    require(got == expected,
      s"engine != driver replay:\n  engine  $got\n  replay  $expected")
    println(s"  EXACT: ${got.size} clusters, counts+inertia bit-identical")

    // planted-structure recovery: seed i (vector i) belongs to planted blob
    // i % 8, so cluster id i must end DOMINATED by blob i — asserted on the
    // replay's final partition, which the engine partition matches exactly
    // above (counts + inertia are membership-sensitive checksums).
    val total = got.values.map(_._1).sum
    require(total == n.toLong, s"partition covers $total of $n rows")
    finalAssign.toSeq.sortBy(_._1).foreach { case (id, members) =>
      val inBlob = members.count(_ % 8 == id)
      val frac = inBlob.toDouble / members.size
      println(f"  cluster $id: ${members.size}%6d members, " +
        f"${frac * 100}%6.2f%% from planted blob $id")
      require(frac >= 0.99,
        f"cluster $id only $frac%.4f within planted blob $id")
    }
    println(s"  planted blobs: cluster sizes ${got.toSeq.sortBy(_._1)
      .map(_._2._1).mkString(", ")}")
    spark.stop()
  }
}
