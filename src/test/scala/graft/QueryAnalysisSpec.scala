package graft

/** Every declared query must at least ANALYZE against the testdata the
  * driver currently generates. Regression guard for round 6, where a
  * driver-side regeneration flipped `events.ts` from TIMESTAMP(NANOS) to
  * TIMESTAMP_NTZ and five queries silently vanished from the correctness
  * gate (`unix_micros` rejects NTZ at analysis time; Verify's per-query
  * try/catch logged to stderr and dropped them). Analysis is enough to
  * catch the whole class — unresolved functions, schema drift, missing
  * columns — without paying for execution.
  */
class QueryAnalysisSpec extends SparkSpec {

  test("all declared queries analyze against current testdata schemas") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sf()).queryExecution.assertAnalyzed(); None }
        catch {
          case scala.util.control.NonFatal(e) =>
            Some(s"$name: ${String.valueOf(e.getMessage).linesIterator.take(2).mkString(" ")}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries fail analysis:\n${failures.mkString("\n")}")
  }
}
