package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Plan-budget regression specs for the codegen-fragile PQ/IVFADC family
  * (round 11, VERDICT r10 #6). Round 10's q156 blowup — the 128-block PQ
  * argmin collapsing into the pair projection, re-evaluating per PAIR and
  * exceeding the whole-stage-codegen budget (2.39 s vs 0.70 s) — was caught
  * only by the paired bench. These specs pin the load-bearing plan facts so
  * the shape regression fails a unit test instead:
  *
  *  - the encode is PINNED in its own stage (an InMemoryTableScan feeds the
  *    pair join), never fused past it;
  *  - no argmin expression appears ABOVE the pin — i.e. nothing re-expands
  *    the per-block codeword search into a per-pair stage;
  *  - the exchange census is exactly the audited one (a new shuffle or a
  *    lost broadcast is a plan regression even when results stay right).
  *
  * All assertions run on the FINAL adaptive plan (collect first), on the
  * section before "== Initial Plan ==".
  */
class AnnPlanSpec extends SparkSpec {

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  private def count(s: String, token: String): Int =
    token.r.findAllIn(s).length

  test("q156: PQ encode pinned; argmin never re-expands past the pair join") {
    val p = finalPlan(
      SparkEntry.queries("q156_pq_adc_recall")(spark, sf("sf0.01")))
    val imr = p.indexOf("InMemoryTableScan")
    assert(imr >= 0, "encode stage not pinned (no InMemoryTableScan)")
    // the pre-6b18fb3 failure shape: array_min (the codeword argmin) fused
    // above the pin into the per-pair projection
    assert(count(p.substring(0, imr), "array_min") == 0,
      "PQ argmin re-expanded above the encode pin")
    assert(count(p, "BroadcastNestedLoopJoin") == 1,
      "pair generation is not the single broadcast cross join")
    // exchange census: ONE qid shuffle serves both window ranks and the
    // final agg; smallOrdered adds its single-partition gather. The census
    // counts REQUIRED exchanges only — the round-14 scan fan-out
    // (REPARTITION_BY_NUM, no-op on a real lake) is width, not a new
    // clustering requirement.
    val required = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") &&
        !l.contains("REPARTITION_BY_NUM"))
    assert(required == 1, s"q156 shuffle census changed:\n$p")
    assert(count(p, "Exchange rangepartitioning") == 0, "unexpected sort")
  }

  test("q157: consumes the prebuilt index — no argmin anywhere; census fixed") {
    val p = finalPlan(
      SparkEntry.queries("q157_ivfadc_recall")(spark, sf("sf0.01")))
    // the query path consumes the memoized (vec_id, cell, codes) index and
    // the stored ground truth: ANY argmin in this plan means the corpus
    // encode leaked back into the per-rep query path
    assert(count(p, "array_min") == 0,
      "corpus encode (argmin) re-entered the q157 query path")
    // round 12: the index is a PERSISTED cell-partitioned parquet table —
    // the plan must read stored codes from disk, not a rebuilt local frame
    assert(p.contains("graft-ivfadc"),
      "q157 no longer scans the on-disk index table")
    // round 13: the exact-L2 ground truth is the SECOND on-disk side table
    // (<index>_gt) — both once-per-corpus assets arrive via parquet scans,
    // no collected memo anywhere in the ANN chain
    assert(p.contains("_gt"),
      "q157 no longer scans the on-disk ground-truth side table")
    assert(p.contains("InMemoryTableScan"),
      "candidate frame not pinned (rank and scanned-count must share it)")
    // census: qid window shuffle, hits-join shuffle pair collapses to
    // broadcast (ground truth is 100 rows), scanned-join reuses qid
    assert(count(p, "Exchange hashpartitioning") <= 3,
      s"q157 shuffle census grew:\n$p")
    assert(count(p, "BroadcastNestedLoopJoin") == 0,
      "a cross join appeared in the probed-cell scan")
  }

  test("q140: consumes the persisted audit side table through a scan") {
    // round 14 (VERDICT r13 #4): the audit frame is the THIRD on-disk
    // side table (<index>_audit) — q140's pick must read it via parquet
    // scan, with no audit recompute (no cross join, no plane projection)
    // and no collected-memo rebuild (a LocalTableScan of 6 rows)
    val p = finalPlan(
      SparkEntry.queries("q140_ann_config_pick")(spark, sf("sf0.01")))
    assert(p.contains("_audit"),
      "q140 no longer scans the on-disk audit side table")
    // recompute markers: the pick's ONLY cross join is its own broadcast
    // targets spine; the audit's brute-force ground truth would add a
    // second, and its IVF assignment carries an argmin — neither may
    // appear (the targets spine's LocalTableScan is likewise expected,
    // so that token is not asserted on)
    assert(count(p, "BroadcastNestedLoopJoin") == 1,
      "q140 re-ran the brute-force audit ground truth")
    assert(count(p, "array_min") == 0,
      "q140 re-ran the IVF assignment (audit recompute)")
  }

  test("q131 audit frame: candidate pin present; fused projections hold") {
    val p = finalPlan(AnnAudit.auditFrame(spark, sf("sf0.01")))
    val imr = p.indexOf("InMemoryTableScan")
    assert(imr >= 0, "allCand not pinned (hits and candCounts must share it)")
    assert(count(p.substring(0, imr), "array_min") == 0,
      "IVF assignment argmin re-expanded above the candidate pin")
    // exactly one brute-force cross join (the ground truth); the LSH and
    // IVF candidate branches must stay broadcast-key joins
    assert(count(p, "BroadcastNestedLoopJoin") == 1,
      "candidate generation degraded to a cross join")
    // required exchanges only — round-14 scan fan-outs are
    // REPARTITION_BY_NUM width, not clustering requirements
    assert(p.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning") &&
          !l.contains("REPARTITION_BY_NUM")) <= 3,
      s"q131 shuffle census grew:\n$p")
  }
}
