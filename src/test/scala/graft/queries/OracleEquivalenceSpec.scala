package graft.queries

import graft.SparkEntry
import org.scalatest.funsuite.AnyFunSuite

/** Machine-check for the committed scalable oracles (round 14, VERDICT r13
  * #1): every collapse-class query carries BOTH its transparent all-pairs
  * SEMANTIC definition and the proven-equivalent scalable formulation that
  * now lives in the committed `oracleSql`. This spec keeps that contract
  * checked on every `sbt test` — it dumps the (committed, semantic) pairs
  * and has DuckDB (the oracle instrument itself) run both at sf0.01,
  * asserting exact frame equality via tools/oracle_equiv_check.py. A drift
  * in either formulation (or in the contraction theorem's preconditions on
  * the corpus) fails here instead of surfacing as a silent oracle swap at
  * an SF where only one side can run.
  *
  * The four-SF proofs behind the rewrites: bench_artifacts/r13/
  * oracle_equiv.md (staged temp-table form) and bench_artifacts/r14/
  * (this single-statement `AS MATERIALIZED` form).
  */
class OracleEquivalenceSpec extends AnyFunSuite {

  // the collapse class, pinned by name: a query silently dropping its
  // semantic definition (or a new pair emitter landing without one) is a
  // contract change that must be deliberate
  private val CollapseClass = Set(
    "q19_jaccard_pairs", "q20_minhash_neardups", "q21_simhash_neardups",
    "q35_cosine_pairs", "q44_neardup_clusters", "q61_dedup_survivors",
    "q64_embedding_dedup_survivors", "q69_fuzzy_name_join",
    "q75_incremental_neardup", "q94_prefix_setsim", "q108_winnowing_pairs",
    "q122_containment_pairs", "q139_source_packing", "q141_delivery_chain",
    "q174_curation_flagship")

  test("every collapse-class query carries a semantic oracle, and only those") {
    assert(SparkEntry.semanticOracleSql.keySet == CollapseClass)
  }

  test("committed scalable oracles are frame-equal to their semantic definitions (DuckDB, sf0.01)") {
    val pairs = SparkEntry.semanticOracleSql.map { case (name, semantic) =>
      val committed = SparkEntry.oracleSql(name)
      assert(committed != semantic, s"$name: committed oracle IS the semantic form")
      name -> Map("committed" -> committed, "semantic" -> semantic)
    }
    // JSON by hand (same escape discipline as Verify's dump)
    def esc(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = pairs.map { case (k, v) =>
      s"${esc(k)}: {${v.map { case (a, b) => s"${esc(a)}: ${esc(b)}" }.mkString(",")}}"
    }.mkString("{", ",", "}")
    val f = java.nio.file.Files.createTempFile("oracle-pairs", ".json")
    java.nio.file.Files.writeString(f, json)
    val out = new StringBuilder
    val code = scala.sys.process.Process(Seq("python3",
        "tools/oracle_equiv_check.py", "/root/testdata/sf0.01", f.toString))
      .!(scala.sys.process.ProcessLogger(l => out.append(l).append('\n'),
        l => out.append(l).append('\n')))
    java.nio.file.Files.delete(f)
    assert(code == 0, s"oracle_equiv_check failed:\n$out")
    assert(out.toString.contains(s"${pairs.size}/${pairs.size} equivalent"),
      s"unexpected comparator output:\n$out")
  }
}
