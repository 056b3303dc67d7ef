package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.{TextAnalysis, VectorFunctions}
import graft.operators.Dedup

/** Training-data-pipeline operator surface over the documents/embeddings
  * tables: text features, language ID, exact + near dedup, and
  * similarity search (brute-force cosine as the correctness baseline).
  *
  * Scale notes:
  *  - all text features are codegen'd Column transforms: one narrow scan,
  *    no UDFs, no shuffle except where an aggregate/join demands one;
  *  - dedup never shuffles raw text — fingerprints (16 bytes) and shingle
  *    inverted indexes carry the joins;
  *  - cosine scoring is a native Catalyst expression inside whole-stage
  *    codegen; the query side of a top-k sim search broadcasts, keeping
  *    the big side shuffle-free (at 100 TB the LSH/IVF candidate path in
  *    Dedup/ANN cuts the candidate set, same verify-exact pattern).
  */
object TextVector {

  /** Stopword IN-list shared verbatim with the oracle. */
  private val stopList = TextAnalysis.Stopwords.map(w => s"'$w'").mkString(", ")

  /** Per-document text feature vector (token counts, subword count,
    * stopword ratio, mean token length, md5 fingerprint) — SURVEY.md §7.9
    * "text analysis" surface.
    */
  private val q16 = QueryDef.sql(
    "per-document text features (token/subword counts, ratios, quality, fingerprint)")(
    s"""WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
       |f AS (SELECT doc_id, text,
       |  len(t) AS n_tokens,
       |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_subwords,
       |  len(list_filter(t, x -> x IN ($stopList)))::DOUBLE / len(t) AS stop_ratio,
       |  (length(text) - len(t) + 1)::DOUBLE / len(t) AS mean_tok_len,
       |  len(regexp_extract_all(text, '[^a-z0-9 ]'))::DOUBLE / length(text) AS punct_ratio,
       |  md5(text) AS fp
       |FROM tok)
       |SELECT doc_id, n_tokens, n_subwords, stop_ratio, mean_tok_len,
       |  punct_ratio,
       |  (1.0::DOUBLE - least(1.0::DOUBLE, abs(stop_ratio - 0.35::DOUBLE) / 0.35::DOUBLE)) * 0.4::DOUBLE
       |    + (1.0::DOUBLE - least(1.0::DOUBLE, abs(mean_tok_len - 5.0::DOUBLE) / 5.0::DOUBLE)) * 0.3::DOUBLE
       |    + (1.0::DOUBLE - least(1.0::DOUBLE, punct_ratio / 0.3::DOUBLE)) * 0.3::DOUBLE AS quality,
       |  fp
       |FROM f ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables(s, dir).documentsFanned.select(
      $"doc_id",
      TextAnalysis.tokenCount($"text").cast("long").as("n_tokens"),
      TextAnalysis.subwordCount($"text").cast("long").as("n_subwords"),
      TextAnalysis.stopwordRatio($"text").as("stop_ratio"),
      TextAnalysis.meanTokenLength($"text").as("mean_tok_len"),
      TextAnalysis.punctRatio($"text").as("punct_ratio"),
      TextAnalysis.qualityScore($"text").as("quality"),
      TextAnalysis.fingerprint($"text").as("fp"))
      .cachedOrdered($"doc_id")
  }

  /** Language-ID distribution: marker-lexicon argmax per document, counted
    * per predicted language.
    */
  private val q17 = {
    def hits(words: Seq[String]) =
      words.map(w => s"'$w'").mkString(", ")
    val en = hits(Seq("the", "a")); val de = hits(Seq("der", "die", "und"))
    val es = hits(Seq("el", "la", "los")); val fr = hits(Seq("le", "la", "les"))
    QueryDef.sql("language-ID via marker-word argmax, counted per language")(
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |sc AS (SELECT doc_id,
         |  len(list_filter(t, x -> x IN ($en))) AS s_en,
         |  len(list_filter(t, x -> x IN ($de))) AS s_de,
         |  len(list_filter(t, x -> x IN ($es))) AS s_es,
         |  len(list_filter(t, x -> x IN ($fr))) AS s_fr
         |FROM tok)
         |SELECT CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
         |            WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
         |            WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS lang_pred,
         |  count(*) AS n_docs
         |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documentsFanned
        .groupBy(TextAnalysis.predictLang($"text").as("lang_pred"))
        .agg(count(lit(1)).as("n_docs"))
        .smallOrdered($"lang_pred")
    }
  }

  /** Exact-dedup groups: md5-fingerprint hash aggregate; the grouping key is
    * 16 bytes regardless of document size (the raw text never shuffles).
    */
  private val q18 = QueryDef.sql(
    "exact dedup groups by md5 fingerprint")(
    """SELECT md5(text) AS fp, count(*) AS n_copies, min(doc_id) AS survivor
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables(s, dir).documents
      .groupBy(TextAnalysis.fingerprint($"text").as("fp"))
      .agg(count(lit(1)).as("n_copies"), min($"doc_id").as("survivor"))
      .cachedOrdered($"fp")
  }

  /** Exact pairwise n-gram Jaccard near-dups (threshold 0.5) via the shingle
    * inverted-index self-join — the correctness oracle for the LSH path.
    */
  private val q19 = QueryDef.scalableSql(
    "exact 3-gram Jaccard near-dup pairs (j >= 0.5)")(
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 1, 1))) AS i FROM tok),
      |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM idx),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pairs AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT da, db, inter, na.n AS na, nb.n AS nb,
      |  inter::DOUBLE / (na.n + nb.n - inter) AS jaccard
      |FROM pairs JOIN sizes na ON pairs.da = na.doc_id
      |           JOIN sizes nb ON pairs.db = nb.doc_id
      |WHERE inter::DOUBLE / (na.n + nb.n - inter) >= 0.5
      |ORDER BY da, db""".stripMargin)(
    """WITH grp AS MATERIALIZED (
      |SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS rep,
      |  count(*) OVER (PARTITION BY text) AS gsize
      |FROM documents),
      |rsh AS MATERIALIZED (
      |WITH reps AS (SELECT d.doc_id, d.text FROM documents d
      |    JOIN grp g ON d.doc_id = g.doc_id WHERE g.doc_id = g.rep),
      |tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM reps),
      |idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 1, 1))) AS i FROM tok),
      |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM idx)
      |SELECT doc_id, s FROM sh),
      |rsizes AS MATERIALIZED (
      |SELECT doc_id, count(*) AS n FROM rsh GROUP BY 1),
      |rpairs AS MATERIALIZED (
      |WITH p AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
      |  FROM rsh a JOIN rsh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT p.da, p.db, p.inter, na.n AS na, nb.n AS nb
      |FROM p JOIN rsizes na ON p.da = na.doc_id
      |       JOIN rsizes nb ON p.db = nb.doc_id
      |WHERE 10 * p.inter >= 5 * (na.n + nb.n - p.inter)),
      |members AS MATERIALIZED (
      |SELECT least(ga.doc_id, gb.doc_id) AS da,
      |  greatest(ga.doc_id, gb.doc_id) AS db, r.inter,
      |  CASE WHEN ga.doc_id < gb.doc_id THEN r.na ELSE r.nb END AS na,
      |  CASE WHEN ga.doc_id < gb.doc_id THEN r.nb ELSE r.na END AS nb
      |FROM rpairs r JOIN grp ga ON ga.rep = r.da JOIN grp gb ON gb.rep = r.db
      |UNION ALL
      |SELECT a.doc_id, b.doc_id, sz.n, sz.n, sz.n
      |FROM grp a JOIN grp b ON a.rep = b.rep AND a.doc_id < b.doc_id
      |JOIN rsizes sz ON sz.doc_id = a.rep)
      |SELECT da, db, inter, na, nb,
      |  inter::DOUBLE / (na + nb - inter) AS jaccard
      |FROM members ORDER BY da, db""".stripMargin) { (s, dir) =>
    import s.implicits._
    Dedup.jaccardPairs(Tables(s, dir).documentsFanned, "doc_id", "text", n = 3)
      .filter($"jaccard" >= 0.5)
      .select($"da", $"db", $"inter", $"na", $"nb", $"jaccard")
      .orderBy($"da", $"db")
  }

  /** MinHash+LSH near-dup pairs at j >= 0.9 with exact verification; the
    * oracle is the exact pairwise computation (LSH false-negative probability
    * at j=0.9 with 16 bands x 4 rows is ~4e-8).
    */
  private val q20 = QueryDef.scalableSql(
    "MinHash+LSH near-dup pairs (j >= 0.9), exact-verified")(
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 1, 1))) AS i FROM tok),
      |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM idx),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pairs AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT da, db, inter::DOUBLE / (na.n + nb.n - inter) AS jaccard
      |FROM pairs JOIN sizes na ON pairs.da = na.doc_id
      |           JOIN sizes nb ON pairs.db = nb.doc_id
      |WHERE inter::DOUBLE / (na.n + nb.n - inter) >= 0.9
      |ORDER BY da, db""".stripMargin)(
    """WITH grp AS MATERIALIZED (
      |SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS rep,
      |  count(*) OVER (PARTITION BY text) AS gsize
      |FROM documents),
      |rsh AS MATERIALIZED (
      |WITH reps AS (SELECT d.doc_id, d.text FROM documents d
      |    JOIN grp g ON d.doc_id = g.doc_id WHERE g.doc_id = g.rep),
      |tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM reps),
      |idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 1, 1))) AS i FROM tok),
      |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM idx)
      |SELECT doc_id, s FROM sh),
      |rsizes AS MATERIALIZED (
      |SELECT doc_id, count(*) AS n FROM rsh GROUP BY 1),
      |rpairs AS MATERIALIZED (
      |WITH p AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
      |  FROM rsh a JOIN rsh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT p.da, p.db, p.inter, na.n AS na, nb.n AS nb
      |FROM p JOIN rsizes na ON p.da = na.doc_id
      |       JOIN rsizes nb ON p.db = nb.doc_id
      |WHERE 10 * p.inter >= 9 * (na.n + nb.n - p.inter)),
      |members AS MATERIALIZED (
      |SELECT least(ga.doc_id, gb.doc_id) AS da,
      |  greatest(ga.doc_id, gb.doc_id) AS db, r.inter,
      |  CASE WHEN ga.doc_id < gb.doc_id THEN r.na ELSE r.nb END AS na,
      |  CASE WHEN ga.doc_id < gb.doc_id THEN r.nb ELSE r.na END AS nb
      |FROM rpairs r JOIN grp ga ON ga.rep = r.da JOIN grp gb ON gb.rep = r.db
      |UNION ALL
      |SELECT a.doc_id, b.doc_id, sz.n, sz.n, sz.n
      |FROM grp a JOIN grp b ON a.rep = b.rep AND a.doc_id < b.doc_id
      |JOIN rsizes sz ON sz.doc_id = a.rep)
      |SELECT da, db, inter::DOUBLE / (na + nb - inter) AS jaccard
      |FROM members ORDER BY da, db""".stripMargin) { (s, dir) =>
    import s.implicits._
    Dedup.minHashNearDups(Tables(s, dir).documentsFanned, "doc_id", "text",
        n = 3, minJaccard = 0.9)
      .select($"da", $"db", $"jaccard")
      .cachedOrdered($"da", $"db")
  }

  /** SimHash near-dup pairs (hamming <= 3 on 60-bit signatures). Seedless
    * and deterministic (md5 token hashes), so DuckDB replays the whole
    * pipeline: token hash = leading 15 md5 hex digits parsed by strpos
    * arithmetic, 60 occurrence-weighted bit sums via an unnested 0..59
    * range, pigeonhole 4x15-bit chunk banding, bit_count(xor) verify. All
    * integer arithmetic — bit-exact across engines.
    */
  private val q21 = QueryDef.scalableSql(
    "SimHash near-dup pairs (hamming <= 3) via pigeonhole chunk banding")(
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      |th AS (SELECT doc_id,
      |    cast(list_sum(list_transform(range(1, 16), i ->
      |      (strpos('0123456789abcdef', substring(md5(t), i, 1)) - 1)::BIGINT
      |        << (4 * (15 - i)))) AS BIGINT) AS h
      |  FROM tok),
      |bits AS (SELECT doc_id, b,
      |    sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
      |  FROM th CROSS JOIN (SELECT unnest(range(0, 60)) AS b)
      |  GROUP BY 1, 2),
      |sim AS (SELECT doc_id,
      |    cast(sum(CASE WHEN s > 0 THEN 1::BIGINT << b ELSE 0 END) AS BIGINT) AS simhash
      |  FROM bits GROUP BY 1),
      |ck AS (SELECT doc_id, simhash, (simhash >> (15 * ci)) & 32767 AS cv, ci
      |  FROM sim CROSS JOIN (SELECT unnest(range(0, 4)) AS ci)),
      |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      |  FROM ck a JOIN ck b ON a.ci = b.ci AND a.cv = b.cv AND a.doc_id < b.doc_id)
      |SELECT da, db,
      |  cast(bit_count(xor(sa.simhash, sb.simhash)) AS INT) AS hamming
      |FROM cand JOIN sim sa ON cand.da = sa.doc_id
      |          JOIN sim sb ON cand.db = sb.doc_id
      |WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
      |ORDER BY da, db""".stripMargin)(
    """WITH sgrp AS MATERIALIZED (
      |SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS rep,
      |  count(*) OVER (PARTITION BY text) AS gsize
      |FROM documents),
      |rsim AS MATERIALIZED (
      |WITH reps AS (SELECT d.doc_id, d.text FROM documents d
      |    JOIN sgrp g ON d.doc_id = g.doc_id WHERE g.doc_id = g.rep),
      |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM reps),
      |th AS (SELECT doc_id,
      |    cast(list_sum(list_transform(range(1, 16), i ->
      |      (strpos('0123456789abcdef', substring(md5(t), i, 1)) - 1)::BIGINT
      |        << (4 * (15 - i)))) AS BIGINT) AS h
      |  FROM tok),
      |bits AS (SELECT doc_id, b,
      |    sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
      |  FROM th CROSS JOIN (SELECT unnest(range(0, 60)) AS b)
      |  GROUP BY 1, 2)
      |SELECT doc_id,
      |  cast(sum(CASE WHEN s > 0 THEN 1::BIGINT << b ELSE 0 END) AS BIGINT) AS simhash
      |FROM bits GROUP BY 1),
      |ck AS (SELECT doc_id, simhash, (simhash >> (15 * ci)) & 32767 AS cv, ci
      |  FROM rsim CROSS JOIN (SELECT unnest(range(0, 4)) AS ci)),
      |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      |  FROM ck a JOIN ck b ON a.ci = b.ci AND a.cv = b.cv AND a.doc_id < b.doc_id),
      |rp AS (SELECT da, db,
      |    cast(bit_count(xor(sa.simhash, sb.simhash)) AS INT) AS hamming
      |  FROM cand JOIN rsim sa ON cand.da = sa.doc_id
      |            JOIN rsim sb ON cand.db = sb.doc_id
      |  WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3)
      |SELECT da, db, hamming FROM (
      |  SELECT least(ga.doc_id, gb.doc_id) AS da,
      |    greatest(ga.doc_id, gb.doc_id) AS db, r.hamming
      |  FROM rp r JOIN sgrp ga ON ga.rep = r.da JOIN sgrp gb ON gb.rep = r.db
      |  UNION ALL
      |  SELECT a.doc_id, b.doc_id, CAST(0 AS INT)
      |  FROM sgrp a JOIN sgrp b ON a.rep = b.rep AND a.doc_id < b.doc_id)
      |ORDER BY da, db""".stripMargin) { (s, dir) =>
    import s.implicits._
    // persist the signatures: (id, long) per doc — 16 bytes/doc at any
    // scale — consumed by THREE branches (chunk explode + both verify-join
    // sides); without the cache the token-hash kernel (the expensive scan)
    // runs once per branch (profiled: 2 concurrent 0.74 s jobs at sf0.1)
    val sims = Dedup.simHash(Tables(s, dir).documentsFanned, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Dedup.simHashNearDups(sims, maxHamming = 3)
      .orderBy($"da", $"db")
  }

  /** Brute-force cosine top-k: nearest 10 vectors to the vec_id=0 query.
    * The query vector broadcasts; scoring is the codegen'd native
    * expression over one scan of embeddings.
    */
  private val q22 = QueryDef.sql(
    "cosine top-10 similarity search from a query vector")(
    """SELECT e.vec_id,
      |  cast(list_cosine_similarity(
      |    list_transform(e.embedding, x -> x::DOUBLE),
      |    (SELECT list_transform(embedding, x -> x::DOUBLE)
      |     FROM embeddings WHERE vec_id = 0)) AS REAL) AS sim
      |FROM embeddings e
      |ORDER BY sim DESC, e.vec_id
      |LIMIT 10""".stripMargin) { (s, dir) =>
    import s.implicits._
    val emb = Tables(s, dir).embeddingsFanned
    val query = emb.filter($"vec_id" === 0).select($"embedding".as("q"))
    emb.crossJoin(broadcast(query))
      .select($"vec_id",
        VectorFunctions.cosineSim($"embedding", $"q").cast("float").as("sim"))
      .orderBy($"sim".desc, $"vec_id")
      .limit(10)
  }

  /** Batch k-NN join: top-3 neighbors for each of the first 10 vectors —
    * the brute-force baseline of an ANN batch lookup. Queries broadcast;
    * ranking is one window over the scored frame.
    */
  private val q23 = QueryDef.sql(
    "brute-force k-NN join: top-3 neighbors for 10 query vectors")(
    """WITH scored AS (
      |  SELECT q.vec_id AS qid, e.vec_id AS vec_id,
      |    cast(list_cosine_similarity(
      |      list_transform(e.embedding, x -> x::DOUBLE),
      |      list_transform(q.embedding, x -> x::DOUBLE)) AS REAL) AS sim
      |  FROM embeddings e, (SELECT * FROM embeddings WHERE vec_id < 10) q
      |  WHERE e.vec_id <> q.vec_id)
      |SELECT qid, vec_id, sim, rn FROM (
      |  SELECT qid, vec_id, sim,
      |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
      |  FROM scored) WHERE rn <= 3
      |ORDER BY qid, rn""".stripMargin) { (s, dir) =>
    import s.implicits._
    val emb = Tables(s, dir).embeddingsFanned
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val w = Window.partitionBy($"qid").orderBy($"sim".desc, $"vec_id")
    emb.crossJoin(broadcast(queries))
      .filter($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id",
        VectorFunctions.cosineSim($"embedding", $"qe").cast("float").as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .smallOrdered($"qid", $"rn")
  }

  /** Multimodal binary-column plumbing (decode stub, SURVEY brief): treat
    * the utf-8 text bytes as an opaque blob; byte length, 128-bit
    * fingerprint and a header peek — all on BinaryType end to end.
    */
  private val q29 = QueryDef.sql(
    "binary-column metadata: byte length, fingerprint, header peek")(
    """SELECT doc_id, octet_length(encode(text)) AS byte_len,
      |  md5(text) AS fp,
      |  hex(encode(substring(text, 1, 8))) AS head_hex
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val content = $"text".cast("binary")
    Tables(s, dir).documentsFanned.select(
      $"doc_id",
      length(content).cast("long").as("byte_len"),
      md5(content).as("fp"),
      hex(substring(content, 1, 8)).as("head_hex"))
      .cachedOrdered($"doc_id")
  }

  /** Stub image pipeline, scalar outputs: pack a fake image per document,
    * decode its metadata back (the roundtrip is the test — the oracle
    * derives width/height directly from the source columns), histogram the
    * payload bytes (CSV string so it hashes), frame-sample byte total.
    * The payload is exactly the utf-8 text bytes, so DuckDB reproduces the
    * high-nibble histogram from hex(encode(text)).
    */
  private val q30 = {
    // count of hex digit d among high nibbles (odd positions of the hex str)
    val nibbleCounts = (0 until 16)
      .map(d => f"length(hn) - length(replace(hn, '$d%X', ''))")
      .mkString(",\n      |    ")
    QueryDef.sql(
      "multimodal stub pipeline: pack -> decode meta -> byte histogram")(
      s"""WITH h AS (SELECT doc_id, n_chars,
         |    regexp_replace(hex(encode(text)), '(.).', '\\1', 'g') AS hn,
         |    octet_length(encode(text)) AS payload_len
         |  FROM documents)
         |SELECT doc_id,
         |  (n_chars % 64 + 1)::INT AS width,
         |  (doc_id % 64 + 1)::INT AS height,
         |  3::INT AS channels,
         |  concat_ws(',',
         |    $nibbleCounts) AS hist_csv,
         |  least(6 + payload_len, 64) AS frame_bytes
         |FROM h ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.operators.Multimodal
      val packed = Tables(s, dir).documentsFanned.select(
        $"doc_id",
        Multimodal.packImage(
          pmod($"n_chars", lit(64)) + 1, pmod($"doc_id", lit(64)) + 1, lit(3),
          $"text").as("content"))
      val meta = Multimodal.decodeImageMeta($"content")
      packed.select(
        $"doc_id",
        meta.getField("width").as("width"),
        meta.getField("height").as("height"),
        meta.getField("channels").as("channels"),
        concat_ws(",",
          Multimodal.byteHistogram(Multimodal.imagePayload($"content"))
            .cast("array<string>")).as("hist_csv"),
        aggregate(Multimodal.sampleFrames($"content", 16, 4), lit(0),
          (acc, f) => acc + length(f)).cast("long").as("frame_bytes"))
        .cachedOrdered($"doc_id")
    }
  }

  /** LSH-bucketed ANN top-k — the 100 TB path of q23. PORTABLE hyperplanes
    * (md5-derived exact-rational components, Ann.portableHyperplanes) make
    * the bucketing reproducible in SQL: the oracle replays hash → weight →
    * sequential double dot → sign → bucket → same-bucket top-3 bit-exactly.
    * Recall vs the q23 brute-force baseline is additionally asserted in
    * AnnSpec.
    */
  private val q31 = QueryDef.sql(
    "LSH-bucketed approximate nearest neighbors, top-3 for 10 queries")(
    """WITH pj AS (SELECT p.p AS p, j.j AS j
      |  FROM (SELECT unnest(range(0, 6)) AS p) p
      |  CROSS JOIN (SELECT unnest(range(0, 64)) AS j) j),
      |w AS (SELECT p, j,
      |    ((cast(list_sum(list_transform(range(1, 16), i ->
      |        (strpos('0123456789abcdef',
      |           substring(md5('plane_' || p || '_' || j), i, 1)) - 1)::BIGINT
      |          << (4 * (15 - i)))) AS BIGINT) % 2001) - 1000) / 1000.0 AS wv
      |  FROM pj),
      |planes AS (SELECT p, list(wv ORDER BY j) AS wl FROM w GROUP BY p),
      |b AS (SELECT e.vec_id,
      |    cast(sum(CASE WHEN list_sum(list_transform(range(1, 65), j ->
      |        e.embedding[j]::DOUBLE * pl.wl[j])) >= 0
      |      THEN 1::BIGINT << pl.p ELSE 0 END) AS BIGINT) AS bucket
      |  FROM embeddings e CROSS JOIN planes pl
      |  GROUP BY e.vec_id),
      |scored AS (SELECT bq.vec_id AS qid, be.vec_id AS vec_id,
      |    cast(list_cosine_similarity(
      |      list_transform(e2.embedding, x -> x::DOUBLE),
      |      list_transform(q2.embedding, x -> x::DOUBLE)) AS REAL) AS sim
      |  FROM b bq JOIN b be ON bq.bucket = be.bucket AND be.vec_id <> bq.vec_id
      |  JOIN embeddings q2 ON q2.vec_id = bq.vec_id
      |  JOIN embeddings e2 ON e2.vec_id = be.vec_id
      |  WHERE bq.vec_id < 10)
      |SELECT qid, vec_id, sim, rn FROM (
      |  SELECT qid, vec_id, sim,
      |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
      |  FROM scored) WHERE rn <= 3
      |ORDER BY qid, rn""".stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.operators.Ann
    val emb = Tables(s, dir).embeddingsFanned
    Ann.annTopK(emb, emb.filter($"vec_id" < 10), "vec_id", "embedding",
      k = 3, numPlanes = 6, portable = true)
      .smallOrdered($"qid", $"rn")
  }

  /** IVF ANN probe path (operators.Ann.ivfProbe) under the oracle gate:
    * cell assignment = argmin of squared distance over 8 PORTABLE
    * md5-derived centroids (same exact-rational grid as q31's planes — the
    * k-means-fitted variant is AnnSpec's recall anchor), each query probes
    * its 2 nearest cells, exact cosine re-score, top-3. The oracle replays
    * centroid derivation, the `dot * -2 + |c|^2` distance, the (d, cell)
    * tie-broken argmin and the probe expansion bit-exactly in SQL.
    */
  private val q43 = QueryDef.sql(
    "IVF ANN probe: portable centroids, nProbe=2, top-3 for 10 queries")(
    """WITH cj AS (SELECT c.c AS c, j.j AS j
      |  FROM (SELECT unnest(range(0, 8)) AS c) c
      |  CROSS JOIN (SELECT unnest(range(0, 64)) AS j) j),
      |w AS (SELECT c, j,
      |    ((cast(list_sum(list_transform(range(1, 16), i ->
      |        (strpos('0123456789abcdef',
      |           substring(md5('centroid_' || c || '_' || j), i, 1)) - 1)::BIGINT
      |          << (4 * (15 - i)))) AS BIGINT) % 2001) - 1000) / 1000.0 AS wv
      |  FROM cj),
      |cents AS (SELECT c, list(wv ORDER BY j) AS cl FROM w GROUP BY c),
      |cents2 AS (SELECT c, cl,
      |    list_sum(list_transform(cl, x -> x * x)) AS c2 FROM cents),
      |d AS (SELECT e.vec_id, ct.c,
      |    list_sum(list_transform(range(1, 65), j ->
      |      e.embedding[j]::DOUBLE * ct.cl[j])) * -2.0 + ct.c2 AS d
      |  FROM embeddings e CROSS JOIN cents2 ct),
      |assign AS (SELECT vec_id, c AS cell FROM (
      |    SELECT vec_id, c,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
      |    FROM d) WHERE rn = 1),
      |probe AS (SELECT vec_id AS qid, c AS cell FROM (
      |    SELECT vec_id, c,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
      |    FROM d WHERE vec_id < 10) WHERE rn <= 2),
      |scored AS (SELECT p.qid, a.vec_id,
      |    cast(list_cosine_similarity(
      |      list_transform(e2.embedding, x -> x::DOUBLE),
      |      list_transform(q2.embedding, x -> x::DOUBLE)) AS REAL) AS sim
      |  FROM probe p JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.qid
      |  JOIN embeddings q2 ON q2.vec_id = p.qid
      |  JOIN embeddings e2 ON e2.vec_id = a.vec_id)
      |SELECT qid, vec_id, sim, rn FROM (
      |  SELECT qid, vec_id, sim,
      |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
      |  FROM scored) WHERE rn <= 3
      |ORDER BY qid, rn""".stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.operators.Ann
    val emb = Tables(s, dir).embeddingsFanned
    Ann.ivfProbe(emb, emb.filter($"vec_id" < 10), "vec_id", "embedding",
      k = 3, nProbe = 2, centroids = Ann.portableCentroids(dim = 64, nLists = 8))
      .smallOrdered($"qid", $"rn")
  }

  /** Embedding-cosine near-neighbor pairs (sim >= 0.35) via multi-band
    * portable sign-LSH — the vector-space member of the dedup family
    * (operators.Ann.cosineNearDupPairs). Candidates from 8 bands of 6
    * md5-derived hyperplanes each (replayed bit-exactly in SQL: global
    * plane index p -> band p/6, bit p%6), verified with the exact
    * cosine; the double-precision threshold compare happens pre-cast in
    * both engines.
    */
  private val q35 = QueryDef.scalableSql(
    "embedding cosine near-neighbor pairs via multi-band portable sign-LSH")(
    """WITH pj AS (SELECT p.p AS p, j.j AS j
      |  FROM (SELECT unnest(range(0, 48)) AS p) p
      |  CROSS JOIN (SELECT unnest(range(0, 64)) AS j) j),
      |w AS (SELECT p, j,
      |    ((cast(list_sum(list_transform(range(1, 16), i ->
      |        (strpos('0123456789abcdef',
      |           substring(md5('plane_' || p || '_' || j), i, 1)) - 1)::BIGINT
      |          << (4 * (15 - i)))) AS BIGINT) % 2001) - 1000) / 1000.0 AS wv
      |  FROM pj),
      |planes AS (SELECT p, list(wv ORDER BY j) AS wl FROM w GROUP BY p),
      |bk AS (SELECT e.vec_id, pl.p // 6 AS band,
      |    cast(sum(CASE WHEN list_sum(list_transform(range(1, 65), j ->
      |        e.embedding[j]::DOUBLE * pl.wl[j])) >= 0
      |      THEN 1::BIGINT << (pl.p % 6) ELSE 0 END) AS BIGINT) AS bucket
      |  FROM embeddings e CROSS JOIN planes pl
      |  GROUP BY 1, 2),
      |cand AS (SELECT DISTINCT a.vec_id AS da, b.vec_id AS db
      |  FROM bk a JOIN bk b
      |    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
      |SELECT da, db,
      |  cast(list_cosine_similarity(
      |    list_transform(ea.embedding, x -> x::DOUBLE),
      |    list_transform(eb.embedding, x -> x::DOUBLE)) AS REAL) AS sim
      |FROM cand
      |JOIN embeddings ea ON cand.da = ea.vec_id
      |JOIN embeddings eb ON cand.db = eb.vec_id
      |WHERE list_cosine_similarity(
      |    list_transform(ea.embedding, x -> x::DOUBLE),
      |    list_transform(eb.embedding, x -> x::DOUBLE)) >= 0.35
      |ORDER BY da, db""".stripMargin)(
    """WITH eg2 AS MATERIALIZED (
      |WITH grp AS (SELECT vec_id,
      |    CASE WHEN list_sum(list_transform(embedding,
      |           x -> (x::DOUBLE) * (x::DOUBLE))) > 0
      |         THEN 'e:' || CAST(embedding AS VARCHAR)
      |         ELSE 'z:' || CAST(vec_id AS VARCHAR) END AS gkey
      |  FROM embeddings)
      |SELECT vec_id, min(vec_id) OVER (PARTITION BY gkey) AS rep,
      |  count(*) OVER (PARTITION BY gkey) AS gsize
      |FROM grp),
      |e35 AS MATERIALIZED (
      |WITH reps AS (SELECT e.vec_id, e.embedding FROM embeddings e
      |  JOIN eg2 g ON e.vec_id = g.vec_id WHERE g.vec_id = g.rep),
      |pj AS (SELECT p.p AS p, j.j AS j
      |  FROM (SELECT unnest(range(0, 48)) AS p) p
      |  CROSS JOIN (SELECT unnest(range(0, 64)) AS j) j),
      |w AS (SELECT p, j,
      |    ((cast(list_sum(list_transform(range(1, 16), i ->
      |        (strpos('0123456789abcdef',
      |           substring(md5('plane_' || p || '_' || j), i, 1)) - 1)::BIGINT
      |          << (4 * (15 - i)))) AS BIGINT) % 2001) - 1000) / 1000.0 AS wv
      |  FROM pj),
      |planes AS (SELECT p, list(wv ORDER BY j) AS wl FROM w GROUP BY p),
      |bk AS (SELECT e.vec_id, pl.p // 6 AS band,
      |    cast(sum(CASE WHEN list_sum(list_transform(range(1, 65), j ->
      |        e.embedding[j]::DOUBLE * pl.wl[j])) >= 0
      |      THEN 1::BIGINT << (pl.p % 6) ELSE 0 END) AS BIGINT) AS bucket
      |  FROM reps e CROSS JOIN planes pl
      |  GROUP BY 1, 2),
      |cand AS (SELECT DISTINCT a.vec_id AS da, b.vec_id AS db
      |  FROM bk a JOIN bk b
      |    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
      |SELECT da, db,
      |  list_cosine_similarity(
      |    list_transform(ea.embedding, x -> x::DOUBLE),
      |    list_transform(eb.embedding, x -> x::DOUBLE)) AS sim
      |FROM cand
      |JOIN embeddings ea ON cand.da = ea.vec_id
      |JOIN embeddings eb ON cand.db = eb.vec_id
      |WHERE list_cosine_similarity(
      |    list_transform(ea.embedding, x -> x::DOUBLE),
      |    list_transform(eb.embedding, x -> x::DOUBLE)) >= 0.35),
      |eself AS MATERIALIZED (
      |SELECT g.vec_id AS rep,
      |  list_cosine_similarity(
      |    list_transform(e.embedding, x -> x::DOUBLE),
      |    list_transform(e.embedding, x -> x::DOUBLE)) AS sim
      |FROM embeddings e JOIN eg2 g ON e.vec_id = g.vec_id
      |WHERE g.vec_id = g.rep
      |  AND list_cosine_similarity(
      |    list_transform(e.embedding, x -> x::DOUBLE),
      |    list_transform(e.embedding, x -> x::DOUBLE)) >= 0.35)
      |SELECT da, db, cast(sim AS REAL) AS sim FROM (
      |  SELECT least(ga.vec_id, gb.vec_id) AS da,
      |    greatest(ga.vec_id, gb.vec_id) AS db, r.sim
      |  FROM e35 r JOIN eg2 ga ON ga.rep = r.da JOIN eg2 gb ON gb.rep = r.db
      |  UNION ALL
      |  SELECT a.vec_id, b.vec_id, s.sim
      |  FROM eg2 a JOIN eg2 b ON a.rep = b.rep AND a.vec_id < b.vec_id
      |  JOIN eself s ON s.rep = a.rep)
      |ORDER BY da, db""".stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.operators.Ann
    Ann.cosineNearDupPairs(Tables(s, dir).embeddingsFanned, "vec_id", "embedding",
      minSim = 0.35, bands = 8, planesPerBand = 6, portable = true)
      .select($"da", $"db", $"sim".cast("float").as("sim"))
      .cachedOrdered($"da", $"db")
  }

  /** Embedding-space dedup survivors: the vector-space twin of q61's
    * text chain — sign-LSH cosine pairs (q35's operator) close into
    * clusters (q44's operator), non-minimum members anti-join away. Only
    * (long, long) id pairs ever shuffle after the verified pair frame;
    * the embeddings themselves never leave their scan. Oracle replays the
    * portable hyperplane family bit-exactly, closes the pair graph with a
    * recursive CTE, and keeps rows whose id is absent from the non-min
    * member set.
    */
  private val q64 = QueryDef.scalableSql(
    "embedding-cosine dedup survivors: vectors minus non-min near-dup members")(
    """WITH RECURSIVE pj AS (SELECT p.p AS p, j.j AS j
      |  FROM (SELECT unnest(range(0, 48)) AS p) p
      |  CROSS JOIN (SELECT unnest(range(0, 64)) AS j) j),
      |w AS (SELECT p, j,
      |    ((cast(list_sum(list_transform(range(1, 16), i ->
      |        (strpos('0123456789abcdef',
      |           substring(md5('plane_' || p || '_' || j), i, 1)) - 1)::BIGINT
      |          << (4 * (15 - i)))) AS BIGINT) % 2001) - 1000) / 1000.0 AS wv
      |  FROM pj),
      |planes AS (SELECT p, list(wv ORDER BY j) AS wl FROM w GROUP BY p),
      |bk AS (SELECT e.vec_id, pl.p // 6 AS band,
      |    cast(sum(CASE WHEN list_sum(list_transform(range(1, 65), j ->
      |        e.embedding[j]::DOUBLE * pl.wl[j])) >= 0
      |      THEN 1::BIGINT << (pl.p % 6) ELSE 0 END) AS BIGINT) AS bucket
      |  FROM embeddings e CROSS JOIN planes pl
      |  GROUP BY 1, 2),
      |cand AS (SELECT DISTINCT a.vec_id AS da, b.vec_id AS db
      |  FROM bk a JOIN bk b
      |    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
      |nd AS (SELECT da, db FROM cand
      |  JOIN embeddings ea ON cand.da = ea.vec_id
      |  JOIN embeddings eb ON cand.db = eb.vec_id
      |  WHERE list_cosine_similarity(
      |      list_transform(ea.embedding, x -> x::DOUBLE),
      |      list_transform(eb.embedding, x -> x::DOUBLE)) >= 0.35),
      |edges AS (SELECT da AS src, db AS dst FROM nd
      |          UNION SELECT db AS src, da AS dst FROM nd),
      |reach(id, r) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT e.src, w.r FROM edges e JOIN reach w ON e.dst = w.id),
      |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY 1)
      |SELECT e.vec_id, e.label FROM embeddings e
      |LEFT JOIN comp c ON e.vec_id = c.id AND c.id <> c.component
      |WHERE c.id IS NULL ORDER BY e.vec_id""".stripMargin)(
    """WITH eg2 AS MATERIALIZED (
      |WITH grp AS (SELECT vec_id,
      |    CASE WHEN list_sum(list_transform(embedding,
      |           x -> (x::DOUBLE) * (x::DOUBLE))) > 0
      |         THEN 'e:' || CAST(embedding AS VARCHAR)
      |         ELSE 'z:' || CAST(vec_id AS VARCHAR) END AS gkey
      |  FROM embeddings)
      |SELECT vec_id, min(vec_id) OVER (PARTITION BY gkey) AS rep,
      |  count(*) OVER (PARTITION BY gkey) AS gsize
      |FROM grp),
      |eredges AS MATERIALIZED (
      |WITH reps AS (SELECT e.vec_id, e.embedding FROM embeddings e
      |  JOIN eg2 g ON e.vec_id = g.vec_id WHERE g.vec_id = g.rep),
      |pj AS (SELECT p.p AS p, j.j AS j
      |  FROM (SELECT unnest(range(0, 48)) AS p) p
      |  CROSS JOIN (SELECT unnest(range(0, 64)) AS j) j),
      |w AS (SELECT p, j,
      |    ((cast(list_sum(list_transform(range(1, 16), i ->
      |        (strpos('0123456789abcdef',
      |           substring(md5('plane_' || p || '_' || j), i, 1)) - 1)::BIGINT
      |          << (4 * (15 - i)))) AS BIGINT) % 2001) - 1000) / 1000.0 AS wv
      |  FROM pj),
      |planes AS (SELECT p, list(wv ORDER BY j) AS wl FROM w GROUP BY p),
      |bk AS (SELECT e.vec_id, pl.p // 6 AS band,
      |    cast(sum(CASE WHEN list_sum(list_transform(range(1, 65), j ->
      |        e.embedding[j]::DOUBLE * pl.wl[j])) >= 0
      |      THEN 1::BIGINT << (pl.p % 6) ELSE 0 END) AS BIGINT) AS bucket
      |  FROM reps e CROSS JOIN planes pl
      |  GROUP BY 1, 2),
      |cand AS (SELECT DISTINCT a.vec_id AS da, b.vec_id AS db
      |  FROM bk a JOIN bk b
      |    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
      |nd AS (SELECT da, db FROM cand
      |  JOIN reps ea ON cand.da = ea.vec_id
      |  JOIN reps eb ON cand.db = eb.vec_id
      |  WHERE list_cosine_similarity(
      |      list_transform(ea.embedding, x -> x::DOUBLE),
      |      list_transform(eb.embedding, x -> x::DOUBLE)) >= 0.35)
      |SELECT da AS src, db AS dst FROM nd
      |UNION SELECT db AS src, da AS dst FROM nd),
      |ercomp AS MATERIALIZED (
      |WITH RECURSIVE reach(id, r) AS (
      |  SELECT src, src FROM eredges
      |  UNION
      |  SELECT e.src, w.r FROM eredges e JOIN reach w ON e.dst = w.id)
      |SELECT id, min(r) AS component FROM reach GROUP BY 1),
      |ecomp AS MATERIALIZED (
      |SELECT g.vec_id AS id, coalesce(rc.component, g.rep) AS component
      |FROM eg2 g LEFT JOIN ercomp rc ON g.rep = rc.id
      |WHERE rc.id IS NOT NULL OR g.gsize >= 2)
      |SELECT e.vec_id, e.label FROM embeddings e
      |LEFT JOIN ecomp c ON e.vec_id = c.id AND c.id <> c.component
      |WHERE c.id IS NULL ORDER BY e.vec_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.operators.Ann
    // contraction path (round 14, sf100 probe): components over verified
    // rep pairs + one member-attach join, never the O(multiplicity^2)
    // member-pair edge list
    val nonSurvivors = Ann.cosineNearDupNonSurvivors(
        Tables(s, dir).embeddingsFanned, "vec_id", "embedding",
        minSim = 0.35, bands = 8, planesPerBand = 6, portable = true)
      .withColumnRenamed("id", "vec_id")
    Tables(s, dir).embeddings
      .join(nonSurvivors, Seq("vec_id"), "left_anti")
      .select($"vec_id", $"label")
      .smallOrdered($"vec_id")
  }

  /** Benchmark decontamination (operators.Decontamination): docs 0..19 play
    * the eval benchmark, the rest the training corpus; per-doc n-gram
    * containment + contamination flag. Integer-count ratio — bit-exact
    * across engines.
    */
  private val q37 = QueryDef.sql(
    "benchmark decontamination: n-gram containment of corpus docs vs docs 0-19")(
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 1, 1))) AS i FROM tok),
      |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM idx),
      |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < 20),
      |corp AS (SELECT doc_id, s FROM sh WHERE doc_id >= 20),
      |sizes AS (SELECT doc_id, count(*) AS n_shingles FROM corp GROUP BY 1),
      |hits AS (SELECT c.doc_id, count(b.s) AS n_hits
      |         FROM corp c LEFT JOIN bench b ON c.s = b.s GROUP BY 1)
      |SELECT s.doc_id, s.n_shingles, h.n_hits,
      |  h.n_hits::DOUBLE / s.n_shingles AS containment,
      |  h.n_hits >= 1 AS contaminated
      |FROM sizes s JOIN hits h ON s.doc_id = h.doc_id
      |ORDER BY s.doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.operators.Decontamination
    val docs = Tables(s, dir).documentsFanned
    Decontamination.report(
      docs.filter($"doc_id" >= 20), docs.filter($"doc_id" < 20),
      "doc_id", "text", "text", n = 3, minHits = 1L)
      .cachedOrdered($"doc_id")
  }

  /** Bigram-LM quality scoring (round 11): the perplexity-style filter of
    * a pretraining pipeline (CCNet's shape at bigram order) — train an
    * add-one-smoothed bigram model ON the corpus, score every document by
    * mean ln P(w2|w1). Bigram extraction is a pure projection (zip_with
    * over two array slices — no window, no per-doc sort); training is two
    * vocabulary-sized aggregates; scoring re-joins on token keys. Integer
    * n_bigrams pins the extraction chain exactly; the float32-cast mean
    * follows the suite's accumulated-value parity rule.
    */
  private val q172 = QueryDef.sql(
    "bigram-LM quality score per document (add-one smoothing, self-trained)")(
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |bge AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
      |    i -> {'w1': t[i], 'w2': t[i + 1]})) AS b
      |  FROM tok WHERE len(t) >= 2),
      |bg AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bge),
      |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
      |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
      |v AS (SELECT count(DISTINCT x) AS v
      |  FROM (SELECT unnest(t) AS x FROM tok)),
      |sc AS (SELECT bg.doc_id, count(*) AS n_bigrams,
      |    avg(ln((c12.c12 + 1)::DOUBLE / (c1.c1 + (SELECT v FROM v))::DOUBLE))
      |      AS lp
      |  FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) GROUP BY 1)
      |SELECT doc_id, n_bigrams, CAST(lp AS REAL) AS avg_logp
      |FROM sc ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    graft.operators.NgramLm.bigramScore(
        Tables(s, dir).documentsFanned, "doc_id", "text")
      .cachedOrdered($"doc_id")
  }

  /** DSIR importance weights (round 11): log w = mean ln P_target − mean
    * ln P_raw per document, target domain = doc_id % 7 == 0 — resampling
    * by exp(log_w) shifts the corpus toward the target domain (Xie et al.
    * 2023). Composes NgramLm's held-out-model path (target counts join
    * LEFT; unseen bigrams/contexts hit the add-one floor) under the
    * oracle gate, one shared bigram extraction for all four count tables.
    */
  private val q173 = QueryDef.sql(
    "DSIR importance weight per document: target-domain vs corpus bigram LM")(
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |bge AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
      |    i -> {'w1': t[i], 'w2': t[i + 1]})) AS b
      |  FROM tok WHERE len(t) >= 2),
      |bg AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bge),
      |tbg AS (SELECT * FROM bg WHERE doc_id % 7 = 0),
      |c12r AS (SELECT w1, w2, count(*) AS c12r FROM bg GROUP BY 1, 2),
      |c1r AS (SELECT w1, count(*) AS c1r FROM bg GROUP BY 1),
      |c12t AS (SELECT w1, w2, count(*) AS c12t FROM tbg GROUP BY 1, 2),
      |c1t AS (SELECT w1, count(*) AS c1t FROM tbg GROUP BY 1),
      |vr AS (SELECT count(DISTINCT x) AS vr
      |  FROM (SELECT unnest(t) AS x FROM tok)),
      |vt AS (SELECT count(DISTINCT x) AS vt
      |  FROM (SELECT unnest(t) AS x FROM tok WHERE doc_id % 7 = 0)),
      |sc AS (SELECT bg.doc_id, count(*) AS n_bigrams,
      |    avg(ln((coalesce(c12t.c12t, 0) + 1)::DOUBLE
      |          / (coalesce(c1t.c1t, 0) + (SELECT vt FROM vt))::DOUBLE)
      |      - ln((c12r.c12r + 1)::DOUBLE
      |          / (c1r.c1r + (SELECT vr FROM vr))::DOUBLE)) AS lw
      |  FROM bg JOIN c12r USING (w1, w2) JOIN c1r USING (w1)
      |  LEFT JOIN c12t USING (w1, w2) LEFT JOIN c1t USING (w1)
      |  GROUP BY 1)
      |SELECT doc_id, n_bigrams, CAST(lw AS REAL) AS log_w
      |FROM sc ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    graft.operators.NgramLm.dsirWeights(
        Tables(s, dir).documentsFanned, "doc_id", "text",
        id => pmod(id, lit(7L)) === 0)
      .cachedOrdered($"doc_id")
  }

  /** Trigram stupid-backoff LM (round 12, VERDICT r11 #4): bigram LMs
    * saturate on short/templated documents; stupid backoff (Brants et al.
    * 2007) is the no-tuning, no-normalization smoothing a corpus-scale
    * filter runs. Trained on the EVEN doc_ids and scoring everything, so
    * the odd documents genuinely exercise all three backoff levels
    * (unseen trigram → λ·bigram, unseen bigram → λ²·add-one unigram); the
    * integer n_trigrams pins the extraction, the float32 mean follows the
    * parity rule, and every arithmetic step is parenthesized identically
    * in both engines.
    */
  private val q175 = QueryDef.sql(
    "trigram stupid-backoff LM score (λ=0.4, trained on even doc_ids)")(
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |tge AS (SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
      |    i -> {'w1': t[i], 'w2': t[i + 1], 'w3': t[i + 2]})) AS g
      |  FROM tok WHERE len(t) >= 3),
      |tgf AS (SELECT doc_id, g.w1 AS w1, g.w2 AS w2, g.w3 AS w3 FROM tge),
      |ttg AS (SELECT * FROM tgf WHERE doc_id % 2 = 0),
      |bge AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
      |    i -> {'w1': t[i], 'w2': t[i + 1]})) AS b
      |  FROM tok WHERE len(t) >= 2 AND doc_id % 2 = 0),
      |tbg AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bge),
      |c123 AS (SELECT w1, w2, w3, count(*) AS c123 FROM ttg GROUP BY 1, 2, 3),
      |c12 AS (SELECT w1, w2, count(*) AS c12x FROM ttg GROUP BY 1, 2),
      |c23 AS (SELECT w1 AS w2, w2 AS w3, count(*) AS c23x FROM tbg GROUP BY 1, 2),
      |c2 AS (SELECT w1 AS w2, count(*) AS c2x FROM tbg GROUP BY 1),
      |tt AS (SELECT unnest(t) AS x FROM tok WHERE doc_id % 2 = 0),
      |c3 AS (SELECT x AS w3, count(*) AS c3x FROM tt GROUP BY 1),
      |nv AS (SELECT count(*) AS nn, count(DISTINCT x) AS v FROM tt),
      |sc AS (SELECT tgf.doc_id, count(*) AS n_trigrams,
      |    avg(CASE
      |      WHEN c123.c123 IS NOT NULL
      |        THEN ln(c123.c123::DOUBLE / c12.c12x::DOUBLE)
      |      WHEN c23.c23x IS NOT NULL
      |        THEN ln((0.4::DOUBLE * c23.c23x::DOUBLE) / c2.c2x::DOUBLE)
      |      ELSE ln(((0.4::DOUBLE * 0.4::DOUBLE)
      |          * (coalesce(c3.c3x, 0) + 1)::DOUBLE)
      |        / (nv.nn + nv.v)::DOUBLE)
      |    END) AS lp
      |  FROM tgf
      |  LEFT JOIN c123 USING (w1, w2, w3)
      |  LEFT JOIN c12 USING (w1, w2)
      |  LEFT JOIN c23 USING (w2, w3)
      |  LEFT JOIN c2 USING (w2)
      |  LEFT JOIN c3 USING (w3)
      |  CROSS JOIN nv
      |  GROUP BY 1)
      |SELECT doc_id, n_trigrams, CAST(lp AS REAL) AS avg_logp
      |FROM sc ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val docs = Tables(s, dir).documentsFanned
    graft.operators.NgramLm.trigramBackoffScore(docs, "doc_id", "text",
        train = Some(docs.filter(pmod($"doc_id", lit(2L)) === 0)))
      .cachedOrdered($"doc_id")
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "q16_text_features" -> q16,
    "q17_lang_id" -> q17,
    "q18_exact_dedup" -> q18,
    "q19_jaccard_pairs" -> q19,
    "q20_minhash_neardups" -> q20,
    "q21_simhash_neardups" -> q21,
    "q22_cosine_topk" -> q22,
    "q23_knn_join" -> q23,
    "q29_binary_meta" -> q29,
    "q30_multimodal_stub" -> q30,
    "q31_ann_topk" -> q31,
    "q35_cosine_pairs" -> q35,
    "q37_decontamination" -> q37,
    "q43_ivf_ann" -> q43,
    "q64_embedding_dedup_survivors" -> q64,
    "q172_bigram_lm_quality" -> q172,
    "q173_dsir_importance" -> q173,
    "q175_trigram_backoff" -> q175
  )
}
