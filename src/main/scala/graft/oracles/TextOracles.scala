package graft.oracles

import graft.ops._
import Kit._

/** DuckDB oracles for the text-analysis family (txt_*): quality/langid/sampling, BM25 + LM stored-index lifecycles, hybrid retrieval, span/fingerprint ops, PII scan.
  *
  * Split out of SparkEntry (round 10) — pure relocation: the SQL
  * text is byte-identical and the registry map in [[graft.SparkEntry]]
  * remains the single driver-facing surface.
  */
private[graft] object TextOracles {

  /** Shared winnowing CTE chain (positional gram hashes → window min →
    * distinct selected fingerprints) behind txt_winnow and
    * txt_winnow_pairs. DuckDB pos is 1-based (generate_series), Spark's
    * posexplode is 0-based; the full-window bound differs accordingly
    * (pos <= ng - win + 1 here vs pos <= ng - win there).
    */
  def winnowCte(w: Int = 3, win: Int = 4): String =
    s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ls FROM documents),
        |g0 AS (SELECT doc_id, unnest(generate_series(1, len(ls) - ${w - 1})) AS pos, ls
        |       FROM tok WHERE len(ls) >= $w),
        |g AS (SELECT doc_id, pos,
        |        ('0x' || substr(md5(${(0 until w).map(o => s"ls[pos + $o]").mkString(" || ' ' || ")}), 1, 15))::BIGINT AS h
        |      FROM g0),
        |win AS (SELECT doc_id, pos,
        |          min(h) OVER (PARTITION BY doc_id ORDER BY pos
        |                       ROWS BETWEEN CURRENT ROW AND ${win - 1} FOLLOWING) AS wmin,
        |          count(*) OVER (PARTITION BY doc_id) AS ng
        |        FROM g),
        |sel AS (SELECT DISTINCT doc_id, wmin AS fp FROM win
        |        WHERE pos <= ng - ${win - 1})""".stripMargin

  /** txt_pii_scan oracle: the planted twin (same doc_id arithmetic,
    * including the Luhn check digit via the shared fold), the same
    * pattern pack, same count and redaction order — built from the
    * SAME regex constants and Luhn term the engine compiles, so the
    * two sides cannot drift pattern-by-pattern.
    */
  def piiScanOracle: String = {
    import Text.{piiEmailRe, piiIpv4Re, piiPhoneRe, piiIntlPhoneRe,
      piiIbanRe, piiCardRe}
    def dash16(c: String): String =
      s"substring($c, 1, 4) || '-' || substring($c, 5, 4) || '-' || " +
        s"substring($c, 9, 4) || '-' || substring($c, 13, 4)"
    s"""WITH p0 AS (
       |  SELECT doc_id, text,
       |    '4' || lpad(CAST((doc_id * 7919) % 1000000000 AS VARCHAR), 9, '0')
       |        || lpad(CAST((doc_id * 3) % 100000 AS VARCHAR), 5, '0') AS cardp
       |  FROM documents),
       |p1 AS (
       |  SELECT doc_id, text, cardp,
       |    (10 - ${Text.luhnSumOracle("cardp", 15)} % 10) % 10 AS chk
       |  FROM p0),
       |p AS MATERIALIZED (
       |  SELECT doc_id, text ||
       |    ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ||
       |    CASE WHEN doc_id % 3 = 0 THEN ' from 10.' ||
       |      CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
       |      CAST(doc_id % 100 AS VARCHAR) ELSE '' END ||
       |    CASE WHEN doc_id % 4 = 0 THEN ' tel +90-5' ||
       |      lpad(CAST(doc_id % 90 AS VARCHAR), 2, '0') || '-' ||
       |      lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
       |      lpad(CAST((doc_id * 3) % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
       |    CASE WHEN doc_id % 5 = 0 THEN ' call 555-0' ||
       |      lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') ELSE '' END ||
       |    CASE WHEN doc_id % 6 = 0 THEN ' iban DE' ||
       |      lpad(CAST(doc_id % 89 + 11 AS VARCHAR), 2, '0') ||
       |      lpad(CAST((doc_id * 13) % 1000000000 AS VARCHAR), 9, '0') ||
       |      lpad(CAST((doc_id * 17) % 1000000000 AS VARCHAR), 9, '0') ELSE '' END ||
       |    CASE WHEN doc_id % 7 = 0 THEN ' card ' ||
       |      ${dash16("(cardp || CAST(chk AS VARCHAR))")} ELSE '' END ||
       |    CASE WHEN doc_id % 11 = 0 THEN ' card ' ||
       |      ${dash16("(cardp || CAST((chk + 1) % 10 AS VARCHAR))")} ELSE '' END
       |    AS text
       |  FROM p1)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$piiEmailRe')) AS BIGINT) AS n_email,
       |  CAST(len(regexp_extract_all(text, '$piiIpv4Re')) AS BIGINT) AS n_ipv4,
       |  CAST(len(regexp_extract_all(text, '$piiIntlPhoneRe')) AS BIGINT) AS n_intl,
       |  CAST(len(regexp_extract_all(
       |    regexp_replace(text, '$piiIntlPhoneRe', '<INTL>', 'g'),
       |    '$piiPhoneRe')) AS BIGINT) AS n_phone,
       |  CAST(len(regexp_extract_all(text, '$piiIbanRe')) AS BIGINT) AS n_iban,
       |  CAST(len(regexp_extract_all(text, '$piiCardRe')) AS BIGINT) AS n_card,
       |  CAST(len(list_filter(
       |    list_transform(regexp_extract_all(text, '$piiCardRe'),
       |      c -> replace(c, '-', '')),
       |    cc -> ${Text.luhnSumOracle("cc", 16)} % 10 = 0)) AS BIGINT)
       |    AS n_card_valid,
       |  CAST(length(
       |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |    regexp_replace(regexp_replace(text,
       |    '$piiEmailRe', '<EMAIL>', 'g'),
       |    '$piiIbanRe', '<IBAN>', 'g'),
       |    '$piiCardRe', '<CARD>', 'g'),
       |    '$piiIntlPhoneRe', '<INTL>', 'g'),
       |    '$piiIpv4Re', '<IP>', 'g'),
       |    '$piiPhoneRe', '<PHONE>', 'g')) AS BIGINT) AS red_len
       |FROM p ORDER BY doc_id""".stripMargin
  }

  /** txt_phrase_search oracle: the same positional-vote formulation —
    * every token hit on a query term votes for start = pos − off, a
    * start with exactly plen votes is a phrase match. The query-term
    * table is generated from the same `Text.phraseQueries` literals.
    */
  def phraseOracle: String = {
    val vals = Text.phraseQueries.flatMap { case (qid, p) =>
      val ts = p.split(" ")
      ts.zipWithIndex.map { case (t, off) =>
        s"($qid, $off, '$t', ${ts.length})"
      }
    }.mkString(",\n    ")
    s"""WITH toks AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS pos, tok
       |  FROM (SELECT doc_id, unnest(tk) AS tok, generate_subscripts(tk, 1) AS i
       |        FROM (SELECT doc_id, string_split(lower(text), ' ') AS tk
       |              FROM documents) d) x),
       |q(query_id, off, term, plen) AS (VALUES
       |    $vals),
       |cand AS (SELECT q.query_id, t.doc_id, t.pos - q.off AS st, q.plen
       |         FROM toks t JOIN q ON t.tok = q.term),
       |m AS (SELECT query_id, doc_id, st FROM cand
       |      GROUP BY query_id, doc_id, st, plen HAVING count(*) = plen)
       |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
       |  count(*) AS n_matches, min(st) AS first_pos
       |FROM m GROUP BY query_id, doc_id
       |ORDER BY query_id, doc_id""".stripMargin
  }

  /** txt_collocations oracle: unigram/bigram counts off one positional
    * token frame, lift as the identical left-associated IEEE expression
    * over exact integer counts.
    */
  def collocationsOracle(minCount: Int, k: Int): String =
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, CAST(i AS BIGINT) AS pos, tok
       |  FROM (SELECT doc_id, unnest(tk) AS tok, generate_subscripts(tk, 1) AS i
       |        FROM (SELECT doc_id, string_split(lower(text), ' ') AS tk
       |              FROM documents) d) x),
       |uni AS (SELECT tok, count(*) AS c1 FROM toks GROUP BY tok),
       |ntok AS (SELECT count(*) AS n_tok FROM toks),
       |big AS (SELECT w1, w2, count(*) AS c12 FROM (
       |    SELECT lag(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w1,
       |      tok AS w2
       |    FROM toks) t WHERE w1 IS NOT NULL GROUP BY w1, w2),
       |nbig AS (SELECT CAST(sum(c12) AS BIGINT) AS n_big FROM big)
       |SELECT w1, w2, c12, u1.c1 AS cx, u2.c1 AS cy,
       |  CAST(c12 AS DOUBLE) * n_tok / cx * n_tok / cy / n_big AS lift
       |FROM big JOIN uni u1 ON u1.tok = big.w1 JOIN uni u2 ON u2.tok = big.w2,
       |  ntok, nbig
       |WHERE c12 >= $minCount
       |ORDER BY lift DESC, w1, w2 LIMIT $k""".stripMargin

  /** txt_bpe_train oracle (merges + encode fold): the merge rounds
    * unrolled as a CTE chain — per round the overlap-counted pair
    * statistics off the previous vocabulary, the
    * (count DESC, left, right) argmax, and the same delimited-string
    * greedy merge (`replace` scans left-to-right and resumes after
    * each hit on both engines); the encode arm applies the FINAL
    * vocabulary by word lookup (symbol count = '|' boundary count)
    * and reports per-doc encoded token counts. All integer
    * arithmetic. The CTE chain keeps `w` so the last round IS the
    * lookup table.
    */
  private def bpeCtes(nMerges: Int): String = {
    val rounds = (1 to nMerges).map { r =>
      s"""p$r AS (SELECT pr.l AS left_sym, pr.r AS right_sym,
         |    CAST(sum(wc) AS BIGINT) AS pair_count
         |  FROM (SELECT wc, unnest(list_transform(range(1, len(syms)),
         |          x -> {'l': syms[x], 'r': syms[x + 1]})) AS pr
         |        FROM (SELECT wc,
         |            list_filter(string_split(s, '|'), x -> x <> '') AS syms
         |          FROM w${r - 1}) t
         |        WHERE len(syms) >= 2)
         |  GROUP BY 1, 2),
         |m$r AS MATERIALIZED (SELECT left_sym, right_sym, pair_count
         |  FROM p$r ORDER BY pair_count DESC, left_sym, right_sym LIMIT 1),
         |w$r AS MATERIALIZED (SELECT w, wc,
         |    replace(s, '|' || left_sym || '|' || right_sym,
         |      '|' || left_sym || right_sym) AS s
         |  FROM w${r - 1}, m$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH w0 AS MATERIALIZED (SELECT w, count(*) AS wc,
       |    '|' || array_to_string(list_transform(
       |      range(1, length(w) + 1), x -> substr(w, x, 1)), '|') AS s
       |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS w
       |        FROM documents) t
       |  WHERE length(w) > 0 GROUP BY w),
       |$rounds""".stripMargin
  }

  def bpeTrainOracle(nMerges: Int): String = {
    val sel = (1 to nMerges).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS merge_round, left_sym, right_sym,
         |  left_sym || right_sym AS merged, pair_count FROM m$r""".stripMargin
    }.mkString("\n UNION ALL\n")
    val mergesSql =
      s"""${bpeCtes(nMerges)}
         |$sel
         |ORDER BY merge_round""".stripMargin
    val encodeSql =
      s"""${bpeCtes(nMerges)},
         |ev AS (SELECT w,
         |    CAST(length(s) - length(replace(s, '|', '')) AS BIGINT) AS ns
         |  FROM w$nMerges),
         |enc AS (SELECT doc_id, w
         |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
         |        FROM documents) t
         |  WHERE length(w) > 0)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(ns) AS BIGINT) AS n_syms
         |FROM enc JOIN ev USING (w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    Kit.foldedOracle(
      Seq("merge_round" -> "long", "left_sym" -> "string",
        "right_sym" -> "string", "merged" -> "string",
        "pair_count" -> "long", "doc_id" -> "long",
        "n_words" -> "long", "n_syms" -> "long"),
      ("merges", Seq("merge_round", "left_sym", "right_sym", "merged",
        "pair_count"), mergesSql),
      ("encode", Seq("doc_id", "n_words", "n_syms"), encodeSql))
  }

  /** txt_dsir_weights oracle: the same hashed-ngram likelihood-ratio
    * chain — md5-hash buckets, Laplace-smoothed ratio as the identical
    * fixed-shape IEEE expression over exact integer counts, per-doc
    * weight through the same bucket-ordered float fold
    * (`list_sum(list(r ORDER BY bucket))` ≡ the engine's
    * sort_array+aggregate; tied buckets carry identical r, so order
    * among ties cannot change the sum).
    */
  def dsirOracle(k: Int): String = {
    val b = Text.dsirBuckets
    val tgt = Text.dsirTargetSources.map(s => s"'$s'").mkString(", ")
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, CAST(i AS BIGINT) AS pos, tok
       |  FROM (SELECT doc_id, unnest(tk) AS tok, generate_subscripts(tk, 1) AS i
       |        FROM (SELECT doc_id, string_split(lower(text), ' ') AS tk
       |              FROM documents) d) x),
       |uni AS (SELECT doc_id, tok AS feat FROM toks),
       |big AS (SELECT doc_id, prev || ' ' || tok AS feat
       |  FROM (SELECT doc_id, tok,
       |          lag(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
       |        FROM toks) t WHERE prev IS NOT NULL),
       |feats AS (SELECT doc_id,
       |    ('0x' || substr(md5(feat), 1, 8))::BIGINT % $b AS bucket
       |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM big)),
       |mem AS (SELECT doc_id, source IN ($tgt) AS is_t FROM documents),
       |fm AS MATERIALIZED (SELECT f.doc_id, bucket, is_t
       |  FROM feats f JOIN mem USING (doc_id)),
       |counts AS (SELECT bucket,
       |    sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
       |    sum(CASE WHEN NOT is_t THEN 1 ELSE 0 END) AS cs
       |  FROM fm GROUP BY bucket),
       |tot AS (SELECT sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS nt,
       |    sum(CASE WHEN NOT is_t THEN 1 ELSE 0 END) AS ns FROM fm),
       |ratios AS MATERIALIZED (SELECT bucket,
       |    (CAST(ct + 1 AS DOUBLE) / CAST(nt + $b AS DOUBLE))
       |      * (CAST(ns + $b AS DOUBLE) / CAST(cs + 1 AS DOUBLE)) AS r
       |  FROM counts, tot),
       |sc AS (SELECT doc_id, list_sum(list(r ORDER BY bucket)) AS weight
       |  FROM fm JOIN ratios USING (bucket) WHERE NOT is_t
       |  GROUP BY doc_id),
       |rr AS (SELECT doc_id, weight,
       |    CAST(row_number() OVER (ORDER BY weight DESC, doc_id) AS BIGINT)
       |      AS rank FROM sc)
       |SELECT doc_id, weight, rank FROM rr WHERE rank <= $k
       |ORDER BY rank""".stripMargin
  }

  /** txt_langid oracle, generated from the same profile constants the
    * Spark operator uses (argmax with declaration-order tie-break).
    */
  def langIdOracle: String = {
    val scores = Text.langProfiles.map { case (name, words) =>
      val list = words.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(string_split(lower(text), ' '), t -> t IN ($list))) AS score_$name"
    }.mkString(",\n ")
    // fold order: profile i wins iff strictly greater than all before it
    val names = Text.langProfiles.map(_._1)
    val cases = names.zipWithIndex.reverse.init.map { case (n, i) =>
      val prev = names.take(i).map("score_" + _).mkString(", ")
      val cmp = if (i == 1) s"score_$n > $prev" else s"score_$n > greatest($prev)"
      s"WHEN $cmp THEN '$n'"
    }.mkString(" ")
    s"""SELECT doc_id, lang, ${names.map("score_" + _).mkString(", ")},
       | CASE $cases ELSE '${names.head}' END AS predicted_lang
       |FROM (SELECT doc_id, lang, text,
       |  $scores
       |  FROM documents) t
       |ORDER BY doc_id""".stripMargin
  }

  /** Confusion-matrix oracle: the langid oracle re-aggregated by
    * (actual, predicted) — same generated scoring core, so the two
    * stay in lockstep with `Text.langProfiles`.
    */
  def langIdConfusionOracle: String =
    s"""SELECT lang, predicted_lang, count(*) AS n FROM (
       |${langIdOracle.replaceAll("ORDER BY doc_id\\s*$", "")}) q
       |GROUP BY lang, predicted_lang
       |ORDER BY lang, predicted_lang""".stripMargin

  /** txt_mixture_sample oracle: the keep-rate CASE is generated from
    * the same `mixtureRates` map the Spark operator uses.
    */
  def mixtureSampleOracle: String = {
    val cases = mixtureRates.toSeq.sortBy(_._1)
      .map { case (l, bp) => s"WHEN '$l' THEN $bp" }.mkString(" ")
    val rate = s"CASE lang $cases ELSE 1000 END"
    s"""WITH k AS (
       |  SELECT lang, $rate AS target_bp,
       |    CASE WHEN (('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000)
       |           < ($rate) THEN 1 ELSE 0 END AS keep
       |  FROM documents),
       |p AS (SELECT lang, max(target_bp) AS target_bp, count(*) AS n_total,
       |        CAST(sum(keep) AS BIGINT) AS n_kept
       |      FROM k GROUP BY lang),
       |t AS (SELECT CAST(sum(keep) AS BIGINT) AS n_kept_all FROM k)
       |SELECT lang, target_bp, n_total, n_kept,
       |  CAST(n_kept AS DOUBLE) / CAST(n_total AS DOUBLE) AS keep_rate,
       |  CAST(n_kept AS DOUBLE) / CAST(n_kept_all AS DOUBLE) AS mix_share
       |FROM p, t ORDER BY lang""".stripMargin
  }

  /** txt_bm25_topk oracle: the same BM25 chain — tf/df/dl/avgdl off one
    * tokenize, the rational (log-free) RSJ idf, the per-(query, doc)
    * term sum as an ordered `list_sum(list(s ORDER BY term))` fold —
    * generated from the SAME `Text.bm25K1/bm25B/bm25Queries` constants
    * as the engine, so the float scores hash-match.
    */
  /** The BM25 CTE chain up to the ranked table `lexr` — shared between
    * the plain retrieval oracle and the hybrid-fusion oracle. tf is
    * MATERIALIZED (referenced by dl/df/m — DuckDB would otherwise
    * re-tokenize the corpus per reference).
    */
  def bm25Ctes(src: String = "documents"): String = {
    val k1 = Text.bm25K1
    val k1p1 = Text.bm25K1 + 1.0
    val b = Text.bm25B
    val oneMinusB = 1.0 - Text.bm25B
    val qvals = Text.bm25Queries
      .flatMap { case (id, q) => q.split(" ").distinct.map(t => (id, t)) }
      .map { case (id, t) => s"(CAST($id AS BIGINT), '$t')" }
      .mkString(", ")
    s"""q(query_id, term) AS (VALUES $qvals),
       |tf AS MATERIALIZED (SELECT doc_id, t.term, count(*) AS tf
       |  FROM $src, unnest(string_split(lower(text), ' ')) AS t(term)
       |  GROUP BY doc_id, t.term),
       |dl AS MATERIALIZED (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |st AS (SELECT count(*) AS n_docs, sum(dl) AS tot_dl FROM dl),
       |m AS (SELECT q.query_id, tf.doc_id, tf.term,
       |    ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
       |       / (CAST(df AS DOUBLE) + 0.5))
       |    * ((CAST(tf AS DOUBLE) * $k1p1)
       |       / (CAST(tf AS DOUBLE) + $k1 * ($oneMinusB + $b
       |            * (CAST(dl AS DOUBLE)
       |               / (CAST(tot_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))) AS s
       |  FROM tf JOIN q USING (term) JOIN dl USING (doc_id)
       |       JOIN df USING (term), st),
       |sc AS (SELECT query_id, doc_id,
       |    list_sum(list(s ORDER BY term)) AS score
       |  FROM m GROUP BY query_id, doc_id),
       |lexr AS (SELECT query_id, doc_id, score,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id) AS BIGINT) AS rank
       |  FROM sc)""".stripMargin
  }

  /** Shared CTE chain re-deriving the hashed-linear classifier: `f`
    * carries (doc_id, n_features, clf_score) — the exact integer sum
    * the native expression computes per row. MATERIALIZED because the
    * report/sampling oracles reference it through further grouping.
    */
  def clfCtes: String =
    """d AS (SELECT doc_id, string_split(lower(text), ' ') AS ls
      |           FROM documents),
      |f AS MATERIALIZED (SELECT doc_id,
      |        len(ls) + greatest(len(ls) - 1, 0) AS n_features,
      |        CAST(coalesce(list_aggregate(list_transform(ls,
      |            t -> ('0x' || substr(md5('u:' || t), 1, 8))::BIGINT % 17 - 8),
      |          'sum'), 0) AS BIGINT)
      |        + CASE WHEN len(ls) > 1 THEN
      |            CAST(coalesce(list_aggregate(
      |              list_transform(generate_series(1, len(ls) - 1),
      |                i -> ('0x' || substr(md5('b:' || ls[i] || '_' || ls[i + 1]), 1, 8))::BIGINT % 17 - 8),
      |              'sum'), 0) AS BIGINT)
      |          ELSE 0 END AS clf_score
      |      FROM d)""".stripMargin

  def bm25Oracle(k: Int): String =
    s"""WITH ${bm25Ctes()}
       |SELECT query_id, doc_id, score, rank FROM lexr WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** txt_bm25_delete oracle: the same BM25 chain computed over ONLY
    * the surviving corpus — delete+compact must equal from-scratch.
    */
  def bm25DeleteOracle(k: Int): String =
    s"""WITH surv AS MATERIALIZED (SELECT * FROM documents
       |  WHERE doc_id % 7 <> 3),
       |${bm25Ctes("surv")}
       |SELECT query_id, doc_id, score, rank FROM lexr WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** txt_hybrid_rrf oracle: the [[bm25Ctes]] lexical ranking fused by
    * reciprocal rank with a semantic ranking over the same md5-stub
    * embeddings as `mm_embed` — both arms capped at nCand, fusion on a
    * FULL join, scores exact IEEE divisions of integer ranks.
    */
  def hybridRrfOracle(k: Int, nCand: Int, kRrf: Int): String = {
    def vecSql(src: String): String = (0 until 8)
      .map(i => s"('0x' || substr(md5($src), ${i * 2 + 1}, 2))::BIGINT / 255.0")
      .mkString("[", ",\n       |   ", "]")
    val qtVals = Text.bm25Queries
      .map { case (id, t) => s"(CAST($id AS BIGINT), '$t')" }.mkString(", ")
    s"""WITH ${bm25Ctes()},
       |lex AS (SELECT query_id, doc_id, rank AS r_lex FROM lexr
       |        WHERE rank <= $nCand),
       |qt(query_id, qtext) AS (VALUES $qtVals),
       |qv AS (SELECT query_id, ${vecSql("qtext")} AS qv FROM qt),
       |dv AS MATERIALIZED (SELECT doc_id, ${vecSql("text")} AS v
       |  FROM documents),
       |s AS (SELECT query_id, doc_id, ${cosSql("qv", "v")} AS cs
       |      FROM qv, dv),
       |semr AS (SELECT query_id, doc_id,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY cs DESC, doc_id) AS BIGINT) AS r_sem
       |  FROM s),
       |sem AS (SELECT query_id, doc_id, r_sem FROM semr
       |        WHERE r_sem <= $nCand),
       |f AS (SELECT query_id, doc_id,
       |    coalesce(CAST(1.0 AS DOUBLE) / ($kRrf + r_lex), 0.0)
       |      + coalesce(CAST(1.0 AS DOUBLE) / ($kRrf + r_sem), 0.0) AS rrf
       |  FROM lex FULL JOIN sem USING (query_id, doc_id)),
       |r AS (SELECT query_id, doc_id, rrf,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank
       |  FROM f)
       |SELECT query_id, doc_id, rrf, rank FROM r WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** txt_hybrid_stored oracle: the [[bm25Ctes]] lexical ranking fused
    * with the IVF-PROBED semantic ranking (not brute force — the
    * engine's stored arm reads only its nprobe cell directories, so
    * the oracle re-derives the same 8-dim stub-vector k-means, the
    * argmax-cosine assignment, the per-query nprobe probed cells, and
    * ranks candidates WITHIN the probed cells only).
    */
  def hybridStoredOracle(k: Int, nCand: Int, kRrf: Int,
                                 nlist: Int = 16, nprobe: Int = 4): String = {
    val iters = Similarity.ivfIters
    def vecSql(src: String): String = (0 until 8)
      .map(i => s"('0x' || substr(md5($src), ${i * 2 + 1}, 2))::BIGINT / 255.0")
      .mkString("[", ",\n       |   ", "]")
    val qtVals = Text.bm25Queries
      .map { case (id, t) => s"(CAST($id AS BIGINT), '$t')" }.mkString(", ")
    s"""WITH ${bm25Ctes()},
       |lex AS (SELECT query_id, doc_id, rank AS r_lex FROM lexr
       |        WHERE rank <= $nCand),
       |qt(query_id, qtext) AS (VALUES $qtVals),
       |qv AS (SELECT query_id, ${vecSql("qtext")} AS qv FROM qt),
       |dve AS MATERIALIZED (SELECT doc_id AS vec_id,
       |    ${vecSql("text")} AS embedding
       |  FROM documents),
       |${kmeansSql(nlist, iters, "dve", 8)},
       |cent AS MATERIALIZED (SELECT * FROM cent$iters),
       |assigned AS MATERIALIZED (
       |  SELECT vec_id, embedding, cell FROM (
       |    SELECT e.vec_id, e.embedding, c.centroid_id AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosSql("e.embedding", "c.ce")} DESC, c.centroid_id) AS rn
       |    FROM dve e, cent c) t WHERE rn = 1),
       |probes AS (SELECT query_id, qv, cell FROM (
       |    SELECT q.query_id, q.qv, c.centroid_id AS cell,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY ${cosSql("q.qv", "c.ce")} DESC, c.centroid_id) AS rn
       |    FROM qv q, cent c) t WHERE rn <= $nprobe),
       |s AS (SELECT p.query_id, a.vec_id AS doc_id,
       |        ${cosSql("p.qv", "a.embedding")} AS cs
       |      FROM probes p JOIN assigned a USING (cell)),
       |semr AS (SELECT query_id, doc_id,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY cs DESC, doc_id) AS BIGINT) AS r_sem
       |  FROM s),
       |sem AS (SELECT query_id, doc_id, r_sem FROM semr
       |        WHERE r_sem <= $nCand),
       |f AS (SELECT query_id, doc_id,
       |    coalesce(CAST(1.0 AS DOUBLE) / ($kRrf + r_lex), 0.0)
       |      + coalesce(CAST(1.0 AS DOUBLE) / ($kRrf + r_sem), 0.0) AS rrf
       |  FROM lex FULL JOIN sem USING (query_id, doc_id)),
       |r AS (SELECT query_id, doc_id, rrf,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank
       |  FROM f)
       |SELECT query_id, doc_id, rrf, rank FROM r WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** txt_gopher_gate oracle: per-rule violation counts, generated with
    * the same stopword list and thresholds as the engine's gate.
    */
  def gopherGateOracle: String = {
    val stops = Text.stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH d AS (SELECT doc_id, text, string_split(lower(text), ' ') AS tk
       |           FROM documents),
       |g AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(tk) - 1),
       |        i -> tk[i] || ' ' || tk[i+1])) AS bg
       |      FROM d WHERE len(tk) > 1),
       |t AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_n
       |      FROM (SELECT doc_id, bg, count(*) AS c FROM g GROUP BY doc_id, bg)
       |      GROUP BY doc_id),
       |f AS (SELECT
       |    CASE WHEN length(text) >= 100 THEN 1 ELSE 0 END AS len_ok,
       |    CASE WHEN len(tk) >= 10 AND len(tk) <= 10000 THEN 1 ELSE 0 END AS tok_ok,
       |    CASE WHEN CAST(len(list_filter(tk, x -> x IN ($stops))) AS DOUBLE)
       |             / CAST(len(tk) AS DOUBLE) >= 0.05
       |          AND CAST(len(list_filter(tk, x -> x IN ($stops))) AS DOUBLE)
       |             / CAST(len(tk) AS DOUBLE) <= 0.6
       |         THEN 1 ELSE 0 END AS stop_ok,
       |    CASE WHEN (CASE WHEN greatest(len(tk) - 1, 0) > 0
       |                    THEN CAST(COALESCE(t.top_n, 0) AS DOUBLE)
       |                         / CAST(greatest(len(tk) - 1, 0) AS DOUBLE)
       |                    ELSE 0.0 END) <= 0.18 THEN 1 ELSE 0 END AS rep_ok,
       |    CASE WHEN CAST(len(tk) - len(list_distinct(tk)) AS DOUBLE)
       |             / CAST(len(tk) AS DOUBLE) <= 0.60 THEN 1 ELSE 0 END AS dup_ok
       |  FROM d LEFT JOIN t USING (doc_id)),
       |a AS (SELECT count(*) AS total,
       |    CAST(sum(1 - len_ok) AS BIGINT) AS v_len,
       |    CAST(sum(1 - tok_ok) AS BIGINT) AS v_tok,
       |    CAST(sum(1 - stop_ok) AS BIGINT) AS v_stop,
       |    CAST(sum(1 - rep_ok) AS BIGINT) AS v_rep,
       |    CAST(sum(1 - dup_ok) AS BIGINT) AS v_dup,
       |    CAST(sum(len_ok * tok_ok * stop_ok * rep_ok * dup_ok) AS BIGINT) AS pass
       |  FROM f)
       |SELECT rule, n_docs FROM (
       |  SELECT '0_total' AS rule, total AS n_docs FROM a
       |  UNION ALL SELECT '1_min_chars', v_len FROM a
       |  UNION ALL SELECT '2_token_range', v_tok FROM a
       |  UNION ALL SELECT '3_stopword_band', v_stop FROM a
       |  UNION ALL SELECT '4_repetition', v_rep FROM a
       |  UNION ALL SELECT '5_dup_tokens', v_dup FROM a
       |  UNION ALL SELECT '6_pass_all', pass FROM a) u
       |ORDER BY rule""".stripMargin
  }

  /** txt_dup_ngrams oracle: same 60-bit hashed w-grams with position
    * multiplicity, duplicated = corpus-wide occurrence count ≥ 2.
    */
  def ngramCoverageOracle(w: Int): String = {
    val gram = (0 until w)
      .map(o => if (o == 0) "tk[i]" else s"tk[i+$o]")
      .mkString(" || ' ' || ")
    s"""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
       |           FROM documents),
       |pg0 AS (SELECT doc_id, ('0x' || substr(md5(gm), 1, 15))::BIGINT AS h
       |      FROM (SELECT doc_id,
       |              unnest(list_transform(generate_series(1, len(tk) - ${w - 1}),
       |                i -> $gram)) AS gm
       |            FROM d WHERE len(tk) >= $w) x),
       |pg AS (SELECT h, doc_id, count(*) AS c FROM pg0 GROUP BY h, doc_id),
       |u AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_uniq
       |      FROM (SELECT min(doc_id) AS doc_id FROM pg
       |            GROUP BY h HAVING sum(c) = 1) s
       |      GROUP BY doc_id),
       |p AS (SELECT doc_id,
       |        CAST(greatest(len(string_split(lower(text), ' ')) - ${w - 1}, 0) AS BIGINT)
       |          AS n_positions
       |      FROM documents)
       |SELECT p.doc_id, p.n_positions,
       |  CAST(p.n_positions - coalesce(u.n_uniq, 0) AS BIGINT) AS n_dup,
       |  CASE WHEN p.n_positions > 0
       |       THEN CAST(p.n_positions - coalesce(u.n_uniq, 0) AS DOUBLE) / CAST(p.n_positions AS DOUBLE)
       |       ELSE 0.0 END AS dup_frac
       |FROM p LEFT JOIN u USING (doc_id)
       |ORDER BY p.doc_id""".stripMargin
  }

  /** txt_dup_spans oracle: same positional 60-bit hashed w-grams,
    * duplicated = corpus count ≥ 2, runs merged by the gaps-and-islands
    * pos − row_number grouping.
    */
  def dupSpansOracle(w: Int): String = {
    val gram = (0 until w)
      .map(o => if (o == 0) "tk[i]" else s"tk[i+$o]")
      .mkString(" || ' ' || ")
    s"""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
       |           FROM documents),
       |pg0 AS MATERIALIZED (SELECT doc_id, CAST(i AS BIGINT) AS pos,
       |          ('0x' || substr(md5(gm), 1, 15))::BIGINT AS h
       |  FROM (SELECT doc_id, unnest(gms) AS gm,
       |          generate_subscripts(gms, 1) AS i
       |        FROM (SELECT doc_id,
       |                list_transform(generate_series(1, len(tk) - ${w - 1}),
       |                  i -> $gram) AS gms
       |              FROM d WHERE len(tk) >= $w) y) x),
       |dup AS (SELECT h FROM pg0 GROUP BY h HAVING count(*) >= 2),
       |dp AS (SELECT doc_id, pos FROM pg0 JOIN dup USING (h)),
       |r AS (SELECT doc_id, pos,
       |        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
       |          AS grp
       |      FROM dp)
       |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
       |  CAST(max(pos) AS BIGINT) AS span_end,
       |  CAST(max(pos) - min(pos) + $w AS BIGINT) AS span_tokens
       |FROM r GROUP BY doc_id, grp
       |ORDER BY doc_id, span_start""".stripMargin
  }

  /** txt_span_cut oracle: re-derives [[dupSpansOracle]]'s merged
    * spans, expands each to its covered token positions
    * [span_start, span_end + w − 1], and rebuilds every document from
    * its kept tokens (string_agg skips the cut rows, ordered by
    * position — the exact mirror of the engine's null-skipping
    * collect_list + array_sort reassembly).
    */
  def spanCutOracle(w: Int): String = {
    val gram = (0 until w)
      .map(o => if (o == 0) "tk[i]" else s"tk[i+$o]")
      .mkString(" || ' ' || ")
    s"""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
       |           FROM documents),
       |pg0 AS MATERIALIZED (SELECT doc_id, CAST(i AS BIGINT) AS pos,
       |          ('0x' || substr(md5(gm), 1, 15))::BIGINT AS h
       |  FROM (SELECT doc_id, unnest(gms) AS gm,
       |          generate_subscripts(gms, 1) AS i
       |        FROM (SELECT doc_id,
       |                list_transform(generate_series(1, len(tk) - ${w - 1}),
       |                  i -> $gram) AS gms
       |              FROM d WHERE len(tk) >= $w) y) x),
       |dup AS (SELECT h FROM pg0 GROUP BY h HAVING count(*) >= 2),
       |dp AS (SELECT doc_id, pos FROM pg0 JOIN dup USING (h)),
       |r AS (SELECT doc_id, pos,
       |        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
       |          AS grp
       |      FROM dp),
       |sp AS (SELECT doc_id, min(pos) AS s, max(pos) AS e
       |       FROM r GROUP BY doc_id, grp),
       |cut AS MATERIALIZED (SELECT DISTINCT doc_id, CAST(i AS BIGINT) AS cutpos
       |       FROM sp, unnest(generate_series(s, e + ${w - 1})) AS u(i)),
       |tok AS MATERIALIZED (SELECT doc_id, CAST(i AS BIGINT) AS pos, tk[i] AS tok
       |       FROM d, unnest(generate_series(1, len(tk))) AS u(i)),
       |m AS (SELECT t.doc_id,
       |        CAST(count(*) AS BIGINT) AS n_tokens,
       |        CAST(count(c.cutpos) AS BIGINT) AS n_cut,
       |        md5(coalesce(string_agg(
       |          CASE WHEN c.cutpos IS NULL THEN t.tok END,
       |          ' ' ORDER BY t.pos), '')) AS clean_hash
       |      FROM tok t LEFT JOIN cut c
       |        ON t.doc_id = c.doc_id AND t.pos = c.cutpos
       |      GROUP BY t.doc_id)
       |SELECT doc_id, n_tokens, n_cut, n_tokens - n_cut AS n_kept, clean_hash
       |FROM m ORDER BY doc_id""".stripMargin
  }

  /** txt_quota_sample oracle: exact largest-remainder apportionment
    * over strata, per-stratum fill by smallest md5 key.
    */
  def quotaSampleOracle(k: Int): String =
    s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
       |t AS (SELECT count(*) AS n_total FROM documents),
       |q0 AS (SELECT lang, n, ($k * n) // n_total AS base,
       |              ($k * n) % n_total AS rem
       |       FROM c CROSS JOIN t),
       |s AS (SELECT sum(base) AS base_sum FROM q0),
       |q AS (SELECT lang,
       |        CAST(base + (CASE WHEN row_number() OVER (ORDER BY rem DESC, lang)
       |                            <= $k - base_sum THEN 1 ELSE 0 END) AS BIGINT) AS quota
       |      FROM q0 CROSS JOIN s),
       |h AS (SELECT doc_id, lang,
       |        ('0x' || substr(md5('quota:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
       |      FROM documents),
       |r AS (SELECT lang, doc_id,
       |        CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS BIGINT)
       |          AS pick_rank
       |      FROM h)
       |SELECT r.lang, q.quota, r.doc_id, r.pick_rank
       |FROM r JOIN q USING (lang) WHERE r.pick_rank <= q.quota
       |ORDER BY r.lang, r.pick_rank""".stripMargin

  val sql: Map[String, String] = Map(
    "txt_fuzzy_family" -> foldedOracle(
      Seq("name1" -> "string", "name2" -> "string", "dist" -> "long"),
      ("names", Seq("name1", "name2", "dist"),
        """WITH n AS (SELECT n_nationkey AS k, n_name AS nm FROM nation),
                |g AS (SELECT DISTINCT k, nm, substring(nm, CAST(i AS INT), 3) AS gram
                |      FROM n, unnest(generate_series(1, greatest(1, length(nm) - 2))) AS u(i)),
                |c AS (SELECT DISTINCT a.nm AS name1, b.nm AS name2, a.k AS k1, b.k AS k2
                |      FROM g a JOIN g b ON a.gram = b.gram AND a.k < b.k)
                |SELECT name1, name2, CAST(levenshtein(name1, name2) AS BIGINT) AS dist
                |FROM c WHERE levenshtein(name1, name2) <= 4
                |ORDER BY name1, name2""".stripMargin),
      ("parts", Seq("name1", "name2", "dist"),
        """WITH n AS (SELECT DISTINCT p_name AS nm FROM part),
                |t AS (SELECT nm, split_part(nm, ' ', 1) AS tok FROM n)
                |SELECT a.nm AS name1, b.nm AS name2,
                | CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
                |FROM t a JOIN t b ON a.tok = b.tok AND a.nm < b.nm
                |WHERE levenshtein(a.nm, b.nm) <= 4
                |ORDER BY name1, name2""".stripMargin)),
    "txt_sample_strata" -> foldedOracle(
      Seq("lang" -> "string", "n_sampled" -> "long", "first_doc" -> "long"),
      ("uniform", Seq("lang", "n_sampled", "first_doc"),
        """SELECT lang, count(*) AS n_sampled, min(doc_id) AS first_doc
                |FROM documents
                |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 10
                |GROUP BY lang ORDER BY lang""".stripMargin),
      ("stratified", Seq("lang", "n_sampled", "first_doc"),
        """SELECT lang, count(*) AS n_sampled, min(doc_id) AS first_doc
                |FROM documents
                |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
                |      < CASE WHEN lang = 'zh' THEN 25 WHEN lang = 'en' THEN 50 ELSE 10 END
                |GROUP BY lang ORDER BY lang""".stripMargin)),
    "txt_winnow_family" -> foldedOracle(
      Seq("doc_id" -> "long", "n_fp" -> "long", "fp_min" -> "long", "fp_max" -> "long", "fp_xor" -> "long", "doc1" -> "long", "doc2" -> "long", "n_shared" -> "long"),
      ("sketch", Seq("doc_id", "n_fp", "fp_min", "fp_max", "fp_xor"),
        (winnowCte() + """
                |SELECT doc_id, count(*) AS n_fp, min(fp) AS fp_min, max(fp) AS fp_max,
                |  bit_xor(fp) AS fp_xor
                |FROM sel GROUP BY doc_id ORDER BY doc_id""".stripMargin)),
      ("pairs", Seq("doc1", "doc2", "n_shared"),
        (winnowCte() + """,
                |m AS (SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS n_shared
                |      FROM sel a JOIN sel b ON a.fp = b.fp AND a.doc_id < b.doc_id
                |      GROUP BY 1, 2)
                |SELECT doc1, doc2, n_shared FROM m WHERE n_shared >= 3
                |ORDER BY doc1, doc2""".stripMargin))),
    "txt_dup_family" -> foldedOracle(
      Seq("doc_id" -> "long", "n_positions" -> "long", "n_dup" -> "long", "dup_frac" -> "double", "span_start" -> "long", "span_end" -> "long", "span_tokens" -> "long"),
      ("ngrams", Seq("doc_id", "n_positions", "n_dup", "dup_frac"),
        ngramCoverageOracle(5)),
      ("spans", Seq("doc_id", "span_start", "span_end", "span_tokens"),
        dupSpansOracle(5))),
    "txt_doc_metrics" -> foldedOracle(
      Seq("doc_id" -> "long", "n_tokens" -> "long", "n_types" -> "long", "ttr" -> "double", "n_words" -> "long", "n_sentences" -> "long", "n_syllables" -> "long", "flesch" -> "double"),
      ("ttr", Seq("doc_id", "n_tokens", "n_types", "ttr"),
        """SELECT doc_id,
                | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                | CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_types,
                | CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                |   / len(string_split(text, ' ')) AS ttr
                |FROM documents ORDER BY doc_id""".stripMargin),
      ("readability", Seq("doc_id", "n_words", "n_sentences", "n_syllables", "flesch"),
        """SELECT doc_id,
                | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
                | CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT) AS n_sentences,
                | CAST(greatest(1, len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))) AS BIGINT) AS n_syllables,
                | 206.835
                |   - 1.015 * (CAST(len(string_split(text, ' ')) AS DOUBLE)
                |              / greatest(1, len(regexp_extract_all(text, '[.!?]+'))))
                |   - 84.6 * (CAST(greatest(1, len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))) AS DOUBLE)
                |             / len(string_split(text, ' '))) AS flesch
                |FROM documents ORDER BY doc_id""".stripMargin)),
    "txt_pack_family" -> foldedOracle(
      Seq("shard" -> "long", "bin" -> "long", "n_docs" -> "long", "sum_tokens" -> "long", "first_doc" -> "long", "last_doc" -> "long", "doc_id" -> "long", "pos" -> "long"),
      ("bins", Seq("shard", "bin", "n_docs", "sum_tokens", "first_doc", "last_doc"),
        """WITH d AS (SELECT doc_id,
                |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                |    CAST((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT) % 8 AS INT) AS shard
                |  FROM documents),
                |c AS (SELECT doc_id, n_tokens, shard,
                |        CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS cum
                |      FROM d)
                |SELECT shard, (cum - n_tokens) // 512 AS bin,
                |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
                |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
                |FROM c GROUP BY shard, bin ORDER BY shard, bin""".stripMargin),
      ("epoch_shuffle", Seq("doc_id", "shard", "pos"),
        s"""WITH h AS (SELECT doc_id,
                |    ('0x' || substr(md5('ep1:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
                |  FROM documents)
                |SELECT doc_id, h % 8 AS shard,
                |  CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS BIGINT) AS pos
                |FROM h ORDER BY doc_id""".stripMargin)),
    "txt_stats" ->
      """SELECT doc_id, lang, length(text) AS n_chars_calc,
        | len(string_split(text, ' ')) AS n_tokens,
        | CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')) AS avg_token_len,
        | len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "txt_lang_dist" ->
      """SELECT lang, count(*) AS n,
        | CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM documents) AS share
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "txt_quality" ->
      """SELECT doc_id, n_tokens, n_stopwords,
        | CAST(n_stopwords AS DOUBLE) / n_tokens AS stopword_ratio,
        | (n_chars >= 100 AND CAST(n_stopwords AS DOUBLE) / n_tokens >= 0.05
        |   AND CAST(n_stopwords AS DOUBLE) / n_tokens <= 0.6) AS is_quality
        |FROM (SELECT doc_id, length(text) AS n_chars,
        |        len(string_split(text, ' ')) AS n_tokens,
        |        len(list_filter(string_split(text, ' '),
        |          t -> t IN ('the','a','and','of','to','in','is','data','row','value'))) AS n_stopwords
        |      FROM documents) t
        |ORDER BY doc_id""".stripMargin,
    // hashed-linear classifier: the weight of a feature IS a function
    // of its md5, so the oracle re-derives the identical integer sum
    "txt_quality_clf" ->
      s"""WITH $clfCtes
        |SELECT doc_id, CAST(n_features AS BIGINT) AS n_features,
        |       clf_score, clf_score >= 0 AS keep
        |FROM f ORDER BY doc_id""".stripMargin,
    // per-stratum report over the same classifier chain
    "txt_source_report" ->
      s"""WITH $clfCtes
        |SELECT d.lang, d.source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN clf_score >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
        |  CAST(sum(CASE WHEN clf_score >= 0 THEN 1 ELSE 0 END) * 10000
        |    // count(*) AS BIGINT) AS keep_bp,
        |  CAST(sum(clf_score) AS BIGINT) AS sum_score
        |FROM f JOIN documents d USING (doc_id)
        |GROUP BY d.lang, d.source
        |ORDER BY d.lang, d.source""".stripMargin,
    // quality-weighted hash sampling over the same chain
    "txt_quality_sample" ->
      s"""WITH $clfCtes,
        |r AS (SELECT doc_id, clf_score,
        |        CASE WHEN clf_score >= 20 THEN 10000
        |             WHEN clf_score >= 0 THEN 5000
        |             ELSE 1000 END AS rate_bp
        |      FROM f)
        |SELECT doc_id, clf_score, CAST(rate_bp AS BIGINT) AS rate_bp
        |FROM r
        |WHERE ('0x' || substr(md5('qs:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |        % 10000 < rate_bp
        |ORDER BY doc_id""".stripMargin,
    "txt_token_freq" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents) t
        |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin,
    "txt_bigrams" ->
      """SELECT bigram, count(*) AS n
        |FROM (SELECT unnest(list_transform(generate_series(1, len(ls) - 1),
        |               i -> ls[i] || ' ' || ls[i + 1])) AS bigram
        |      FROM (SELECT string_split(lower(text), ' ') AS ls FROM documents) s) t
        |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 30""".stripMargin,
    "txt_langid" -> langIdOracle,
    "txt_langid_confusion" -> langIdConfusionOracle,
    "txt_fingerprint" ->
      """SELECT doc_id,
        | list_reduce(
        |   list_prepend(CAST(0 AS BIGINT),
        |     list_transform(string_split(text, ' '),
        |       t -> ('0x' || substr(md5(t), 1, 8))::BIGINT)),
        |   (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    "txt_phrase_search" -> phraseOracle,
    // the stored probe serves the same positional token frame, so its
    // oracle IS the inline phrase derivation
    "txt_phrase_stored" -> phraseOracle,
    "txt_collocations" -> collocationsOracle(5, 20),
    "txt_dsir_weights" -> dsirOracle(50),
    "txt_bpe_train" -> bpeTrainOracle(4),
    "txt_bpe_tokens" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))) AS BIGINT) AS total_tokens,
        | CAST(sum(len(list_distinct(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')))) AS BIGINT) AS total_distinct,
        | CAST(max(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))) AS BIGINT) AS max_doc_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "txt_train_val_split" ->
      """SELECT doc_id, lang,
        | CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 80 THEN 'train'
        |      WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 90 THEN 'val'
        |      ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "txt_split_stats" ->
      """SELECT split, count(*) AS n FROM (
        |  SELECT CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 80 THEN 'train'
        |              WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 90 THEN 'val'
        |              ELSE 'test' END AS split
        |  FROM documents) t
        |GROUP BY split ORDER BY split""".stripMargin,
    "txt_clean_funnel" -> (clusterCte +
      """,
        |q AS (SELECT doc_id, text, length(text) AS n_chars,
        |        len(string_split(text, ' ')) AS n_tokens,
        |        len(list_filter(string_split(text, ' '),
        |          t -> t IN ('the','a','and','of','to','in','is','data','row','value'))) AS n_stop
        |      FROM documents),
        |len_ok AS (SELECT * FROM q WHERE n_chars >= 100),
        |qual AS (SELECT * FROM len_ok
        |         WHERE CAST(n_stop AS DOUBLE) / n_tokens >= 0.05
        |           AND CAST(n_stop AS DOUBLE) / n_tokens <= 0.6),
        |ex AS (SELECT doc_id FROM (
        |         SELECT doc_id, row_number() OVER (PARTITION BY md5(text)
        |           ORDER BY doc_id) AS rn FROM qual) t WHERE rn = 1),
        |nr AS (SELECT doc_id FROM ex
        |       WHERE doc_id NOT IN (SELECT id FROM canon WHERE id <> canon_id))
        |SELECT '0_raw' AS stage, count(*) AS n_docs FROM documents
        |UNION ALL SELECT '1_min_length', count(*) FROM len_ok
        |UNION ALL SELECT '2_quality', count(*) FROM qual
        |UNION ALL SELECT '3_exact_dedup', count(*) FROM ex
        |UNION ALL SELECT '4_near_dedup', count(*) FROM nr
        |ORDER BY stage""".stripMargin),
    "txt_top_terms" ->
      """WITH tf AS (SELECT doc_id, t.term, count(*) AS tf
        |  FROM documents, unnest(string_split(text, ' ')) AS t(term)
        |  GROUP BY doc_id, t.term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |r AS (SELECT doc_id, term, tf.tf, df.df,
        |   CAST(row_number() OVER (PARTITION BY doc_id
        |     ORDER BY tf.tf DESC, df.df ASC, term ASC) AS BIGINT) AS rank
        |  FROM tf JOIN df USING (term))
        |SELECT doc_id, rank, term, tf, df FROM r WHERE rank <= 3
        |ORDER BY doc_id, rank""".stripMargin,
    "txt_pii_mask" ->
      """SELECT doc_id,
        | md5(regexp_replace(
        |       regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
        |       '[0-9]+', '<NUM>', 'g')) AS masked_digest,
        | CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+')) AS BIGINT) AS n_emails,
        | CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_numbers
        |FROM documents ORDER BY doc_id""".stripMargin,
    "txt_sentence_dedup" ->
      """WITH s AS (SELECT doc_id, trim(x) AS sent
        |  FROM documents, unnest(string_split(text, '.')) AS t(x)
        |  WHERE trim(x) <> ''),
        |g AS (SELECT sent, count(*) AS n, count(DISTINCT doc_id) AS nd
        |  FROM s GROUP BY sent)
        |SELECT CAST(count(*) AS BIGINT) AS n_distinct,
        | CAST(count(CASE WHEN n > 1 THEN 1 END) AS BIGINT) AS n_repeated,
        | CAST(count(CASE WHEN nd > 1 THEN 1 END) AS BIGINT) AS n_cross_doc,
        | CAST(sum(n) AS BIGINT) AS n_total
        |FROM g""".stripMargin,
    "txt_contamination" ->
      """WITH sp AS (SELECT doc_id, text,
        |   CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 80 THEN 'train'
        |        WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 90 THEN 'val'
        |        ELSE 'test' END AS split
        |   FROM documents),
        |sh AS (SELECT doc_id, split, unnest(list_distinct(
        |         list_transform(generate_series(1, len(ls) - 2),
        |           i -> ls[i] || ' ' || ls[i+1] || ' ' || ls[i+2]))) AS s
        |       FROM (SELECT doc_id, split, string_split(text, ' ') AS ls FROM sp) q
        |       WHERE len(ls) >= 3),
        |tr AS (SELECT DISTINCT s FROM sh WHERE split = 'train'),
        |te AS (SELECT doc_id, s FROM sh WHERE split = 'test')
        |SELECT te.doc_id,
        |  count(*) AS n_shingles,
        |  count(tr.s) AS n_contaminated,
        |  CAST(count(tr.s) AS DOUBLE) / count(*) AS contamination
        |FROM te LEFT JOIN tr ON te.s = tr.s
        |GROUP BY te.doc_id ORDER BY te.doc_id""".stripMargin,
    "txt_bigram_lm" ->
      """WITH tok AS (SELECT string_split(lower(text), ' ') AS ls FROM documents),
        |bi AS (SELECT ls[i] AS w1, ls[i + 1] AS w2
        |       FROM tok, unnest(generate_series(1, len(ls) - 1)) AS u(i)),
        |bc AS (SELECT w1, w2, count(*) AS n_pair FROM bi GROUP BY 1, 2),
        |u2 AS (SELECT w1, count(*) AS n_w1
        |       FROM (SELECT unnest(ls) AS w1 FROM tok) q GROUP BY 1)
        |SELECT w1, w2, n_pair, n_w1, CAST(n_pair AS DOUBLE) / n_w1 AS cond_p
        |FROM bc JOIN u2 USING (w1)
        |ORDER BY n_pair DESC, w1, w2 LIMIT 20""".stripMargin,
    "txt_repetition" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
        |           FROM documents),
        |b AS (SELECT doc_id,
        |        CAST(len(tk) AS BIGINT) AS n_tokens,
        |        CAST(greatest(len(tk) - 1, 0) AS BIGINT) AS n_bigrams,
        |        CAST(len(list_distinct(tk)) AS BIGINT) AS n_types
        |      FROM d),
        |g AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(tk) - 1),
        |        i -> tk[i] || ' ' || tk[i+1])) AS bg
        |      FROM d WHERE len(tk) > 1),
        |t AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_n
        |      FROM (SELECT doc_id, bg, count(*) AS c FROM g GROUP BY doc_id, bg)
        |      GROUP BY doc_id)
        |SELECT b.doc_id, b.n_tokens, b.n_bigrams, b.n_types,
        |  COALESCE(t.top_bigram_n, 0) AS top_bigram_n,
        |  CASE WHEN b.n_bigrams > 0
        |       THEN CAST(COALESCE(t.top_bigram_n, 0) AS DOUBLE) / CAST(b.n_bigrams AS DOUBLE)
        |       ELSE 0.0 END AS top_bigram_frac,
        |  CASE WHEN b.n_tokens > 0
        |       THEN CAST(b.n_tokens - b.n_types AS DOUBLE) / CAST(b.n_tokens AS DOUBLE)
        |       ELSE 0.0 END AS dup_token_frac,
        |  (CASE WHEN b.n_bigrams > 0
        |        THEN CAST(COALESCE(t.top_bigram_n, 0) AS DOUBLE) / CAST(b.n_bigrams AS DOUBLE)
        |        ELSE 0.0 END > 0.18
        |   OR CASE WHEN b.n_tokens > 0
        |           THEN CAST(b.n_tokens - b.n_types AS DOUBLE) / CAST(b.n_tokens AS DOUBLE)
        |           ELSE 0.0 END > 0.60) AS is_repetitive
        |FROM b LEFT JOIN t USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "txt_mixture_sample" -> mixtureSampleOracle,
    "txt_bm25_topk" -> bm25Oracle(10),
    "txt_span_cut" -> spanCutOracle(5),
    "txt_hybrid_rrf" -> hybridRrfOracle(10, 20, 60),
    "txt_hybrid_stored" -> hybridStoredOracle(10, 20, 60),
    // probing the stored inverted index is result-identical to the
    // inline BM25 plan (parquet round-trips the integer statistics);
    // the build's census re-derives the same md5 term bucketing
    "txt_bm25_build" ->
      s"""WITH tf AS MATERIALIZED (SELECT doc_id, t.term, count(*) AS tf
        |  FROM documents, unnest(string_split(text, ' ')) AS t(term)
        |  GROUP BY doc_id, t.term)
        |SELECT ('0x' || substr(md5(term), 1, 8))::BIGINT % ${Text.bm25Buckets}
        |    AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_postings,
        |  CAST(count(DISTINCT term) AS BIGINT) AS n_terms
        |FROM tf GROUP BY bucket ORDER BY bucket""".stripMargin,
    "txt_bm25_stored" -> bm25Oracle(10),
    // health: per-bucket postings mass over the re-derived inverted
    // index; bucket = md5-hash of the term mod 64, like the layout
    "txt_bm25_health" ->
      """WITH tf AS MATERIALIZED (SELECT doc_id, t.term, count(*) AS tf
        |  FROM documents, unnest(string_split(text, ' ')) AS t(term)
        |  GROUP BY doc_id, t.term),
        |b AS MATERIALIZED (SELECT
        |    ('0x' || substr(md5(term), 1, 8))::BIGINT % 64 AS bucket, term
        |  FROM tf),
        |pc AS (SELECT bucket, count(*) AS n_postings FROM b GROUP BY bucket),
        |tm AS (SELECT bucket, count(DISTINCT term) AS n_terms FROM b GROUP BY bucket),
        |tot AS (SELECT count(*) AS n_total FROM b)
        |SELECT bucket, CAST(n_postings AS BIGINT) AS n_postings,
        |  CAST(n_terms AS BIGINT) AS n_terms,
        |  CAST(n_postings * 10000 // n_total AS BIGINT) AS share_bp,
        |  n_postings * 64 > n_total * 2 AS is_hot
        |FROM pc JOIN tm USING (bucket), tot
        |ORDER BY bucket""".stripMargin,
    // resplit: hot buckets (>1.1x mean postings) split by the next
    // md5 bit of the term hash; report = per-new-bucket mass after
    "txt_bm25_resplit" ->
      """WITH tf AS MATERIALIZED (SELECT doc_id, t.term, count(*) AS tf
        |  FROM documents, unnest(string_split(text, ' ')) AS t(term)
        |  GROUP BY doc_id, t.term),
        |h AS MATERIALIZED (SELECT doc_id, term,
        |    ('0x' || substr(md5(term), 1, 8))::BIGINT AS hv FROM tf),
        |b AS MATERIALIZED (SELECT doc_id, term, hv % 64 AS bucket,
        |    (hv // 64) % 2 AS sub FROM h),
        |cnt AS (SELECT bucket, count(*) AS n FROM b GROUP BY bucket),
        |tot AS (SELECT count(*) AS n_total FROM b),
        |hot AS (SELECT bucket FROM cnt, tot
        |        WHERE n * 64 * 100 > n_total * 110),
        |n AS (SELECT doc_id, term, b.bucket,
        |        CASE WHEN hot.bucket IS NULL THEN b.bucket
        |             ELSE b.bucket + 64 * sub END AS new_bucket
        |      FROM b LEFT JOIN hot ON b.bucket = hot.bucket)
        |SELECT CAST(new_bucket AS BIGINT) AS new_bucket,
        |  CAST(min(bucket) AS BIGINT) AS parent_bucket,
        |  CAST(count(*) AS BIGINT) AS n_postings,
        |  CAST(count(DISTINCT term) AS BIGINT) AS n_terms,
        |  new_bucket >= 64 AS is_split_half
        |FROM n GROUP BY new_bucket ORDER BY new_bucket""".stripMargin,
    // append merges into the bucket layout until it IS the from-scratch
    // index over the union (BM25 has no trained artifacts), so the
    // probe-after-append oracle is the inline-index oracle verbatim
    "txt_bm25_append" -> bm25Oracle(10),
    // delete + compact restores from-scratch exactness over survivors
    "txt_bm25_delete" -> bm25DeleteOracle(10),
    "txt_lm_quality" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
        |           FROM documents),
        |pr AS MATERIALIZED (SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |    tk[i] AS w1, tk[i+1] AS w2
        |  FROM d, unnest(generate_series(1, len(tk) - 1)) AS u(i)
        |  WHERE len(tk) > 1),
        |bi AS (SELECT w1, w2, count(*) AS n_pair FROM pr GROUP BY w1, w2),
        |uni AS (SELECT w1, count(*) AS n_w1 FROM pr GROUP BY w1),
        |sp AS (SELECT doc_id, pos,
        |    CAST(n_pair AS DOUBLE) / CAST(n_w1 AS DOUBLE) AS p
        |  FROM pr JOIN bi USING (w1, w2) JOIN uni USING (w1)),
        |m AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
        |    list_sum(list(p ORDER BY pos)) / count(*) AS mean_p
        |  FROM sp GROUP BY doc_id)
        |SELECT d2.doc_id, CAST(coalesce(m.n_pairs, 0) AS BIGINT) AS n_pairs,
        |  coalesce(m.mean_p, 0.0) AS mean_p
        |FROM documents d2 LEFT JOIN m USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // stored-LM build census: bucket = md5-prefix hash of w1 mod 64,
    // like the layout; the model trains on the even-doc_id half
    "txt_lm_build" ->
      s"""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
        |  FROM documents WHERE doc_id % 2 = 0),
        |pr AS MATERIALIZED (SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2
        |  FROM d, unnest(generate_series(1, len(tk) - 1)) AS u(i)
        |  WHERE len(tk) > 1),
        |bi AS (SELECT w1, w2, count(*) AS n_pair FROM pr GROUP BY w1, w2),
        |uni AS (SELECT w1, count(*) AS n_w1 FROM pr GROUP BY w1),
        |bb AS (SELECT
        |    ('0x' || substr(md5(w1), 1, 8))::BIGINT % ${Text.bm25Buckets}
        |      AS bucket,
        |    CAST(count(*) AS BIGINT) AS n_bigrams,
        |    CAST(sum(n_pair) AS BIGINT) AS n_pairs
        |  FROM bi GROUP BY bucket),
        |ub AS (SELECT
        |    ('0x' || substr(md5(w1), 1, 8))::BIGINT % ${Text.bm25Buckets}
        |      AS bucket,
        |    CAST(count(*) AS BIGINT) AS n_unigrams
        |  FROM uni GROUP BY bucket)
        |SELECT bucket, n_bigrams, n_pairs, n_unigrams
        |FROM bb JOIN ub USING (bucket) ORDER BY bucket""".stripMargin,
    // scoring under the STORED reference LM: the model CTEs filter to
    // the even-doc_id training half; unseen pairs score exactly 0
    "txt_lm_stored" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
        |  FROM documents),
        |pr AS MATERIALIZED (SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |    tk[i] AS w1, tk[i+1] AS w2
        |  FROM d, unnest(generate_series(1, len(tk) - 1)) AS u(i)
        |  WHERE len(tk) > 1),
        |bi AS MATERIALIZED (SELECT w1, w2, count(*) AS n_pair FROM pr
        |  WHERE doc_id % 2 = 0 GROUP BY w1, w2),
        |uni AS MATERIALIZED (SELECT w1, count(*) AS n_w1 FROM pr
        |  WHERE doc_id % 2 = 0 GROUP BY w1),
        |sp AS (SELECT pr.doc_id, pr.pos,
        |    coalesce(CAST(n_pair AS DOUBLE) / CAST(n_w1 AS DOUBLE), 0.0) AS p
        |  FROM pr LEFT JOIN bi USING (w1, w2) LEFT JOIN uni USING (w1)),
        |m AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
        |    list_sum(list(p ORDER BY pos)) / count(*) AS mean_p
        |  FROM sp GROUP BY doc_id)
        |SELECT d2.doc_id, CAST(coalesce(m.n_pairs, 0) AS BIGINT) AS n_pairs,
        |  coalesce(m.mean_p, 0.0) AS mean_p
        |FROM documents d2 LEFT JOIN m USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // append merges additive count segments until the served model IS
    // the from-scratch model over the unioned reference (even half ∪
    // the %4==1 batch), so the oracle just widens the training filter
    "txt_lm_append" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
        |  FROM documents),
        |pr AS MATERIALIZED (SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |    tk[i] AS w1, tk[i+1] AS w2
        |  FROM d, unnest(generate_series(1, len(tk) - 1)) AS u(i)
        |  WHERE len(tk) > 1),
        |bi AS MATERIALIZED (SELECT w1, w2, count(*) AS n_pair FROM pr
        |  WHERE doc_id % 2 = 0 OR doc_id % 4 = 1 GROUP BY w1, w2),
        |uni AS MATERIALIZED (SELECT w1, count(*) AS n_w1 FROM pr
        |  WHERE doc_id % 2 = 0 OR doc_id % 4 = 1 GROUP BY w1),
        |sp AS (SELECT pr.doc_id, pr.pos,
        |    coalesce(CAST(n_pair AS DOUBLE) / CAST(n_w1 AS DOUBLE), 0.0) AS p
        |  FROM pr LEFT JOIN bi USING (w1, w2) LEFT JOIN uni USING (w1)),
        |m AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
        |    list_sum(list(p ORDER BY pos)) / count(*) AS mean_p
        |  FROM sp GROUP BY doc_id)
        |SELECT d2.doc_id, CAST(coalesce(m.n_pairs, 0) AS BIGINT) AS n_pairs,
        |  coalesce(m.mean_p, 0.0) AS mean_p
        |FROM documents d2 LEFT JOIN m USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // delete subtracts the victims' counts until the served model IS
    // the from-scratch model over the surviving reference, so the
    // oracle just narrows the training filter
    "txt_lm_delete" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
        |  FROM documents),
        |pr AS MATERIALIZED (SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |    tk[i] AS w1, tk[i+1] AS w2
        |  FROM d, unnest(generate_series(1, len(tk) - 1)) AS u(i)
        |  WHERE len(tk) > 1),
        |bi AS MATERIALIZED (SELECT w1, w2, count(*) AS n_pair FROM pr
        |  WHERE doc_id % 2 = 0 AND doc_id % 8 <> 2 GROUP BY w1, w2),
        |uni AS MATERIALIZED (SELECT w1, count(*) AS n_w1 FROM pr
        |  WHERE doc_id % 2 = 0 AND doc_id % 8 <> 2 GROUP BY w1),
        |sp AS (SELECT pr.doc_id, pr.pos,
        |    coalesce(CAST(n_pair AS DOUBLE) / CAST(n_w1 AS DOUBLE), 0.0) AS p
        |  FROM pr LEFT JOIN bi USING (w1, w2) LEFT JOIN uni USING (w1)),
        |m AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
        |    list_sum(list(p ORDER BY pos)) / count(*) AS mean_p
        |  FROM sp GROUP BY doc_id)
        |SELECT d2.doc_id, CAST(coalesce(m.n_pairs, 0) AS BIGINT) AS n_pairs,
        |  coalesce(m.mean_p, 0.0) AS mean_p
        |FROM documents d2 LEFT JOIN m USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // compact folds the generations; the served model is the
    // append+delete composition, so the oracle widens then narrows
    "txt_lm_compact" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
        |  FROM documents),
        |pr AS MATERIALIZED (SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |    tk[i] AS w1, tk[i+1] AS w2
        |  FROM d, unnest(generate_series(1, len(tk) - 1)) AS u(i)
        |  WHERE len(tk) > 1),
        |bi AS MATERIALIZED (SELECT w1, w2, count(*) AS n_pair FROM pr
        |  WHERE (doc_id % 2 = 0 OR doc_id % 4 = 1) AND doc_id % 8 <> 2
        |  GROUP BY w1, w2),
        |uni AS MATERIALIZED (SELECT w1, count(*) AS n_w1 FROM pr
        |  WHERE (doc_id % 2 = 0 OR doc_id % 4 = 1) AND doc_id % 8 <> 2
        |  GROUP BY w1),
        |sp AS (SELECT pr.doc_id, pr.pos,
        |    coalesce(CAST(n_pair AS DOUBLE) / CAST(n_w1 AS DOUBLE), 0.0) AS p
        |  FROM pr LEFT JOIN bi USING (w1, w2) LEFT JOIN uni USING (w1)),
        |m AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
        |    list_sum(list(p ORDER BY pos)) / count(*) AS mean_p
        |  FROM sp GROUP BY doc_id)
        |SELECT d2.doc_id, CAST(coalesce(m.n_pairs, 0) AS BIGINT) AS n_pairs,
        |  coalesce(m.mean_p, 0.0) AS mean_p
        |FROM documents d2 LEFT JOIN m USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "txt_quota_sample" -> quotaSampleOracle(50),
    "txt_gopher_gate" -> gopherGateOracle,
    "txt_pii_scan" -> piiScanOracle,
    // watermark semantics modeled in batch: arrival = event time plus
    // an md5-keyed 0-60 min transport jitter, micro-batch = arrival
    // hour, and the watermark advances at batch boundaries
    // (strictly-previous frame: the first batch never drops); mirrors
    // StreamingOps.lateDataAudit constant-for-constant
    "txt_novel_bigrams" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
        |           FROM documents),
        |g AS (SELECT DISTINCT doc_id,
        |        ('0x' || substr(md5(bg), 1, 15))::BIGINT AS h
        |      FROM (SELECT doc_id,
        |              unnest(list_transform(generate_series(1, len(tk) - 1),
        |                i -> tk[i] || ' ' || tk[i+1])) AS bg
        |            FROM d WHERE len(tk) > 1) u),
        |p AS (SELECT doc_id, count(*) AS n_bigrams FROM g GROUP BY doc_id),
        |n AS (SELECT min(doc_id) AS doc_id FROM g GROUP BY h HAVING count(*) = 1),
        |nn AS (SELECT doc_id, count(*) AS n_novel FROM n GROUP BY doc_id)
        |SELECT p.doc_id, p.n_bigrams,
        |  CAST(COALESCE(nn.n_novel, 0) AS BIGINT) AS n_novel,
        |  CAST(COALESCE(nn.n_novel, 0) AS DOUBLE) / CAST(p.n_bigrams AS DOUBLE) AS novelty
        |FROM p LEFT JOIN nn USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
  )
}
