package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sources.{IndexFS, Snapshot}
import graft.sources.Sources.MaintCheckpointSyntax

/** Text-analysis operators over the `documents` table — the
  * training-data-pipeline half of the engine (BASELINE.json north star):
  * token statistics, language distribution, quality scoring, language
  * identification, n-grams, document fingerprinting.
  *
  * Everything is expression-level (`functions._` + higher-order array
  * functions), so the operators run inside whole-stage codegen and scale
  * linearly with document count: no UDFs, no driver-side loops, and the
  * only shuffles are the final aggregations (token/bigram frequency).
  */
object Text {

  /** Whitespace tokenization as a column expression. */
  def tokens(text: Column): Column = split(text, " ")

  /** Portable 32-bit token hash: first 8 hex digits of md5, parsed as a
    * long. md5 is bit-identical across engines (unlike murmur/xxhash
    * builtins), which is what makes fingerprints/minhash oracle-checkable.
    */
  def tokenHash(t: Column): Column =
    conv(substring(md5(t), 1, 8), 16, 10).cast("long")

  /** 60-bit md5-prefix hash (15 hex chars — 16 would overflow signed-64
    * in conv/CAST): the join-key hash for shingle co-occurrence, small
    * enough to stay in a BIGINT on both engines, wide enough that
    * collision false-positives (~pairs²/2^60) are negligible.
    */
  def tokenHash60(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** Per-document statistics: length, token count, avg token length,
    * uppercase-free check. Single projection, no shuffle.
    */
  def docStats(documents: DataFrame): DataFrame =
    documents.select(
        col("doc_id"),
        col("lang"),
        length(col("text")).cast("long").as("n_chars_calc"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        (length(regexp_replace(col("text"), " ", "")).cast("double") /
          size(tokens(col("text"))).cast("double")).as("avg_token_len"),
        size(array_distinct(tokens(col("text")))).cast("long").as("n_distinct_tokens"))
      .orderBy(col("doc_id"))

  /** Corpus language distribution with share-of-total. The total rides
    * along via a single-row broadcast join (no global window).
    */
  def langDistribution(documents: DataFrame): DataFrame = {
    val counts = documents.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val total = documents.agg(count(lit(1)).as("n_total"))
    counts.join(broadcast(total))
      .select(col("lang"), col("n"),
        (col("n").cast("double") / col("n_total").cast("double")).as("share"))
      .orderBy(col("lang"))
  }

  /** Stopword-ratio quality scoring (array-native: no explode, no
    * shuffle). A doc is "quality" if long enough and with a sane
    * stopword share — the standard cheap pretraining filter shape.
    */
  val stopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "data", "row", "value")

  def qualityScore(documents: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks, t => t.isin(stopwords.map(lit(_)): _*))).cast("double")
    documents.select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(filter(toks, t => t.isin(stopwords.map(lit(_)): _*))).cast("long").as("n_stopwords"),
        (nStop / nTok).as("stopword_ratio"),
        (length(col("text")) >= 100 && (nStop / nTok) >= lit(0.05) &&
          (nStop / nTok) <= lit(0.6)).as("is_quality"))
      .orderBy(col("doc_id"))
  }

  /** Hashed-linear quality CLASSIFIER (the fastText / hashing-trick
    * shape the heuristic [[qualityScore]] filter graduates into):
    * every unigram and bigram feature hashes straight to its weight —
    * `(md5_32(feature) mod 17) - 8 ∈ [-8, 8]`, the hashing trick with
    * the weight table folded into the hash, so there is NO model
    * broadcast at all — and a document's score is the exact integer
    * sum of its feature weights; `keep = score >= 0`. In production
    * the md5-derived weights would be a trained table `hash mod D →
    * weight` carried into the generated code via `addReferenceObj`;
    * the plan is unchanged. The whole model is ONE native codegen'd
    * call per row ([[graft.functions.HashedLinearScore]] — an
    * `aggregate`/`transform` HOF formulation computes the same sum
    * but those expressions are `CodegenFallback`, which drops the
    * stage out of whole-stage codegen): no feature explode, zero
    * shuffles before the final sort, linear scaling — the 100
    * TB-shaped classifier stage. Integer arithmetic end to end so
    * the score hash-matches the oracle.
    */
  def qualityClassify(documents: DataFrame): DataFrame = {
    val toks = col("tk")
    val score = graft.functions.HashedLinearScore
      .hashed_linear_score(toks, 17, 8)
    documents
      .withColumn("tk", tokens(lower(col("text"))))
      .select(col("doc_id"),
        (size(toks) + greatest(size(toks) - 1, lit(0))).cast("long")
          .as("n_features"),
        score.as("clf_score"),
        (score >= 0).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** Per-(lang, source) curation report over the hashed-linear
    * classifier — the dashboard a data-curation run ends with: how
    * many documents each stratum contributes, how many the classifier
    * keeps, the keep rate (exact basis points, floor division), and
    * the stratum's total score mass. One scan (the classifier is a
    * per-row expression) into one ~|lang|·|source|-group aggregation;
    * all integer arithmetic.
    */
  def sourceReport(documents: DataFrame): DataFrame = {
    val score = graft.functions.HashedLinearScore
      .hashed_linear_score(tokens(lower(col("text"))), 17, 8)
    documents
      .select(col("lang"), col("source"), score.as("s"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("s") >= 0, 1L).otherwise(0L)).as("n_keep"),
        sum(col("s")).as("sum_score"))
      .select(col("lang"), col("source"), col("n_docs"), col("n_keep"),
        expr("n_keep * 10000 div n_docs").as("keep_bp"),
        col("sum_score"))
      .orderBy(col("lang"), col("source"))
  }

  /** Quality-WEIGHTED sampling: keep probability depends on the
    * classifier score — the static form of quality-skewed data
    * selection (high-scoring docs kept outright, mid kept at half
    * rate, low at a tenth). The keep decision is the repo's standard
    * deterministic device: md5-hash of the doc_id against an exact
    * basis-point threshold, so the sample is reproducible and the
    * oracle re-derives it bit-for-bit. Per-row only — classifier,
    * bucket, and coin all evaluate in the scan projection.
    */
  def qualitySample(documents: DataFrame): DataFrame = {
    val score = graft.functions.HashedLinearScore
      .hashed_linear_score(tokens(lower(col("text"))), 17, 8)
    val rate = when(col("clf_score") >= 20, lit(10000L))
      .when(col("clf_score") >= 0, lit(5000L))
      .otherwise(lit(1000L))
    documents
      .select(col("doc_id"), score.as("clf_score"))
      .withColumn("rate_bp", rate)
      .filter(pmod(tokenHash(concat(lit("qs:"), col("doc_id").cast("string"))),
        lit(10000L)) < col("rate_bp"))
      .orderBy(col("doc_id"))
  }

  /** Token frequency top-k: explode → hash agg → TakeOrderedAndProject.
    * Deterministic because (count, token) is a total order.
    */
  def tokenFrequency(documents: DataFrame, k: Int): DataFrame =
    documents.repartition(documents.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
      .select(explode(tokens(lower(col("text")))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  /** Bigram frequency top-k. Bigrams are built array-natively per doc
    * (size-1 guard for single-token docs), then exploded once.
    */
  def bigramFrequency(documents: DataFrame, k: Int): DataFrame = {
    // token column materialized first: an inline split() inside the
    // transform lambda would re-tokenize the text twice per bigram
    val toks = col("tk")
    val bigrams = when(size(toks) > 1,
        transform(sequence(lit(1), size(toks) - 1),
          i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
    documents.repartition(documents.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("tk", tokens(lower(col("text"))))
      .select(explode(bigrams).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(k)
  }

  /** Language ID by stopword-profile hit counting (classic cheap n-gram/
    * wordlist heuristic). Profiles are tiny literal wordlists; the
    * prediction is the argmax with a fixed tie order — fully
    * deterministic and engine-portable.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "de", "que", "es"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("de", "shi", "le", "wo", "ni"))

  def languageId(documents: DataFrame): DataFrame = {
    val toks = tokens(lower(col("text")))
    val scored = langProfiles.foldLeft(documents.select(col("doc_id"), col("lang"), col("text"))) {
      case (df, (name, words)) =>
        df.withColumn(s"score_$name",
          size(filter(toks, t => t.isin(words.map(lit(_)): _*))).cast("long"))
    }
    // argmax with fixed tie order = profile declaration order
    val best = langProfiles.map(_._1).foldLeft((lit(-1L), lit("und"))) {
      case ((bestScore, bestLang), name) =>
        val s = col(s"score_$name")
        (when(s > bestScore, s).otherwise(bestScore),
         when(s > bestScore, lit(name)).otherwise(bestLang))
    }
    scored
      .withColumn("predicted_lang", best._2)
      .drop("text")
      .orderBy(col("doc_id"))
  }

  /** Language-ID evaluation: confusion matrix of labeled vs predicted
    * language — counts per (actual, predicted) cell, the first quality
    * report for any classifier in the pipeline. One extra aggregate on
    * top of the scoring projection.
    */
  def langIdConfusion(documents: DataFrame): DataFrame =
    languageId(documents)
      .groupBy(col("lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("predicted_lang"))

  /** BPE-ish regex tokenization: letter runs, digit runs, and single
    * punctuation marks each count as one token (the pre-tokenizer shape
    * most BPE vocabularies assume). Corpus-level totals per language.
    */
  val bpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  def bpeTokenCounts(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), col("lang"),
        size(regexp_extract_all(col("text"), lit(bpePattern), lit(0)))
          .cast("long").as("n_bpe_tokens"),
        size(array_distinct(regexp_extract_all(col("text"), lit(bpePattern), lit(0))))
          .cast("long").as("n_distinct_bpe"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_bpe_tokens")).as("total_tokens"),
           sum(col("n_distinct_bpe")).as("total_distinct"),
           max(col("n_bpe_tokens")).as("max_doc_tokens"))
      .orderBy(col("lang"))

  /** BPE vocabulary INDUCTION — the merge-learning loop itself
    * (Sennrich et al. 2016, public), not just pre-tokenizer counting:
    * learn `nMerges` byte-pair merges from the corpus and return the
    * merge table `(merge_round, left_sym, right_sym, merged, pair_count)`
    * a tokenizer trainer would persist.
    *
    * The algorithm runs on the WORD-FREQUENCY table, exactly like
    * production trainers: ONE corpus scan folds the text into
    * (word, count) — vocabulary-sized, not corpus-sized — and every
    * merge round after that touches only the vocabulary. Per round:
    * adjacent symbol pairs (overlap counted, the classic statistic)
    * weighted by word count, the argmax pair under the total order
    * (count DESC, left, right), then a greedy LEFT-TO-RIGHT
    * non-overlapping merge applied to every word. All arithmetic is
    * integer counts — nothing float anywhere — so the table
    * hash-matches the oracle, which unrolls the same rounds as a CTE
    * chain.
    *
    * The merge applies through a DELIMITED-STRING device: a word's
    * symbol sequence is kept as `|s1|s2|…` (leading separator, one
    * per boundary), so replacing the literal `|l|r` with `|lr` IS the
    * greedy non-overlapping left-to-right merge (both engines'
    * `replace` scan left to right and resume after each hit —
    * `|b|b|b` under merge (b,b) becomes `|bb|b`, like the reference
    * implementation). Fixture tokens are whitespace-split words, so
    * `|` cannot occur inside a symbol.
    *
    * Scale shape: one corpus scan + per-round (vocabulary-keyed pair
    * aggregation + 1-row winner broadcast + per-row replace); each
    * round's vocabulary localCheckpoints so round r+1 starts from a
    * materialized table instead of an r-deep expression tree.
    */
  def bpeTrain(documents: DataFrame, nMerges: Int = 4): DataFrame =
    bpeRounds(documents, nMerges)._1

  /** The training loop shared by [[bpeTrain]] and [[bpeTrainEncode]]:
    * the merge table plus the FINAL symbolized vocabulary (word →
    * delimited symbol string after all `nMerges` merges) — the encode
    * phase applies the learned merges by vocabulary lookup, never by
    * re-running the per-word replaces over the corpus.
    */
  private def bpeRounds(documents: DataFrame,
                        nMerges: Int): (DataFrame, DataFrame) = {
    var cur = documents
      .select(explode(tokens(lower(col("text")))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .select(col("w"), col("wc"), concat(lit("|"),
        concat_ws("|", expr(
          "transform(sequence(1, length(w)), i -> substring(w, i, 1))")))
        .as("s"))
      .localCheckpoint()
    val merges = (1 to nMerges).map { r =>
      val pairs = cur
        .select(col("wc"), expr(
          "filter(split(s, '\\\\|'), x -> x <> '')").as("syms"))
        .filter(size(col("syms")) >= 2)
        .select(col("wc"), explode(expr(
          """transform(sequence(0, size(syms) - 2),
            |  i -> struct(element_at(syms, i + 1) AS l,
            |              element_at(syms, i + 2) AS r))""".stripMargin))
          .as("p"))
        .groupBy(col("p.l").as("left_sym"), col("p.r").as("right_sym"))
        .agg(sum(col("wc")).as("pair_count"))
      val winner = pairs
        .orderBy(col("pair_count").desc, col("left_sym"), col("right_sym"))
        .limit(1)
        .localCheckpoint() // 1 row: feeds the merge apply AND the report
      cur = cur.join(broadcast(winner))
        .select(col("w"), col("wc"),
          expr("replace(s, '|' || left_sym || '|' || right_sym, " +
            "'|' || left_sym || right_sym)").as("s"))
        .localCheckpoint()
      winner.select(lit(r.toLong).as("merge_round"),
        col("left_sym"), col("right_sym"),
        concat(col("left_sym"), col("right_sym")).as("merged"),
        col("pair_count"))
    }
    (merges.reduce(_.unionByName(_)).orderBy(col("merge_round")), cur)
  }

  /** BPE induction AND the corpus-wide ENCODE it exists for (Sennrich
    * et al. 2016 §2's apply phase — the tokenize-for-training step a
    * pre-training pipeline runs after learning the merges): returns
    * the merge table plus a per-document token-count report under the
    * learned vocabulary, `(doc_id, n_words, n_syms)` — n_syms is the
    * document's encoded token count, all-integer so it hash-matches.
    *
    * Scale shape: the merges were already applied per WORD during
    * training, so encoding is a vocabulary LOOKUP — per-word symbol
    * counts come off the final vocabulary table (vocabulary-sized, not
    * corpus-sized), and the corpus pass is one explode + one hash join
    * on the word + a per-doc aggregate. No per-document replay of the
    * merge replaces anywhere.
    */
  def bpeTrainEncode(documents: DataFrame,
                     nMerges: Int = 4): (DataFrame, DataFrame) = {
    val (merges, vocab) = bpeRounds(documents, nMerges)
    // symbol count = boundary count: one leading '|' per symbol
    val perWord = vocab.select(col("w"),
      (length(col("s")) - length(translate(col("s"), "|", "")))
        .cast("long").as("ns"))
    val encoded = documents
      .select(col("doc_id"), explode(tokens(lower(col("text")))).as("w"))
      .filter(length(col("w")) > 0)
      .join(perWord, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("ns")).as("n_syms"))
    (merges, encoded)
  }

  /** Deterministic train/val/test assignment by content-independent key
    * hash — the reproducible split every training pipeline needs:
    * stable under reshuffling, engine-portable (md5), and extendable
    * (new data lands in the same buckets). 80/10/10 by default.
    */
  def trainValSplit(documents: DataFrame,
                    trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val bucket = tokenHash(col("doc_id").cast("string")) % 100
    documents
      .select(col("doc_id"), col("lang"),
        when(bucket < trainPct, "train")
          .when(bucket < trainPct + valPct, "val")
          .otherwise("test").as("split"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic EPOCH SHUFFLE: the reproducible global permutation
    * a training run reads each epoch, in its scale-correct form —
    * rows shard by an epoch-salted md5 hash and take positions WITHIN
    * their shard (a bounded window per shard), never a global
    * row_number (a single-partition sort at 100 TB). A reader streams
    * shard 0..n, position 0..k — the same total order every rerun,
    * different every epoch, stable under input repartitioning.
    */
  def epochShuffle(documents: DataFrame, epoch: Int,
                   shards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = tokenHash(concat(lit(s"ep$epoch:"), col("doc_id").cast("string")))
    documents.select(col("doc_id"), h.as("h"))
      .withColumn("shard", pmod(col("h"), lit(shards.toLong)))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id")))
        .cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("doc_id"))
  }

  /** Train/test CONTAMINATION detection: for each test-split document,
    * the fraction of its distinct 3-token shingles that also occur in
    * ANY train-split document — the decontamination scan every eval
    * pipeline needs. Shingle sets join on the shingle value (uniform
    * md5-derived shuffle keys); the train side is reduced to DISTINCT
    * shingles before the join, so cost is co-occurrence mass, not
    * |test|×|train|.
    */
  def contaminationScores(documents: DataFrame, w: Int = 3): DataFrame = {
    val withSplit = documents
      .join(trainValSplit(documents).select(col("doc_id"), col("split")),
        Seq("doc_id"))
    def shingles(split: String) = withSplit
      .filter(col("split") === split)
      .repartition(documents.sparkSession.sparkContext.defaultParallelism,
        col("doc_id"))
      .withColumn("tk", tokens(col("text")))
      .select(col("doc_id"), explode(Dedup.shinglesFromTokens(col("tk"), w)).as("s"))
    val trainShingles = shingles("train").select(col("s")).distinct()
      .withColumn("in_train", lit(1L))
    shingles("test")
      .join(trainShingles, Seq("s"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
           count(col("in_train")).as("n_contaminated"))
      .select(col("doc_id"), col("n_shingles"), col("n_contaminated"),
        (col("n_contaminated").cast("double") / col("n_shingles"))
          .as("contamination"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic hash sampling: an exact-rate-in-expectation sample
    * that is reproducible across runs, engines, and partitionings —
    * `TABLESAMPLE`/`df.sample` are seeded per-partition and shift with
    * the split layout, so pipelines that must be re-runnable sample by
    * key hash instead. Composable with the split assignment (same hash
    * family, different modulus).
    */
  def hashSample(documents: DataFrame, pct: Int = 10): DataFrame =
    documents
      .filter(tokenHash(col("doc_id").cast("string")) % 100 < pct)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"),
           min(col("doc_id")).as("first_doc"))
      .orderBy(col("lang"))

  /** TF-IDF-style keyword extraction, log-free: per document the top-k
    * terms ranked by (term frequency desc, document frequency asc,
    * term) — an ALL-INTEGER ordering, so the ranking is bit-identical
    * across engines (ln()-based idf is libm-dependent and is the one
    * piece of classic tf-idf that can't be hash-compared). Two
    * aggregations + one broadcast-ish join on term, then a per-doc
    * ranked window.
    */
  def topTerms(documents: DataFrame, k: Int = 3): DataFrame = {
    val tf = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(df, Seq("term"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** BM25 parameters (Robertson-Walker defaults) and the fixed query
    * set — literal constants interpolated into BOTH the engine plan and
    * the DuckDB oracle (the `sim_mmr` λ device), so even the float
    * scores hash-match.
    */
  val bm25K1 = 1.2
  val bm25B = 0.75
  val bm25Queries: Seq[(Long, String)] = Seq(
    (0L, "spark batch window"),
    (1L, "hash join merge"),
    (2L, "vector scan filter"),
    (3L, "customer order stream"))

  /** BM25 ranked retrieval — the LEXICAL half of the hybrid
    * (BM25 + ANN) retrieval stack every LLM data/eval pipeline runs:
    * query→document scoring over the inverted-index shape
    * ([[topTerms]]'s (doc, term, tf) exchange), per-query top-k via the
    * map-side heap node.
    *
    * score(q, d) = Σ_{t ∈ q∩d} idf(t) · tf·(k1+1) /
    *                            (tf + k1·(1 − b + b·dl/avgdl))
    * with the RATIONAL Robertson–Spärck-Jones idf
    * (N − df + 0.5)/(df + 0.5) — the standard BM25 idf WITHOUT the
    * outer ln: per-term monotone-equivalent, and an exact ratio of
    * integer-plus-half doubles, so scores are bit-identical across
    * engines (ln is the one libm-dependent piece of BM25 — swapping it
    * in changes one line and downgrades the oracle to a rows-only
    * check). The per-(query, doc) term sum folds in sorted term order
    * (collect→sort→fold, ≤|query| structs per buffer), the oracle
    * mirroring it with `list_sum(list(s ORDER BY term))`.
    *
    * Scale shape: ONE corpus tokenize builds the checkpointed
    * (doc, term, tf) inverted index; df and dl are re-aggregations of
    * that materialized frame (plan-audited: no Generate in the serving
    * plan); query terms are a broadcast literal table, so the corpus
    * never joins anything larger than itself; the candidate set is
    * only docs CONTAINING a query term; top-k is the two-phase heap
    * node — the full candidate set never sorts and never shuffles into
    * #queries partitions.
    */
  def bm25TopK(documents: DataFrame, k: Int = 10): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    // per-query DISTINCT terms, expanded driver-side (a literal
    // constant — no explode in the plan)
    val qterms = bm25Queries
      .flatMap { case (id, q) => q.split(" ").distinct.map(t => (id, t)) }
      .toDF("query_id", "term")
    // the (doc, term, tf) inverted-index frame is MATERIALIZED once
    // (localCheckpoint — the engine's trained-artifact device): three
    // consumers read it (match, dl, df), and per-consumer column
    // pruning gives each a *different* tokenize subplan, so exchange
    // reuse cannot deduplicate them — without the checkpoint the
    // corpus pays three full tokenize passes (measured in the static
    // plan: three Generate explodes). Building the inverted index once
    // and serving from it is exactly the production BM25 shape.
    val tf = documents
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        explode(tokens(lower(col("text")))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_dl"))
    val k1p1 = bm25K1 + 1.0
    val oneMinusB = 1.0 - bm25B
    val idf = (col("n_docs").cast("double") - col("df").cast("double")
      + lit(0.5)) / (col("df").cast("double") + lit(0.5))
    val avgdl = col("tot_dl").cast("double") / col("n_docs").cast("double")
    val s = idf * ((col("tf").cast("double") * lit(k1p1)) /
      (col("tf").cast("double") + lit(bm25K1) *
        (lit(oneMinusB) + lit(bm25B) * (col("dl").cast("double") / avgdl))))
    val matched = tf.join(broadcast(qterms), Seq("term"))
      .join(dl, Seq("doc_id"))
      .join(df, Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"), col("term"), s.as("s"))
    val scored = matched.groupBy(col("query_id"), col("doc_id"))
      .agg(aggregate(sort_array(collect_list(struct(col("term"), col("s")))),
        lit(0.0), (acc, x) => acc + x.getField("s")).as("score"))
    val pruned = org.apache.spark.sql.graftbridge.PlanBridge.topKPerKey(
        scored.withColumn("__tie", -col("doc_id")),
        Seq("query_id"), Seq("score", "__tie"), k)
      .drop("__tie")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    pruned.withColumn("rank", row_number().over(w).cast("long"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Bucket count for the stored inverted-index layout: terms hash
    * into a fixed number of directory buckets, so a probe's scan
    * prunes to its query terms' buckets STATICALLY (the term list is
    * known at plan time) — the lexical twin of the ANN tier's
    * cell-partitioned layout.
    */
  val bm25Buckets = 64

  private def termBucket(term: Column): Column =
    pmod(tokenHash(term), lit(bm25Buckets.toLong))

  /** Probe-side freshness = geometry + METADATA-ONLY corpus identity
    * (md5 of the sorted input-file listing — a file-index lookup, not
    * a data scan); the row count is stamped at BUILD time only. See
    * [[graft.ops.Similarity.inputListingFp]] for the rationale: the
    * round-5 marker ran `documents.count()` on every probe, a
    * corpus-wide aggregate on the serving path.
    */
  private def bm25IndexMarkerPrefix(documents: DataFrame): String =
    s"graft-bm25 v5 buckets=$bm25Buckets " +
      s"src=${Similarity.inputListingFp(documents)}"

  /** Driver-side twin of [[termBucket]] for plan-time literal terms
    * (same md5-prefix hash: first 4 digest bytes, big-endian unsigned
    * — non-negative, so `%` == pmod). What turns a literal query's
    * term set into STATIC bucket partition filters.
    */
  private def termBucketDriver(t: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8"))
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    v % bm25Buckets
  }

  private def bm25IndexMarker(documents: DataFrame): String =
    s"${bm25IndexMarkerPrefix(documents)} n=${documents.count()}"

  /** BUILD: persist the BM25 index — the (doc, term, tf) postings and
    * per-term df both partitioned by the term's hash bucket, doc
    * lengths and the one-row corpus stats as plain parquet. Returns
    * the bucket census of the written layout as re-read from storage
    * (what you serve is what you audit; oracle re-derives the same
    * md5 bucketing).
    *
    * v3 layouts also persist `pos/` — POSITIONAL postings
    * (doc, pos, term) in the same term-hash bucket partitioning, the
    * Lucene .pos-file analog that phrase/proximity queries need and
    * bag-of-words scoring doesn't ([[phraseSearchStored]] probes it
    * with the same static bucket filters as the tf scan). The whole
    * v3 index — tf, df, and positions — indexes under ONE analyzer
    * (whitespace + case fold, [[phraseSearch]]'s token stream; the
    * inline [[bm25TopK]] and the oracles fold the same way), and the
    * tf artifact is the per-(doc, term) count of the positional frame
    * so the build tokenizes the corpus exactly once.
    */
  def bm25BuildIndex(documents: DataFrame, base: String): DataFrame =
      IndexFS.withWriterLease(base) {
    val spark = documents.sparkSession
    // an older same-kind layout cannot be served or extended — wipe it
    // and rebuild under the current shape (self-upgrade)
    if (Snapshot.layoutStale(base, "bm25")) IndexFS.wipeLayout(base)
    // ONE corpus tokenize: the positional frame is the superset every
    // other artifact folds from (tf = its per-(doc, term) count)
    val toks = positionalPostings(documents).maintCheckpoint()
    val tf = toks
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .maintCheckpoint()
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      .maintCheckpoint()
    // one snapshot transaction: the five artifacts AND the clearing of
    // maintenance residue from a previous corpus (delta segments,
    // tombstones, resplit staging — served alongside a fresh base they
    // would resurrect stale postings) flip atomically
    IndexFS.mkdirs(base)
    val txn = Snapshot.begin(base)
    txn.writeFull(tf.withColumn("bucket", termBucket(col("term"))),
      "tf", "bucket")
    txn.writeFull(tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .withColumn("bucket", termBucket(col("term"))), "df", "bucket")
    txn.writeFull(toks.withColumn("bucket", termBucket(col("term"))),
      "pos", "bucket")
    txn.writeFull(dl, "dl")
    txn.writeFull(dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("tot_dl")), "stats")
    Seq("tf_delta", "pos_delta", "tombstones", "tf_resplit")
      .foreach(txn.dropComp)
    val snap = txn.commit()
    IndexFS.stampVersion(base, "bm25")
    IndexFS.writeString(s"$base/MARKER", bm25IndexMarker(documents))
    snap.read(spark, "tf")
      .groupBy(col("bucket").cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_postings"),
        count_distinct(col("term")).as("n_terms"))
      .orderBy(col("bucket"))
  }

  /** PROBE against the STORED inverted index: score [[bm25Queries]]
    * from the persisted postings/dl/stats ONLY — the corpus table is
    * never touched, and per-term df derives from the served postings
    * themselves (bucket-complete across the base and every delta
    * segment, so the count is exact even mid-maintenance). The query
    * terms are plan-time literals, so the postings scans carry STATIC
    * `bucket` partition filters (spec-asserted): a probe reads
    * ~|query terms|/buckets of the index bytes. Scoring arithmetic is
    * textually identical to [[bm25TopK]], so the result is
    * oracle-identical to the inline plan (parquet round-trips the
    * integer statistics exactly). Rebuilds lazily iff the marker is
    * stale.
    */
  def bm25ProbeStored(documents: DataFrame, base: String,
                      k: Int = 10): DataFrame = {
    val spark = documents.sparkSession
    ensureBm25Fresh(documents, base)
    bm25ScoreStored(spark, base, k)
  }

  /** Remove `dropIds`' rows from a segmented delta component (LSM
    * segments under `comp/seg=<id>/bucket=<b>/`) in ONE grouped
    * rewrite regardless of how many segments are affected. The
    * affected (seg, bucket) partition list collects first (bounded by
    * segments × buckets — metadata-scale), the surviving rows of
    * exactly those partitions stage as this transaction's generation,
    * and partitions whose rows ALL belonged to dropped docs simply
    * lose their ownership (no physical delete on the scrub path at
    * all — GC reclaims the dead leaves later). Everything lands in
    * the CALLER's transaction, so the scrub commits atomically with
    * whatever maintenance triggered it; a crash anywhere leaves the
    * previous snapshot fully live. `seg` is explicitly cast to
    * string: an all-decimal segId population would otherwise make
    * Spark's partition type inference read the column as integer, and
    * string comparisons against it would silently null out.
    */
  private def scrubSegments(spark: org.apache.spark.sql.SparkSession,
                            snap: Option[Snapshot.Manifest],
                            txn: Snapshot.Txn, comp: String,
                            cols: Seq[String], dropIds: DataFrame,
                            excludeSeg: Option[String] = None): Unit = {
    val delta0 = snap.flatMap(_.readOpt(spark, comp)) match {
      case Some(d) => d.withColumn("seg", col("seg").cast("string"))
        .withColumn("bucket", col("bucket").cast("long"))
      case None => return
    }
    import spark.implicits._
    val delta = excludeSeg match {
      case Some(s) => delta0.filter(col("seg") =!= s)
      case None    => delta0
    }
    val affected = delta.join(dropIds, Seq("doc_id"))
      .select(col("seg"), col("bucket")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    if (affected.isEmpty) return
    val pairs = affected.toDF("seg", "bucket")
    val keep = delta.join(broadcast(pairs), Seq("seg", "bucket"))
      .join(dropIds, Seq("doc_id"), "left_anti")
      .select(("seg" +: cols.filterNot(_ == "seg")).map(col): _*)
      .maintCheckpoint() // feeds the kept-pair census AND the stage write
    val kept = keep.select(col("seg"), col("bucket")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    if (kept.nonEmpty)
      txn.writeParts(keep, comp, Seq("seg", "bucket"),
        kept.toSeq.map { case (s, b) => Seq(s, b.toString) })
    val emptied = affected.filterNot(kept)
    if (emptied.nonEmpty)
      txn.dropParts(comp, emptied.map { case (s, b) => Seq(s, b.toString) })
  }

  /** Lazy-rebuild gate shared by every stored-BM25 probe: freshness =
    * geometry + input-listing fingerprint only — no corpus aggregate
    * on the probe path. Marker I/O goes through [[IndexFS]], so the
    * layout may live on any Hadoop-compatible FS.
    */
  private def ensureBm25Fresh(documents: DataFrame, base: String): Unit =
    if (Snapshot.layoutStale(base, "bm25") ||
        !IndexFS.markerFresh(s"$base/MARKER",
          bm25IndexMarkerPrefix(documents)))
      bm25BuildIndex(documents, base).count()

  /** Score [[bm25Queries]] from a stored layout under `base` — the
    * shared serving core of [[bm25ProbeStored]] and
    * [[bm25AppendProbe]]; touches ONLY the persisted artifacts.
    * (Tombstones are the snapshot component `tombstones`, shared by
    * the BM25 and IVFADC families: live iff at least one delete has
    * not yet been compacted away, read via `readOpt`, cleared by
    * `dropComp` atomically with the compaction that folds them in.)
    */
  private[graft] def bm25ScoreStored(spark: org.apache.spark.sql.SparkSession,
                              base: String, k: Int): DataFrame = {
    import spark.implicits._
    // ONE manifest resolution pins the whole probe — base postings,
    // delta segments, doc lengths, stats, and tombstones are all read
    // as of the same snapshot, so a probe racing maintenance is
    // internally consistent (never base-from-one-generation with
    // stats-from-another)
    val snap = Snapshot.require(base)
    val qterms = bm25Queries
      .flatMap { case (id, q) => q.split(" ").distinct.map(t => (id, t)) }
      .toDF("query_id", "term")
    // the probed buckets, computed driver-side from the literal terms
    val buckets = bm25Queries
      .flatMap(_._2.split(" ")).distinct
      .map(termBucketDriver).distinct.sorted
    val tfBase = snap.read(spark, "tf")
      .filter(col("bucket").isin(buckets: _*))
      .select(col("doc_id"), col("term"), col("tf"))
    // serve base ∪ tf delta segments ([[bm25Append]]'s LSM write): a
    // doc in any delta shadows ALL its base postings (the doc-set
    // anti-join is unfiltered by bucket)
    val tfGen = snap.readOpt(spark, "tf_delta") match {
      case Some(delta) =>
        tfBase.join(delta.select(col("doc_id")).distinct(),
            Seq("doc_id"), "left_anti")
          .unionByName(delta
            .filter(col("bucket").isin(buckets: _*))
            .select(col("doc_id"), col("term"), col("tf")))
      case None => tfBase
    }
    val dl0 = snap.read(spark, "dl")
    val stats0 = snap.read(spark, "stats")
    // tombstone serving: deleted docs are excluded from MATCHING
    // (postings/dl anti-join the tombstone sidecar) and from the
    // corpus stats (adjusted by the tombstoned docs' lengths)
    val (tf, dl, stats) = snap.readOpt(spark, "tombstones") match {
      case Some(tomb) =>
        val removed = dl0.join(broadcast(tomb), Seq("doc_id"))
          .agg(coalesce(count(lit(1)), lit(0L)).as("rm_n"),
            coalesce(sum(col("dl")), lit(0L)).as("rm_dl"))
        (tfGen.join(broadcast(tomb), Seq("doc_id"), "left_anti"),
          dl0.join(broadcast(tomb), Seq("doc_id"), "left_anti"),
          stats0.crossJoin(broadcast(removed))
            .select((col("n_docs") - col("rm_n")).as("n_docs"),
              (col("tot_dl") - col("rm_dl")).as("tot_dl")))
      case None => (tfGen, dl0, stats0)
    }
    // per-term df derives from the SERVED postings themselves: a
    // term's postings are bucket-complete across every generation
    // (base and deltas hash terms identically), so counting the rows
    // already read yields EXACT document frequency — fresher than
    // Lucene's stale-df trade, and free (the df/ artifact on disk is
    // build-time observability for [[bm25Health]], not a serving
    // input)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val k1p1 = bm25K1 + 1.0
    val oneMinusB = 1.0 - bm25B
    val idf = (col("n_docs").cast("double") - col("df").cast("double")
      + lit(0.5)) / (col("df").cast("double") + lit(0.5))
    val avgdl = col("tot_dl").cast("double") / col("n_docs").cast("double")
    val s = idf * ((col("tf").cast("double") * lit(k1p1)) /
      (col("tf").cast("double") + lit(bm25K1) *
        (lit(oneMinusB) + lit(bm25B) * (col("dl").cast("double") / avgdl))))
    val matched = tf.join(broadcast(qterms), Seq("term"))
      .join(dl, Seq("doc_id"))
      .join(df, Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"), col("term"), s.as("s"))
    val scored = matched.groupBy(col("query_id"), col("doc_id"))
      .agg(aggregate(sort_array(collect_list(struct(col("term"), col("s")))),
        lit(0.0), (acc, x) => acc + x.getField("s")).as("score"))
    val pruned = org.apache.spark.sql.graftbridge.PlanBridge.topKPerKey(
        scored.withColumn("__tie", -col("doc_id")),
        Seq("query_id"), Seq("score", "__tie"), k)
      .drop("__tie")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    pruned.withColumn("rank", row_number().over(w).cast("long"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** APPEND a document batch into the stored BM25 layout — the
    * index-MAINTENANCE twin of [[graft.ops.Dedup.incrementalDedup]]:
    * the nightly batch reaches the standing index without a full
    * rebuild. Per affected term-hash bucket (and ONLY those — dynamic
    * partition overwrite leaves every other bucket directory
    * byte-untouched):
    *  - postings: existing rows minus any previous rows of the batch
    *    doc_ids (idempotent re-append), plus the batch postings;
    *  - df: re-aggregated from the merged postings of the affected
    *    buckets (a term's postings all live in one bucket, so the
    *    re-count never needs unaffected buckets);
    *  - dl/stats: same anti-join + union merge, then one re-aggregate.
    * After the merge the layout is EXACTLY the from-scratch index over
    * the unioned corpus (BM25 has no trained artifacts), so a probe
    * equals [[bm25TopK]] over the union — the append contract the
    * registry oracle checks end-to-end.
    */
  def bm25Append(batch: DataFrame, base: String): Unit =
      IndexFS.withWriterLease(base) {
    val spark = batch.sparkSession
    val snap = Snapshot.require(base)
    // ONE batch tokenize: the positional frame feeds the tf fold AND
    // the positional delta segment
    val posB = positionalPostings(batch)
      .withColumn("bucket", termBucket(col("term")))
      .maintCheckpoint()
    val tfB = posB
      .groupBy(col("doc_id"), col("term"), col("bucket"))
      .agg(count(lit(1)).as("tf"))
      .select(col("doc_id"), col("term"), col("tf"), col("bucket"))
      .maintCheckpoint()
    // an empty batch is a no-op
    if (tfB.isEmpty) return
    val batchIds = tfB.select(col("doc_id")).distinct()
    // doc lengths and corpus stats stay merged artifacts: they are
    // doc-count-sized and one-row — the cheap end of the index
    val dlB = tfB.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val mergedDl = snap.read(spark, "dl")
      .join(batchIds, Seq("doc_id"), "left_anti")
      .unionByName(dlB)
      .maintCheckpoint() // feeds the dl write AND the stats fold
    // token-level postings (tf AND positions) append as DELTA SEGMENTS
    // (Lucene segment semantics: write the new postings, never
    // read-modify-rewrite the standing ones — the token-level tables
    // are the index's largest artifacts, and an in-place bucket merge
    // rewrites most of them for any batch whose vocabulary spans the
    // buckets). Segment id = order-insensitive hash of the batch's
    // doc set, so a crash-replayed batch REPLACES its own segments'
    // ownership (exactly-once) while successive distinct batches
    // accumulate side by side. The probes shadow base postings by the
    // union of the delta doc sets; per-term df derives at probe time
    // from the served postings (bucket-complete across generations),
    // so no df merge is needed at all.
    val segId = java.lang.Long.toHexString(
      Option(posB.select(col("doc_id")).distinct()
        .agg(sum(tokenHash(col("doc_id").cast("string"))))
        .head.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L))
    val txn = Snapshot.begin(base)
    txn.writeFull(mergedDl, "dl")
    txn.writeFull(mergedDl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("tot_dl")), "stats")
    // a doc RE-appended in a later batch must not survive in an older
    // segment: scrub it from any other segment that carries it (zero
    // I/O when batches are disjoint — the common ingestion case); the
    // scrub joins THIS transaction, so dl/stats, the scrub, and the
    // new segment all flip atomically
    scrubSegments(spark, Some(snap), txn, "tf_delta",
      Seq("doc_id", "term", "tf", "bucket"), batchIds,
      excludeSeg = Some(segId))
    scrubSegments(spark, Some(snap), txn, "pos_delta",
      Seq("doc_id", "pos", "term", "bucket"), batchIds,
      excludeSeg = Some(segId))
    // a replayed batch reuses its segment id with possibly different
    // text: drop the old segment's ENTIRE claim first (whatever
    // buckets it covered), then claim exactly the buckets this batch
    // wrote — ownership stays equal to physical data, so "the delta
    // is gone" remains readable straight off the manifest
    val segBuckets = tfB.select(col("bucket")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted // bounded by bm25Buckets
    val parts = segBuckets.map(b => Seq(segId, b.toString))
    Seq("tf_delta", "pos_delta").foreach(txn.dropPrefix(_, Seq(segId)))
    txn.writeParts(
      tfB.withColumn("seg", lit(segId))
        .select(col("seg"), col("doc_id"), col("term"), col("tf"),
          col("bucket")),
      "tf_delta", Seq("seg", "bucket"), parts)
    txn.writeParts(
      posB.withColumn("seg", lit(segId))
        .select(col("seg"), col("doc_id"), col("pos"), col("term"),
          col("bucket")),
      "pos_delta", Seq("seg", "bucket"), parts)
    txn.commit()
    ()
  }

  /** Build-on-base → append-batch → probe, end to end: the corpus
    * splits deterministically (doc_id mod 5: four fifths are the
    * standing corpus, one fifth the incoming batch), the base index
    * builds lazily once (its own marker), every run replays the
    * APPEND (idempotent — the measured cost of this registry query IS
    * the maintenance cost), and the probe serves from the merged
    * layout. Result: identical to [[bm25TopK]] over the full corpus.
    */
  def bm25AppendProbe(documents: DataFrame, base: String,
                      k: Int = 10): DataFrame = {
    val spark = documents.sparkSession
    val baseDocs = documents.filter(col("doc_id") % 5 =!= 4)
    val batch = documents.filter(col("doc_id") % 5 === 4)
    val marker = s"$base/MARKER_BASE"
    val expected = bm25IndexMarkerPrefix(documents) + " split=mod5"
    if (Snapshot.layoutStale(base, "bm25") ||
        !IndexFS.markerEquals(marker, expected)) {
      bm25BuildIndex(baseDocs, base).count()
      IndexFS.writeString(marker, expected)
    }
    bm25Append(batch, base)
    bm25ScoreStored(spark, base, k)
  }

  /** Hybrid retrieval: reciprocal-rank fusion (Cormack et al. 2009 —
    * the score-free fusion production hybrid search defaults to) of
    * the LEXICAL arm ([[bm25TopK]]'s ranking) and a SEMANTIC arm
    * (cosine ranking over md5-stub document/query embeddings — the
    * same declared encoder stand-in as `mm_embed`; a real encoder
    * changes only the embedding projection, the fusion is untouched).
    * rrf(d) = Σ_arms 1/(kRrf + rank_arm(d)), absent docs contribute 0.
    *
    * Scale shape: each arm prunes to its own top-nCand through the
    * heap node before fusion, so the full-outer rank join touches
    * ≤ 2·nCand·queries rows regardless of corpus size; query vectors
    * ride a broadcast literal table; all score arithmetic is exact
    * IEEE division of integer ranks, so the fused scores hash-match.
    */
  /** Index HEALTH for a stored BM25 layout — per-bucket postings and
    * term counts with exact integer share (basis points) and a hot
    * flag (`> 2× the mean bucket`, exact integer compare). Buckets
    * are md5-hash-assigned so they start near-uniform, but appends
    * ([[bm25Append]]) shift mass with the incoming vocabulary; a
    * bucket hot enough to dominate probe I/O is the "rewrite the
    * layout at a finer bucket count" signal. Reads ONLY the postings
    * and df artifacts; the aggregation is bm25Buckets rows.
    */
  def bm25Health(documents: DataFrame, base: String): DataFrame = {
    val spark = documents.sparkSession
    ensureBm25Fresh(documents, base)
    val snap = Snapshot.require(base)
    val perBucket = snap.read(spark, "tf")
      .groupBy(col("bucket").cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_postings"))
    val terms = snap.read(spark, "df")
      .groupBy(col("bucket").cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_terms"))
    val total = snap.read(spark, "tf")
      .agg(count(lit(1)).as("n_total"))
    perBucket.join(terms, Seq("bucket")).join(broadcast(total))
      .select(col("bucket"), col("n_postings"), col("n_terms"),
        expr("n_postings * 10000 div n_total").as("share_bp"),
        (col("n_postings") * lit(bm25Buckets.toLong) >
          col("n_total") * lit(2L)).as("is_hot"))
      .orderBy(col("bucket"))
  }

  /** Hot-bucket RESPLIT for the stored BM25 layout — the maintenance
    * ACTION [[bm25Health]]'s hot flag calls for: every bucket holding
    * more than (hotFactorPct/100)× the mean postings mass splits in
    * two by the NEXT md5 bit of the term hash (`(hash div 64) mod 2`),
    * sub-bucket 1 landing at `bucket + bm25Buckets`. Because the
    * split key is a pure function of the term — the same md5 prefix
    * the bucket itself comes from — a probe over the resplit layout
    * still computes its partition filters STATICALLY at plan time
    * (query terms are literals), so the serving property that makes
    * the bucket layout cheap survives the split unchanged. Split
    * rows stage into `tf_resplit` via dynamic partition overwrite of
    * only the hot buckets' directories (idempotent); the report is
    * the per-new-bucket postings/term mass after.
    */
  def bm25Resplit(documents: DataFrame, base: String,
                  hotFactorPct: Int = 110): DataFrame =
      IndexFS.withWriterLease(base) {
    val spark = documents.sparkSession
    ensureBm25Fresh(documents, base)
    val tf = Snapshot.require(base).read(spark, "tf")
      .select(col("doc_id"), col("term"), col("tf"),
        col("bucket").cast("long").as("bucket"))
      .maintCheckpoint() // one read feeds counts and the split
    val counts = tf.groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    val total = tf.agg(count(lit(1)).as("n_total"))
    val hot = counts.join(broadcast(total))
      .filter(col("n") * lit(bm25Buckets.toLong) * lit(100L) >
        col("n_total") * lit(hotFactorPct.toLong))
      .select(col("bucket"), lit(true).as("is_hot"))
    val sub = pmod(expr(s"h div $bm25Buckets"), lit(2L))
    val split = tf
      .join(broadcast(hot), Seq("bucket"), "left")
      .withColumn("h", tokenHash(col("term")))
      .withColumn("new_bucket",
        when(col("is_hot").isNull, col("bucket"))
          .otherwise(col("bucket") + lit(bm25Buckets.toLong) * sub))
      .maintCheckpoint() // feeds the staging write AND the report
    val splitRows = split.filter(col("is_hot").isNotNull)
      .select(col("doc_id"), col("term"), col("tf"),
        col("new_bucket").as("bucket"))
    // the staged split buckets' ids — ≤ 2·bm25Buckets values, so the
    // collect is metadata-size
    val splitBuckets = splitRows.select(col("bucket")).distinct()
      .collect().map(r => Seq(r.getLong(0).toString)).toSeq
    if (splitBuckets.nonEmpty) {
      val txn = Snapshot.begin(base)
      txn.writeParts(splitRows, "tf_resplit", Seq("bucket"), splitBuckets)
      txn.commit()
    }
    split.groupBy(col("new_bucket"))
      .agg(min(col("bucket")).as("parent_bucket"),
        count(lit(1)).as("n_postings"),
        countDistinct(col("term")).as("n_terms"))
      .select(col("new_bucket"), col("parent_bucket"), col("n_postings"),
        col("n_terms"), (col("new_bucket") >= bm25Buckets).as("is_split_half"))
      .orderBy(col("new_bucket"))
  }

  /** DELETE documents from the stored BM25 layout — tombstoned: the
    * doc_ids merge into a tombstone sidecar (distinct, so replays are
    * no-ops) and serving excludes them immediately via anti-join
    * ([[bm25ScoreStored]]); the layout itself is untouched until
    * [[bm25Compact]]. This is the production split: a delete must be
    * cheap NOW (no way to locate a doc's postings without a scan),
    * exactness of df is restored by the next compaction.
    */
  def bm25Delete(deletedIds: DataFrame, base: String): Unit =
      IndexFS.withWriterLease(base) {
    val spark = deletedIds.sparkSession
    val snap = Snapshot.require(base)
    val merged = (snap.readOpt(spark, "tombstones") match {
        case Some(t) => t.unionByName(deletedIds.select(col("doc_id")))
        case None    => deletedIds.select(col("doc_id"))
      }).distinct()
    val txn = Snapshot.begin(base)
    txn.writeFull(merged, "tombstones")
    txn.commit()
    ()
  }

  /** COMPACT the tombstones into the stored BM25 layout: one
    * column-pruned pass over the postings finds the AFFECTED buckets
    * (only buckets holding a tombstoned doc's terms), those buckets'
    * postings are rewritten minus the tombstoned rows and their df
    * re-derived (dynamic partition overwrite — every other bucket
    * directory stays byte-untouched), dl/stats refresh, and the
    * sidecar clears. After compaction the layout IS the from-scratch
    * index over the surviving corpus — the exactness contract the
    * registry oracle checks end-to-end.
    */
  def bm25Compact(spark: org.apache.spark.sql.SparkSession,
                  base: String): Unit = IndexFS.withWriterLease(base) {
    val snap = Snapshot.require(base)
    val tomb = snap.readOpt(spark, "tombstones") match {
      case Some(t) => t.maintCheckpoint() // feeds every rewrite below
      case None    => return
    }
    // the bucket rewrites, the dl/stats refresh, the delta scrubs, and
    // the tombstone clear all flip in ONE manifest publish: a probe
    // racing the compaction serves either the tombstoned layout or the
    // fully compacted one — no window where the sidecar is gone while
    // stale postings still serve
    val txn = Snapshot.begin(base)
    val tfAll = snap.read(spark, "tf")
    val affected = tfAll.join(broadcast(tomb), Seq("doc_id"))
      .select(col("bucket").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    if (affected.nonEmpty) {
      val tfAff = tfAll.filter(col("bucket").isin(affected: _*))
        .join(broadcast(tomb), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("term"), col("tf"),
          col("bucket").cast("long").as("bucket"))
        .maintCheckpoint() // feeds the tf stage AND the df re-derive
      val parts = affected.map(b => Seq(b.toString))
      txn.writeParts(tfAff, "tf", Seq("bucket"), parts)
      txn.writeParts(
        tfAff.groupBy(col("term")).agg(count(lit(1)).as("df"))
          .withColumn("bucket", termBucket(col("term"))),
        "df", Seq("bucket"), parts)
      val posAll = snap.read(spark, "pos")
      val posAffected = posAll.join(broadcast(tomb), Seq("doc_id"))
        .select(col("bucket").cast("long")).distinct()
        .collect().map(_.getLong(0)).toSeq.sorted
      if (posAffected.nonEmpty) {
        val posAff = posAll.filter(col("bucket").isin(posAffected: _*))
          .join(broadcast(tomb), Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("pos"), col("term"),
            col("bucket").cast("long").as("bucket"))
        txn.writeParts(posAff, "pos", Seq("bucket"),
          posAffected.map(b => Seq(b.toString)))
      }
    }
    // Everything below runs whether or not any BASE bucket was hit: a
    // doc appended after the build lives ONLY in delta segments and dl,
    // so gating it on base-postings membership would resurrect the doc
    // the moment the sidecar clears (found by the total-wipe spec).
    // doc lengths and corpus stats drop the tombstoned docs…
    val dl = snap.read(spark, "dl")
      .join(broadcast(tomb), Seq("doc_id"), "left_anti")
      .maintCheckpoint() // feeds the dl write AND the stats fold
    txn.writeFull(dl, "dl")
    txn.writeFull(dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("tot_dl")), "stats")
    // …and the delta segments (tf and positions) drop theirs; only
    // (seg, bucket) partitions actually carrying a tombstoned doc
    // rewrite, and an emptied-out partition just loses its ownership
    scrubSegments(spark, Some(snap), txn, "tf_delta",
      Seq("doc_id", "term", "tf", "bucket"), tomb)
    scrubSegments(spark, Some(snap), txn, "pos_delta",
      Seq("doc_id", "pos", "term", "bucket"), tomb)
    txn.dropComp("tombstones")
    txn.commit()
    ()
  }

  /** Build-on-full → tombstone-delete → compact → probe, end to end:
    * every seventh document (doc_id mod 7 = 3) is deleted from the
    * standing index; after compaction the probe is exactly the inline
    * BM25 ranking over the surviving corpus (the oracle computes that
    * directly). The tombstone-serving half (correct matching, stale
    * df, no rewrite) is spec-proven.
    */
  def bm25DeleteProbe(documents: DataFrame, base: String,
                      k: Int = 10): DataFrame = {
    val spark = documents.sparkSession
    val marker = s"$base/MARKER_BASE"
    val expected = bm25IndexMarkerPrefix(documents) + " delete=mod7"
    if (Snapshot.layoutStale(base, "bm25") ||
        !IndexFS.markerEquals(marker, expected)) {
      bm25BuildIndex(documents, base).count()
      IndexFS.writeString(marker, expected)
    }
    bm25Delete(documents.filter(col("doc_id") % 7 === 3)
      .select(col("doc_id")), base)
    bm25Compact(spark, base)
    bm25ScoreStored(spark, base, k)
  }

  /** md5-stub embedding: one hex pair per dimension, exact /255 — the
    * same declared encoder stand-in as `mm_embed`; a real encoder
    * changes only this projection.
    */
  private[ops] def stubVec(c: Column): Column =
    array((0 until 8).map(i =>
      conv(substring(md5(c), i * 2 + 1, 2), 16, 10).cast("double")
        / lit(255.0)): _*)

  def hybridRrf(documents: DataFrame, k: Int = 10, nCand: Int = 20,
                kRrf: Int = 60): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val parallelism = spark.sparkContext.defaultParallelism
    val lex = bm25TopK(documents, nCand)
      .select(col("query_id"), col("doc_id"), col("rank").as("r_lex"))
    val qv = bm25Queries.toDF("query_id", "qtext")
      .select(col("query_id"), stubVec(col("qtext")).as("qv"))
    val dv = documents
      .repartition(parallelism, col("doc_id"))
      .select(col("doc_id"), stubVec(col("text")).as("v"))
    val scored = dv.join(broadcast(qv))
      .select(col("query_id"), col("doc_id"),
        Similarity.cosine(col("qv"), col("v")).as("cs"))
    val semPruned = org.apache.spark.sql.graftbridge.PlanBridge.topKPerKey(
        scored.withColumn("__tie", -col("doc_id")),
        Seq("query_id"), Seq("cs", "__tie"), nCand)
      .drop("__tie")
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cs").desc, col("doc_id"))
    val sem = semPruned
      .withColumn("r_sem", row_number().over(ws).cast("long"))
      .select(col("query_id"), col("doc_id"), col("r_sem"))
    val fused = lex.join(sem, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (coalesce(lit(1.0) / (lit(kRrf.toLong) + col("r_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf.toLong) + col("r_sem")), lit(0.0)))
          .as("rrf"))
    val pruned = org.apache.spark.sql.graftbridge.PlanBridge.topKPerKey(
        fused.withColumn("__tie", -col("doc_id")),
        Seq("query_id"), Seq("rrf", "__tie"), k)
      .drop("__tie")
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("rrf").desc, col("doc_id"))
    pruned.withColumn("rank", row_number().over(wr).cast("long"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Hybrid retrieval over the STANDING indexes — the production form
    * of [[hybridRrf]]: the lexical arm scores from the persisted BM25
    * bucket layout (static bucket partition pruning, no corpus
    * tokenize — [[bm25ProbeStored]]'s serving path verbatim) and the
    * semantic arm probes a persisted IVF-flat index over the md5-stub
    * document embeddings (query ranks the nlist stored centroids,
    * reads ONLY its nprobe cell directories via dynamic partition
    * pruning, exact cosine within). Neither arm touches the corpus
    * table at probe time — at 100 TB that is the difference between
    * this and [[hybridRrf]]'s brute-force semantic arm, and the
    * rankings differ from it exactly where IVF recall differs from
    * exact search (the oracle re-derives the probed-cells ranking,
    * not the brute-force one). Both indexes build lazily once
    * (markers); fusion is the same exact-integer-rank RRF.
    */
  def hybridStored(documents: DataFrame, bm25Base: String, annBase: String,
                   k: Int = 10, nCand: Int = 20, kRrf: Int = 60,
                   nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    // lexical arm from the stored inverted index (lazy build + marker)
    val lex = bm25ProbeStored(documents, bm25Base, nCand)
      .select(col("query_id"), col("doc_id"), col("rank").as("r_lex"))
    // semantic arm: lazy-build the IVF-flat stub-embedding index
    val marker = s"$annBase/MARKER"
    val expected = s"graft-hybrid-ann v2 nlist=$nlist " +
      s"src=${graft.ops.Similarity.inputListingFp(documents)}"
    if (!IndexFS.markerEquals(marker, expected))
      IndexFS.withWriterLease(annBase) {
        if (Snapshot.layoutStale(annBase, "ann"))
          IndexFS.wipeLayout(annBase)
        val dv = documents
          .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id").as("vec_id"), stubVec(col("text")).as("embedding"))
        val centroids = Similarity.kmeansCentroids(dv, nlist).localCheckpoint()
        IndexFS.mkdirs(annBase)
        val txn = Snapshot.begin(annBase)
        txn.writeFull(Similarity.assignCells(dv, centroids),
          "cells", "cell")
        txn.writeFull(centroids, "centroids")
        txn.commit()
        IndexFS.stampVersion(annBase, "ann")
        IndexFS.writeString(marker, expected)
      }
    val annSnap = Snapshot.require(annBase)
    // probe: queries are literal strings — zero corpus reads
    val qv = bm25Queries.toDF("query_id", "qtext")
      .select(col("query_id"), stubVec(col("qtext")).as("qv"))
    val cent = annSnap.read(spark, "centroids")
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cs").desc, col("centroid_id"))
    val probeCells = qv.join(broadcast(cent))
      .select(col("query_id"), col("qv"), col("centroid_id"),
        Similarity.cosine(col("qv"), col("ce")).as("cs"))
      .withColumn("rn", row_number().over(pw))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("centroid_id").as("cell"))
      .localCheckpoint() // feeds the cell census AND the scoring join
    // static probed-cell IN-list (≤ nlist values, collected from the
    // literal queries' ranking) — deterministic partition pruning,
    // same contract as the IVFADC serving core
    val probedCellVals = probeCells.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    val cells = annSnap.read(spark, "cells")
      .filter(col("cell").isin(probedCellVals: _*))
      .select(col("vec_id").as("doc_id"), col("embedding"),
        col("cell").cast("long").as("cell"))
    val scored = cells.join(broadcast(probeCells), Seq("cell"))
      .select(col("query_id"), col("doc_id"),
        Similarity.cosine(col("qv"), col("embedding")).as("cs"))
    val semPruned = org.apache.spark.sql.graftbridge.PlanBridge.topKPerKey(
        scored.withColumn("__tie", -col("doc_id")),
        Seq("query_id"), Seq("cs", "__tie"), nCand)
      .drop("__tie")
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cs").desc, col("doc_id"))
    val sem = semPruned
      .withColumn("r_sem", row_number().over(ws).cast("long"))
      .select(col("query_id"), col("doc_id"), col("r_sem"))
    val fused = lex.join(sem, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (coalesce(lit(1.0) / (lit(kRrf.toLong) + col("r_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf.toLong) + col("r_sem")), lit(0.0)))
          .as("rrf"))
    val pruned = org.apache.spark.sql.graftbridge.PlanBridge.topKPerKey(
        fused.withColumn("__tie", -col("doc_id")),
        Seq("query_id"), Seq("rrf", "__tie"), k)
      .drop("__tie")
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("rrf").desc, col("doc_id"))
    pruned.withColumn("rank", row_number().over(wr).cast("long"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Bigram language-model estimation: conditional probability
    * P(w2 | w1) = count(w1 w2) / count(w1) — the statistic behind
    * n-gram LMs and contamination detectors. All counts are integers;
    * the single final division is an exact-integer-ratio double, so
    * probabilities hash-match across engines. Top-k by an all-integer
    * ordering keeps the limit boundary deterministic.
    */
  def bigramLm(documents: DataFrame, k: Int = 20): DataFrame = {
    val toks = col("tk")
    val pairs = when(size(toks) > 1,
        transform(sequence(lit(1), size(toks) - 1),
          i => struct(element_at(toks, i).as("w1"),
            element_at(toks, i + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    val base = documents
      .repartition(documents.sparkSession.sparkContext.defaultParallelism,
        col("doc_id"))
      .withColumn("tk", tokens(lower(col("text"))))
    val bi = base.select(explode(pairs).as("p"))
      .select(col("p.w1"), col("p.w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_pair"))
    val uni = base.select(explode(toks).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("n_w1"))
    bi.join(uni, Seq("w1"))
      .select(col("w1"), col("w2"), col("n_pair"), col("n_w1"),
        (col("n_pair").cast("double") / col("n_w1")).as("cond_p"))
      .orderBy(col("n_pair").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Per-document LM predictability under the corpus bigram LM — the
    * CCNet-style quality signal (Wenzek et al. 2020 filter corpora by
    * LM perplexity; a document the corpus LM predicts too well is
    * boilerplate, one it can't predict at all is noise): the mean
    * conditional probability P(w_{i+1} | w_i) over a document's
    * adjacent token pairs, with the LM estimated from the WHOLE
    * corpus ([[bigramLm]]'s aggregations, untruncated). The real
    * CCNet statistic is mean negative log prob; ln is libm-dependent
    * (the one engine-unportable piece) and the filter's RANKING is
    * monotone in either, so the engine keeps the exact-ratio mean —
    * the same log-free device as [[topTerms]] and [[bm25TopK]].
    *
    * Scale shape: the positional pair frame is materialized once
    * (three consumers — pair counts, unigram counts, the score
    * join-back; the [[bm25TopK]] checkpoint device), the LM tables
    * join back on their own hash keys, and the per-doc mean folds in
    * position order with ≤ doc-length structs per buffer. Docs with
    * fewer than 2 tokens score 0 over 0 pairs.
    */
  def lmQuality(documents: DataFrame): DataFrame = {
    val base = bigramPairs(documents).localCheckpoint()
    val bi = base.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_pair"))
    val uni = base.groupBy(col("w1")).agg(count(lit(1)).as("n_w1"))
    val scored = base.join(bi, Seq("w1", "w2")).join(uni, Seq("w1"))
      .select(col("doc_id"), col("pos"),
        (col("n_pair").cast("double") / col("n_w1").cast("double")).as("p"))
    val perDoc = scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pairs"),
        (aggregate(sort_array(collect_list(struct(col("pos"), col("p")))),
          lit(0.0), (acc, x) => acc + x.getField("p")) / count(lit(1)))
          .as("mean_p"))
    documents.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("mean_p"), lit(0.0)).as("mean_p"))
      .orderBy(col("doc_id"))
  }

  /** The (doc_id, pos, w1, w2) adjacent-token-pair frame of a corpus
    * under the whitespace + case-fold analyzer — the shared front end
    * of the inline ([[lmQuality]]) and stored
    * ([[lmBuildIndex]]/[[lmScoreStored]]) bigram-LM paths. One array
    * transform per row, exploded; callers checkpoint when they fan
    * out multiple consumers.
    */
  private def bigramPairs(documents: DataFrame): DataFrame = {
    val pairs = when(size(col("tk")) > 1,
        transform(sequence(lit(1), size(col("tk")) - 1),
          i => struct(i.cast("long").as("pos"),
            element_at(col("tk"), i).as("w1"),
            element_at(col("tk"), i + 1).as("w2"))))
      .otherwise(array().cast("array<struct<pos:bigint,w1:string,w2:string>>"))
    documents
      .repartition(documents.sparkSession.sparkContext.defaultParallelism,
        col("doc_id"))
      .withColumn("tk", tokens(lower(col("text"))))
      .select(col("doc_id"), explode(pairs).as("p"))
      .select(col("doc_id"), col("p.pos"), col("p.w1"), col("p.w2"))
  }

  /** The REFERENCE corpus the stored quality LM trains on: the
    * deterministic even-doc_id half. The CCNet pipeline (Wenzek et
    * al. 2020) trains its scoring LM on a curated reference
    * (Wikipedia) and applies it to the raw crawl; the fixture
    * stand-in for "curated subset" is a key-parity split so both
    * engines derive it exactly.
    */
  private def lmReference(documents: DataFrame): DataFrame =
    documents.filter(col("doc_id") % 2 === 0)

  /** Probe-side freshness for the stored LM = layout version +
    * METADATA-ONLY corpus identity (md5 of the sorted input-file
    * listing); the row count is stamped at BUILD time only — same
    * contract as [[bm25IndexMarkerPrefix]].
    */
  private def lmIndexMarkerPrefix(documents: DataFrame): String =
    s"graft-lm v2 buckets=$bm25Buckets " +
      s"src=${Similarity.inputListingFp(documents)}"

  private def lmIndexMarker(documents: DataFrame): String =
    s"${lmIndexMarkerPrefix(documents)} n=${documents.count()}"

  /** BUILD the stored quality LM: estimate the reference bigram model
    * ([[lmReference]]'s half of the corpus) ONCE and persist its two
    * count tables — (w1, w2, n_pair) and (w1, n_w1) — partitioned by
    * the w1 term-hash bucket (the BM25 layout convention, so the LM
    * artifacts get the same per-bucket maintenance story). This is
    * the CCNet production shape: training is a once-per-reference
    * cost; scoring batches ([[lmScoreStored]]) join the standing
    * tables and never re-aggregate the reference. Returns the bucket
    * census of the written layout as re-read from storage.
    */
  def lmBuildIndex(documents: DataFrame, base: String): DataFrame =
      IndexFS.withWriterLease(base) {
    val spark = documents.sparkSession
    // an older same-kind layout cannot be served or extended — wipe it
    // and rebuild under the current shape (self-upgrade)
    if (Snapshot.layoutStale(base, "lm")) IndexFS.wipeLayout(base)
    // one reference tokenize: both count tables fold from this frame
    val pr = bigramPairs(lmReference(documents)).maintCheckpoint()
    // one snapshot transaction: the count tables, the reference doc
    // set, AND the clearing of maintenance residue from a previous
    // reference (count deltas and removal records — summed into a new
    // base they would skew every probability, and a stale docs_delta
    // would silently block valid appends) flip atomically
    IndexFS.mkdirs(base)
    val txn = Snapshot.begin(base)
    txn.writeFull(
      pr.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_pair"))
        .withColumn("bucket", termBucket(col("w1"))), "bi", "bucket")
    txn.writeFull(
      pr.groupBy(col("w1")).agg(count(lit(1)).as("n_w1"))
        .withColumn("bucket", termBucket(col("w1"))), "uni", "bucket")
    // the reference doc set, recorded so [[lmAppend]] can keep its
    // generations disjoint (a re-appended doc must not double-count)
    txn.writeFull(lmReference(documents).select(col("doc_id")), "docs")
    Seq("bi_delta", "uni_delta", "docs_delta", "docs_removed")
      .foreach(txn.dropComp)
    val snap = txn.commit()
    IndexFS.stampVersion(base, "lm")
    IndexFS.writeString(s"$base/MARKER", lmIndexMarker(documents))
    val bi = snap.read(spark, "bi")
    val uni = snap.read(spark, "uni")
    bi.groupBy(col("bucket").cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("n_pair")).as("n_pairs"))
      .join(uni.groupBy(col("bucket").cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_unigrams")), Seq("bucket"))
      .orderBy(col("bucket"))
  }

  /** SCORE the corpus against the STANDING quality LM: per-document
    * mean conditional probability P(w_{i+1} | w_i) under the
    * reference model read from the persisted count tables — the
    * reference half is never re-aggregated at scoring time (that is
    * the amortization [[lmBuildIndex]] pays for). Pairs the model has
    * never seen score 0 (the raw-crawl-noise signal CCNet filters
    * on); the per-doc fold is the [[lmQuality]] exact-ratio device,
    * position-ordered so the float sum is engine-reproducible.
    * Rebuilds lazily iff the marker is stale (metadata-only check).
    *
    * Unlike the BM25 probes there is no bucket pruning claim here:
    * scoring touches the whole vocabulary by nature — the win is
    * compute (no reference aggregation per batch), not I/O.
    */
  def lmScoreStored(documents: DataFrame, base: String): DataFrame = {
    val spark = documents.sparkSession
    if (Snapshot.layoutStale(base, "lm") ||
        !IndexFS.markerFresh(s"$base/MARKER",
          lmIndexMarkerPrefix(documents)))
      lmBuildIndex(documents, base).count()
    val pr = bigramPairs(documents)
    val (bi, uni) = lmModel(spark, Snapshot.require(base))
    val scored = pr.join(bi, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("n_pair").cast("double") / col("n_w1").cast("double"),
          lit(0.0)).as("p"))
    val perDoc = scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pairs"),
        (aggregate(sort_array(collect_list(struct(col("pos"), col("p")))),
          lit(0.0), (acc, x) => acc + x.getField("p")) / count(lit(1)))
          .as("mean_p"))
    documents.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("mean_p"), lit(0.0)).as("mean_p"))
      .orderBy(col("doc_id"))
  }

  /** Serve the stored LM's count tables: base ∪ any append delta
    * segments, summed per key — counts are ADDITIVE, so the merged
    * model equals one trained from scratch on the union of the
    * reference generations ([[lmAppend]] keeps them doc-disjoint).
    * With no deltas the base tables serve as-is (no aggregation in
    * the plan).
    */
  private def lmModel(spark: org.apache.spark.sql.SparkSession,
                      snap: Snapshot.Manifest): (DataFrame, DataFrame) = {
    def serve(part: String, keys: Seq[String], cnt: String): DataFrame = {
      val b0 = snap.read(spark, part)
        .select((keys :+ cnt).map(col): _*)
      snap.readOpt(spark, s"${part}_delta") match {
        case None => b0
        case Some(delta) =>
          b0.unionByName(delta.select((keys :+ cnt).map(col): _*))
            .groupBy(keys.map(col): _*).agg(sum(col(cnt)).as(cnt))
            // net-zero keys (a [[lmDelete]] cancelled every occurrence)
            // must DROP, not serve a 0: a 0-count unigram would put
            // 0.0/0.0 = NaN into the scores where the from-scratch model
            // has a left-join miss (exact 0.0)
            .filter(col(cnt) =!= 0L)
      }
    }
    (serve("bi", Seq("w1", "w2"), "n_pair"),
      serve("uni", Seq("w1"), "n_w1"))
  }

  /** APPEND to the stored LM: extend the reference corpus. Only
    * documents never seen in any generation count (anti-join the
    * recorded reference doc sets); their bigram/unigram counts land
    * as a delta segment keyed by the order-insensitive hash of the
    * new-doc set — a crash-replayed batch overwrites its OWN segment
    * (the [[bm25Append]] device), and serving sums counts per key
    * across generations, so the merged model is exactly the
    * from-scratch model over the unioned reference.
    */
  /** Every doc id ever recorded in any generation — including removed
    * ones: a deleted id is BURNED (the count algebra can't tell one
    * re-entry from a replay, so re-ingestion happens under a new id —
    * the tombstone-system convention).
    */
  private def lmEverSeen(spark: org.apache.spark.sql.SparkSession,
                         snap: Snapshot.Manifest): DataFrame = {
    var d = snap.read(spark, "docs").select(col("doc_id"))
    snap.readOpt(spark, "docs_delta").foreach(x =>
      d = d.unionByName(x.select(col("doc_id"))))
    snap.readOpt(spark, "docs_removed").foreach(x =>
      d = d.unionByName(x.select(col("doc_id"))))
    d
  }

  /** The doc ids whose counts are currently IN the served model:
    * recorded generations minus removals.
    */
  private def lmServedDocs(spark: org.apache.spark.sql.SparkSession,
                           snap: Snapshot.Manifest): DataFrame = {
    var d = snap.read(spark, "docs").select(col("doc_id"))
    snap.readOpt(spark, "docs_delta").foreach(x =>
      d = d.unionByName(x.select(col("doc_id"))))
    snap.readOpt(spark, "docs_removed").foreach(x =>
      d = d.join(x.select(col("doc_id")), Seq("doc_id"), "left_anti"))
    d
  }

  def lmAppend(batch: DataFrame, base: String): Unit =
      IndexFS.withWriterLease(base) {
    val spark = batch.sparkSession
    val snap = Snapshot.require(base)
    val fresh = batch.join(lmEverSeen(spark, snap), Seq("doc_id"),
        "left_anti")
      .maintCheckpoint()
    if (!fresh.isEmpty) {
      val segId = java.lang.Long.toHexString(
        Option(fresh.select(col("doc_id")).distinct()
          .agg(sum(tokenHash(col("doc_id").cast("string"))))
          .head.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L))
      val pr = bigramPairs(fresh).maintCheckpoint()
      // the three delta segments flip in ONE manifest publish — no
      // window where the counts serve without the doc-set record (the
      // old write order existed only to keep a crash replayable)
      lmWriteSegment(pr, fresh, segId, negate = false,
        docsComp = "docs_delta", base = base)
    }
  }

  /** Stage one LM delta segment (bigram + unigram counts and its doc
    * set) and publish it atomically — shared by [[lmAppend]] (positive
    * counts into `docs_delta`) and [[lmDelete]] (negated counts into
    * `docs_removed`).
    */
  private def lmWriteSegment(pr: DataFrame, docs: DataFrame, segId: String,
                             negate: Boolean, docsComp: String,
                             base: String): Unit = {
    val cnt = if (negate) -count(lit(1)) else count(lit(1))
    val bi = pr.groupBy(col("w1"), col("w2")).agg(cnt.as("n_pair"))
      .withColumn("bucket", termBucket(col("w1")))
      .withColumn("seg", lit(segId))
      .select(col("seg"), col("w1"), col("w2"), col("n_pair"), col("bucket"))
      .maintCheckpoint() // feeds the bucket census AND the stage write
    // drop the segment's old claim first (replays supersede), then
    // claim exactly the written buckets — ownership == physical data
    val segBuckets = bi.select(col("bucket")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted // bounded by bm25Buckets
    val parts = segBuckets.map(b => Seq(segId, b.toString))
    val txn = Snapshot.begin(base)
    Seq("bi_delta", "uni_delta").foreach(txn.dropPrefix(_, Seq(segId)))
    if (parts.nonEmpty) { // all-single-token docs carry no bigrams
      txn.writeParts(bi, "bi_delta", Seq("seg", "bucket"), parts)
      txn.writeParts(
        pr.groupBy(col("w1")).agg(cnt.as("n_w1"))
          .withColumn("bucket", termBucket(col("w1")))
          .withColumn("seg", lit(segId))
          .select(col("seg"), col("w1"), col("n_w1"), col("bucket")),
        "uni_delta", Seq("seg", "bucket"), parts)
    }
    txn.writeParts(
      docs.select(col("doc_id")).withColumn("seg", lit(segId)),
      docsComp, Seq("seg"), Seq(Seq(segId)))
    txn.commit()
    ()
  }

  /** Registry probe for the LM append pair: base model trained on the
    * even-doc_id reference (once, lazily), a doc_id % 4 == 1 batch
    * appended (idempotent re-merge each run — the nightly
    * reference-refresh shape), the whole corpus scored from the
    * MERGED model. Oracle-equal to a from-scratch model over the
    * unioned reference.
    */
  def lmAppendProbe(documents: DataFrame, base: String): DataFrame = {
    val marker = s"$base/MARKER_BASE"
    val expected = lmIndexMarkerPrefix(documents) + " split=even"
    if (Snapshot.layoutStale(base, "lm") ||
        !IndexFS.markerEquals(marker, expected)) {
      lmBuildIndex(documents, base).count()
      IndexFS.writeString(marker, expected)
    }
    lmAppend(documents.filter(col("doc_id") % 4 === 1), base)
    lmScoreStored(documents, base)
  }

  /** DELETE from the stored LM: remove reference documents by
    * SUBTRACTION — the model's count tables are additive, so a delta
    * segment carrying the victims' pair/unigram counts NEGATED serves
    * exact removal with no rebuild (net-zero keys drop at serve time,
    * [[lmModel]]). Only documents currently IN the model subtract
    * (idempotent: a replayed delete finds its victims already
    * removed); the victims' ids are recorded so the removal is
    * tracked and a removed id never re-enters. Write order (counts
    * first, the removal record last) keeps a mid-crash replay exact:
    * the recomputed victim set and segment id are identical, so the
    * replay overwrites its own partial segment.
    */
  def lmDelete(victims: DataFrame, base: String): Unit =
      IndexFS.withWriterLease(base) {
    val spark = victims.sparkSession
    val snap = Snapshot.require(base)
    val targets = victims
      .join(lmServedDocs(spark, snap), Seq("doc_id"), "left_semi")
      .maintCheckpoint()
    if (!targets.isEmpty) {
      val segId = "del" + java.lang.Long.toHexString(
        Option(targets.select(col("doc_id")).distinct()
          .agg(sum(tokenHash(col("doc_id").cast("string"))))
          .head.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L))
      val pr = bigramPairs(targets).maintCheckpoint()
      lmWriteSegment(pr, targets, segId, negate = true,
        docsComp = "docs_removed", base = base)
    }
  }

  /** Registry probe for the LM delete: base model on the even-doc_id
    * reference, the doc_id % 8 == 2 slice of it removed by count
    * subtraction (idempotent re-delete each run), the whole corpus
    * scored from the served model. Oracle-equal to a from-scratch
    * model over the surviving reference.
    */
  def lmDeleteProbe(documents: DataFrame, base: String): DataFrame = {
    val marker = s"$base/MARKER_BASE"
    val expected = lmIndexMarkerPrefix(documents) + " split=even"
    if (Snapshot.layoutStale(base, "lm") ||
        !IndexFS.markerEquals(marker, expected)) {
      lmBuildIndex(documents, base).count()
      IndexFS.writeString(marker, expected)
    }
    lmDelete(documents.filter(col("doc_id") % 8 === 2), base)
    lmScoreStored(documents, base)
  }

  /** COMPACT the stored LM: fold every delta segment — appends AND
    * negative delete segments — into the base tables. The served
    * model is unchanged ([[lmModel]] already serves the per-key sums;
    * compaction reclaims the generation directories and removes the
    * serve-time aggregation from the probe plan). Removal records
    * clear with the segments: a compacted-away id has no counts
    * anywhere, so it may re-enter under its old name again. No-op
    * when no generations exist.
    *
    * CRASH-SAFE structurally: count subtraction/addition is not
    * idempotent, so the fold must never be applied to a base that
    * already contains it — and under the snapshot manifest it cannot
    * be. The fold stages the summed tables as a new generation
    * (reading the still-live base and delta generations) and ONE
    * manifest publish makes the fold authoritative while dropping
    * every delta component. A crash before the publish leaves the
    * generations standing (a replay refolds from them); after it the
    * deltas are gone from the manifest, so a replay is a clean no-op.
    * This retires the bespoke `_COMPACT_COMMIT` two-phase protocol —
    * the manifest IS the commit point. `onStep` forwards to the
    * snapshot commit's fault-injection hook: (1) fold staged,
    * manifest not yet published; (2) published; (3) GC done.
    */
  def lmCompact(spark: org.apache.spark.sql.SparkSession,
                base: String,
                onStep: Int => Unit = _ => ()): Unit =
      IndexFS.withWriterLease(base) {
    val snap = Snapshot.require(base)
    val deltaComps = Seq("bi_delta", "uni_delta", "docs_delta",
      "docs_removed")
    if (!deltaComps.exists(snap.has)) return
    val (bi, uni) = lmModel(spark, snap)
    val txn = Snapshot.begin(base)
    txn.writeFull(bi.withColumn("bucket", termBucket(col("w1"))),
      "bi", "bucket")
    txn.writeFull(uni.withColumn("bucket", termBucket(col("w1"))),
      "uni", "bucket")
    txn.writeFull(lmServedDocs(spark, snap), "docs")
    deltaComps.foreach(txn.dropComp)
    txn.commit(onStep)
    ()
  }

  /** Registry probe for the full LM maintenance cycle: build on the
    * even-doc_id reference, append the %4==1 batch, delete the %8==2
    * slice, COMPACT the generations away, score the corpus from the
    * (now single-generation) model. Oracle-equal to a from-scratch
    * model over (even ∪ %4==1) ∖ %8==2; a second run is a clean
    * no-op end to end (everything already recorded/removed/folded).
    */
  def lmCompactProbe(documents: DataFrame, base: String): DataFrame = {
    val marker = s"$base/MARKER_BASE"
    val expected = lmIndexMarkerPrefix(documents) + " split=even"
    if (Snapshot.layoutStale(base, "lm") ||
        !IndexFS.markerEquals(marker, expected)) {
      lmBuildIndex(documents, base).count()
      IndexFS.writeString(marker, expected)
    }
    lmAppend(documents.filter(col("doc_id") % 4 === 1), base)
    lmDelete(documents.filter(col("doc_id") % 8 === 2), base)
    lmCompact(documents.sparkSession, base)
    lmScoreStored(documents, base)
  }

  /** Fuzzy string matching, BLOCKED: a candidate pair must share at
    * least one character q-gram before the exact edit-distance verify
    * runs. The all-pairs theta join this replaces is quadratic in the
    * table (it planned as BroadcastNestedLoopJoin); the gram equi-join's
    * cost is Σ_gram freq² — the same candidate-generation-then-verify
    * shape as [[Dedup.jaccardPairs]], and the one that survives a corpus
    * that doesn't fit one executor. Gram keys are ≤ q bytes, so the
    * shuffle payload stays tiny. Names shorter than q contribute the
    * whole name as their single gram.
    */
  def fuzzyNamePairs(named: DataFrame, key: String, name: String,
                     maxDist: Int = 4, q: Int = 3): DataFrame = {
    val g = named.select(col(key).as("k"), col(name).as("nm"))
      .select(col("k"), col("nm"),
        explode(array_distinct(expr(
          s"transform(sequence(1, greatest(1, length(nm) - ${q - 1})), i -> substring(nm, i, $q))")))
          .as("gram"))
    // aliased self-join: both sides share one canonical exchange
    val cand = g.alias("a")
      .join(g.alias("b"),
        col("a.gram") === col("b.gram") && col("a.k") < col("b.k"))
      .select(col("a.nm").as("name1"), col("b.nm").as("name2"),
        col("a.k").as("k1"), col("b.k").as("k2"))
      .distinct()
    cand
      .withColumn("dist", levenshtein(col("name1"), col("name2")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("name1"), col("name2"), col("dist"))
      .orderBy(col("name1"), col("name2"))
  }

  /** Distinct-name fuzzy matching over a larger table, blocked on the
    * first token (category-style blocking: "red bolt" only ever matches
    * other "red …" names). Identical names are excluded — exact
    * duplicates are the dedup family's job; this surfaces the NEAR
    * misses an entity-resolution pass would review.
    */
  def fuzzyDistinctNames(named: DataFrame, name: String,
                         maxDist: Int = 4): DataFrame = {
    val names = named.select(col(name).as("nm")).distinct()
      .withColumn("tok", split(col("nm"), " ").getItem(0))
    names.alias("a")
      .join(names.alias("b"),
        col("a.tok") === col("b.tok") && col("a.nm") < col("b.nm"))
      .select(col("a.nm").as("name1"), col("b.nm").as("name2"))
      .withColumn("dist", levenshtein(col("name1"), col("name2")).cast("long"))
      .filter(col("dist") <= maxDist)
      .orderBy(col("name1"), col("name2"))
  }

  /** Flesch-style readability scoring from pure counts: words,
    * sentence-ish units (period runs), vowel-group "syllables". All
    * integer counts folded with exact arithmetic; the score itself is
    * integer-ratio double (bit-identical across engines). One
    * projection, no shuffle.
    */
  def readability(documents: DataFrame): DataFrame = {
    val words = size(tokens(col("text"))).cast("long")
    val sentences = greatest(lit(1L),
      size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))).cast("long"))
    val syllables = greatest(lit(1L),
      size(regexp_extract_all(col("text"), lit("[aeiouyAEIOUY]+"), lit(0))).cast("long"))
    documents.select(
        col("doc_id"),
        words.as("n_words"),
        sentences.as("n_sentences"),
        syllables.as("n_syllables"),
        (lit(206.835)
          - lit(1.015) * (words.cast("double") / sentences.cast("double"))
          - lit(84.6) * (syllables.cast("double") / words.cast("double")))
          .as("flesch"))
      .orderBy(col("doc_id"))
  }

  /** PII scrubbing: mask emails then numeric runs (order matters — an
    * email contains digits), report the masked digest + how much was
    * masked. Pure regexp_replace projection, no shuffle — the shape of
    * a corpus-wide scrubbing pass.
    */
  def piiMask(documents: DataFrame): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
    val masked = regexp_replace(
      regexp_replace(col("text"), email, "<EMAIL>"), "[0-9]+", "<NUM>")
    documents.select(
        col("doc_id"),
        md5(masked).as("masked_digest"),
        size(regexp_extract_all(col("text"), lit(email), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0)))
          .cast("long").as("n_numbers"))
      .orderBy(col("doc_id"))
  }

  /** Corpus-level exact SENTENCE dedup accounting (CCNet-style): split
    * documents into sentences, count distinct sentences, repeats, and
    * cross-document repeats. One explode + one aggregation; at corpus
    * scale the group key would be the sentence hash, which is what the
    * md5 grouping here does implicitly via exact string equality on
    * uniformly-hashed shuffle keys.
    */
  def sentenceDedupStats(documents: DataFrame): DataFrame = {
    val sentences = documents
      .select(col("doc_id"), explode(split(col("text"), "\\.")).as("raw"))
      .select(col("doc_id"), trim(col("raw")).as("sent"))
      .filter(col("sent") =!= "")
    sentences
      .groupBy(col("sent"))
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("nd"))
      .agg(
        count(lit(1)).as("n_distinct"),
        count(when(col("n") > 1, 1)).as("n_repeated"),
        count(when(col("nd") > 1, 1)).as("n_cross_doc"),
        sum(col("n")).as("n_total"))
  }

  /** Stratified (per-language) deterministic sampling — the corpus
    * REBALANCING primitive: each stratum gets its own keep-rate, keys
    * are hash-thresholded so the sample is reproducible across runs,
    * engines, and partitionings (seeded `sampleBy` is none of those).
    */
  def stratifiedSample(documents: DataFrame, rates: Map[String, Int],
                       defaultPct: Int = 10): DataFrame = {
    val rate = rates.foldLeft(lit(defaultPct)) { case (acc, (l, p)) =>
      when(col("lang") === l, lit(p)).otherwise(acc)
    }
    documents
      .filter(tokenHash(col("doc_id").cast("string")) % 100 < rate)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"), min(col("doc_id")).as("first_doc"))
      .orderBy(col("lang"))
  }

  /** Split-size accounting (the sanity check on the assignment). */
  def splitStats(documents: DataFrame): DataFrame =
    trainValSplit(documents)
      .groupBy(col("split")).agg(count(lit(1)).as("n"))
      .orderBy(col("split"))

  /** Rolling polynomial fingerprint over the token stream:
    * fold(31·acc + h(token) mod P). Associativity is deliberately NOT
    * assumed — the fold is ordered, and both engines fold left-to-right.
    */
  val fpMod = 1000000007L

  def fingerprint(documents: DataFrame): DataFrame =
    documents.select(
        col("doc_id"),
        aggregate(
          transform(tokens(col("text")), t => tokenHash(t)),
          lit(0L),
          (acc, v) => (acc * 31L + v) % fpMod).as("fingerprint"))
      .orderBy(col("doc_id"))

  /** End-to-end corpus-cleaning funnel: the row count surviving each
    * stage of the standard LLM preprocessing chain — length gate →
    * stopword-ratio quality gate → exact dedup → near-dup dedup. One
    * row per stage; the drop between rows is each filter's cost, the
    * first summary a pipeline owner asks for before a training run.
    * Near-dup losers come from the same clustering the dedup family
    * uses, so the funnel is consistent with dedup_apply.
    */
  def cleaningFunnel(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the first three stages are CONDITIONAL SUMS over one scan (five
    // separate filter+count subtrees would re-tokenize the corpus five
    // times); the dedup stages need the md5 window and the cluster
    // losers, so they ride a second scan. explode(map) unpivots each
    // one-row aggregate into (stage, n_docs) rows.
    val toks = tokens(col("text"))
    val ratio = size(filter(toks, t => t.isin(stopwords.map(lit(_)): _*)))
      .cast("double") / size(toks).cast("double")
    val flagged = documents
      .withColumn("len_ok", (length(col("text")) >= 100).cast("long"))
      .withColumn("q_ok",
        (col("len_ok") === 1 && ratio >= 0.05 && ratio <= 0.6).cast("long"))
    val head = flagged
      .agg(count(lit(1)).as("raw"), sum(col("len_ok")).as("len"),
        sum(col("q_ok")).as("qual"))
      .select(explode(map(
        lit("0_raw"), col("raw"),
        lit("1_min_length"), col("len"),
        lit("2_quality"), col("qual"))).as(Seq("stage", "n_docs")))
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val exact = flagged.filter(col("q_ok") === 1)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val losers = Dedup.nearDupClusters(documents)
      .filter(col("doc_id") =!= col("canon_id"))
      .select(col("doc_id").as("drop_id"))
    val tail = exact
      .join(broadcast(losers), col("doc_id") === col("drop_id"), "left")
      .agg(count(lit(1)).as("ex"),
        sum(when(col("drop_id").isNull, 1L).otherwise(0L)).as("nr"))
      .select(explode(map(
        lit("3_exact_dedup"), col("ex"),
        lit("4_near_dedup"), col("nr"))).as(Seq("stage", "n_docs")))
    head.unionByName(tail).orderBy(col("stage"))
  }

  /** Lexical diversity (type-token ratio): distinct tokens over total
    * tokens per document — the standard quick richness signal in a
    * corpus-quality pipeline. Pure projection, no shuffle; the ratio is
    * ONE division of two exact integers, so it hash-matches across
    * engines (no accumulated float arithmetic).
    */
  def typeTokenRatio(documents: DataFrame): DataFrame =
    documents
      .withColumn("tk", tokens(col("text")))
      .select(
        col("doc_id"),
        size(col("tk")).cast("long").as("n_tokens"),
        size(array_distinct(col("tk"))).cast("long").as("n_types"))
      .withColumn("ttr",
        col("n_types").cast("double") / col("n_tokens").cast("double"))
      .orderBy(col("doc_id"))

  /** POSITIONAL w-gram hashes (1-based gram index, duplicates kept) —
    * the rolling-hash stream winnowing selects from. Same gram/hash
    * construction as the dedup family ([[Dedup.shinglesFromTokens]] +
    * [[tokenHash60]]) but order-preserving.
    */
  private def gramHashes(t: Column, w: Int): Column =
    when(size(t) >= w,
        transform(sequence(lit(1), size(t) - (w - 1)),
          i => tokenHash60(
            concat_ws(" ", (0 until w).map(o => element_at(t, i + o)): _*))))
      .otherwise(array().cast("array<bigint>"))

  /** Winnowing fingerprints (the MOSS sketch — Schleimer, Wilkerson &
    * Aiken, "Winnowing: Local Algorithms for Document Fingerprinting",
    * SIGMOD 2003): hash every w-token gram, slide a window of `win`
    * consecutive gram positions, keep the minimum hash of each full
    * window; the distinct selected hashes are the document's sketch.
    * Winnowing guarantees any shared run of win+w-1 tokens between two
    * documents contributes at least one SHARED fingerprint — the
    * detection guarantee MinHash doesn't give — while sampling only
    * ~2/(win+1) of the grams.
    *
    * Scale shape: one explode + one window function over (doc_id, pos)
    * — a single hash-partitioned shuffle on doc_id; selection and
    * dedup are partition-local. Output: (doc_id, fp) rows.
    */
  def winnowFingerprints(documents: DataFrame, w: Int = 3, win: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = documents
      .repartition(documents.sparkSession.sparkContext.defaultParallelism,
        col("doc_id"))
      .withColumn("tk", tokens(col("text")))
      .select(col("doc_id"), posexplode(gramHashes(col("tk"), w)).as(Seq("pos", "h")))
    val frame = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(0, win - 1)
    g.withColumn("wmin", min(col("h")).over(frame))
      .withColumn("ng", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .filter(col("pos") <= col("ng") - win) // full windows only (pos is 0-based)
      .select(col("doc_id"), col("wmin").as("fp"))
      .distinct()
  }

  /** Per-document winnowing sketch summary — count, range, and xor of
    * the fingerprint set (xor pins the exact set contents for the
    * oracle without dumping every fingerprint row).
    */
  def winnowSketch(documents: DataFrame, w: Int = 3, win: Int = 4): DataFrame =
    winnowFingerprints(documents, w, win)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fp"),
        min(col("fp")).as("fp_min"),
        max(col("fp")).as("fp_max"),
        expr("bit_xor(fp)").as("fp_xor"))
      .orderBy(col("doc_id"))

  /** Cross-document fingerprint matches: pairs sharing at least
    * `minShared` winnowing fingerprints — the plagiarism/overlap
    * detector built on [[winnowFingerprints]]. Co-occurrence join on
    * the fingerprint hash (same discipline as [[Dedup.jaccardPairs]]):
    * pairs sharing nothing never materialize. At web scale, add the
    * standard "stop fingerprint" guard first — drop fps whose document
    * frequency exceeds a cap, which bounds the per-key join fan-out
    * the same way stopword removal bounds a posting list.
    */
  def winnowMatches(documents: DataFrame, minShared: Int = 3,
                    w: Int = 3, win: Int = 4): DataFrame = {
    val fps = winnowFingerprints(documents, w, win)
    fps.alias("a")
      .join(fps.alias("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .groupBy(col("doc1"), col("doc2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy(col("doc1"), col("doc2"))
  }

  /** Token-budget packing: assign documents to fixed-capacity training
    * bins (context windows / output shards), hash-sharded so the
    * cumulative-sum window never needs a global order — each shard
    * packs independently, which is what makes this run at corpus scale
    * (a single `Window.orderBy` would serialize 100 TB through one
    * partition). Within a shard, documents pack greedily in doc_id
    * order by START offset: a document goes to bin
    * floor(preceding_tokens / capacity). Output: per-(shard, bin)
    * occupancy — the shard manifest a data-loader consumes.
    */
  def packBins(documents: DataFrame, shards: Int = 8,
               capacity: Long = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = documents.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"),
      (tokenHash(col("doc_id").cast("string")) % shards).cast("int").as("shard"))
    val byShard = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    d.withColumn("cum", sum(col("n_tokens")).over(byShard))
      .withColumn("bin", expr(s"(cum - n_tokens) div $capacity"))
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("shard"), col("bin"))
  }

  /** Gopher-style repetition filters (Rae et al., "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher", 2021,
    * §A1.1): a document is low-quality when a single n-gram dominates
    * it or most tokens are repeats. Two per-doc signals:
    * top-bigram fraction (count of the most frequent bigram over all
    * bigrams) and duplicate-token fraction (1 - types/tokens).
    *
    * Scale shape: ZERO shuffle — the top-bigram count is the longest
    * equal run in the doc's SORTED bigram array, computed with one
    * `aggregate` fold per row; no explode, no (doc, bigram) grouping.
    * Each ratio is one division of two exact integers, so it
    * hash-matches across engines.
    */
  def repetitionStats(documents: DataFrame,
                      topBigramMax: Double = 0.18,
                      dupTokenMax: Double = 0.60): DataFrame = {
    val base = documents
      .withColumn("tk", tokens(lower(col("text"))))
      .withColumn("bg", when(size(col("tk")) > 1,
          sort_array(transform(sequence(lit(1), size(col("tk")) - 1),
            i => concat_ws(" ",
              element_at(col("tk"), i), element_at(col("tk"), i + 1)))))
        .otherwise(array().cast("array<string>")))
    // longest equal run over the sorted bigrams: fold state is
    // (previous element, current run length, best run length)
    val top = aggregate(col("bg"),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    base.select(
        col("doc_id"),
        size(col("tk")).cast("long").as("n_tokens"),
        size(col("bg")).cast("long").as("n_bigrams"),
        size(array_distinct(col("tk"))).cast("long").as("n_types"),
        top.as("top_bigram_n"))
      .withColumn("top_bigram_frac",
        when(col("n_bigrams") > 0,
          col("top_bigram_n").cast("double") / col("n_bigrams").cast("double"))
        .otherwise(lit(0.0)))
      .withColumn("dup_token_frac",
        when(col("n_tokens") > 0,
          (col("n_tokens") - col("n_types")).cast("double") /
            col("n_tokens").cast("double"))
        .otherwise(lit(0.0)))
      .withColumn("is_repetitive",
        col("top_bigram_frac") > topBigramMax ||
          col("dup_token_frac") > dupTokenMax)
      .orderBy(col("doc_id"))
  }

  /** Domain-mixture sampling: downsample each language/source stratum
    * to a TARGET mixture (basis-point keep rates) with the same
    * deterministic md5 rule as [[hashSample]] — re-runnable across
    * runs, engines, and partitionings, unlike seeded `df.sample`. The
    * salt decorrelates the keep decision from the other hash-keyed
    * assignments (split, shard) built on the same hash family.
    *
    * Output is the mixture report: per-stratum totals, kept counts,
    * the realized keep rate, and each stratum's share of the sampled
    * corpus (single-row broadcast join, no global window). At 100 TB
    * the same expression drives the actual `filter` — the report and
    * the sample come from one scan.
    */
  def mixtureSample(documents: DataFrame, ratesBp: Map[String, Int],
                    defaultBp: Int = 1000): DataFrame = {
    val u = conv(substring(md5(concat(lit("mix:"),
        col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long") % 10000
    val rate = coalesce(
      element_at(
        map(ratesBp.toSeq.sortBy(_._1)
          .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*),
        col("lang")),
      lit(defaultBp))
    val kept = documents
      .withColumn("target_bp", rate)
      .withColumn("keep", (u < col("target_bp")).cast("long"))
    val perLang = kept.groupBy(col("lang"))
      .agg(max(col("target_bp")).as("target_bp"),
        count(lit(1)).as("n_total"),
        sum(col("keep")).as("n_kept"))
    val total = kept.agg(sum(col("keep")).as("n_kept_all"))
    perLang.join(broadcast(total))
      .select(col("lang"), col("target_bp"), col("n_total"), col("n_kept"),
        (col("n_kept").cast("double") / col("n_total").cast("double"))
          .as("keep_rate"),
        (col("n_kept").cast("double") / col("n_kept_all").cast("double"))
          .as("mix_share"))
      .orderBy(col("lang"))
  }

  /** Corpus-novelty scoring: the fraction of a document's DISTINCT
    * bigrams that occur in no other document — high novelty marks
    * fresh content, near-zero novelty marks boilerplate/templated text
    * the dedup family should look at. Complements
    * [[contaminationScores]] (which checks overlap against a specific
    * split) with an unsupervised corpus-wide signal.
    *
    * Scale shape: bigrams travel as 60-bit md5-prefix hashes
    * ([[tokenHash60]] — 8-byte shuffle keys, not strings). A bigram
    * with document frequency 1 belongs to exactly ONE doc, so the
    * novel counts come straight off the frequency aggregation
    * (min(doc_id) = THE doc) — no join-back of the full bigram set.
    */
  def novelBigrams(documents: DataFrame): DataFrame = {
    val tk = tokens(lower(col("text")))
    val bigramHashes = when(size(col("tk")) > 1,
        array_distinct(transform(sequence(lit(1), size(col("tk")) - 1),
          i => tokenHash60(concat_ws(" ",
            element_at(col("tk"), i), element_at(col("tk"), i + 1))))))
      .otherwise(array().cast("array<bigint>"))
    val base = documents
      .repartition(documents.sparkSession.sparkContext.defaultParallelism,
        col("doc_id"))
      .withColumn("tk", tk)
      .select(col("doc_id"), explode(bigramHashes).as("h"))
    val perDoc = base.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"))
    val novel = base.groupBy(col("h"))
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("doc_id"))
      .filter(col("df") === 1)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_novel"))
    perDoc.join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_bigrams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast("double") / col("n_bigrams").cast("double"))
      .orderBy(col("doc_id"))
  }

  /** Duplicated n-gram span coverage (the per-document measurement
    * behind substring-level training-data dedup — Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better": a
    * document whose token positions are largely covered by n-grams
    * that occur elsewhere is boilerplate/near-dup even when no
    * document-level fingerprint fires). A position is DUPLICATED when
    * its w-gram occurs ≥ 2 times corpus-wide (counting within-document
    * repeats — any other occurrence makes the span redundant).
    *
    * Scale shape: grams travel as 60-bit md5-prefix hashes; the
    * per-(gram, doc) pre-aggregation collapses repeat positions before
    * the global count, and the count joins back on the SAME 8-byte
    * hash key partitioning (exchange reuse), never on strings.
    */
  def ngramCoverage(documents: DataFrame, w: Int = 5): DataFrame = {
    val tk = tokens(lower(col("text")))
    val gramHashes = when(size(col("tk")) >= w,
        transform(sequence(lit(1), size(col("tk")) - (w - 1)),
          i => tokenHash60(concat_ws(" ",
            (0 until w).map(o => element_at(col("tk"), i + o)): _*))))
      .otherwise(array().cast("array<bigint>"))
    val parallelism =
      documents.sparkSession.sparkContext.defaultParallelism
    // n_dup = n_positions − n_unique, and a gram with corpus count 1
    // has exactly ONE (doc, position) — so the unique credit comes
    // straight off the totals aggregation (min(doc_id) = THE doc, the
    // [[novelBigrams]] device) and the gram pipeline feeds exactly one
    // chain: no join-back of data rows, one Generate, plan-audited.
    // The explicit h-repartition after the explode makes both gram
    // aggregations run on one partitioning (hashpartitioning(h)
    // satisfies the (h, doc_id) clustering too).
    val base = documents
      .repartition(parallelism, col("doc_id"))
      .withColumn("tk", tk)
      .select(col("doc_id"), explode(gramHashes).as("h"))
      .repartition(parallelism, col("h"))
    val perDocGram = base.groupBy(col("h"), col("doc_id"))
      .agg(count(lit(1)).as("c"))
    val uniq = perDocGram.groupBy(col("h"))
      .agg(sum(col("c")).as("tot"), min(col("doc_id")).as("doc_id"))
      .filter(col("tot") === 1)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_uniq"))
    val perDoc = documents
      .select(col("doc_id"),
        greatest(size(tk) - (w - 1), lit(0)).cast("long").as("n_positions"))
    perDoc.join(uniq, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_positions"),
        (col("n_positions") - coalesce(col("n_uniq"), lit(0L))).as("n_dup"))
      .withColumn("dup_frac",
        when(col("n_positions") > 0,
          col("n_dup").cast("double") / col("n_positions").cast("double"))
          .otherwise(lit(0.0)))
      .orderBy(col("doc_id"))
  }

  /** MAXIMAL duplicated spans (the span-level output of substring
    * dedup — Lee et al. 2022 cut exact duplicated byte ranges, not
    * whole documents): contiguous runs of positions whose w-gram
    * occurs ≥ 2 times corpus-wide, merged per document into
    * [span_start, span_end] gram runs covering span_tokens tokens.
    * [[ngramCoverage]] reports HOW MUCH of a document is duplicated;
    * this reports WHERE — the ranges a corpus cutter actually removes.
    *
    * Scale shape: grams travel as 60-bit hashes with their position in
    * a MATERIALIZED positional index (localCheckpoint — per-consumer
    * column pruning gives the dup-set aggregation and the position
    * join-back different tokenize subplans, so exchange reuse can't
    * deduplicate them; the checkpoint makes the corpus tokenize run
    * exactly once, the [[bm25TopK]] device). The duplicated-gram set
    * comes off one hash-keyed aggregation and joins back on the same h
    * partitioning; the run-merge is gaps-and-islands (pos − row_number
    * per doc) — a per-document window, the declarative form of the
    * grouped secondary sort ([[graft.ops.SortedGroups]] prefers
    * windows when they express the semantics), so everything stays in
    * codegen and nothing orders globally except the final output sort.
    */
  def dupSpans(documents: DataFrame, w: Int = 5): DataFrame = {
    val tk = tokens(lower(col("text")))
    val gramHashes = when(size(col("tk")) >= w,
        transform(sequence(lit(1), size(col("tk")) - (w - 1)),
          i => tokenHash60(concat_ws(" ",
            (0 until w).map(o => element_at(col("tk"), i + o)): _*))))
      .otherwise(array().cast("array<bigint>"))
    val parallelism =
      documents.sparkSession.sparkContext.defaultParallelism
    val base = documents
      .repartition(parallelism, col("doc_id"))
      .withColumn("tk", tk)
      .select(col("doc_id"), posexplode(gramHashes).as(Seq("p0", "h")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"), col("h"))
      .repartition(parallelism, col("h"))
      .localCheckpoint()
    val dupGrams = base.groupBy(col("h"))
      .agg(count(lit(1)).as("tot"))
      .filter(col("tot") >= 2)
      .select(col("h"))
    val dupPos = base.join(dupGrams, Seq("h"))
      .select(col("doc_id"), col("pos"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    dupPos
      .withColumn("grp", col("pos") - row_number().over(wr))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("span_start"), max(col("pos")).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + w).as("span_tokens"))
      .orderBy(col("doc_id"), col("span_start"))
  }

  /** APPLY the span-level dedup decision: the corpus with every
    * duplicated token range from [[dupSpans]] CUT OUT — the actual
    * output table of Lee et al. 2022's substring dedup (the substring
    * analog of [[graft.ops.Dedup.applyNearDupDedup]]): a span covering
    * gram positions [s, e] removes tokens s .. e+w−1, the cleaned
    * document is the kept tokens re-joined in order, and each row
    * carries the kept/cut accounting a pipeline audits against
    * [[dupSpans]].
    *
    * Scale shape: cut positions explode from the (few, short) spans —
    * never from the corpus; overlapping token intervals of adjacent
    * spans dedupe with one distinct on (doc, pos); the cut marks reach
    * the token stream by (doc_id, pos) equi-join; and reassembly is a
    * per-document aggregation (collect_list skips the cut rows, one
    * array_sort per doc) — no window at all, nothing orders globally
    * except the output sort. Every hash is md5 so the cleaned text is
    * DuckDB-oracle-checkable.
    */
  def spanCut(documents: DataFrame, w: Int = 5): DataFrame = {
    val parallelism =
      documents.sparkSession.sparkContext.defaultParallelism
    val cuts = dupSpans(documents, w)
      .select(col("doc_id"),
        explode(sequence(col("span_start"), col("span_end") + (w - 1)))
          .as("cutpos"))
      .distinct()
    val toks = documents
      .repartition(parallelism, col("doc_id"))
      .withColumn("tk", tokens(lower(col("text"))))
      .select(col("doc_id"), posexplode(col("tk")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"), col("tok"))
    toks.alias("t")
      .join(cuts.alias("c"),
        col("t.doc_id") === col("c.doc_id") && col("t.pos") === col("c.cutpos"),
        "left")
      .groupBy(col("t.doc_id").as("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        count(col("c.cutpos")).as("n_cut"),
        array_join(transform(array_sort(collect_list(
            when(col("c.cutpos").isNull, struct(col("t.pos"), col("t.tok"))))),
          x => x.getField("tok")), " ").as("clean_text"))
      .select(col("doc_id"), col("n_tokens"), col("n_cut"),
        (col("n_tokens") - col("n_cut")).as("n_kept"),
        md5(col("clean_text")).as("clean_hash"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic quota sampling: apportion a FIXED total of `k`
    * sample slots across language strata by exact largest-remainder
    * (Hamilton) apportionment — base_l = ⌊k·n_l/N⌋, leftover slots to
    * the largest remainders (k·n_l mod N, ties on lang) — then fill
    * each stratum's quota with its smallest md5-keyed documents. All
    * integer arithmetic, so the sample is a pure function of the data
    * (contrast [[stratifiedSample]], which keeps an expected RATE per
    * stratum; this keeps an exact global budget — the "sample exactly
    * 10k docs for eval, proportionally by language" pipeline ask).
    *
    * Scale shape: the apportionment windows run over #strata rows,
    * never data rows; the per-stratum fill is the two-phase heap node
    * capped at k (every input partition prunes to ≤ k rows map-side
    * before the single stratum shuffle), and the rank window touches
    * only the ≤ k×strata survivors.
    */
  def quotaSample(documents: DataFrame, k: Int = 50): DataFrame = {
    val counts = documents.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val total = documents.agg(count(lit(1)).as("n_total"))
    val quotas0 = counts.join(broadcast(total))
      .select(col("lang"), col("n"),
        expr(s"($k * n) div n_total").as("base"),
        expr(s"($k * n) % n_total").as("rem"))
    val baseSum = quotas0.agg(sum(col("base")).as("base_sum"))
    val wSeat = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col("lang"))
    val quotas = quotas0.join(broadcast(baseSum))
      .withColumn("seat_rank", row_number().over(wSeat))
      .select(col("lang"),
        (col("base") + when(col("seat_rank") <= lit(k.toLong) - col("base_sum"),
          1L).otherwise(0L)).as("quota"))
    val hashed = documents.select(col("doc_id"), col("lang"),
      tokenHash(concat(lit("quota:"), col("doc_id").cast("string"))).as("h"))
    val pruned = org.apache.spark.sql.graftbridge.PlanBridge.topKPerKey(
        hashed.withColumn("o1", -col("h")).withColumn("o2", -col("doc_id")),
        Seq("lang"), Seq("o1", "o2"), k)
      .drop("o1", "o2")
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    pruned.withColumn("pick_rank", row_number().over(wRank).cast("long"))
      .join(broadcast(quotas), Seq("lang"))
      .filter(col("pick_rank") <= col("quota"))
      .select(col("lang"), col("quota"), col("doc_id"), col("pick_rank"))
      .orderBy(col("lang"), col("pick_rank"))
  }

  /** Pairwise token-set overlap between language strata, estimated
    * from KMV sketches — the sketch-algebra pattern for "how much do
    * these corpora share?" at 100 TB: each stratum compresses to a
    * 64-long bottom-k sketch (one aggregation, map-side combining),
    * pairs combine sketch ARRAYS with plain array expressions (the
    * bottom-k of a union of sets is the bottom-k of the union of
    * their sketches), and inclusion–exclusion gives the intersection
    * and Jaccard estimates. No pair of strata ever rescans rows.
    *
    * Like [[graft.functions.KmvSketch]], everything is deterministic
    * cross-engine (md5 hashes, set minima, one IEEE expression tree) —
    * the oracle hash-checks the ESTIMATES, not an error band.
    */
  def langTokenOverlap(documents: DataFrame): DataFrame = {
    import graft.functions.{KmvSketch, KmvSketchState}
    val k = KmvSketch.k
    def est(s: Column): Column =
      when(size(s) < k, size(s).cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(4294967296.0) /
          element_at(s, k).cast("double"))
    val hashes = documents
      .repartition(documents.sparkSession.sparkContext.defaultParallelism,
        col("doc_id"))
      .select(col("lang"), explode(tokens(lower(col("text")))).as("t"))
      .select(col("lang"), tokenHash(col("t")).as("hv"))
    val sk = hashes.groupBy(col("lang"))
      .agg(KmvSketchState.sketch(col("hv")).as("s"))
    sk.alias("a").join(sk.alias("b"), col("a.lang") < col("b.lang"))
      .select(col("a.lang").as("lang1"), col("b.lang").as("lang2"),
        col("a.s").as("sa"), col("b.s").as("sb"))
      .withColumn("su", slice(array_sort(array_union(col("sa"), col("sb"))), 1, k))
      .select(col("lang1"), col("lang2"),
        est(col("sa")).as("est_1"), est(col("sb")).as("est_2"),
        est(col("su")).as("est_union"))
      .withColumn("est_inter",
        greatest(col("est_1") + col("est_2") - col("est_union"), lit(0.0)))
      .withColumn("jaccard_est", col("est_inter") / col("est_union"))
      .orderBy(col("lang1"), col("lang2"))
  }

  /** Fixed phrase-query set for [[phraseSearch]] — literal constants
    * interpolated into BOTH the engine plan and the DuckDB oracle (the
    * [[bm25Queries]] convention). Mixed lengths, one with a repeated
    * term, so the positional-join semantics are actually exercised.
    */
  val phraseQueries: Seq[(Long, String)] = Seq(
    (0L, "order fast"),
    (1L, "window join"),
    (2L, "batch batch batch"),
    (3L, "table scan merge"))

  /** Exact PHRASE search over a positional token index — the
    * positional half of a lexical retrieval stack (BM25 ranks bags of
    * words; phrase/proximity queries need token POSITIONS — the
    * Lucene positional-postings feature). A phrase of length L
    * matches at start position s iff token s+o equals phrase term o
    * for every offset o < L: each corpus token joins the (tiny,
    * broadcast) exploded query-term table, every hit votes for the
    * candidate start `pos − off`, and a start with exactly L votes is
    * a match — one equi-join on term plus one aggregation, no
    * self-join of the corpus, no window, regardless of phrase length.
    * Repeated phrase terms work because a hit's offset is determined
    * by (start, pos) — each (start, off) pair votes at most once.
    *
    * Scale shape: the positional index is [[dupSpans]]' token frame
    * (at scale it is the stored positional-postings extension of the
    * [[bm25BuildIndex]] bucket layout); candidate rows exist only for
    * corpus tokens matching SOME query term, so selectivity does the
    * pruning; the vote aggregation keys on (query, doc, start) — no
    * hot keys beyond genuinely pathological single-document repeats.
    */
  /** The positional token frame (doc_id, pos, term), 1-based `pos`,
    * under the phrase analyzer (whitespace + case fold) — computed
    * inline by [[phraseSearch]], persisted bucket-partitioned as the
    * index's `pos/` layout by [[bm25BuildIndex]].
    */
  private[ops] def positionalPostings(documents: DataFrame): DataFrame =
    documents
      .repartition(documents.sparkSession.sparkContext.defaultParallelism,
        col("doc_id"))
      .select(col("doc_id"),
        posexplode(tokens(lower(col("text")))).as(Seq("p0", "term")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
        col("term"))

  /** The exploded (query_id, off, term, plen) frame of a literal
    * phrase set — broadcast side of both the inline and stored
    * phrase probes.
    */
  private def phraseTermsDF(spark: org.apache.spark.sql.SparkSession,
                            phrases: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    phrases.flatMap { case (qid, p) =>
      val ts = p.split(" ")
      ts.zipWithIndex.map { case (t, off) =>
        (qid, off.toLong, t, ts.length.toLong)
      }
    }.toDF("query_id", "off", "term", "plen")
  }

  /** Vote-count phrase matching over a positional token frame — the
    * shared core of [[phraseSearch]] (inline tokenize) and
    * [[phraseSearchStored]] (persisted `pos/` layout).
    */
  private def phraseMatch(toks: DataFrame, qterms: DataFrame): DataFrame = {
    val cand = toks.join(broadcast(qterms), Seq("term"))
      .select(col("query_id"), col("doc_id"),
        (col("pos") - col("off")).as("start"), col("plen"))
    val matches = cand
      .groupBy(col("query_id"), col("doc_id"), col("start"), col("plen"))
      .agg(count(lit(1)).as("nhit"))
      .filter(col("nhit") === col("plen"))
    matches.groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_matches"), min(col("start")).as("first_pos"))
      .orderBy(col("query_id"), col("doc_id"))
  }

  def phraseSearch(documents: DataFrame,
                   phrases: Seq[(Long, String)] = phraseQueries): DataFrame =
    phraseMatch(positionalPostings(documents),
      phraseTermsDF(documents.sparkSession, phrases))

  /** Exact phrase search over the STORED positional postings — the
    * probe-side twin of [[phraseSearch]]: the phrase terms are
    * plan-time literals, so the `pos/` scan carries STATIC bucket
    * partition filters (a probe reads ~|phrase terms|/buckets of the
    * positional index, never tokenizes the corpus), and the vote
    * aggregation is identical to the inline plan — oracle-identical
    * results (parquet round-trips the integer positions exactly).
    * Tombstoned documents are excluded the same way the BM25 probe
    * excludes them (anti-join on the sidecar). Rebuilds lazily iff
    * the marker is stale.
    */
  def phraseSearchStored(documents: DataFrame, base: String,
                         phrases: Seq[(Long, String)] = phraseQueries): DataFrame = {
    val spark = documents.sparkSession
    ensureBm25Fresh(documents, base)
    val snap = Snapshot.require(base)
    val buckets = phrases.flatMap(_._2.split(" ")).distinct
      .map(termBucketDriver).distinct.sorted
    val base0 = snap.read(spark, "pos")
      .filter(col("bucket").isin(buckets: _*))
      .select(col("doc_id"), col("pos"), col("term"))
    // serve base ∪ delta segments ([[bm25Append]]'s LSM write): a doc
    // present in the delta shadows ALL its base postings (the doc-set
    // anti-join is unfiltered by bucket — a re-appended doc whose new
    // text dropped a term must not keep matching via stale postings)
    val withDelta = snap.readOpt(spark, "pos_delta") match {
      case Some(delta) =>
        base0.join(delta.select(col("doc_id")).distinct(),
            Seq("doc_id"), "left_anti")
          .unionByName(delta
            .filter(col("bucket").isin(buckets: _*))
            .select(col("doc_id"), col("pos"), col("term")))
      case None => base0
    }
    // tombstones exclude docs from BOTH generations
    val pos = snap.readOpt(spark, "tombstones") match {
      case Some(t) =>
        withDelta.join(broadcast(t), Seq("doc_id"), "left_anti")
      case None => withDelta
    }
    phraseMatch(pos, phraseTermsDF(spark, phrases))
  }

  /** Collocation mining: the corpus's top-k adjacent-pair collocations
    * ranked by pointwise-mutual-information LIFT —
    * P(xy) / (P(x)·P(y)) with unigram probabilities over N tokens and
    * bigram probability over N_big adjacent pairs — kept log-free
    * (PMI's ln is monotone, so the ranking is identical) and computed
    * as ONE fixed-shape IEEE expression over exact integer counts, so
    * even the float lifts hash-match across engines. The classic
    * corpus-analysis read ("which word pairs co-occur far above
    * chance?") that drives tokenizer-vocabulary and stop-phrase
    * decisions in a training-data pipeline.
    *
    * Scale shape: ONE corpus tokenize builds the positional token
    * frame (checkpointed — unigram and bigram counts are different
    * subplans of it); bigrams come from a per-document lag window over
    * the SAME doc_id partitioning the frame was built with (no extra
    * shuffle); the lift join keys on token (vocabulary-sized, not
    * corpus-sized); and the global top-k is TakeOrderedAndProject —
    * nothing sorts the full vocabulary.
    */
  def collocations(documents: DataFrame, minCount: Int = 5,
                   k: Int = 20): DataFrame = {
    val parallelism =
      documents.sparkSession.sparkContext.defaultParallelism
    val toks = documents
      .repartition(parallelism, col("doc_id"))
      .select(col("doc_id"),
        posexplode(tokens(lower(col("text")))).as(Seq("p0", "tok")))
      .localCheckpoint()
    val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("c1"))
    val nTok = toks.agg(count(lit(1)).as("n_tok"))
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("p0"))
    val big = toks.withColumn("prev", lag(col("tok"), 1).over(wd))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev").as("w1"), col("tok").as("w2"))
      .agg(count(lit(1)).as("c12"))
    val nBig = big.agg(sum(col("c12")).as("n_big"))
    big.filter(col("c12") >= minCount)
      .join(uni.select(col("tok").as("w1"), col("c1").as("cx")), Seq("w1"))
      .join(uni.select(col("tok").as("w2"), col("c1").as("cy")), Seq("w2"))
      .join(broadcast(nTok)).join(broadcast(nBig))
      .select(col("w1"), col("w2"), col("c12"), col("cx"), col("cy"),
        (col("c12").cast("double") * col("n_tok") / col("cx") *
          col("n_tok") / col("cy") / col("n_big")).as("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** DSIR feature-hash bucket count and the "curated" source set the
    * registry instance targets — literals interpolated into the
    * oracle. 256 buckets keeps the tiny fixtures' models dense; the
    * published method uses ~10k at corpus scale (the knob is the
    * same).
    */
  val dsirBuckets = 256
  val dsirTargetSources: Seq[String] = Seq("src0", "src1")

  /** Importance-resampling weights for data selection — the DSIR
    * recipe (Xie et al. 2023, public): model the TARGET distribution
    * (a small curated set — here the `src0`/`src1` documents) and the
    * SOURCE pool (everything else) as bag-of-hashed-ngram counts
    * (unigrams + adjacent bigrams hashed into [[dsirBuckets]] — the
    * hashing trick), weight every pool document by how target-like
    * its features are, and keep the top-k. Per-bucket evidence is the
    * Laplace-smoothed probability ratio
    * `((c_t+1)/(N_t+B)) · ((N_s+B)/(c_s+1))` — ONE fixed-shape IEEE
    * expression over exact integer counts; a document's weight sums
    * its feature instances' ratios through an ORDERED fold
    * (sort_array + aggregate, the BM25 device), so even the float
    * weights hash-match the oracle. Log-free: the published method
    * sums log-ratios — a libm `ln` is not bit-portable across
    * engines, and summing raw ratios (arithmetic instead of geometric
    * pooling) keeps the same "target-like features up-weight,
    * source-only features down-weight" monotonicity per feature while
    * weighting heavy evidence more; selection here is deterministic
    * top-k (the Gumbel-noise resampling of the paper is one noise
    * column away and orthogonal to the plan shape).
    *
    * Scale shape: ONE tokenize feeds unigram and bigram features; the
    * (doc, bucket, membership) frame is checkpointed once and feeds
    * model counts AND per-doc scoring; the trained model is
    * [[dsirBuckets]] rows riding a broadcast; totals are one-row
    * broadcast carriers; the global top-k is TakeOrderedAndProject.
    * Nothing scales with anything but the corpus scan.
    */
  def dsirWeights(documents: DataFrame, k: Int = 50): DataFrame = {
    val toks = positionalPostings(documents)
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val uni = toks.select(col("doc_id"), col("term").as("feat"))
    val big = toks.withColumn("prev", lag(col("term"), 1).over(wd))
      .filter(col("prev").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", col("prev"), col("term")).as("feat"))
    val feats = uni.unionByName(big)
      .select(col("doc_id"),
        pmod(tokenHash(col("feat")), lit(dsirBuckets.toLong)).as("bucket"))
    val membership = documents.select(col("doc_id"),
      col("source").isin(dsirTargetSources: _*).as("is_t"))
    val fm = feats.join(membership, Seq("doc_id")).localCheckpoint()
    val counts = fm.groupBy(col("bucket"))
      .agg(sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
        sum(when(!col("is_t"), 1L).otherwise(0L)).as("cs"))
    val totals = fm.agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("nt"),
      sum(when(!col("is_t"), 1L).otherwise(0L)).as("ns"))
    val b = lit(dsirBuckets.toLong)
    val ratios = counts.join(broadcast(totals))
      .select(col("bucket"),
        (((col("ct") + 1L).cast("double") / (col("nt") + b).cast("double")) *
          ((col("ns") + b).cast("double") / (col("cs") + 1L).cast("double")))
          .as("r"))
    val scored = fm.filter(!col("is_t"))
      .join(broadcast(ratios), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(aggregate(sort_array(collect_list(struct(col("bucket"), col("r")))),
        lit(0.0), (acc, x) => acc + x.getField("r")).as("weight"))
    val top = scored.orderBy(col("weight").desc, col("doc_id")).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("weight").desc, col("doc_id"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .orderBy(col("rank"))
  }

  /** Composite Gopher-style quality gate: every rule evaluated
    * INDEPENDENTLY over one scan (conditional sums — the complement of
    * [[cleaningFunnel]]'s sequential survivor counts): per-rule
    * violation counts tell a pipeline owner which filter bites before
    * they commit to an order. Thresholds shared with [[qualityScore]] /
    * [[repetitionStats]]. One row per rule plus the all-rules pass
    * count; a doc can violate several rules, so violations may sum past
    * the total.
    */
  def gopherGate(documents: DataFrame): DataFrame = {
    val tk = tokens(lower(col("text")))
    val bg = when(size(col("tk")) > 1,
        sort_array(transform(sequence(lit(1), size(col("tk")) - 1),
          i => concat_ws(" ",
            element_at(col("tk"), i), element_at(col("tk"), i + 1)))))
      .otherwise(array().cast("array<string>"))
    val top = aggregate(col("bg"),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    val nTok = size(col("tk")).cast("double")
    val nStop = size(filter(col("tk"),
      t => t.isin(stopwords.map(lit(_)): _*))).cast("double")
    val flagged = documents
      .withColumn("tk", tk).withColumn("bg", bg)
      .select(
        (length(col("text")) >= 100).cast("long").as("len_ok"),
        (size(col("tk")) >= 10 && size(col("tk")) <= 10000)
          .cast("long").as("tok_ok"),
        (nStop / nTok >= 0.05 && nStop / nTok <= 0.6)
          .cast("long").as("stop_ok"),
        (when(size(col("bg")) > 0,
            top.cast("double") / size(col("bg")).cast("double"))
          .otherwise(lit(0.0)) <= 0.18).cast("long").as("rep_ok"),
        ((size(col("tk")) - size(array_distinct(col("tk")))).cast("double") /
          size(col("tk")).cast("double") <= 0.60).cast("long").as("dup_ok"))
    flagged
      .agg(count(lit(1)).as("total"),
        sum(lit(1) - col("len_ok")).as("v_len"),
        sum(lit(1) - col("tok_ok")).as("v_tok"),
        sum(lit(1) - col("stop_ok")).as("v_stop"),
        sum(lit(1) - col("rep_ok")).as("v_rep"),
        sum(lit(1) - col("dup_ok")).as("v_dup"),
        sum(col("len_ok") * col("tok_ok") * col("stop_ok") *
          col("rep_ok") * col("dup_ok")).as("pass"))
      .select(explode(map(
        lit("0_total"), col("total"),
        lit("1_min_chars"), col("v_len"),
        lit("2_token_range"), col("v_tok"),
        lit("3_stopword_band"), col("v_stop"),
        lit("4_repetition"), col("v_rep"),
        lit("5_dup_tokens"), col("v_dup"),
        lit("6_pass_all"), col("pass"))).as(Seq("rule", "n_docs")))
      .orderBy(col("rule"))
  }

  // ---- PII detection & redaction -----------------------------------

  /** The pattern set [[piiScan]] detects — deliberately restricted to
    * constructs with IDENTICAL semantics in java.util.regex and RE2
    * (character classes, bounded repetition, word boundaries,
    * non-capturing groups; no lookaround, no backreferences), so the
    * engine and the DuckDB oracle match span-for-span. The production
    * pack: email, IPv4, international + local phone formats, IBAN,
    * and payment cards — card candidates are pattern-matched, then
    * validated by the LUHN CHECKSUM as a pure integer HOF expression
    * (no UDF; `aggregate` over the digit positions has the same
    * semantics as DuckDB's `list_sum(list_transform(...))`, so
    * validity verdicts match bit-for-bit).
    */
  val piiEmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val piiIpv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val piiPhoneRe = "\\b\\d{3}-\\d{4}\\b"
  val piiIntlPhoneRe = "\\+\\d{1,3}-\\d{3}-\\d{3}-\\d{4}"
  val piiIbanRe = "\\b[A-Z]{2}\\d{2}[A-Z0-9]{12,30}\\b"
  val piiCardRe = "\\b\\d{4}-\\d{4}-\\d{4}-\\d{4}\\b"

  /** Luhn digit-sum SQL term over positions 0..len-1 of the digit
    * string in column/expression `s` (leftmost digit is position 0;
    * for a 16-digit card — and for computing a 15-digit payload's
    * check digit — the doubled positions are the EVEN indexes). The
    * identical text parses as a Spark lambda body and as a DuckDB
    * lambda body: CASE/ascii/substring/% behave the same, which is
    * what keeps the validity verdicts engine-exact.
    */
  private def luhnTermSql(s: String): String =
    s"CASE WHEN i % 2 = 0 THEN " +
      s"CASE WHEN (ascii(substring($s, i + 1, 1)) - 48) * 2 > 9 " +
      s"THEN (ascii(substring($s, i + 1, 1)) - 48) * 2 - 9 " +
      s"ELSE (ascii(substring($s, i + 1, 1)) - 48) * 2 END " +
      s"ELSE ascii(substring($s, i + 1, 1)) - 48 END"

  /** Spark-side Luhn digit sum of the first `len` digits of column
    * `c` (a pure codegen'd HOF — no UDF).
    */
  private[graft] def luhnSum(c: String, len: Int): Column =
    expr(s"aggregate(sequence(0, ${len - 1}), 0, " +
      s"(acc, i) -> acc + ${luhnTermSql(c)})")

  /** The oracle twin of [[luhnSum]] (DuckDB list fold). */
  def luhnSumOracle(c: String, len: Int): String =
    s"list_sum(list_transform(generate_series(0, ${len - 1}), " +
      s"i -> ${luhnTermSql(c)}))"

  /** PII SCAN + REDACTION over the documents table — the compliance
    * pass every training-data pipeline runs before a corpus ships:
    * per-document counts of email / IPv4 / international-phone /
    * local-phone / IBAN / payment-card spans (cards additionally
    * Luhn-validated — pattern-shaped vs checksum-valid counted
    * separately), plus the post-redaction text length (every pattern
    * replaced by a fixed tag — the length catches any engine drift in
    * match extents or global-replace semantics, not just match
    * counts). Redaction removes ALL card-SHAPED spans (conservative,
    * the compliance default); the Luhn verdict is reported, not used
    * to narrow redaction — regexp_replace cannot branch per match and
    * a checksum-invalid span is still card-shaped noise worth
    * scrubbing. Local phones are counted and redacted AFTER the
    * international format (whose tail would otherwise double-count as
    * a local match); both engines apply the same order.
    *
    * The fixture corpus carries no natural PII, so the scan runs over
    * a deterministically PII-PLANTED twin: every doc gets a synthetic
    * email; every 3rd an IPv4, 4th an intl phone, 5th a local phone,
    * 6th an IBAN, 7th a Luhn-VALID card (payload digits from doc_id,
    * check digit computed by the same Luhn fold), every 11th a
    * Luhn-INVALID card (valid check digit + 1 mod 10) — all derived
    * from doc_id by arithmetic both engines reproduce exactly, so the
    * board proves true positives, checksum discrimination, and exact
    * redaction extents.
    *
    * Scale shape: a pure per-row projection inside the scan (codegen'd
    * regexps + integer HOF folds, no shuffle, no UDF) — the 100 TB
    * cost is one map pass, exactly what a redaction sweep should be.
    */
  def piiScan(documents: DataFrame): DataFrame = {
    val withCard = documents
      .withColumn("cardp", concat(lit("4"),
        lpad(pmod(col("doc_id") * 7919, lit(1000000000)).cast("string"), 9, "0"),
        lpad(pmod(col("doc_id") * 3, lit(100000)).cast("string"), 5, "0")))
      .withColumn("chk",
        pmod(lit(10) - pmod(luhnSum("cardp", 15), lit(10)), lit(10)))
    def dash16(c: Column): Column = concat_ws("-",
      substring(c, 1, 4), substring(c, 5, 4),
      substring(c, 9, 4), substring(c, 13, 4))
    val planted = withCard.select(col("doc_id"), concat(
      col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com"),
      when(pmod(col("doc_id"), lit(3)) === 0,
        concat(lit(" from 10."), pmod(col("doc_id"), lit(256)),
          lit(".0."), pmod(col("doc_id"), lit(100))))
        .otherwise(lit("")),
      when(pmod(col("doc_id"), lit(4)) === 0,
        concat(lit(" tel +90-5"),
          lpad(pmod(col("doc_id"), lit(90)).cast("string"), 2, "0"),
          lit("-"), lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 3, "0"),
          lit("-"), lpad(pmod(col("doc_id") * 3, lit(10000)).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when(pmod(col("doc_id"), lit(5)) === 0,
        concat(lit(" call 555-0"),
          lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 3, "0")))
        .otherwise(lit("")),
      when(pmod(col("doc_id"), lit(6)) === 0,
        concat(lit(" iban DE"),
          lpad((pmod(col("doc_id"), lit(89)) + 11).cast("string"), 2, "0"),
          lpad(pmod(col("doc_id") * 13, lit(1000000000)).cast("string"), 9, "0"),
          lpad(pmod(col("doc_id") * 17, lit(1000000000)).cast("string"), 9, "0")))
        .otherwise(lit("")),
      when(pmod(col("doc_id"), lit(7)) === 0,
        concat(lit(" card "),
          dash16(concat(col("cardp"), col("chk")))))
        .otherwise(lit("")),
      when(pmod(col("doc_id"), lit(11)) === 0,
        concat(lit(" card "),
          dash16(concat(col("cardp"),
            pmod(col("chk") + 1, lit(10))))))
        .otherwise(lit(""))).as("text"))
    // intl phones redact before local-phone counting/redaction (order
    // is part of the contract — see scaladoc); everything else is
    // disjoint by construction of the patterns
    val afterIntl = regexp_replace(col("text"), piiIntlPhoneRe, "<INTL>")
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(col("text"), piiEmailRe, "<EMAIL>"),
              piiIbanRe, "<IBAN>"),
            piiCardRe, "<CARD>"),
          piiIntlPhoneRe, "<INTL>"),
        piiIpv4Re, "<IP>"),
      piiPhoneRe, "<PHONE>")
    planted.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(piiEmailRe), lit(0)))
        .cast("long").as("n_email"),
      size(regexp_extract_all(col("text"), lit(piiIpv4Re), lit(0)))
        .cast("long").as("n_ipv4"),
      size(regexp_extract_all(col("text"), lit(piiIntlPhoneRe), lit(0)))
        .cast("long").as("n_intl"),
      size(regexp_extract_all(afterIntl, lit(piiPhoneRe), lit(0)))
        .cast("long").as("n_phone"),
      size(regexp_extract_all(col("text"), lit(piiIbanRe), lit(0)))
        .cast("long").as("n_iban"),
      size(regexp_extract_all(col("text"), lit(piiCardRe), lit(0)))
        .cast("long").as("n_card"),
      // Spark SQL string literals are C-escaped, so the regex's
      // backslashes double inside the expr text
      expr("size(filter(transform(regexp_extract_all(text, " +
          s"'${piiCardRe.replace("\\", "\\\\")}', 0), " +
          "c -> replace(c, '-', '')), " +
          "cc -> aggregate(sequence(0, 15), 0, " +
          s"(acc, i) -> acc + ${luhnTermSql("cc")}) % 10 = 0))")
        .cast("long").as("n_card_valid"),
      length(redacted).cast("long").as("red_len"))
      .orderBy(col("doc_id"))
  }
}
