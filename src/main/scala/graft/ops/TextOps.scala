package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Portable.r6

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting. All pure
  * Column expressions (codegen'd, shuffle-free per row) except language
  * ID, which is a broadcast profile join + argmax.
  */
object TextOps {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish piece count: runs of letters, runs of digits, single other
    * non-space chars — a cheap upper-bound proxy for subword token count.
    */
  def pieceCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Quality-scoring feature bundle: lengths, word stats, stopword ratio,
    * punctuation ratio. Stopword list is inlined into the expression
    * (array_contains over a literal array) — no join, no shuffle. The
    * token array materializes once in its own column (five consumers —
    * inlined, the regex split would re-run per consumer; a multiply-
    * referenced non-trivial alias survives CollapseProject).
    */
  def qualityFeatures(df: DataFrame, text: Column, stopwords: Seq[String])
      : DataFrame = {
    val toks = col("__q_toks")
    val nWords = size(toks)
    val stopArr = array(stopwords.map(lit): _*)
    val nStop = size(filter(toks, t => array_contains(stopArr, t)))
    val punctFree = regexp_replace(text, "[^A-Za-z0-9\\s]", "")
    // regex-heavy per-row work: widen a few-file scan to full
    // parallelism first (no-op at real data scale — see Par.widen)
    Par.widen(df).withColumn("__q_toks", tokens(text))
      .withColumn("n_chars", length(text))
      .withColumn("n_words", nWords)
      .withColumn("avg_word_len",
        (length(text) - (nWords - 1)).cast("double") / nWords)
      .withColumn("stopword_ratio", nStop.cast("double") / nWords)
      .withColumn("punct_ratio",
        (length(text) - length(punctFree)).cast("double") / length(text))
      .drop("__q_toks")
  }

  /** Language ID by stopword-profile voting: explode tokens, broadcast-
    * join the (lang, word) profile table, count hits per (doc, lang),
    * keep the argmax (ties → lexicographically smallest lang across the
    * FULL lang string, so the result is deterministic). Docs with zero
    * profile hits get lang "und". One shuffle on doc id; profile is
    * broadcast. The id column keeps the caller's name (`idName`).
    */
  def langId(
      df: DataFrame,
      idCol: Column,
      text: Column,
      profiles: DataFrame /* columns: lang, word */,
      idName: String = "id"): DataFrame = {
    // explode_outer: split arrays are never empty, and a plain explode
    // infers size>0 below the projection, re-tokenizing per row just
    // for the emptiness check; a NULL word would drop at the inner join
    val exploded = Par.widen(df)
      .select(idCol.as("__id"), explode_outer(tokens(lower(text))).as("word"))
    val hits = exploded
      .join(broadcast(profiles), Seq("word"))
      .groupBy(col("__id"), col("lang"))
      .agg(count(lit(1)).as("__hits"))
    val best = hits
      .groupBy(col("__id"))
      // min of (−hits, lang): highest hit count first, then the
      // lexicographically smallest full lang string on ties
      .agg(min_by(col("lang"),
        struct(negate(col("__hits")), col("lang"))).as("pred_lang"))
    df.select(idCol.as("__id"))
      .join(best, Seq("__id"), "left")
      .select(col("__id").as(idName),
        coalesce(col("pred_lang"), lit("und")).as("pred_lang"))
  }

  /** Stride-windowed token chunking — the RAG / pretraining chunker:
    * cut each document into `size`-token windows starting every
    * `stride` tokens (overlap = size − stride), final window allowed
    * short, every document yields at least one chunk. Pure per-row
    * explode over Column expressions: no shuffle, no UDF, and the chunk
    * count is data-derived (`ceil((n − size) / stride) + 1`), so the
    * fanout is bounded by document length, not a literal cap.
    *
    * Emits (idName, chunk_id, n_tokens, chunk_text). The token array
    * materializes once in its own projection before the explode (the
    * lambda-CSE rule: inlined, the split would re-run per chunk).
    */
  def chunk(
      df: DataFrame,
      idCol: Column,
      text: Column,
      size: Int,
      stride: Int,
      idName: String = "doc_id"): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val toks = col("__c_toks")
    val nChunks = greatest(
      ceil((org.apache.spark.sql.functions.size(toks) - size) /
        lit(stride.toDouble)).cast("int"), lit(0)) + lit(1)
    val ch = slice(toks, col("chunk_id") * stride + 1, lit(size))
    Par.widen(df).select(idCol.as(idName), tokens(lower(text)).as("__c_toks"))
      .select(col(idName), toks,
        explode(sequence(lit(0), nChunks - 1)).as("chunk_id"))
      .select(col(idName), col("chunk_id").cast("int"), ch.as("__ch"))
      .select(col(idName), col("chunk_id"),
        org.apache.spark.sql.functions.size(col("__ch")).as("n_tokens"),
        concat_ws(" ", col("__ch")).as("chunk_text"))
  }

  /** Rolling polynomial fingerprint over the token stream — the
    * Rabin-Karp-style document fingerprint. Folded with `aggregate`;
    * every step is reduced mod 2^31−1 so the accumulator never overflows
    * a long (Spark 4 ANSI mode makes long overflow an error, and the
    * DuckDB twin would error too). Token hashes are portable
    * [[graft.functions.PortableHash]] 28-bit values, so the whole
    * fingerprint is reproducible by the ANSI-SQL oracle.
    */
  def fingerprint(text: Column): Column = {
    val M = 2147483647L // 2^31 - 1
    aggregate(
      tokens(lower(text)),
      lit(0L),
      (acc, t) => pmod(acc * lit(1000003L) +
        graft.functions.PortableHash.base28(t), lit(M)))
  }

  /** Unigram language-model scoring — the cheap corpus-statistics
    * "perplexity" proxy a curation pipeline uses to rank documents
    * before any neural filter: p(token) = corpus_count / corpus_total
    * over a frequency vocabulary (count ≥ minCount), out-of-vocabulary
    * tokens get the floor 1/corpus_total, and a document scores the
    * mean log10 probability of its tokens. Low scores = rare/garbled
    * text; a high OOV count marks tokens the corpus has effectively
    * never seen.
    *
    * Scale shape: the corpus pass is one token-count aggregate; the
    * thresholded vocabulary (plus the scalar total as a literal-sized
    * single row) is BROADCAST, so the scoring pass is scan → map-side
    * join → per-doc aggregate. Token strings cross a shuffle only in
    * the vocabulary-building aggregate, never row-wise.
    */
  /** BM25 retrieval scoring of every document against a FIXED term set
    * (the batch "score the corpus against this query" job, e.g. ranking
    * training documents by relevance to a topic probe).
    *
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    * idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)  (the Lucene form, always
    * positive). Per-term tf comes from `size(filter(tokens, = t))` — a
    * pure codegen'd per-row expression, NO explode and NO token shuffle
    * anywhere: the only aggregate is the single-row corpus-stats pass
    * (N, avgdl, per-term df), which is broadcast back. The per-document
    * score sums the fixed term list in ONE fixed left-to-right order, so
    * the double arithmetic is reproducible (a groupBy-sum over exploded
    * terms would add in partition order — nondeterministic floats).
    * Top-k by (score desc, id) is a TakeOrdered — no global sort.
    */
  def bm25TopK(
      df: DataFrame,
      idCol: Column,
      text: Column,
      terms: Seq[String],
      topK: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val tfCols = terms.indices.map { i =>
      size(filter(col("__toks"), t => t === lit(terms(i))))
        .cast("double").as(s"__tf$i")
    }
    val base = df
      .select(idCol.as("doc_id"), Dedup.tokens(text).as("__toks"))
      .select(col("doc_id") +:
        size(col("__toks")).cast("double").as("__dl") +: tfCols: _*)
    val statCols = count(lit(1)).cast("double").as("__n") +:
      avg(col("__dl")).as("__avgdl") +:
      terms.indices.map(i =>
        sum((col(s"__tf$i") > 0).cast("double")).as(s"__df$i"))
    val stats = base.agg(statCols.head, statCols.tail: _*)
    val score = terms.indices
      .map { i =>
        val idf = log((col("__n") - col(s"__df$i") + 0.5) /
          (col(s"__df$i") + 0.5) + 1.0)
        val tf = col(s"__tf$i")
        idf * (tf * (k1 + 1.0)) /
          (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl")))
      }
      .reduce(_ + _)
    base.crossJoin(broadcast(stats))
      .select(col("doc_id"), r6(score).as("bm25"))
      .filter(col("bm25") > 0)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(topK)
  }

  /** Bigram-LM document scoring — the step up from [[unigramLogProb]]:
    * p(w2|w1) = c(w1 w2) / c(w1 ·) over the corpus's own bigram counts
    * (c(w1 ·) = bigrams starting with w1, so the conditional is proper
    * and self-scoring needs no smoothing — every scored bigram has
    * count ≥ 1). Emits the per-doc mean log10 probability plus the
    * hapax-bigram count (bigrams seen exactly once corpus-wide — the
    * garbled-text signal).
    *
    * Scale shape: occurrence-level rows never shuffle at full width.
    * The corpus bigram counts are a map-side-combined hash aggregate
    * (shuffle volume ≤ vocabulary × partitions, not occurrences); the
    * unigram table DERIVES from the bigram table by one vocabulary-sized
    * window (c(w1 ·) = Σ c2 over bigrams starting with w1 — no second
    * pass over occurrences, which is what the old uc aggregate paid);
    * the scoring join attaches both counts in ONE join that AQE
    * broadcasts whenever the vocabulary is small and plans as a shuffle
    * join when it genuinely grows with the corpus; the per-doc mean is
    * then a partially-aggregated groupBy whose shuffle carries only
    * (doc, three numbers). Nothing persists: the pair generator has two
    * consumers (counts and scoring), but it is pure codegen'd scan work
    * that re-runs in parallel for less than an occurrence-sized cache
    * costs to write and read back.
    */
  def bigramLogProb(df: DataFrame, idCol: Column, text: Column): DataFrame = {
    val toks = Par.widen(df).select(idCol.as("__id"), Dedup.tokens(text).as("__t"))
    val pairs = toks
      .filter(size(col("__t")) >= 2)
      .select(col("__id"),
        explode(transform(sequence(lit(1), size(col("__t")) - 1),
          i => concat_ws(" ", element_at(col("__t"), i),
            element_at(col("__t"), i + 1)))).as("__bg"))
    // corpus bigram counts; then c(w1 ·) without touching occurrences —
    // tokens never contain spaces, so the first space-separated field of
    // the bigram IS w1, and the window's long sums are exact
    val bcw = pairs.groupBy(col("__bg")).agg(count(lit(1)).as("__c2"))
      .withColumn("__c1", sum(col("__c2")).over(Window.partitionBy(
        element_at(split(col("__bg"), " ", 2), 1))))
    pairs.join(bcw, "__bg")
      .groupBy(col("__id").as("doc_id"))
      .agg(
        r6(avg(log10(col("__c2").cast("double") / col("__c1"))))
          .as("avg_logprob"),
        count(lit(1)).as("n_bigrams"),
        sum(when(col("__c2") === 1, 1).otherwise(0)).as("n_hapax"))
  }

  def unigramLogProb(
      df: DataFrame,
      idCol: Column,
      text: Column,
      minCount: Long): DataFrame = {
    // explode_outer: whitespace-split arrays are never empty (empty text
    // yields one "" token), and a plain explode would infer size>0 and
    // re-tokenize below the projection just for the emptiness check
    val toks = df.select(idCol.as("__id"),
      explode_outer(Dedup.tokens(text)).as("__t"))
    val freq = toks.groupBy(col("__t")).agg(count(lit(1)).as("__c"))
    // corpus total WITHOUT re-running the count aggregate: one scan of
    // per-row token-array sizes, no explode, no shuffle of token strings
    val total = df.agg(sum(size(Dedup.tokens(text))).as("__tot"))
    val vocab = freq.filter(col("__c") >= minCount)
    toks
      .join(broadcast(vocab), Seq("__t"), "left")
      .crossJoin(broadcast(total))
      .groupBy(col("__id").as("doc_id"))
      .agg(
        r6(avg(log10(coalesce(col("__c"), lit(1L)) / col("__tot"))))
          .as("avg_logprob"),
        count(lit(1)).as("n_tokens"),
        count(when(col("__c").isNull, 1)).as("n_oov"))
  }

  /** Per-document top-k keywords by tf·idf: tf = term count in the doc,
    * idf = ln(N / df) over the corpus itself. The candidate unit is the
    * (doc, term) pair — tf and df are the two keyed hash aggregates any
    * engine needs here; N is a one-row broadcast; the final rank is a
    * window over each doc's distinct terms (vocabulary-per-doc-sized
    * partitions, never corpus-sized). Scores are rounded BEFORE ranking
    * so tie-breaking (score desc, then term) is decided on the exact
    * values both engines agree on.
    */
  def keywordsTopK(
      df: DataFrame,
      idCol: Column,
      text: Column,
      k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val tok = Par.widen(df)
      .select(idCol.as("doc_id"), Dedup.tokens(text).as("__t"))
      .select(col("doc_id"), explode(col("__t")).as("token"))
    val tf = tok.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("__tf"))
    // df via a count-window over the term key (r18): tf rows are
    // distinct (doc, term), so count-over-token IS the document
    // frequency — one exchange of the tf table instead of the
    // groupBy + join-back formulation's two
    val n = df.agg(count(lit(1)).cast("double").as("__n"))
    val scored = tf
      .withColumn("__df", count(lit(1)).over(
        Window.partitionBy(col("token"))))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"),
        r6(col("__tf") * log(col("__n") / col("__df"))).as("score"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  /** Corpus-wide duplicate-chunk scrub — the line/paragraph-level dedup
    * step of web-corpus pipelines (boilerplate paragraphs repeat across
    * pages even when whole documents don't): documents are cut into
    * non-overlapping `size`-token chunks ([[chunk]] with stride = size),
    * a chunk occurring in more than one place keeps only its FIRST
    * occurrence (min doc_id, then min chunk_id — deterministic
    * canonical owner), and every other copy is dropped. Returns per-doc
    * hygiene stats: chunks kept/removed and surviving token count.
    *
    * Scale shape: chunks shuffle once keyed by their md5 (never the
    * corpus pairwise); the keep rule is a min-window over that one
    * exchange (r18 — no join-back pass). Chunk text never travels
    * through the dedup shuffle — only the 15-hex-char portable hash
    * does.
    */
  def chunkDedup(
      df: DataFrame,
      idCol: Column,
      text: Column,
      size: Int): DataFrame = {
    val ch = chunk(df, idCol, text, size = size, stride = size)
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
        graft.functions.PortableHash.md5Long(col("chunk_text"), 15).as("__h"))
    // canonical owner per hash: lexicographically-min (doc_id, chunk_id),
    // PACKED into one long (chunk_id < 10^9 by construction — documents
    // are token-bounded) so the min is a plain hash-aggregable long min,
    // not a struct min that would force a SortAggregate over every chunk
    val packed = ch.withColumn("__p",
      col("doc_id") * lit(1000000000L) + col("chunk_id"))
    // canonical owner via a min-window over the hash key (r18): ONE
    // exchange of the chunk stream instead of the groupBy + join-back
    // formulation's two — the substringDupFraction/band-prune pattern
    val owner = packed.withColumn("__op",
      min(col("__p")).over(Window.partitionBy(col("__h"))))
    owner
      .withColumn("__keep", (col("__p") === col("__op")).cast("int"))
      .groupBy(col("doc_id"))
      .agg(sum(col("__keep")).as("chunks_kept"),
        sum(lit(1) - col("__keep")).as("chunks_removed"),
        sum(col("__keep") * col("n_tokens")).as("tokens_kept"))
  }

  /** Collocation mining: document-level co-occurrence counts and PMI
    * over the `vocabSize` most-frequent tokens (ties to the
    * lexicographically smaller token). Bounded by construction: the
    * vocabulary is a broadcast list, each document contributes at most
    * C(vocabSize, 2) pairs from its DISTINCT vocab hits, and the output
    * is vocab²-sized — never corpus-sized. PMI = ln(n_ab·N / (n_a·n_b))
    * over document frequencies, rounded for cross-engine equality.
    *
    * EAGER contract (r18 collect, documented per ADVICE r18): the
    * vocabulary is collected to the driver at CALL time, so building
    * (or explaining) the returned DataFrame runs the dfreq corpus pass,
    * and the plan snapshots the vocabulary as literals — a caller that
    * mutates the input path between construction and execution gets the
    * construction-time vocabulary. That trade buys the plan shape: the
    * vocab gate is an `isin` literal and the marginals a map literal
    * instead of three broadcast-join subtrees each re-deriving the
    * dfreq pass. `vocabSize` is bounded (≤ 4096) because both literals
    * grow linearly with it; above that class the broadcast-join
    * formulation (git history, r17) is the right tool.
    */
  def cooccurrence(
      df: DataFrame,
      idCol: Column,
      text: Column,
      vocabSize: Int,
      minPairCount: Long = 2L): DataFrame = {
    require(vocabSize >= 2, "need at least a 2-token vocabulary")
    require(vocabSize <= 4096,
      s"vocabSize=$vocabSize: the collected vocabulary is snapshotted " +
        "into the plan as isin/map literals, which is only sane for a " +
        "bounded vocabulary — use the broadcast-join formulation for " +
        "larger vocabularies")
    val tok = df.select(idCol.as("doc_id"), Dedup.tokens(text).as("__t"))
      .select(col("doc_id"), explode(array_distinct(col("__t"))).as("token"))
    // document frequency → top-vocabSize vocabulary (count desc, token
    // asc), collected ONCE to the driver (r18): the vocabulary is
    // bounded by the vocabSize argument (≤ tens of rows — the same
    // bounded-collect class as the split-size tables), and the old
    // three broadcast(vocab)-subtree joins each re-built the broadcast
    // from its own copy of the corpus dfreq pass. The vocab hit gate
    // becomes an isin literal and the marginals a map literal — zero
    // joins, one corpus pass for dfreq and one for the hits.
    val dfreq = tok.groupBy(col("token")).agg(count(lit(1)).as("n_docs"))
    val vocabRows = dfreq
      .orderBy(col("n_docs").desc, col("token")).limit(vocabSize)
      .collect()
    val vocabTokens = vocabRows.map(_.getString(0)).toSeq
    val dfMap = typedLit(vocabRows
      .map(r => r.getString(0) -> r.getLong(1)).toMap)
    // pairs come from a per-doc SORTED vocab-hit array (bounded at
    // vocabSize) self-paired by expression — no doc-keyed self-join, so
    // the exploded token rows shuffle ONCE (into the per-doc collect)
    // instead of twice into a join, and pair fanout stays ≤ C(|v|, 2)
    val hits = tok.filter(col("token").isin(vocabTokens: _*))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(col("token"))).as("__v"))
    val pairArr = flatten(transform(col("__v"), (a, i) =>
      transform(slice(col("__v"), i + 2, lit(vocabSize)), b =>
        struct(a.as("token_a"), b.as("token_b")))))
    val pairs = hits
      .select(explode(pairArr).as("__pair"))
      .select(col("__pair.token_a"), col("__pair.token_b"))
      .groupBy(col("token_a"), col("token_b"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minPairCount)
    val n = df.agg(count(lit(1)).cast("double").as("__n"))
    pairs
      .withColumn("__na", element_at(dfMap, col("token_a")))
      .withColumn("__nb", element_at(dfMap, col("token_b")))
      .crossJoin(broadcast(n))
      .select(col("token_a"), col("token_b"), col("n_both"),
        r6(log(col("n_both") * col("__n") / (col("__na") * col("__nb"))))
          .as("pmi"))
  }

  /** Top-`k` ADJACENT token-pair frequencies over the corpus — the
    * statistic a BPE/WordPiece trainer computes every merge round (most
    * frequent adjacent pair wins). One expression-level pair fanout per
    * document (n−1 pairs from an n-token array, no self-join), one
    * map-side-combinable count, and a bounded sort-limit
    * (TakeOrderedAndProject — per-partition top-k then a k-row driver
    * merge, never a global sort). Rank ties break on (pair) so the
    * result SET is deterministic at any scale.
    */
  def adjacentPairStats(df: DataFrame, text: Column, k: Int): DataFrame = {
    val pairs = df
      .select(Dedup.tokens(text).as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(__t) - 1), i ->
             struct(__t[i - 1] as a, __t[i] as b))""")).as("__p"))
      .select(col("__p.a"), col("__p.b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
    pairs.orderBy(col("n").desc, col("a"), col("b")).limit(k)
      .withColumn("rk", row_number()
        .over(org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("a"), col("b"))).cast("int"))
      .select(col("rk"), col("a"), col("b"), col("n"))
  }
}
