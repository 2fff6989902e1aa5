package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.ops.TextAnalysis.tokens

/** Corpus-level term statistics for training-data curation: TF-IDF
  * keyword extraction and Gopher-style intra-document repetition
  * signals. Everything is keyed aggregation — no collects, no
  * all-pairs, no driver state — so the shapes hold at corpus scale.
  */
object Corpus {

  /** One-pass stride-1 md5 window stream: array of the md5 hex of
    * every `width`-char window ([[graft.expressions.Md5Windows]] —
    * bit-exact with the explode(sequence)+substring+md5 chain it
    * replaces, without materializing a string per window; r17).
    * `posexplode` of this array is the (off, fp) pair stream. */
  private def md5WindowArr(text: Column, width: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.Md5Windows(
      GraftColumnBridge.expression(text), width))
  }

  /** Top-`k` TF-IDF terms per document.
    *
    * tf = raw term count in the doc; idf = ln((N+1)/(df+1)) + 1 (the
    * smoothed form — never divides by zero, never goes negative);
    * score = tf·idf. N = number of distinct documents, carried in-plan
    * via a broadcast 1-row aggregate (no driver round-trip).
    *
    * Shape: explode tokens → count by (doc, term) [shuffle 1, keyed on
    * the pair so partial aggregation absorbs in-doc repeats map-side] →
    * document frequency by term over the already-distinct pairs
    * [shuffle 2, |vocab| rows] → broadcast-joinable term table back
    * onto the pair counts [shuffle join on term] → per-doc top-k window
    * over candidate rows only (rows per doc = distinct terms, already
    * aggregated). Ties: equal scores rank by term ascending, so output
    * is deterministic and engine-independent.
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    // materialized once: both the document-frequency agg and the join
    // consume this frame, and its lineage (tokenize + explode + the
    // (id, term) shuffle) would otherwise run twice. The pair frame is
    // the SMALLEST representation of the corpus term data — the right
    // thing to pin even at scale.
    val pairs = df
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val docFreq = pairs.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count_distinct(col(idCol)).as("n_docs"))
    val scored = pairs
      .join(docFreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        col("tf") * (log((col("n_docs") + 1).cast("double") /
          (col("df") + 1).cast("double")) + 1.0))
    val w = Window.partitionBy("id")
      .orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank").cast("long").as("rank"), col("term"),
        col("tf"), col("df"), round(col("tfidf"), 6).as("tfidf"))
  }

  /** BM25 relevance of every document against a fixed query-term set —
    * the retrieval scorer a RAG / eval-harness pipeline runs over a
    * candidate corpus.
    *
    * score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) /
    *                        (tf(t,d) + k1·(1−b + b·|d|/avgdl)),
    * idf(t) = ln(1 + (N − df(t) + 0.5)/(df(t) + 0.5))
    * (Robertson–Spärck Jones, the non-negative Lucene form).
    *
    * Scale shape: the query-term set is tiny, so exploded tokens are
    * filtered to it AT THE SCAN (map-side `isin` — the corpus
    * vocabulary never shuffles, unlike [[tfidfTopTerms]] which must see
    * every term); per-(doc, term) tf and per-term df are |docs|·|terms|-
    * bounded; N and avgdl ride a broadcast 1-row aggregate. Cross-engine
    * determinism: the per-doc total is summed in FIXED term order
    * (one conditional-max per term, left-associated additions), never an
    * order-dependent double SUM; doc-length sums are integer-exact in
    * double. Docs matching no term are absent (score 0 by definition).
    *
    * Returns (id, bm25 round 6, n_terms = matched distinct terms). */
  def bm25(df: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k1 >= 0 && b >= 0 && b <= 1, s"bad BM25 params k1=$k1 b=$b")
    val terms = queryTerms.distinct
    val base = df.select(col(idCol).as("id"), tokens(col(textCol)).as("__t"))
    val lens = base.select(col("id"), size(col("__t")).cast(LongType).as("dl"))
    val stats = lens.agg(count(lit(1)).as("n_docs"),
      avg(col("dl").cast(DoubleType)).as("avgdl"))
    val tf = base
      .select(col("id"), explode(col("__t")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint() // df agg + scoring join both read it
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val contrib = tf
      .join(broadcast(dfreq), Seq("term"))
      .join(lens, Seq("id"))
      .crossJoin(broadcast(stats))
      .withColumn("c",
        log(lit(1.0) + (col("n_docs").cast(DoubleType) - col("df") + lit(0.5)) /
            (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl").cast(DoubleType) / col("avgdl"))))
    contrib.groupBy("id").agg(
      round(terms.map(t =>
          coalesce(max(when(col("term") === t, col("c"))), lit(0.0)))
        .reduce(_ + _), 6).as("bm25"),
      count(lit(1)).as("n_terms"))
  }

  /** Conjunctive (AND-semantics) retrieval: the top-`k` documents
    * containing EVERY query term, ranked by BM25 — the inverted-index
    * intersection query an eval harness or RAG gate runs when a match
    * on any single term is too weak a signal.
    *
    * The posting-list intersection is realized as counting: [[bm25]]
    * already emits n_terms = distinct matched terms per doc (its tf
    * table IS the query-filtered inverted index — the `isin` filter
    * kills the vocabulary tail at the scan, so only postings of the
    * |terms| query terms ever shuffle), so the AND is one predicate,
    * n_terms = |terms|. Global top-k runs as orderBy+limit — Spark
    * plans TakeOrderedAndProject (per-partition heaps + driver merge
    * of P·k rows), never a single-task sort of the match set; the
    * rank column is a window over the ≤ k surviving rows only.
    * Ties break toward the lower id on the ROUNDED score — the same
    * 6-decimal value both engines rank, so the order is engine-free.
    * Returns (rank, id, bm25). */
  def conjunctiveTopK(df: DataFrame, idCol: String, textCol: String,
                      queryTerms: Seq[String], k: Int,
                      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val n = queryTerms.distinct.size
    val top = bm25(df, idCol, textCol, queryTerms, k1, b)
      .filter(col("n_terms") === n)
      .orderBy(desc("bm25"), col("id"))
      .limit(k)
    top.withColumn("rank", row_number().over(
        Window.orderBy(desc("bm25"), col("id"))))
      .select("rank", "id", "bm25")
  }

  /** Corpus n-gram table: every word n-gram occurring at least
    * `minCount` times, with its total occurrences and document
    * frequency — the backing table for LM-style features and n-gram
    * contamination checks.
    *
    * Two narrow keyed aggregations: (ngram, doc) partial counts (map-
    * side combine absorbs in-doc repeats), then per-ngram totals over
    * the already-distinct pairs. Mixing count + count_distinct in ONE
    * agg would plan an Expand — every exploded row duplicated and the
    * partial agg keyed on (ngram, id, gid), shipping one row per
    * (partition, ngram, doc) through the shuffle; the two-step form
    * keeps both exchanges narrow. N-grams come from the tight-loop
    * kernel ([[graft.ops.Dedup.ngramStreamFast]]) — the HOF
    * slice+concat_ws construction re-copied the token array per n-gram
    * and dominated this query's cost (same finding as the minhash
    * shingle path). */
  def ngramCounts(df: DataFrame, idCol: String, textCol: String,
                  n: Int, minCount: Long): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val perDoc = df.select(col(idCol).as("id"),
        explode(Dedup.ngramStreamFast(col(textCol).cast("string"), n)).as("ngram"))
      .groupBy("ngram", "id").agg(count(lit(1)).as("c"))
    perDoc.groupBy("ngram")
      .agg(sum(col("c")).as("cnt"), count(lit(1)).as("n_docs"))
      .filter(col("cnt") >= minCount)
  }

  /** Collocation mining: the corpus's top-k adjacent-token pairs by
    * pointwise mutual information — the phrase-induction signal
    * tokenizer/vocab pipelines use to promote "new york"-style units
    * (Mikolov et al. 2013's phrase pass uses the same score shape).
    * PMI = ln(p(xy) / (p(x)·p(y))) with p(xy) over the bigram stream
    * and p(x) over the token stream; `minCount` suppresses the
    * noise floor (rare pairs otherwise dominate PMI).
    *
    * Shape: two narrow token scans (unigram + bigram counts, both
    * vocab-bounded aggs), the two stream totals as broadcast 1-row
    * frames, component-word lookups as keyed joins on the word, and a
    * distributed top-k — no driver state at any size. */
  def collocations(df: DataFrame, idCol: String, textCol: String,
                   minCount: Long, k: Int): DataFrame = {
    val text = col(textCol).cast("string")
    // both count tables feed a total AND a join — pinned once, like
    // tfidfTopTerms' pair frame (otherwise the unigram agg runs 3x:
    // total + two component-word joins)
    val uni = df.select(explode(tokens(text)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
      .localCheckpoint()
    val nu = uni.agg(sum(col("cw")).as("nu"))
    val biAll = df
      .select(explode(Dedup.ngramStreamFast(text, 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("cxy"))
      .localCheckpoint()
    val nb = biAll.agg(sum(col("cxy")).as("nb"))
    val scored = biAll.filter(col("cxy") >= minCount)
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .withColumn("w2", split(col("bg"), " ").getItem(1))
      .join(uni.select(col("w").as("w1"), col("cw").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("cw").as("c2")), Seq("w2"))
      .crossJoin(broadcast(nb)).crossJoin(broadcast(nu))
      .withColumn("pmi",
        log((col("cxy").cast("double") / col("nb").cast("double")) /
          ((col("c1").cast("double") / col("nu").cast("double")) *
           (col("c2").cast("double") / col("nu").cast("double")))))
    // global top-k: orderBy+limit plans as TakeOrderedAndProject — a
    // distributed per-partition top-k merged on the driver, never a
    // single-task window
    scored.orderBy(col("pmi").desc, col("bg").asc).limit(k)
      .select(col("w1"), col("w2"), col("cxy"),
        round(col("pmi"), 6).as("pmi"))
  }

  /** BPE merge-candidate statistics — the first iteration of
    * byte-pair-encoding tokenizer training at corpus scale: count
    * every adjacent character pair INSIDE words, weighted by word
    * frequency, and return the top-k merge candidates (the pair a BPE
    * trainer would merge first, then re-count). The corpus collapses
    * to its vocabulary before any pair work — pair extraction runs
    * over distinct words only (vocab-bounded, zero text re-scans), so
    * a trillion-token corpus costs one token-count agg plus work
    * proportional to |vocab|. Integer-only arithmetic: the oracle
    * compare is exact. */
  def bpePairCounts(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val vocab = df
      .select(explode(tokens(col(textCol).cast("string"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    vocab.filter(length(col("w")) >= 2)
      .select(col("freq"),
        explode(transform(sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy("pair").agg(sum(col("freq")).as("cnt"))
      .orderBy(desc("cnt"), col("pair")).limit(k)
  }

  /** Full byte-pair-encoding tokenizer TRAINING — the iterative loop
    * [[bpePairCounts]] is the first round of: merge the globally most
    * frequent adjacent symbol pair, rewrite every word, re-count,
    * `nMerges` times (Sennrich et al. 2016). Returns the merge table
    * (merge_rank, lhs, rhs, merged, cnt) — the trained tokenizer.
    *
    * Scale shape: the corpus collapses to its (word, freq) vocabulary
    * ONCE (the only scan of the text); every round then runs over
    * |vocab| rows — one pair-explode + one keyed agg (map-side
    * combinable) + a driver top-1 (one row per round; the merge table
    * IS the O(nMerges) driver artifact, like a kmeans centroid set).
    * Lineage is cut every `checkpointEvery` rounds (the Graph-loop
    * cadence) so the replace-chain plan never deepens unboundedly.
    *
    * Symbol state per word is a marker-delimited string
    * (`<h><e><l><l><o>`): symbols are [a-z]+ (the tokenizer's
    * alphabet), so `<`/`>` never collide and applying a merge is ONE
    * codegen'd `replace` of `<a><b>` with `<ab>` — string replace's
    * leftmost non-overlapping semantics are exactly BPE's greedy
    * merge scan, and the identical call replays in any engine. */
  def bpeTrain(df: DataFrame, textCol: String, nMerges: Int,
               checkpointEvery: Int = 3): DataFrame = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val spark = df.sparkSession
    import spark.implicits._
    var state = df
      .select(explode(tokens(col(textCol).cast("string"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .withColumn("st", concat(lit("<"),
        concat_ws("><", transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1)))), lit(">")))
      .transform(Checkpoints.cut)
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= nMerges && !exhausted) {
      val syms = split(expr("btrim(st, '><')"), "><")
      val top = state
        .filter(size(syms) >= 2)
        .select(col("freq"), explode(
          transform(sequence(lit(0), size(syms) - 2),
            i => concat(lit("<"), element_at(syms, i + 1), lit("><"),
              element_at(syms, i + 2), lit(">")))).as("pair"))
        .groupBy("pair").agg(sum(col("freq")).as("cnt"))
        .orderBy(desc("cnt"), col("pair")).limit(1)
        .collect()
      if (top.isEmpty) exhausted = true // every word fully merged
      else {
        val pair = top(0).getString(0)
        val cnt = top(0).getLong(1)
        val Array(left, right) =
          pair.stripPrefix("<").stripSuffix(">").split("><")
        val merged = s"<$left$right>"
        merges += ((r, left, right, left + right, cnt))
        val next = state.withColumn("st",
          org.apache.spark.sql.functions.replace(
            col("st"), lit(pair), lit(merged)))
        state =
          if (r % checkpointEvery == 0 || r == nMerges)
            next.transform(Checkpoints.cut)
          else next
        r += 1
      }
    }
    merges.result()
      .toDF("merge_rank", "lhs", "rhs", "merged", "cnt")
  }

  /** [[bpeTrain]] with the merge loop run DRIVER-LOCAL over the
    * aggregated vocabulary — the production-scale form. The corpus
    * collapses to (word, freq) in ONE distributed text scan (the only
    * data-volume-dependent step, exactly as [[bpeTrain]]); the merge
    * loop then runs in memory with the standard delta-recount
    * structure (lazy max-heap over pair counts + inverted index
    * pair → words containing it; each round touches only the words
    * containing the merged pair) — this is how SentencePiece /
    * HuggingFace tokenizer trainers work, and it removes [[bpeTrain]]'s
    * one-Spark-job-plus-one-collect PER MERGE ROUND: a 32k-merge
    * production vocab costs 32k sequential jobs there and ZERO here.
    *
    * Output is bit-identical to [[bpeTrain]] (spec-enforced): same
    * tokenizer, same greedy leftmost non-overlapping merge application,
    * and the same tie-break — count desc, then the marker-delimited
    * pair string `<l><r>` ascending (NOT (l, r) lexicographic: `<`
    * sorts below letters, so `<a><bc>` < `<ab><c>`).
    *
    * `vocabCap` bounds driver memory: top-cap words by (freq desc,
    * word asc). Exact equivalence holds when |vocab| <= cap; a 100 TB
    * corpus's [a-z]{2,15} vocabulary is itself bounded (well under
    * 10^7 real words), so the default cap is a safety rail, not a
    * sampling step. */
  def bpeTrainLocal(df: DataFrame, textCol: String, nMerges: Int,
                    vocabCap: Int = 2000000): DataFrame = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val spark = df.sparkSession
    import spark.implicits._
    val vocab: Array[(String, Long)] = df
      .select(explode(tokens(col(textCol).cast("string"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), col("w")).limit(vocabCap)
      .as[(String, Long)].collect()
    bpeMergeLoop(vocab.map(_._1.split("").filter(_.nonEmpty)),
        vocab.map(_._2), nMerges)
      .toDF("merge_rank", "lhs", "rhs", "merged", "cnt")
  }

  /** The driver-local delta-recount merge loop shared by
    * [[bpeTrainLocal]] (char symbols) and [[bpeTrainBytesLocal]] (hex
    * byte symbols): lazy max-heap over pair counts + inverted index
    * pair → words containing it; each round touches only the words
    * containing the merged pair. Tie-break: count desc, then the
    * marker-delimited pair string `<l><r>` ascending. */
  private def bpeMergeLoop(wordSyms: Array[Array[String]],
                           wordFreqs: Array[Long], nMerges: Int)
      : Seq[(Int, String, String, String, Long)] = {
    val words: Array[Array[String]] = wordSyms
    val freqs: Array[Long] = wordFreqs
    type Pair = (String, String)
    def pairStr(p: Pair): String = s"<${p._1}><${p._2}>"
    val counts = scala.collection.mutable.HashMap.empty[Pair, Long]
    val where = scala.collection.mutable.HashMap.empty[Pair, scala.collection.mutable.Set[Int]]
    // adjacent pairs of a symbol array, with multiplicity
    def pairsOf(syms: Array[String]): Iterator[Pair] =
      if (syms.length < 2) Iterator.empty
      else (0 until syms.length - 1).iterator.map(i => (syms(i), syms(i + 1)))
    var wi = 0
    while (wi < words.length) {
      pairsOf(words(wi)).foreach { p =>
        counts(p) = counts.getOrElse(p, 0L) + freqs(wi)
        where.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += wi
      }
      wi += 1
    }
    // lazy max-heap: entries are (count-at-push, pair); stale entries
    // (count changed since push) are discarded at pop
    val heapOrd: Ordering[(Long, Pair)] = Ordering.by {
      case (c, p) => (c, ReverseStringOrd(pairStr(p)))
    }
    val heap = scala.collection.mutable.PriorityQueue.empty[(Long, Pair)](heapOrd)
    counts.foreach { case (p, c) => heap.enqueue((c, p)) }

    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= nMerges && !exhausted) {
      // pop to the first non-stale entry
      var best: Option[(Long, Pair)] = None
      while (best.isEmpty && heap.nonEmpty) {
        val (c, p) = heap.dequeue()
        if (counts.get(p).contains(c) && c > 0) best = Some((c, p))
      }
      best match {
        case None => exhausted = true
        case Some((cnt, pair @ (l, rgt))) =>
          merges += ((r, l, rgt, l + rgt, cnt))
          val affected = where.getOrElse(pair, scala.collection.mutable.Set.empty)
            .toArray.sorted
          // every pair whose count changes this round gets ONE fresh
          // heap entry at its end-of-round value — a pair that was
          // only decremented would otherwise have nothing but stale
          // (too-high) entries and become unfindable at pop time
          val changed = scala.collection.mutable.Set.empty[Pair]
          affected.foreach { i =>
            val syms = words(i)
            val f = freqs(i)
            // greedy leftmost non-overlapping merge — the exact
            // semantics of string replace on the delimited form
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == rgt) {
                out += (l + rgt); j += 2
              } else { out += syms(j); j += 1 }
            }
            val next = out.toArray
            // delta recount: retract this word's old pairs (with
            // multiplicity), drop its membership, then add the new form
            pairsOf(syms).foreach { p =>
              val c2 = counts.getOrElse(p, 0L) - f
              if (c2 <= 0L) counts.remove(p) else counts(p) = c2
              changed += p
            }
            pairsOf(syms).toSet.foreach { (p: Pair) =>
              where.get(p).foreach(_ -= i)
            }
            words(i) = next
            pairsOf(next).foreach { p =>
              counts(p) = counts.getOrElse(p, 0L) + f
              where.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += i
              changed += p
            }
          }
          counts.remove(pair)
          where.remove(pair)
          changed.foreach(p => counts.get(p).foreach(c => heap.enqueue((c, p))))
          r += 1
      }
    }
    merges.result()
  }

  /** Byte-level BPE trainer (the GPT-2 / tiktoken-family base
    * representation): words are WHITESPACE-split — case, punctuation,
    * and non-ASCII survive, unlike [[tokens]]' `[a-z]` stream — and
    * each word becomes its UTF-8 byte sequence with a 256-symbol base
    * alphabet, so NOTHING is ever out-of-vocabulary: any string in
    * any script decomposes to bytes. Merges then run exactly as in
    * [[bpeTrainLocal]] (same [[bpeMergeLoop]], same count-desc /
    * pair-asc tie-break), so a merge can span UTF-8 continuation
    * bytes and multibyte characters coalesce like any other pair.
    *
    * Symbols are published as 2-hex-digit-per-byte lowercase strings
    * ("c3a9" = é) rather than raw bytes: hex is pure ASCII, so JVM
    * string order = DuckDB byte order and the oracle replay is exact
    * for ARBITRARY input text — the vocabulary-cap and tie-break
    * orderings compare hex strings, never raw multibyte words (the
    * UTF-16-vs-UTF-8 collation trap the unigram trainer documents).
    *
    * Scale shape: identical to [[bpeTrainLocal]] — ONE distributed
    * scan collapses the corpus to (word, freq); the merge loop is
    * driver-local with delta recounts. */
  def bpeTrainBytesLocal(df: DataFrame, textCol: String, nMerges: Int,
                         vocabCap: Int = 2000000): DataFrame = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val spark = df.sparkSession
    import spark.implicits._
    val vocab: Array[(String, Long)] = df
      .filter(col(textCol).isNotNull)
      .select(explode(filter(split(col(textCol).cast("string"), "\\s+"),
        t => length(t) > 0)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .withColumn("hx", lower(hex(encode(col("w"), "UTF-8"))))
      .orderBy(desc("freq"), col("hx"))
      .limit(vocabCap)
      .select("hx", "freq")
      .as[(String, Long)].collect()
    bpeMergeLoop(vocab.map(_._1.grouped(2).toArray), vocab.map(_._2),
        nMerges)
      .toDF("merge_rank", "lhs", "rhs", "merged", "cnt")
  }

  /** Byte-level BPE ENCODE with a [[bpeTrainBytesLocal]] merge table:
    * the corpus vocabulary (whitespace words) in hex-byte form, merges
    * applied in rank order as a replace-chain projection (the
    * [[bpeEncode]] algebra on hex symbols). Returns (w, freq, pieces,
    * n_pieces) with pieces space-joined lowercase hex. */
  def bpeEncodeBytes(df: DataFrame, textCol: String,
                     mergeTable: Seq[(String, String)]): DataFrame = {
    val vocab = df
      .filter(col(textCol).isNotNull)
      .select(explode(filter(split(col(textCol).cast("string"), "\\s+"),
        t => length(t) > 0)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .withColumn("st", regexp_replace(
        lower(hex(encode(col("w"), "UTF-8"))),
        "([0-9a-f]{2})", "<$1>"))
    val encoded = mergeTable.foldLeft(vocab) { case (acc, (l, rgt)) =>
      acc.withColumn("st", org.apache.spark.sql.functions.replace(
        col("st"), lit(s"<$l><$rgt>"), lit(s"<$l$rgt>")))
    }
    encoded
      .withColumn("pieces",
        org.apache.spark.sql.functions.replace(
          expr("btrim(st, '><')"), lit("><"), lit(" ")))
      .withColumn("n_pieces", size(split(col("pieces"), " ")).cast("long"))
      .select(col("w"), col("freq"), col("pieces"), col("n_pieces"))
  }

  /** Reverse-ordering wrapper so the max-heap's secondary key is the
    * delimited pair string ASCENDING (count desc is primary). */
  private case class ReverseStringOrd(s: String) extends Ordered[ReverseStringOrd] {
    def compare(that: ReverseStringOrd): Int = that.s.compareTo(s)
  }

  /** BPE ENCODE with a [[bpeTrain]]-trained merge table: apply the
    * merges to every distinct word in rank order (sequential
    * application in learned order is the reference BPE segmenter —
    * Sennrich's original formulation), then join segments back to the
    * corpus vocabulary. Returns (w, freq, pieces, n_pieces) — pieces
    * space-joined. The merge table is a driver-side list (O(nMerges));
    * encoding is a pure projection chain of `replace` calls over the
    * vocab, so the whole encoder is one narrow stage at any corpus
    * size. */
  def bpeEncode(df: DataFrame, textCol: String,
                mergeTable: Seq[(String, String)]): DataFrame = {
    val vocab = df
      .select(explode(tokens(col(textCol).cast("string"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .withColumn("st", concat(lit("<"),
        concat_ws("><", transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1)))), lit(">")))
    val encoded = mergeTable.foldLeft(vocab) { case (acc, (l, rgt)) =>
      acc.withColumn("st", org.apache.spark.sql.functions.replace(
        col("st"), lit(s"<$l><$rgt>"), lit(s"<$l$rgt>")))
    }
    encoded
      .withColumn("pieces",
        org.apache.spark.sql.functions.replace(
          expr("btrim(st, '><')"), lit("><"), lit(" ")))
      .withColumn("n_pieces", size(split(col("pieces"), " ")).cast("long"))
      .select(col("w"), col("freq"), col("pieces"), col("n_pieces"))
  }

  // ---- unigram-LM tokenizer (the OTHER trainer modern LLM pipelines
  // use beside BPE): Kudo 2018 "Subword Regularization", trained here
  // by Viterbi hard-EM over a fixed seeded piece vocabulary ----

  /** Integer log2 table of the unigram trainer: for x ≥ 1,
    * L(x) = 256·b + ⌊x·256 / 2^b⌋ − 256 with b = ⌊log2 x⌋ — a
    * monotone fixed-point approximation of 256·log2 x (max error
    * ~0.09 bits; the fastText log-table discipline). Chosen so every
    * EM quantity is an exact INTEGER: Viterbi comparisons and
    * re-estimated scores replay bit-identically in the DuckDB oracle
    * (`length(bin(x))` + exact dyadic division), where a float `ln`
    * could flip a near-tie in the last ulp between engines. Exact for
    * x < 2^55 (the shift headroom) — far above any corpus count. */
  private[graft] def ilog(x: Long): Long = {
    require(x >= 1, s"ilog needs x >= 1, got $x")
    val b = 63 - java.lang.Long.numberOfLeadingZeros(x)
    256L * b + ((x << 8) >> b) - 256L
  }

  /** Shared core of [[unigramTrainLocal]]/[[unigramEncode]] — the
    * driver-local EM (the [[bpeTrainLocal]] discipline: ONE distributed
    * text scan collapses the corpus to (word, freq), everything after
    * runs in memory; zero per-iteration Spark jobs).
    *
    * Algorithm: seed pieces = every substring of length ≤ maxPieceLen
    * of the top-`wordCap` words (overlapping occurrences, frequency-
    * weighted); vocabulary = top-`pieceCap` seeds by (count desc,
    * piece asc) ∪ all single characters (coverage guarantee — Viterbi
    * always has a path). Each EM iteration: E = Viterbi-segment every
    * word under piece scores L(c+1) − L(T+V) (add-one smoothing keeps
    * unused pieces scoreable; T = Σ counts, V = vocab size); M =
    * piece counts re-estimated from the segmentations. The vocabulary
    * is FIXED after seeding (no pruning schedule) — a documented
    * simplification of Kudo's shrink-loop that keeps both engines on
    * one exact-integer replay. Viterbi tie-break: max score, then
    * fewest pieces, then lexicographically smallest separator-joined
    * path — all-ASCII tokens, so JVM UTF-16 and DuckDB byte order
    * agree. Returns (words, vocab sorted, final counts, final total,
    * segmenter under the final scores). */
  private def unigramCore(df: DataFrame, textCol: String, wordCap: Int,
                          pieceCap: Int, maxPieceLen: Int, maxWordLen: Int,
                          iterations: Int)
      : (Array[(String, Long)], Array[String], Map[String, Long], Long,
         String => Seq[String]) = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(maxPieceLen >= 1 && maxWordLen >= 1, "piece/word caps must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val words: Array[(String, Long)] = df
      .select(explode(tokens(col(textCol).cast("string"))).as("w"))
      .filter(length(col("w")) <= maxWordLen)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), col("w")).limit(wordCap)
      .as[(String, Long)].collect()
    val seed = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (w, f) =>
      var s = 0
      while (s < w.length) {
        var l = 1
        while (l <= maxPieceLen && s + l <= w.length) {
          val p = w.substring(s, s + l)
          seed(p) = seed.getOrElse(p, 0L) + f
          l += 1
        }
        s += 1
      }
    }
    val top = seed.toSeq.sortBy { case (p, c) => (-c, p) }
      .take(pieceCap).map(_._1)
    val chars = words.iterator.flatMap(_._1.iterator.map(_.toString)).toSet
    val vocab: Array[String] = (top.toSet ++ chars).toArray.sorted
    val vSize = vocab.length
    def scoresOf(cnts: Map[String, Long]): (Map[String, Long], Long) = {
      val t = cnts.valuesIterator.sum + vSize
      (cnts.map { case (p, c) => p -> (ilog(c + 1) - ilog(t)) }, t)
    }
    def viterbi(sc: Map[String, Long])(w: String): Seq[String] = {
      val n = w.length
      val dpScore = new Array[Long](n + 1)
      val dpK = new Array[Int](n + 1)
      val dpPath = new Array[String](n + 1)
      dpPath(0) = ""
      var p = 1
      while (p <= n) {
        var bestScore = Long.MinValue; var bestK = 0
        var bestPath: String = null
        var l = 1
        while (l <= maxPieceLen && l <= p) {
          val piece = w.substring(p - l, p)
          sc.get(piece) match {
            case Some(s0) =>
              val cand = dpScore(p - l) + s0
              val candK = dpK(p - l) + 1
              val candPath = dpPath(p - l) + "\u001f" + piece
              if (bestPath == null || cand > bestScore ||
                  (cand == bestScore && (candK < bestK ||
                    (candK == bestK && candPath.compareTo(bestPath) < 0)))) {
                bestScore = cand; bestK = candK; bestPath = candPath
              }
            case None => ()
          }
          l += 1
        }
        // every position is reachable for trained words (all single
        // chars are vocab pieces); fail FAST if the segmenter is ever
        // handed an out-of-vocab character — an unreachable dp state
        // would otherwise overflow Long.MinValue + score into a huge
        // positive value and emit a "null"-contaminated path
        require(bestPath != null,
          s"unigram viterbi: position $p of '$w' unreachable " +
            "(out-of-vocabulary character?)")
        dpScore(p) = bestScore; dpK(p) = bestK; dpPath(p) = bestPath
        p += 1
      }
      if (n == 0) Seq.empty
      else dpPath(n).substring(1).split("\u001f", -1).toSeq
    }
    var counts: Map[String, Long] =
      vocab.iterator.map(p => p -> seed(p)).toMap
    var it = 0
    while (it < iterations) {
      val (sc, _) = scoresOf(counts)
      val next = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (w, f) =>
        viterbi(sc)(w).foreach(p => next(p) = next.getOrElse(p, 0L) + f)
      }
      counts = vocab.iterator.map(p => p -> next.getOrElse(p, 0L)).toMap
      it += 1
    }
    val (finalScores, finalTotal) = scoresOf(counts)
    (words, vocab, counts, finalTotal, viterbi(finalScores))
  }

  /** Unigram-LM tokenizer trainer (SentencePiece's model family).
    * Returns the trained vocabulary after `iterations` Viterbi-EM
    * rounds: (piece, cnt, score) — cnt the final E-step usage count,
    * score the integer log-probability L(cnt+1) − L(T+V) the encoder
    * segments with. See [[unigramCore]] for the algorithm and the
    * exact-integer replay contract. Reference scope: the reference
    * ships no tokenizer trainer — this extends the LLM-pipeline
    * surface beside [[bpeTrainLocal]] (r11 verdict #7).
    *
    * ASCII replay contract: input text may be arbitrary, but the word
    * stream is [[graft.text.Tokenize.tokens]] — every token matches
    * `[a-z]{2,15}` by construction, so all pieces are single-byte
    * ASCII and the lexicographic tie-break agrees between JVM UTF-16
    * `compareTo` and DuckDB byte order (and substring/length mean the
    * same thing in both engines). Swapping in a tokenizer that can
    * emit non-ASCII tokens voids the cross-engine parity guarantee. */
  def unigramTrainLocal(df: DataFrame, textCol: String, wordCap: Int = 1000,
                        pieceCap: Int = 150, maxPieceLen: Int = 4,
                        maxWordLen: Int = 16, iterations: Int = 2): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (_, vocab, counts, total, _) = unigramCore(df, textCol, wordCap,
      pieceCap, maxPieceLen, maxWordLen, iterations)
    vocab.toSeq.map { p =>
      (p, counts(p), ilog(counts(p) + 1) - ilog(total))
    }.toDF("piece", "cnt", "score").orderBy("piece")
  }

  /** Viterbi encoding under the trained unigram vocabulary: the
    * collected words segmented with the FINAL post-EM scores (the
    * third Viterbi pass for iterations = 2). Returns
    * (w, freq, pieces, n_pieces), pieces space-joined — the [[bpeEncode]]
    * output shape. */
  def unigramEncode(df: DataFrame, textCol: String, wordCap: Int = 1000,
                    pieceCap: Int = 150, maxPieceLen: Int = 4,
                    maxWordLen: Int = 16, iterations: Int = 2): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (words, _, _, _, segment) = unigramCore(df, textCol, wordCap,
      pieceCap, maxPieceLen, maxWordLen, iterations)
    words.toSeq.map { case (w, f) =>
      val ps = segment(w)
      (w, f, ps.mkString(" "), ps.size.toLong)
    }.toDF("w", "freq", "pieces", "n_pieces").orderBy("w")
  }

  /** Tokenizer fertility report — the per-group quality gauge of a
    * trained BPE vocabulary: pieces-per-word (fertility; high values
    * mean the vocab serves that group badly and its documents cost
    * more sequence length per content) and chars-per-piece, grouped by
    * `groupCol` (typically language — the multilingual-tokenizer
    * fairness report).
    *
    * Shape: the token stream pre-aggregates to DISTINCT (group, word)
    * counts BEFORE joining the |vocab|-row encode table — the join
    * input is vocabulary-bounded, not corpus-bounded, and all sums are
    * integers until the two final divisions (exact cross-engine).
    * Returns (g, n_words, n_pieces, pieces_per_word, chars_per_piece). */
  def bpeFertility(df: DataFrame, textCol: String, groupCol: String,
                   mergeTable: Seq[(String, String)]): DataFrame = {
    val enc = bpeEncode(df, textCol, mergeTable)
      .select(col("w"), col("n_pieces"))
    val gw = df.filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("g"),
        explode(tokens(col(textCol).cast("string"))).as("w"))
      .groupBy("g", "w").agg(count(lit(1)).as("cnt"))
    gw.join(enc, "w")
      .groupBy("g")
      .agg(sum("cnt").as("n_words"),
        sum(col("cnt") * col("n_pieces")).as("n_pieces"),
        sum(col("cnt") * length(col("w")).cast("long")).as("n_chars"))
      .select(col("g"), col("n_words"), col("n_pieces"),
        round(col("n_pieces").cast("double") / col("n_words"), 6)
          .as("pieces_per_word"),
        round(col("n_chars").cast("double") / col("n_pieces"), 6)
          .as("chars_per_piece"))
  }

  /** Passage-level exact-duplicate statistics — the chunked
    * approximation of suffix-array substring dedup (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"): split
    * each document's token stream into consecutive `passageTokens`-token
    * passages (tail partial passage included), fingerprint each with
    * md5, and report per document how many of its passages also occur
    * in at least one OTHER document. `dup_passage_frac` is the standard
    * filter signal for boilerplate-contaminated documents whose full
    * text is unique but whose parts are copies.
    *
    * Shape: tokenize + chunk is a narrow map; (id, fp) pair counts
    * [shuffle 1, keyed on the pair — map-side combine absorbs in-doc
    * repeats]; per-fp document frequency over the already-distinct
    * pairs [shuffle 2, |distinct passages| rows]; join back on fp
    * [shuffle 3] and one per-doc agg. Every shuffle key is a 32-hex
    * md5 or a document id — raw text never enters an exchange, so the
    * shape holds at corpus scale. The pair frame feeds both the
    * doc-frequency agg and the join, so it is pinned once
    * (localCheckpoint) like [[tfidfTopTerms]]'s.
    */
  def passageDupStats(df: DataFrame, idCol: String, textCol: String,
                      passageTokens: Int): DataFrame = {
    require(passageTokens >= 1, s"passageTokens must be >= 1, got $passageTokens")
    val p = passageTokens
    val chunks = df
      .select(col(idCol).as("id"),
        explode(Dedup.passagesFast(col(textCol).cast("string"), p)).as("passage"))
      .select(col("id"), md5(col("passage").cast("binary")).as("fp"))
    val pairs = chunks.groupBy("id", "fp").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val docFreq = pairs.groupBy("fp").agg(count(lit(1)).as("n_docs"))
    val perDoc = pairs.join(docFreq, Seq("fp"))
      .groupBy("id").agg(
        sum(col("c")).as("n_passages"),
        sum(when(col("n_docs") > 1, col("c")).otherwise(lit(0L)))
          .as("n_dup_passages"))
    df.select(col(idCol).as("id")).distinct()
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_passages"), lit(0L)).as("n_passages"),
        coalesce(col("n_dup_passages"), lit(0L)).as("n_dup_passages"),
        round(coalesce(col("n_dup_passages").cast("double") /
          col("n_passages").cast("double"), lit(0.0)), 6)
          .as("dup_passage_frac"))
  }

  /** Character-window exact-substring dedup coverage — the
    * sliding-window form of suffix-based training-data dedup: a
    * `width`-char window (sampled every `stride` chars) that appears
    * in more than one document marks a duplicated span, catching
    * copies that cross token/passage boundaries where
    * [[passageDupStats]]'s aligned chunks would miss them. Per doc:
    * window count, windows shared with another doc, duplicated
    * fraction.
    *
    * Shape: window extraction is a pure projection (sequence +
    * transform + explode — no shuffle); each window is fingerprinted
    * to a 32-hex md5 BEFORE the first exchange, so raw text never
    * enters a shuffle. The (id, fp) counts / per-fp doc frequency /
    * join-back aggs are the same three keyed shuffles as
    * [[passageDupStats]], with the pair frame pinned once because it
    * feeds both the frequency agg and the join. Docs shorter than
    * `width` contribute no windows and report a 0.0 fraction.
    */
  def windowDupStats(df: DataFrame, idCol: String, textCol: String,
                     width: Int, stride: Int): DataFrame = {
    require(width >= 1, s"width must be >= 1, got $width")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val c = col(textCol).cast("string")
    val wins = df
      .filter(c.isNotNull && length(c) >= width)
      .select(col(idCol).as("id"),
        explode(expr(
          s"transform(sequence(0, CAST(length(CAST($textCol AS STRING)) AS INT) - $width, $stride), " +
            s"i -> substring(CAST($textCol AS STRING), i + 1, $width))")).as("win"))
      .select(col("id"), md5(col("win").cast("binary")).as("fp"))
    val pairs = wins.groupBy("id", "fp").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val docFreq = pairs.groupBy("fp").agg(count(lit(1)).as("n_docs"))
    val perDoc = pairs.join(docFreq, Seq("fp"))
      .groupBy("id").agg(
        sum(col("c")).as("n_windows"),
        sum(when(col("n_docs") > 1, col("c")).otherwise(lit(0L)))
          .as("n_dup_windows"))
    df.select(col(idCol).as("id")).distinct()
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        round(coalesce(col("n_dup_windows").cast("double") /
          col("n_windows").cast("double"), lit(0.0)), 6)
          .as("dup_window_frac"))
  }

  /** Exact-substring span REMOVAL — the text-rewriting form of
    * training-data dedup (Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better"): every `width`-char window
    * (sampled every `stride` chars) that occurs more than once in the
    * corpus is removed from every document except the globally first
    * occurrence (min (doc, offset)), and each surviving document's
    * text is rebuilt with the duplicated spans cut out. Unlike
    * [[windowDupStats]] (which only reports coverage), this returns
    * the cleaned corpus: (id, clean_text, n_spans_removed,
    * n_chars_removed).
    *
    * Shape: window offsets are a pure projection (sequence + explode,
    * no shuffle) and each window is reduced to a 16-byte md5 before
    * the first exchange — raw text never enters a shuffle. First-
    * occurrence election is one hash agg keyed on the fingerprint
    * (min (id, off) carried as a struct min: associative, map-side
    * combinable — no window function, no skewed single task); the
    * removal set comes back via a self-join on the same fp key (the
    * partitioning is reused). Per-doc interval merging and text
    * rebuild are array HOFs over each doc's own (sorted, tiny) span
    * list — O(spans) per doc, no cross-row state. The only join that
    * touches text again is (doc → merged intervals), keyed on the doc
    * id; the interval side holds a few ints per duplicated doc.
    */
  def spanRemoval(df: DataFrame, idCol: String, textCol: String,
                  width: Int, stride: Int): DataFrame = {
    require(width >= 1, s"width must be >= 1, got $width")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val base = df.select(col(idCol).cast(LongType).as("id"),
      col(textCol).cast("string").as("text"))
    val winsAll = {
      val filtered = base
        .filter(col("text").isNotNull && length(col("text")) >= width)
      // stride 1 (q198/q210 precision grade) rides the one-pass kernel;
      // strided grids keep the chain (the kernel would hash the
      // off-grid windows only to drop them)
      val pairs =
        if (stride == 1)
          filtered.select(col("id"),
            posexplode(md5WindowArr(col("text"), width)).as(Seq("off", "fp")))
        else filtered
          .select(col("id"), col("text"),
            explode(expr(s"sequence(0, CAST(length(text) AS INT) - $width, $stride)"))
              .as("off"))
          .select(col("id"), col("off"),
            md5(expr(s"CAST(substring(text, off + 1, $width) AS BINARY)")).as("fp"))
      pairs
        .select(col("id"), col("off").cast("int").as("off"), col("fp"))
        .withColumn("__ph", xxhash64(col("fp")))
        .localCheckpoint() // feeds bloom build, the election agg, and the join back
    }
    // map-side singleton pruning (r10 verdict #2): provably-singleton
    // windows die at the scan instead of riding the fp exchange; the
    // exact occ-count over the survivors still decides duplication,
    // so bloom collisions cost shuffle rows, never correctness
    val bloom = df.sparkSession.sparkContext.broadcast(
      buildDupBloom(winsAll, "__ph", estimateWindows(base, "text", width)))
    val mightDup = udf((h: Long) => bloom.value.mightBeDup(h))
    val wins = winsAll.filter(mightDup(col("__ph")))
      .select("id", "off", "fp")
    val first = wins.groupBy("fp").agg(
      min(struct(col("id"), col("off"))).as("first"),
      count(lit(1)).as("occ"))
    val removed = wins.join(first, Seq("fp"))
      .filter(col("occ") > 1 && struct(col("id"), col("off")) =!= col("first"))
      .select(col("id"), col("off"))
    cutSpans(base, removed, width)
  }

  /** Shared cut-and-rebuild tail of the span-removal family: merge the
    * marked constant-width offsets per doc, cut every merged interval
    * out, and rebuild the text from the gaps — one keyed join back to
    * the text, array HOFs per doc. Input `removed`: (id, off).
    * Returns (id, clean_text, n_spans_removed, n_chars_removed). */
  private def cutSpans(base: DataFrame, removed: DataFrame,
                       width: Int): DataFrame = {
    val spans = mergeOffsetsSegmented(removed, width)
    base.join(spans, Seq("id"), "left")
      .select(col("id"), col("text"), col("merged"),
        when(col("merged").isNull, col("text")).otherwise(expr(
          """aggregate(merged, named_struct('p', 0, 'acc', CAST('' AS STRING)),
            |  (st, iv) -> named_struct('p', iv.e,
            |    'acc', concat(st.acc, substring(text, st.p + 1, iv.s - st.p))),
            |  st -> concat(st.acc, substring(text, st.p + 1, length(text) - st.p)))
            |""".stripMargin.trim)).as("clean_text"))
      .select(col("id"), col("clean_text"),
        coalesce(size(col("merged")), lit(0)).cast(LongType).as("n_spans_removed"),
        coalesce(length(col("text")) - length(col("clean_text")), lit(0))
          .cast(LongType).as("n_chars_removed"))
  }

  /** Cross-corpus exact-substring DECONTAMINATION rewrite — the action
    * form of [[ngramContamination]]'s report and the benchmark-leak
    * counterpart of [[spanRemoval]]: every train-corpus character span
    * whose every stride-1 `minLen`-gram also occurs ANYWHERE in the
    * test corpus is cut from the train text at its maximal extent (no
    * first-occurrence election — leaked benchmark text must survive
    * NOWHERE in the training set, per the GPT-3 / Lee et al. 2022
    * decontamination recipe, applied at character level so paraphrase
    * punctuation or casing differences don't hide a verbatim core).
    *
    * Shape: both corpora reduce their stride-1 windows to md5
    * fingerprints at the scan (text never shuffles); the test side
    * collapses to DISTINCT fps; marking is ONE fp-keyed left-semi
    * join; the cut is the shared constant-width merge + gap rebuild.
    *
    * The marking join is explicitly SIZE-GATED (r10 verdict #8) —
    * the original form assumed a benchmark-sized test corpus and
    * would silently tip into a full shuffle of per-character train
    * windows if handed a large one. A cheap Σ max(len − minLen + 1,
    * 0) agg estimates the test window count (exact for stride 1):
    * at or under `maxBroadcastWindows` (default 1M; each distinct fp
    * costs ~56 B as a broadcast UnsafeRow — 32-byte hex UTF8 + row
    * overhead — so the forced broadcast tops out near 56 MB, safe on
    * an ordinary driver; benchmark suites are orders of magnitude
    * smaller still) the
    * distinct test fps BROADCAST and the train side never shuffles;
    * above it, a [[DupBloom]] membership filter over the test fps
    * (32 MiB broadcast, built map-side) kills provably-clean train
    * windows at the scan, and only the surviving fraction rides the
    * shuffled semi-join against the distinct test fps — the exact
    * join still decides marking, so bloom collisions cost shuffle
    * rows, never results. Both routes mark the same set
    * (spec-enforced route parity).
    * Returns (id, clean_text, n_spans_removed, n_chars_removed) for
    * EVERY train doc (clean docs pass through unchanged). */
  def decontaminateSubstrings(train: DataFrame, test: DataFrame,
                              idCol: String, textCol: String,
                              minLen: Int,
                              maxBroadcastWindows: Long = 1000000L): DataFrame = {
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    val base = train.select(col(idCol).cast(LongType).as("id"),
      col(textCol).cast("string").as("text"))
    def windows(df: DataFrame, withId: Boolean): DataFrame = {
      val cols = if (withId) Seq(col("id")) else Seq.empty[Column]
      df.filter(col("text").isNotNull && length(col("text")) >= minLen)
        .select(cols :+
          posexplode(md5WindowArr(col("text"), minLen)).as(Seq("off", "fp")): _*)
    }
    val testBase = test.select(col(textCol).cast("string").as("text"))
    val testFp = windows(testBase, withId = false).select("fp").distinct()
    val trainWins = windows(base, withId = true)
      .select(col("id"), col("off").cast("int").as("off"), col("fp"))
    val testWinEst = estimateWindows(testBase, "text", minLen)
    val marked =
      (if (testWinEst <= maxBroadcastWindows)
         trainWins.join(broadcast(testFp), Seq("fp"), "left_semi")
       else {
         val testHashed = windows(testBase, withId = false)
           .select(xxhash64(col("fp")).as("__ph"))
         val bloom = train.sparkSession.sparkContext.broadcast(
           buildDupBloom(testHashed, "__ph", testWinEst))
         val mightHit = udf((h: Long) => bloom.value.mightContain(h))
         trainWins.filter(mightHit(xxhash64(col("fp"))))
           .join(testFp, Seq("fp"), "left_semi")
       }).select("id", "off")
    cutSpans(base, marked, minLen)
  }

  /** Per-doc merge of constant-width marked offsets into maximal
    * [s, e) intervals — the shared tail of the exact-substring dedup
    * family. Input: (id, offs) with offs SORTED ascending; a window
    * starting at or before the running end extends it. With a
    * CONSTANT width over sorted offsets the running end of a group is
    * always its last member's offset + width, so "starts a new
    * interval" is the purely local test offs[i] > offs[i-1] + width:
    * break positions via one filter, each interval via one indexed
    * transform — O(spans) per doc, no per-step array reconstruction
    * (a fold that slices+concats the accumulator would be O(spans²)
    * on span-riddled docs). `keyCols` pass through (the segmented
    * caller keys on (id, segment)). Returns
    * (keyCols..., merged: array<struct<s,e>>). */
  private def mergeConstWidthOffsets(grouped: DataFrame, width: Int,
                                     keyCols: Seq[String] = Seq("id")): DataFrame =
    grouped
      .select(keyCols.map(col) :+ col("offs") :+ expr(
        // greatest(i - 1, 1) keeps the i = 1 probe index legal even if
        // both arms evaluate — the OR's first arm decides that row, but
        // relying on short-circuit order to dodge element_at(offs, 0)
        // would break under any predicate reordering
        s"""filter(sequence(1, size(offs)), i ->
           |  i = 1 OR element_at(offs, i) >
           |    element_at(offs, greatest(i - 1, 1)) + $width)
           |""".stripMargin.trim).as("starts"): _*)
      .select(keyCols.map(col) :+ expr(
        s"""transform(starts, (st, k) -> named_struct(
           |  's', element_at(offs, st),
           |  'e', element_at(offs, CASE WHEN k + 2 <= size(starts)
           |         THEN element_at(starts, k + 2) - 1
           |         ELSE size(offs) END) + $width))
           |""".stripMargin.trim).as("merged"): _*)

  /** Segmented per-doc merge of constant-width marked offsets — the
    * bounded-state form of groupBy(id) + [[mergeConstWidthOffsets]]
    * (r10 verdict #4). A span-riddled long document (100 MB of
    * boilerplate, every window marked) used to build ONE
    * collect_list row holding every raw offset (4 bytes/char — a
    * multi-hundred-MB aggregation row) before the HOF merge. Here
    * offsets first group by (id, off div `segChars`): each such group
    * holds ≤ segChars raw offsets, merges to intervals locally, and
    * only the merged INTERVALS reach the per-doc group — for the
    * pathological all-duplicated doc that is ONE interval per
    * segment (doc_len / segChars structs instead of doc_len ints).
    * A doc with genuinely many disjoint spans still carries one
    * struct per span — that is the output's own cardinality, not
    * amplification.
    *
    * Stitching is exact, by construction: with segChars ≥ width,
    * (a) within a segment merged intervals are strictly disjoint
    * (next.s > prev.e — the merge's break condition), (b) an
    * interval can only overlap/touch intervals of the ADJACENT
    * segment (it extends < width past its segment), and (c) interval
    * ends are strictly increasing in the (seg, s)-sorted flattened
    * list (B.s ≥ A's last raw offset + 1 ⟹ B.e = B_last + width >
    * A.e), so the purely LOCAL pairwise test s_i ≤ e_(i−1) decides
    * every run and the run's last member carries its max end — the
    * same filter/transform discipline as the inner merge, and
    * provably the same intervals the unsegmented merge produces
    * (adjacency s = prev_e merges in both: the inner break is
    * strictly `>` width-gap, the stitch is strictly `>` prev.e).
    * Input: (id, off); returns (id, merged: array<struct<s,e>>). */
  private def mergeOffsetsSegmented(removed: DataFrame, width: Int,
                                    segChars: Int = 1 << 16): DataFrame = {
    val seg = math.max(segChars, width)
    val within = mergeConstWidthOffsets(
      removed
        .withColumn("__seg", expr(s"CAST(off DIV $seg AS INT)"))
        .groupBy("id", "__seg")
        .agg(sort_array(collect_list(col("off"))).as("offs")),
      width, keyCols = Seq("id", "__seg"))
    within
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("__seg"), col("merged"))))
        .as("__parts"))
      .select(col("id"),
        flatten(expr("transform(__parts, p -> p.merged)")).as("ivs"))
      .select(col("id"), col("ivs"), expr(
        """filter(sequence(1, size(ivs)), i ->
          |  i = 1 OR element_at(ivs, i).s >
          |    element_at(ivs, greatest(i - 1, 1)).e)
          |""".stripMargin.trim).as("starts"))
      .select(col("id"), expr(
        """transform(starts, (st, k) -> named_struct(
          |  's', element_at(ivs, st).s,
          |  'e', element_at(ivs, CASE WHEN k + 2 <= size(starts)
          |         THEN element_at(starts, k + 2) - 1
          |         ELSE size(ivs) END).e))
          |""".stripMargin.trim).as("merged"))
  }

  /** Build a [[ShardedDupBloom]] over `hashCol` (BIGINT) of `wins` —
    * one map-side pass + a logarithmic treeReduce merge, no shuffle of
    * the rows themselves. Geometry from `expectedAdds` (callers
    * estimate window counts as Σ max(len − L + 1, 0) — a cheap agg,
    * no explode): one sub-2^27 filter at probe/benchmark widths,
    * key-range shards past the single-filter cap. */
  private def buildDupBloom(wins: DataFrame, hashCol: String,
                            expectedAdds: Long): ShardedDupBloom = {
    val (nShards, logSlots) = ShardedDupBloom.geometryFor(expectedAdds)
    val rdd = wins.select(col(hashCol)).rdd
    if (rdd.getNumPartitions == 0) new ShardedDupBloom(nShards, logSlots)
    else if (nShards == 1)
      // single filter (≤ 32 MiB): build per partition INSIDE the task
      // (mapPartitions + treeReduce) — no shuffle of the key rows, and
      // no zero-value serialized into every task closure
      rdd.mapPartitions { it =>
        val f = new ShardedDupBloom(nShards, logSlots)
        it.foreach(row => f.add(row.getLong(0)))
        Iterator(f)
      }.treeReduce((a, b) => a.merge(b), depth = 2)
    else {
      // SHARDED geometry: one build task per SHARD, keys routed by the
      // filter's own shard function, so task memory is ONE shard's
      // 32 MiB — never the whole nShards × 32 MiB filter. The per-map-
      // task form allocated the full sharded filter in EVERY scan task
      // (at 16 shards × 32 cores that is 16 GiB of concurrent zero
      // bitsets — the r16 sf10 receipt's q197 executor OOM, invisible
      // at sf1 where the 3-shard geometry fit). Costs one exchange of
      // the 8-byte keys — the same order as the fp-count shuffle that
      // follows the filter anyway.
      val built = rdd.map(row => {
          val h = row.getLong(0)
          (ShardedDupBloom.shardOf(h, nShards), h)
        })
        .partitionBy(new org.apache.spark.HashPartitioner(nShards))
        .mapPartitionsWithIndex { (shard, it) =>
          val f = new DupBloom(logSlots)
          it.foreach { case (_, h) => f.add(h) }
          Iterator((shard, f))
        }
      val out = new ShardedDupBloom(nShards, logSlots)
      // toLocalIterator, not collect(): the driver must hold the merged
      // nShards × 32 MiB filter anyway (it broadcasts it), but a
      // collect() would ALSO stage every per-shard filter at once —
      // roughly doubling the driver's transient heap at max geometry
      // (16 × 32 MiB on top of the 512 MiB merged filter). One filter
      // in flight at a time; the shuffle map stage runs once and each
      // per-partition fetch is a result-stage-only job against it.
      built.toLocalIterator.foreach { case (shard, f) =>
        out.shards(shard).merge(f): Unit
      }
      out
    }
  }

  /** Window-count estimate for [[DupBloom]] sizing: Σ max(len − L +
    * 1, 0) over the text column — exact for stride 1, an upper bound
    * for stride > 1 (oversizing only wastes filter bits). */
  private def estimateWindows(df: DataFrame, textCol: String,
                              width: Int): Long =
    df.select(coalesce(sum(greatest(
        length(col(textCol).cast("string")) - width + 1, lit(0))
        .cast(LongType)), lit(0L)))
      .head().getLong(0)

  /** Cross-document LINE-level boilerplate removal — the CCNet /
    * RefinedWeb cleaning step between document dedup and substring
    * dedup: a line whose TRIMMED text is nonempty and occurs in at
    * least `minDocs` DISTINCT documents is navigation/footer
    * boilerplate ("subscribe to our newsletter") and is dropped from
    * EVERY document; each document is rebuilt from its surviving
    * lines in order (original separators collapse to '\n').
    *
    * Shape: line explosion is a pure projection (split + posexplode);
    * the frequency count is one hash agg keyed on the trimmed line
    * (map-side combinable); the thresholded boilerplate set
    * localCheckpoints (it feeds the route gate, the filter build, and
    * the join — one computation) and its EXACT size picks the route
    * (the q210 discipline — CCNet's line-hash tables are sharded
    * precisely because this set is corpus-sized at web scale, so a
    * forced broadcast would be a driver/executor OOM): at or under
    * `maxBroadcastLines` distinct boilerplate lines the set BROADCASTS
    * into a semi-join (zero shuffle of the line stream); above it a
    * [[ShardedDupBloom]] membership filter over the set's xxhash64
    * keys kills provably-clean lines at the scan and only the
    * surviving fraction rides a shuffled semi-join — the exact join
    * still decides marking, so filter collisions cost shuffle rows,
    * never results (both routes mark the same set, spec-enforced).
    * Marked positions group per doc and the rebuild is one array HOF
    * over the doc's own split — no cross-row state, text never enters
    * a shuffle key. Returns (id, clean_text, n_lines_removed) for
    * every input doc (null text passes through). */
  def lineDedup(df: DataFrame, idCol: String, textCol: String,
                minDocs: Int,
                maxBroadcastLines: Long = 1000000L): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val base = df.select(col(idCol).cast(LongType).as("id"),
      col(textCol).cast("string").as("text"))
    val lines = base.filter(col("text").isNotNull)
      .select(col("id"), posexplode(split(col("text"), "\n", -1)))
      .select(col("id"), col("pos"), col("col").as("line"))
    val bad = lines
      .filter(length(trim(col("line"))) > 0)
      .groupBy(trim(col("line")).as("k"))
      .agg(countDistinct(col("id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("k")
      .localCheckpoint(eager = false) // read by the filter build and join
    // LAZY checkpoint + count: the count is the materializing action,
    // so gate count and checkpoint cost ONE job (an eager checkpoint
    // followed by count would run two).
    val nBad = bad.count()
    val badPos =
      if (nBad <= maxBroadcastLines) {
        lines.join(broadcast(bad), trim(col("line")) === col("k"),
            "left_semi")
          .groupBy("id")
          .agg(sort_array(collect_list(col("pos"))).as("bad_pos"))
      } else {
        val bloom = df.sparkSession.sparkContext.broadcast(
          buildDupBloom(bad.select(xxhash64(col("k")).as("__ph")),
            "__ph", nBad))
        val mightHit = udf((h: Long) => bloom.value.mightContain(h))
        // Materialize the marking EAGERLY (unit-bounded: one row per
        // affected doc) so the up-to-512 MiB filter broadcast can be
        // destroyed before returning — a long-lived session calling
        // lineDedup repeatedly must not accumulate dead filter blocks
        // on the executors.
        val bp = lines.filter(mightHit(xxhash64(trim(col("line")))))
          .join(bad, trim(col("line")) === col("k"), "left_semi")
          .groupBy("id")
          .agg(sort_array(collect_list(col("pos"))).as("bad_pos"))
          .localCheckpoint()
        bloom.destroy()
        bp
      }
    base.join(badPos, Seq("id"), "left")
      .withColumn("__parts", split(col("text"), "\n", -1))
      .select(col("id"),
        when(col("text").isNull, lit(null).cast("string"))
          .when(col("bad_pos").isNull, col("text"))
          .otherwise(array_join(
            filter(col("__parts"),
              (_, i) => not(array_contains(col("bad_pos"), i))),
            "\n")).as("clean_text"),
        coalesce(size(col("bad_pos")), lit(0)).cast(LongType)
          .as("n_lines_removed"))
  }

  /** MAXIMAL duplicated substrings of length ≥ `minLen` — the
    * suffix-array-grade report of exact-substring training-data dedup
    * (Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better", §4 ExactSubstr): every character span that
    * occurs more than once in the corpus (across documents OR
    * repeated within one) and cannot be extended while staying
    * duplicated, reported per occurrence.
    *
    * NO suffix array is built. The equivalence this rests on: a span
    * of length m ≥ L is duplicated iff each of its m−L+1 stride-1
    * L-grams is duplicated, and a maximal duplicated span is exactly
    * a maximal run of duplicated-L-gram start positions — so the
    * union of the marked windows [i, i+L) IS the SA/LCP answer
    * (matches ≥ L merge into maximal repeats; nothing shorter than L
    * can mark a window). The spec proves this against a brute-force
    * O(n²·L) maximal-repeat search.
    *
    * Shape at scale: stride-1 window extraction is a pure projection
    * (sequence + explode — one output row per character, the same
    * cardinality as Lee et al.'s suffix-array entries); each window
    * is reduced to a 16-byte md5 BEFORE the first exchange, so the
    * shuffle carries (id, off, fp) — never text. Duplicate marking is
    * one fp-keyed count agg (map-side combinable) + one join back on
    * the same key (partitioning reused); the interval union is the
    * shared constant-width merge, O(marked) per doc. Returns one row
    * per span occurrence: (id, span_start, span_end, span_len),
    * span char range [span_start, span_end) 0-based. */
  def maxDupSpans(df: DataFrame, idCol: String, textCol: String,
                  minLen: Int): DataFrame =
    maxDupSpansWithFp(df, idCol, textCol, minLen, fp = None)

  /** Production-hash variant of [[maxDupSpans]]: identical span
    * semantics and plan shape, window fingerprints via xxhash64
    * (8-byte integer digests — no hex string, ~half the shuffle key
    * width; the [[graft.ops.Sketch.hllDistinctFast]] convention).
    * Measured at sf0.1 the two are at parity (R10-SCALELAW — the
    * explode + fp shuffle dominates, not the hash), so the value of
    * this form is the narrower shuffle key at real corpus scale, not
    * local speed. A 64-bit collision would mark one extra L-gram
    * duplicated — negligible below ~2³² windows per corpus and
    * acceptable for a REWRITE gate (the registered q197 row keeps md5
    * so the oracle replays). */
  def maxDupSpansFast(df: DataFrame, idCol: String, textCol: String,
                      minLen: Int): DataFrame =
    maxDupSpansWithFp(df, idCol, textCol, minLen,
      fp = Some(sub => xxhash64(sub)))

  /** `fp = None` → the one-pass md5 window kernel (the registered q197
    * form — bit-exact digests, no per-window substring); `Some(f)` →
    * the expression-chain form with a caller-supplied fingerprint
    * (the xxhash64 production variant). */
  private def maxDupSpansWithFp(df: DataFrame, idCol: String, textCol: String,
                                minLen: Int,
                                fp: Option[Column => Column]): DataFrame = {
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    val base = df
      .filter(col(idCol).isNotNull)
      .select(col(idCol).as("id"), col(textCol).cast("string").as("text"))
      .filter(col("text").isNotNull && length(col("text")) >= minLen)
    val winsAll = (fp match {
        case None => base.select(col("id"),
          posexplode(md5WindowArr(col("text"), minLen)).as(Seq("off", "fp")))
        case Some(f) => base
          .select(col("id"),
            explode(expr(s"sequence(0, CAST(length(text) AS INT) - $minLen, 1)"))
              .as("off"),
            col("text"))
          .select(col("id"), col("off"),
            f(expr(s"substring(text, off + 1, $minLen)")).as("fp"))
      })
      .select(col("id"), col("off").cast("int").as("off"), col("fp"))
      .withColumn("__ph", xxhash64(col("fp")))
      .localCheckpoint() // feeds bloom build, the dup-mark agg, and the join back
    // map-side singleton pruning (r10 verdict #2): one fp row per
    // corpus CHARACTER rides this family's exchanges — the correct
    // cardinality (it IS the suffix-array entry count), but the
    // overwhelmingly common case is a singleton fp that can never
    // mark a span. The broadcast two-level bloom kills
    // provably-singleton windows at the checkpoint scan; the exact
    // occ > 1 count over the survivors is unchanged (every occurrence
    // of a true duplicate survives), so collisions cost shuffle rows,
    // never results.
    val bloom = df.sparkSession.sparkContext.broadcast(
      buildDupBloom(winsAll, "__ph", estimateWindows(base, "text", minLen)))
    val mightDup = udf((h: Long) => bloom.value.mightBeDup(h))
    val wins = winsAll.filter(mightDup(col("__ph"))).select("id", "off", "fp")
    val dupFp = wins.groupBy("fp").agg(count(lit(1)).as("occ"))
      .filter(col("occ") > 1).select("fp")
    val marked = wins.join(dupFp, Seq("fp")).select("id", "off")
    mergeOffsetsSegmented(marked, minLen)
      .select(col("id"), explode(col("merged")).as("sp"))
      .select(col("id"), col("sp.s").cast("long").as("span_start"),
        col("sp.e").cast("long").as("span_end"),
        (col("sp.e") - col("sp.s")).cast("long").as("span_len"))
  }

  /** Overlapping context-window chunking — the RAG / LM training
    * layout where consecutive chunks share `overlap` tokens so no
    * span loses its context at a boundary (HuggingFace
    * return_overflowing_tokens semantics): `size`-token windows every
    * `size − overlap` tokens, the last truncated at the document end,
    * none emitted once a previous window already reached it. A narrow
    * map (tight-loop kernel + posexplode) — chunking never shuffles;
    * returns (id, chunk_idx, chunk, n_tokens). */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     chunkSize: Int, overlap: Int): DataFrame =
    df.select(col(idCol).as("id"),
        posexplode(Dedup.slidingChunksWithCountsFast(col(textCol).cast("string"),
          chunkSize, overlap)).as(Seq("chunk_idx", "c")))
      .select(col("id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("c._1").as("chunk"),
        col("c._2").cast("long").as("n_tokens"))

  /** Fill-in-the-middle (FIM) training transform (Bavarian et al.
    * 2022): for a deterministic `fimRate` share of documents, cut the
    * text at two content-derived points i ≤ j and re-emit it in PSM
    * order — `<PRE>prefix<SUF>suffix<MID>middle` — so an autoregressive
    * model learns infilling; the rest pass through unchanged. Both the
    * document gate and the cut points derive from md5 (gate from
    * (seed, id) so re-crawled identical text in different rows gates
    * independently; cuts from the TEXT so the same content always cuts
    * at the same character offsets), making the transform reproducible
    * run-to-run, engine-portable, and shuffle-free — one projection,
    * character arithmetic only, the tail dies at the scan.
    *
    * `fimRate` is quantized to 1/65536ths (16-bit hash gate).
    * Returns (id, is_fim, cut_i, cut_j, out) — out is the PSM string
    * for gated rows, the original text otherwise. */
  def fimSplit(df: DataFrame, idCol: String, textCol: String,
               fimRate: Double = 0.5, seed: String = "fim0"): DataFrame = {
    require(fimRate >= 0.0 && fimRate <= 1.0,
      s"fimRate must be in [0,1], got $fimRate")
    val gateLimit = math.floor(fimRate * 65536.0).toLong
    val text = col(textCol).cast("string")
    val gate = graft.expressions.Kernels.hexSliceLong(
      md5(concat(lit(seed), col(idCol).cast("string")).cast("binary")),
      1, 4) < gateLimit
    val ht = md5(text.cast("binary"))
    val len = length(text)
    // 48-bit cut draws (12 hex digits, the FracBits width): a 16-bit
    // draw mod (len+1) can only land cuts in the first 65536 positions
    // and carries large modulo bias near that length; at 48 bits the
    // bias is ≤ len/2^48 and cuts reach any position of any realistic
    // document
    val a = graft.expressions.Kernels.hexSliceLong(ht, 1, 12) % (len + 1)
    val b = graft.expressions.Kernels.hexSliceLong(ht, 13, 12) % (len + 1)
    val i = least(a, b)
    val j = greatest(a, b)
    val psm = concat(lit("<PRE>"), text.substr(lit(1), i),
      lit("<SUF>"), text.substr(j + 1, len - j),
      lit("<MID>"), text.substr(i + 1, j - i))
    df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("id"), gate.as("is_fim"),
        when(gate, i).otherwise(lit(null)).cast("long").as("cut_i"),
        when(gate, j).otherwise(lit(null)).cast("long").as("cut_j"),
        when(gate, psm).otherwise(text).as("out"))
  }

  /** GPT-3/Lee-et-al-style n-gram contamination report: for every doc
    * in `test`, the fraction of its DISTINCT word n-grams occurring
    * anywhere in `train` — the graded counterpart of the exact
    * [[Dedup.decontaminate]], which only catches whole-document
    * copies. A test doc with high n-gram overlap is partially leaked
    * (quoted, spliced, lightly paraphrased) even when its content
    * fingerprint is unique.
    *
    * Shape: both corpora reduce to DISTINCT md5(n-gram) digests —
    * train globally (|distinct grams| rows), test per doc — then ONE
    * digest-keyed equijoin and a per-doc ratio agg. Shuffle keys are
    * 16-byte digests, never text; docs shorter than n tokens report
    * zero grams and zero contamination. */
  def ngramContamination(train: DataFrame, test: DataFrame, idCol: String,
                         textCol: String, n: Int = 8): DataFrame = {
    val trainG = train
      .select(explode(Dedup.ngramStreamFast(col(textCol).cast("string"), n)).as("g"))
      .select(md5(col("g").cast("binary")).as("fp")).distinct()
    val testG = test
      .select(col(idCol).as("id"),
        explode(Dedup.ngramStreamFast(col(textCol).cast("string"), n)).as("g"))
      .select(col("id"), md5(col("g").cast("binary")).as("fp")).distinct()
    val hits = testG.join(trainG.withColumn("__hit", lit(1L)), Seq("fp"), "left")
      .groupBy("id").agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
    test.select(col(idCol).as("id")).distinct()
      .join(hits, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_overlap"),
        round(coalesce(col("n_hit").cast("double") /
          col("n_grams").cast("double"), lit(0.0)), 6).as("contamination"))
  }

  /** Per-document average token log-probability under an add-one-
    * smoothed unigram language model fit on `train` — the cheap
    * corpus-relative quality/outlier score (CCNet-style perplexity
    * filtering with the KenLM slot replaced by the unigram model the
    * engine can fit in two keyed aggregations). Low scores flag
    * documents whose vocabulary diverges from the reference corpus.
    *
    * p(t) = (count_train(t) + 1) / (N + V) with N = train token count,
    * V = train vocab size, so unseen tokens score ln(1/(N+V)) instead
    * of blowing up. avg_logp = Σ tf·ln p / Σ tf.
    *
    * Shape: the model is one (token → count) agg over train [shuffle,
    * |vocab| rows out]; N and V ride in-plan as a broadcast 1-row
    * aggregate (no driver round-trip); scoring is (id, token) tf counts
    * joined to the model on token. The model frame is |vocab|-bounded —
    * tiny next to the corpus — so AQE broadcasts the join at any corpus
    * size; nothing here is driver-resident.
    */
  def unigramLogProb(train: DataFrame, score: DataFrame, idCol: String,
                     textCol: String): DataFrame = {
    val freq = train
      .select(explode(tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val model = freq.agg(
      sum(col("c")).as("n"), count(lit(1)).as("v"))
    val tf = score
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok"))
      .groupBy("id", "tok").agg(count(lit(1)).as("tf"))
    val scored = tf
      .join(freq, Seq("tok"), "left")
      .crossJoin(broadcast(model))
      .groupBy("id").agg(
        sum(col("tf")).as("n_tokens"),
        (sum(col("tf").cast("double") *
          log((coalesce(col("c"), lit(0L)) + 1).cast("double") /
            (col("n") + col("v")).cast("double"))) /
          sum(col("tf")).cast("double")).as("avg_logp"))
    score.select(col(idCol).as("id")).distinct()
      .join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(coalesce(col("avg_logp"), lit(0.0)), 6).as("avg_logp"))
  }

  /** Per-document average bigram log-probability under an add-one-
    * smoothed bigram language model fit on `train` — one Markov order
    * above [[unigramLogProb]], the cheapest model that punishes
    * word-salad documents whose unigrams look fine but whose
    * transitions never occur in the reference corpus (the q43
    * repetition / q20 quality signals miss exactly that case).
    *
    * p(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + V) with c(w1 ·) = the
    * count of train bigrams starting at w1 and V = train unigram
    * vocabulary size — add-one over the vocabulary, so an unseen
    * context scores ln(1/V) and nothing blows up.
    * avg_logp = Σ tf·ln p / Σ tf over the document's bigram stream;
    * documents with < 2 tokens score 0 with n_bigrams = 0.
    *
    * Shape mirrors [[unigramLogProb]]: the model is one bigram agg
    * over train (vocab²-bounded in principle, observed-bigram-bounded
    * in fact), context counts derive from it with a second narrow agg,
    * V rides in-plan as a broadcast 1-row frame, and scoring joins the
    * per-doc bigram tf table on the bigram key. Bigrams come from the
    * tight-loop kernel ([[graft.ops.Dedup.ngramStreamFast]]). No
    * driver state at any size. */
  def bigramLogProb(train: DataFrame, score: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    val big = train
      .select(explode(Dedup.ngramStreamFast(col(textCol).cast("string"), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c12"))
      .localCheckpoint() // feeds the context agg AND the scoring join
    val ctx = big
      .select(split(col("bg"), " ").getItem(0).as("w1"), col("c12"))
      .groupBy("w1").agg(sum(col("c12")).as("c1"))
    val vocab = train
      .select(explode(tokens(col(textCol).cast("string"))).as("tok"))
      .agg(count_distinct(col("tok")).as("v"))
    val tf = score
      .select(col(idCol).as("id"),
        explode(Dedup.ngramStreamFast(col(textCol).cast("string"), 2)).as("bg"))
      .groupBy("id", "bg").agg(count(lit(1)).as("tf"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
    val scored = tf
      .join(big, Seq("bg"), "left")
      .join(ctx, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .groupBy("id").agg(
        sum(col("tf")).as("n_bigrams"),
        (sum(col("tf").cast("double") *
          log((coalesce(col("c12"), lit(0L)) + 1).cast("double") /
            (coalesce(col("c1"), lit(0L)) + col("v")).cast("double"))) /
          sum(col("tf")).cast("double")).as("avg_logp"))
    score.select(col(idCol).as("id")).distinct()
      .join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(coalesce(col("avg_logp"), lit(0.0)), 6).as("avg_logp"))
  }

  /** Per-document average trigram log-probability under an
    * interpolated MODIFIED KNESER–NEY 3-gram language model fit on
    * `train` — the perplexity filter of the CCNet/RefinedWeb quality
    * stack (Wenzek et al. 2020 pair a fastText classifier — q161's
    * role here — with a KenLM n-gram model; Chen & Goodman 1999 §3 define
    * the modified-KN estimator used here). Two Markov orders above
    * [[unigramLogProb]], one above [[bigramLogProb]], and — unlike
    * their add-one smoothing — the discount mass is ESTIMATED FROM THE
    * CORPUS via counts-of-counts, with lower orders backed by
    * continuation counts (how many distinct contexts a word follows),
    * the property that makes KN the standard: frequent-but-context-
    * bound words ("Francisco") stop inflating the backoff.
    *
    * Estimator, per level ℓ ∈ {3,2,1} with count table K_ℓ:
    *   K_3 = raw trigram counts; K_2(w2w3) = |{w1 : K_3 > 0}|;
    *   K_1(w3) = |{w2 : K_2 > 0}| (continuation counts).
    *   Discounts (Chen–Goodman): Y = n1/(n1+2n2), D_1 = 1 − 2Y·n2/n1,
    *   D_2 = 2 − 3Y·n3/n2, D_3+ = 3 − 4Y·n4/n3 over K_ℓ's
    *   count-of-count bands n_k; a level whose bands are degenerate
    *   (any n_k = 0 or any D_k ≤ 0 — where KenLM aborts) falls back to
    *   flat absolute discounting D = Y, or D = 0.5 if n1 = 0, keeping
    *   every discount strictly positive (deterministic, documented).
    *   p_ℓ(w|ctx) = max(K−D(K),0)/K(ctx·) + γ_ℓ(ctx)·p_{ℓ−1}(w|ctx′)
    *   γ_ℓ(ctx) = (D_1·N_1(ctx) + D_2·N_2(ctx) + D_3+·N_3+(ctx))/K(ctx·)
    *   base case p_0 = 1/V (V = train unigram vocab). An UNSEEN
    *   context contributes term 0 with γ = 1 (pure backoff), so no
    *   probability is ever 0 and ln never blows up.
    *   avg_logp = Σ tf·ln p / Σ tf over the doc's trigram stream;
    *   documents with < 3 tokens score 0 with n_trigrams = 0.
    *
    * Shape: ONE trigram agg over train is the whole model — every
    * other table (continuation bigrams/unigrams, per-context N-bands,
    * count-of-count scalars) derives from it by narrow keyed aggs, so
    * the expensive scan happens once ([[bpeTrainLocal]]'s one-scan
    * discipline, but nothing collects: all tables stay distributed,
    * observed-ngram-bounded). Discount constants ride in-plan as ONE
    * broadcast 1-row frame; scoring joins the per-doc trigram tf
    * table to the model tables on their n-gram keys (AQE broadcasts
    * them at any corpus size where they fit; above that they are
    * ordinary shuffled equi-joins on high-cardinality keys). All
    * probabilities are ratios of exact integer counts and the three
    * clamped discount doubles — identical IEEE expressions replay in
    * the oracle. */
  def knTrigramLogProb(train: DataFrame, score: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val w = (i: Int) => split(col("tg"), " ").getItem(i)
    val tg = train
      .select(explode(Dedup.ngramStreamFast(col(textCol).cast("string"), 3)).as("tg"))
      .groupBy("tg").agg(count(lit(1)).as("c3"))
      .select(col("tg"), col("c3"), w(0).as("w1"), w(1).as("w2"), w(2).as("w3"))
      .localCheckpoint() // feeds bands, ctx stats, continuations, scoring
    // continuation tables: tg rows are DISTINCT trigrams, so count(*)
    // per (w2,w3) IS the distinct-left-extension count
    val cc2 = tg.groupBy("w2", "w3").agg(count(lit(1)).as("cc"))
      .localCheckpoint() // feeds its bands, ctx2, cu, scoring
    val cu = cc2.groupBy("w3").agg(count(lit(1)).as("cu"))
      .localCheckpoint() // feeds level-1 bands + totals, scoring
    // Chen–Goodman discounts from count-of-count bands. The modified
    // triple is VALID only when all four bands are nonzero and every
    // D_k comes out positive (D_k ≤ k holds by construction; KenLM
    // aborts outright on invalid bands — small or synthetic corpora
    // with non-Zipfian count distributions hit this, and a discount
    // clamped to 0 would zero the backoff mass and emit p = 0).
    // Fallback: flat absolute discounting D = Y ∈ (0,1] (Ney et al.),
    // and D = 0.5 when even n1 = 0 — every discount strictly
    // positive, so gamma > 0 for any seen context and ln never sees 0.
    def bands(df: DataFrame, cCol: String, p: String): DataFrame = {
      val b = df.agg(
        sum(when(col(cCol) === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col(cCol) === 2, 1L).otherwise(0L)).as("n2"),
        sum(when(col(cCol) === 3, 1L).otherwise(0L)).as("n3"),
        sum(when(col(cCol) === 4, 1L).otherwise(0L)).as("n4"))
      val y = when(col("n1") + lit(2) * col("n2") > 0,
        col("n1").cast("double") /
          (col("n1") + lit(2) * col("n2")).cast("double")).otherwise(lit(0.0))
      val d1m = when(col("n1") > 0, lit(1.0) -
        lit(2.0) * y * col("n2").cast("double") / col("n1").cast("double"))
      val d2m = when(col("n2") > 0, lit(2.0) -
        lit(3.0) * y * col("n3").cast("double") / col("n2").cast("double"))
      val d3m = when(col("n3") > 0, lit(3.0) -
        lit(4.0) * y * col("n4").cast("double") / col("n3").cast("double"))
      val valid = col("n1") > 0 && col("n2") > 0 && col("n3") > 0 &&
        col("n4") > 0 && d1m > 0 && d2m > 0 && d3m > 0
      val fb = when(col("n1") > 0, y).otherwise(lit(0.5))
      b.select(
        when(valid, d1m).otherwise(fb).as(p + "1"),
        when(valid, d2m).otherwise(fb).as(p + "2"),
        when(valid, d3m).otherwise(fb).as(p + "3"))
    }
    val vocab = train
      .select(explode(tokens(col(textCol).cast("string"))).as("tok"))
      .agg(count_distinct(col("tok")).as("v"))
    val lvl1 = cu.agg(sum(col("cu")).as("cut"),
      sum(when(col("cu") === 1, 1L).otherwise(0L)).as("m1"),
      sum(when(col("cu") === 2, 1L).otherwise(0L)).as("m2"),
      sum(when(col("cu") >= 3, 1L).otherwise(0L)).as("m3"))
    val scal = bands(tg, "c3", "d3").crossJoin(bands(cc2, "cc", "d2"))
      .crossJoin(bands(cu, "cu", "d1")).crossJoin(vocab).crossJoin(lvl1)
      .withColumn("g1",
        (col("d11") * col("m1") + col("d12") * col("m2") +
          col("d13") * col("m3")) / col("cut").cast("double"))
    val ctx3 = tg.groupBy("w1", "w2").agg(sum(col("c3")).as("t3"),
      sum(when(col("c3") === 1, 1L).otherwise(0L)).as("b1"),
      sum(when(col("c3") === 2, 1L).otherwise(0L)).as("b2"),
      sum(when(col("c3") >= 3, 1L).otherwise(0L)).as("b3"))
    val ctx2 = cc2.groupBy("w2").agg(sum(col("cc")).as("t2"),
      sum(when(col("cc") === 1, 1L).otherwise(0L)).as("e1"),
      sum(when(col("cc") === 2, 1L).otherwise(0L)).as("e2"),
      sum(when(col("cc") >= 3, 1L).otherwise(0L)).as("e3"))
    val tf = score
      .select(col(idCol).as("id"),
        explode(Dedup.ngramStreamFast(col(textCol).cast("string"), 3)).as("tg"))
      .groupBy("id", "tg").agg(count(lit(1)).as("tf"))
      .select(col("id"), col("tg"), col("tf"),
        w(0).as("w1"), w(1).as("w2"), w(2).as("w3"))
    def disc(c: Column, k1: Column, k2: Column, k3: Column): Column =
      when(c >= 3, k3).when(c === 2, k2).when(c === 1, k1).otherwise(lit(0.0))
    val c3v = coalesce(col("c3"), lit(0L))
    val term3 = when(col("t3").isNotNull,
      greatest(c3v.cast("double") -
        disc(c3v, col("d31"), col("d32"), col("d33")), lit(0.0)) /
        col("t3").cast("double")).otherwise(lit(0.0))
    val g3 = coalesce(
      (col("d31") * col("b1") + col("d32") * col("b2") +
        col("d33") * col("b3")) / col("t3").cast("double"), lit(1.0))
    val ccv = coalesce(col("cc"), lit(0L))
    val term2 = when(col("t2").isNotNull,
      greatest(ccv.cast("double") -
        disc(ccv, col("d21"), col("d22"), col("d23")), lit(0.0)) /
        col("t2").cast("double")).otherwise(lit(0.0))
    val g2 = coalesce(
      (col("d21") * col("e1") + col("d22") * col("e2") +
        col("d23") * col("e3")) / col("t2").cast("double"), lit(1.0))
    val cuv = coalesce(col("cu"), lit(0L))
    val term1 = greatest(cuv.cast("double") -
      disc(cuv, col("d11"), col("d12"), col("d13")), lit(0.0)) /
      col("cut").cast("double")
    val p1 = term1 + col("g1") / col("v").cast("double")
    val p = term3 + g3 * (term2 + g2 * p1)
    val scored = tf
      .join(tg.select("tg", "c3"), Seq("tg"), "left")
      .join(ctx3, Seq("w1", "w2"), "left")
      .join(cc2, Seq("w2", "w3"), "left")
      .join(ctx2, Seq("w2"), "left")
      .join(cu, Seq("w3"), "left")
      .crossJoin(broadcast(scal))
      .groupBy("id").agg(
        sum(col("tf")).as("n_trigrams"),
        (sum(col("tf").cast("double") * log(p)) /
          sum(col("tf")).cast("double")).as("avg_logp"))
    score.select(col(idCol).as("id")).distinct()
      .join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        round(coalesce(col("avg_logp"), lit(0.0)), 6).as("avg_logp"))
  }

  /** DSIR-style importance weights for domain-targeted data selection
    * (Xie et al. 2023, "Data Selection for Language Models via
    * Importance Resampling"): score every document by the average
    * per-token log-likelihood RATIO between a target-domain unigram LM
    * and the raw-corpus unigram LM — positive means "reads like the
    * target domain". Both LMs use the same add-1 smoothing convention
    * as [[unigramLogProb]] (p(t) = (c+1)/(n+|V|), each over its own
    * corpus). Selection is then a threshold or weighted sample over
    * `avg_logratio` ([[graft.ops.Sampling.weightedSample]] composes).
    *
    * Scale shape: one scan per LM + one for the scored corpus, all
    * reductions keyed on the token (vocab-bounded); the two count
    * scalars ride along as broadcast 1-row frames. No driver state,
    * no vocabulary collect — the LM tables stay distributed. */
  def importanceWeights(target: DataFrame, raw: DataFrame,
                        score: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    // each LM table feeds its totals row AND the scoring join — pinned
    // once so the token agg doesn't run twice per LM
    def lm(df: DataFrame) = df
      .select(explode(tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val ft = lm(target)
    val fr = lm(raw)
    val mt = ft.agg(sum(col("c")).as("nt"), count(lit(1)).as("vt"))
    val mr = fr.agg(sum(col("c")).as("nr"), count(lit(1)).as("vr"))
    val tf = score
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok"))
      .groupBy("id", "tok").agg(count(lit(1)).as("tf"))
    // The two per-LM averages are computed and ROUNDED separately —
    // each is a well-conditioned sum (≈ −7·n_tokens, no cancellation)
    // — and the ratio is their rounded difference. Summing the
    // per-token log-RATIO directly is numerically treacherous: for
    // distribution-neutral documents the terms cancel to ~1e-9 where
    // cross-engine float-summation-order noise flips the SIGN of the
    // rounded result (±0.0 hash-mismatch, seen at sf0.1).
    val scored = tf
      .join(ft.withColumnRenamed("c", "ct"), Seq("tok"), "left")
      .join(fr.withColumnRenamed("c", "cr"), Seq("tok"), "left")
      .crossJoin(broadcast(mt)).crossJoin(broadcast(mr))
      .groupBy("id").agg(
        sum(col("tf")).as("n_tokens"),
        (sum(col("tf").cast("double") *
          log((coalesce(col("ct"), lit(0L)) + 1).cast("double") /
            (col("nt") + col("vt")).cast("double"))) /
          sum(col("tf")).cast("double")).as("__at"),
        (sum(col("tf").cast("double") *
          log((coalesce(col("cr"), lit(0L)) + 1).cast("double") /
            (col("nr") + col("vr")).cast("double"))) /
          sum(col("tf")).cast("double")).as("__ar"))
    score.select(col(idCol).as("id")).distinct()
      .join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(coalesce(col("__at"), lit(0.0)), 6).as("avg_logp_tgt"),
        round(coalesce(col("__ar"), lit(0.0)), 6).as("avg_logp_raw"),
        round(round(coalesce(col("__at"), lit(0.0)), 6) -
          round(coalesce(col("__ar"), lit(0.0)), 6), 6).as("avg_logratio"))
  }

  /** Gopher-style repetition signals per document: duplicate-token
    * fraction (1 − distinct/total) and the most frequent word bigram
    * with its share of all bigrams. High values flag boilerplate-ish /
    * TEMPLATE-generated docs that slip past exact dedup.
    *
    * The token-level ratios are pure expressions (zero shuffle); only
    * the bigram argmax aggregates — keyed on (doc, bigram), then one
    * row per (doc, bigram) into the per-doc max. The bigram argmax is
    * made engine-portable by packing (count, bigram) into a
    * fixed-width sortable string and taking `max` — avoids struct-max
    * ordering differences across engines; ties therefore resolve to
    * the lexicographically greatest bigram at the max count.
    */
  def repetitionStats(df: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    val base = df.select(col(idCol).as("id"), tokens(col(textCol)).as("w"))
      .withColumn("n_tokens", size(col("w")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("w"))).cast("long"))
    val bigrams = df
      .select(col(idCol).as("id"),
        explode(Dedup.ngramStreamFast(col(textCol).cast("string"), 2)).as("bg"))
      .groupBy("id", "bg").agg(count(lit(1)).as("cnt"))
    val topPacked = bigrams.groupBy("id").agg(
      max(concat(lpad(col("cnt").cast("string"), 10, "0"), lit(" "),
        col("bg"))).as("packed"),
      sum(col("cnt")).as("n_bigrams"))
    base.join(topPacked, Seq("id"), "left")
      .select(col("id"), col("n_tokens"), col("n_distinct"),
        round(when(col("n_tokens") > 0,
          lit(1.0) - col("n_distinct").cast("double") /
            col("n_tokens").cast("double")).otherwise(lit(0.0)), 6)
          .as("dup_token_ratio"),
        coalesce(substring(col("packed"), 12, 1000000), lit(""))
          .as("top_bigram"),
        coalesce(substring(col("packed"), 1, 10).cast("long"), lit(0L))
          .as("top_bigram_count"),
        round(coalesce(substring(col("packed"), 1, 10).cast("double") /
          col("n_bigrams").cast("double"), lit(0.0)), 6)
          .as("top_bigram_frac"))
  }

  /** Deterministic global corpus shuffle + shard layout — the "shuffle
    * once, shard for N dataloader workers" step of training-data
    * assembly. Position = global rank in (md5(seed‖id), id) order: a
    * content-keyed permutation that is reproducible across runs,
    * partitionings, and engines (any engine's ROW_NUMBER over the same
    * md5 replays it), unlike `orderBy(rand(seed))` which depends on
    * partition layout. The rank comes from [[graft.ops.Prefix.rowNumber]]'s
    * two-pass range sort — one shuffle, no single-task window, so the
    * permutation of a 100 TB corpus never funnels through one executor.
    * Changing `seed` is a fresh epoch permutation.
    * Adds: shuffle_pos (0-based), shard = pos div shardSize,
    * shard_offset = pos mod shardSize. Null ids are dropped (a
    * content-keyed permutation is undefined without a key). */
  def shuffleShards(df: DataFrame, idCol: String, shardSize: Long,
                    seed: String = "epoch0"): DataFrame = {
    require(shardSize >= 1, s"shardSize must be >= 1, got $shardSize")
    val keyed = df.filter(col(idCol).isNotNull)
      .withColumn("__sk",
        md5(concat(lit(seed), col(idCol).cast("string")).cast("binary")))
    Prefix.rowNumber(keyed, Seq("__sk", idCol), "shuffle_pos")
      .withColumn("shard", expr(s"shuffle_pos div ${shardSize}L"))
      .withColumn("shard_offset", col("shuffle_pos") % shardSize)
      .drop("__sk")
  }

  /** Deterministic token-budget selection per source — the other half
    * of data mixing: not "what RATE do I keep" ([[mixtureWeights]]) but
    * "WHICH documents fill each source's token budget". Documents are
    * ordered inside their source by the content-keyed md5 permutation
    * ([[shuffleShards]]'s ordering — unbiased, reproducible across
    * partitionings and engines, a fresh draw per `seed`) and taken
    * greedily while the source's running token total BEFORE the
    * document is under the budget — so the boundary-crossing document
    * is included and any budget > 0 yields at least one document per
    * non-empty source.
    *
    * Windowless at scale: the per-source cumulative token sums come
    * from ONE shared range-sort prefix pass plus |sources|-bounded
    * offsets (the [[Drift.percentRankBy]] shape) — never a per-source
    * sort task, so one dominant source cannot funnel the selection.
    *
    * Returns (id, source, n_tokens, cum_tokens incl. the doc). */
  def tokenBudgetSample(df: DataFrame, idCol: String, textCol: String,
                        sourceCol: String, budgetPerSource: Long,
                        seed: String = "budget0"): DataFrame = {
    require(budgetPerSource > 0,
      s"budgetPerSource must be > 0, got $budgetPerSource")
    val base = df.filter(col(idCol).isNotNull && col(sourceCol).isNotNull)
      .select(col(idCol).as("id"), col(sourceCol).as("src"),
        TextAnalysis.tokenCount(col(textCol)).cast(LongType).as("n_tokens"))
      .withColumn("__sk",
        md5(concat(lit(seed), col("id").cast("string")).cast("binary")))
      .localCheckpoint() // the prefix pass and the per-source totals both read it
    val cum = Prefix.runningTotals(base, Seq("src", "__sk", "id"),
      Seq("__cum" -> col("n_tokens")))
    val stot = base.groupBy("src").agg(sum("n_tokens").as("__st"))
    val soff = Prefix.runningTotals(stot, Seq("src"),
      Seq("__scum" -> col("__st")))
      .select(col("src"), (col("__scum") - col("__st")).as("__soff"))
    cum.join(broadcast(soff), "src")
      .withColumn("cum_tokens", col("__cum") - col("__soff"))
      .filter(col("cum_tokens") - col("n_tokens") < budgetPerSource)
      .select(col("id"), col("src").as("source"), col("n_tokens"),
        col("cum_tokens"))
  }

  /** Per-domain sampling rates that rebalance a corpus toward a target
    * mixture — the "what fraction of each source do I keep so the
    * training set is X% web / Y% code / Z% books" computation every
    * data-mixing recipe starts from. Rates are DOWNSAMPLE-ONLY
    * (scaled so the largest stays at 1.0 — no row is duplicated), and
    * the output feeds [[Sampling.stratifiedHashSample]] directly.
    *
    * `targets` maps domain → desired ABSOLUTE share of the final token
    * mass; domains absent from the map split the remaining
    * max(0, 1 − Σ targets) mass uniformly. An empty map means a fully
    * uniform target.
    *
    * Shape: ONE narrow groupBy(domain) (map-side combine absorbs the
    * rows; only |domains| groups shuffle), then all arithmetic runs on
    * the ≤|domains|-row frame (two broadcast-joined scalar aggs for
    * the total and the max ratio). Nothing driver-side, nothing that
    * grows with row count. Output: (domain, n_docs, tokens, cur_share,
    * target_share, sample_rate) — one row per observed domain. */
  def mixtureWeights(df: DataFrame, domainCol: String, sizeCol: String,
                     targets: Map[String, Double] = Map.empty): DataFrame = {
    targets.values.foreach(w =>
      require(w >= 0, s"target weights must be >= 0, got $w"))
    val g = domainGroups(df, domainCol, sizeCol)
    // raw target weight per domain: explicit entries keep their weight,
    // the rest share the residual mass (or everything, if no map)
    val explicitMass = targets.values.sum
    val residual = math.max(0.0, 1.0 - explicitMass)
    val rawW = targets.foldLeft(
      lit(null).cast(DoubleType)) { case (acc, (dom, w)) =>
      when(col("domain") === dom, lit(w)).otherwise(acc)
    }
    val w = g.withColumn("__w", rawW)
    val totals = w.agg(
      coalesce(sum("tokens"), lit(0L)).as("__tot"),
      coalesce(sum(when(col("__w").isNull, 1L)), lit(0L)).as("__n_implicit"))
    val withShares = w.crossJoin(broadcast(totals))
      .withColumn("target_share",
        coalesce(col("__w"),
          when(col("__n_implicit") > 0, lit(residual) / col("__n_implicit"))
            .otherwise(lit(0.0))))
      .withColumn("cur_share",
        col("tokens").cast(DoubleType) / col("__tot").cast(DoubleType))
      .withColumn("__ratio",
        when(col("cur_share") > 0, col("target_share") / col("cur_share"))
          .otherwise(lit(0.0)))
      .localCheckpoint()
    finishRates(withShares)
  }

  /** Temperature-scaled mixture rates (the multilingual-corpus
    * rebalancing rule): target share of domain l ∝ tokens_l^`alpha`,
    * `alpha` ∈ (0, 1]. α = 1 reproduces the corpus as-is; α → 0
    * approaches uniform — low-resource domains are upsampled RELATIVE
    * to their natural share, high-resource ones suppressed, without
    * any hand-written target map. Same downsample-only normalization
    * and output schema as [[mixtureWeights]]; same physical shape (all
    * arithmetic on the ≤|domains|-row frame). */
  def temperatureWeights(df: DataFrame, domainCol: String, sizeCol: String,
                         alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val g = domainGroups(df, domainCol, sizeCol)
    val totals = g.agg(
      coalesce(sum(pow(col("tokens").cast(DoubleType), alpha)), lit(0.0)).as("__z"),
      coalesce(sum("tokens"), lit(0L)).as("__tot"))
    val withShares = g.crossJoin(broadcast(totals))
      .withColumn("target_share",
        when(col("__z") > 0,
          pow(col("tokens").cast(DoubleType), alpha) / col("__z"))
          .otherwise(lit(0.0)))
      .withColumn("cur_share",
        when(col("__tot") > 0,
          col("tokens").cast(DoubleType) / col("__tot").cast(DoubleType))
          .otherwise(lit(0.0)))
      .withColumn("__ratio",
        when(col("cur_share") > 0, col("target_share") / col("cur_share"))
          .otherwise(lit(0.0)))
      .localCheckpoint()
    finishRates(withShares)
  }

  /** Epochs-per-domain plan under a fixed training-token budget — the
    * "how many times does each source repeat" computation of
    * data-constrained scaling (Muennighoff et al. 2023): each domain
    * gets `budgetTokens · target_share` tokens (temperature-weighted
    * share, [[temperatureWeights]]), which its corpus fills by
    * repeating up to `maxEpochs` times; demand beyond that cap is
    * truncated (flagged — the signal to go collect more of that
    * domain). All arithmetic runs on the ≤|domains|-row mixture frame;
    * shares enter ROUNDED (6 dp) exactly as the mixture op emits them,
    * so every downstream product/division replays bit-for-bit.
    * Returns (domain, tokens, target_share, budget_tokens, epochs,
    * effective_tokens, truncated). */
  def epochsPerDomain(df: DataFrame, domainCol: String, sizeCol: String,
                      budgetTokens: Long, alpha: Double,
                      maxEpochs: Double): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be > 0, got $budgetTokens")
    require(maxEpochs >= 1.0, s"maxEpochs must be >= 1, got $maxEpochs")
    val bt = col("target_share") * lit(budgetTokens.toDouble)
    val cap = col("tokens").cast(DoubleType) * lit(maxEpochs)
    temperatureWeights(df, domainCol, sizeCol, alpha)
      .select(col("domain"), col("tokens"), col("target_share"),
        round(bt, 6).as("budget_tokens"),
        round(least(bt / col("tokens").cast(DoubleType), lit(maxEpochs)), 6)
          .as("epochs"),
        round(least(bt, cap), 6).as("effective_tokens"),
        (bt > cap).as("truncated"))
  }

  /** Shared head of the mixture-rate ops: one narrow groupBy(domain) —
    * map-side combine absorbs the rows, only |domains| groups shuffle —
    * localCheckpointed because every caller feeds it to ≥ 2 aggs. */
  private def domainGroups(df: DataFrame, domainCol: String,
                           sizeCol: String): DataFrame =
    df.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col(sizeCol).cast(LongType)), lit(0L)).as("tokens"))
      .localCheckpoint()

  /** Shared tail: scale ratios so the largest is 1.0 (downsample-only)
    * and emit the rounded output schema. */
  private def finishRates(withShares: DataFrame): DataFrame = {
    val mx = withShares.agg(coalesce(max("__ratio"), lit(0.0)).as("__mx"))
    withShares.crossJoin(broadcast(mx))
      .select(col("domain"), col("n_docs"), col("tokens"),
        round(col("cur_share"), 6).as("cur_share"),
        round(col("target_share"), 6).as("target_share"),
        round(when(col("__mx") > 0, col("__ratio") / col("__mx"))
          .otherwise(lit(0.0)), 6).as("sample_rate"))
  }
}
