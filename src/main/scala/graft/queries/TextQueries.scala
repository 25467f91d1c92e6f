package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Training-data-pipeline text operators over the `documents` table:
 * token statistics, quality signals, marker-based language scoring,
 * content-normalized exact dedup, n-gram Jaccard similarity join, and
 * document fingerprints. Every computation is expressed with functions
 * whose semantics are identical in Spark and DuckDB (integer arithmetic,
 * md5, non-overlapping replace, binary string sort), so each query has an
 * exact oracle twin.
 *
 * (MinHash/SimHash approximate dedup live in graft.ops.Dedup — their hash
 * pipelines are engine-internal and validated by recall specs instead.)
 */
object TextQueries {
  /** Jaccard threshold + id cap for the exact pairwise similarity join
   * (the scalable path is MinHash-LSH; the exact join is the oracle). */
  val JaccardThreshold = 0.6
  val JaccardMaxDocId = 300
  /** Decontamination: token n-gram width + the eval-split id pattern. */
  val DecontamGramTokens = 5
  val DecontamEvalMod = 25
  val DecontamEvalRem = 7
  /** Corpus-derived stopword list size (top-N tokens by frequency). */
  val StopwordN = 5
  /** Stratified sampling: Knuth multiplicative hash salt + per-stratum
   * keep-rates (percent). */
  val SampleSalt = 2654435761L
  val SampleRateEn = 20
  val SampleRateOther = 50
  /** Line-level dedup: tokens per segment (the synthetic corpus has no
   * newlines, so a "line" is a fixed token window). */
  val LineTokens = 12
  /** PII planting periods/remainders (doc_id-derived, replayed by the
   * SQL twin). */
  val PiiEmailMod = 5
  val PiiEmailRem = 2
  val PiiPhoneMod = 7
  val PiiPhoneRem = 3
  /** Sequence-packing token budget (tokens per training sequence bin). */
  val PackBudget = 512
  /** RAG-style chunking: window size and stride in characters (overlap =
   * ChunkChars - ChunkStride). */
  val ChunkChars = 200
  val ChunkStride = 150
  /** Exact-substring dedup (Lee et al. 2021): window width + stride in
   * characters. A window hash shared by >= 2 distinct docs marks a
   * duplicated span. */
  val SubstrWindow = 60
  val SubstrStride = 20
  /** Vocabulary builder: top-N corpus tokens kept. */
  val VocabN = 50
  /** RAG ingestion+serving composition: chunk-key packing base (chunk_idx
   * must stay below it), query-selection modulus, neighbors returned. */
  val RagKeyBase = 4096L
  val RagQueryMod = 97L
  val RagK = 5
  /** Gopher-inspired quality-filter thresholds (Rae et al. 2021 §A1.1),
   * adapted to the synthetic corpus so the verdict actually splits it. */
  val FilterMinTokens = 30
  val FilterMaxTokens = 10000
  val FilterMinAvgTokenLen = 3.0
  val FilterMaxAvgTokenLen = 10.0
  val FilterMinStopFrac = 0.05
  val FilterMaxDupFrac = 0.6
  val FilterMaxBigramFrac = 0.1

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_stats" -> { (s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("n_tokens"),
        length(regexp_replace(col("text"), " ", "")).as("n_chars_nospace"),
        (length(regexp_replace(col("text"), " ", "")).cast("double") /
          size(split(trim(col("text")), "\\s+"))).as("avg_token_len"))
    },

    "text_quality" -> { (s, dir) =>
      val nchars = length(col("text"))
      Tables(s, dir, "documents").select(
        col("doc_id"),
        nchars.as("n_chars"),
        length(regexp_replace(col("text"), "[a-zA-Z0-9 ]", "")).as("punct_chars"),
        length(regexp_replace(col("text"), "[^0-9]", "")).as("digit_chars"),
        (length(regexp_replace(col("text"), "[a-zA-Z0-9 ]", "")).cast("double") /
          greatest(nchars, lit(1))).as("punct_ratio"))
    },

    "text_langid" -> { (s, dir) =>
      // occurrence counts of language marker words via the non-overlapping
      // replace trick — identical semantics in both engines. Defined
      // behavior: adjacent repeats share their delimiter space, so a run
      // of n repeated markers counts ceil(n/2) — fine for a scoring
      // heuristic, and bit-identical across engines by construction.
      def occ(w: String) = {
        val padded = concat(lit(" "), col("text"), lit(" "))
        ((length(padded) - length(regexp_replace(padded, s" $w ", ""))) /
          (w.length + 2)).cast("long")
      }
      Tables(s, dir, "documents").select(
        col("doc_id"), col("lang").as("labeled_lang"),
        occ("the").as("n_the"), occ("data").as("n_data"),
        occ("merge").as("n_merge"))
    },

    "text_dedup_exact" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("h"))
      val keepers = d.groupBy("h").agg(min(col("doc_id")).as("keeper"))
      d.join(keepers, "h")
        .select(col("doc_id"), col("keeper"),
          (col("doc_id") =!= col("keeper")).as("is_dup"))
    },

    "text_dedup_norm" -> { (s, dir) =>
      // content-normalized key: md5 of the sorted token multiset —
      // catches word-order shuffles of the same bag of words.
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"),
          md5(concat_ws(" ", sort_array(split(col("text"), " ")))).as("h"))
      val keepers = d.groupBy("h").agg(min(col("doc_id")).as("keeper"))
      d.join(keepers, "h")
        .select(col("doc_id"), col("keeper"),
          (col("doc_id") =!= col("keeper")).as("is_dup"))
    },

    "text_jaccard_pairs" -> { (s, dir) =>
      // exact 3-gram Jaccard similarity join (id-capped; MinHash-LSH is
      // the scale path, this is its oracle)
      // length >= 3 guard: Spark's sequence(1, length-2) DESCENDS for
      // shorter texts (sequence(1,0) = [1,0]) and would emit phantom
      // grams where DuckDB's range() is empty
      val grams = Tables(s, dir, "documents")
        .where(col("doc_id") < JaccardMaxDocId && length(col("text")) >= 3)
        .select(col("doc_id"), explode(array_distinct(
          expr("transform(sequence(1, length(text)-2), i -> substring(text, i, 3))")))
          .as("gram"))
      val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = grams.as("a")
        .join(grams.as("b"),
          col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
        .groupBy("i", "j").agg(count(lit(1)).as("c"))
      inter
        .join(sizes.select(col("doc_id").as("i"), col("n").as("sa")), "i")
        .join(sizes.select(col("doc_id").as("j"), col("n").as("sb")), "j")
        .select(col("i"), col("j"),
          (col("c").cast("double") / (col("sa") + col("sb") - col("c"))).as("jacc"))
        .where(col("jacc") >= JaccardThreshold)
    },

    "text_fingerprint" -> { (s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"), md5(col("text")).as("fp"),
        length(col("text")).as("n_chars"))
    },

    "text_repetition" -> { (s, dir) =>
      // Gopher-style repetition signals (Rae et al. 2021 §A1.1): the
      // duplicated-token fraction and the share of the most frequent word
      // bigram — high values flag boilerplate/spam. Row-local explode +
      // two-level aggregation; nothing crosses documents, so the pass is
      // embarrassingly parallel at any corpus size.
      val t = Tables(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("toks"), size(col("toks")).as("n_tokens"),
          size(array_distinct(col("toks"))).as("n_distinct"))
      val top = t.where(col("n_tokens") >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(toks) - 1), " +
            "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"))
          .as("bigram"))
        .groupBy("doc_id", "bigram").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max(col("c")).as("top_bigram_count"))
      t.select(col("doc_id"), col("n_tokens"), col("n_distinct"))
        .join(top, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          (lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"))
            .as("dup_token_frac"),
          coalesce(col("top_bigram_count"), lit(0L)).as("top_bigram_count"),
          when(col("n_tokens") >= 2,
            col("top_bigram_count").cast("double") / (col("n_tokens") - 1))
            .otherwise(lit(0.0)).as("top_bigram_frac"))
    },

    "text_lm_score" -> { (s, dir) =>
      // CCNet-style statistical-LM quality scoring (Wenzek et al. 2019
      // §4.2 ranks documents by LM perplexity; reference pipelines drop
      // the worst tail): a bigram model TRAINED ON THE CORPUS scores each
      // document by its mean inverse conditional probability
      //   score(d) = (1/|bigrams(d)|) * sum_i c(w_i) / c(w_i, w_{i+1})
      // — perplexity's harmonic structure without transcendentals (log /
      // exp are not correctly rounded across engines; + and / are, so a
      // position-ordered fold is bit-exact). High score = improbable
      // transitions = boilerplate/shuffled text.
      // 100-TB shape: the model is two grouped counts over the bigram
      // stream (cost ~ corpus tokens); scoring hash-joins each document
      // bigram to its count on the bigram key (never corpus²), then one
      // per-doc fold, position-sorted so both engines sum in the same
      // order.
      val t = Tables(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val big = t.where(size(col("toks")) >= 2)
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(1, size(toks) - 1), " +
            "i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))")))
        .select(col("doc_id"), col("pos"), col("col.w1"), col("col.w2"))
      val bigCnt = big.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      val headCnt = bigCnt.groupBy("w1").agg(sum("cb").as("ch"))
      big.join(bigCnt, Seq("w1", "w2")).join(headCnt, Seq("w1"))
        .select(col("doc_id"), col("pos"),
          (col("ch").cast("double") / col("cb")).as("inv_p"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          expr("aggregate(sort_array(collect_list(struct(pos, inv_p))), " +
            "cast(0.0 AS double), (acc, x) -> acc + x.inv_p)").as("sum_inv_p"))
        .select(col("doc_id"), col("n_bigrams"), col("sum_inv_p"),
          (col("sum_inv_p") / col("n_bigrams")).as("lm_score"))
    },

    "text_stopwords" -> { (s, dir) =>
      // Gopher's stop-word quality rule with a corpus-derived list: the
      // StopwordN most frequent tokens (ties by token) are the stopwords,
      // and each document reports its stopword occurrence fraction. The
      // corpus pass is one aggregation producing a tiny broadcast list —
      // global-vocabulary stats feeding a per-doc feature, the dataflow a
      // 100 TB quality-filter pass uses.
      val toks = Tables(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val top = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok")).limit(StopwordN)
        .select("tok")
      val stops = toks.join(broadcast(top), "tok")
        .groupBy("doc_id").agg(count(lit(1)).as("n_stop"))
      toks.groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
        .join(stops, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("n_stop"), lit(0L)).as("n_stop"),
          (coalesce(col("n_stop"), lit(0L)).cast("double") / col("n_tokens"))
            .as("stop_frac"))
    },

    "text_decontaminate" -> { (s, dir) =>
      // benchmark decontamination: flag training documents sharing any
      // token n-gram with the held-out eval split (doc_id % mod = rem —
      // a deterministic stand-in for an external eval set). The join is
      // hash-partitioned on the gram, so cost is driven by the (small)
      // eval gram set, not the corpus squared — the shape a 100 TB
      // decontamination pass needs.
      val w = DecontamGramTokens
      val grams = Tables(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .where(size(col("toks")) >= w)
        .select(col("doc_id"), explode(array_distinct(expr(
          s"transform(sequence(1, size(toks) - ${w - 1}), " +
            s"i -> concat_ws(' ', slice(toks, i, $w)))")))
          .as("gram"))
      val ev = grams
        .where(col("doc_id") % DecontamEvalMod === DecontamEvalRem)
        .select(col("doc_id").as("eval_id"), col("gram"))
      val evSizes = ev.groupBy("eval_id").agg(count(lit(1)).as("n_eval"))
      grams.where(col("doc_id") % DecontamEvalMod =!= DecontamEvalRem)
        .join(ev, "gram")
        .groupBy("doc_id", "eval_id").agg(count(lit(1)).as("n_shared"))
        .join(broadcast(evSizes), "eval_id")
        .select(col("doc_id"), col("eval_id"), col("n_shared"),
          (col("n_shared").cast("double") / col("n_eval")).as("eval_frac"))
    },

    "text_mix_langs" -> { (s, dir) =>
      // data mixing: rebalance the language distribution to uniform by
      // downsampling every language to the smallest language's count.
      // The rates are DERIVED from corpus stats (one tiny aggregation,
      // broadcast back), the keep decision is a multiplicative-hash
      // bucket — all integer arithmetic, so the same rows are kept on
      // any cluster layout and in the SQL twin. The dataflow a 100 TB
      // mixing pass runs: global stats -> broadcast -> row-local filter.
      val docs = Tables(s, dir, "documents")
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("cnt"))
      val target = counts.agg(min(col("cnt")).as("target"))
      docs.join(broadcast(counts), "lang")
        .crossJoin(broadcast(target))
        .withColumn("bucket",
          (col("doc_id") * SampleSalt) % (1L << 32) % col("cnt"))
        .where(col("bucket") < col("target"))
        .select(col("doc_id"), col("lang"), col("cnt"), col("target"),
          col("bucket"))
    },

    "text_pack_sequences" -> { (s, dir) =>
      // sequence packing: concatenate documents into fixed token-budget
      // training sequences. Packing is per source shard (PARTITION BY
      // source ORDER BY doc_id running token sum; bin = the budget
      // window the document STARTS in) — no global total order, so the
      // pass scales by shard exactly like a real packing job; within a
      // shard the window cumsum is one sort.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("doc_id")
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(split(trim(col("text")), "\\s+")).as("n_tokens"))
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .select(col("doc_id"), col("source"), col("n_tokens"), col("cum"),
          floor((col("cum") - col("n_tokens")) / lit(PackBudget.toDouble))
            .cast("long").as("bin"))
    },

    "pipeline_curate" -> { (s, dir) =>
      // THE end-to-end curation composition a training-data pipeline
      // runs over a raw corpus: drop near-duplicate cluster losers
      // (minhash-LSH bands -> connected components; unpaired docs keep
      // themselves, hence the anti-join on losers rather than a join on
      // keepers), drop content-normalized exact duplicates, keep only
      // docs passing the Gopher verdict, and report surviving volume per
      // language. Every stage is independently oracle-gated; this entry
      // gates their COMPOSITION (the joins stay doc_id-keyed and the
      // report is a tiny final aggregate — pipeline cost is the sum of
      // its stages, no new shuffle shape).
      val nonKeepers = AnnQueries.queries("dedup_clusters")(s, dir)
        .where(!col("is_keeper")).select(col("doc_id"))
      val normKeep = queries("text_dedup_norm")(s, dir)
        .where(!col("is_dup")).select(col("doc_id"))
      val quality = queries("text_filter_gopher")(s, dir)
        .where(col("keep")).select(col("doc_id"), col("n_tokens"))
      Tables(s, dir, "documents").select(col("doc_id"), col("lang"))
        .join(normKeep, "doc_id")
        .join(quality, "doc_id")
        .join(nonKeepers, Seq("doc_id"), "left_anti")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("sum_tokens"))
    },

    "text_filter_gopher" -> { (s, dir) =>
      // the filtering VERDICT a pipeline actually executes: compose the
      // oracled repetition, stopword, and token-stat signals into one
      // keep/drop boolean per document (Gopher rules, Rae et al. 2021
      // §A1.1 — thresholds adapted to this corpus). Reuses the entry
      // dataflows — three doc_id-keyed joins of already-parallel passes;
      // the verdict itself is row-local.
      val rep = queries("text_repetition")(s, dir)
        .select(col("doc_id"), col("n_tokens"), col("dup_token_frac"),
          col("top_bigram_frac"))
      val stop = queries("text_stopwords")(s, dir)
        .select(col("doc_id"), col("stop_frac"))
      val stats = queries("text_stats")(s, dir)
        .select(col("doc_id"), col("avg_token_len"))
      rep.join(stop, "doc_id").join(stats, "doc_id")
        .select(col("doc_id"), col("n_tokens"), col("avg_token_len"),
          col("stop_frac"), col("dup_token_frac"), col("top_bigram_frac"),
          (col("n_tokens").between(FilterMinTokens, FilterMaxTokens) &&
            col("avg_token_len").between(FilterMinAvgTokenLen, FilterMaxAvgTokenLen) &&
            col("stop_frac") >= FilterMinStopFrac &&
            col("dup_token_frac") <= FilterMaxDupFrac &&
            col("top_bigram_frac") <= FilterMaxBigramFrac).as("keep"))
    },

    "text_dedup_lines" -> { (s, dir) =>
      // CCNet-style duplicated-segment removal (Wenzek et al. 2019 dedup
      // on normalized paragraph hashes): drop every occurrence of a
      // repeated segment except the first (ordered by doc_id, then
      // position). Segments are fixed LineTokens-token windows — the
      // synthetic corpus has no newline structure, and the dataflow is
      // identical to paragraph hashing: one explode, one corpus-wide
      // aggregation on the segment, one join back. All shuffles key on
      // the segment text, so the pass scales like exact dedup.
      val w = LineTokens
      val segs = Tables(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), posexplode(expr(
          s"transform(sequence(0, cast(ceil(size(toks) / cast($w as double)) as int) - 1), " +
            s"i -> concat_ws(' ', slice(toks, i * $w + 1, $w)))"))
          .as(Seq("seg_idx", "seg")))
      val k = segs.groupBy("seg").agg(
        min(struct(col("doc_id"), col("seg_idx"))).as("keep"),
        count(lit(1)).as("n_copies"))
      segs.join(k, "seg")
        .where(col("doc_id") === col("keep.doc_id") &&
          col("seg_idx") === col("keep.seg_idx"))
        .select(col("doc_id"), col("seg_idx"),
          md5(col("seg")).as("seg_hash"), col("n_copies"))
    },

    "text_pii" -> { (s, dir) =>
      // PII detection + redaction. The synthetic corpus contains no
      // contact strings, so the entry deterministically plants them
      // (derived from doc_id — the SQL twin plants identically), then
      // counts matches via regexp_extract_all and redacts via chained
      // regexp_replace. The regex subset used (char classes, bounded
      // repetition, \b) behaves identically in Java regex and RE2.
      // Row-local — embarrassingly parallel at any corpus size.
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "\\b555-[0-9]{4}\\b"
      val aug = concat(col("text"),
        when(col("doc_id") % PiiEmailMod === PiiEmailRem,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com for details"))).otherwise(lit("")),
        when(col("doc_id") % PiiPhoneMod === PiiPhoneRem,
          concat(lit(" call 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
            lit(" today"))).otherwise(lit("")))
      Tables(s, dir, "documents")
        .withColumn("t", aug)
        .select(col("doc_id"),
          size(regexp_extract_all(col("t"), lit(email), lit(0))).as("n_emails"),
          size(regexp_extract_all(col("t"), lit(phone), lit(0))).as("n_phones"),
          md5(regexp_replace(regexp_replace(col("t"), email, "<EMAIL>"),
            phone, "<PHONE>")).as("redacted_md5"))
    },

    "text_sample_stratified" -> { (s, dir) =>
      // deterministic stratified sampling (language rebalancing): keep
      // 20% of the overrepresented language, 50% of the rest, decided by
      // a multiplicative hash of the id — reproducible on any cluster
      // layout, no RNG state, expressible identically in plain SQL
      val bucket = (col("doc_id") * lit(SampleSalt)) % lit(1L << 32) % 100
      val rate = when(col("lang") === "en", SampleRateEn)
        .otherwise(SampleRateOther)
      Tables(s, dir, "documents")
        .withColumn("bucket", bucket)
        .where(col("bucket") < rate)
        .select(col("doc_id"), col("lang"), col("source"), col("bucket"))
    },

    "text_chunk" -> { (s, dir) =>
      // RAG/embedding-pipeline chunking: fixed character windows with
      // overlap (200-char chunks every 150 chars). Row-local transform +
      // posexplode — no data crosses documents, so the pass scales
      // embarrassingly; chunk identity is carried as an md5 so the output
      // stays scalar for the oracle hash. The window count uses
      // greatest(...,1) so zero/short docs still emit one chunk (Spark's
      // sequence(0,-1) would otherwise count DOWN, not return empty).
      val (c, st) = (ChunkChars, ChunkStride)
      Tables(s, dir, "documents")
        .select(col("doc_id"), posexplode(expr(
          s"transform(sequence(0, greatest(cast(ceil(length(text) / cast($st as double)) as int), 1) - 1), " +
            s"i -> substring(text, i * $st + 1, $c))"))
          .as(Seq("chunk_idx", "chunk")))
        .select(col("doc_id"), col("chunk_idx"),
          length(col("chunk")).as("chunk_len"),
          md5(col("chunk")).as("chunk_hash"))
    },

    "text_dedup_substring" -> { (s, dir) =>
      // exact-substring duplication profile (Lee et al. 2021,
      // "Deduplicating Training Data Makes Language Models Better": drop
      // verbatim spans shared across documents). Sliding 60-char windows
      // at stride 20 are hashed row-locally; a window hash seen in >= 2
      // distinct docs is a duplicated span. One corpus-wide aggregation
      // keyed on the 32-char hash (never the text) + one join back —
      // the same single-shuffle shape as exact dedup, so it holds at
      // 100 TB; the duplicated-hash side is aggregated and threshold-
      // filtered, far smaller than the corpus.
      val (w, t) = (SubstrWindow, SubstrStride)
      val wins = Tables(s, dir, "documents")
        .where(length(col("text")) >= w)
        .select(col("doc_id"), posexplode(expr(
          s"transform(sequence(0, cast((length(text) - $w) / $t as int)), " +
            s"i -> md5(substring(text, i * $t + 1, $w)))"))
          .as(Seq("win_idx", "h")))
      val dup = wins.groupBy("h")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .where(col("nd") >= 2)
        .select(col("h"))
      val perDoc = wins.groupBy("doc_id")
        .agg(count(lit(1)).as("n_windows"))
      val dupPerDoc = wins.join(dup, "h")
        .groupBy("doc_id").agg(count(lit(1)).as("dup_windows"))
      perDoc.join(dupPerDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_windows"),
          coalesce(col("dup_windows"), lit(0L)).as("dup_windows"),
          (coalesce(col("dup_windows"), lit(0L)).cast("double") /
            col("n_windows")).as("dup_frac"))
    },

    "text_vocab" -> { (s, dir) =>
      // vocabulary builder (tokenizer-training precursor): corpus-wide
      // token counts, top-N by (count desc, token). One explode + one
      // count shuffle keyed on the token + a global top-N — the
      // truncation is a rank over the aggregated (distinct-token-sized)
      // frame, never the corpus. Ties broken by binary token order so
      // the cut is deterministic cross-engine.
      val counts = Tables(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .where(col("token") =!= "")
        .groupBy("token").agg(count(lit(1)).as("n"))
      // orderBy+limit plans as TakeOrderedAndProject — a distributed
      // partial top-N over the aggregated frame, no single-task global
      // sort; the rank window then runs over just VocabN rows.
      counts.orderBy(col("n").desc, col("token")).limit(VocabN)
        .select(col("token"), col("n"),
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("n").desc, col("token"))).as("rank"))
    },

    "text_dedup_url" -> { (s, dir) =>
      // URL-canonicalization dedup (the CommonCrawl-pipeline stage that
      // runs BEFORE content dedup): the synthetic corpus has no URL
      // column, so one is planted deterministically from (source,
      // doc_id) with the classic duplicate-generating variants — case
      // noise, trailing slash, tracking params — and the canonicalizer
      // (lowercase, strip query string, strip trailing slash) must
      // collapse them. Row-local normalize + ONE groupBy on the
      // canonical key + join back: exact-dedup shape, holds at any
      // corpus size.
      val url = concat(
        when(col("doc_id") % 4 === 1, lit("HTTPS://WWW"))
          .otherwise(lit("https://www")),
        lit(".example.com/page/"), (col("doc_id") % 101).cast("string"),
        when(col("doc_id") % 4 === 2, lit("/")).otherwise(lit("")),
        when(col("doc_id") % 4 === 0, lit("?utm_source=feed&ref=x"))
          .otherwise(lit("")))
      val canon = regexp_replace(
        regexp_replace(lower(url), "\\?.*$", ""), "/$", "")
      val t = Tables(s, dir, "documents")
        .select(col("doc_id"), canon.as("canon"))
      val k = t.groupBy("canon").agg(
        min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      t.join(k, "canon")
        .select(col("doc_id"), md5(col("canon")).as("canon_md5"),
          col("n_copies"), (col("doc_id") === col("keeper")).as("is_keeper"))
    },

    "text_length_quantiles" -> { (s, dir) =>
      // per-language token-length distribution (the report a curation
      // pipeline emits before/after filtering). Quantiles are defined
      // rank-based — value at rank ceil(q*n) ordered by (n_tokens,
      // doc_id) — in PURE INTEGER arithmetic, so both engines agree
      // bit-for-bit with no interpolation semantics to reconcile.
      // NOTE the per-lang global sort is the ORACLE shape: at 100 TB a
      // report uses approx_percentile (t-digest sketch, one pass, no
      // sort) — this entry is its exact twin, the same relationship
      // embed_neardup has to embed_neardup_lsh.
      val t = Tables(s, dir, "documents").select(col("doc_id"), col("lang"),
        size(split(trim(col("text")), "\\s+")).as("n_tokens"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
        .orderBy(col("n_tokens"), col("doc_id"))
      val cw = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      val ranked = t
        .withColumn("rnk", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(cw))
      // `div` (integer division): `/` on longs is DOUBLE in Spark SQL and
      // rnk == 125.99 would never match
      def at(pct: Int) = max(when(
        col("rnk") === expr(s"(cnt * $pct + 99) div 100"), col("n_tokens")))
      ranked.groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        at(25).as("p25"), at(50).as("p50"),
        at(75).as("p75"), at(95).as("p95"))
    },

    "pipeline_rag" -> { (s, dir) =>
      // THE RAG ingestion + serving composition: chunk documents
      // (text_chunk windows), featurize each chunk row-locally
      // (deterministic 8-dim char-class histogram — an embedding-model
      // stand-in whose integer arithmetic replays exactly in SQL), index
      // and answer related-chunk queries through the SAME partitioned
      // brute-force kernel every knn_* entry uses, then hydrate results
      // back to chunk identity. Scale shape: chunking + featurizing are
      // row-local over the corpus; queries (1/97 of chunks) broadcast
      // into the scan; the hit set is k x queries rows, joined back to
      // chunks by broadcasting the HITS, never shuffling the corpus.
      // Integer-valued distances make the gate float-free end-to-end.
      val (c, st) = (ChunkChars, ChunkStride)
      import s.implicits._
      // the featurizer runs as ONE typed-map JVM pass (an interpreted
      // higher-order aggregate() here cost ~10 s/invocation at sf0.1 —
      // 20M per-element evaluations; the JVM loop is ~100x cheaper and
      // the integer counts are bit-identical), and the frame persists
      // because THREE sides consume it (index, queries, hydration)
      val chunks = Tables(s, dir, "documents")
        .select(col("doc_id"), posexplode(expr(
          s"transform(sequence(0, greatest(cast(ceil(length(text) / cast($st as double)) as int), 1) - 1), " +
            s"i -> substring(text, i * $st + 1, $c))"))
          .as(Seq("chunk_idx", "chunk")))
        .where(length(col("chunk")) > 0)
        .as[(Long, Int, String)]
        .map { case (docId, idx, chunk) =>
          val v = new Array[Float](8)
          var i = 0
          while (i < chunk.length) {
            v(chunk.charAt(i) % 8) += 1f
            i += 1
          }
          (docId, idx, chunk, docId * RagKeyBase + idx, v)
        }
        .toDF("doc_id", "chunk_idx", "chunk", "ckey", "v")
        .persist()
      graft.CacheRegistry.retain(s"rag:$dir", Seq(chunks))
      val vectors = chunks.select(col("ckey").as("id"), col("v").as("vec"),
        lit(0L).as("eventTime"))
      val queries = chunks.where(col("ckey") % RagQueryMod === 0)
        .select(col("ckey").as("qid"), col("v").as("qv"),
          lit(Long.MaxValue / 2).as("qtime"), lit(Long.MaxValue / 2).as("ttl"))
      val hits = graft.ops.Ann.bruteForce(vectors, queries, RagK)
      chunks.select(col("ckey"), col("doc_id"), col("chunk_idx"),
          md5(col("chunk")).as("chunk_hash"))
        .join(broadcast(hits), col("ckey") === hits("id"))
        .select(col("qid"), col("rn"), col("id"), col("dist"),
          col("doc_id"), col("chunk_idx"), col("chunk_hash"))
    })

  private def statsSql: String =
    """SELECT doc_id,
      |len(string_split_regex(trim(text), '\s+')) AS n_tokens,
      |length(replace(text, ' ', '')) AS n_chars_nospace,
      |CAST(length(replace(text, ' ', '')) AS DOUBLE)
      |  / len(string_split_regex(trim(text), '\s+')) AS avg_token_len
      |FROM documents""".stripMargin

  private def repetitionSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
      |  FROM documents),
      |s AS (SELECT doc_id, len(toks) AS n_tokens,
      |  len(list_distinct(toks)) AS n_distinct FROM t),
      |bg AS (SELECT doc_id,
      |  unnest([toks[i] || ' ' || toks[i+1]
      |    for i in generate_series(1, len(toks) - 1)]) AS bigram
      |  FROM t WHERE len(toks) >= 2),
      |bc AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY 1, 2),
      |bm AS (SELECT doc_id, MAX(c) AS top_bigram_count FROM bc GROUP BY 1)
      |SELECT s.doc_id, n_tokens, n_distinct,
      |  1.0 - CAST(n_distinct AS DOUBLE) / n_tokens AS dup_token_frac,
      |  COALESCE(top_bigram_count, 0) AS top_bigram_count,
      |  CASE WHEN n_tokens >= 2
      |    THEN CAST(top_bigram_count AS DOUBLE) / (n_tokens - 1)
      |    ELSE 0.0 END AS top_bigram_frac
      |FROM s LEFT JOIN bm USING (doc_id)""".stripMargin

  private def gopherSql: String =
    s"""SELECT r.doc_id, r.n_tokens, sta.avg_token_len, st.stop_frac,
       |  r.dup_token_frac, r.top_bigram_frac,
       |  (r.n_tokens BETWEEN $FilterMinTokens AND $FilterMaxTokens
       |   AND sta.avg_token_len BETWEEN $FilterMinAvgTokenLen AND $FilterMaxAvgTokenLen
       |   AND st.stop_frac >= $FilterMinStopFrac
       |   AND r.dup_token_frac <= $FilterMaxDupFrac
       |   AND r.top_bigram_frac <= $FilterMaxBigramFrac) AS keep
       |FROM ($repetitionSql) r
       |JOIN ($stopwordsSql) st ON r.doc_id = st.doc_id
       |JOIN ($statsSql) sta ON r.doc_id = sta.doc_id""".stripMargin

  private def normDedupSql: String =
    """WITH d AS (SELECT doc_id,
      |  md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS h
      |  FROM documents),
      |k AS (SELECT h, MIN(doc_id) AS keeper FROM d GROUP BY h)
      |SELECT d.doc_id, k.keeper, d.doc_id <> k.keeper AS is_dup
      |FROM d JOIN k ON d.h = k.h""".stripMargin

  private def stopwordsSql: String =
    s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |  FROM documents),
       |top AS (SELECT tok FROM t GROUP BY tok
       |  ORDER BY COUNT(*) DESC, tok LIMIT $StopwordN),
       |sizes AS (SELECT doc_id, COUNT(*) AS n_tokens FROM t GROUP BY doc_id),
       |stops AS (SELECT doc_id, COUNT(*) AS n_stop
       |  FROM t JOIN top USING (tok) GROUP BY doc_id)
       |SELECT doc_id, n_tokens, COALESCE(n_stop, 0) AS n_stop,
       |  CAST(COALESCE(n_stop, 0) AS DOUBLE) / n_tokens AS stop_frac
       |FROM sizes LEFT JOIN stops USING (doc_id)""".stripMargin

  def oracles: Map[String, String] = Map(
    "text_stats" -> statsSql,

    "text_mix_langs" ->
      s"""WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
         |t AS (SELECT min(cnt) AS target FROM c)
         |SELECT d.doc_id, d.lang, c.cnt, t.target,
         |  d.doc_id * $SampleSalt % ${1L << 32} % c.cnt AS bucket
         |FROM documents d JOIN c USING (lang) CROSS JOIN t
         |WHERE d.doc_id * $SampleSalt % ${1L << 32} % c.cnt < t.target"""
        .stripMargin,

    "text_pack_sequences" ->
      s"""WITH t AS (SELECT doc_id, source,
         |  CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER) AS n_tokens
         |  FROM documents),
         |c AS (SELECT doc_id, source, n_tokens,
         |  CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id)
         |    AS BIGINT) AS cum
         |  FROM t)
         |SELECT doc_id, source, n_tokens, cum,
         |  CAST(floor((cum - n_tokens) / ${PackBudget}.0) AS BIGINT) AS bin
         |FROM c""".stripMargin,

    "text_filter_gopher" -> gopherSql,

    // the composed pipeline replays each stage's own twin as a CTE and
    // re-applies the composition: near-dup losers excluded (recursive-CTE
    // components over the materialized band-pair aux), normalized-dedup
    // winners and Gopher passers intersected, per-language report.
    // CAST(sum AS BIGINT): DuckDB sums INTEGER into HUGEINT, which hashes
    // as float64 through Arrow (the round-6 text_pack_sequences lesson)
    "pipeline_curate" ->
      s"""WITH nk AS (SELECT doc_id FROM (${AnnQueries.oracles("dedup_clusters")})
         |  WHERE NOT is_keeper),
         |nrm AS (SELECT doc_id FROM ($normDedupSql) WHERE NOT is_dup),
         |g AS (SELECT doc_id, n_tokens FROM ($gopherSql) WHERE keep)
         |SELECT d.lang, count(*) AS n_docs,
         |  CAST(sum(g.n_tokens) AS BIGINT) AS sum_tokens
         |FROM documents d
         |JOIN nrm ON nrm.doc_id = d.doc_id
         |JOIN g ON g.doc_id = d.doc_id
         |WHERE d.doc_id NOT IN (SELECT doc_id FROM nk)
         |GROUP BY d.lang""".stripMargin,

    "text_quality" ->
      """SELECT doc_id, length(text) AS n_chars,
        |length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS punct_chars,
        |length(regexp_replace(text, '[^0-9]', '', 'g')) AS digit_chars,
        |CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
        |  / greatest(length(text), 1) AS punct_ratio
        |FROM documents""".stripMargin,

    "text_langid" -> {
      def occ(w: String) =
        s"CAST((length(' ' || text || ' ') - length(regexp_replace(' ' || text || ' ', ' $w ', '', 'g'))) / ${w.length + 2} AS BIGINT)"
      s"""SELECT doc_id, lang AS labeled_lang,
         |${occ("the")} AS n_the, ${occ("data")} AS n_data,
         |${occ("merge")} AS n_merge
         |FROM documents""".stripMargin
    },

    "text_dedup_exact" ->
      """WITH d AS (SELECT doc_id, md5(text) AS h FROM documents),
        |k AS (SELECT h, MIN(doc_id) AS keeper FROM d GROUP BY h)
        |SELECT d.doc_id, k.keeper, d.doc_id <> k.keeper AS is_dup
        |FROM d JOIN k ON d.h = k.h""".stripMargin,

    "text_dedup_norm" -> normDedupSql,

    "text_jaccard_pairs" ->
      s"""WITH g AS (SELECT doc_id,
         |  unnest(list_distinct([substr(text, i, 3)
         |    for i in range(1, length(text) - 1)])) AS gram
         |  FROM documents WHERE doc_id < $JaccardMaxDocId AND length(text) >= 3),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS c
         |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT i, j,
         |  CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jacc
         |FROM inter JOIN sizes sa ON i = sa.doc_id
         |JOIN sizes sb ON j = sb.doc_id
         |WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= $JaccardThreshold""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp, length(text) AS n_chars
        |FROM documents""".stripMargin,

    "text_repetition" -> repetitionSql,

    // corpus-trained bigram model, mean inverse conditional probability;
    // the per-doc sum is a position-ordered list_sum so the double
    // accumulation order matches Spark's sorted fold bit-for-bit
    "text_lm_score" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents),
        |bg AS (SELECT doc_id, CAST(g.i AS INTEGER) AS pos,
        |  toks[CAST(g.i AS INTEGER)] AS w1,
        |  toks[CAST(g.i AS INTEGER) + 1] AS w2
        |  FROM t, unnest(generate_series(1, len(toks) - 1)) AS g(i)
        |  WHERE len(toks) >= 2),
        |bc AS (SELECT w1, w2, COUNT(*) AS cb FROM bg GROUP BY 1, 2),
        |hc AS (SELECT w1, SUM(cb) AS ch FROM bc GROUP BY 1),
        |sc AS (SELECT doc_id, pos, CAST(ch AS DOUBLE) / cb AS inv_p
        |  FROM bg JOIN bc USING (w1, w2) JOIN hc USING (w1)),
        |agg AS (SELECT doc_id, COUNT(*) AS n_bigrams,
        |  list_sum(list(inv_p ORDER BY pos)) AS sum_inv_p
        |  FROM sc GROUP BY doc_id)
        |SELECT doc_id, n_bigrams, sum_inv_p,
        |  sum_inv_p / n_bigrams AS lm_score FROM agg""".stripMargin,

    "text_stopwords" -> stopwordsSql,

    "text_decontaminate" -> {
      val w = DecontamGramTokens
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
         |  FROM documents),
         |g AS (SELECT doc_id,
         |  unnest(list_distinct([array_to_string(toks[i:i+${w - 1}], ' ')
         |    for i in range(1, len(toks) - ${w - 2})])) AS gram
         |  FROM t WHERE len(toks) >= $w),
         |ev AS (SELECT doc_id AS eval_id, gram FROM g
         |  WHERE doc_id % $DecontamEvalMod = $DecontamEvalRem),
         |es AS (SELECT eval_id, COUNT(*) AS n_eval FROM ev GROUP BY eval_id),
         |sh AS (SELECT g.doc_id, ev.eval_id, COUNT(*) AS n_shared
         |  FROM g JOIN ev USING (gram)
         |  WHERE g.doc_id % $DecontamEvalMod <> $DecontamEvalRem
         |  GROUP BY g.doc_id, ev.eval_id)
         |SELECT doc_id, eval_id, n_shared,
         |  CAST(n_shared AS DOUBLE) / n_eval AS eval_frac
         |FROM sh JOIN es USING (eval_id)""".stripMargin
    },

    "text_dedup_lines" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
         |  FROM documents),
         |seg AS (SELECT doc_id,
         |  unnest([{'idx': i,
         |    'seg': array_to_string(toks[(i*$LineTokens)+1:(i*$LineTokens)+$LineTokens], ' ')}
         |    for i in generate_series(0,
         |      CAST(ceil(len(toks)/(1.0*$LineTokens)) AS BIGINT) - 1)]) AS u
         |  FROM t),
         |s2 AS (SELECT doc_id, u.idx AS seg_idx, u.seg AS seg FROM seg),
         |k AS (SELECT seg, min(doc_id) AS kd, count(*) AS n_copies
         |  FROM s2 GROUP BY seg),
         |k2 AS (SELECT s2.seg, k.kd, min(s2.seg_idx) AS ki,
         |  any_value(k.n_copies) AS n_copies
         |  FROM s2 JOIN k ON s2.seg = k.seg AND s2.doc_id = k.kd
         |  GROUP BY s2.seg, k.kd)
         |SELECT s2.doc_id, s2.seg_idx, md5(s2.seg) AS seg_hash, k2.n_copies
         |FROM s2 JOIN k2 ON s2.seg = k2.seg AND s2.doc_id = k2.kd
         |  AND s2.seg_idx = k2.ki""".stripMargin,

    "text_pii" -> {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "\\b555-[0-9]{4}\\b"
      s"""WITH aug AS (SELECT doc_id, text ||
         |  CASE WHEN doc_id % $PiiEmailMod = $PiiEmailRem
         |    THEN ' contact user' || doc_id || '@example.com for details'
         |    ELSE '' END ||
         |  CASE WHEN doc_id % $PiiPhoneMod = $PiiPhoneRem
         |    THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |      || ' today'
         |    ELSE '' END AS t
         |  FROM documents)
         |SELECT doc_id,
         |  len(regexp_extract_all(t, '$email')) AS n_emails,
         |  len(regexp_extract_all(t, '$phone')) AS n_phones,
         |  md5(regexp_replace(regexp_replace(t, '$email', '<EMAIL>', 'g'),
         |    '$phone', '<PHONE>', 'g')) AS redacted_md5
         |FROM aug""".stripMargin
    },

    "text_sample_stratified" ->
      s"""SELECT doc_id, lang, source,
         |  doc_id * $SampleSalt % ${1L << 32} % 100 AS bucket
         |FROM documents
         |WHERE doc_id * $SampleSalt % ${1L << 32} % 100 <
         |  CASE WHEN lang = 'en' THEN $SampleRateEn ELSE $SampleRateOther END"""
        .stripMargin,

    "text_chunk" ->
      s"""SELECT doc_id, CAST(c.i AS INTEGER) AS chunk_idx,
         |  length(substr(text, CAST(c.i AS INTEGER) * $ChunkStride + 1,
         |    $ChunkChars)) AS chunk_len,
         |  md5(substr(text, CAST(c.i AS INTEGER) * $ChunkStride + 1,
         |    $ChunkChars)) AS chunk_hash
         |FROM documents, unnest(range(GREATEST(
         |  CAST(ceil(length(text) / (1.0 * $ChunkStride)) AS BIGINT), 1)))
         |  AS c(i)""".stripMargin,

    "text_dedup_substring" ->
      s"""WITH w AS (SELECT doc_id, CAST(p.i AS INTEGER) AS win_idx,
         |    md5(substr(text, CAST(p.i AS INTEGER) * $SubstrStride + 1,
         |      $SubstrWindow)) AS h
         |  FROM documents,
         |    unnest(range((length(text) - $SubstrWindow) // $SubstrStride + 1))
         |    AS p(i)
         |  WHERE length(text) >= $SubstrWindow),
         |d AS (SELECT h FROM w GROUP BY h
         |  HAVING COUNT(DISTINCT doc_id) >= 2),
         |n AS (SELECT doc_id, COUNT(*) AS n_windows FROM w GROUP BY doc_id),
         |du AS (SELECT doc_id, COUNT(*) AS dup_windows
         |  FROM w JOIN d USING (h) GROUP BY doc_id)
         |SELECT n.doc_id, n.n_windows,
         |  COALESCE(du.dup_windows, 0) AS dup_windows,
         |  CAST(COALESCE(du.dup_windows, 0) AS DOUBLE) / n.n_windows
         |    AS dup_frac
         |FROM n LEFT JOIN du USING (doc_id)""".stripMargin,

    "text_vocab" ->
      s"""WITH c AS (SELECT t.token, COUNT(*) AS n
         |  FROM (SELECT unnest(string_split(text, ' ')) AS token
         |        FROM documents) t
         |  WHERE t.token <> '' GROUP BY t.token)
         |SELECT token, n,
         |  row_number() OVER (ORDER BY n DESC, token) AS rank
         |FROM c ORDER BY n DESC, token LIMIT $VocabN""".stripMargin,

    "text_dedup_url" ->
      """WITH u AS (SELECT doc_id,
        |  CASE WHEN doc_id % 4 = 1 THEN 'HTTPS://WWW'
        |    ELSE 'https://www' END ||
        |  '.example.com/page/' || CAST(doc_id % 101 AS VARCHAR) ||
        |  CASE WHEN doc_id % 4 = 2 THEN '/' ELSE '' END ||
        |  CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&ref=x'
        |    ELSE '' END AS url
        |  FROM documents),
        |t AS (SELECT doc_id,
        |  regexp_replace(regexp_replace(lower(url), '\?.*$', ''),
        |    '/$', '') AS canon FROM u),
        |k AS (SELECT canon, MIN(doc_id) AS keeper, COUNT(*) AS n_copies
        |  FROM t GROUP BY canon)
        |SELECT t.doc_id, md5(t.canon) AS canon_md5, k.n_copies,
        |  t.doc_id = k.keeper AS is_keeper
        |FROM t JOIN k USING (canon)""".stripMargin,

    "text_length_quantiles" ->
      s"""WITH t AS (SELECT doc_id, lang,
         |  len(string_split_regex(trim(text), '\\s+')) AS n_tokens
         |  FROM documents),
         |rk AS (SELECT lang, n_tokens,
         |  row_number() OVER (PARTITION BY lang
         |    ORDER BY n_tokens, doc_id) AS rnk,
         |  COUNT(*) OVER (PARTITION BY lang) AS cnt FROM t)
         |SELECT lang, COUNT(*) AS n_docs,
         |  MAX(CASE WHEN rnk = (cnt * 25 + 99) // 100 THEN n_tokens END) AS p25,
         |  MAX(CASE WHEN rnk = (cnt * 50 + 99) // 100 THEN n_tokens END) AS p50,
         |  MAX(CASE WHEN rnk = (cnt * 75 + 99) // 100 THEN n_tokens END) AS p75,
         |  MAX(CASE WHEN rnk = (cnt * 95 + 99) // 100 THEN n_tokens END) AS p95
         |FROM rk GROUP BY lang""".stripMargin,

    // the full RAG replay: chunk windows, integer char-class histogram
    // features, exact (dist, id) top-k, chunk-identity hydration. All
    // arithmetic is integer-exact (distances are sums of squared int
    // diffs, exact in DOUBLE), so the composition hashes bit-for-bit.
    "pipeline_rag" ->
      s"""WITH ch AS (SELECT doc_id, CAST(c.i AS INTEGER) AS chunk_idx,
         |    substr(text, CAST(c.i AS INTEGER) * $ChunkStride + 1,
         |      $ChunkChars) AS chunk
         |  FROM documents, unnest(range(GREATEST(
         |    CAST(ceil(length(text) / (1.0 * $ChunkStride)) AS BIGINT), 1)))
         |    AS c(i)),
         |f AS (SELECT doc_id, chunk_idx, chunk,
         |    doc_id * $RagKeyBase + chunk_idx AS ckey,
         |    [list_sum([CASE WHEN ascii(substr(chunk, CAST(i AS INTEGER), 1))
         |        % 8 = CAST(j AS INTEGER) THEN 1 ELSE 0 END
         |      for i in range(1, length(chunk) + 1)])
         |      for j in range(0, 8)] AS v
         |  FROM ch WHERE length(chunk) > 0),
         |q AS (SELECT ckey AS qid, v AS qv FROM f
         |  WHERE ckey % $RagQueryMod = 0),
         |d AS (SELECT q.qid, f2.ckey AS id,
         |    list_sum([CAST((x[1] - x[2]) * (x[1] - x[2]) AS DOUBLE)
         |      for x in list_zip(q.qv, f2.v)]) AS dist
         |  FROM q, f f2),
         |r AS (SELECT qid, id, dist,
         |  row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rn
         |  FROM d)
         |SELECT r.qid, r.rn, r.id, r.dist, f.doc_id, f.chunk_idx,
         |  md5(f.chunk) AS chunk_hash
         |FROM r JOIN f ON r.id = f.ckey WHERE r.rn <= $RagK""".stripMargin)
}
