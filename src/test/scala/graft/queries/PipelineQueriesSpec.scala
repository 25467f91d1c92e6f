package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry

/** Engine-side regression gates for the training-data-pipeline entries
 * that the DuckDB twin can only replay (not independently derive):
 * semantic-dedup must actually FIND the planted near-duplicates, and the
 * repetition signals must match a hand computation on real fixture rows. */
class PipelineQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkEntry.configure(SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  test("dedup_semantic recovers >= 90% of planted near-dup pairs") {
    spark.sparkContext.setLogLevel("ERROR")
    val pairs = VectorQueries.queries("dedup_semantic")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = spark.read.parquet(s"$dir/embeddings.parquet")
      .where(org.apache.spark.sql.functions.col("vec_id")
        % VectorQueries.NearDupPlantMod === 0)
      .select("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(0) + VectorQueries.NearDupPlantBase))
    val found = planted.count(pairs.contains)
    assert(planted.nonEmpty)
    assert(found.toDouble / planted.length >= 0.9,
      s"found $found of ${planted.length} planted pairs")
  }

  test("text_dedup_lines drops later copies of duplicated segments") {
    import org.apache.spark.sql.functions._
    spark.sparkContext.setLogLevel("ERROR")
    val kept = TextQueries.queries("text_dedup_lines")(spark, dir)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val w = TextQueries.LineTokens
    val totalSegs = docs
      .select((ceil(size(split(col("text"), " ")) / w.toDouble)).as("n"))
      .agg(sum("n")).first().getLong(0)
    val keptRows = kept.collect()
    // every kept row is unique per (doc, idx); drops only happen when a
    // segment repeats, and the exact-dup docs in the fixture guarantee some
    assert(keptRows.map(r => (r.getLong(0), r.getInt(1))).distinct.length
      == keptRows.length)
    assert(keptRows.length < totalSegs, "fixture has duplicated docs; some segments must drop")
    // a duplicated segment's keeper is its first (doc_id, seg_idx) occurrence:
    // no kept row with n_copies > 1 may share a seg_hash with another kept row
    val multi = keptRows.filter(_.getLong(3) > 1).map(_.getString(2))
    assert(multi.distinct.length == multi.length)
  }

  test("text_pii finds exactly the planted contacts and redacts them") {
    spark.sparkContext.setLogLevel("ERROR")
    val got = TextQueries.queries("text_pii")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    got.foreach { case (id, (ne, np)) =>
      assert(ne == (if (id % TextQueries.PiiEmailMod == TextQueries.PiiEmailRem) 1 else 0), s"doc $id emails")
      assert(np == (if (id % TextQueries.PiiPhoneMod == TextQueries.PiiPhoneRem) 1 else 0), s"doc $id phones")
    }
    assert(got.values.map(_._1).sum > 0 && got.values.map(_._2).sum > 0)
  }

  test("text_mix_langs downsamples every language toward the smallest") {
    import org.apache.spark.sql.functions._
    spark.sparkContext.setLogLevel("ERROR")
    val orig = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = TextQueries.queries("text_mix_langs")(spark, dir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val target = orig.values.min
    kept.foreach { case (lang, n) =>
      assert(n <= orig(lang), s"$lang kept more than it had")
      // multiplicative-hash sampling: expect ~target keeps per lang
      assert(math.abs(n - target) <= target / 2, s"$lang kept $n vs target $target")
    }
    val skew = (m: Map[String, Long]) => m.values.max.toDouble / m.values.min
    assert(skew(kept) < skew(orig), "mixing must reduce language skew")
  }

  test("text_pack_sequences bins are the budget windows of a per-source cumsum") {
    spark.sparkContext.setLogLevel("ERROR")
    val rows = TextQueries.queries("text_pack_sequences")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4)))
    rows.groupBy(_._2).foreach { case (_, docs) =>
      var cum = 0L
      docs.sortBy(_._1).foreach { case (_, _, n, gotCum, bin) =>
        assert(gotCum == cum + n)
        assert(bin == cum / TextQueries.PackBudget)
        cum += n
      }
    }
    assert(rows.map(_._5).max > 0, "fixture must fill more than one bin")
  }

  test("search_hybrid_rrf matches an in-memory replay of both rankings + fusion") {
    spark.sparkContext.setLogLevel("ERROR")
    val got = VectorQueries.queries("search_hybrid_rrf")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.sortBy(_._2).map(x => (x._3, x._4)).toSeq }
    // vector side from the already-gated knn_l2; lexical side + fusion
    // replayed in plain Scala integer/rational arithmetic
    val vec = VectorQueries.queries("knn_l2")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(x => x._3 -> x._2).toMap }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val n = docs.length.toLong
    val tf = docs.map { case (id, ts) =>
      id -> ts.groupBy(identity).map { case (t, o) => t -> o.length.toLong } }.toMap
    val dfreq = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (t, o) => t -> o.size.toLong }
    val k = VectorQueries.K
    got.keys.foreach { qid =>
      // same rarest-first term budget as the engine
      val qtoks = tf(qid).keySet.toSeq
        .sortBy(t => (dfreq(t), t)).take(VectorQueries.LexQueryTerms)
      // candidate set = docs sharing ≥1 budgeted term (the posting join's
      // output) — NOT score>0: a term with df == n scores 0 after integer
      // truncation yet the engine and SQL twin still rank its docs
      val scores = docs.collect { case (id, _)
          if qtoks.exists(tf(id).contains) =>
        id -> qtoks.flatMap(t => tf(id).get(t).map { f =>
          ((n - dfreq(t)) * f * VectorQueries.LexScale) / (dfreq(t) * (f + 3))
        }).sum
      }
      val lex = scores.sortBy { case (id, s) => (-s, id) }.take(k)
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
      val cand = (vec(qid).keySet ++ lex.keySet).toSeq
      val want = cand.map { id =>
        val f = vec(qid).get(id).map(r => 1.0 / (r + VectorQueries.RrfK)).getOrElse(0.0) +
          lex.get(id).map(r => 1.0 / (r + VectorQueries.RrfK)).getOrElse(0.0)
        (id, f)
      }.sortBy { case (id, f) => (-f, id) }.take(k)
      assert(got(qid) == want, s"query $qid")
    }
  }

  test("text_filter_gopher verdict equals rule application on its own signals") {
    spark.sparkContext.setLogLevel("ERROR")
    val rows = TextQueries.queries("text_filter_gopher")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, avg, stop, dup, big, keep) = (r.getInt(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6))
      val want = n >= TextQueries.FilterMinTokens && n <= TextQueries.FilterMaxTokens &&
        avg >= TextQueries.FilterMinAvgTokenLen && avg <= TextQueries.FilterMaxAvgTokenLen &&
        stop >= TextQueries.FilterMinStopFrac && dup <= TextQueries.FilterMaxDupFrac &&
        big <= TextQueries.FilterMaxBigramFrac
      assert(keep == want, s"doc ${r.getLong(0)}")
    }
    val kept = rows.count(_.getBoolean(6))
    info(s"kept $kept of ${rows.length}")
    assert(kept > 0 && kept < rows.length, "thresholds must split the corpus")
  }

  test("text_repetition matches a hand computation on fixture rows") {
    spark.sparkContext.setLogLevel("ERROR")
    val got = TextQueries.queries("text_repetition")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getDouble(3), r.getLong(4), r.getDouble(5)))
      .toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(docs.length == got.size)
    docs.take(25).foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      val n = toks.length
      val nd = toks.distinct.length
      val bigrams = toks.sliding(2).map(_.mkString(" ")).toSeq
      val topc = if (n >= 2) bigrams.groupBy(identity).values.map(_.size).max else 0
      val (gn, gnd, gdup, gtop, gfrac) = got(id)
      assert(gn == n && gnd == nd && gtop == topc.toLong, s"doc $id")
      assert(gdup == 1.0 - nd.toDouble / n, s"doc $id dup frac")
      assert(gfrac == (if (n >= 2) topc.toDouble / (n - 1) else 0.0), s"doc $id bigram frac")
    }
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("text_chunk windows match an independent re-chunking of every doc") {
    spark.sparkContext.setLogLevel("ERROR")
    val (c, st) = (TextQueries.ChunkChars, TextQueries.ChunkStride)
    val got = TextQueries.queries("text_chunk")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getInt(2), r.getString(3)))
      .toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    var total = 0
    docs.foreach { case (id, text) =>
      val n = math.max(math.ceil(text.length / st.toDouble).toInt, 1)
      (0 until n).foreach { i =>
        val chunk = text.substring(i * st, math.min(i * st + c, text.length))
        val (len, hash) = got((id, i))
        assert(len == chunk.length && hash == md5hex(chunk), s"doc $id chunk $i")
        total += 1
      }
    }
    assert(got.size == total, "no extra chunks beyond the expected windows")
    // overlap property: consecutive chunks share ChunkChars-ChunkStride chars,
    // so stride-prefixes plus the final chunk reconstruct each document
    docs.take(10).foreach { case (_, text) =>
      val n = math.max(math.ceil(text.length / st.toDouble).toInt, 1)
      val rebuilt = (0 until n).map { i =>
        val chunk = text.substring(i * st, math.min(i * st + c, text.length))
        if (i < n - 1) chunk.take(st) else chunk
      }.mkString
      assert(rebuilt == text)
    }
  }

  test("text_dedup_substring matches an independent local recomputation") {
    spark.sparkContext.setLogLevel("ERROR")
    val (w, t) = (TextQueries.SubstrWindow, TextQueries.SubstrStride)
    val got = TextQueries.queries("text_dedup_substring")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // independent implementation of the same definition: window hashes in
    // plain local Scala, duplicated = seen in >= 2 distinct docs
    val wins = docs.filter(_._2.length >= w).map { case (id, text) =>
      id -> (0 to (text.length - w) / t)
        .map(i => md5hex(text.substring(i * t, i * t + w)))
    }
    val docsPerHash = wins.flatMap { case (id, hs) => hs.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (h, xs) => h -> xs.map(_._2).distinct.length }
    assert(got.size == wins.length)
    wins.foreach { case (id, hs) =>
      val dup = hs.count(h => docsPerHash(h) >= 2)
      val (gn, gd, gf) = got(id)
      assert(gn == hs.length && gd == dup, s"doc $id windows")
      assert(gf == dup.toDouble / hs.length, s"doc $id dup_frac")
    }
    // the near-dup fixture clones must actually produce duplicated spans
    assert(got.values.exists(_._2 > 0), "corpus must contain shared spans")
  }

  test("pipeline_rag: self-retrieval, k rows per query, hydration integrity") {
    spark.sparkContext.setLogLevel("ERROR")
    val rows = TextQueries.queries("pipeline_rag")(spark, dir).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (qid, hits) =>
      assert(hits.length == TextQueries.RagK, s"query $qid row count")
      assert(hits.map(_.getInt(1)).sorted.toSeq == (1 to TextQueries.RagK),
        s"query $qid rn sequence")
      // the query chunk itself is a 0-distance candidate, so the top hit
      // must sit at distance 0 (a clone with a smaller key may win the tie)
      assert(hits.minBy(_.getInt(1)).getDouble(3) == 0.0, s"query $qid top dist")
      // distances ascend with rn
      val sorted = hits.sortBy(_.getInt(1)).map(_.getDouble(3)).toSeq
      assert(sorted == sorted.sorted, s"query $qid dist order")
    }
    // hydration integrity: the packed key decodes to the joined identity
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(4) * TextQueries.RagKeyBase
        + r.getInt(5), "id != doc_id*base+chunk_idx")
    }
  }

  test("text_vocab equals an independent corpus count") {
    spark.sparkContext.setLogLevel("ERROR")
    val got = TextQueries.queries("text_vocab")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val counts = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect().iterator
      .flatMap(_.getString(0).split(" ", -1)).filter(_.nonEmpty)
      .foldLeft(Map.empty[String, Long]) { (m, t) =>
        m.updated(t, m.getOrElse(t, 0L) + 1L)
      }
    val want = counts.toSeq.sortBy { case (t, n) => (-n, t) }
      .take(TextQueries.VocabN).zipWithIndex
      .map { case ((t, n), i) => (t, n, i + 1) }
    assert(got.sortBy(_._3).toSeq == want)
  }
}
