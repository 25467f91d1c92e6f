package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Pq
import graft.partitioners.KMeansPartitioner

/**
 * Product-quantization entries under the hard DuckDB gate. The model fit
 * is seeded and deterministic, so the entry materializes the codebooks
 * (`ann_pq_cb`: sub, code, cvec) and the exploded code assignments
 * (`ann_pq_codes`: id, sub, code) as aux parquet, and the oracle REPLAYS
 * asymmetric distance computation in SQL: per-subspace squared-L2 from
 * the query slice to the assigned codeword (ordered list_zip sum = the
 * engine's sequential-double sub-kernel), folded across subspaces with
 * `list_sum(list(subdist ORDER BY sub))` (= the engine's subspace-order
 * accumulation), then top-k by (dist, id). `ann_pq_rerank` extends the
 * replay with the exact-L2 re-rank of the ADC shortlist — both stages of
 * the IVFADC+R pipeline are hash-compared, not just row-counted.
 */
object PqQueries {
  val K = 10
  val Dim = 64
  val NumSub = 16
  val SubDim: Int = Dim / NumSub
  val CodesPerSub = 256
  val Iterations = 8
  val Seed = 42L
  val Shortlist = 50

  private val fitted =
    scala.collection.concurrent.TrieMap.empty[String, Pq.PqModel]
  private val prepared =
    scala.collection.concurrent.TrieMap.empty[String, (Pq.PqModel, DataFrame)]

  private def corpus(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))

  private def queriesDf(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .where(col("vec_id") % VectorQueries.QueryMod === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))

  private val samples =
    scala.collection.concurrent.TrieMap.empty[String, Array[Array[Float]]]

  // ordered sample: limit() without a sort is not deterministic across
  // file layouts, and the fit must be replayable run-to-run. Cached per
  // dir — the PQ codebook fit and the IVF coarse quantizer fit share one
  // driver-side collect.
  private def fitSample(s: SparkSession, dir: String): Array[Array[Float]] =
    samples.getOrElseUpdate(dir,
      Tables(s, dir, "embeddings").orderBy("vec_id").limit(5000)
        .select("embedding").collect().map(_.getSeq[Float](0).toArray))

  private def model(s: SparkSession, dir: String): Pq.PqModel =
    fitted.getOrElseUpdate(dir,
      Pq.fit(fitSample(s, dir), NumSub, CodesPerSub, Iterations, Seed))

  /** Materialize codebooks + codes aux, return the model and the code
   * table read back from the aux bytes (the gate consumes exactly what
   * the oracle replays). Cached per dir: ann_pq and ann_pq_rerank share
   * one full-corpus encode and one aux write. */
  private def prepare(s: SparkSession, dir: String): (Pq.PqModel, DataFrame) =
    prepared.getOrElseUpdate(dir, prepare0(s, dir))

  private def prepare0(s: SparkSession, dir: String): (Pq.PqModel, DataFrame) = {
    import s.implicits._
    val m = model(s, dir)
    val cbRows = for {
      sub <- 0 until m.numSub
      code <- 0 until m.codesPerSub
    } yield (sub, code, m.codebooks(sub)(code).toSeq)
    OracleAux.write(cbRows.toDF("sub", "code", "cvec"), dir, "ann_pq_cb")
    val codes = Pq.encodeDf(corpus(s, dir), m)
    OracleAux.write(codes.select(col("id"),
      posexplode(col("codes")).as(Seq("sub", "code"))), dir, "ann_pq_codes")
    val back = OracleAux.read(s, dir, "ann_pq_codes")
      .groupBy("id")
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("code")))),
        c => c.getField("code")).as("codes"))
    (m, back)
  }

  // IVF-PQ coarse quantizer: cells scale with corpus (n/cell bounded),
  // probes trade recall for scan fraction — both fixed here for replay
  val IvfCells = 16
  val IvfProbes = 6
  val IvfSeed = 42L

  private val ivfPrep =
    scala.collection.concurrent.TrieMap.empty[String, (Pq.PqModel, DataFrame, DataFrame)]

  /** Route the code column through a seeded k-means coarse quantizer,
   * materialize the routing as aux parquet ((pid, id) / (pid, qid)), and
   * hand back (model, routed codes, routed queries) — both routed sides
   * read back from the aux bytes the oracle replays. Cached per dir:
   * ann_ivf_pq and ann_ivf_pq_rerank share one routing pass. */
  private def ivfPrepare(s: SparkSession, dir: String): (Pq.PqModel, DataFrame, DataFrame) =
    ivfPrep.getOrElseUpdate(dir, {
      import s.implicits._
      val (m, codes) = prepare(s, dir)
      val km = KMeansPartitioner.fit(fitSample(s, dir), k = IvfCells,
        replicationFactor = 1, iterations = 8, seed = IvfSeed,
        queryProbes = IvfProbes)
      val b = s.sparkContext.broadcast(km)
      val dr = corpus(s, dir).as[(Long, Array[Float])]
        .flatMap { case (id, v) => b.value.dataPartitions(v, id).map(pid => (pid, id)) }
        .toDF("pid", "id")
      OracleAux.write(dr, dir, "ann_ivf_pq_dr")
      val qr = queriesDf(s, dir).as[(Long, Array[Float])]
        .flatMap { case (qid, v) => b.value.queryPartitions(v).map(pid => (pid, qid)) }
        .toDF("pid", "qid")
      OracleAux.write(qr, dir, "ann_ivf_pq_qr")
      val drCodes = OracleAux.read(s, dir, "ann_ivf_pq_dr").join(codes, "id")
        .select(col("pid"), col("id"), col("codes"))
      val qrBack = OracleAux.read(s, dir, "ann_ivf_pq_qr")
        .join(broadcast(queriesDf(s, dir)), "qid")
        .select(col("pid"), col("qid"), col("qv"))
      (m, drCodes, qrBack)
    })

  // OPQ: outer alternation rounds for the learned rotation
  val OpqIterations = 3

  private val opqPrepared =
    scala.collection.concurrent.TrieMap.empty[String, (graft.ops.Opq.OpqModel, DataFrame)]

  /** OPQ prepare: fit rotation+codebooks on the shared sample, rotate
   * the corpus/queries row-locally (R broadcast), materialize rotated
   * queries + codebooks + codes as aux. The oracle replays ADC from the
   * aux exactly like ann_pq; the exact re-rank runs in the ORIGINAL
   * space (L2 is rotation-invariant), so its replay needs no rotation
   * arithmetic at all. */
  private def opqPrepare(s: SparkSession, dir: String): (graft.ops.Opq.OpqModel, DataFrame) =
    opqPrepared.getOrElseUpdate(dir, {
      import s.implicits._
      val om = graft.ops.Opq.fit(fitSample(s, dir), NumSub, CodesPerSub,
        Iterations, OpqIterations, Seed)
      val cbRows = for {
        sub <- 0 until om.pq.numSub
        code <- 0 until om.pq.codesPerSub
      } yield (sub, code, om.pq.codebooks(sub)(code).toSeq)
      OracleAux.write(cbRows.toDF("sub", "code", "cvec"), dir, "ann_opq_cb")
      val bm = s.sparkContext.broadcast(om)
      val rotated = corpus(s, dir).as[(Long, Array[Float])]
        .map { case (id, v) => (id, bm.value.rotate(v)) }.toDF("id", "vec")
      val codes = Pq.encodeDf(rotated, om.pq)
      OracleAux.write(codes.select(col("id"),
        posexplode(col("codes")).as(Seq("sub", "code"))), dir, "ann_opq_codes")
      val qRot = queriesDf(s, dir).as[(Long, Array[Float])]
        .map { case (qid, v) => (qid, bm.value.rotate(v)) }.toDF("qid", "qv")
      OracleAux.write(qRot, dir, "ann_opq_q")
      val back = OracleAux.read(s, dir, "ann_opq_codes")
        .groupBy("id")
        .agg(transform(array_sort(collect_list(struct(col("sub"), col("code")))),
          c => c.getField("code")).as("codes"))
      (om, back)
    })

  // SQ8: per-dimension uniform grid, one byte per dimension (4x memory
  // cut at dim=64) — see graft.ops.Sq.
  val SqLevels = 256

  private val sqPrepared =
    scala.collection.concurrent.TrieMap.empty[String, (graft.ops.Sq.SqModel, DataFrame)]

  /** Materialize the SQ grid as a subDim-1 codebook aux + exploded codes,
   * return the model and the code table read back from the aux bytes —
   * the same replay contract as [[prepare]]. */
  private def sqPrepare(s: SparkSession, dir: String): (graft.ops.Sq.SqModel, DataFrame) =
    sqPrepared.getOrElseUpdate(dir, {
      import s.implicits._
      val m = graft.ops.Sq.fit(fitSample(s, dir), SqLevels)
      val cbRows = for {
        d <- 0 until m.dim
        c <- 0 until m.levels
      } yield (d, c, Seq(m.recon(d, c)))
      OracleAux.write(cbRows.toDF("sub", "code", "cvec"), dir, "ann_sq8_cb")
      val codes = graft.ops.Sq.encodeDf(corpus(s, dir), m)
      OracleAux.write(codes.select(col("id"),
        posexplode(col("codes")).as(Seq("sub", "code"))), dir, "ann_sq8_codes")
      val back = OracleAux.read(s, dir, "ann_sq8_codes")
        .groupBy("id")
        .agg(transform(array_sort(collect_list(struct(col("sub"), col("code")))),
          c => c.getField("code")).as("codes"))
      (m, back)
    })

  // BQ: one sign bit per dimension (64-dim embedding = ONE long, a 32x
  // memory cut); Hamming values are coarse (65 levels at dim 64), so the
  // re-rank shortlist is wider than the float-code paths'.
  val BqShortlist = 100

  private val bqPrepared = scala.collection.concurrent.TrieMap
    .empty[String, (graft.ops.Bq.BqModel, DataFrame, DataFrame)]

  /** Materialize packed corpus + query codes as aux (the encode step is
   * engine-internal like the minhash signatures; the oracle replays the
   * Hamming scan + re-rank from the code bytes). */
  private def bqPrepare(s: SparkSession, dir: String)
      : (graft.ops.Bq.BqModel, DataFrame, DataFrame) =
    bqPrepared.getOrElseUpdate(dir, {
      val m = graft.ops.Bq.fit(fitSample(s, dir))
      OracleAux.write(graft.ops.Bq.encodeDf(corpus(s, dir), m), dir,
        "ann_bq_codes")
      OracleAux.write(graft.ops.Bq.encodeDf(
        queriesDf(s, dir).select(col("qid").as("id"), col("qv").as("vec")), m)
        .select(col("id").as("qid"), col("code").as("qcode")), dir,
        "ann_bq_qcodes")
      (m, OracleAux.read(s, dir, "ann_bq_codes"),
        OracleAux.read(s, dir, "ann_bq_qcodes"))
    })

  /** The dir-cached SQ quantizer, with its codebook/code aux guaranteed
   * materialized — shared with EvalQueries' compressed cold-tier entry so
   * one oracle replay covers both execution paths. */
  private[queries] def sqModelFor(s: SparkSession, dir: String): graft.ops.Sq.SqModel =
    sqPrepare(s, dir)._1

  /** The dir-cached PQ model, with its codes aux materialized (the
   * cold-tier PQ entry shares ann_pq_rerank's oracle, which replays from
   * that aux). */
  private[queries] def pqModelFor(s: SparkSession, dir: String): Pq.PqModel =
    prepare(s, dir)._1

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_sq8" -> { (s, dir) =>
      val (m, codes) = sqPrepare(s, dir)
      graft.ops.Sq.search(codes, queriesDf(s, dir), m, K)
    },
    "ann_sq8_rerank" -> { (s, dir) =>
      val (m, codes) = sqPrepare(s, dir)
      graft.ops.Sq.searchReranked(codes, corpus(s, dir), queriesDf(s, dir),
        m, K, Shortlist)
    },
    "ann_bq_rerank" -> { (s, dir) =>
      val (_, codes, qCodes) = bqPrepare(s, dir)
      graft.ops.Bq.searchReranked(codes, qCodes, corpus(s, dir),
        queriesDf(s, dir), K, BqShortlist)
    },
    "ann_pq" -> { (s, dir) =>
      val (m, codes) = prepare(s, dir)
      Pq.search(codes, queriesDf(s, dir), m, K)
    },
    "ann_pq_rerank" -> { (s, dir) =>
      val (m, codes) = prepare(s, dir)
      Pq.searchReranked(codes, corpus(s, dir), queriesDf(s, dir), m, K, Shortlist)
    },
    "ann_ivf_pq" -> { (s, dir) =>
      val (m, drCodes, qr) = ivfPrepare(s, dir)
      Pq.searchRoutedAdc(drCodes, qr, m, K)
    },
    "ann_ivf_sq8" -> { (s, dir) =>
      // IVF_SQ8 (the Milvus index type of that name): the shared coarse
      // quantizer routes SQ8 code rows to cells, queries probe nearest
      // cells, dequantized-L2 ADC scan over probed cells only — same
      // routing aux as ann_ivf_pq, same grid aux as ann_sq8, so the
      // oracle is the routed replay over the SQ codebook.
      val (_, _, qr) = ivfPrepare(s, dir)
      val (sm, sqCodes) = sqPrepare(s, dir)
      val drSq = OracleAux.read(s, dir, "ann_ivf_pq_dr").join(sqCodes, "id")
        .select(col("pid"), col("id"), col("codes"))
      Pq.searchRoutedAdc(drSq, qr, sm.toPq, K)
    },
    "ann_ivf_pq_rerank" -> { (s, dir) =>
      val (m, drCodes, qr) = ivfPrepare(s, dir)
      Pq.rerankExact(Pq.searchRoutedAdc(drCodes, qr, m, Shortlist),
        corpus(s, dir), queriesDf(s, dir), K)
    },
    "ann_opq_rerank" -> { (s, dir) =>
      // OPQ (learned-rotation PQ): ADC shortlist in the rotated space
      // (rotated queries read back from the aux the oracle replays),
      // exact re-rank in the original space — rotation invariance of L2
      // makes the two spaces agree on true distances.
      val (om, codes) = opqPrepare(s, dir)
      val qRot = OracleAux.read(s, dir, "ann_opq_q")
      Pq.rerankExact(Pq.search(codes, qRot, om.pq, Shortlist),
        corpus(s, dir), queriesDf(s, dir), K)
    },
    "ann_opq_ivf" -> { (s, dir) =>
      // the Faiss "OPQ,IVF,PQ" standard composition: the shared coarse
      // quantizer routes in the ORIGINAL space (L2 rotation invariance
      // means cell geometry is equivalent either side of R, so the
      // ann_ivf_pq routing aux is reused verbatim), and the probed-cell
      // ADC scan runs over OPQ codes with the ROTATED queries. Oracle:
      // the routed replay with the OPQ codebook/code/query aux.
      val (om, opqCodes) = opqPrepare(s, dir)
      val (_, _, qr) = ivfPrepare(s, dir)
      val drOpq = OracleAux.read(s, dir, "ann_ivf_pq_dr").join(opqCodes, "id")
        .select(col("pid"), col("id"), col("codes"))
      val qrRot = qr.drop("qv")
        .join(broadcast(OracleAux.read(s, dir, "ann_opq_q")), "qid")
        .select(col("pid"), col("qid"), col("qv"))
      Pq.searchRoutedAdc(drOpq, qrRot, om.pq, K)
    })

  /** ADC replay: subdist = ordered zip-sum over the subspace slice,
   * dist = ordered fold across subspaces — both plain left folds, so
   * they reproduce the engine's double accumulation bit-for-bit.
   * Parameterized over the aux pair + subspace width: the flat-PQ
   * (subDim 4) and SQ8 (subDim 1, grid codebook) replays are the same
   * SQL. */
  private def adcCteFor(cbTable: String, codesTable: String,
      subDim: Int): String =
    s"""cb AS (SELECT * FROM ${OracleAux.ref(cbTable)}),
       |c AS (SELECT * FROM ${OracleAux.ref(codesTable)}),
       |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
       |  WHERE vec_id % ${VectorQueries.QueryMod} = 0),
       |sd AS (SELECT q.qid, c.id, c.sub,
       |  list_sum([(CAST(x[1] AS DOUBLE)-CAST(x[2] AS DOUBLE))
       |      * (CAST(x[1] AS DOUBLE)-CAST(x[2] AS DOUBLE))
       |    for x in list_zip(
       |      list_slice(q.qv, c.sub*$subDim+1, c.sub*$subDim+$subDim),
       |      cb.cvec)]) AS subdist
       |  FROM q CROSS JOIN c JOIN cb ON cb.sub = c.sub AND cb.code = c.code),
       |d AS (SELECT qid, id, list_sum(list(subdist ORDER BY sub)) AS dist
       |  FROM sd GROUP BY qid, id),
       |r AS (SELECT qid, id, dist,
       |  row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rn FROM d)"""
      .stripMargin

  private def adcCte: String = adcCteFor("ann_pq_cb", "ann_pq_codes", SubDim)

  /** OPQ ADC replay: identical fold, but the query side is the ROTATED
   * query aux (the oracle never re-derives the rotation — materialized
   * values are the contract, as with every seeded model in the suite). */
  private def opqAdcCte: String =
    s"""cb AS (SELECT * FROM ${OracleAux.ref("ann_opq_cb")}),
       |c AS (SELECT * FROM ${OracleAux.ref("ann_opq_codes")}),
       |q AS (SELECT qid, qv FROM ${OracleAux.ref("ann_opq_q")}),
       |sd AS (SELECT q.qid, c.id, c.sub,
       |  list_sum([(CAST(x[1] AS DOUBLE)-CAST(x[2] AS DOUBLE))
       |      * (CAST(x[1] AS DOUBLE)-CAST(x[2] AS DOUBLE))
       |    for x in list_zip(
       |      list_slice(q.qv, c.sub*$SubDim+1, c.sub*$SubDim+$SubDim),
       |      cb.cvec)]) AS subdist
       |  FROM q CROSS JOIN c JOIN cb ON cb.sub = c.sub AND cb.code = c.code),
       |d AS (SELECT qid, id, list_sum(list(subdist ORDER BY sub)) AS dist
       |  FROM sd GROUP BY qid, id),
       |r AS (SELECT qid, id, dist,
       |  row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rn FROM d)"""
      .stripMargin

  private def sqCte: String = adcCteFor("ann_sq8_cb", "ann_sq8_codes", 1)

  /** ADC replay restricted to the routed candidate set: cells joined from
   * the materialized (pid, id)/(pid, qid) aux — the oracle sees exactly
   * the probed-cell fan-out the engine executed. Parameterized over the
   * codebook/codes aux + subspace width: IVF-PQ and IVF-SQ8 replays are
   * the same SQL over different aux pairs (both reuse the ann_ivf_pq
   * routing aux — the coarse quantizer is shared). */
  private def routedAdcCteFor(cbTable: String, codesTable: String,
      subDim: Int): String =
    s"""cb AS (SELECT * FROM ${OracleAux.ref(cbTable)}),
       |c AS (SELECT * FROM ${OracleAux.ref(codesTable)}),
       |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
       |  WHERE vec_id % ${VectorQueries.QueryMod} = 0),
       |dr AS (SELECT * FROM ${OracleAux.ref("ann_ivf_pq_dr")}),
       |qr AS (SELECT * FROM ${OracleAux.ref("ann_ivf_pq_qr")}),
       |cand AS (SELECT DISTINCT qr.qid, dr.id FROM qr JOIN dr ON qr.pid = dr.pid),
       |sd AS (SELECT q.qid, c.id, c.sub,
       |  list_sum([(CAST(x[1] AS DOUBLE)-CAST(x[2] AS DOUBLE))
       |      * (CAST(x[1] AS DOUBLE)-CAST(x[2] AS DOUBLE))
       |    for x in list_zip(
       |      list_slice(q.qv, c.sub*$subDim+1, c.sub*$subDim+$subDim),
       |      cb.cvec)]) AS subdist
       |  FROM cand n JOIN q ON q.qid = n.qid JOIN c ON c.id = n.id
       |  JOIN cb ON cb.sub = c.sub AND cb.code = c.code),
       |d AS (SELECT qid, id, list_sum(list(subdist ORDER BY sub)) AS dist
       |  FROM sd GROUP BY qid, id),
       |r AS (SELECT qid, id, dist,
       |  row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rn FROM d)"""
      .stripMargin

  private def routedAdcCte: String =
    routedAdcCteFor("ann_pq_cb", "ann_pq_codes", SubDim)

  /** Routed OPQ replay: the ann_ivf_pq routing aux with the OPQ
   * codebook/code tables and the rotated-query aux as q. */
  private def routedOpqCte: String =
    s"""cb AS (SELECT * FROM ${OracleAux.ref("ann_opq_cb")}),
       |c AS (SELECT * FROM ${OracleAux.ref("ann_opq_codes")}),
       |q AS (SELECT qid, qv FROM ${OracleAux.ref("ann_opq_q")}),
       |dr AS (SELECT * FROM ${OracleAux.ref("ann_ivf_pq_dr")}),
       |qr AS (SELECT * FROM ${OracleAux.ref("ann_ivf_pq_qr")}),
       |cand AS (SELECT DISTINCT qr.qid, dr.id FROM qr JOIN dr ON qr.pid = dr.pid),
       |sd AS (SELECT q.qid, c.id, c.sub,
       |  list_sum([(CAST(x[1] AS DOUBLE)-CAST(x[2] AS DOUBLE))
       |      * (CAST(x[1] AS DOUBLE)-CAST(x[2] AS DOUBLE))
       |    for x in list_zip(
       |      list_slice(q.qv, c.sub*$SubDim+1, c.sub*$SubDim+$SubDim),
       |      cb.cvec)]) AS subdist
       |  FROM cand n JOIN q ON q.qid = n.qid JOIN c ON c.id = n.id
       |  JOIN cb ON cb.sub = c.sub AND cb.code = c.code),
       |d AS (SELECT qid, id, list_sum(list(subdist ORDER BY sub)) AS dist
       |  FROM sd GROUP BY qid, id),
       |r AS (SELECT qid, id, dist,
       |  row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rn FROM d)"""
      .stripMargin

  private def routedSqCte: String =
    routedAdcCteFor("ann_sq8_cb", "ann_sq8_codes", 1)

  /** Replay twin of the FILTERED compressed cold scans (EvalQueries'
   * `knn_coldtier_{sq,pq}_filtered`): the same code-distance shortlist
   * as the unfiltered rerank twins, over-fetched by `overfetch`
   * (matching the engine's filter-oblivious over-fetch), with the
   * label equality applied at the exact-rerank hydration — exactly
   * where the engine applies it. Not in [[oracles]] (those keys pair
   * with ann_* entries; these pair with EvalQueries entries). */
  def filteredCompressedOracle(cte: String, overfetch: Int): String =
    s"""WITH $cte,
       |short AS (SELECT qid, id FROM r WHERE rn <= ${Shortlist * overfetch}),
       |ex AS (SELECT s.qid, s.id,
       |  ${VectorQueries.l2Sql("q2.embedding", "b.embedding")} AS dist
       |  FROM short s JOIN embeddings q2 ON q2.vec_id = s.qid
       |  JOIN embeddings b ON b.vec_id = s.id
       |  WHERE b.label = q2.label),
       |rr AS (SELECT qid, id, dist,
       |  row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rn FROM ex)
       |SELECT qid, rn, id, dist FROM rr WHERE rn <= $K""".stripMargin

  def filteredSqOracle(overfetch: Int): String =
    filteredCompressedOracle(sqCte, overfetch)
  def filteredPqOracle(overfetch: Int): String =
    filteredCompressedOracle(adcCte, overfetch)

  def oracles: Map[String, String] = Map(
    "ann_sq8" ->
      s"""WITH $sqCte
         |SELECT qid, rn, id, dist FROM r WHERE rn <= $K""".stripMargin,

    "ann_bq_rerank" ->
      s"""WITH c AS (SELECT * FROM ${OracleAux.ref("ann_bq_codes")}),
         |qc AS (SELECT * FROM ${OracleAux.ref("ann_bq_qcodes")}),
         |d AS (SELECT qc.qid, c.id,
         |  CAST(list_sum([bit_count(xor(x[1], x[2]))
         |    for x in list_zip(qc.qcode, c.code)]) AS DOUBLE) AS dist
         |  FROM qc CROSS JOIN c),
         |r AS (SELECT qid, id, dist,
         |  row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rn FROM d),
         |short AS (SELECT qid, id FROM r WHERE rn <= $BqShortlist),
         |ex AS (SELECT s.qid, s.id,
         |  ${VectorQueries.l2Sql("q2.embedding", "b.embedding")} AS dist
         |  FROM short s JOIN embeddings q2 ON q2.vec_id = s.qid
         |  JOIN embeddings b ON b.vec_id = s.id),
         |rr AS (SELECT qid, id, dist,
         |  row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rn FROM ex)
         |SELECT qid, rn, id, dist FROM rr WHERE rn <= $K""".stripMargin,

    "ann_sq8_rerank" ->
      s"""WITH $sqCte,
         |short AS (SELECT qid, id FROM r WHERE rn <= $Shortlist),
         |ex AS (SELECT s.qid, s.id,
         |  ${VectorQueries.l2Sql("q2.embedding", "b.embedding")} AS dist
         |  FROM short s JOIN embeddings q2 ON q2.vec_id = s.qid
         |  JOIN embeddings b ON b.vec_id = s.id),
         |rr AS (SELECT qid, id, dist,
         |  row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rn FROM ex)
         |SELECT qid, rn, id, dist FROM rr WHERE rn <= $K""".stripMargin,

    "ann_pq" ->
      s"""WITH $adcCte
         |SELECT qid, rn, id, dist FROM r WHERE rn <= $K""".stripMargin,

    "ann_ivf_pq" ->
      s"""WITH $routedAdcCte
         |SELECT qid, rn, id, dist FROM r WHERE rn <= $K""".stripMargin,

    "ann_ivf_sq8" ->
      s"""WITH $routedSqCte
         |SELECT qid, rn, id, dist FROM r WHERE rn <= $K""".stripMargin,

    "ann_ivf_pq_rerank" ->
      s"""WITH $routedAdcCte,
         |short AS (SELECT qid, id FROM r WHERE rn <= $Shortlist),
         |ex AS (SELECT s.qid, s.id,
         |  ${VectorQueries.l2Sql("q2.embedding", "b.embedding")} AS dist
         |  FROM short s JOIN embeddings q2 ON q2.vec_id = s.qid
         |  JOIN embeddings b ON b.vec_id = s.id),
         |rr AS (SELECT qid, id, dist,
         |  row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rn FROM ex)
         |SELECT qid, rn, id, dist FROM rr WHERE rn <= $K""".stripMargin,

    "ann_pq_rerank" ->
      s"""WITH $adcCte,
         |short AS (SELECT qid, id FROM r WHERE rn <= $Shortlist),
         |ex AS (SELECT s.qid, s.id,
         |  ${VectorQueries.l2Sql("q2.embedding", "b.embedding")} AS dist
         |  FROM short s JOIN embeddings q2 ON q2.vec_id = s.qid
         |  JOIN embeddings b ON b.vec_id = s.id),
         |rr AS (SELECT qid, id, dist,
         |  row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rn FROM ex)
         |SELECT qid, rn, id, dist FROM rr WHERE rn <= $K""".stripMargin,

    "ann_opq_ivf" ->
      s"""WITH $routedOpqCte
         |SELECT qid, rn, id, dist FROM r WHERE rn <= $K""".stripMargin,

    "ann_opq_rerank" ->
      s"""WITH $opqAdcCte,
         |short AS (SELECT qid, id FROM r WHERE rn <= $Shortlist),
         |ex AS (SELECT s.qid, s.id,
         |  ${VectorQueries.l2Sql("q2.embedding", "b.embedding")} AS dist
         |  FROM short s JOIN embeddings q2 ON q2.vec_id = s.qid
         |  JOIN embeddings b ON b.vec_id = s.id),
         |rr AS (SELECT qid, id, dist,
         |  row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rn FROM ex)
         |SELECT qid, rn, id, dist FROM rr WHERE rn <= $K""".stripMargin)
}
