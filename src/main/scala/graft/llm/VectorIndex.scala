package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorFns._

/** Public vector-index surface: product quantization (encode + ADC
  * scoring) and IVF cell routing as plain DataFrame transforms — the
  * user-facing API behind the registry's `embedding_pq` / `sim_ann_adc` /
  * `sim_ann_ivf_pq` queries, exposed so a pipeline can build, persist, and
  * serve a compressed ANN index without going through the query registry.
  *
  * Column contract: every input frame carries `vec_id: BIGINT` and
  * `v: ARRAY<BIGINT>` — a fixed-point quantized embedding
  * ([[graft.functions.VectorFns.quantize]]). All distances are EXACT
  * integer arithmetic, so encode/score results are bit-identical across
  * partitionings and engines (the same determinism contract the oracle
  * gate enforces on the registry queries).
  *
  * Scale shape: codebooks and centroid sets are bounded driver state (the
  * "load the index" step — K×M subvectors / K full vectors), shipped into
  * plans as broadcast literals; [[encode]], [[adcScore]] and
  * [[assignCells]] are pure projections (zero exchanges), so they run
  * identically over batch frames and streaming micro-batches
  * (`VectorIndexStreamingSpec` pins that parity).
  */
object VectorIndex {

  /** PQ geometry: `subspaces` × `subDim` must cover the embedding dim;
    * `codewords` per subspace. Defaults match the registry (8×8×16 over
    * 64-dim embeddings: 64 floats → 8 small ints, 32× vs float32).
    */
  final case class PqConfig(subspaces: Int = 8, subDim: Int = 8, codewords: Int = 16)

  /** Per-subspace codebook: for each m, (code, subvector) rows. Codes are
    * the source row's vec_id — value-keyed, never positional, so sparse
    * ids stay correct.
    */
  type Codebook = IndexedSeq[Seq[(Long, Array[Long])]]

  /** Cold-start codebook: subvectors of the rows with
    * `vec_id < codewords`. At 100 TB the codebook is trained offline and
    * reloaded; this collect IS that bounded load (K rows).
    */
  def codebook(index: DataFrame, cfg: PqConfig = PqConfig()): Codebook = {
    val rows = index.filter(col("vec_id") < cfg.codewords)
      .select(col("vec_id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1).toSeq
    (0 until cfg.subspaces).map(m =>
      rows.map { case (k, v) =>
        (k, v.slice(m * cfg.subDim, m * cfg.subDim + cfg.subDim))
      })
  }

  /** Argmin-distance (d, k) struct for subspace m: array_min over the
    * broadcast-literal codebook — lexicographic struct ordering = smallest
    * exact integer L2², ties to the smaller code. A pure map, no shuffle.
    */
  private def assign(cb: Codebook, cfg: PqConfig, m: Int): Column = {
    val lits = array(cb(m).map { case (k, cv) =>
      struct(array(cv.map(lit(_)): _*).as("cv"), lit(k).as("k"))
    }: _*)
    array_min(transform(lits, c => struct(
      qdist2(slice(col("v"), m * cfg.subDim + 1, cfg.subDim), c.getField("cv")).as("d"),
      c.getField("k").as("k"))))
  }

  /** Append `codes: ARRAY<INT>` (one codeword id per subspace) and
    * `err: BIGINT` (exact integer reconstruction error Σ_m L2²) to `df`.
    * Pure projection — streaming-safe.
    */
  def encode(df: DataFrame, cb: Codebook, cfg: PqConfig = PqConfig()): DataFrame = {
    val asn = (0 until cfg.subspaces).map(m => assign(cb, cfg, m))
    df.withColumn("codes", array(asn.map(_.getField("k").cast(IntegerType)): _*))
      .withColumn("err", asn.map(_.getField("d")).reduce(_ + _).cast(LongType))
  }

  /** Driver-side exact integer L2² (LUT construction). */
  private[llm] def qdist2Arr(x: Array[Long], y: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < x.length) { val dd = x(i) - y(i); s += dd * dd; i += 1 }
    s
  }

  /** ADC distance for a `codes` column against a full-precision quantized
    * query: Σ_m LUT_m[code_m], the (codewords × subspaces)-entry
    * query-vs-codeword table as broadcast map literals keyed by code
    * VALUE. The scoring scan reads codes only — never the embedding.
    */
  def adcScore(cb: Codebook, query: Array[Long], cfg: PqConfig = PqConfig()): Column = {
    val luts = (0 until cfg.subspaces).map { m =>
      val qsub = query.slice(m * cfg.subDim, m * cfg.subDim + cfg.subDim)
      map_from_arrays(
        array(cb(m).map { case (k, _) => lit(k.toInt) }: _*),
        array(cb(m).map { case (_, cv) => lit(qdist2Arr(qsub, cv)) }: _*))
    }
    (0 until cfg.subspaces)
      .map(m => element_at(luts(m), col("codes").getItem(m))).reduce(_ + _)
  }

  /** IVF coarse-quantizer state: the full vectors with `vec_id < k`
    * (cold-start centroids — one bounded collect, the same "load the
    * index" shape as [[codebook]]).
    */
  def centroids(index: DataFrame, k: Int = 16): Seq[(Long, Array[Long])] =
    index.filter(col("vec_id") < k).select(col("vec_id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1).toSeq

  /** Driver-side cosine under the engine-fixed op order (matches the
    * oracle SQL's `dot / (sqrt·sqrt)`).
    */
  private[llm] def qcosArrPub(x: Array[Long], y: Array[Long]): Double = {
    var dot = 0L; var nx = 0L; var ny = 0L; var i = 0
    while (i < x.length) {
      dot += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1
    }
    dot.toDouble / (math.sqrt(nx.toDouble) * math.sqrt(ny.toDouble))
  }

  /** Append `cell: BIGINT` — argmax-cosine assignment against broadcast
    * literal centroids, ties to the smaller centroid id. Pure map.
    */
  def assignCells(df: DataFrame, cents: Seq[(Long, Array[Long])]): DataFrame = {
    // centroid norms are constants → literals; the row's own norm is
    // computed ONCE (reusing an existing `n2` column when the caller has
    // one) instead of once per centroid — 16 redundant 64-element
    // aggregates per row otherwise
    val centLit = array(cents.map { case (cid, cv) =>
      struct(lit(cid).as("cid"), array(cv.map(lit(_)): _*).as("cv"),
        lit(cv.map(x => x * x).sum).as("cn2"))
    }: _*)
    val hasN2 = df.columns.contains("n2")
    val base = if (hasN2) df else df.withColumn("n2", qnorm2(col("v")))
    val out = base.withColumn("cell",
      -array_max(transform(centLit, c => struct(
        (qdot(col("v"), c.getField("cv")).cast(DoubleType) /
          (sqrt(col("n2").cast(DoubleType)) *
            sqrt(c.getField("cn2").cast(DoubleType)))).as("cos"),
        (-c.getField("cid")).as("ncid")))).getField("ncid"))
    if (hasN2) out else out.drop("n2")
  }

  /** The `nprobe` centroid ids nearest the query by cosine (ties to the
    * smaller id) — the probe set an IVF search scans.
    */
  def probeCells(cents: Seq[(Long, Array[Long])], query: Array[Long],
      nprobe: Int): Seq[Long] =
    cents.map { case (cid, cv) => (cid, qcosArrPub(query, cv)) }
      .sortBy { case (cid, cos) => (-cos, cid) }.take(nprobe).map(_._1)
}
