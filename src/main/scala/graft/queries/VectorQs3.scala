package graft.queries

import graft.functions.Vec
import graft.operators.{BeamSearch, Ivf}
import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Family A continued: IVF build/search and batch graph beam search.
  * Iterative operators — rows-only oracles (invariants spec-tested:
  * IvfSpec/BeamSpec check recall against the exact groundtruth). */
object VectorQs3 {

  private val K = 16
  private val Iters = 3

  /** k-means centroids + inverted-list sizes. */
  val ivfBuild = Q(
    "ivf_build",
    (s, dir) => {
      val emb = Tables.t(s, dir, "embeddings")
      val cents = Ivf.centroids(emb, K, Iters)
      val assigned = Ivf.assign(emb, cents)
      assigned.groupBy(col("cid")).agg(count(lit(1)).as("n_vecs"))
        .join(cents, Seq("cid"))
        .select(col("cid"), col("n_vecs"),
          sqrt(Vec.norm2(col("cv"))).as("centroid_norm"))
        .orderBy(col("cid"))
    },
    None)

  /** The persisted base-side IVF quantizer every search query loads
    * (build-once k-means; search must time search, not a rebuild). */
  def baseIvf(s: org.apache.spark.sql.SparkSession, dir: String) =
    graft.operators.ProjIndex.ensureIvf(s, dir, "base", K, Iters) {
      val b = Tables.t(s, dir, "embeddings").filter(col("vec_id") % 50 =!= 0)
      val c = Ivf.centroids(b, K, Iters)
      (c, Ivf.assign(b, c))
    }

  /** nprobe=4 routed search, exact rerank within probed cells — over
    * the PERSISTED IVF index (IndexStore.loadIvf). */
  val ivfSearch = Q(
    "ivf_search",
    (s, dir) => {
      val (cents, base) = baseIvf(s, dir)
      val queries = Tables.t(s, dir, "embeddings").filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      Ivf.search(base, cents, queries, nprobe = 4, k = 10)
        .orderBy(col("qid"), col("rnk"))
    },
    None)

  /** Beam search over the PERSISTED projection graph from the global
    * entry point (reference search loop, roargraph_python.py:325-420).
    * The graph is built once via ProjIndex/IndexStore and loaded here,
    * so this query times search — not an index rebuild. */
  val graphBeamSearch = Q(
    "graph_beam_search",
    (s, dir) => {
      val edges = graft.operators.ProjIndex.ensureGraph(s, dir) {
          VectorQs2.roarProjectionGraph.fn(s, dir)
        }
        .select(col("src"), col("dst")).cache()
      val emb = Tables.t(s, dir, "embeddings")
      val base = emb.filter(col("vec_id") % 50 =!= 0)
        .select(col("vec_id").as("bid"), col("embedding").as("bv"))
      val queries = emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      // entry point: max-degree node (calculate_projection_ep,
      // roargraph_python.py:164-175) — the hub seed more than doubles
      // beam recall vs an arbitrary node at equal rounds
      val entry = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
        .orderBy(col("d").desc, col("src")).head().getLong(0)
      BeamSearch.run(edges, queries, base, entry, ef = 10, rounds = 3)
        .orderBy(col("qid"), col("rnk"))
    },
    None)

  // ---- Product quantization (operators.Pq) ----

  private val PqM = 8
  private val PqKsub = 16
  private val PqIters = 2

  /** Persisted PQ index over the base side: 8 subspace codebooks of 16
    * centroids (64 floats → 8 codes/vector). */
  def pqIndex(s: org.apache.spark.sql.SparkSession, dir: String) =
    graft.operators.ProjIndex.ensurePq(s, dir, PqM, PqKsub, PqIters) {
      val b = Tables.t(s, dir, "embeddings").filter(col("vec_id") % 50 =!= 0)
        .select(col("vec_id"), col("embedding"))
      val cents = graft.operators.Pq.train(b, PqM, PqKsub, PqIters)
      val codes = graft.operators.Pq.encode(b, cents, PqM)
      (cents, codes)
    }

  /** PQ codebook + code-assignment stats: one row per (subspace,
    * centroid) with its population and centroid norm — the build
    * artifact summary. Rows-only (iterative k-means upstream). */
  val pqBuild = Q(
    "pq_build",
    (s, dir) => {
      val (cents, codes) = pqIndex(s, dir)
      val counts = codes
        .select(posexplode(col("codes")).as(Seq("sub", "cid")))
        .groupBy(col("sub"), col("cid")).agg(count(lit(1)).as("n_vecs"))
      cents.select(col("sub"), col("cid"),
          sqrt(Vec.norm2(col("cv"))).as("centroid_norm"))
        .join(counts, Seq("sub", "cid"), "left")
        .select(col("sub"), col("cid"),
          coalesce(col("n_vecs"), lit(0L)).as("n_vecs"), col("centroid_norm"))
        .orderBy(col("sub"), col("cid"))
    },
    None)

  /** ADC candidate search over the 8-byte codes (top-50) + exact L2
    * rerank to top-10 — the compressed-domain scan never touches the
    * float table; only the 50 candidates per query do. Rows-only
    * (PqSpec asserts recall vs the exact groundtruth). */
  val pqSearch = Q(
    "pq_search",
    (s, dir) => {
      val (cents, codes) = pqIndex(s, dir)
      val emb = Tables.t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val adc = graft.operators.Pq.searchAdc(codes, cents, queries, PqM, PqKsub, k = 50)
      val rer = adc
        .join(emb.filter(col("vec_id") % 50 =!= 0)
          .select(col("vec_id").as("bid"), col("embedding").as("bv")), Seq("bid"))
        .join(queries, Seq("qid"))
        .select(col("qid"), col("bid"), Vec.l2Fast(col("qv"), col("bv")).as("dist"))
      graft.operators.TopK.perGroup(rer, "qid", "bid", "dist", 10, asc = true)
        .orderBy(col("qid"), col("rnk"))
    },
    None)

  val qs: Seq[Q] = Seq(ivfBuild, ivfSearch, graphBeamSearch, pqBuild, pqSearch)
}
