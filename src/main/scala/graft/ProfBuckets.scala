package graft

import org.apache.spark.sql.functions._

/** Dev probe: the band-bucket size distribution dedup_embedding's
  * candidate join will see on a given corpus — top bucket sizes and
  * the total pair mass Σ s·(s−1)/2 per tier. The 10M runs showed the
  * pair mass is the life-or-death number (a layout whose buckets grow
  * with n goes quadratic); this prints it without running the join.
  *
  * Usage: runMain graft.ProfBuckets <dataDir> [mid|wide]
  */
object ProfBuckets {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val tier = if (args.length > 1) args(1) else "wide"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Tables.session("graft-profbuckets", cpus)
    import graft.operators.{Lsh, Moments}
    val bc = org.apache.spark.sql.graftbridge.Bridge
    val e = Tables.t(spark, dir, "embeddings")
    // dim-aware like DedupQs.embeddingPairs — a 200d corpus must be
    // probed with the same full-width bank the dedup join will use,
    // not a 64-component prefix (r10 ADVICE)
    val dim = Tables.embDim(spark, dir)
    val m = e.agg(Moments.moments(dim)(col("embedding")).as("m"))
      .select(col("m.sums").as("sums"), col("m.n").as("cnt")).head()
    val sums = m.getSeq[Long](0)
    val cnt = m.getLong(1)
    val meanArr = array((0 until dim).map(d =>
      lit((sums(d).toDouble / cnt) / 1000000.0)): _*)
    val centered = e.select(col("vec_id"),
      zip_with(col("embedding").cast("array<double>"), meanArr, (x, mm) => x - mm).as("cv"))
    val bands = tier match {
      case "wide" =>
        // mirrors the residual wide tier in DedupQs.embeddingPairs
        val (cents, assigned) = graft.queries.CurationQs.allIvf(spark, dir)
        val nib = Lsh.PairWideNibbles
        val horner = (b0: Int) =>
          (1 until nib).foldLeft(s"CAST(ks[${b0 * nib}] AS BIGINT)") {
            (acc, k) => s"($acc) * 16 + ks[${b0 * nib + k}]"
          }
        val hornerArr = (0 until Lsh.PairWideBands)
          .map(b0 => s"CAST(cid AS BIGINT) * 17592186044416 + (${horner(b0)})")
          .mkString("array(", ", ", ")")
        assigned
          .select(col("vec_id"), col("embedding"), col("cid").cast("long").as("cid"))
          .join(broadcast(cents.select(col("cid").cast("long").as("cid"), col("cv"))),
            Seq("cid"))
          .select(col("vec_id"), col("cid"),
            zip_with(col("embedding").cast("array<double>"), col("cv"),
              (x, c) => x - c).as("rv"))
          .select(col("vec_id"), col("cid"),
            bc.column(graft.functions.LshBandKeys(bc.expr(col("rv")),
              Lsh.PairWidePlanes, dim = dim)).as("ks"))
          .select(col("vec_id"), expr(hornerArr).as("bks"))
          .select(col("vec_id"), posexplode(col("bks")).as(Seq("band_idx", "bkey")))
      case _ =>
        centered.select(col("vec_id"),
          bc.column(graft.functions.LshBandKeys(bc.expr(col("cv")), dim = dim)).as("ks"))
          .select(col("vec_id"),
            explode(expr(
              s"transform(sequence(0, ${Lsh.PairScaleBands - 1}), b -> named_struct(" +
                "'band_idx', b, " +
                "'bkey', CAST(ks[b*8] AS BIGINT)*268435456 + ks[b*8+1]*16777216 + " +
                "ks[b*8+2]*1048576 + ks[b*8+3]*65536 + ks[b*8+4]*4096 + " +
                "ks[b*8+5]*256 + ks[b*8+6]*16 + ks[b*8+7]))")).as("w"))
          .select(col("vec_id"), col("w.band_idx").as("band_idx"), col("w.bkey").as("bkey"))
    }
    val sizes = bands.groupBy(col("band_idx"), col("bkey"))
      .agg(count(lit(1)).as("s")).cache()
    val stats = sizes.agg(
      count(lit(1)).as("n_buckets"),
      sum(col("s")).as("rows"),
      max(col("s")).as("max_bucket"),
      sum((col("s") * (col("s") - 1) / 2).cast("double")).as("pair_mass"),
      sum(when(col("s") > 20000, col("s")).otherwise(0L)).as("rows_over_cap")).head()
    println(s"PROFBUCKETS tier=$tier buckets=${stats.getLong(0)} rows=${stats.getLong(1)} " +
      s"max=${stats.getLong(2)} pair_mass=${stats.getDouble(3)} over_cap_rows=${stats.getLong(4)}")
    sizes.orderBy(col("s").desc).limit(20).collect()
      .foreach(r => println(s"PROFBUCKETS_TOP band=${r.getInt(0)} key=${r.getLong(1)} s=${r.getLong(2)}"))
    spark.stop()
  }
}
