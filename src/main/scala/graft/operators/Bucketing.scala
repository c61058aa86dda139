package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffling fact tables into N buckets on
  * the join key makes later equi-joins shuffle-free (both sides read
  * co-located buckets) — the cluster-scale answer to repeated joins on
  * the same key (SURVEY §5 "co-locate joins via bucketing").
  *
  * Uses the session warehouse via saveAsTable (bucket metadata lives in
  * the catalog; plain parquet files carry no bucket spec). */
object Bucketing {

  def saveBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      nBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — with matching
    * bucket counts Spark plans SortMergeJoin with NO Exchange. */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
