package graft

/** Registry of every implemented operator (SURVEY.md §2). Families add
  * themselves here; SparkEntry derives queries/oracleSql from this. */
object Catalog {
  val all: Seq[Q] =
    queries.Relational.qs ++ queries.Relational2.qs ++ queries.Relational3.qs ++
      queries.VectorQs.qs ++
      queries.VectorQs2.qs ++ queries.VectorQs3.qs ++ queries.VectorQs4.qs ++
      queries.HnswQs.qs ++ queries.HnswQs2.qs ++ queries.HnswQs3.qs ++
      queries.IncrementalQs.qs ++
      queries.TextQs.qs ++ queries.TextQs2.qs ++ queries.DedupQs.qs ++
      queries.DedupQs2.qs ++ queries.CurationQs.qs ++ queries.MultimodalQs.qs

  def queriesMap: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleMap: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
