package graft

import graft.operators.{IndexStore, Ivf}
import graft.queries.VectorQs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class IndexStoreSpec extends AnyFunSuite with SharedSpark {

  test("graph save/load roundtrip preserves edges") {
    val dir = Files.createTempDirectory("graphidx").toString
    val g = VectorQs.knnGraph(spark, sf)
    IndexStore.saveGraph(g, s"$dir/knn")
    val back = IndexStore.loadGraph(spark, s"$dir/knn")
    assert(back.count() == g.count())
    assert(back.join(g, Seq("src", "rnk", "dst")).count() == g.count())
  }

  test("persisted IVF index answers searches (with cid partition pruning)") {
    val dir = Files.createTempDirectory("ivfidx").toString
    val emb = Tables.t(spark, sf, "embeddings")
    val cents = Ivf.centroids(emb, 8, 2)
    val assigned = Ivf.assign(emb, cents)
    IndexStore.saveIvf(cents, assigned, s"$dir/ivf")
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val res = IndexStore.searchPersisted(spark, s"$dir/ivf", queries, nprobe = 2, k = 5)
    assert(res.count() > 0)
    assert(res.groupBy("qid").count().agg(max("count")).head().getLong(0) <= 5)
  }
}
