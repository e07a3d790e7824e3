package graft.operators
import org.apache.spark.sql.functions._
import graft.SparkSpec
class ScratchProbeSpec extends SparkSpec {
  test("probe") {
    import graft.functions.TextVectorExpressions.hashed_tf_vec
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001").select(col("doc_id"), col("text"))
    val corpus = docs.select(col("doc_id").as("c_id"), hashed_tf_vec(col("text"), 64).as("c_vec"))
    val q = graft.queries.ExtensionQueries.plantTextDups(docs).filter(col("doc_id") >= 1000000L)
      .select(col("doc_id").as("q_id"), hashed_tf_vec(col("text"), 64).as("q_vec"))
    Similarity.bruteForceTopK(corpus, q, "c_id", "c_vec", "q_id", "q_vec", 3)
      .orderBy("query_id", "rank").collect()
      .foreach(r => println(s"PROBE ${r.getLong(0)} -> ${r.getLong(1)} cos=${r.getDouble(2)} rank=${r.getInt(3)}"))
  }
}
