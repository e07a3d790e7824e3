package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`array<float>`), per the training-data-pipeline surface:
  * brute-force cosine top-k as the correctness baseline, and a
  * hyperplane-LSH-bucketed variant as the scale path.
  *
  * Scale design: the query set is broadcast (it is small by construction);
  * brute force is one scan of the corpus with a per-query top-k window —
  * O(corpus × queries) but embarrassingly parallel and shuffle-light
  * (only the final top-k per query moves). The LSH variant prunes the scan
  * to matching sign-buckets first, trading recall for a corpus-fraction
  * read; bucket assignment is a map-only pass and the probe join is a
  * standard equi-join on the bucket key.
  */
object Similarity {

  /** Dot product of two equal-length float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 for zero vectors (guarded division). */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Sign-bit bucket of `v` under `planes` fixed hyperplanes, packed into a
    * long. Hyperplane components are deterministic pseudo-random values
    * xxhash64(plane, dim) → [-1, 1) — no RNG state, identical on every
    * executor, which is the property LSH needs. Vectors with high cosine
    * land in the same bucket w.h.p.
    */
  def hyperplaneBucket(v: Column, planes: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(planes - 1)), p => {
        val proj = aggregate(
          zip_with(v, sequence(lit(0), size(v) - 1),
            (x, i) => x * (xxhash64(p, i).cast("double") / lit(Long.MaxValue.toDouble))),
          lit(0.0d), (acc, x) => acc + x)
        when(proj >= 0, call_function("shiftleft", lit(1L), p)).otherwise(lit(0L))
      }),
      lit(0L), (acc, bit) => acc.bitwiseOR(bit))

  /** Brute-force cosine top-k: for each row of `queries` (id + vector),
    * the `k` nearest corpus rows. `queries` must be small — it is broadcast.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String, k: Int): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
      .filter(col(queryId) =!= col(corpusId))
      .withColumn("cos", cosine(col(corpusVec), col(queryVec)))
    val w = Window.partitionBy(queryId).orderBy(col("cos").desc, col(corpusId))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId).as("query_id"), col(corpusId).as("neighbor_id"),
        round(col("cos"), 4).as("cos"), col("rank"))
  }

  /** LSH-bucketed top-k: corpus pre-bucketed by hyperplane signs; each
    * query probes its own bucket plus all single-bit-flip buckets
    * (multiprobe), then ranks within the candidates. Approximate: recall
    * depends on `planes` and probe count; the correctness baseline is
    * [[bruteForceTopK]].
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String, k: Int, planes: Int = 8): DataFrame = {
    val bucketed = corpus.withColumn("bucket", hyperplaneBucket(col(corpusVec), planes))
    val qb = queries.withColumn("qbucket", hyperplaneBucket(col(queryVec), planes))
      .withColumn("probe", explode(concat(array(col("qbucket")),
        transform(sequence(lit(0), lit(planes - 1)),
          i => col("qbucket").bitwiseXOR(call_function("shiftleft", lit(1L), i))))))
    val candidates = bucketed.join(broadcast(qb), col("bucket") === col("probe"))
      .filter(col(queryId) =!= col(corpusId))
      .dropDuplicates(queryId, corpusId)
      .withColumn("cos", cosine(col(corpusVec), col(queryVec)))
    val w = Window.partitionBy(queryId).orderBy(col("cos").desc, col(corpusId))
    candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId).as("query_id"), col(corpusId).as("neighbor_id"),
        round(col("cos"), 4).as("cos"), col("rank"))
  }
}
