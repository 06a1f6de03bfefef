package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Embedding similarity search over the `embeddings` table (builder brief:
  * ANN as a first-class engine component). Brute-force cosine is the
  * correctness baseline; hyperplane-LSH bucketing is the scale path (probe
  * only the query's bucket instead of the full corpus).
  */
object SimilarityOps {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** dot(a,b) as a pure Catalyst column (zip_with + aggregate — codegen-free
    * HOFs but columnar, no UDF ser/de).
    */
  def dotCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def normCol(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  def cosineCol(a: Column, b: Column): Column =
    dotCol(a, b) / (normCol(a) * normCol(b))

  /** Brute-force cosine top-k for query vectors vec_id < nQueries: the
    * (tiny) query set broadcasts against a full corpus scan — one pass,
    * no index. Rank ties break on vec_id (determinism).
    */
  def bruteCosineTopK(spark: SparkSession, dir: String,
                      nQueries: Int = 3, k: Int = 5): DataFrame = {
    val e = emb(spark, dir)
    val queries = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val scored = e.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosineCol(col("embedding"), col("qvec")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), round(col("cos"), 4).as("cos"), col("rank"))
  }

  /** Local mirror for tests — same kernel (VecKit) as the codegen'd
    * LshBucket expression, the UrlKit/CrawlOracle parity pattern.
    */
  def lshBucketLocal(vec: Seq[Float], nBits: Int): Int =
    graft.functions.VecKit.lshBucket(vec.toArray, nBits)

  /** Embedding-cosine NEAR-DUP detection (the embedding-space flavor of
    * the dedup family): LSH bucket is the blocking key — the self-join
    * carries (bucket, id, vector) and only compares within a bucket, i.e.
    * 1/2^nBits of all pairs — then exact cosine verifies candidates. A
    * deterministic 5% of vectors is planted as slightly-perturbed copies
    * so the operator provably fires on the test corpus (same pattern as
    * the text near-dup plants).
    */
  def nearDupCosine(spark: SparkSession, dir: String,
                    threshold: Double = 0.99, nBits: Int = 6): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val base = emb(spark, dir).select("vec_id", "embedding")
    val planted = base.where(pmod(col("vec_id"), lit(20)) === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i === 0, (x.cast("double") + lit(0.05)).cast("float")).otherwise(x))
          .as("embedding"))
    val corpus = base.unionByName(planted)
    val bucketed = corpus.withColumn("bucket",
      graft.functions.GraftFunctions.lshBucket(spark, nBits, col("embedding")))
    bucketed.as("a").join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(cosineCol(col("a.embedding"), col("b.embedding")), 4).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** LSH-bucketed ANN: sign-of-random-hyperplane bucket per vector, then
    * exact cosine only within the query's bucket. At corpus scale the
    * bucket column is a partition/cluster key and a probe touches
    * 1/2^nBits of the data; candidates here are verified exactly so
    * results are true cosine scores (approximation affects recall only).
    */
  def annLshTopK(spark: SparkSession, dir: String,
                 nQueries: Int = 3, k: Int = 5, nBits: Int = 6): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val e = emb(spark, dir).withColumn("bucket",
      graft.functions.GraftFunctions.lshBucket(spark, nBits, col("embedding")))
    val queries = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("bucket").as("qbucket"))
    val scored = e.join(broadcast(queries),
        col("bucket") === col("qbucket") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosineCol(col("embedding"), col("qvec")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), round(col("cos"), 4).as("cos"), col("rank"))
  }
}
