package graft.operators

import graft.functions.ImageKit
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

  /** Deterministic Rademacher hyperplane component for (plane, dim). */
  def hyperplaneSign(plane: Int, d: Int): Double =
    if ((ImageKit.mix64(plane.toLong << 32 | (d.toLong & 0xffffffffL)) & 1L) == 0L) 1.0 else -1.0

  def lshBucketLocal(vec: Seq[Float], nBits: Int): Int = {
    var bucket = 0
    var p = 0
    while (p < nBits) {
      var dot = 0.0
      var d = 0
      while (d < vec.length) { dot += vec(d) * hyperplaneSign(p, d); d += 1 }
      if (dot >= 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  /** LSH-bucketed ANN: sign-of-random-hyperplane bucket per vector, then
    * exact cosine only within the query's bucket. At corpus scale the
    * bucket column is a partition/cluster key and a probe touches
    * 1/2^nBits of the data; candidates here are verified exactly so
    * results are true cosine scores (approximation affects recall only).
    */
  def annLshTopK(spark: SparkSession, dir: String,
                 nQueries: Int = 3, k: Int = 5, nBits: Int = 6): DataFrame = {
    val bucketUdf = udf((v: Seq[Float]) => lshBucketLocal(v, nBits))
    val e = emb(spark, dir).withColumn("bucket", bucketUdf(col("embedding")))
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
