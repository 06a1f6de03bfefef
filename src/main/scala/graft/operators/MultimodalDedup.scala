package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal dedup over image+caption PAIRS — the north_rule's payload.
  *
  * A crawled (image, caption) corpus duplicates along two independent
  * axes: the same image is re-posted under edited captions, and the same
  * caption text is re-used over re-encoded images. Deduplicating either
  * modality alone under-merges; the right unit is the connected component
  * of the UNION of both edge families:
  *
  *   - caption edges: exact n-gram-Jaccard near-dup pairs (the t05
  *     inverted-index kernel — id-only shuffles, df-capped);
  *   - image edges: exact content-hash groups, emitted as STAR edges
  *     (every member -> its group's min id) rather than all pairs — a
  *     group of k copies contributes k-1 edges, not k(k-2)/2, so a viral
  *     image re-posted a million times costs one window pass, not 10^12
  *     join rows. Star edges produce the same components as the clique.
  *
  * The union feeds [[DedupResolve.connectedComponents]]; survivor = the
  * component's min pair id (deterministic at any parallelism).
  *
  * Scale notes (100 TB): both edge families are ids-only on the wire —
  * the caption side ships (doc_id, shingle-hash) pairs, the image side
  * one (id, 16-byte hash) shuffle for the per-group min. Bytes and
  * caption text never leave the scan. The CC label table is dup-rate-
  * sized. Near-dup IMAGE edges (phash hamming) drop in by unioning
  * [[ImageOps.nearDupPhash]]'s pairs — same resolution path (c17/c20);
  * this operator keeps the exact-hash family so the whole chain is
  * DuckDB-expressible and sits in the hard oracle gate (t11).
  */
object MultimodalDedup {

  /** Image-group modulus for the synthetic pairs view: prime, sized so
    * groups average ~2-3 members at the 500-doc test SFs (sharing exists)
    * and ~25 at sf0.1 (components stay far from one giant blob).
    */
  val ImgGroups = 211L

  /** The pairs view over the planted text corpus: pair i carries a
    * deterministic image identity `(doc_id % 1000000) % ImgGroups`, so a
    * planted caption revision (base + 1000000) keeps its base row's image
    * — a re-post of the same image with an edited caption — while
    * unrelated captions can also share an image. `img_hash` is the md5 of
    * the group key, standing in for an exact content hash.
    */
  def pairsCorpus(spark: SparkSession, dir: String): DataFrame =
    TextOps.plantedCorpus(spark, dir)
      .withColumn("img_hash",
        md5(((col("doc_id") % 1000000L) % ImgGroups).cast("string")))

  /** Exact-duplicate STAR edges for any (id, hash) frame: every row joins
    * its hash-group's min id. One shuffle on the hash; ids-only payload;
    * linear in group size.
    */
  def exactHashEdges(rows: DataFrame, idCol: String, hashCol: String): DataFrame = {
    val w = Window.partitionBy(hashCol)
    rows
      .select(col(idCol).cast("long").as("doc_b"), col(hashCol))
      .withColumn("doc_a", min(col("doc_b")).over(w))
      .where(col("doc_a") =!= col("doc_b"))
      .select("doc_a", "doc_b")
  }

  /** t11 — resolve the union of caption near-dup edges and exact-image
    * star edges into components + survivor flags over the pairs view.
    * Output: (pair_id, component, is_survivor) for every pair in at
    * least one edge, either modality.
    */
  def multimodalResolve(spark: SparkSession, dir: String): DataFrame = {
    val pairs = pairsCorpus(spark, dir)
    val captionEdges = TextOps.ngramJaccardPairs(pairs.select("doc_id", "text"))
      .select(col("doc_a").cast("long").as("doc_a"),
        col("doc_b").cast("long").as("doc_b"))
    val imageEdges = exactHashEdges(pairs, "doc_id", "img_hash")
    DedupResolve.resolve(captionEdges.unionByName(imageEdges), "doc_a", "doc_b")
      .select(col("doc_id").as("pair_id"), col("component"), col("is_survivor"))
      .orderBy("pair_id")
  }
}
