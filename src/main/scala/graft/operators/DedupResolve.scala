package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dedup cluster resolution — the step AFTER pair generation that every
  * training-data dedup pipeline actually runs (pairs -> groups -> keep-list
  * -> filtered corpus). Every near-dup operator in this engine (t03 MinHash,
  * t04 SimHash, t05 n-gram Jaccard, t06 repeated spans, emb03 cosine, c15
  * cross-modal) emits a PAIR table; this operator resolves those pairs into
  * connected components, picks a deterministic survivor per component
  * (min doc_id), and filters the corpus.
  *
  * Algorithm: alternating min-label propagation with pointer jumping
  * (path halving), the Spark-native fixpoint form of union-find:
  *   round = (1) neighbor-min: comp(x) <- min(comp(x), min over N(x) of
  *               comp(n)) — one join + hash agg on the symmetrized edges;
  *           (2) pointer jump: comp(x) <- comp(comp(x)) — one self-join of
  *               the label table.
  * Neighbor-min alone converges in O(diameter) rounds; the pointer jump
  * halves label-chain depth each round, giving O(log diameter) — the same
  * asymptotics as large-star/small-star [Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC'14] with a simpler shuffle
  * profile (labels table is one row per distinct paired doc, always a
  * small fraction of the corpus; edges shuffle once per round on an
  * 8-byte key).
  *
  * Scale notes (100 TB): the iteration state is the LABEL table (distinct
  * doc ids that appear in at least one pair — for a 1%-dup corpus, ~2% of
  * docs), localCheckpoint'ed each round to cut lineage (without it round k
  * replays rounds 1..k-1 and the plan grows exponentially). The driver
  * only ever sees per-round change COUNTS (one long per round), never
  * rows. Determinism: min() everywhere — no first()/arbitrary picks — so
  * components and survivors are identical at any parallelism.
  */
object DedupResolve {

  /** Connected components over an undirected pair table.
    *
    * @param pairs DataFrame with two long-castable id columns
    * @return (id, component) for every id appearing in `pairs`;
    *         component = min id of the connected component (the survivor)
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 64): DataFrame = {
    val edges = pairs
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
    // symmetrize once; this table is re-joined every round, so persist the
    // (small, id-pair-only) edge list instead of recomputing the upstream
    // near-dup plan each round
    val sym = edges
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // (1) neighbor-min: min component label over the neighborhood
      val neighborMin = sym
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min("comp").as("ncomp"))
      val stepped = labels
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
      // (2) pointer jump: comp(x) <- comp(comp(x)) (labels are node ids, so
      // the parent's label is in the same table; root labels map to
      // themselves). Halves chain depth -> O(log diameter) rounds total.
      val parents = stepped
        .select(col("id").as("p_id"), col("comp").as("p_comp"))
      val jumped = stepped
        .join(parents, col("comp") === col("p_id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("p_comp"), col("comp"))).as("comp"))
      val next = jumped.localCheckpoint()
      changed = next.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .where(col("n.comp") =!= col("o.comp"))
        .count()
      labels = next
      iter += 1
    }
    require(changed == 0L, s"connectedComponents did not converge in $maxIter rounds")
    labels
  }

  /** Pairs -> components with the survivor decision made explicit:
    * (doc_id, component, is_survivor). Survivor = the component's min id;
    * by construction `component` IS that min, so survivorship is
    * doc_id == component.
    */
  def resolve(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    connectedComponents(pairs, aCol, bCol)
      .select(col("id").as("doc_id"), col("comp").as("component"),
        (col("id") === col("comp")).as("is_survivor"))

  /** Corpus filter: keep every doc that is either in no near-dup pair or
    * is its component's survivor (min doc_id). The drop-list (non-survivor
    * members) is a small fraction of the corpus, so the anti-join
    * broadcasts at typical dup rates; at pathological dup rates it
    * degrades gracefully to a shuffled anti-join on the 8-byte id.
    */
  def filterCorpus(
      corpus: DataFrame,
      idCol: String,
      pairs: DataFrame,
      aCol: String,
      bCol: String): DataFrame = {
    val drops = resolve(pairs, aCol, bCol)
      .where(!col("is_survivor"))
      .select(col("doc_id").cast("long").as("__drop_id"))
    corpus.join(drops, corpus(idCol).cast("long") === col("__drop_id"), "left_anti")
  }

  /** t07 — components of the t05 n-gram near-dup pair graph (the planted
    * corpus collapses its base/revision pairs to known groups).
    */
  def resolveNgramDups(spark: SparkSession, dir: String): DataFrame =
    resolve(TextOps.nearDupNgramJaccard(spark, dir), "doc_a", "doc_b")
      .orderBy("doc_id")

  /** t08 — the deduplicated corpus: t05's planted corpus (base docs +
    * planted revisions) minus non-survivor near-dup members. Returns only
    * ids + kept-doc count-stable columns so the oracle compare is exact.
    */
  def dedupedCorpus(spark: SparkSession, dir: String): DataFrame = {
    val corpus = TextOps.plantedCorpus(spark, dir)
    filterCorpus(corpus, "doc_id", TextOps.nearDupNgramJaccard(spark, dir),
      "doc_a", "doc_b")
      .select(col("doc_id").cast("long").as("doc_id"))
      .orderBy("doc_id")
  }
}
