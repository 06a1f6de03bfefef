package graft.operators

import graft.SparkTestBase.{spark, tempDir}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** c72 takedown-propagation goldens. The contract under test: a
  * merge-on-read probe over (index + tombstones) must equal a plain probe
  * over an index REBUILT from the filtered corpus — exactly, including the
  * df-cap maintenance term (deleting docs lowers df, which can re-ADMIT a
  * capped shingle and surface pairs the unmaintained filter would hide) —
  * and after copy-on-write compaction the tombstone-UNAWARE probe must
  * already be correct, because the data is physically gone.
  */
class ForgetSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private def docsBase: DataFrame =
    spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")

  /** SimIndexSpec's scripted 3-epoch corpus with planted cross-epoch
    * copies (epoch 1/2 re-crawl epoch-0 docs under shifted ids).
    */
  private def epochDocs(e: Int): DataFrame = e match {
    case 0 => docsBase.where(pmod(col("doc_id"), lit(3)) === 0)
    case 1 => docsBase.where(pmod(col("doc_id"), lit(3)) === 1)
      .unionByName(docsBase.where(pmod(col("doc_id"), lit(30)) === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" appended revision marker tokens")).as("text")))
    case 2 => docsBase.where(pmod(col("doc_id"), lit(3)) === 2)
      .unionByName(docsBase.where(pmod(col("doc_id"), lit(45)) === 0)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          concat(col("text"), lit(" appended revision marker tokens")).as("text")))
  }

  private def collectPairs(df: DataFrame): Set[(Long, Long, Long, Long)] =
    df.select("doc_a", "doc_b", "n_inter", "n_union").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  private def ids(spark: org.apache.spark.sql.SparkSession, xs: Seq[Long]): DataFrame = {
    import spark.implicits._
    xs.toDF("doc_id")
  }

  test("doc takedown: merge-on-read == rebuild-from-filtered-corpus; compaction destroys; post-compaction epochs keep working") {
    val root = tempDir("graft-forget")
    (0 to 2).foreach(e => SimIndex.writeShingleIndex(epochDocs(e), root, e))
    val before = collectPairs(SimIndex.crossEpochNearDups(spark, root, 2))
    // take down every %45==0 original (the epoch-0 side of every planted
    // epoch-2 pair) plus one of the epoch-1 copy ids
    val gone = docsBase.where(pmod(col("doc_id"), lit(45)) === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSeq :+ 2000000L
    ForgetOps.writeDocTombstones(spark, root, epoch = 2, ids(spark, gone))
    val mor = collectPairs(ForgetOps.crossEpochNearDupsForgetting(spark, root, 2))
    // rebuilt reference: a fresh index over the corpus minus the deleted docs
    val root2 = tempDir("graft-forget-ref")
    val goneSet = gone.toSet
    def filteredEpoch(e: Int): DataFrame =
      epochDocs(e).where(!col("doc_id").isin(goneSet.toSeq: _*))
    (0 to 2).foreach(e => SimIndex.writeShingleIndex(filteredEpoch(e), root2, e))
    val rebuilt = collectPairs(SimIndex.crossEpochNearDups(spark, root2, 2))
    assert(mor == rebuilt,
      s"merge-on-read != rebuilt-from-filtered (mor=${mor.size}, rebuilt=${rebuilt.size})")
    assert(mor != before, "takedown changed nothing — fixture broken")
    assert(!mor.exists(p => goneSet.contains(p._1) || goneSet.contains(p._2)),
      "a tombstoned doc survived in the probe output")
    // replayed / overlapping takedown at a later epoch slot must be a
    // no-op (idempotent df accounting — no double subtraction)
    ForgetOps.writeDocTombstones(spark, root, epoch = 3,
      ids(spark, gone.take(3)))
    assert(collectPairs(ForgetOps.crossEpochNearDupsForgetting(spark, root, 2)) == rebuilt,
      "replayed takedown changed the probe — df double-subtracted")
    // copy-on-write: physically rewrite, then the tombstone-UNAWARE probe
    // must already be correct and the tombstone state gone
    ForgetOps.compactForgetDocs(spark, root, 2)
    assert(collectPairs(SimIndex.crossEpochNearDups(spark, root, 2)) == rebuilt,
      "post-compaction plain probe != rebuilt reference")
    assert(!new java.io.File(s"$root/tombstones_doc").exists() &&
      !new java.io.File(s"$root/tombstone_df").exists(),
      "applied tombstones not cleared by compaction")
    assert(spark.read.parquet(s"$root/shingle_index")
      .where(col("doc_id").isin(goneSet.toSeq: _*)).count() == 0,
      "deleted docs physically present after copy-on-write rewrite")
    // life goes on: a post-compaction epoch probes correctly on both roots
    def epoch3(base: DataFrame): DataFrame =
      base.where(pmod(col("doc_id"), lit(50)) === 1)
        .select((col("doc_id") + 4000000L).as("doc_id"),
          concat(col("text"), lit(" appended revision marker tokens")).as("text"))
    SimIndex.writeShingleIndex(epoch3(docsBase), root, 3)
    SimIndex.writeShingleIndex(epoch3(docsBase), root2, 3)
    val inc3 = collectPairs(SimIndex.crossEpochNearDups(spark, root, 3))
    val ref3 = collectPairs(SimIndex.crossEpochNearDups(spark, root2, 3))
    assert(inc3 == ref3 && inc3.nonEmpty,
      s"post-compaction epoch diverged (got=${inc3.size}, ref=${ref3.size})")
  }

  test("df-cap maintenance: forgetting capped docs re-admits the shingle and surfaces the hidden pair") {
    import spark.implicits._
    val root = tempDir("graft-forget-df")
    // A and B are exact copies holding exactly ONE 3-word shingle; C1..C4
    // embed the same window among filler, pushing its df to 6 > maxDf=3,
    // so the (A,B) pair is CAPPED AWAY. Deleting the C docs drops df' to
    // 2 <= 3 — a correct takedown must make (A,B) visible.
    val shared = "alpha beta gamma"
    val e0 = (Seq((10L, shared)) ++ (1 to 4).map(i =>
      (100L + i, s"$shared filler$i window$i padding$i extra$i")))
      .toDF("doc_id", "text")
    val e1 = Seq((20L, shared)).toDF("doc_id", "text")
    SimIndex.writeShingleIndex(e0, root, 0)
    SimIndex.writeShingleIndex(e1, root, 1)
    assert(collectPairs(SimIndex.crossEpochNearDups(spark, root, 1, maxDf = 3)).isEmpty,
      "fixture broken: the shared shingle was not capped before the takedown")
    ForgetOps.writeDocTombstones(spark, root, 1, ids(spark, (1 to 4).map(100L + _)))
    val mor = collectPairs(ForgetOps.crossEpochNearDupsForgetting(spark, root, 1, maxDf = 3))
    assert(mor == Set((10L, 20L, 1L, 1L)),
      s"df maintenance failed — expected the re-admitted (A,B) pair, got $mor")
    // and the rebuilt reference agrees, both merge-on-read and post-compaction
    val root2 = tempDir("graft-forget-df-ref")
    SimIndex.writeShingleIndex(Seq((10L, shared)).toDF("doc_id", "text"), root2, 0)
    SimIndex.writeShingleIndex(e1, root2, 1)
    assert(collectPairs(SimIndex.crossEpochNearDups(spark, root2, 1, maxDf = 3)) == mor)
    ForgetOps.compactForgetDocs(spark, root, 1)
    assert(collectPairs(SimIndex.crossEpochNearDups(spark, root, 1, maxDf = 3)) == mor,
      "post-compaction df stats stale — capped shingle not re-admitted")
  }

  test("image takedown: merge-on-read == rebuilt; compaction destroys and the plain probe stays correct") {
    import spark.implicits._
    def img(i: Int): (String, Long) =
      (s"http://h${i % 7}.example/img-$i",
        graft.functions.ImageKit.mix64(i.toLong * 2654435761L + 13L))
    val e0 = spark.createDataset((0 until 60).map(img)).toDF("image_id", "phash")
    val e1 = spark.createDataset((60 until 100).map(img)).toDF("image_id", "phash")
      .unionByName(e0.where(pmod(xxhash64(col("image_id")), lit(5)) === 0)
        .select(concat(col("image_id"), lit("?utm=copy")).as("image_id"), col("phash")))
    val root = tempDir("graft-forget-img")
    SimIndex.writePhashIndex(e0, root, 0)
    SimIndex.writePhashIndex(e1, root, 1)
    def collectP(df: DataFrame): Set[(String, String, Int)] =
      df.select("image_a", "image_b", "hamming").collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val before = collectP(SimIndex.crossEpochNearDupPhash(spark, root, 1))
    assert(before.nonEmpty, "fixture broken: no planted image pairs")
    // take down the epoch-0 ORIGINAL of every planted pair (the DMCA case:
    // the source image goes, its re-crawled copies must stop matching it)
    val gone = before.map(_._1).toSeq.sorted.take(3)
    ForgetOps.writeImgTombstones(spark, root, 1, gone.toDF("image_id"))
    val mor = collectP(ForgetOps.crossEpochNearDupPhashForgetting(spark, root, 1))
    val root2 = tempDir("graft-forget-img-ref")
    val goneSet = gone.toSet
    SimIndex.writePhashIndex(e0.where(!col("image_id").isin(gone: _*)), root2, 0)
    SimIndex.writePhashIndex(e1.where(!col("image_id").isin(gone: _*)), root2, 1)
    val rebuilt = collectP(SimIndex.crossEpochNearDupPhash(spark, root2, 1))
    assert(mor == rebuilt,
      s"image merge-on-read != rebuilt (mor=${mor.size}, rebuilt=${rebuilt.size})")
    assert(mor != before && !mor.exists(p => goneSet(p._1) || goneSet(p._2)))
    ForgetOps.compactForgetImages(spark, root, 1)
    assert(collectP(SimIndex.crossEpochNearDupPhash(spark, root, 1)) == rebuilt,
      "post-compaction plain image probe != rebuilt reference")
    assert(!new java.io.File(s"$root/tombstones_img").exists())
    assert(spark.read.parquet(s"$root/phash_blocks")
      .where(col("image_id").isin(gone: _*)).count() == 0,
      "deleted images physically present after rewrite")
  }

  test("embedding takedown: merge-on-read == rebuilt; compaction destroys and the plain probe stays correct") {
    import spark.implicits._
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    // the SimIndexSpec fixture: epoch 1 re-embeds every 20th epoch-0
    // vector under a shifted id (tiny first-dim nudge, inside 0.99)
    val e0 = base.where(pmod(col("vec_id"), lit(2)) === 0)
    val e1 = base.where(pmod(col("vec_id"), lit(2)) === 1)
      .unionByName(e0.where(pmod(col("vec_id"), lit(20)) === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            when(i === 0, (x.cast("double") + lit(0.05)).cast("float")).otherwise(x))
            .as("embedding")))
    val all = e0.unionByName(e1)
    val nBits = 6
    val root = tempDir("graft-forget-emb")
    SimIndex.writeLshIndex(e0, root, 0, nBits)
    SimIndex.writeLshIndex(e1, root, 1, nBits)
    def collectE(df: DataFrame): Set[(Long, Long, Double)] =
      df.select("vec_a", "vec_b", "cos").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val before = collectE(SimIndex.crossEpochNearDupCosine(spark, root, 1, all))
    assert(before.nonEmpty, "fixture broken: no planted embedding pairs")
    // take down the epoch-0 ORIGINAL of every planted pair (GDPR erasure:
    // the source vector goes, its re-embedded copy must stop matching it)
    val gone = before.map(_._1).toSeq.sorted.take(3)
    ForgetOps.writeEmbTombstones(spark, root, 1, gone.toDF("vec_id"))
    val mor = collectE(ForgetOps.crossEpochNearDupCosineForgetting(spark, root, 1, all))
    val root2 = tempDir("graft-forget-emb-ref")
    val goneSet = gone.toSet
    SimIndex.writeLshIndex(e0.where(!col("vec_id").isin(gone: _*)), root2, 0, nBits)
    SimIndex.writeLshIndex(e1.where(!col("vec_id").isin(gone: _*)), root2, 1, nBits)
    val rebuilt = collectE(SimIndex.crossEpochNearDupCosine(spark, root2, 1, all))
    assert(mor == rebuilt,
      s"embedding merge-on-read != rebuilt (mor=${mor.size}, rebuilt=${rebuilt.size})")
    assert(mor != before && !mor.exists(p => goneSet(p._1) || goneSet(p._2)))
    // a replayed takedown at a later epoch slot is a no-op
    ForgetOps.writeEmbTombstones(spark, root, 2, gone.toDF("vec_id"))
    assert(collectE(ForgetOps.crossEpochNearDupCosineForgetting(spark, root, 1, all)) == mor)
    ForgetOps.compactForgetEmbeddings(spark, root)
    assert(collectE(SimIndex.crossEpochNearDupCosine(spark, root, 1, all)) == rebuilt,
      "post-compaction tombstone-unaware embedding probe != rebuilt reference")
    assert(!new java.io.File(s"$root/tombstones_emb").exists())
    assert(spark.read.parquet(s"$root/lsh_buckets")
      .where(col("vec_id").isin(gone: _*)).count() == 0,
      "deleted vectors physically present after rewrite")
  }

  test("probe cost stays tombstone-sized: tombstone sides broadcast, index stays a parquet scan") {
    val root = tempDir("graft-forget-plan")
    (0 to 1).foreach(e => SimIndex.writeShingleIndex(epochDocs(e), root, e))
    ForgetOps.writeDocTombstones(spark, root, 1, ids(spark, Seq(0L, 30L)))
    val p = ForgetOps.crossEpochNearDupsForgetting(spark, root, 1)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastQueryStage"),
      s"tombstone anti-joins did not broadcast:\n$p")
    assert(p.contains("FileScan parquet") || p.contains("Scan parquet"),
      s"index side must come from the persisted files:\n$p")
  }
}
