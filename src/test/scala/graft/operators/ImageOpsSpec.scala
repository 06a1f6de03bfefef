package graft.operators

import graft.SparkTestBase.spark
import graft.functions.ImageKit
import graft.model.Snapshot
import graft.sources.Gen
import org.scalatest.funsuite.AnyFunSuite

class ImageOpsSpec extends AnyFunSuite {
  import spark.implicits._

  private def snap(i: Int, epoch: Int): Snapshot = {
    val urlHash = ImageKit.mix64(i.toLong * 7919L + 17L)
    val fmt = if ((urlHash & 1L) == 0L) "png" else "jpeg"
    Gen.snapshotRow(s"http://${Gen.hostName(i % 10)}/news/art-$i",
      CrawlPipeline.contentVariant(urlHash, epoch),
      CrawlPipeline.captionVariant(urlHash, epoch), fmt, epoch, w = 40, h = 28)
  }

  private lazy val history = spark.createDataset(
    for (e <- 0 to 2; i <- 0 until 30) yield snap(i, e)).toDF()

  test("feature extraction: 8x8 pooled grid, sane luminance, deterministic") {
    val feats = ImageOps.features(history).collect()
    assert(feats.length == 90)
    feats.foreach { f =>
      assert(f.features.length == ImageOps.GridSize * ImageOps.GridSize)
      assert(f.mean_lum > 0 && f.mean_lum < 255, s"mean_lum=${f.mean_lum}")
      assert(f.contrast > 0, "flat image unexpected for synthetic corpus")
      assert((f.w, f.h) == (40, 28))
    }
    // determinism: recompute locally for one row
    val one = feats.head
    val bytes = history.where($"image_id" === one.image_id && $"epoch" === one.epoch)
      .select("bytes").as[Array[Byte]].head()
    val (px, w, h) = ImageKit.decodeGray(bytes)
    val pooled = ImageKit.resampleArea(px, w, h, ImageOps.GridSize, ImageOps.GridSize)
    assert(pooled.toSeq == one.features.toSeq)
  }

  test("consecutive PSNR: identical bytes -> 999, revised pixels -> finite low") {
    val psnr = ImageOps.consecutivePsnr(history).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(3))).toSeq
    assert(psnr.size == 60) // 30 images x 2 consecutive pairs
    psnr.foreach { case (id, epoch, p) =>
      val i = id.split("art-")(1).toInt
      val urlHash = ImageKit.mix64(i.toLong * 7919L + 17L)
      val changed = CrawlPipeline.contentVariant(urlHash, epoch) !=
        CrawlPipeline.contentVariant(urlHash, epoch - 1)
      if (!changed) assert(p == 999.0, s"$id@$epoch unchanged but psnr=$p")
      else assert(p >= 0 && p < 40, s"$id@$epoch revised but psnr=$p (should be low)")
    }
  }

  test("image corpus dedup: planted copies collapse to one survivor per component") {
    import org.apache.spark.sql.functions.{col, xxhash64}
    val rnd = new scala.util.Random(7)
    // base phashes: random 64-bit values are ~32 bits apart — assert the
    // fixture really has no accidental near-dups, then plant them
    val base = (0 until 40).map(i => (s"http://imgs/x-$i", rnd.nextLong()))
    for (Seq((_, a), (_, b)) <- base.combinations(2))
      assert(java.lang.Long.bitCount(a ^ b) > 3, "fixture collision; reseed")
    val copies = base.take(8).map { case (id, p) => (s"$id?copy", p) }        // hamming 0
    val near = base.slice(8, 12).map { case (id, p) => (s"$id?near", p ^ 3L) } // hamming 2
    val far = base.slice(12, 16).map { case (id, p) => (s"$id?far", p ^ 0x00FF00FF00L) }
    val all = base ++ copies ++ near ++ far
    val df = all.toDF("image_id", "phash")
    val kept = ImageOps.dedupImageCorpus(df).select("image_id").collect()
      .map(_.getString(0)).toSet
    // sequential mirror: pairs = all pairs hamming<=3; union-find on
    // xxhash64 ids; survivors = component-min ids + singletons
    val hash = df.select(col("image_id"), xxhash64(col("image_id")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r } }
    for (Seq((ia, pa), (ib, pb)) <- all.combinations(2)
         if java.lang.Long.bitCount(pa ^ pb) <= 3) {
      val (ra, rb) = (find(hash(ia)), find(hash(ib)))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val dropped = parent.keys.filter(h => find(h) != h).toSet
    val expected = all.map(_._1).filterNot(id => dropped.contains(hash(id))).toSet
    assert(kept == expected, "distributed image dedup diverged from union-find mirror")
    assert(kept.size == all.size - dropped.size && dropped.nonEmpty)
    // every planted ?copy/?near pair lost exactly its non-min member
    for ((id, _) <- copies ++ near) {
      val pairIds = Seq(id, id.takeWhile(_ != '?'))
      assert(pairIds.count(kept.contains) == 1, s"component of $id kept != 1")
    }
  }

  test("incremental epoch dedup via persisted index == union-find mirror; corpus dups dropped") {
    import org.apache.spark.sql.functions.{col, xxhash64}
    val root = graft.SparkTestBase.tempDir("graft-incdedup")
    val rnd = new scala.util.Random(11)
    val e0 = (0 until 40).map(i => (s"http://imgs/e0-$i", rnd.nextLong()))
    val novel = (0 until 10).map(i => (s"http://imgs/e1-$i", rnd.nextLong()))
    // margin 5: the ?re plants flip 1 bit, so cross-set distances shrink by
    // at most 1 and must still clear the hamming-3 pair threshold
    for (Seq((_, a), (_, b)) <- (e0 ++ novel).combinations(2))
      assert(java.lang.Long.bitCount(a ^ b) > 5, "fixture collision; reseed")
    val dupOfOld = e0.take(6).map { case (id, p) => (s"$id?re", p ^ 1L) }   // near-dup of corpus
    val dupWithin = novel.take(3).map { case (id, p) => (s"$id?c", p) }     // new-new exact dup
    val e1 = novel ++ dupOfOld ++ dupWithin
    SimIndex.writePhashIndex(e0.toDF("image_id", "phash"), root, 0)
    SimIndex.writePhashIndex(e1.toDF("image_id", "phash"), root, 1)
    val admitted = ImageOps.dedupNewEpochImages(spark, root, 1, e1.toDF("image_id", "phash"))
      .select("image_id").collect().map(_.getString(0)).toSet
    // mirror: union-find over every hamming<=3 pair touching a NEW image
    // (the index emits exactly those); drop a new image if its component
    // contains any e0 member, else keep the component-min img_hash
    val all = e0 ++ e1
    val hash = all.map(_._1).toDF("image_id")
      .select(col("image_id"), xxhash64(col("image_id")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val newIds = e1.map(t => hash(t._1)).toSet
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r } }
    for (Seq((ia, pa), (ib, pb)) <- all.combinations(2)
         if java.lang.Long.bitCount(pa ^ pb) <= 3 &&
           (newIds.contains(hash(ia)) || newIds.contains(hash(ib)))) {
      val (ra, rb) = (find(hash(ia)), find(hash(ib)))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val byComp = parent.keys.map(h => find(h) -> h).toSeq.groupMap(_._1)(_._2)
    val expected = e1.map(_._1).filter { id =>
      val h = hash(id)
      if (!parent.contains(h)) true // in no pair — novel by construction
      else {
        val members = byComp(find(h))
        val hasOld = members.exists(m => !newIds.contains(m))
        !hasOld && members.min == h
      }
    }.toSet
    assert(admitted == expected, "incremental dedup diverged from union-find mirror")
    // planted semantics
    dupOfOld.foreach { case (id, _) => assert(!admitted.contains(id), s"$id is a corpus dup") }
    dupWithin.foreach { case (id, _) =>
      val orig = id.takeWhile(_ != '?')
      assert(Seq(id, orig).count(admitted.contains) == 1, s"new-new pair of $orig kept != 1")
    }
    novel.drop(3).foreach { case (id, _) =>
      assert(admitted.contains(id), s"novel $id wrongly dropped") }
  }

  test("c89 phash calibration == ImageKit mirror; copies inside the radius, flip/revision/unrelated outside") {
    val pairs = ImageOps.calibrationPairs(spark, 48)
    val got = ImageOps.phashCalibration(pairs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap

    // mirror: identical stats through the local kernel (expression parity)
    val local = pairs.collect().map { r =>
      val h = ImageKit.hamming64(
        ImageKit.phash64(r.getAs[Array[Byte]](1)),
        ImageKit.phash64(r.getAs[Array[Byte]](2)))
      (r.getString(0), h.toLong)
    }
    val mir = local.groupBy(_._1).map { case (k, v) =>
      val hs = v.map(_._2)
      k -> (hs.length.toLong, hs.min, hs.max,
        hs.sum * 100L / hs.length, hs.count(_ <= 3L).toLong * 10000L / hs.length)
    }
    assert(got == mir, s"calibration drifted from the kernel mirror:\n$got\nvs\n$mir")

    // semantic bands: the radius catches true copies and ONLY true copies
    assert(got("a_jpeg_reenc")._5 == 10000L, s"jpeg re-encodes escape the radius: ${got("a_jpeg_reenc")}")
    assert(got("b_blur3")._5 == 10000L, s"blurred copies escape the radius: ${got("b_blur3")}")
    assert(got("c_flip")._2 > 3L, s"flip blindspot not realized (c52's reason to exist): ${got("c_flip")}")
    assert(got("d_revision")._2 > 3L, s"content revision inside the copy radius: ${got("d_revision")}")
    assert(got("e_unrelated")._2 > 3L, s"unrelated pair inside the copy radius: ${got("e_unrelated")}")
  }
}
