package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal
import graft.ops.Multimodal.{MediaRecord, StubMediaDecoder}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("batched decode through mapPartitions preserves every record once") {
    import spark.implicits._
    val media = (0L until 200L).map(i =>
      MediaRecord(i, if (i % 2 == 0) "image/fake" else "video/fake",
        ("payload-" * (i.toInt % 7 + 1) + i).getBytes("UTF-8")))
    val ds = spark.createDataset(media).repartition(5)
    val out = Multimodal.decode(ds, StubMediaDecoder, batchSize = 16).collect()
    assert(out.length === 200)
    assert(out.map(_.media_id).toSet === (0L until 200L).toSet)
    // features are a pure function of the payload
    val one = out.find(_.media_id === 3L).get
    val expect = StubMediaDecoder.decodeBatch(Seq(media(3))).head
    assert(one === expect)
  }

  test("video payloads report frame counts, stills report 1") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      MediaRecord(1, "image/fake", Array.fill[Byte](100)(1)),
      MediaRecord(2, "video/fake", Array.fill[Byte](100)(1))))
    val out = Multimodal.decode(ds, StubMediaDecoder).collect().sortBy(_.media_id)
    assert(out(0).n_frames === 1)
    assert(out(1).n_frames === (100 % 24 + 1))
  }

  test("frame sampling explodes videos by stride, stills yield one frame") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      MediaRecord(1, "video/fake", Array.fill[Byte](100)(7)), // 100%24+1 = 5 frames
      MediaRecord(2, "image/fake", Array.fill[Byte](50)(3)))) // 1 frame
    val frames = Multimodal.sampleFrames(ds, StubMediaDecoder, stride = 2, frameSize = 8)
      .collect().groupBy(_.media_id)
    assert(frames(1L).map(_.frame_idx).sorted.toSeq === Seq(0, 2, 4)) // every 2nd of 5
    assert(frames(2L).map(_.frame_idx).toSeq === Seq(0))
    assert(frames(1L).forall(_.frame_bytes.length <= 8))
    assert(frames(1L).find(_.frame_idx == 0).get.frame_bytes.length === 8)
  }

  test("brightness is bounded to [0, 10000] basis points") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      MediaRecord(1, "image/fake", Array[Byte](0, 0)),
      MediaRecord(2, "image/fake", Array[Byte](-1, -1)), // 0xff 0xff
      MediaRecord(3, "image/fake", Array.empty[Byte])))
    val out = Multimodal.decode(ds, StubMediaDecoder).collect().sortBy(_.media_id)
    assert(out(0).brightness_bp === 0L)
    assert(out(1).brightness_bp === 10000L)
    assert(out(2).brightness_bp === 0L)
  }

  test("property: 4x8-bit phash banding has complete recall to Hamming 3") {
    // multimodal_phash_neardup's contract rests on the pigeonhole argument:
    // <= 3 flipped bits cannot touch all 4 disjoint 8-bit bands, so every
    // pair within Hamming 3 shares at least one (band, value) bucket. Pin
    // it with the query's OWN band expression evaluated by Spark, over
    // random 32-bit hashes plus adversarial exactly-3-bit-flip pairs.
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val base = (0 until 200).map(_ => rng.nextInt().toLong & 0xFFFFFFFFL)
    val perturbed = base.map { h =>
      rng.shuffle((0 until 32).toList).take(3)
        .foldLeft(h)((a, b) => a ^ (1L << b))
    }
    val hs = (base ++ perturbed).distinct
    val bands = hs.toDF("phash")
      .selectExpr("phash", "explode(sequence(0, 3)) AS band")
      .selectExpr("phash", "band", "shiftright(phash, band * 8) & 255 AS bv")
      .as[(Long, Int, Long)].collect()
    val buckets = bands.groupBy(r => (r._2, r._3)).values.map(_.map(_._1).toSet)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (a <- hs; b <- hs if a < b && ham(a, b) <= 3)
      assert(buckets.exists(s => s.contains(a) && s.contains(b)),
        s"pair ($a, $b) at Hamming ${ham(a, b)} shares no band bucket")
  }

  test("property: 4x16-bit phash banding has complete recall to Hamming 3 on 64-bit hashes") {
    // multimodal_phash64_neardup's widened contract: full 64-bit hashes
    // (sign bit included — bit 63 set makes the long negative), 4 disjoint
    // 16-bit bands, same pigeonhole bound. The adversarial set flips
    // exactly 3 bits including bit 63, so the arithmetic-shift-then-mask
    // band expression is exercised on negative values too.
    import spark.implicits._
    val rng = new scala.util.Random(29)
    val base = (0 until 200).map(_ => rng.nextLong()) :+ (1L << 63) :+ -1L
    val perturbed = base.map { h =>
      val flips = rng.shuffle((0 until 63).toList).take(2) :+ 63
      flips.foldLeft(h)((a, b) => a ^ (1L << b))
    }
    val hs = (base ++ perturbed).distinct
    val bands = hs.toDF("phash")
      .selectExpr("phash", "explode(sequence(0, 3)) AS band")
      .selectExpr("phash", "band", "shiftright(phash, band * 16) & 65535 AS bv")
      .as[(Long, Int, Long)].collect()
    val buckets = bands.groupBy(r => (r._2, r._3)).values.map(_.map(_._1).toSet)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (a <- hs; b <- hs if a < b && ham(a, b) <= 3)
      assert(buckets.exists(s => s.contains(a) && s.contains(b)),
        s"pair ($a, $b) at Hamming ${ham(a, b)} shares no band bucket")
  }
}
