package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Binary-column plumbing: payload synthesis, iterator-based feature
  * extraction (decoder stub), frame sampling. */
class MultimodalSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq((0L, "abcd" * 40), (1L, "z"), (2L, "hello world, multimodal!"))
      .toDF("doc_id", "text")
  }

  test("synthesized media carries binary payload and typed metadata") {
    val m = Multimodal.synthesizeMedia(docs, "doc_id", "text")
    val r0 = m.filter(col("doc_id") === 0).head()
    assert(r0.getAs[Array[Byte]]("blob").length == 160)
    val meta = r0.getStruct(r0.fieldIndex("meta"))
    assert(meta.getAs[String]("format") == "jpeg")
    assert(meta.getAs[Int]("width") == 128)
    assert(meta.getAs[Int]("n_frames") == 1)
  }

  test("feature extraction: unit-mass histogram, computed per partition") {
    val media = Multimodal.synthesizeMedia(docs, "doc_id", "text").repartition(3)
    val feats = Multimodal.extractFeatures(media, "doc_id", "blob", bins = 16)
      .collect().map(f => f.id -> f).toMap
    assert(feats.size == 3)
    assert(feats(1L).nBytes == 1)
    feats.values.foreach { f =>
      assert(math.abs(f.features.sum - 1f) < 1e-5)
      assert(f.features.length == 16)
    }
    // deterministic: histogram of "z" (0x7a → bin 7*16+10=122*16/256=7)
    assert(feats(1L).features(122 * 16 / 256) == 1f)
  }

  test("frame sampling windows the payload with size/stride arithmetic") {
    val media = Multimodal.synthesizeMedia(docs, "doc_id", "text")
    val framed = Multimodal.frameSample(media, "blob", frameSize = 64, stride = 32)
    val r0 = framed.filter(col("doc_id") === 0).select(size(col("frames"))).head().getInt(0)
    assert(r0 == (160 - 64) / 32 + 1) // 4 windows
    val r1 = framed.filter(col("doc_id") === 1).select(size(col("frames"))).head().getInt(0)
    assert(r1 == 1) // clamped to a single (short) frame
    val first = framed.filter(col("doc_id") === 0)
      .select(expr("frames[0]")).head().getAs[Array[Byte]](0)
    assert(first.length == 64)
  }
}
