package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Binary-column plumbing: payload synthesis, the REAL binary-PGM codec
  * (header grammar, malformed-bytes policy, round-trip), iterator-based
  * feature extraction over decoded rasters, frame sampling. */
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

  test("feature extraction: unit-mass histogram of DECODED pixels, per partition") {
    val media = Multimodal.synthesizePgm(docs, "doc_id", "text").repartition(3)
    val feats = Multimodal.extractFeatures(media, "doc_id", "blob", bins = 16)
      .collect().map(f => f.id -> f).toMap
    assert(feats.size == 3)
    feats.values.foreach { f =>
      assert(f.ok)
      assert(math.abs(f.features.sum - 1f) < 1e-5)
      assert(f.features.length == 16)
    }
    // doc 1 ("z"): 9x7 raster of 'z' bytes only → all mass in bin
    // 122*16/256 = 7 of the PIXEL histogram (header bytes excluded)
    assert(feats(1L).features(122 * 16 / 256) == 1f)
    // a corrupt payload yields ok=false + zeroed features, never a throw
    import spark.implicits._
    val bad = Seq((9L, "P6\n2 2\n255\nabcd".getBytes("US-ASCII")))
      .toDF("doc_id", "blob")
    val fb = Multimodal.extractFeatures(bad, "doc_id", "blob", bins = 16)
      .collect().head
    assert(!fb.ok && fb.features.forall(_ == 0f) && fb.nBytes == 15)
  }

  test("decodePgm: grammar, malformed-bytes policy, encode round-trip") {
    def b(s: String) = s.getBytes("US-ASCII")
    // canonical header
    val img = Multimodal.decodePgm(b("P5\n3 2\n255\nABCDEF")).get
    assert(img.width == 3 && img.height == 2)
    assert(new String(img.pixels, "US-ASCII") == "ABCDEF")
    // Netpbm grammar: arbitrary whitespace runs and #-comments between
    // header tokens must parse
    val commented =
      Multimodal.decodePgm(b("P5 # a comment\n # more\n 3\t2 # dims\n255\nABCDEF"))
    assert(commented.exists(i => i.width == 3 && i.height == 2))
    // malformed-bytes policy: reject, never crash or misread
    assert(Multimodal.decodePgm(null).isEmpty)
    assert(Multimodal.decodePgm(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodePgm(b("P6\n3 2\n255\nABCDEF")).isEmpty,
      "color PPM magic must be rejected, not misdecoded")
    assert(Multimodal.decodePgm(b("P5\n3 2\n255\nABCDE")).isEmpty,
      "truncated raster")
    assert(Multimodal.decodePgm(b("P5\n3 2\n255\nABCDEFG")).isEmpty,
      "padded raster (shifted pixels downstream)")
    assert(Multimodal.decodePgm(b("P5\n3 2\n65535\n" + "AB")).isEmpty,
      "two-byte maxval out of scope — reject, don't halve")
    assert(Multimodal.decodePgm(b("P5\n0 2\n255\n")).isEmpty, "zero width")
    assert(Multimodal.decodePgm(b("P5\n3 x\n255\nABCDEF")).isEmpty,
      "non-numeric dimension")
    assert(Multimodal.decodePgm(b("P5\n3 2\n255")).isEmpty,
      "header ends before raster")
    // round-trip identity through the encoder
    val rt = Multimodal.decodePgm(Multimodal.encodePgm(img)).get
    assert(rt.width == img.width && rt.height == img.height &&
      rt.pixels.sameElements(img.pixels))
  }

  test("pixelStats: exact decoded stats; corrupt ids ok=false with NULLs") {
    import spark.implicits._
    // doc 3 gets the P6 corruption (3 % 97 == 3)
    val d4 = docs.union(Seq((3L, "qrs")).toDF("doc_id", "text"))
    val media = Multimodal.synthesizePgm(d4, "doc_id", "text")
    val rows = Multimodal.pixelStats(media, "doc_id", "blob")
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1 ("z"): 9x7=63 pixels of 122
    val r1 = rows(1L)
    assert(r1.getBoolean(1) && r1.getInt(2) == 9 && r1.getInt(3) == 7)
    assert(r1.getLong(4) == 63 && r1.getLong(5) == 63L * 122)
    assert(r1.getInt(6) == 122 && r1.getInt(7) == 122)
    assert(r1.getDouble(8) == 122.0)
    // doc 3: corrupted magic → rejected with NULL stats
    val r3 = rows(3L)
    assert(!r3.getBoolean(1) && r3.isNullAt(2) && r3.isNullAt(4) && r3.isNullAt(8))
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
