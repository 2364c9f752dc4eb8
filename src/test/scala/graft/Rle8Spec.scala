package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.ext.{BmpCodec, Multimodal, Rle8Codec}

/** RLE8 codec contracts: the roundtrip pieces the registered
  * `ext_rle8_roundtrip` hash-gates, the CONTAINER-INVARIANCE promise
  * (same grays as RLE8 and as an equal-channel uncompressed BMP pool
  * and dHash-band identically through [[Multimodal.pooledProfile]]),
  * and the command-stream validator's honest-dispatcher rejections —
  * including byte-surgery fixtures for the non-canonical absolute and
  * delta modes a wild RLE file may carry. */
class Rle8Spec extends SparkSpec {

  private def genCols(seed: Column) = {
    val w = (lit(16) + pmod(seed, lit(5))).cast("int")
    val h = (lit(12) + pmod(seed, lit(4))).cast("int")
    // runs of 4 within rows — compressible content, never merging
    val grays = transform(sequence(lit(0), w * h - 1, lit(1)), i =>
      pmod(seed * 7 + floor(i / 4).cast("int") * 13, lit(256))
        .cast("int"))
    (grays, w, h)
  }

  test("container invariance: the same grays as RLE8 and as an " +
      "equal-channel BMP decode, pool, and dHash-band identically " +
      "through the dispatcher") {
    import spark.implicits._
    val rows = Seq(3L, 7L, 11L).toDF("seed")
    val (grays, w, h) = genCols(col("seed"))
    val rgb = transform(grays, g => (g * 65536 + g * 256 + g).cast("int"))
    val enc = rows.select(col("seed"),
      Rle8Codec.encodeRle8(grays, w, h).as("rle"),
      BmpCodec.encodeBmp(rgb, w, h).as("bmp"))
    val got = enc.select(col("seed"),
        Rle8Codec.isRle8(col("rle")).as("ok"),
        (Rle8Codec.pixels(col("rle")) === BmpCodec.pixels(col("bmp")))
          .as("pxEq"),
        (Multimodal.pooledProfile(col("rle"), 65)
          === Multimodal.pooledProfile(col("bmp"), 65)).as("poolEq"),
        (Multimodal.dHashBandsFromPooled(
            Multimodal.pooledProfile(col("rle"), 65), 4, 16)
          === Multimodal.dHashBandsFromPooled(
            Multimodal.pooledProfile(col("bmp"), 65), 4, 16))
          .as("bandEq"),
        (Multimodal.decodeFeatures(col("rle"))
          === BmpCodec.bmpFeatures(col("bmp"))).as("featEq"),
        (Multimodal.exposureKeep(col("rle"))
          === Multimodal.exposureKeep(col("bmp"))).as("expEq"))
      .collect()
    got.foreach { r =>
      assert(r.getBoolean(1), s"canonical RLE8 rejected, seed ${r.get(0)}")
      assert(r.getBoolean(2), s"pixels differ, seed ${r.get(0)}")
      assert(r.getBoolean(3), s"pooled profiles differ, seed ${r.get(0)}")
      assert(r.getBoolean(4), s"dHash bands differ, seed ${r.get(0)}")
      assert(r.getBoolean(5), s"features differ, seed ${r.get(0)}")
      assert(r.getBoolean(6), s"exposure gate differs, seed ${r.get(0)}")
    }
  }

  test("isRle8 validator: rejects plain BMP, truncation, " +
      "concatenation, and malformed mode-2 commands; accepts the full " +
      "command set with index-0 fills; run-cap 255 and degenerate " +
      "dims roundtrip") {
    import spark.implicits._
    val (grays, w, h) = genCols(lit(5L))
    val rgb = transform(grays, g => (g * 65536 + g * 256 + g).cast("int"))
    val base = spark.range(1).select(
        Rle8Codec.encodeRle8(grays, w, h).as("rle"),
        BmpCodec.encodeBmp(rgb, w, h).as("bmp"),
        w.as("w"), h.as("h"))
      .collect()(0)
    val rle = base.getAs[Array[Byte]](0)
    val bmp = base.getAs[Array[Byte]](1)
    val (wv, hv) = (base.getInt(2), base.getInt(3))
    def mutate(b: Array[Byte], off: Int, v: Array[Byte]): Array[Byte] = {
      val c = b.clone(); v.zipWithIndex.foreach { case (x, i) =>
        c(off + i) = x }; c
    }
    def check(name: String, payload: Array[Byte]): Boolean =
      spark.range(1)
        .select(Rle8Codec.isRle8(lit(payload)).as(name))
        .collect()(0).getBoolean(0)
    assert(check("ok", rle), "canonical payload must pass")
    assert(!check("bmp", bmp), "uncompressed BMP must not pass isRle8")
    assert(!spark.range(1).select(BmpCodec.isBmp(lit(rle))).collect()(0)
      .getBoolean(0), "an RLE8 must not pass isBmp")
    assert(!check("trunc", rle.dropRight(2)), "truncation must fail")
    assert(!check("cat", rle ++ rle), "concatenation must fail")
    // full command set (r13 VERDICT #5): an EARLY-closed row is now a
    // defined stream — the dropped pixel decodes as palette index 0
    // (black under the grayscale ramp), never a half-decode
    val shortRow = mutate(rle, 1078,
      Array(((rle(1078) & 0xff) - 1).toByte))
    assert(check("short", shortRow),
      "early-EOL (mode-2 semantics) must now validate")
    val shortPx = spark.range(1)
      .select(Rle8Codec.pixels(lit(shortRow)).as("px"))
      .collect()(0).getSeq[Int](0)
    val fullPx = spark.range(1)
      .select(Rle8Codec.pixels(lit(rle)).as("px"))
      .collect()(0).getSeq[Int](0)
    assert(shortPx.size == wv * hv, "fill must keep the pixel count")
    // stored row 0 = logical LAST row; its tail pixel is the fill
    assert(shortPx.last == 0x000000, "early-EOL tail must be index 0")
    // cols before the shortened run's effect match a left-shift of the
    // original row; every other row is untouched
    assert(shortPx.take(wv * (hv - 1)) == fullPx.take(wv * (hv - 1)),
      "early EOL on stored row 0 leaked into other rows")
    // malformed mode-2 commands still fail shut:
    // absolute block overflowing its row (n = w+1 literals)
    val absOverflow = mutate(rle, 1078, Array(0, (wv + 1).toByte))
    assert(!check("absOv", absOverflow),
      "absolute block wider than the row must fail")
    // delta jumping below the bitmap (dy past the last stored row)
    val deltaOut = mutate(rle, 1078, Array(0, 2, 0, hv.toByte))
    assert(!check("deltaOut", deltaOut),
      "delta jumping out of the bitmap must fail")
    // truncated delta: 00 02 as the FINAL two bytes (args missing)
    val deltaTrunc = mutate(rle, rle.length - 2, Array(0, 2))
    assert(!check("deltaTrunc", deltaTrunc),
      "delta without arguments must fail")
    // truncated absolute: data would run past the stream end
    val absTrunc = mutate(rle, rle.length - 2, Array(0, 3))
    assert(!check("absTrunc", absTrunc),
      "absolute data past the stream end must fail")
    // run cap: a 300-wide constant row must split at 255 and roundtrip
    val wide = spark.range(1).select(
        Rle8Codec.encodeRle8(
          transform(sequence(lit(0), lit(299), lit(1)), _ => lit(42)),
          lit(300), lit(1)).as("r"))
      .select(Rle8Codec.isRle8(col("r")).as("ok"),
        size(Rle8Codec.pixels(col("r"))).as("n"),
        size(array_distinct(Rle8Codec.pixels(col("r")))).as("nd"))
      .collect()(0)
    assert(wide.getBoolean(0) && wide.getInt(1) == 300 &&
      wide.getInt(2) == 1, s"run-cap split failed: $wide")
    // degenerate 0x0: recognized, decodes empty
    val empty = spark.range(1).select(
        Rle8Codec.encodeRle8(typedLit(Seq.empty[Int]), lit(0), lit(0))
          .as("r"))
      .select(Rle8Codec.isRle8(col("r")).as("ok"),
        size(Rle8Codec.pixels(col("r"))).as("n"))
      .collect()(0)
    assert(empty.getBoolean(0) && empty.getInt(1) == 0,
      s"degenerate image failed: $empty")
  }
}
