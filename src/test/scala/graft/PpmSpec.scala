package graft

import org.apache.spark.sql.functions._

import graft.ext.{BmpCodec, Multimodal, PgmCodec, PpmCodec}

/** PPM codec contracts: the roundtrip pieces the registered
  * `ext_ppm_roundtrip` hash-gates, plus the CONTAINER-INVARIANCE
  * promise that justifies the dispatcher design — the same pixel array
  * encoded as BMP and as PPM must pool to byte-identical profiles and
  * dHash bands through [[Multimodal.pooledProfile]], so every pixel
  * consumer is format-agnostic above the dispatch. */
class PpmSpec extends SparkSpec {

  private def gen(seed: Long) = {
    val p = lit(seed)
    val w = (lit(16) + pmod(p, lit(5))).cast("int")
    val h = (lit(12) + pmod(p, lit(4))).cast("int")
    val px = transform(sequence(lit(0), w * h - 1, lit(1)), i =>
      (pmod(p * 7 + i * 13, lit(256)) * 65536
        + pmod(p * 11 + i * 3, lit(256)) * 256
        + pmod(p * 5 + i * 17, lit(256))).cast("int"))
    (px, w, h)
  }

  test("container invariance: same pixels as BMP and as PPM decode, " +
      "pool, and dHash-band identically through the dispatcher") {
    import spark.implicits._
    val rows = Seq(3L, 7L, 11L).toDF("seed")
    val (px, w, h) = {
      val p = col("seed")
      val w = (lit(16) + pmod(p, lit(5))).cast("int")
      val h = (lit(12) + pmod(p, lit(4))).cast("int")
      (transform(sequence(lit(0), w * h - 1, lit(1)), i =>
        (pmod(p * 7 + i * 13, lit(256)) * 65536
          + pmod(p * 11 + i * 3, lit(256)) * 256
          + pmod(p * 5 + i * 17, lit(256))).cast("int")), w, h)
    }
    val enc = rows.select(col("seed"),
      BmpCodec.encodeBmp(px, w, h).as("bmp"),
      PpmCodec.encodePpm(px, w, h).as("ppm"))
    val got = enc.select(col("seed"),
        BmpCodec.pixels(col("bmp")).as("bpx"),
        PpmCodec.pixels(col("ppm")).as("ppx"),
        Multimodal.pooledProfile(col("bmp"), 65).as("bpool"),
        Multimodal.pooledProfile(col("ppm"), 65).as("ppool"),
        Multimodal.dHashBandsFromPooled(
          Multimodal.pooledProfile(col("bmp"), 65), 4, 16).as("bband"),
        Multimodal.dHashBandsFromPooled(
          Multimodal.pooledProfile(col("ppm"), 65), 4, 16).as("pband"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"decoded pixels differ across containers for seed ${r.get(0)}")
      assert(r.getSeq[java.lang.Double](3) == r.getSeq[java.lang.Double](4),
        s"pooled profiles differ across containers for seed ${r.get(0)}")
      assert(r.getSeq[Long](5) == r.getSeq[Long](6),
        s"dHash bands differ across containers for seed ${r.get(0)}")
    }
  }

  test("isPpm: recognizes exactly the canonical layout — rejects BMP, " +
      "text, truncation, concatenation; 0-pixel image decodes empty") {
    import spark.implicits._
    val (px, w, h) = gen(5L)
    val r = spark.range(1).select(
        PpmCodec.encodePpm(px, w, h).as("ppm"),
        BmpCodec.encodeBmp(px, w, h).as("bmp"))
      .select(
        PpmCodec.isPpm(col("ppm")).as("ok"),
        PpmCodec.isPpm(col("bmp")).as("bmpAsPpm"),
        PpmCodec.isPpm(lit("P6\nnot an image").cast("binary"))
          .as("text"),
        PpmCodec.isPpm(substring(col("ppm"), 1, 40)).as("trunc"),
        PpmCodec.isPpm(concat(col("ppm"), col("ppm"))).as("cat"),
        BmpCodec.isBmp(col("ppm")).as("ppmAsBmp"),
        size(PpmCodec.pixels(
          PpmCodec.encodePpm(typedLit(Seq.empty[Int]), lit(0), lit(0))))
          .as("emptyPx"))
      .head()
    assert(r.getBoolean(0), "canonical PPM must be recognized")
    assert(!r.getBoolean(1), "a BMP must not pass isPpm")
    assert(!r.getBoolean(2), "text starting with the magic must fail")
    assert(!r.getBoolean(3), "a truncated PPM must fail the length pin")
    assert(!r.getBoolean(4), "concatenated PPMs must fail")
    assert(!r.getBoolean(5), "a PPM must not pass isBmp")
    assert(r.getInt(6) == 0, "0-pixel image must decode to empty array")
  }

  test("PGM container invariance: the same grays as PGM and as an " +
      "equal-channel BMP decode, pool, and dHash-band identically; " +
      "isPgm rejects PPM/BMP/truncation") {
    val p = lit(4L)
    val w = (lit(16) + pmod(p, lit(5))).cast("int")
    val h = (lit(12) + pmod(p, lit(4))).cast("int")
    val grays = transform(sequence(lit(0), w * h - 1, lit(1)), i =>
      pmod(p * 7 + i * 13, lit(256)).cast("int"))
    val rgb = transform(grays, g => (g * 65536 + g * 256 + g).cast("int"))
    val r = spark.range(1).select(
        PgmCodec.encodePgm(grays, w, h).as("pgm"),
        BmpCodec.encodeBmp(rgb, w, h).as("bmp"))
      .select(
        PgmCodec.isPgm(col("pgm")).as("ok"),
        PgmCodec.isPgm(col("bmp")).as("bmpAsPgm"),
        PgmCodec.isPgm(substring(col("pgm"), 1, 40)).as("trunc"),
        PpmCodec.isPpm(col("pgm")).as("pgmAsPpm"),
        (PgmCodec.pixels(col("pgm")) === BmpCodec.pixels(col("bmp")))
          .as("pxEq"),
        (Multimodal.pooledProfile(col("pgm"), 65)
          === Multimodal.pooledProfile(col("bmp"), 65)).as("poolEq"),
        (Multimodal.dHashBandsFromPooled(
            Multimodal.pooledProfile(col("pgm"), 65), 4, 16)
          === Multimodal.dHashBandsFromPooled(
            Multimodal.pooledProfile(col("bmp"), 65), 4, 16))
          .as("bandEq"),
        Multimodal.exposureKeep(PgmCodec.encodePgm(
          transform(grays, g => pmod(g, lit(50)).cast("int")), w, h))
          .as("darkKeep"))
      .head()
    assert(r.getBoolean(0), "canonical PGM must be recognized")
    assert(!r.getBoolean(1), "a BMP must not pass isPgm")
    assert(!r.getBoolean(2), "a truncated PGM must fail the length pin")
    assert(!r.getBoolean(3), "a PGM must not pass isPpm (P5 vs P6 magic)")
    assert(r.getBoolean(4), "replicated-channel pixels must equal the " +
      "equal-channel BMP decode")
    assert(r.getBoolean(5), "pooled profiles must match across containers")
    assert(r.getBoolean(6), "dHash bands must match across containers")
    assert(!r.getBoolean(7), "an all-dark PGM must drop at the " +
      "exposure gate (gray < 64 -> luminance < 192)")
  }

  test("exposureKeep dispatches on PPM pixels: a dark PPM drops, a " +
      "normal PPM and an opaque payload keep") {
    val p = lit(9L)
    val w = lit(8).cast("int")
    val h = lit(6).cast("int")
    def px(dark: Boolean) =
      transform(sequence(lit(0), w * h - 1, lit(1)), i => {
        def ch(a: Int, b: Int) = {
          val base = pmod(p * a + i * b, lit(256))
          if (dark) pmod(base, lit(64)) else base
        }
        (ch(7, 13) * 65536 + ch(11, 3) * 256 + ch(5, 17)).cast("int")
      })
    val r = spark.range(1).select(
        Multimodal.exposureKeep(PpmCodec.encodePpm(px(dark = false), w, h))
          .as("normal"),
        Multimodal.exposureKeep(PpmCodec.encodePpm(px(dark = true), w, h))
          .as("dark"),
        Multimodal.exposureKeep(lit("no image here").cast("binary"))
          .as("opaque"))
      .head()
    assert(r.getBoolean(0), "a normally-exposed PPM must keep")
    assert(!r.getBoolean(1), "an all-dark PPM must drop")
    assert(r.getBoolean(2), "an opaque payload passes unjudged")
  }
}
