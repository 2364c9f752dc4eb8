package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Real binary PPM (netpbm P6, 8-bit RGB) encode/decode as pure
  * Catalyst projections — the THIRD modality widened from the
  * [[Multimodal.fakeDecodeFeatures]] stub on the [[BmpCodec]] pattern
  * (r11 VERDICT stretch): netpbm is the other classic entropy-free
  * raster format, so parsing again needs only substring/hex/conv
  * arithmetic, no codec library.
  *
  * Layout produced/parsed (canonical fixed-width header, 19 bytes):
  * {{{
  *   "P6\n" <wwwww> " " <hhhhh> "\n255\n"   (dims zero-padded to 5
  *                                           ASCII digits — legal
  *                                           netpbm tokens any reader
  *                                           consumes)
  *   then w·h RGB byte triples, row-major TOP-DOWN, no row padding
  * }}}
  *
  * Like [[BmpCodec.isBmp]], [[isPpm]] recognizes exactly the layout
  * this codec produces (fixed-width header + exact length): a
  * free-whitespace netpbm variant from the wild falls through to the
  * opaque byte-grid path rather than half-decoding — the honest
  * dispatcher posture. The logical pixel API is the same row-major
  * top-down packed 0xRRGGBB ints as [[BmpCodec.pixels]], so every
  * pixel consumer (pooling, dHash, exposure) is format-agnostic above
  * the dispatch; PpmSpec pins that the SAME pixel array encoded both
  * ways yields byte-identical pooled profiles and dHash bands.
  *
  * Scale: per-row projections over payload bytes — no shuffle, no UDF,
  * no driver; the hex detour costs 2× the payload bytes transiently
  * per row (the WavCodec trade). */
object PpmCodec {
  import WavCodec.beHex

  private val HeaderLen = 19

  /** Encode `w`×`h` row-major top-down packed-RGB pixels
    * (`array<int>`, each 0xRRGGBB, length w·h) into a complete binary
    * P6 PPM. */
  def encodePpm(pixels: Column, w: Column, h: Column): Column = {
    // Spark's lpad TRUNCATES strings longer than the target width, so a
    // dimension ≥ 100000 would silently corrupt the header (and isPpm
    // would then reject the codec's own output via the length
    // equation). Fail loudly at the 5-digit bound instead.
    val header = when(w >= 0 && w <= 99999 && h >= 0 && h <= 99999,
      concat(
        lit("P6\n"),
        lpad(w.cast("string"), 5, "0"), lit(" "),
        lpad(h.cast("string"), 5, "0"), lit("\n255\n")).cast("binary"))
      .otherwise(raise_error(concat(
        lit("encodePpm: dimensions outside the 5-digit header bound: w="),
        w.cast("string"), lit(" h="), h.cast("string"))).cast("binary"))
    val body = array_join(
      when(w * h > 0,
        transform(sequence(lit(0), w * h - 1, lit(1)), i => {
          val p = element_at(pixels, (i + 1).cast("int"))
          concat(beHex(floor(p / 65536).cast("long"), 1),            // R
            beHex(pmod(floor(p / 256).cast("long"), lit(256)), 1),   // G
            beHex(pmod(p, lit(256)), 1))                             // B
        }))
        .otherwise(typedLit(Seq.empty[String])), "")
    concat(header, unhex(body))
  }

  /** TRUE iff the payload carries the exact canonical layout this
    * codec produces: magic + separators + maxval line at their fixed
    * offsets, 5-digit ASCII dims, and total length exactly
    * 19 + 3·w·h — so neither text, a BMP, a truncated image, nor a
    * frame concatenation can collide. */
  def isPpm(payload: Column): Column =
    length(payload) >= HeaderLen &&
      hex(substring(payload, 1, 3)) === "50360A" &&
      substring(payload, 4, 12).cast("string")
        .rlike("^[0-9]{5} [0-9]{5}\\n$") &&
      hex(substring(payload, 16, 4)) === "3235350A" &&
      length(payload).cast("long") ===
        lit(HeaderLen.toLong) + width(payload) * height(payload) * 3

  /** Decoded pixel width (the fixed-offset 5-digit ASCII field). */
  def width(payload: Column): Column =
    substring(payload, 4, 5).cast("string").cast("long")

  /** Decoded pixel height. */
  def height(payload: Column): Column =
    substring(payload, 10, 5).cast("string").cast("long")

  /** Decoded pixel count (w·h). */
  def numPixels(payload: Column): Column = width(payload) * height(payload)

  /** Decoded pixels as row-major TOP-DOWN packed 0xRRGGBB ints — the
    * byte-exact inverse of [[encodePpm]] (PPM stores RGB top-down, so
    * unlike BMP there is no channel swap and no row flip to undo).
    * Empty images decode to the empty array (the explicit sequence
    * step — the WAV lesson). */
  def pixels(payload: Column): Column = {
    val n = numPixels(payload)
    val dh = hex(payload)
    when(n > 0,
      transform(sequence(lit(0L), n - 1, lit(1L)), i => {
        val off = lit(HeaderLen.toLong) + i * 3
        def byteAt(o: Column) =
          conv(dh.substr(o * 2 + 1, lit(2)), 16, 10).cast("int")
        (byteAt(off) * 65536 + byteAt(off + 1) * 256 + byteAt(off + 2))
          .cast("int")
      }))
      .otherwise(typedLit(Seq.empty[Int]))
  }

  /** Exact integer luminance-sum (R+G+B) of the pixel-index range
    * [start, end) straight from the payload hex — pooling consumers
    * visit each pixel's bytes once per range ([[BmpCodec]]'s
    * lumSumRange, minus the stride/flip arithmetic PPM doesn't
    * need). */
  private def lumSumRange(dh: Column, start: Column,
      end: Column): Column =
    aggregate(sequence(start.cast("long"), end.cast("long") - 1, lit(1L)),
      lit(0L), (acc, i) => {
        val off = lit(HeaderLen.toLong) + i * 3
        def byteAt(o: Column) =
          conv(dh.substr(o * 2 + 1, lit(2)), 16, 10).cast("long")
        acc + byteAt(off) + byteAt(off + 1) + byteAt(off + 2)
      })

  /** 4 real image features (block mean luminance in [0,1), 6 dp) —
    * the [[BmpCodec.bmpFeatures]] contract for the PPM branch of
    * [[Multimodal.decodeFeatures]]. */
  def ppmFeatures(payload: Column): Column = {
    val n = numPixels(payload)
    val dh = hex(payload)
    array((0 until 4).map { b =>
      val start = floor(n.cast("double") * b / 4).cast("long")
      val end = floor(n.cast("double") * (b + 1) / 4).cast("long")
      when(end > start,
        round(lumSumRange(dh, start, end)
          .cast("double") / ((end - start).cast("double") * 765.0), 6))
        .otherwise(lit(0.0))
    }: _*)
  }

  /** Block-mean pooling of the decoded luminance grid down to `k`
    * cells — [[BmpCodec.resizePooledPixels]]'s contract (same
    * partition rule, NULL-for-empty-cell convention, 6-dp determinism)
    * for the PPM branch of [[Multimodal.pooledProfile]]: the same
    * pixels pooled to the same cells whichever container carried
    * them. */
  def resizePooledPixels(payload: Column, k: Int): Column = {
    val n = numPixels(payload)
    val dh = hex(payload)
    transform(sequence(lit(0), lit(k - 1)), j => {
      val start = floor(j * n / lit(k)).cast("long")
      val end = floor((j + 1) * n / lit(k)).cast("long")
      when(end > start,
        round(lumSumRange(dh, start, end)
          .cast("double") / ((end - start).cast("double") * 3.0),
          Multimodal.pooledRoundDp))
    })
  }
}
