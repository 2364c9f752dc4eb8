package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Real RLE8 BMP (Windows V3, BI_RLE8 run-length compression, 8-bit
  * palette-indexed) encode/decode as pure Catalyst projections — the
  * first COMPRESSED format in the codec family (r12 VERDICT stretch):
  * run-length coding has no entropy stage, so decode is a runs-table
  * scan with prefix-sum positioning rather than a per-pixel byte read,
  * and it widens the real-decode share toward compressed web payloads
  * without crossing the DEFLATE/DCT line the scaladocs of
  * [[Multimodal]] draw.
  *
  * Layout produced/parsed (1-based offsets, scalars little-endian):
  * 1-2 "BM", 3-6 file size (1078 + imageSize), 7-10 reserved, 11-14
  * pixel offset 1078 (= 14 + 40 + 256·4 palette); 15-18 info size 40,
  * 19-22 width, 23-26 height (positive = bottom-up), 27-28 planes 1,
  * 29-30 bpp 8, 31-34 compression 1 (BI_RLE8), 35-38 imageSize
  * (encoded byte count), 39-46 2835 dpi pair, 47-50 colors used 256,
  * 51-54 important 0; 55-1078 the 256-entry BGRX palette (this encoder
  * writes the grayscale ramp; the decoder honors ANY palette bytes);
  * 1079.. the command stream.
  *
  * Canonical command subset (what [[encodeRle8]] emits and [[isRle8]]
  * admits): 2-byte encoded runs `(count 1..255, palette index)`,
  * end-of-line `00 00` closing each stored row exactly at width, and
  * one end-of-bitmap `00 01` as the final command. Absolute mode
  * (`00 n data…`) and delta (`00 02 dx dy`) are NOT canonical — they
  * make command boundaries content-dependent, and [[isRle8]]'s
  * command-stream validator rejects them, so a wild variable-length
  * RLE file falls through to the opaque byte-grid path rather than
  * half-decoding (the honest-dispatcher posture, now backed by a FULL
  * structural validation rather than a header-only length equation:
  * every command checked, run totals reconciled against width × height
  * row by row).
  *
  * The logical pixel API is row-major TOP-DOWN packed 0xRRGGBB ints
  * resolved through the palette — [[pixels]] is the byte-exact inverse
  * of [[encodeRle8]] (for the grayscale ramp, index g decodes to
  * g·65536+g·256+g, the [[PgmCodec]] replicated-channel contract), so
  * every packed-RGB consumer (pooling, dHash, exposure) works
  * unchanged above the dispatch.
  *
  * Scale: everything is a per-row projection; decode and pooling scan
  * the COMMAND stream (≤ pixels, usually ≪), never a per-pixel byte
  * walk — [[resizePooledPixels]] folds run-overlap contributions into
  * all k cells in ONE command pass with the cell means emitted from
  * the fold's finish lambda (no k× re-decode). The decoded-array
  * builder copies the current row per command (the WavCodec
  * transient-cost trade, bounded by row width × runs-per-row). */
object Rle8Codec {
  import WavCodec.{beHex, leHex, le32AtOff}

  /** Pixel-array offset: 14 + 40 + 256·4. */
  private val DataOff = 1078L

  /** The 256-entry grayscale BGRX palette as a static hex literal. */
  private val GrayPaletteHex: String =
    (0 until 256).map(i => f"$i%02X" * 3 + "00").mkString

  /** Encode `w`×`h` row-major top-down GRAY values (`array<int>`, each
    * 0..255, length w·h) into a complete BI_RLE8 BMP: grayscale-ramp
    * palette, bottom-up stored rows, maximal runs capped at 255, one
    * EOL per row, one EOB. */
  def encodeRle8(grays: Column, w: Column, h: Column): Column = {
    def cmd(n: Column, v: Column) =
      concat(beHex(n.cast("long"), 1), beHex(v.cast("long"), 1))
    def rowHex(s: Column): Column = {
      val r = h - 1 - s // stored row s holds logical row h-1-s
      val flush = (st: Column) =>
        when(st.getField("n") > 0,
          cmd(st.getField("n"), st.getField("cur"))).otherwise(lit(""))
      aggregate(
        sequence(lit(0), w - 1, lit(1)),
        struct(lit("").as("out"), lit(-1).as("cur"), lit(0).as("n")),
        (st, x) => {
          val v = element_at(grays, (r * w + x + 1).cast("int"))
          when(st.getField("n") > 0 && v === st.getField("cur") &&
              st.getField("n") < 255,
            struct(st.getField("out").as("out"),
              st.getField("cur").as("cur"),
              (st.getField("n") + 1).as("n")))
            .otherwise(struct(
              concat(st.getField("out"), flush(st)).as("out"),
              v.as("cur"), lit(1).as("n")))
        },
        st => concat(st.getField("out"), flush(st), lit("0000")))
    }
    val rowsHex = when(h > 0,
        array_join(transform(sequence(lit(0), h - 1, lit(1)), s =>
          when(w > 0, rowHex(s)).otherwise(lit("0000"))), ""))
      .otherwise(lit(""))
    val bodyHex = concat(rowsHex, lit("0001")) // end-of-bitmap
    val imageSize = (length(bodyHex) / 2).cast("long")
    val header = concat(
      lit("424D"),                    // "BM"
      leHex(imageSize + DataOff, 4),  // file size
      lit("00000000"),                // reserved
      leHex(lit(DataOff), 4),         // pixel-array offset 1078
      leHex(lit(40), 4),              // info-header size
      leHex(w, 4),
      leHex(h, 4),                    // positive: bottom-up rows
      leHex(lit(1), 2),               // planes
      leHex(lit(8), 2),               // bpp
      leHex(lit(1), 4),               // BI_RLE8
      leHex(imageSize, 4),
      leHex(lit(2835), 4),            // 72 dpi
      leHex(lit(2835), 4),
      leHex(lit(256), 4),             // colors used
      leHex(lit(0), 4))
    unhex(concat(header, lit(GrayPaletteHex), bodyHex))
  }

  /** Decoded pixel width. */
  def width(payload: Column): Column = le32AtOff(payload, 19)

  /** Decoded pixel height. */
  def height(payload: Column): Column = le32AtOff(payload, 23)

  /** Decoded pixel count (w·h). */
  def numPixels(payload: Column): Column = width(payload) * height(payload)

  /** Encoded command-stream byte count (the header's imageSize). */
  private def imageSize(payload: Column): Column = le32AtOff(payload, 35)

  private def byteAt(dh: Column, off: Column): Column =
    conv(dh.substr(off * 2 + 1, lit(2)), 16, 10).cast("int")

  /** TRUE iff the payload is the exact canonical form this codec
    * produces: the header scalar block (offset 1078, info 40, planes 1,
    * bpp 8, compression BI_RLE8, 256 colors), the length equation
    * (1078 + imageSize), and a FULL command-stream validation — every
    * command a positive run, an EOL landing exactly at width, or one
    * final EOB after all h rows closed; run totals reconciled row by
    * row. Anything else (truncation, concatenation, absolute/delta
    * commands, short rows) fails shut to the opaque path. */
  def isRle8(payload: Column): Column = {
    val w = width(payload)
    val h = height(payload)
    val isz = imageSize(payload)
    val dh = hex(payload)
    val nCmds = (isz / 2).cast("long")
    val structural = aggregate(
      sequence(lit(0L), nCmds - 1, lit(1L)),
      struct(lit(true).as("ok"), lit(false).as("ended"),
        lit(0L).as("s"), lit(0L).as("x")),
      (st, k) => {
        val off = lit(DataOff) + k * 2
        val cnt = byteAt(dh, off)
        val v = byteAt(dh, off + 1)
        val ok = st.getField("ok")
        val s = st.getField("s")
        val x = st.getField("x")
        when(!ok || st.getField("ended"),
          struct((ok && !st.getField("ended")).as("ok"),
            st.getField("ended").as("ended"), s.as("s"), x.as("x")))
          .when(cnt > 0, // encoded run inside the current row
            struct((ok && x + cnt <= w && s < h).as("ok"),
              lit(false).as("ended"), s.as("s"), (x + cnt).as("x")))
          .when(v === 0, // EOL: the row must close exactly at width
            struct((ok && x === w).as("ok"), lit(false).as("ended"),
              (s + 1).as("s"), lit(0L).as("x")))
          .when(v === 1, // EOB: all rows closed, nothing after
            struct((ok && s === h && x === 0 &&
              k === nCmds - 1).as("ok"),
              lit(true).as("ended"), s.as("s"), x.as("x")))
          .otherwise( // delta / absolute mode: not canonical
            struct(lit(false).as("ok"), st.getField("ended").as("ended"),
              s.as("s"), x.as("x")))
      },
      st => st.getField("ok") && st.getField("ended"))
    length(payload) >= 1080 &&
      hex(substring(payload, 1, 2)) === "424D" &&
      hex(substring(payload, 11, 8)) === "3604000028000000" &&
      hex(substring(payload, 27, 8)) === "0100080001000000" &&
      hex(substring(payload, 47, 4)) === "00010000" &&
      w >= 0 && h >= 0 &&
      length(payload).cast("long") === lit(DataOff) + isz &&
      pmod(isz, lit(2)) === 0 && isz >= 2 &&
      structural
  }

  /** Packed 0xRRGGBB of palette index `v` straight from the payload's
    * palette block. */
  private def paletteRgb(dh: Column, v: Column): Column = {
    val pal = lit(54L) + v.cast("long") * 4 // 0-based offset of B
    (byteAt(dh, pal + 2) * 65536 + byteAt(dh, pal + 1) * 256 +
      byteAt(dh, pal)).cast("int")
  }

  /** Decoded pixels as row-major TOP-DOWN packed 0xRRGGBB ints — ONE
    * scan over the command stream accumulating stored (bottom-up) rows
    * of palette-resolved runs, flipped to logical order in the fold's
    * finish. Empty images decode to the empty array. */
  def pixels(payload: Column): Column = {
    val dh = hex(payload)
    val nCmds = (imageSize(payload) / 2).cast("long")
    when(numPixels(payload) > 0,
      aggregate(
        sequence(lit(0L), nCmds - 1, lit(1L)),
        struct(typedLit(Seq.empty[Seq[Int]]).as("rows"),
          typedLit(Seq.empty[Int]).as("cur")),
        (st, k) => {
          val off = lit(DataOff) + k * 2
          val cnt = byteAt(dh, off)
          val v = byteAt(dh, off + 1)
          when(cnt > 0,
            struct(st.getField("rows").as("rows"),
              concat(st.getField("cur"),
                array_repeat(paletteRgb(dh, v), cnt)).as("cur")))
            .when(v === 0, // EOL closes the stored row
              struct(concat(st.getField("rows"),
                array(st.getField("cur"))).as("rows"),
                typedLit(Seq.empty[Int]).as("cur")))
            .otherwise(st) // EOB
        },
        st => flatten(reverse(st.getField("rows")))))
      .otherwise(typedLit(Seq.empty[Int]))
  }

  /** Shared single-pass pooling scan: fold run-overlap luminance
    * contributions into all `k` cells (cell j covers LOGICAL pixel
    * range [⌊j·n/k⌋, ⌊(j+1)·n/k⌋) — [[BmpCodec]]'s partition rule
    * bit-for-bit, so container invariance holds through the
    * dispatcher), then emit the finished cell array from the fold's
    * finish lambda via `emit(sums, lens)` — one command-stream pass,
    * no k× re-decode. A run at stored (row s, col x..x+cnt) occupies
    * the CONTIGUOUS logical range [(h−1−s)·w + x, +cnt), so its
    * overlap with each cell is a two-sided clamp. */
  private def cellScan(payload: Column, k: Int,
      emit: (Column, Int, Column) => Column): Column = {
    val w = width(payload)
    val h = height(payload)
    val n = numPixels(payload)
    val dh = hex(payload)
    val nCmds = (imageSize(payload) / 2).cast("long")
    aggregate(
      sequence(lit(0L), nCmds - 1, lit(1L)),
      struct(array_repeat(lit(0L), k).as("sums"),
        lit(0L).as("s"), lit(0L).as("x")),
      (st, kk) => {
        val off = lit(DataOff) + kk * 2
        val cnt = byteAt(dh, off).cast("long")
        val v = byteAt(dh, off + 1)
        val s = st.getField("s")
        val x = st.getField("x")
        val pal = lit(54L) + v.cast("long") * 4
        val lum = (byteAt(dh, pal) + byteAt(dh, pal + 1) +
          byteAt(dh, pal + 2)).cast("long")
        val ls = (h - 1 - s) * w + x // logical start of the run
        val le = ls + cnt
        val bumped = transform(sequence(lit(0), lit(k - 1)), j0 => {
          val cs = floor(j0 * n / lit(k)).cast("long")
          val ce = floor((j0 + 1) * n / lit(k)).cast("long")
          element_at(st.getField("sums"), (j0 + 1).cast("int")) +
            greatest(lit(0L), least(le, ce) - greatest(ls, cs)) * lum
        })
        when(cnt > 0,
          struct(bumped.as("sums"), s.as("s"), (x + cnt).as("x")))
          .when(v === 0,
            struct(st.getField("sums").as("sums"), (s + 1).as("s"),
              lit(0L).as("x")))
          .otherwise(struct(st.getField("sums").as("sums"), s.as("s"),
            x.as("x")))
      },
      st => emit(st.getField("sums"), k, n))
  }

  /** 4 real image features (block mean luminance in [0,1), 6 dp) —
    * the [[BmpCodec.bmpFeatures]] contract for the RLE8 branch of
    * [[Multimodal.decodeFeatures]]. */
  def rle8Features(payload: Column): Column =
    cellScan(payload, 4, (sums, k, n) =>
      transform(sequence(lit(0), lit(k - 1)), j => {
        val start = floor(j * n / lit(k)).cast("long")
        val end = floor((j + 1) * n / lit(k)).cast("long")
        when(end > start,
          round(element_at(sums, (j + 1).cast("int")).cast("double") /
            ((end - start).cast("double") * 765.0), 6))
          .otherwise(lit(0.0))
      }))

  /** Block-mean pooling of the decoded luminance grid down to `k`
    * cells — [[BmpCodec.resizePooledPixels]]'s contract (same
    * partition rule, NULL-for-empty-cell convention, 6-dp determinism)
    * for the RLE8 branch of [[Multimodal.pooledProfile]], in ONE
    * command-stream pass. */
  def resizePooledPixels(payload: Column, k: Int): Column =
    cellScan(payload, k, (sums, kk, n) =>
      transform(sequence(lit(0), lit(kk - 1)), j => {
        val start = floor(j * n / lit(kk)).cast("long")
        val end = floor((j + 1) * n / lit(kk)).cast("long")
        when(end > start,
          round(element_at(sums, (j + 1).cast("int")).cast("double") /
            ((end - start).cast("double") * 3.0),
            Multimodal.pooledRoundDp))
      }))
}
