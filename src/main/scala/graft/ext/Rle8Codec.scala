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
  * FULL BI_RLE8 command set (r13 VERDICT #5 — mode-2 files are common
  * in the wild): 2-byte encoded runs `(count 1..255, palette index)`,
  * end-of-line `00 00`, one end-of-bitmap `00 01` as the final
  * command, ABSOLUTE runs `00 n b1..bn [pad]` (n ≥ 3 literal palette
  * indices, padded to a word boundary when n is odd), and DELTA
  * `00 02 dx dy` (position jumps right dx, up dy stored rows).
  * Pixels a command stream never writes — the tail of an early-closed
  * row, rows and columns a delta skips, everything after an early
  * EOB — decode as PALETTE INDEX 0, the universal decoder convention
  * for BI_RLE8's "undefined" cells (a freshly zeroed target buffer),
  * so decode is total and deterministic. [[isRle8]] remains a FULL
  * structural validation, fail-shut on everything malformed: runs or
  * absolute blocks overflowing their row, deltas jumping out of the
  * bitmap, truncated absolute data or delta arguments, a missing or
  * non-final EOB, and any length-equation mismatch fall through to
  * the opaque byte-grid path rather than half-decoding.
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
    assembleHex(w, h, bodyHex)
  }

  /** Header + grayscale palette + command stream → complete file. */
  private def assembleHex(w: Column, h: Column, bodyHex: Column): Column = {
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

  /** Deterministic MODE-2 encoder fixture (requires w ≥ 7, h ≥ 2):
    * exercises every non-canonical command on content whose decode is
    * formula-predictable. The stream opens with a VERTICAL delta
    * `00 02 00 01` (stored row 0 — the logical BOTTOM row — is never
    * written: index-0 fill), then every remaining stored row is
    * `00 03 g g g 00` (absolute block of cols 0-2, odd count → pad) ·
    * `00 02 02 00` (horizontal delta skipping cols 3-4) · encoded runs
    * of cols 5..w-2 · early EOL (col w-1 left to the fill), and one
    * EOB. Decode therefore equals the generator on written cells and
    * palette index 0 on skipped ones — the mode-2 roundtrip the
    * registered `ext_rle8_mode2_roundtrip` hash-gates against a DuckDB
    * replay of both the pixel map and the command-structure length
    * equation. */
  def encodeRle8Mode2(grays: Column, w: Column, h: Column): Column = {
    def b(v: Column) = beHex(v.cast("long"), 1)
    def rowHex(s: Column): Column = {
      val r = h - 1 - s // stored row s holds logical row h-1-s
      def g(c: Column) = element_at(grays, (r * w + c + 1).cast("int"))
      val absBlock = concat(lit("0003"), b(g(lit(0))), b(g(lit(1))),
        b(g(lit(2))), lit("00"))
      val flush = (st: Column) =>
        when(st.getField("n") > 0,
          concat(b(st.getField("n")), b(st.getField("cur"))))
          .otherwise(lit(""))
      val runs = aggregate(
        sequence(lit(5), w - 2, lit(1)),
        struct(lit("").as("out"), lit(-1).as("cur"), lit(0).as("n")),
        (st, c) => {
          val v = g(c)
          when(st.getField("n") > 0 && v === st.getField("cur") &&
              st.getField("n") < 255,
            struct(st.getField("out").as("out"),
              st.getField("cur").as("cur"),
              (st.getField("n") + 1).as("n")))
            .otherwise(struct(
              concat(st.getField("out"), flush(st)).as("out"),
              v.as("cur"), lit(1).as("n")))
        },
        st => concat(st.getField("out"), flush(st)))
      concat(absBlock, lit("00020200"), runs, lit("0000"))
    }
    val bodyHex = concat(
      lit("00020001"), // vertical delta: skip stored row 0 entirely
      array_join(transform(sequence(lit(1), h - 1, lit(1)), rowHex(_)), ""),
      lit("0001"))
    assembleHex(w, h, bodyHex)
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

  /** TRUE iff the payload is a structurally sound BI_RLE8 file: the
    * header scalar block (offset 1078, info 40, planes 1, bpp 8,
    * compression BI_RLE8, 256 colors), the length equation
    * (1078 + imageSize), and a FULL command-stream validation over the
    * complete command set — encoded runs and absolute blocks must fit
    * their row, deltas must land inside the bitmap, absolute data and
    * delta arguments must fit the stream, and exactly one EOB must be
    * the final command. Rows MAY close early and rows may be skipped
    * (their unwritten pixels decode as palette index 0 — the BI_RLE8
    * "undefined cell" convention); anything malformed (truncation,
    * concatenation, overflowing runs, out-of-bounds deltas) fails
    * shut to the opaque path.
    *
    * The scan is BYTE-indexed (commands are variable-length once
    * absolute mode exists): `skip` consumes bytes already accounted
    * for (a command's second byte, delta arguments, the absolute pad)
    * and `rem` counts literal data bytes still owed to an open
    * absolute block. */
  def isRle8(payload: Column): Column = {
    val w = width(payload).cast("long")
    val h = height(payload).cast("long")
    val isz = imageSize(payload).cast("long")
    val dh = hex(payload)
    val structural = aggregate(
      sequence(lit(0L), isz - 1, lit(1L)),
      struct(lit(true).as("ok"), lit(false).as("ended"),
        lit(0L).as("s"), lit(0L).as("x"),
        lit(0L).as("rem"), lit(0L).as("pd"), lit(0L).as("skip")),
      (st, k) => {
        val off = lit(DataOff) + k
        val ok = st.getField("ok")
        val ended = st.getField("ended")
        val s = st.getField("s")
        val x = st.getField("x")
        val rem = st.getField("rem")
        val pd = st.getField("pd")
        val skip = st.getField("skip")
        def keep(okNow: Column, endedNow: Column, sN: Column, xN: Column,
            remN: Column, pdN: Column, skipN: Column) =
          struct(okNow.as("ok"), endedNow.as("ended"), sN.as("s"),
            xN.as("x"), remN.as("rem"), pdN.as("pd"), skipN.as("skip"))
        val cnt = byteAt(dh, off)
        val v = byteAt(dh, off + 1)
        when(!ok, keep(lit(false), ended, s, x, rem, pd, skip))
          .when(skip > 0, // byte already accounted for by its command
            keep(ok, ended, s, x, rem, pd, skip - 1))
          .when(ended, // EOB must be final — any live byte after fails
            keep(lit(false), ended, s, x, rem, pd, skip))
          .when(rem > 0, // literal data byte of an open absolute block
            keep(ok, ended, s, x + 1, rem - 1,
              when(rem === 1, lit(0L)).otherwise(pd),
              when(rem === 1, pd).otherwise(lit(0L))))
          .when(k === isz - 1, // command start with no second byte
            keep(lit(false), ended, s, x, rem, pd, skip))
          .when(cnt > 0, // encoded run inside the current row
            keep(ok && x + cnt <= w && s < h, lit(false),
              s, x + cnt, lit(0L), lit(0L), lit(1L)))
          .when(v === 0, // EOL — early close allowed (tail = index 0)
            keep(ok && s < h, lit(false), s + 1, lit(0L),
              lit(0L), lit(0L), lit(1L)))
          .when(v === 1, // EOB: must consume the last two bytes
            keep(ok && k === isz - 2, lit(true), s, x,
              lit(0L), lit(0L), lit(1L)))
          .when(v === 2, // delta: args present, target inside bitmap
            keep(ok && k + 3 <= isz - 1 &&
                x + coalesce(byteAt(dh, off + 2), lit(0)) <= w &&
                s + coalesce(byteAt(dh, off + 3), lit(0)) < h,
              lit(false), s + coalesce(byteAt(dh, off + 3), lit(0)),
              x + coalesce(byteAt(dh, off + 2), lit(0)),
              lit(0L), lit(0L), lit(3L)))
          .otherwise( // absolute block: v >= 3 literals (+ odd pad)
            keep(ok && s < h && x + v <= w &&
                k + 1 + v + pmod(v, lit(2)) <= isz - 1,
              lit(false), s, x, v.cast("long"),
              pmod(v, lit(2)).cast("long"), lit(1L)))
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
    * byte-indexed scan over the command stream accumulating stored
    * (bottom-up) rows of palette-resolved runs, absolute literals, and
    * index-0 fills for everything a command never writes (early-EOL
    * tails, delta skips, post-EOB remainder), flipped to logical order
    * in the fold's finish. Empty images decode to the empty array. */
  def pixels(payload: Column): Column = {
    val w = width(payload).cast("int")
    val h = height(payload).cast("int")
    val dh = hex(payload)
    val isz = imageSize(payload).cast("long")
    val zero = paletteRgb(dh, lit(0))
    def padRow(cur: Column) =
      concat(cur, array_repeat(zero, greatest(lit(0), w - size(cur))))
    val zeroRow = array_repeat(zero, w)
    when(numPixels(payload) > 0,
      aggregate(
        sequence(lit(0L), isz - 1, lit(1L)),
        struct(typedLit(Seq.empty[Seq[Int]]).as("rows"),
          typedLit(Seq.empty[Int]).as("cur"),
          lit(0L).as("rem"), lit(0L).as("pd"), lit(0L).as("skip")),
        (st, k) => {
          val off = lit(DataOff) + k
          val rows = st.getField("rows")
          val cur = st.getField("cur")
          val rem = st.getField("rem")
          val pd = st.getField("pd")
          val skip = st.getField("skip")
          def keep(rowsN: Column, curN: Column, remN: Column,
              pdN: Column, skipN: Column) =
            struct(rowsN.as("rows"), curN.as("cur"), remN.as("rem"),
              pdN.as("pd"), skipN.as("skip"))
          val cnt = byteAt(dh, off)
          val v = byteAt(dh, off + 1)
          when(skip > 0, keep(rows, cur, rem, pd, skip - 1))
            .when(rem > 0, // literal byte of an open absolute block
              keep(rows, concat(cur, array(paletteRgb(dh, cnt))),
                rem - 1, when(rem === 1, lit(0L)).otherwise(pd),
                when(rem === 1, pd).otherwise(lit(0L))))
            .when(cnt > 0, // encoded run
              keep(rows, concat(cur, array_repeat(paletteRgb(dh, v), cnt)),
                lit(0L), lit(0L), lit(1L)))
            .when(v === 0, // EOL: zero-fill the tail, close the row
              keep(concat(rows, array(padRow(cur))),
                typedLit(Seq.empty[Int]), lit(0L), lit(0L), lit(1L)))
            .when(v === 1, // EOB: zero-fill everything left
              keep(concat(rows,
                  when(size(rows) < h, concat(array(padRow(cur)),
                    array_repeat(zeroRow,
                      greatest(lit(0), h - size(rows) - 1))))
                    .otherwise(typedLit(Seq.empty[Seq[Int]]))),
                typedLit(Seq.empty[Int]), lit(0L), lit(0L), lit(1L)))
            .when(v === 2, { // delta: zero-fill the skipped region
              val dx = coalesce(byteAt(dh, off + 2), lit(0))
              val dy = coalesce(byteAt(dh, off + 3), lit(0))
              keep(
                when(dy > 0, concat(rows, array(padRow(cur)),
                    array_repeat(zeroRow, dy - 1)))
                  .otherwise(rows),
                when(dy > 0, array_repeat(zero, size(cur) + dx))
                  .otherwise(concat(cur, array_repeat(zero, dx))),
                lit(0L), lit(0L), lit(3L))
            })
            .otherwise( // absolute block header: open it
              keep(rows, cur, v.cast("long"),
                pmod(v, lit(2)).cast("long"), lit(1L)))
        },
        st => flatten(reverse(st.getField("rows")))))
      .otherwise(typedLit(Seq.empty[Int]))
  }

  /** Shared single-pass pooling scan: fold luminance contributions
    * into all `k` cells (cell j covers LOGICAL pixel range
    * [⌊j·n/k⌋, ⌊(j+1)·n/k⌋) — [[BmpCodec]]'s partition rule
    * bit-for-bit, so container invariance holds through the
    * dispatcher), then emit the finished cell array from the fold's
    * finish lambda — one command-stream pass, no k× re-decode.
    *
    * Contributions come as STORED-contiguous regions: an encoded run
    * or a literal byte is one single-row piece; the index-0 fills
    * (early-EOL tails, delta skips, post-EOB remainder) may span
    * stored rows, so [[bumpRegion]] walks the touched rows (inner
    * aggregate, bounded by the fill's row span) and clamps each row's
    * logical piece against every cell — fills are rare and row spans
    * short, so the scan stays O(commands · k + fillRows · k). */
  private def cellScan(payload: Column, k: Int,
      emit: (Column, Int, Column) => Column): Column = {
    val w = width(payload).cast("long")
    val h = height(payload).cast("long")
    val n = numPixels(payload)
    val dh = hex(payload)
    val isz = imageSize(payload).cast("long")
    def lumOf(v: Column) = {
      val pal = lit(54L) + v.cast("long") * 4
      (byteAt(dh, pal) + byteAt(dh, pal + 1) +
        byteAt(dh, pal + 2)).cast("long")
    }
    val lum0 = lumOf(lit(0))
    // add `lv` per pixel over the STORED-flat region [p0, p0+len) —
    // split per stored row r, each mapping to the logical piece
    // [(h-1-r)·w + colStart, +pieceLen), clamped against every cell
    def bumpRegion(sums: Column, p0: Column, len: Column,
        lv: Column): Column =
      when(len > 0 && lv =!= 0L,
        aggregate(
          sequence(floor(p0 / w).cast("long"),
            floor((p0 + len - 1) / w).cast("long"), lit(1L)),
          sums,
          (acc, r) => {
            val c0 = greatest(p0, r * w)
            val c1 = least(p0 + len, (r + 1) * w)
            val ls = (h - 1 - r) * w + (c0 - r * w)
            val le = ls + (c1 - c0)
            transform(sequence(lit(0), lit(k - 1)), j0 => {
              val cs = floor(j0 * n / lit(k)).cast("long")
              val ce = floor((j0 + 1) * n / lit(k)).cast("long")
              element_at(acc, (j0 + 1).cast("int")) +
                greatest(lit(0L), least(le, ce) - greatest(ls, cs)) * lv
            })
          }))
        .otherwise(sums)
    aggregate(
      sequence(lit(0L), isz - 1, lit(1L)),
      struct(array_repeat(lit(0L), k).as("sums"),
        lit(0L).as("s"), lit(0L).as("x"),
        lit(0L).as("rem"), lit(0L).as("pd"), lit(0L).as("skip")),
      (st, kk) => {
        val off = lit(DataOff) + kk
        val sums = st.getField("sums")
        val s = st.getField("s")
        val x = st.getField("x")
        val rem = st.getField("rem")
        val pd = st.getField("pd")
        val skip = st.getField("skip")
        def keep(sumsN: Column, sN: Column, xN: Column, remN: Column,
            pdN: Column, skipN: Column) =
          struct(sumsN.as("sums"), sN.as("s"), xN.as("x"),
            remN.as("rem"), pdN.as("pd"), skipN.as("skip"))
        val cnt = byteAt(dh, off).cast("long")
        val v = byteAt(dh, off + 1)
        val pos = s * w + x
        when(skip > 0, keep(sums, s, x, rem, pd, skip - 1))
          .when(rem > 0, // literal pixel of an open absolute block
            keep(bumpRegion(sums, pos, lit(1L), lumOf(byteAt(dh, off))),
              s, x + 1, rem - 1,
              when(rem === 1, lit(0L)).otherwise(pd),
              when(rem === 1, pd).otherwise(lit(0L))))
          .when(cnt > 0, // encoded run
            keep(bumpRegion(sums, pos, cnt, lumOf(v)),
              s, x + cnt, lit(0L), lit(0L), lit(1L)))
          .when(v === 0, // EOL: index-0 fill of the row tail
            keep(bumpRegion(sums, pos, w - x, lum0),
              s + 1, lit(0L), lit(0L), lit(0L), lit(1L)))
          .when(v === 1, // EOB: index-0 fill of everything left
            keep(bumpRegion(sums, pos, h * w - pos, lum0),
              h, lit(0L), lit(0L), lit(0L), lit(1L)))
          .when(v === 2, { // delta: index-0 fill of the skipped region
            val dx = coalesce(byteAt(dh, off + 2), lit(0)).cast("long")
            val dy = coalesce(byteAt(dh, off + 3), lit(0)).cast("long")
            keep(bumpRegion(sums, pos, dy * w + dx, lum0),
              s + dy, x + dx, lit(0L), lit(0L), lit(3L))
          })
          .otherwise( // absolute block header: open it
            keep(sums, s, x, v.cast("long"),
              pmod(v, lit(2)).cast("long"), lit(1L)))
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
