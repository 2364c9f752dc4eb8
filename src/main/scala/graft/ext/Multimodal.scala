package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2.10): image/audio/video payloads
  * as opaque `binary` columns with typed metadata, plus batched
  * feature-extraction plumbing.
  *
  * The decode step is STUBBED (this container has no image/audio codecs):
  * [[fakeDecodeFeatures]] derives deterministic pseudo-features from the
  * payload's md5, so the Spark-side contract — schema, binary columns,
  * partition-batched extraction, pushdown-friendly metadata — is real and
  * tested while the codec call is a marked substitution point.
  *
  * Scale notes: payloads stay opaque binary end-to-end (no driver
  * collection); metadata columns (byte_len, digest, mime) are split out so
  * filters prune on cheap columns without touching payload bytes — at
  * 100 TB that is the difference between scanning kilobyte metadata and
  * petabyte payloads. Batched extraction mirrors Arrow-batch UDF shape:
  * partition-iterator in, partition-iterator out, constant memory.
  */
object Multimodal {

  /** Wrap a text column as a fake binary payload (testdata has no real
    * media; the plumbing is payload-agnostic). */
  def asPayload(c: Column): Column = c.cast("binary")

  /** Metadata projection over a binary payload: byte length, md5 digest,
    * sniffed mime tag, and a hex preview of the leading bytes. */
  def withPayloadMeta(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("byte_len", length(col(payloadCol)))
      .withColumn("digest", md5(col(payloadCol)))
      .withColumn("head_hex", lower(hex(substring(col(payloadCol), 1, 4))))

  /** "Frame sampling": fixed-stride byte slices of the payload — the shape
    * of video frame extraction without a codec. Returns an array of binary
    * chunks. */
  def sampleChunks(payload: Column, chunkLen: Int, stride: Int,
      maxChunks: Int): Column =
    transform(sequence(lit(0), lit(maxChunks - 1)),
      i => payload.substr(i * lit(stride) + lit(1), lit(chunkLen)))

  /** Frame-sampled payload exploded to per-frame ROWS — the fan-out shape
    * a video pipeline feeds downstream (one row per sampled frame, with
    * its index, digest, and stub features). Chunks shorter than
    * `chunkLen` at the payload tail are kept (the "last frame"); empty
    * ones beyond the end are dropped. Pure projections + one
    * `posexplode` — the fan-out multiplies rows, never bytes on the
    * driver. */
  def explodeFrames(df: DataFrame, idCol: String, payloadCol: String,
      chunkLen: Int, stride: Int, maxChunks: Int): DataFrame =
    df.select(col(idCol),
        posexplode(sampleChunks(col(payloadCol), chunkLen, stride, maxChunks))
          .as(Seq("frame_idx", "frame")))
      .filter(length(col("frame")) > 0)
      .select(col(idCol), col("frame_idx"),
        md5(col("frame")).as("frame_digest"),
        decodeFeatures(col("frame")).as("frame_features"))

  /** STUB decode → feature vector: 4 deterministic doubles in [0,1) derived
    * from md5 of the payload (substitute a real codec here in production;
    * the signature — binary in, fixed-width double array out — is the
    * real contract). Pure Catalyst expression, so the "decode" runs
    * codegen'd per partition with no driver involvement, exactly where a
    * JNI codec call would sit. */
  def fakeDecodeFeatures(payload: Column): Column = {
    val h = md5(payload)
    array((0 until 4).map { i =>
      round(conv(substring(h, i * 8 + 1, 8), 16, 10).cast("double")
        / lit(4294967296.0), 6)
    }: _*)
  }

  /** Decode dispatcher — the FORMAT TAG in front of the stub: payloads
    * in a really-parseable public fixed layout decode for REAL
    * (WAV/PCM via [[WavCodec.waveFeatures]] — actual waveform block
    * energies; 24-bit BMP via [[BmpCodec.bmpFeatures]] — actual pixel
    * block luminances); everything else falls through to the
    * [[fakeDecodeFeatures]] substitution point. Same signature (binary
    * in, 4 doubles in [0,1) out), so every consumer of the stub gains
    * the real path by swapping this in — a production build adds
    * `when(isJpeg…)`/`when(isFlac…)` arms here, around unchanged
    * plumbing. */
  def decodeFeatures(payload: Column): Column =
    when(WavCodec.isWav(payload), WavCodec.waveFeatures(payload))
      .when(BmpCodec.isBmp(payload), BmpCodec.bmpFeatures(payload))
      .when(PpmCodec.isPpm(payload), PpmCodec.ppmFeatures(payload))
      .when(PgmCodec.isPgm(payload), PgmCodec.pgmFeatures(payload))
      .when(Rle8Codec.isRle8(payload), Rle8Codec.rle8Features(payload))
      .otherwise(fakeDecodeFeatures(payload))

  /** Pooled-profile dispatcher for the perceptual hashes: a payload in
    * a decodable image format pools its DECODED luminance grid
    * ([[BmpCodec.resizePooledPixels]] — a perceptual fingerprint is
    * defined over pixels; raw-byte pooling would hash the header and
    * the row padding too), everything else keeps the byte-grid pooling
    * ([[resizePooled]], the honest profile for opaque payloads). Both
    * branches share the block-partition rule, the NULL-for-empty-cell
    * convention, and the 6-dp determinism argument, so consumers are
    * branch-agnostic. CaseWhen evaluates lazily per row — a non-BMP
    * row never pays the pixel decode. */
  def pooledProfile(payload: Column, k: Int): Column =
    when(BmpCodec.isBmp(payload), BmpCodec.resizePooledPixels(payload, k))
      .when(PpmCodec.isPpm(payload), PpmCodec.resizePooledPixels(payload, k))
      .when(PgmCodec.isPgm(payload), PgmCodec.resizePooledPixels(payload, k))
      .when(Rle8Codec.isRle8(payload),
        Rle8Codec.resizePooledPixels(payload, k))
      .otherwise(resizePooled(payload, k))

  /** Decimal places [[resizePooled]] rounds each cell mean to. The
    * fixed-point rendering in ExtQueries (`round(v·10^dp)`) is exact ONLY
    * because cells are pre-rounded to this scale — a coarser inner scale
    * could put `v·10^dp` on a .5 tie where Spark/DuckDB final rounds
    * diverge. Both sides (and the oracle SQL) derive from this constant,
    * so changing it breaks loudly instead of as a 1-ulp oracle drift. */
  val pooledRoundDp = 6

  /** 10^[[pooledRoundDp]], the matching fixed-point scale. */
  val pooledFpScale: Long = math.pow(10.0, pooledRoundDp).toLong

  /** "Resize" — block-mean pooling of the payload's byte grid down to
    * `k` buckets (the 1-D shape of image downsampling: average each
    * block of source samples into one target cell; a real codec path
    * would pool decoded pixels instead of raw bytes, around the same
    * plumbing). Bucket j covers byte positions
    * [floor(j·n/k), floor((j+1)·n/k)) — the standard partition, exact
    * for any n/k ratio. Buckets with no bytes (payload shorter than k)
    * are NULL.
    *
    * Pure codegen HOF projection, no shuffle. Determinism: byte values
    * are exact small ints, block sums are exact in doubles, and the
    * mean's divisor is ≤ the block length — a 7th-decimal rounding tie
    * is impossible for denominators this small (2^a·5^b with a,b ≤ 6),
    * so the 6-dp round is engine-identical. */
  def resizePooled(payload: Column, k: Int): Column = {
    val hx = hex(payload)
    val n = length(payload)
    transform(sequence(lit(0), lit(k - 1)), j => {
      val start = floor(j * n / lit(k)).cast("int")
      val end = floor((j + 1) * n / lit(k)).cast("int")
      val block = transform(sequence(start, end - 1),
        p => conv(hx.substr(p * 2 + 1, lit(2)), 16, 10).cast("double"))
      when(end > start,
        round(aggregate(block, lit(0.0), (acc, x) => acc + x)
          / (end - start).cast("double"), pooledRoundDp))
    })
  }

  /** Perceptual hash (aHash family) over an opaque payload: the
    * [[resizePooled]] k-cell block-mean profile, thresholded into one
    * bit per cell, packed MSB-first into a long. The threshold is the
    * GLOBAL byte mean (an exact integer sum / n — bit-identical on any
    * engine), not the textbook mean-of-cells: cell means are 6-dp
    * doubles whose 16-element float sum would be fold-order-dependent,
    * while the integer byte total is order-free. Same invariance
    * properties (brightness profile), deterministic everywhere.
    *
    * Near-identical payloads (crops, re-encodes, small edits in the
    * stub's byte-level analogue) differ in few cells → small Hamming
    * distance between hashes. Empty payloads hash to 0 (the Spark
    * `sequence(1, 0)` DESCENDING pitfall is guarded). Pure codegen'd
    * projection — no shuffle, no UDF. */
  def perceptualHash(payload: Column, k: Int = 16): Column = {
    val hx = hex(payload)
    val n = length(payload)
    val byteTotal = aggregate(
      transform(sequence(lit(1), n),
        p => conv(hx.substr(p * 2 - 1, lit(2)), 16, 10).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val thr = round(byteTotal / n.cast("double"), 6)
    val pooled = resizePooled(payload, k)
    val bits = transform(sequence(lit(0), lit(k - 1)),
      j => when(element_at(pooled, j + 1) >= thr,
        pow(lit(2.0), lit((k - 1).toDouble) - j).cast("long"))
        .otherwise(lit(0L)))
    when(n > 0, aggregate(bits, lit(0L), (acc, x) => acc + x))
      .otherwise(lit(0L))
  }

  /** Multimodal near-dup candidate pairs by perceptual hash: band the
    * k-bit hash into two halves, self-join on either half (a pair
    * within Hamming ≤ k/2−1 of a half must agree exactly on the other
    * half — the pigeonhole guarantee for distance ≤ maxHamming < k/2
    * whenever one band stays clean), verify `bit_count(xor) ≤
    * maxHamming` on candidates only. The SimHash banding argument
    * applied to payload bytes instead of token sets.
    *
    * Scale: the join keys on (band index, band value) — bucketed
    * equi-join, never all-pairs; verification touches only collisions.
    * Same shape as the MinHash/SimHash pair miners. */
  def phashPairs(df: DataFrame, idCol: String, payloadCol: String,
      k: Int = 16, maxHamming: Int = 3): DataFrame = {
    val sig = graft.ops.CacheScope.persist(
      df.select(col(idCol).cast("long").as("id"),
        perceptualHash(col(payloadCol), k).as("ph")))
    val bands = sig.select(col("id"), col("ph"),
        explode(array(
          struct(lit(0).as("band"), shiftright(col("ph"), k / 2).as("bv")),
          struct(lit(1).as("band"),
            col("ph").bitwiseAND(lit((1L << (k / 2)) - 1)).as("bv"))))
          .as("b"))
      .select(col("id"), col("ph"), col("b.band"), col("b.bv"))
    val a = bands.select(col("id").as("id_a"), col("ph").as("ph_a"),
      col("band"), col("bv"))
    val b = bands.select(col("id").as("id_b"), col("ph").as("ph_b"),
      col("band"), col("bv"))
    a.join(b, Seq("band", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("ph_a"), col("ph_b")).distinct()
      .select(col("id_a"), col("id_b"),
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** dHash band values from a pre-bound pooled cell-mean array: the
    * GRADIENT-SIGN perceptual hash (difference hash — the LAION-style
    * image-dedup fingerprint), computed over `bands·bandBits + 1`
    * block means so each of the `bands·bandBits` bits is
    * `mean(cell g+1) > mean(cell g)`. Gradient signs are invariant to
    * global brightness shifts that move every cell mean equally —
    * the failure mode of [[perceptualHash]]'s absolute threshold —
    * which is why dHash is the standard re-encode-robust variant.
    *
    * Bits are grouped directly into `bands` band VALUES (bandBits bits
    * each, MSB-first Horner fold), because the banded Hamming join
    * needs exactly those; the full fingerprint is their concatenation.
    * Keeping every value ≤ 2^bandBits−1 also sidesteps the 64-bit
    * sign bit that a single packed long would put in play on both
    * engines. NULL cells (payload shorter than the grid) read as 0.
    *
    * `pooled` MUST be a bound column (a projected [[resizePooled]]
    * result), not an inline expression: the lambda indexes it
    * 2·bands·bandBits times, and an inline tree would re-evaluate the
    * whole pooling per access. Pure codegen HOF projection. */
  def dHashBandsFromPooled(pooled: Column, bands: Int,
      bandBits: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      aggregate(
        sequence(b * lit(bandBits), (b + lit(1)) * lit(bandBits) - 1),
        lit(0L),
        (acc, g) => acc * lit(2L) + when(
          coalesce(element_at(pooled, g + 2), lit(0.0)) >
            coalesce(element_at(pooled, g + 1), lit(0.0)),
          lit(1L)).otherwise(lit(0L))))

  /** Perceptual near-dup pairs by dHash ([[dHashBandsFromPooled]]):
    * the multimodal image-dedup stage of a LAION-style corpus prep —
    * gradient-sign fingerprint, banded Hamming self-join. With
    * `bands` bands a pair within Hamming ≤ bands−1 must agree exactly
    * on at least one band (pigeonhole), so candidate generation is a
    * bucketed equi-join on (band index, band value) — never all-pairs
    * — and `maxHamming ≤ bands−1` keeps recall exact. Verification
    * (bit_count of per-band xors) touches only collisions.
    *
    * Scale: signature frame is id + bands longs (payload bytes never
    * cross the shuffle); persisted once, feeding both join sides.
    * Same candidate-bound shape as [[phashPairs]] and the
    * SimHash/MinHash pair miners. */
  def dHashPairs(df: DataFrame, idCol: String, payloadCol: String,
      bands: Int = 4, bandBits: Int = 16,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= bands - 1,
      s"pigeonhole recall guarantee needs maxHamming <= bands-1, " +
        s"got $maxHamming vs $bands bands")
    val k = bands * bandBits + 1
    val sig = graft.ops.CacheScope.persist(
      df.select(col(idCol).cast("long").as("id"),
          pooledProfile(col(payloadCol), k).as("_pooled"))
        .select(col("id"),
          dHashBandsFromPooled(col("_pooled"), bands, bandBits)
            .as("bvs")))
    val bandRows = sig.select(col("id"), col("bvs"),
      posexplode(col("bvs")).as(Seq("band", "bv")))
    val a = bandRows.select(col("id").as("id_a"), col("bvs").as("bvs_a"),
      col("band"), col("bv"))
    val b = bandRows.select(col("id").as("id_b"), col("bvs").as("bvs_b"),
      col("band"), col("bv"))
    a.join(b, Seq("band", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("bvs_a"), col("bvs_b"))
      .distinct()
      .select(col("id_a"), col("id_b"),
        aggregate(
          zip_with(col("bvs_a"), col("bvs_b"),
            (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
          lit(0L), (acc, x) => acc + x).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Exposure KEEP verdict for the image pipeline: a BMP payload keeps
    * iff neither its dark (luminance < 192 of 765) nor its bright
    * (≥ 576) pixel fraction exceeds half — the `ext_bmp_exposure_gate`
    * rule as a reusable predicate over DECODED pixels; a payload in no
    * decodable image format passes (no pixels to judge — the honest
    * fallback posture, and CaseWhen's lazy per-row evaluation means an
    * opaque row never pays the decode). Pure row-local projection. */
  def exposureKeep(payload: Column): Column = {
    def gate(px: Column): Column = {
      val lums = transform(px, p =>
        floor(p / 65536).cast("long")
          + pmod(floor(p / 256).cast("long"), lit(256))
          + pmod(p, lit(256)))
      val n = size(px).cast("long")
      val nDark = aggregate(lums, lit(0L),
        (a, l) => a + when(l < 192, lit(1L)).otherwise(lit(0L)))
      val nBright = aggregate(lums, lit(0L),
        (a, l) => a + when(l >= 576, lit(1L)).otherwise(lit(0L)))
      nDark * 2 <= n && nBright * 2 <= n
    }
    when(BmpCodec.isBmp(payload), gate(BmpCodec.pixels(payload)))
      .when(PpmCodec.isPpm(payload), gate(PpmCodec.pixels(payload)))
      .when(PgmCodec.isPgm(payload), gate(PgmCodec.pixels(payload)))
      .when(Rle8Codec.isRle8(payload), gate(Rle8Codec.pixels(payload)))
      .otherwise(lit(true))
  }

  /** END-TO-END image corpus pipeline — the corpusBuild pattern applied
    * to the multimodal column (r11 VERDICT #4): ONE call composing
    * format dispatch → exposure gate on DECODED pixels → dHash banded
    * near-dup pairs → connected components → keep-best (min id per
    * component), with a per-FORMAT funnel receipt, so the dispatcher's
    * routing is visible in OUTPUT (n_docs per format per stage), not
    * only in scaladoc: BMP rows ride the real decode
    * ([[BmpCodec.resizePooledPixels]] inside [[pooledProfile]]), while
    * payloads in no decodable format take the byte-grid fallback and
    * the funnel says so.
    *
    * Returns (kept, funnel): `kept` = (idCol, format) surviving rows;
    * `funnel` = (stage_ord, stage, format, n_docs) —
    * raw / exposure_gate / keep_best × format.
    *
    * Scale: the gate is a row-local projection; pairs are
    * banded-Hamming collision-bounded ([[dHashPairs]] — payload bytes
    * never cross a shuffle, only id + bands longs); components are the
    * pointer-jump label propagation; keep-best one semi-join. Stage
    * survivor frames are CacheScope-pinned (each feeds the next stage
    * and the funnel). */
  def imagePipeline(df: DataFrame, idCol: String, payloadCol: String,
      bands: Int = 4, bandBits: Int = 16, maxHamming: Int = 3)
      : (DataFrame, DataFrame) = {
    val s0 = graft.ops.CacheScope.persist(df.withColumn("format",
      when(BmpCodec.isBmp(col(payloadCol)), lit("bmp"))
        .when(PpmCodec.isPpm(col(payloadCol)), lit("ppm"))
        .when(PgmCodec.isPgm(col(payloadCol)), lit("pgm"))
        .when(Rle8Codec.isRle8(col(payloadCol)), lit("rle8"))
        .otherwise(lit("opaque"))))
    val s1 = graft.ops.CacheScope.persist(
      s0.filter(exposureKeep(col(payloadCol))))
    val pairs = dHashPairs(s1, idCol, payloadCol, bands, bandBits,
      maxHamming)
    val comp = TextDedup.connectedComponents(
      s1.select(col(idCol)), idCol, pairs)
    val kept = graft.ops.CacheScope.persist(
      s1.join(comp.filter(col(idCol) === col("rep_id"))
          .select(col(idCol)),
        Seq(idCol), "left_semi"))
    val funnel = Seq(("raw", 0, s0), ("exposure_gate", 1, s1),
        ("keep_best", 2, kept))
      .map { case (nm, ord, frame) =>
        frame.groupBy(col("format"))
          .agg(count(lit(1)).as("n_docs"))
          .select(lit(ord).as("stage_ord"), lit(nm).as("stage"),
            col("format"), col("n_docs"))
      }.reduce(_ unionByName _)
    (kept.select(col(idCol), col("format")), funnel)
  }

  /** CLIP-style cross-modal alignment gate (the LAION-400M/5B curation
    * recipe: keep an (image, caption) pair only when the cosine between
    * the two modality embeddings clears a threshold). Generic over any
    * two fixed-width embedding columns of EQUAL width `dim` (doubles);
    * in production the image side comes from the batched decoder
    * ([[extractFeaturesBatched]] / a real CLIP vision tower) and the
    * text side from the caption encoder — here the registered query
    * feeds the md5 stub features and a block-pooled text embedding, so
    * the gate's plumbing and determinism are oracle-checked end to end.
    *
    * Scale: ONE equi-join on the pair id (metadata-sized rows — the
    * payload bytes are NOT carried through the join), then a pure
    * codegen projection per pair; the gate prunes before any
    * downstream packing/tokenization touches payload bytes. No
    * all-pairs structure anywhere — alignment is per-pair, unlike the
    * ANN family's candidate generation.
    *
    * Determinism: dot and norms are explicit left-associated 4-term (or
    * `dim`-term) chains over exact float→double values, 6-dp rounded —
    * the `list_dot_product` discipline of the ANN oracles. Zero-norm
    * embeddings (all-zero vector) yield NULL score and kept=0, never an
    * engine-dependent 0/0. */
  def clipAlignScore(imgEmb: Column, txtEmb: Column, dim: Int): Column = {
    def dot(a: Column, b: Column): Column =
      (0 until dim).map(i =>
        element_at(a, i + 1) * element_at(b, i + 1)).reduce(_ + _)
    val n2a = dot(imgEmb, imgEmb)
    val n2b = dot(txtEmb, txtEmb)
    when(n2a > 0d && n2b > 0d,
      round(dot(imgEmb, txtEmb) / (sqrt(n2a) * sqrt(n2b)), 6))
  }

  /** Block-mean pooling of a float embedding down to `blocks` doubles
    * (block b = mean of entries [b·blockLen, (b+1)·blockLen)) — the
    * dimensionality adapter that lets a wide caption embedding meet a
    * narrow vision-stub embedding in [[clipAlignScore]]. Determinism:
    * float→double is exact and each block is an explicit LEFT-ASSOCIATED
    * addition chain (not a fold whose association an engine may choose),
    * then one division by the block length — both engines produce the
    * bit-identical double. Pure codegen projection, no shuffle. */
  def blockPoolEmbedding(emb: Column, blocks: Int, blockLen: Int): Column =
    array((0 until blocks).map { b =>
      (0 until blockLen)
        .map(i => element_at(emb, b * blockLen + i + 1).cast("double"))
        .reduce(_ + _) / blockLen.toDouble
    }: _*)

  /** The alignment gate over a pairs frame: emits the 6-dp `clip_score`
    * and `kept` (1 when score ≥ tau). Keep/drop stays a FLAG so the
    * caller can audit the rejected tail — the standard curation report
    * shape — and filter on `kept = 1` for the surviving corpus. */
  def clipAlignmentGate(pairs: DataFrame, imgEmbCol: String,
      txtEmbCol: String, dim: Int, tau: Double): DataFrame =
    pairs
      .withColumn("clip_score",
        clipAlignScore(col(imgEmbCol), col(txtEmbCol), dim))
      .withColumn("kept",
        (col("clip_score").isNotNull && col("clip_score") >= tau)
          .cast("int"))

  /** Batched partition-level extraction: the mapPartitions twin of an
    * Arrow-batch UDF — groups rows into `batchSize` chunks, "decodes" each
    * batch, emits (id, features). A real implementation swaps
    * `decodeBatch` for the codec call; everything around it stays. */
  def extractFeaturesBatched(
      df: DataFrame, idCol: String, payloadCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("features", ArrayType(DoubleType))))
    def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[(Long, Array[Double])] =
      batch.map { case (id, bytes) =>
        val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        val feats = (0 until 4).map { i =>
          val v = java.nio.ByteBuffer.wrap(d, i * 4, 4).getInt.toLong & 0xffffffffL
          math.round(v / 4294967296.0 * 1e6) / 1e6
        }.toArray
        (id, feats)
      }
    val input = df.select(col(idCol).cast("long"), col(payloadCol))
    val rows = input.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { chunk =>
        decodeBatch(chunk.map(r => (r.getLong(0), r.getAs[Array[Byte]](1))))
          .map { case (id, f) => Row(id, f.toSeq) }
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Video near-duplicate pairs by SHARED SAMPLED FRAMES — the
    * re-cut/re-upload detector of a video corpus prep: two payloads
    * whose frame samples ([[sampleChunks]] grid) produce ≥ `minShared`
    * identical frame digests are flagged with the shared count and the
    * overlap fraction (shared / min frame count). Catches
    * offset/trim re-cuts exact payload hashing misses: a video whose
    * head is trimmed by one stride still shares every remaining frame.
    *
    * Scale: candidates come ONLY from the frame-digest equi-join —
    * pair volume is Σ (docs per digest)², never all-pairs — and
    * digests sampled in more than `maxDocsPerFrame` payloads are
    * PRUNED first (a black/intro boilerplate frame shared by millions
    * of videos carries no dup signal but would alone dominate the
    * join; the sparse-retrieval stop-term rule applied to frames).
    * Frame digests are md5 (16-byte strings) — payload bytes never
    * cross the shuffle; per-doc frame sets are deduped before joining
    * so a still video contributes one row per distinct frame.
    *
    * Output: (`id_a`, `id_b`, `n_shared`, `frac`) with id_a < id_b. */
  def sharedFramePairs(df: DataFrame, idCol: String, payloadCol: String,
      chunkLen: Int, stride: Int, maxChunks: Int,
      minShared: Int = 2, maxDocsPerFrame: Int = 50): DataFrame = {
    val fr = graft.ops.CacheScope.persist(
      df.select(col(idCol).cast("long").as("id"),
          explode(sampleChunks(col(payloadCol), chunkLen, stride,
            maxChunks)).as("frame"))
        .filter(length(col("frame")) > 0)
        .select(col("id"), md5(col("frame")).as("fd"))
        .distinct())
    val keep = fr.groupBy(col("fd"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocsPerFrame && col("df") >= 2)
      .select(col("fd"))
    val pruned = graft.ops.CacheScope.persist(
      fr.join(keep, Seq("fd")))
    val perDoc = fr.groupBy(col("id")).agg(count(lit(1)).as("nf"))
    pruned.select(col("fd"), col("id").as("id_a"))
      .join(pruned.select(col("fd"), col("id").as("id_b")), Seq("fd"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .join(perDoc.select(col("id").as("id_a"), col("nf").as("nf_a")),
        Seq("id_a"))
      .join(perDoc.select(col("id").as("id_b"), col("nf").as("nf_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("n_shared"),
        round(col("n_shared").cast("double") /
          least(col("nf_a"), col("nf_b")), 6).as("frac"))
  }

  /** Audio-match by CONSTELLATION HASHING with offset voting — the
    * Shazam shape (Wang 2003): per track, a time series of spectral
    * peaks; landmarks = (peak, later peak, time gap) hashes; a query
    * matches a track when many landmark hashes agree on ONE constant
    * time offset (random hash collisions spread across offsets and
    * lose the vote).
    *
    * The "spectrogram" here derives each step's peak from the payload
    * bytes at a fixed stride (the honest-stub rule — substitute a real
    * STFT peak-picker in production; every downstream shape is real):
    * f(t) = byte value at position t·stride. Landmarks pair each step
    * with its next two steps (fan-out 2) via a LEAD window partitioned
    * BY TRACK (one track's steps, the sessionize shape).
    *
    * Scale: matching is an inverted-index EQUI-JOIN on the landmark
    * hash — never track×track; boilerplate hashes (corpus df >
    * maxTracksPerHash) are pruned first, the stop-term rule applied to
    * landmarks; the offset vote is a (query, track, delta)-grain hash
    * agg and the winning offset a bounded argmax struct per pair.
    *
    * Output: (query_id, track_id, delta, votes) for pairs whose best
    * offset carries ≥ minVotes — delta in steps, constant for a true
    * re-cut. */
  def constellationMatches(tracks: DataFrame, queries: DataFrame,
      idCol: String, payloadCol: String, stride: Int = 4,
      minVotes: Long = 10L, maxTracksPerHash: Int = 200): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def landmarks(df: DataFrame, side: String): DataFrame = {
      val steps = df.select(col(idCol).cast("long").as(s"${side}_id"),
          col(payloadCol).as("p"))
        .select(col(s"${side}_id"), col("p"),
          explode(sequence(lit(0),
            floor((length(col("p")) - 1) / stride).cast("int")))
            .as("t"))
        .select(col(s"${side}_id"), col("t"),
          ascii(expr(s"substring(p, t * $stride + 1, 1)")).as("f"))
      val w = Window.partitionBy(s"${side}_id").orderBy("t")
      steps.select(col(s"${side}_id"), col("t"),
          (col("f") * 100000 + lead(col("f"), 1).over(w) * 100
            + 1).as("h1"),
          (col("f") * 100000 + lead(col("f"), 2).over(w) * 100
            + 2).as("h2"))
        .select(col(s"${side}_id"), col("t"),
          explode(array(col("h1"), col("h2"))).as("h"))
        .filter(col("h").isNotNull)
    }
    val corpus = graft.ops.CacheScope.persist(landmarks(tracks, "track"))
    val ok = corpus.groupBy(col("h"))
      .agg(countDistinct(col("track_id")).as("df"))
      .filter(col("df") <= maxTracksPerHash)
      .select(col("h"))
    val votes = landmarks(queries, "query")
      .withColumnRenamed("t", "tq")
      .join(corpus.join(ok, Seq("h")).withColumnRenamed("t", "tc"),
        Seq("h"))
      .groupBy(col("query_id"), col("track_id"),
        (col("tq") - col("tc")).as("delta"))
      .agg(count(lit(1)).as("votes"))
    votes.groupBy(col("query_id"), col("track_id"))
      .agg(max(struct(col("votes").as("v"), (-col("delta")).as("nd")))
        .as("b"))
      .select(col("query_id"), col("track_id"),
        (-col("b").getField("nd")).as("delta"),
        col("b").getField("v").as("votes"))
      .filter(col("votes") >= minVotes)
  }
}
