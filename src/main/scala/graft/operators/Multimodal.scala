package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, processed by a per-partition lazily-initialized decoder via
  * `mapPartitions` — the Scala/JVM shape of the "Pandas UDF over
  * mapInPandas" batch pattern (one decoder init per partition, streaming
  * iterator, no per-row setup).
  *
  * graft-native extension (builder brief). The image/audio codec libraries
  * are not in this container, so [[FakeDecoder]] is an explicitly-marked
  * DETERMINISTIC STUB: it "decodes" a payload to features computable from
  * the bytes alone (mean byte value). Everything around it — the binary
  * column, the metadata struct, the partition-batched execution, the
  * output schema — is the real plumbing a JNI/DJL decoder would drop into.
  *
  * Scale: decode is per-row map work behind one narrow stage;
  * `repartition` upstream controls decoder parallelism/memory, and the
  * payload column prunes away for queries that never touch it (parquet
  * column pruning), so metadata-only scans never read image bytes.
  */
object Multimodal {

  case class MMDoc(doc_id: Long, payload: Array[Byte],
      width: Int, height: Int, format: String)

  case class MMFeatures(doc_id: Long, width: Int, height: Int,
      format: String, n_bytes: Int, brightness: Double,
      resized_w: Int, resized_h: Int, frame_id: Int, frame_byte_sum: Long)

  /** Attach a synthetic binary payload + typed metadata to a text corpus:
    * payload = md5 bytes of the text (16-byte deterministic stand-in for
    * encoded image data), metadata derived from doc_id.
    */
  def attachPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      unhex(md5(col("text"))).as("payload"),
      (lit(32) + pmod(col("doc_id"), lit(8)) * 16).cast("int").as("width"),
      (lit(32) + pmod(col("doc_id"), lit(5)) * 16).cast("int").as("height"),
      when(pmod(col("doc_id"), lit(3)) === 0, "png")
        .when(pmod(col("doc_id"), lit(3)) === 1, "jpeg")
        .otherwise("webp").as("format"))

  /** STUB decoder — stands in for a real image codec (libjpeg/ffmpeg/DJL),
    * which this container does not have. Deterministic: features are pure
    * functions of the payload bytes. The `open()`/`close()` lifecycle and
    * per-partition reuse mirror how a native decoder handle would be held.
    */
  final class FakeDecoder private () {
    def decodeBrightness(payload: Array[Byte]): Double = {
      var s = 0
      var i = 0
      while (i < payload.length) { s += payload(i) & 0xff; i += 1 }
      if (payload.length == 0) 0.0 else s.toDouble / payload.length
    }

    /** "Resize": fit inside maxSide × maxSide preserving aspect; pure
      * integer arithmetic (floor), min dimension 1 — the metadata
      * transform a real resampler would report.
      */
    def resize(w: Int, h: Int, maxSide: Int): (Int, Int) = {
      val m = math.max(w, h)
      (math.max(1, w * maxSide / m), math.max(1, h * maxSide / m))
    }

    /** Content-dependent keyframe COUNT — the variance probe a real
      * decoder runs before sampling (scene-change detection picks more
      * keyframes from busier footage): 1 + (first payload byte mod
      * maxFrames), so the per-doc fan-out is ragged (1..maxFrames
      * rows) and data-derived, never a fixed shape. Empty payload → 1.
      */
    def frameCount(payload: Array[Byte], maxFrames: Int): Int =
      if (payload.isEmpty) 1 else 1 + ((payload(0) & 0xff) % maxFrames)

    /** "Frame sample": treat the payload as 4-byte frames and sum the
      * bytes of one selected frame — the shape of keyframe extraction.
      */
    def frameByteSum(payload: Array[Byte], frameId: Int): Long = {
      var s = 0L
      var i = frameId * 4
      val end = math.min(i + 4, payload.length)
      while (i < end) { s += payload(i) & 0xff; i += 1 }
      s
    }

    /** Window count of an AUDIO payload — 16 samples (bytes) per
      * analysis window, the same block layout as
      * [[attachAudioPayload]] emits. Sub-window tail / empty payload
      * decode to one window (degrade, not drop).
      */
    def audioWindowCount(payload: Array[Byte]): Int =
      math.max(1, payload.length / 16)

    /** Byte-energy of one 16-sample analysis window — the RMS/energy
      * probe a real voice-activity detector computes per frame, as a
      * pure function of the payload bytes; clamped at the payload
      * tail.
      */
    def windowEnergy(payload: Array[Byte], windowId: Int): Long = {
      var s = 0L
      var i = windowId * 16
      val end = math.min(i + 16, payload.length)
      while (i < end) { s += payload(i) & 0xff; i += 1 }
      s
    }

    /** Frame count of a VIDEO payload — 16 bytes per encoded frame
      * ([[attachVideoPayload]]'s layout), so the fan-out is exactly as
      * ragged as the source footage is long. Sub-frame tail / empty
      * payload decode to one frame (degrade, not drop).
      */
    def videoFrameCount(payload: Array[Byte]): Int =
      math.max(1, payload.length / 16)

    /** Perceptual-hash stand-in: the first 7 bytes of a frame's
      * 16-byte block, lowercase hex (14 chars) — the content signature
      * a real pipeline computes per decoded frame (pHash/dHash) to
      * dedup frames ACROSS videos. Pure function of the frame bytes;
      * clamped at the payload tail.
      */
    def frameSignature(payload: Array[Byte], frameId: Int): String = {
      val from = frameId * 16
      val end = math.min(from + 7, payload.length)
      val sb = new java.lang.StringBuilder(14)
      var i = from
      while (i < end) {
        val b = payload(i) & 0xff
        sb.append(Character.forDigit(b >> 4, 16))
        sb.append(Character.forDigit(b & 0xf, 16))
        i += 1
      }
      sb.toString
    }
    def close(): Unit = ()
  }
  object FakeDecoder {
    /** Heavyweight-init stand-in: called once per partition, not per row. */
    def open(): FakeDecoder = new FakeDecoder()
  }

  case class MMFrame(doc_id: Long, frame_id: Int, frame_sum: Long)

  /** Frame sampling: FAN OUT one row per (doc, frame) — the video
    * keyframe-extraction DAG shape, where decode multiplies rows instead
    * of mapping them 1:1. The fan-out is DATA-DEPENDENT (r18 advice):
    * each doc yields `decoder.frameCount` rows (1..maxFrames, derived
    * from the payload content the way a real decoder's scene-change
    * variance probe would), so downstream operators must handle ragged
    * per-doc frame sets — the honest shape of video ingestion, where a
    * fixed 4-frames-per-doc plan hides skew. Same per-partition decoder
    * lifecycle as [[extractFeatures]]; the fan-out happens inside the
    * partition iterator (no shuffle — downstream selection
    * re-partitions by doc only if it must, and a ≤maxFrames fan-out of
    * a 100 TB corpus stays a narrow stage).
    */
  def sampleFrames(withPayload: DataFrame, maxFrames: Int = 4): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload.as[MMDoc].mapPartitions { rows =>
      val decoder = FakeDecoder.open()
      rows.flatMap { d =>
        val n = decoder.frameCount(d.payload, maxFrames)
        (0 until n).iterator.map(f =>
          MMFrame(d.doc_id, f, decoder.frameByteSum(d.payload, f)))
      }
    }.toDF()
  }

  case class MMVideo(doc_id: Long, payload: Array[Byte])
  case class MMFrameSig(doc_id: Long, frame_id: Int, frame_sig: String)

  /** Attach a synthetic VIDEO payload: one 16-byte "encoded frame"
    * (md5 of each `blockTokens`-token block of the text) per scene, so
    * payload LENGTH is data-dependent and cross-document frame overlap
    * is real — two docs sharing boilerplate share exactly those frames,
    * the way re-used intro/outro footage repeats across real videos.
    * Deterministic (md5 of the block text), so the oracle rebuilds the
    * identical bytes relationally.
    */
  def attachVideoPayload(docs: DataFrame, blockTokens: Int): DataFrame =
    payloadFromBlocks(docs, blockTokens, identity)

  /** Attach a RE-ENCODED video payload: the [[attachVideoPayload]]
    * bytes with the LOW BIT of each frame's first byte flipped — the
    * deterministic stand-in for re-encode noise (a transcode shifts
    * pixel values slightly, so a real frame's perceptual hash moves by
    * a bit or two while the content stays the same). The flip lives in
    * the PAYLOAD, not the signature: the decoder then runs unchanged
    * over genuinely perturbed bytes, and every derived frame signature
    * lands at Hamming distance exactly 1 from its source frame's — the
    * fixture [[frameNearDupPairs]]'s tolerance is measured against.
    * (One hex nibble XOR 1 ≡ the byte's low-bit flip, so the transform
    * is a per-block `translate` both engines compute identically.)
    */
  def attachReencodedPayload(docs: DataFrame, blockTokens: Int): DataFrame =
    payloadFromBlocks(docs, blockTokens, mx => concat(
      substring(mx, 1, 1),
      translate(substring(mx, 2, 1), "0123456789abcdef", "1032547698badcfe"),
      substring(mx, 3, 30)))

  /** Shared payload constructor: one 16-byte block per `blockTokens`
    * tokens (md5 of the block text), each block's hex run through
    * `perBlock` before packing — identity for a faithful encode, a
    * nibble flip for the re-encode fixture.
    */
  private def payloadFromBlocks(docs: DataFrame, blockTokens: Int,
      perBlock: Column => Column): DataFrame = {
    require(blockTokens >= 1, s"blockTokens must be >= 1, got $blockTokens")
    // fan out before the per-block md5 payload build — the multimodal
    // plane's dominant narrow CPU stage, and the decode fan-outs
    // downstream inherit the spread (identity at scale, see Fan)
    Fan.out(docs.filter(col("text").isNotNull))
      .select(col("doc_id"), split(col("text"), " ").as("_tv"))
      .select(col("doc_id"),
        unhex(concat_ws("", transform(
          sequence(lit(0),
            expr(s"(size(_tv) - 1) div $blockTokens").cast("int")),
          i => perBlock(md5(concat_ws(" ",
            slice(col("_tv"), i * blockTokens + 1, lit(blockTokens)))))))
        ).as("payload"))
  }

  /** Decode a video payload into per-frame signature rows: FAN OUT one
    * (doc_id, frame_id, frame_sig) per frame, signature from the
    * decoder — the narrow per-partition stage feeding corpus-wide
    * frame dedup ([[FakeDecoder.frameSignature]]). Same decoder
    * lifecycle as [[sampleFrames]]; ragged by construction (frame
    * count = payload length / 16).
    */
  def frameSignatures(withPayload: DataFrame): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload.as[MMVideo].mapPartitions { rows =>
      val decoder = FakeDecoder.open()
      rows.flatMap { d =>
        val n = decoder.videoFrameCount(d.payload)
        (0 until n).iterator.map(f =>
          MMFrameSig(d.doc_id, f, decoder.frameSignature(d.payload, f)))
      }
    }.toDF()
  }

  case class MMAudioWin(doc_id: Long, window_id: Int, energy: Long)

  /** Attach a synthetic AUDIO payload: a PCM stand-in re-using the
    * md5-per-token-block byte construction of [[attachVideoPayload]]
    * (here each 16-byte block is 16 "samples" of one analysis window),
    * so payload LENGTH — and therefore the speech/silence run structure
    * downstream — is data-dependent, and the oracle rebuilds the
    * identical bytes relationally.
    */
  def attachAudioPayload(docs: DataFrame, blockTokens: Int): DataFrame =
    attachVideoPayload(docs, blockTokens)

  /** Decode an audio payload into per-window energy rows: FAN OUT one
    * (doc_id, window_id, energy) per 16-sample analysis window — the
    * narrow per-partition stage feeding voice-activity segmentation
    * ([[FakeDecoder.windowEnergy]]). Same decoder lifecycle as
    * [[sampleFrames]]; ragged by construction (window count = payload
    * length / 16).
    */
  def audioWindows(withPayload: DataFrame): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload.as[MMVideo].mapPartitions { rows =>
      val decoder = FakeDecoder.open()
      rows.flatMap { d =>
        val n = decoder.audioWindowCount(d.payload)
        (0 until n).iterator.map(w =>
          MMAudioWin(d.doc_id, w, decoder.windowEnergy(d.payload, w)))
      }
    }.toDF()
  }

  /** Video near-dup pairs — re-uploaded / re-cut footage detection:
    * docs sharing ≥ `minShared` distinct frame signatures, scored by
    * SET containment over distinct signatures (shared / smaller
    * video's DISTINCT-signature count — the right asymmetry for a
    * short clip cut from a longer video; deliberately set semantics,
    * so a 1000-frame video looping 2 distinct frames is the same
    * 2-element set as the 2-frame original it loops).
    *
    * Scale discipline is dedup_containment's df-capped inverted index:
    * signatures shared by more than `dfCap` videos are dropped from
    * pair generation (a black frame / intro card in thousands of
    * uploads is not re-upload evidence — and its bucket's pair
    * explosion is the all-pairs blowup this cap exists to prevent), so
    * candidate volume is bounded by dfCap² per signature. The pair
    * aggregate and the two per-doc frame-count joins are all key-
    * partitioned; nothing is ever all-pairs.
    *
    * @param sigs (doc_id, frame_id, frame_sig) from [[frameSignatures]]
    */
  def videoNearDupPairs(sigs: DataFrame, dfCap: Int, minShared: Long,
      containMin: Double): DataFrame =
    postingNearDupPairs(
      sigs.select(col("doc_id"), col("frame_sig").as("__key")),
      dfCap, minShared, containMin,
      sharedName = "shared_frames", nPrefix = "nf")

  /** The df-capped inverted-index near-dup pair core
    * [[videoNearDupPairs]] and [[audioNearDupPairs]] share — one
    * modality posts frame signatures, the other acoustic fingerprints,
    * and the pair pipeline (distinct postings, df cap, key-bucket
    * self-join, shared-count cut, containment vs the smaller side) is
    * identical. Input: (doc_id, __key).
    */
  private def postingNearDupPairs(posts: DataFrame, dfCap: Int,
      minShared: Long, containMin: Double,
      sharedName: String, nPrefix: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // distinct (doc, key): a key looping within one doc counts once
    val ds = posts.distinct()
      .localCheckpoint(eager = false) // read by postings + both nf sides
    val nf = ds.groupBy(col("doc_id")).agg(count(lit(1)).as("nf"))
    val post = ds
      .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("__key"))))
      .filter(col("__df") <= dfCap).drop("__df")
    val shared = post.select(col("__key"), col("doc_id").as("doc_a"))
      .join(post.select(col("__key"), col("doc_id").as("doc_b")),
        Seq("__key"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as(sharedName))
      .filter(col(sharedName) >= minShared)
    shared
      .join(nf.select(col("doc_id").as("doc_a"), col("nf").as(s"${nPrefix}_a")),
        Seq("doc_a"))
      .join(nf.select(col("doc_id").as("doc_b"), col("nf").as(s"${nPrefix}_b")),
        Seq("doc_b"))
      .withColumn("containment", Rounding.stable(
        col(sharedName).cast("double") /
          least(col(s"${nPrefix}_a"), col(s"${nPrefix}_b")), 4))
      .select(col("doc_a"), col("doc_b"), col(sharedName),
        col(s"${nPrefix}_a"), col(s"${nPrefix}_b"), col("containment"),
        (col("containment") >= lit(containMin)).as("is_neardup"))
  }

  case class MMAudioFp(doc_id: Long, pos: Int, fp: String)

  /** Acoustic fingerprints — the chromaprint shape over the stub
    * decoder's window energies: per document, consecutive window
    * ENERGY DELTAS (invariant to a constant gain/DC offset, the way a
    * real fingerprint survives re-mastering) shingled `shingle` at a
    * time into one string key per position. A clip lifted from a
    * longer recording reproduces the source's delta sequence, so its
    * shingles land in the same buckets — [[audioNearDupPairs]] then
    * detects the re-use exactly like the video plane's shared frames.
    * Computed INSIDE the row (per-partition decoder, one flatMap, no
    * window functions, no shuffle — usable unchanged under Structured
    * Streaming); documents shorter than `shingle`+1 windows emit
    * nothing (nothing to match on).
    */
  def audioFingerprints(withPayload: DataFrame, shingle: Int): DataFrame = {
    require(shingle >= 1, s"shingle must be >= 1, got $shingle")
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload.as[MMVideo].mapPartitions { rows =>
      val decoder = FakeDecoder.open()
      rows.flatMap { d =>
        val n = decoder.audioWindowCount(d.payload)
        val e = Array.tabulate(n)(w => decoder.windowEnergy(d.payload, w))
        val deltas = Array.tabulate(math.max(0, n - 1))(w => e(w + 1) - e(w))
        (0 to deltas.length - shingle).iterator.map(p =>
          MMAudioFp(d.doc_id, p, deltas.slice(p, p + shingle).mkString(":")))
      }
    }.toDF()
  }

  /** Audio near-dup pairs — clip-reuse detection, the audio twin of
    * [[videoNearDupPairs]] (the modality symmetry r19 left open: audio
    * had segmentation but no re-use detection): documents sharing
    * ≥ `minShared` distinct acoustic fingerprints, containment scored
    * against the smaller side's distinct-fingerprint count — the right
    * asymmetry for a short clip cut from a longer recording. Same
    * df-capped inverted-index scale discipline: a fingerprint in more
    * than `dfCap` documents (a silence pattern / jingle in thousands
    * of uploads) leaves pair generation whole.
    *
    * @param fps (doc_id, pos, fp) from [[audioFingerprints]]
    */
  def audioNearDupPairs(fps: DataFrame, dfCap: Int, minShared: Long,
      containMin: Double): DataFrame =
    postingNearDupPairs(
      fps.select(col("doc_id"), col("fp").as("__key")),
      dfCap, minShared, containMin,
      sharedName = "shared_fps", nPrefix = "nfp")

  /** Hamming-tolerant frame near-dup pairs — the gap exact-signature
    * matching leaves open: a re-encoded frame's perceptual hash moves
    * by a bit or two, so [[videoNearDupPairs]]' equality join splits
    * the duplicate pair. This is the repo's banded-Hamming discipline
    * ([[Similarity.binaryBands]] / `dedup_simhash_pairs`) applied to
    * the 56-bit frame signature: the 14 hex chars split into `bands`
    * equal substring slices, candidates generated by an equi-join on
    * (band, slice) over DISTINCT signatures, then the exact Hamming
    * verify on the packed codes cuts chance collisions. Pigeonhole:
    * two signatures within Hamming distance < `bands` agree on ≥1
    * whole band, so the candidate join is COMPLETE inside the radius —
    * `maxHamming < bands` is required, making every emitted pair
    * guaranteed-found, never found-by-luck.
    *
    * Scale: pairs are generated at the SIGNATURE level (distinct sigs,
    * not frame occurrences — a frame repeated across a million videos
    * is one posting row), and a band cell holding more than
    * `bucketCap` distinct signatures is dropped whole (a near-constant
    * signature region — the black-frame byte pattern — is the
    * quadratic blowup, and 2^28-wide cells make natural collisions
    * ~|sigs|/2^28 per cell, so only structured content ever trips the
    * cap). The verify runs BEFORE the cross-band pair dedup, so the
    * dedup shuffle carries only true near-dups. Output one row per
    * near-dup signature pair with each side's distinct-video df, ready
    * for a tolerant-canonicalization consumer.
    */
  def frameNearDupPairs(sigs: DataFrame, bands: Int, maxHamming: Int,
      bucketCap: Int): DataFrame = {
    require(bands >= 2 && 14 % bands == 0,
      s"frameNearDupPairs: bands must split the 14 hex chars evenly, got $bands")
    require(maxHamming >= 1 && maxHamming < bands,
      s"frameNearDupPairs: pigeonhole completeness needs 1 <= maxHamming < bands, " +
        s"got maxHamming=$maxHamming bands=$bands")
    import org.apache.spark.sql.expressions.Window
    val width = 14 / bands
    val ds = sigs.select(col("doc_id"), col("frame_sig")).distinct()
    val sd = ds.groupBy(col("frame_sig")).agg(count(lit(1)).as("df"))
      .localCheckpoint(eager = false) // read by the banding + two df joins
    val banded = sd.select(col("frame_sig"),
        posexplode(array((0 until bands).map(b =>
          substring(col("frame_sig"), b * width + 1, width)): _*))
          .as(Seq("band_id", "band_val")))
      .withColumn("__bc",
        count(lit(1)).over(Window.partitionBy(col("band_id"), col("band_val"))))
      .filter(col("__bc") <= bucketCap).drop("__bc")
    def code(c: Column): Column = conv(c, 16, 10).cast("long")
    val verified = banded
      .select(col("frame_sig").as("sig_a"), col("band_id"), col("band_val"))
      .join(banded.select(col("frame_sig").as("sig_b"),
        col("band_id"), col("band_val")), Seq("band_id", "band_val"))
      .filter(col("sig_a") < col("sig_b"))
      .withColumn("hamming", bit_count(
        code(col("sig_a")).bitwiseXOR(code(col("sig_b")))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("sig_a", "sig_b")
    verified
      .join(sd.select(col("frame_sig").as("sig_a"), col("df").as("df_a")),
        Seq("sig_a"))
      .join(sd.select(col("frame_sig").as("sig_b"), col("df").as("df_b")),
        Seq("sig_b"))
      .select(col("sig_a"), col("sig_b"), col("hamming"),
        col("df_a"), col("df_b"))
  }

  /** Frame-signature index artifact — the standing inverted index the
    * live-ingest video screen probes, with the binary-index lifecycle:
    *
    *  - `postings/` — DISTINCT (doc_id, frame_sig), df-capped AT BUILD
    *    (signatures in more than `dfCap` videos are excluded — a
    *    boilerplate frame in hundreds of uploads is not re-use
    *    evidence, and its bucket is the screen's emission blowup),
    *    laid out by `sig_shard` (first hex nibble, 16 dirs) so file
    *    sizes stay bounded and point probes can prune
    *  - `meta/` — blockTokens + dfCap pinned, so an append can never
    *    be sliced or capped differently from the standing postings
    *
    * Append writes a new batch's distinct postings at the frozen
    * layout WITHOUT re-applying the corpus-wide cap (a batch sees only
    * itself, and the standing corpus is never re-read), so a signature
    * can drift across the cap as batches accumulate — the same
    * measured-staleness problem as IVF-PQ centroid drift, handled the
    * same way: [[frameSigIndexDfGate]] measures the hot fraction and
    * triggers a rebuild, never a silent in-place fixup.
    */
  def writeFrameSigIndex(sigs: DataFrame, dir: String,
      blockTokens: Int, dfCap: Int): Unit = {
    val sp = sigs.sparkSession
    import sp.implicits._
    import org.apache.spark.sql.expressions.Window
    val ds = sigs.select(col("doc_id"), col("frame_sig")).distinct()
      .withColumn("__df",
        count(lit(1)).over(Window.partitionBy(col("frame_sig"))))
      .filter(col("__df") <= dfCap).drop("__df")
    ds.withColumn("sig_shard", substring(col("frame_sig"), 1, 1))
      .write.partitionBy("sig_shard").mode("overwrite")
      .parquet(s"$dir/postings")
    Seq((blockTokens, dfCap)).toDF("block_tokens", "df_cap").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Append a new batch's frame signatures: distinct postings of the
    * batch, df-capped WITHIN THE BATCH at the cap frozen in `meta/`
    * (a signature boilerplate-hot inside one micro-batch must not
    * enter the postings any more than one hot at build time — the
    * screen's emission bound survives every append). The batch cannot
    * see the standing corpus, so CROSS-batch df drift remains and is
    * measured by [[frameSigIndexDfGate]], never silently fixed.
    * Batches are assumed exactly-once (the binary-index append
    * contract): a retried batch re-appends its postings — dedupe
    * retries upstream or rebuild.
    */
  def appendToFrameSigIndex(newSigs: DataFrame, dir: String): Unit = {
    val sp = newSigs.sparkSession
    import org.apache.spark.sql.expressions.Window
    val dfCap = sp.read.parquet(s"$dir/meta")
      .collect()(0).getAs[Int]("df_cap")
    newSigs.select(col("doc_id"), col("frame_sig")).distinct()
      .withColumn("__df",
        count(lit(1)).over(Window.partitionBy(col("frame_sig"))))
      .filter(col("__df") <= dfCap).drop("__df")
      .withColumn("sig_shard", substring(col("frame_sig"), 1, 1))
      .write.partitionBy("sig_shard").mode("append")
      .parquet(s"$dir/postings")
  }

  /** Measure cap drift on a grown index: the fraction of postings
    * whose signature's CORPUS-WIDE df now exceeds the build-time cap
    * (appends are capped only within their own batch). One aggregate
    * over the postings; `rebuild` trips at `maxHotFrac`.
    */
  def frameSigIndexDfGate(spark: org.apache.spark.sql.SparkSession,
      dir: String, maxHotFrac: Double): DataFrame = {
    val dfCap = spark.read.parquet(s"$dir/meta")
      .collect()(0).getAs[Int]("df_cap")
    spark.read.parquet(s"$dir/postings")
      .groupBy(col("frame_sig")).agg(count(lit(1)).as("df"))
      .agg(coalesce(sum(col("df")), lit(0L)).as("n_postings"),
        coalesce(sum(when(col("df") > dfCap, col("df")).otherwise(lit(0L))),
          lit(0L)).as("hot_postings"))
      .select(col("n_postings"), col("hot_postings"),
        // an emptied index is clean, not NaN (0/0 would null the verdict)
        when(col("n_postings") === 0, lit(0.0))
          .otherwise(Rounding.stable(col("hot_postings").cast("double") /
            col("n_postings"), 4)).as("hot_frac"))
      .withColumn("rebuild", col("hot_frac") > lit(maxHotFrac))
  }

  case class MMAudioSeg(doc_id: Long, seg_id: Int, is_speech: Boolean,
      start_window: Int, n_windows: Long, seg_energy: Long)

  /** Single-pass audio segmentation: decode each payload's windows and
    * fold maximal same-flag runs INSIDE the row — one flatMap, no
    * window functions, no shuffle. This is the per-row form of
    * mm_audio_segments' gaps-and-islands fold (bit-identical by
    * construction: the running flag-change count is exactly `seg_id`
    * here), usable unchanged under Structured Streaming because it
    * carries zero state. Batch prefers the windowed form when the
    * windows are already fanned out as rows; this form wins when each
    * document arrives whole.
    */
  def segmentAudio(withPayload: DataFrame, threshold: Long): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload.as[MMVideo].mapPartitions { rows =>
      val decoder = FakeDecoder.open()
      rows.flatMap { d =>
        val n = decoder.audioWindowCount(d.payload)
        val out = scala.collection.mutable.ArrayBuffer.empty[MMAudioSeg]
        var segId = 0
        var segStart = 0
        var segEnergy = 0L
        var segFlag = false
        var w = 0
        while (w < n) {
          val e = decoder.windowEnergy(d.payload, w)
          val f = e >= threshold
          if (w == 0 || f != segFlag) {
            if (w > 0) out += MMAudioSeg(d.doc_id, segId, segFlag,
              segStart, (w - segStart).toLong, segEnergy)
            segId += 1; segStart = w; segEnergy = 0L; segFlag = f
          }
          segEnergy += e
          w += 1
        }
        out += MMAudioSeg(d.doc_id, segId, segFlag, segStart,
          (n - segStart).toLong, segEnergy)
        out.iterator
      }
    }.toDF()
  }

  /** Batch feature extraction: one decoder per partition, streamed rows.
    * Brightness = mean byte / 16-byte payload ⇒ an exact multiple of
    * 1/16, so no rounding is needed for cross-engine comparison.
    */
  def extractFeatures(withPayload: DataFrame): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload.as[MMDoc].mapPartitions { rows =>
      val decoder = FakeDecoder.open()
      val out = rows.map { d =>
        val (rw, rh) = decoder.resize(d.width, d.height, 64)
        val frame = (d.doc_id % 4).toInt
        MMFeatures(d.doc_id, d.width, d.height, d.format,
          d.payload.length, decoder.decodeBrightness(d.payload),
          rw, rh, frame, decoder.frameByteSum(d.payload, frame))
      }
      out // decoder closed with the partition; stub close is a no-op
    }.toDF()
  }
}
