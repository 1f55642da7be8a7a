package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column pipeline (SURVEY.md §2C): treat media as opaque
  * binary columns with typed metadata, decode in batched partition-local
  * calls, emit typed features.
  *
  * The Spark-side plumbing is real: binary payload column + mime
  * metadata, `Dataset[MmInput]` → `mapPartitions` with explicit
  * batching (the shape a native codec binding needs: one JNI/library
  * call per batch, not per row) → typed `Dataset[MmFeatures]`. The
  * codec itself is a clearly-marked deterministic STUB — this
  * container has no image/audio libraries — computing pseudo-features
  * from payload bytes, so the whole pipeline stays oracle-checkable.
  *
  * Scale posture: decode is embarrassingly parallel map-side work; the
  * batch size bounds peak memory per task, and no shuffle occurs until
  * after features are extracted (features are ~bytes, payloads ~MB —
  * shuffling features instead of payloads is the point).
  */
object MmPipeline {

  type Q = (SparkSession, String) => DataFrame

  case class MmInput(doc_id: Long, payload: Array[Byte], mime: String)
  case class MmFeatures(doc_id: Long, width: Int, height: Int, channels: Int,
      mean_intensity: Double)

  /** Batched decode boundary — a real deployment binds an image codec
    * here (one native call per batch). */
  trait MmCodec extends Serializable {
    def decodeBatch(batch: Seq[MmInput]): Seq[MmFeatures]
  }

  /** STUB codec: deterministic pseudo-decode from payload bytes
    * (stands in for `???` — no media libraries in this container). */
  object StubCodec extends MmCodec {
    override def decodeBatch(batch: Seq[MmInput]): Seq[MmFeatures] =
      batch.map { in =>
        val len = in.payload.length
        val first = if (len > 0) in.payload(0) & 0xff else 0
        val last = if (len > 0) in.payload(len - 1) & 0xff else 0
        MmFeatures(
          in.doc_id,
          width = 64 + len % 512,
          height = 64 + (first * 31 + last) % 512,
          channels = 3,
          mean_intensity =
            if (len == 0) 0d
            else {
              var s = 0L; var i = 0
              while (i < len) { s += in.payload(i) & 0xff; i += 1 }
              s.toDouble / len
            })
      }
  }

  val BATCH_SIZE = 64

  /** The pipeline: payload column → batched decode → typed features. */
  def decodePipeline(input: Dataset[MmInput], codec: MmCodec = StubCodec): Dataset[MmFeatures] = {
    import input.sparkSession.implicits._
    input.mapPartitions(_.grouped(BATCH_SIZE).flatMap(codec.decodeBatch))
  }

  /** Driver-contract query: documents' text bytes stand in for media
    * payloads; the oracle replays the stub arithmetic in SQL (ASCII
    * text ⇒ bytes == character codes). */
  def mmDecodePipeline: Q = (s, dir) => {
    import s.implicits._
    val input = t(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("image/stub").as("mime"))
      .as[MmInput]
    decodePipeline(input).toDF()
  }

  val mmDecodePipelineSql: String =
    """SELECT doc_id,
      |  64 + length(text) % 512 AS width,
      |  64 + (ascii(substr(text, 1, 1)) * 31 + ascii(substr(text, length(text), 1))) % 512 AS height,
      |  3 AS channels,
      |  list_sum(list_transform(generate_series(1, length(text)), i -> ascii(substr(text, i, 1)))) / length(text) AS mean_intensity
      |FROM documents""".stripMargin

  case class MmFrame(doc_id: Long, frame_idx: Long, mean_intensity: Double)

  /** Frame sampling for video-like payloads: fixed-size frame windows
    * (`frameBytes`), keeping every `stride`-th frame. Same batched
    * partition-local shape as the decoder — a real deployment binds a
    * demuxer here; the stub treats consecutive byte windows as frames.
    * Map-side only: a 100 TB corpus fans out to frame rows without any
    * shuffle, and the stride bounds the fan-out factor. */
  def frameSample(input: Dataset[MmInput], frameBytes: Int, stride: Int): Dataset[MmFrame] = {
    import input.sparkSession.implicits._
    input.mapPartitions(_.flatMap { in =>
      val nFrames = in.payload.length / frameBytes
      (0 until nFrames by stride).iterator.map { j =>
        var s = 0L
        var i = j * frameBytes
        val end = i + frameBytes
        while (i < end) { s += in.payload(i) & 0xff; i += 1 }
        MmFrame(in.doc_id, j.toLong, s.toDouble / frameBytes)
      }
    })
  }

  /** Driver-contract query: 256-byte frames, stride 4. */
  def mmFrameSample: Q = (s, dir) => {
    import s.implicits._
    val input = t(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("video/stub").as("mime"))
      .as[MmInput]
    frameSample(input, 256, 4).toDF()
  }

  val mmFrameSampleSql: String =
    """WITH fr AS (
      |  SELECT doc_id, text,
      |    unnest(generate_series(CAST(0 AS BIGINT), CAST(length(text) // 256 AS BIGINT) - 1)) AS frame_idx
      |  FROM documents)
      |SELECT doc_id, frame_idx,
      |  list_sum(list_transform(generate_series(frame_idx * 256 + 1, frame_idx * 256 + 256),
      |    i -> ascii(substr(text, CAST(i AS INT), 1)))) / 256.0 AS mean_intensity
      |FROM fr WHERE frame_idx % 4 = 0""".stripMargin

  case class MmScenes(doc_id: Long, n_frames: Long, n_scenes: Long,
      boundaries_fp: String)

  /** Scene-change detection over the frame stream (r6 — the shot-
    * boundary pass a video curation pipeline runs before sampling
    * keyframes): a boundary is an adjacent-frame feature jump
    * |m_j − m_{j−1}| > threshold over the stub demuxer's per-frame
    * mean intensity. Entirely partition-local SINGLE-pass state (one
    * running previous-frame feature per payload — no window, no
    * shuffle, no frame materialization); per-doc output carries the
    * boundary-index fingerprint, so one misplaced boundary breaks the
    * gate. Frame means are integer-sum/256 — exact binary doubles, so
    * the threshold compare is engine-independent. */
  def sceneDetect(input: Dataset[MmInput], frameBytes: Int, threshold: Double): Dataset[MmScenes] = {
    import input.sparkSession.implicits._
    input.mapPartitions(_.flatMap { in =>
      val nFrames = in.payload.length / frameBytes
      if (nFrames == 0) Iterator.empty
      else {
        val bounds = scala.collection.mutable.ArrayBuffer.empty[Int]
        var prev = 0.0
        var j = 0
        while (j < nFrames) {
          var s = 0L
          var i = j * frameBytes
          val end = i + frameBytes
          while (i < end) { s += in.payload(i) & 0xff; i += 1 }
          val m = s.toDouble / frameBytes
          if (j > 0 && math.abs(m - prev) > threshold) bounds += j
          prev = m
          j += 1
        }
        val joined = bounds.mkString(",")
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(joined.getBytes("UTF-8"))
        val fp = d.map(b => f"$b%02x").mkString
        Iterator.single(MmScenes(in.doc_id, nFrames.toLong, bounds.size + 1L, fp))
      }
    })
  }

  /** Driver-contract query: 256-byte frames, jump threshold 8.0. */
  def mmSceneDetect: Q = (s, dir) => {
    import s.implicits._
    val input = t(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("video/stub").as("mime"))
      .as[MmInput]
    sceneDetect(input, 256, 8.0).toDF()
  }

  val mmSceneDetectSql: String =
    """WITH fr AS (
      |  SELECT doc_id, frame_idx,
      |    list_sum(list_transform(generate_series(frame_idx * 256 + 1, frame_idx * 256 + 256),
      |      i -> ascii(substr(text, CAST(i AS INT), 1)))) / 256.0 AS m
      |  FROM (
      |    SELECT doc_id, text,
      |      unnest(generate_series(CAST(0 AS BIGINT), CAST(length(text) // 256 AS BIGINT) - 1)) AS frame_idx
      |    FROM documents)),
      |d AS (SELECT doc_id, frame_idx, m,
      |        lag(m) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS pm FROM fr),
      |b AS (SELECT doc_id, frame_idx FROM d WHERE pm IS NOT NULL AND abs(m - pm) > 8.0),
      |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames FROM fr GROUP BY doc_id),
      |bs AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bounds,
      |         md5(string_agg(CAST(frame_idx AS VARCHAR), ',' ORDER BY frame_idx)) AS fp
      |       FROM b GROUP BY doc_id)
      |SELECT a.doc_id, a.n_frames,
      |  COALESCE(bs.n_bounds, 0) + 1 AS n_scenes,
      |  COALESCE(bs.fp, md5('')) AS boundaries_fp
      |FROM agg a LEFT JOIN bs ON bs.doc_id = a.doc_id""".stripMargin

  /** STATELESS streaming twin of [[mmSceneDetect]] (r6): scene
    * boundaries computed AT INGEST — the per-payload single-pass
    * detector is pure map-side work, so the streaming form is an
    * append-mode query with ZERO aggregation state (the
    * stream_curation_filter shape); media lands, its shot boundaries
    * are in the catalog before the micro-batch commits. Same output,
    * same oracle as the batch form. */
  def streamSceneDetect: Q = (s, dir) => {
    val sch = s.read.parquet(s"$dir/documents.parquet").schema
    graft.streaming.StreamStage.withStaged(s, "ssd", dir, "documents.parquet") { stageDir =>
      import s.implicits._
      val input = s.readStream.schema(sch).parquet(stageDir)
        .select(col("doc_id"), col("text").cast("binary").as("payload"),
          lit("video/stub").as("mime"))
        .as[MmInput]
      graft.streaming.StreamStage.drain(s, "ssd")(sceneDetect(input, 256, 8.0).toDF()
        .writeStream.outputMode("append")
        .format("memory").queryName("graft_stream_ssd"))
    }
    s.table("graft_stream_ssd")
  }

  case class MmResized(doc_id: Long, width: Int, height: Int,
      out_w: Int, out_h: Int, scale: Double)

  /** Resize planning: fit each decoded image into a target box
    * preserving aspect ratio (the metadata half of a resize — the
    * pixel resample would run inside the same batched codec boundary
    * as decode). Integer floor arithmetic keeps the oracle exact. */
  def resizeTo(decoded: Dataset[MmFeatures], target: Int): Dataset[MmResized] = {
    import decoded.sparkSession.implicits._
    decoded.map { f =>
      val longSide = math.max(f.width, f.height)
      val scale = target.toDouble / longSide
      // floor; the short side never rounds to 0 because width,height >= 64
      val ow = (f.width * target) / longSide
      val oh = (f.height * target) / longSide
      MmResized(f.doc_id, f.width, f.height, ow, oh, scale)
    }
  }

  /** Driver-contract query: decode then plan a 224-box resize. */
  def mmResize: Q = (s, dir) => {
    import s.implicits._
    val input = t(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("image/stub").as("mime"))
      .as[MmInput]
    resizeTo(decodePipeline(input), 224).toDF()
  }

  val mmResizeSql: String =
    """SELECT doc_id, width, height,
      |  (width * 224) // greatest(width, height) AS out_w,
      |  (height * 224) // greatest(width, height) AS out_h,
      |  224.0 / greatest(width, height) AS scale
      |FROM (
      |  SELECT doc_id,
      |    64 + length(text) % 512 AS width,
      |    64 + (ascii(substr(text, 1, 1)) * 31 + ascii(substr(text, length(text), 1))) % 512 AS height
      |  FROM documents)""".stripMargin

  /** Perceptual-bucket near-dup detection over DECODED features — the
    * media analogue of text near-dup: coarse feature quantization
    * (width/64, height/64, mean_intensity/4) buckets visually-similar
    * payloads, then groups with ≥2 members report size and canonical
    * doc. In a real deployment the features are a perceptual hash from
    * the codec; the stub's pseudo-features keep the plumbing
    * oracle-checkable. Shuffle carries only (bucket key, doc_id) — the
    * whole point of deduping features instead of payloads. */
  def mmDedupFeatures: Q = (s, dir) => {
    import s.implicits._
    val input = t(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("image/stub").as("mime"))
      .as[MmInput]
    decodePipeline(input).toDF()
      .groupBy((col("width") / 64).cast("bigint").as("wb"),
        (col("height") / 64).cast("bigint").as("hb"),
        floor(col("mean_intensity") / 4).cast("bigint").as("ib"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical"))
      .filter(col("n_docs") >= 2)
  }

  val mmDedupFeaturesSql: String =
    """WITH f AS (
      |  SELECT doc_id,
      |    64 + length(text) % 512 AS width,
      |    64 + (ascii(substr(text, 1, 1)) * 31 + ascii(substr(text, length(text), 1))) % 512 AS height,
      |    list_sum(list_transform(generate_series(1, length(text)), i -> ascii(substr(text, i, 1)))) / length(text) AS mean_intensity
      |  FROM documents)
      |SELECT CAST(width // 64 AS BIGINT) AS wb, CAST(height // 64 AS BIGINT) AS hb,
      |  CAST(FLOOR(mean_intensity / 4) AS BIGINT) AS ib,
      |  COUNT(*) AS n_docs, MIN(doc_id) AS canonical
      |FROM f
      |GROUP BY 1, 2, 3
      |HAVING COUNT(*) >= 2""".stripMargin

  /** WebDataset-style SHARD PACKING of multimodal payloads (the
    * tar-shard layout every large-scale media trainer streams from):
    * payloads are laid out per source in a deterministic salted-hash
    * order and packed WHOLE (media members never split, unlike
    * pipeline_pack_bins' token slices) into ~16 KiB shards by byte
    * position: shard_id = start_byte div budget — an item whose start
    * falls in shard k lands in shard k even if it overflows the
    * boundary (next-fit semantics, no sequential scan needed). The
    * manifest row (source, shard, member offset, size) is exactly the
    * index a WebDataset reader seeks by. Scale shape: one cumulative
    * window per source (parallel over sources), per-shard base offsets
    * from a partial-agg groupBy joined back — payload BYTES never
    * shuffle, only their sizes do. */
  def mmPackShards: Q = (s, dir) => {
    val B = 16384L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy(md5(concat(lit("shard:"), col("doc_id").cast("string"))), col("doc_id"))
    val laid = t(s, dir, "documents")
      .select(col("source"), col("doc_id"), length(col("text")).cast("long").as("nbytes"))
      .withColumn("cum", sum(col("nbytes")).over(w))
      .withColumn("start", col("cum") - col("nbytes"))
      .withColumn("shard_id", expr(s"start div ${B}L"))
    val bases = laid.groupBy("source", "shard_id")
      .agg(min(col("start")).as("shard_base"))
    laid.join(bases, Seq("source", "shard_id"))
      .select(col("source"), col("shard_id"), col("doc_id"),
        (col("start") - col("shard_base")).as("offset_bytes"), col("nbytes"))
  }

  val mmPackShardsSql: String =
    """WITH laid AS (
      |  SELECT source, doc_id, CAST(length(text) AS BIGINT) AS nbytes,
      |    SUM(CAST(length(text) AS BIGINT)) OVER (PARTITION BY source
      |      ORDER BY md5('shard:' || CAST(doc_id AS VARCHAR)), doc_id) AS cum
      |  FROM documents),
      |pos AS (
      |  SELECT source, doc_id, nbytes, CAST(cum - nbytes AS BIGINT) AS start,
      |    CAST((cum - nbytes) // 16384 AS BIGINT) AS shard_id
      |  FROM laid),
      |bases AS (
      |  SELECT source, shard_id, MIN(start) AS shard_base
      |  FROM pos GROUP BY source, shard_id)
      |SELECT p.source, p.shard_id, p.doc_id,
      |  CAST(p.start - b.shard_base AS BIGINT) AS offset_bytes, p.nbytes
      |FROM pos p JOIN bases b ON b.source = p.source AND b.shard_id = p.shard_id""".stripMargin

  /** REAL WebDataset shard BYTES (r11 — WebDataset shards ARE tar
    * archives; `mm_pack_shards` plans the shard layout, this key
    * MATERIALIZES it through the from-spec POSIX ustar codec
    * [[graft.functions.TarCodec]] and then re-reads its own bytes):
    * each doc contributes two members (`<id>.txt` payload +
    * `<id>.src` label, the WebDataset same-key grouping), 16 docs per
    * shard, members sorted by name; the PARSE side walks the member
    * table (magic + checksum verified per header) and extracts every
    * payload by (offset, size) substring — so the gate pins header
    * fields, payload positions, AND the padding law (total archive
    * bytes are oracle arithmetic: Σ 512 + ceil512(size) + 1024).
    * Scale shape: one tar per shard assembled inside the shard's own
    * group (collect_list is shard-bounded by construction — 32
    * members), pack/parse are codegen'd expressions, no UDF, no
    * driver funnel. The `.src` members carry a 117-char directory key
    * (the URL-derived-id shape of real WebDataset corpora), so every
    * shard routes >100-char paths through the ustar prefix field in
    * BOTH directions. Payload extraction substrings with int offsets
    * — a 2 GiB per-shard bound (shards here are 32 members; real
    * WebDataset shards target ~1 GB, inside the bound by design). */
  private[graft] val LongDir = "wds-prefix/" + ("x" * 106)

  def mmWebdatasetTar: Q = (s, dir) => {
    import graft.functions.TarCodec.{tar_pack, tar_members}
    val docs = t(s, dir, "documents")
    // format_string, not lpad: lpad TRUNCATES ids beyond 10 digits to
    // a colliding member name; %010d widens instead, and the parse
    // side splits on '/' and '.' rather than fixed offsets
    val entries = docs.select(expr("doc_id div 16").as("shard"),
        concat(format_string("%010d", col("doc_id")), lit(".txt")).as("name"),
        col("text").cast("binary").as("data"))
      .unionByName(docs.select(expr("doc_id div 16").as("shard"),
        concat(lit(LongDir + "/"), format_string("%010d", col("doc_id")),
          lit(".src")).as("name"),
        col("source").cast("binary").as("data")))
    val shards = entries.groupBy("shard")
      .agg(tar_pack(expr("array_sort(collect_list(struct(name, data)))")).as("tar"))
    val parsed = shards
      .select(col("shard"), length(col("tar")).as("tar_len"), col("tar"),
        explode(tar_members(col("tar"))).as("m"))
      .select(col("shard"), col("tar_len"),
        col("m.name").as("name"), col("m.size").as("sz"),
        expr("substring(tar, cast(m.offset as int) + 1, cast(m.size as int))").as("payload"))
      .withColumn("base", expr("element_at(split(name, '/'), -1)"))
      .withColumn("doc_id", expr("cast(element_at(split(base, '\\\\.'), 1) as bigint)"))
      .withColumn("ext", expr("element_at(split(base, '\\\\.'), 2)"))
    val memberAgg = parsed
      .join(docs.select(col("doc_id"), md5(col("text")).as("want_txt"),
        md5(col("source")).as("want_src")), "doc_id")
      .agg(count(lit(1)).as("n_members"),
        sum(col("sz")).as("sum_member_bytes"),
        sum(when(col("ext") === "txt" && md5(col("payload")) === col("want_txt"), 1L)
          .otherwise(0L)).as("n_txt_match"),
        sum(when(col("ext") === "src" && md5(col("payload")) === col("want_src"), 1L)
          .otherwise(0L)).as("n_src_match"))
    val shardAgg = shards.agg(count(lit(1)).as("n_shards"),
      sum(length(col("tar"))).as("sum_tar_bytes"))
    memberAgg.crossJoin(broadcast(shardAgg))
      .select("n_shards", "n_members", "sum_member_bytes", "sum_tar_bytes",
        "n_txt_match", "n_src_match")
  }

  /** Oracle: member sizes/hashes from the raw table, archive bytes as
    * the ustar padding arithmetic — one wrong header byte, pad law, or
    * payload offset on the Spark side breaks it. */
  val mmWebdatasetTarSql: String =
    """WITH m AS (
      |  SELECT doc_id // 16 AS shard, octet_length(encode(text)) AS sz FROM documents
      |  UNION ALL
      |  SELECT doc_id // 16 AS shard, octet_length(encode(source)) AS sz FROM documents),
      |per_shard AS (
      |  SELECT shard, SUM(512 + ((sz + 511) // 512) * 512) + 1024 AS tar_bytes,
      |    COUNT(*) AS nm, SUM(sz) AS sb
      |  FROM m GROUP BY shard)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_shards,
      |  CAST(SUM(nm) AS BIGINT) AS n_members,
      |  CAST(SUM(sb) AS BIGINT) AS sum_member_bytes,
      |  CAST(SUM(tar_bytes) AS BIGINT) AS sum_tar_bytes,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_txt_match,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_src_match
      |FROM per_shard""".stripMargin

  /** WebDataset LOADER INDEX (r12 — the random-access manifest a
    * training loader builds once per shard set so workers can seek
    * straight to a sample without walking headers): every member's
    * (shard, full path, payload offset, size) row, parsed from the
    * REAL shard bytes by the ustar member walk. The oracle recomputes
    * every offset from first principles — name-ordered cumulative
    * `512 + ceil512(size)` sums per shard, + 512 for the member's own
    * header — so ONE wrong pad, header length, or member order
    * anywhere in the codec breaks a row, member-by-member (the
    * aggregate gates of `mm_webdataset_tar` can't see which).
    * Scale: one tar per shard parsed inside its own group; the
    * manifest is corpus-row-sized and never funnels. */
  def mmWdsIndex: Q = (s, dir) => {
    import graft.functions.TarCodec.{tar_pack, tar_members}
    val docs = t(s, dir, "documents")
    val entries = docs.select(expr("doc_id div 16").as("shard"),
        concat(format_string("%010d", col("doc_id")), lit(".txt")).as("name"),
        col("text").cast("binary").as("data"))
      .unionByName(docs.select(expr("doc_id div 16").as("shard"),
        concat(lit(LongDir + "/"), format_string("%010d", col("doc_id")),
          lit(".src")).as("name"),
        col("source").cast("binary").as("data")))
    entries.groupBy("shard")
      .agg(tar_pack(expr("array_sort(collect_list(struct(name, data)))")).as("tar"))
      .select(col("shard"), explode(tar_members(col("tar"))).as("m"))
      .select(col("shard"), col("m.name").as("name"),
        col("m.offset").as("offset_bytes"), col("m.size").as("member_bytes"))
  }

  /** Oracle: pure ustar layout arithmetic — members sort by name
    * within their shard, each occupies 512 + ceil512(size) bytes, and
    * a member's payload starts 512 past the cumulative sum of its
    * predecessors. */
  val mmWdsIndexSql: String =
    s"""WITH m AS (
       |  SELECT doc_id // 16 AS shard,
       |    lpad(CAST(doc_id AS VARCHAR), 10, '0') || '.txt' AS name,
       |    octet_length(encode(text)) AS sz
       |  FROM documents
       |  UNION ALL
       |  SELECT doc_id // 16 AS shard,
       |    '$LongDir/' || lpad(CAST(doc_id AS VARCHAR), 10, '0') || '.src' AS name,
       |    octet_length(encode(source)) AS sz
       |  FROM documents)
       |SELECT shard, name,
       |  CAST(COALESCE(SUM(512 + ((sz + 511) // 512) * 512) OVER (
       |    PARTITION BY shard ORDER BY name
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 512 AS BIGINT)
       |    AS offset_bytes,
       |  CAST(sz AS BIGINT) AS member_bytes
       |FROM m""".stripMargin

  /** Session-staged WebDataset shard MOUNT (r16 optimization round —
    * the `NcQueries.stageOnce` read-side convention): both loader-half
    * gates ([[mmTarReadFiles]], [[streamWdsIndex]]) test READ behavior
    * over a `.tar` shard mount, so the shard layout is paid once per
    * (session, sf dir) — like a real packing job pays it at ingest —
    * instead of re-packed and re-written on every invocation (pre-r16
    * each key rebuilt the mount per call, and the best-of-2 bench paid
    * that twice more per key). Registered with [[Staged]] so the bench
    * charges the layout to its staging line item. `mm_webdataset_tar`
    * / `mm_wds_index` keep per-invocation packing: the pack itself IS
    * their operator under test. */
  private[operators] def stagedTarShards(s: SparkSession, dir: String): String = {
    import graft.functions.TarCodec.tar_pack
    val out = graft.sources.netcdf.NcQueries.scratch(s, dir, "wds_tars")
    graft.sources.netcdf.NcQueries.stageOnce(out) {
      val docs = t(s, dir, "documents")
      val entries = docs.select(expr("doc_id div 16").as("shard"),
          concat(format_string("%010d", col("doc_id")), lit(".txt")).as("name"),
          col("text").cast("binary").as("data"))
        .unionByName(docs.select(expr("doc_id div 16").as("shard"),
          concat(lit(LongDir + "/"), format_string("%010d", col("doc_id")),
            lit(".src")).as("name"),
          col("source").cast("binary").as("data")))
      val shards = entries.groupBy("shard")
        .agg(tar_pack(expr("array_sort(collect_list(struct(name, data)))")).as("tar"))
      val p = new org.apache.hadoop.fs.Path(out)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
      fs.mkdirs(p)
      val conf = new graft.sources.netcdf.SerializableHadoopConf(
        s.sparkContext.hadoopConfiguration)
      shards.select(col("shard"), col("tar"))
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          val tfs = new org.apache.hadoop.fs.Path(out).getFileSystem(conf.value)
          it.foreach { r =>
            val f = new org.apache.hadoop.fs.Path(out, f"shard-${r.getLong(0)}%06d.tar")
            val o = tfs.create(f, true)
            try o.write(r.getAs[Array[Byte]]("tar")) finally o.close()
          }
        }
    }
    out
  }
  Staged.register("wds_tars")((s, dir) => { stagedTarShards(s, dir); () })

  /** STREAMING loader index (r12 — the incremental form of
    * [[mmWdsIndex]]: as a packing job lands `.tar` shards in object
    * storage, the loader manifest extends itself instead of
    * re-scanning the shard set): Spark's `binaryFile` source consumed
    * as a FILE STREAM, each arriving shard walked by the ustar member
    * parser where its split lands — a pure per-file map, STATELESS
    * append mode — emitting the same (shard, path, offset, size) rows.
    * Shard ids recover from the file name. Output and oracle shared
    * verbatim with the batch manifest, so the incremental index must
    * equal the full rebuild row-for-row. */
  def streamWdsIndex: Q = (s, dir) => {
    import graft.functions.TarCodec.tar_members
    val out = stagedTarShards(s, dir)
    // file streams need an explicit schema; binaryFile's is fixed —
    // take it from a static read of the same mount
    val binSchema = s.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar").load(out).schema
    val stream = s.readStream.format("binaryFile").schema(binSchema)
      .option("pathGlobFilter", "*.tar").load(out)
      .select(expr("cast(regexp_extract(path, 'shard-(\\\\d+)\\\\.tar', 1) as bigint)")
        .as("shard"),
        explode(tar_members(col("content"))).as("m"))
      .select(col("shard"), col("m.name").as("name"),
        col("m.offset").as("offset_bytes"), col("m.size").as("member_bytes"))
    graft.streaming.StreamStage.drain(s, "wds")(stream.writeStream.outputMode("append")
      .format("memory").queryName("graft_stream_wds"))
    s.table("graft_stream_wds")
  }

  /** WebDataset shards MOUNTED FROM STORAGE (r11 — the loader half of
    * [[mmWebdatasetTar]]: a training job doesn't hold shards in a
    * column, it lists `.tar` FILES and streams members out of each):
    * the staged shard files write task-local through the Hadoop FS
    * (one `.tar` per shard, no driver funnel), then the read path is
    * Spark's own `binaryFile` source → the ustar member walk →
    * (offset, size) payload extraction — each file parsed where its
    * split landed, scaling with file count exactly like a real
    * WebDataset mount. Same oracle arithmetic as the in-column key
    * plus the file count. */
  def mmTarReadFiles: Q = (s, dir) => {
    import graft.functions.TarCodec.tar_members
    // r16 optimization: the shard mount is the session-staged layout
    // (see stagedTarShards) — this gate times the LOADER half only
    val out = stagedTarShards(s, dir)
    val docs = t(s, dir, "documents")
    // pathGlobFilter instead of a glob-in-path: a glob path makes the
    // source probe it as a streaming-sink metadata dir and log a noisy
    // (benign) FileNotFoundException stack before falling through
    val bin = s.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar").load(out)
    val parsed = bin
      .select(col("path"), length(col("content")).as("tar_len"), col("content"),
        explode(tar_members(col("content"))).as("m"))
      .select(col("path"), col("tar_len"), col("m.size").as("sz"),
        expr("substring(content, cast(m.offset as int) + 1, cast(m.size as int))").as("payload"),
        expr("element_at(split(m.name, '/'), -1)").as("base"))
      .withColumn("doc_id", expr("cast(element_at(split(base, '\\\\.'), 1) as bigint)"))
      .withColumn("ext", expr("element_at(split(base, '\\\\.'), 2)"))
    val memberAgg = parsed
      .join(docs.select(col("doc_id"), md5(col("text")).as("want_txt")), "doc_id")
      .agg(count(lit(1)).as("n_members"),
        sum(col("sz")).as("sum_member_bytes"),
        sum(when(col("ext") === "txt" && md5(col("payload")) === col("want_txt"), 1L)
          .otherwise(0L)).as("n_txt_match"))
    val fileAgg = bin.agg(count(lit(1)).as("n_files"),
      sum(length(col("content"))).as("sum_tar_bytes"))
    memberAgg.crossJoin(broadcast(fileAgg))
      .select("n_files", "n_members", "sum_member_bytes", "sum_tar_bytes", "n_txt_match")
  }

  val mmTarReadFilesSql: String =
    """WITH m AS (
      |  SELECT doc_id // 16 AS shard, octet_length(encode(text)) AS sz FROM documents
      |  UNION ALL
      |  SELECT doc_id // 16 AS shard, octet_length(encode(source)) AS sz FROM documents),
      |per_shard AS (
      |  SELECT shard, SUM(512 + ((sz + 511) // 512) * 512) + 1024 AS tar_bytes,
      |    COUNT(*) AS nm, SUM(sz) AS sb
      |  FROM m GROUP BY shard)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_files,
      |  CAST(SUM(nm) AS BIGINT) AS n_members,
      |  CAST(SUM(sb) AS BIGINT) AS sum_member_bytes,
      |  CAST(SUM(tar_bytes) AS BIGINT) AS sum_tar_bytes,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_txt_match
      |FROM per_shard""".stripMargin

  val queries: Map[String, Q] = Map(
    "mm_webdataset_tar" -> mmWebdatasetTar,
    "mm_tar_read_files" -> mmTarReadFiles,
    "mm_wds_index" -> mmWdsIndex,
    "stream_wds_index" -> streamWdsIndex,
    "mm_pack_shards" -> mmPackShards,
    "mm_decode_pipeline" -> mmDecodePipeline,
    "mm_frame_sample" -> mmFrameSample,
    "mm_scene_detect" -> mmSceneDetect,
    "stream_scene_detect" -> streamSceneDetect,
    "mm_resize" -> mmResize,
    "mm_dedup_features" -> mmDedupFeatures)
  val oracles: Map[String, String] = Map(
    "mm_webdataset_tar" -> mmWebdatasetTarSql,
    "mm_tar_read_files" -> mmTarReadFilesSql,
    "mm_wds_index" -> mmWdsIndexSql,
    "stream_wds_index" -> mmWdsIndexSql,
    "mm_pack_shards" -> mmPackShardsSql,
    "mm_decode_pipeline" -> mmDecodePipelineSql,
    "mm_frame_sample" -> mmFrameSampleSql,
    "mm_scene_detect" -> mmSceneDetectSql,
    "stream_scene_detect" -> mmSceneDetectSql,
    "mm_resize" -> mmResizeSql,
    "mm_dedup_features" -> mmDedupFeaturesSql)
}
