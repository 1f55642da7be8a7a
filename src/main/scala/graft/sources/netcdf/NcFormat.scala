package graft.sources.netcdf

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, FileOutputStream, RandomAccessFile}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.hadoop.fs.{FSDataInputStream, FileSystem, Path}
import org.apache.spark.sql.types._

/** NetCDF classic binary codec (CDF-1 / CDF-2 / CDF-5), implemented
  * from the public Unidata file-format specification
  * (docs.unidata.ucar.edu/netcdf-c — "The NetCDF Classic Format
  * Specification"). This is the Spark-native stand-in for the
  * reference's NetCDF4 dependency: the *streaming* semantics
  * (chunk-buffered append along the unlimited dimension, chunked
  * iteration on read) are the reference's contribution and are
  * format-independent; the classic format is chosen because it is
  * fully publicly specified and implementable without external jars.
  *
  * Layout written here: every DataFrame column becomes a record
  * variable over the unlimited `record` dimension; one DataFrame row =
  * one record. Writes are CDF-2 (64-bit offsets) or CDF-5 when 64-bit
  * integer columns are present. The reader accepts CDF-1/2/5 scalar
  * record variables plus fixed-size variables.
  */
object NcFormat {

  val NC_BYTE = 1; val NC_CHAR = 2; val NC_SHORT = 3; val NC_INT = 4
  val NC_FLOAT = 5; val NC_DOUBLE = 6; val NC_INT64 = 10

  val TAG_DIM = 0x0A; val TAG_VAR = 0x0B; val TAG_ATT = 0x0C

  def typeSize(t: Int): Int = t match {
    case NC_BYTE | NC_CHAR => 1
    case NC_SHORT => 2
    case NC_INT | NC_FLOAT => 4
    case NC_DOUBLE | NC_INT64 => 8
    case other => throw new IllegalArgumentException(s"unsupported nc_type $other")
  }

  def ncTypeOf(dt: DataType): Int = dt match {
    case DoubleType => NC_DOUBLE
    case FloatType => NC_FLOAT
    case IntegerType => NC_INT
    case LongType => NC_INT64
    case ShortType => NC_SHORT
    case ByteType => NC_BYTE
    case other => throw new IllegalArgumentException(
      s"unsupported Spark type for NetCDF-3: $other")
  }

  def sparkTypeOf(ncType: Int): DataType = ncType match {
    case NC_DOUBLE => DoubleType
    case NC_FLOAT => FloatType
    case NC_INT => IntegerType
    case NC_INT64 => LongType
    case NC_SHORT => ShortType
    case NC_BYTE => ByteType
    case other => throw new IllegalArgumentException(s"unsupported nc_type $other")
  }

  private def pad4(n: Long): Long = (4 - n % 4) % 4

  /** One parsed attribute: NC_CHAR attrs carry `text`, numeric attrs
    * carry `nums` widened to doubles (exact for everything except
    * int64 beyond 2^53 — zone-map consumers re-pad, see below). */
  case class NcAttr(name: String, ncType: Int, text: String, nums: Seq[Double])

  case class NcVarMeta(
      name: String,
      ncType: Int,
      dimIds: Seq[Int],
      vsize: Long,
      begin: Long,
      isRecord: Boolean,
      /** per-file value range from the `actual_range` attribute (the
        * CF convention) — graft's writer records it so scans can skip
        * whole files against pushed value filters (zone maps). */
      range: Option[(Double, Double)] = None,
      /** full vatt_list (user attributes + actual_range). */
      atts: Seq[NcAttr] = Nil) {
    /** Bytes of one record slab before inter-record padding. */
    def slabSize(dims: Seq[NcDimMeta]): Long = {
      val fixedCount = dimIds.drop(if (isRecord) 1 else 0)
        .map(i => dims(i).length).product.max(1L)
      fixedCount * typeSize(ncType)
    }
  }

  case class NcDimMeta(name: String, length: Long) {
    def isRecord: Boolean = length == 0L
  }

  case class NcMeta(
      version: Int,
      numRecs: Long,
      dims: Seq[NcDimMeta],
      vars: Seq[NcVarMeta],
      /** global attribute list. */
      gatts: Seq[NcAttr] = Nil) {
    val fixedVars: Seq[NcVarMeta] = vars.filterNot(_.isRecord)
    val recordVars: Seq[NcVarMeta] = vars.filter(_.isRecord)
    /** Byte stride between consecutive records (sum of padded slabs;
      * the single-small-record-var special case skips padding). */
    val recSize: Long =
      if (recordVars.size == 1) recordVars.head.slabSize(dims)
      else recordVars.map(v => { val s = v.slabSize(dims); s + pad4(s) }).sum
    def sparkSchema: StructType =
      StructType(recordVars.map { v =>
        val extra = v.dimIds.drop(1).map(i => dims(i).length).product
        val dt =
          if (v.ncType == NC_CHAR) StringType
          else if (v.dimIds.size > 1 && extra > 1) ArrayType(sparkTypeOf(v.ncType), containsNull = false)
          else sparkTypeOf(v.ncType)
        StructField(v.name, dt)
      })
  }

  // ---------------------------------------------------------------- read

  /** The spec's numrecs sentinel for files written in streaming mode
    * (record count unknown): derive the count from the file length. */
  val NUMRECS_STREAMING: Long = 0xFFFFFFFFL

  /** skipBytes may skip fewer bytes than asked (buffered remote or
    * decompressing streams) — loop until done. */
  private def skipFully(in: DataInputStream, n: Int): Unit = {
    var left = n
    while (left > 0) {
      val skipped = in.skipBytes(left)
      if (skipped <= 0) throw new EOFException(s"failed to skip $left bytes")
      left -= skipped
    }
  }

  /** Whether a path is a gzip-compressed part file (.nc.gz — whole-file
    * compression; the classic format itself has no codec slot). */
  def isGzip(path: Path): Boolean = path.getName.endsWith(".gz")

  /** Whether a path is a chunk-compressed part file (.ncz): a graft
    * extension carrying a spec-standard UNCOMPRESSED classic header
    * (metadata, zone-map attrs and the numrecs patch all work
    * unchanged) while the record data is stored as independently
    * deflate-compressed blocks of `recordsPerBlock` records, indexed
    * by a footer — the NetCDF4/HDF5 chunked-storage model re-expressed
    * on the classic container. Unlike .nc.gz, a .ncz file is
    * SPLITTABLE: the scan seeks straight to the block covering any
    * record range, so compression no longer costs read parallelism or
    * record-range pushdown. */
  def isChunked(path: Path): Boolean = path.getName.endsWith(".ncz")

  /** .ncz footer magic ("GRFZ"). Tail layout, all big-endian:
    * ... blocks ... | footer | footerStart: long | magic: int
    * footer = nBlocks: int, recordsPerBlock: long,
    *          then per block (fileOffset: long, compLen: int, nRecs: int).
    * A NEGATIVE compLen marks a STORED (uncompressed) block of
    * -compLen bytes: the writer keeps a block raw when deflate fails
    * to shrink it (already-compressed or high-entropy payloads), so
    * incompressible data costs zero inflation overhead on read and
    * never grows on disk. Older files (all-positive lens) read
    * unchanged. */
  val NCZ_MAGIC = 0x4752465A

  /** .ncz v2 footer magic ("GRF2"): per-VARIABLE block layout — the
    * netCDF4 `createVariable(chunksizes=, zlib=)` model. Record data is
    * var-major: each record variable's slabs are buffered and flushed
    * as that variable's OWN block sequence (its own records-per-block
    * budget, its own store/deflate codec), blocks of different
    * variables interleaving in the file as their buffers fill; the
    * footer records one block index per variable, in header var order:
    *   nVars: int, then per var (recordsPerBlock: long, codec: byte
    *   [0=store, 1=deflate], nBlocks: int, blocks as in v1),
    *   then footerStart: long, magic: int.
    * Beyond codec control, var-major blocks buy COLUMNAR PRUNING: a
    * projected read inflates only the wanted variables' blocks, where
    * the v1 interleaved layout decompresses every variable's bytes
    * regardless of projection — at 100 TB a 2-of-20-column scan reads
    * ~10% of the record data instead of all of it. */
  val NCZ2_MAGIC = 0x47524632

  case class NczIndex(recordsPerBlock: Long, blocks: Array[(Long, Int, Int)])
  case class NczVarIndex(recordsPerBlock: Long, codec: Byte, blocks: Array[(Long, Int, Int)])
  case class NczIndex2(vars: Array[NczVarIndex])

  /** Parse a .ncz block-index footer, either layout version. */
  def readNczAny(fs: FileSystem, path: Path): Either[NczIndex, NczIndex2] = {
    val len = fs.getFileStatus(path).getLen
    val in = fs.open(path)
    try {
      in.seek(len - 12)
      val footerStart = in.readLong()
      val magic = in.readInt()
      in.seek(footerStart)
      magic match {
        case NCZ_MAGIC =>
          val n = in.readInt()
          val rpb = in.readLong()
          Left(NczIndex(rpb, Array.fill(n)((in.readLong(), in.readInt(), in.readInt()))))
        case NCZ2_MAGIC =>
          val nVars = in.readInt()
          Right(NczIndex2(Array.fill(nVars) {
            val rpb = in.readLong()
            val codec = in.readByte()
            val nb = in.readInt()
            NczVarIndex(rpb, codec, Array.fill(nb)((in.readLong(), in.readInt(), in.readInt())))
          }))
        case other =>
          throw new IllegalArgumentException(
            s"$path: missing .ncz block-index footer (magic 0x${other.toHexString})")
      }
    } finally in.close()
  }

  def readNczIndex(fs: FileSystem, path: Path): NczIndex =
    readNczAny(fs, path) match {
      case Left(idx) => idx
      case Right(_) => throw new IllegalArgumentException(
        s"$path is a per-variable (v2) .ncz file; use readNczAny")
    }

  /** Open a part file for sequential decoding: plain files come back
    * as the seekable FSDataInputStream; .nc.gz files as a buffered
    * decompressing stream (forward-only). */
  def openData(fs: FileSystem, path: Path): DataInputStream =
    if (isGzip(path))
      new DataInputStream(new BufferedInputStream(new GZIPInputStream(fs.open(path)), 1 << 16))
    else fs.open(path)

  private class Parser(raf: DataInputStream, version: Int) {
    // 32-bit fields are unsigned in the classic spec (begin offsets in
    // a CDF-1 file can exceed 2 GiB) — mask, don't sign-extend
    private def u32(): Long = raf.readInt().toLong & 0xFFFFFFFFL
    def nonNeg(): Long = if (version == 5) raf.readLong() else u32()
    def offset(): Long = if (version == 1) u32() else raf.readLong()
    def name(): String = {
      val n = nonNeg().toInt
      val bytes = new Array[Byte](n)
      raf.readFully(bytes)
      skipFully(raf, pad4(n.toLong).toInt)
      new String(bytes, StandardCharsets.UTF_8)
    }
  }

  /** Parse the header of a classic NetCDF file (any Hadoop FS; .nc.gz
    * part files are decompressed on the fly). */
  def readMeta(fs: FileSystem, path: Path): NcMeta = {
    val raf = openData(fs, path)
    try {
      val magic = new Array[Byte](4)
      raf.readFully(magic)
      require(magic(0) == 'C' && magic(1) == 'D' && magic(2) == 'F',
        s"$path is not a classic NetCDF file")
      val version = magic(3).toInt
      require(version == 1 || version == 2 || version == 5,
        s"unsupported CDF version $version")
      val p = new Parser(raf, version)
      val numRecs = p.nonNeg()
      // dim_list
      val dimTag = raf.readInt()
      val nDims = p.nonNeg().toInt
      require(dimTag == TAG_DIM || (dimTag == 0 && nDims == 0), "bad dim_list")
      val dims = (0 until nDims).map(_ => NcDimMeta(p.name(), p.nonNeg()))
      val gatts = readAttrList(raf, p)
      // var_list
      val varTag = raf.readInt()
      val nVars = p.nonNeg().toInt
      require(varTag == TAG_VAR || (varTag == 0 && nVars == 0), "bad var_list")
      val vars = (0 until nVars).map { _ =>
        val vname = p.name()
        val rank = p.nonNeg().toInt
        val dimIds = (0 until rank).map(_ => p.nonNeg().toInt)
        val atts = readAttrList(raf, p)
        val ncType = raf.readInt()
        val vsize = p.nonNeg()
        val begin = p.offset()
        val isRecord = dimIds.headOption.exists(i => dims(i).isRecord)
        NcVarMeta(vname, ncType, dimIds, vsize, begin, isRecord, rangeOf(atts), atts)
      }
      val meta = NcMeta(version, numRecs, dims, vars, gatts)
      if (version != 5 && numRecs == NUMRECS_STREAMING && meta.recSize > 0) {
        // streaming-mode file: the writer never patched numrecs
        require(!isGzip(path) && !isChunked(path),
          s"$path: streaming-mode numrecs cannot be derived for a compressed file " +
            "(compressed length != data length); patch numrecs before compressing")
        val dataStart = meta.recordVars.map(_.begin).minOption.getOrElse(0L)
        val fileLen = fs.getFileStatus(path).getLen
        meta.copy(numRecs = math.max(0L, (fileLen - dataStart) / meta.recSize))
      } else meta
    } finally raf.close()
  }

  /** Parse a full att_list: NC_CHAR values as UTF-8 text, numeric
    * values widened to doubles. */
  private def readAttrList(raf: DataInputStream, p: Parser): Seq[NcAttr] = {
    val tag = raf.readInt()
    val n = p.nonNeg().toInt
    require(tag == TAG_ATT || (tag == 0 && n == 0), "bad att_list")
    (0 until n).map { _ =>
      val aname = p.name()
      val t = raf.readInt()
      val nelems = p.nonNeg().toInt
      val attr =
        if (t == NC_CHAR) {
          val bytes = new Array[Byte](nelems)
          raf.readFully(bytes)
          NcAttr(aname, t, new String(bytes, StandardCharsets.UTF_8), Nil)
        } else {
          def one(): Double = t match {
            case NC_DOUBLE => raf.readDouble()
            case NC_FLOAT => raf.readFloat().toDouble
            case NC_INT => raf.readInt().toDouble
            case NC_INT64 => raf.readLong().toDouble
            case NC_SHORT => raf.readShort().toDouble
            case NC_BYTE => raf.readByte().toDouble
          }
          NcAttr(aname, t, null, (0 until nelems).map(_ => one()))
        }
      skipFully(raf, pad4(nelems.toLong * typeSize(t)).toInt)
      attr
    }
  }

  /** Zone-map range from a parsed att_list: the CF `actual_range`
    * attribute when present. For NC_INT64 the double widening is
    * padded by one ulp each way so pruning stays conservative beyond
    * 2^53. */
  private def rangeOf(atts: Seq[NcAttr]): Option[(Double, Double)] =
    atts.collectFirst {
      case a if a.name == "actual_range" && a.ncType != NC_CHAR && a.nums.size == 2 =>
        if (a.ncType == NC_INT64) (math.nextDown(a.nums(0)), math.nextUp(a.nums(1)))
        else (a.nums(0), a.nums(1))
    }

  // --------------------------------------------------------------- write

  /** Per-column layout spec: scalar numeric, fixed-length numeric
    * array (an extra dimension of length `extra`), or fixed-width
    * NC_CHAR string. */
  case class VarSpec(name: String, ncType: Int, extra: Int, isString: Boolean, isArray: Boolean) {
    def slab: Int = extra * typeSize(ncType)
  }

  def varSpecOf(f: StructField, arrayLens: Map[String, Int], stringWidth: Int): VarSpec =
    f.dataType match {
      case StringType =>
        VarSpec(f.name, NC_CHAR, stringWidth, isString = true, isArray = false)
      case ArrayType(et, _) =>
        val len = arrayLens.getOrElse(f.name, throw new IllegalArgumentException(
          s"array column ${f.name} needs a declared fixed length"))
        VarSpec(f.name, ncTypeOf(et), len, isString = false, isArray = true)
      case dt => VarSpec(f.name, ncTypeOf(dt), 1, isString = false, isArray = false)
    }

  /** Streaming writer for one .nc part file: every column becomes a
    * record variable along the unlimited `record` dimension — scalar
    * numerics as rank-1 vars, fixed-length arrays as rank-2 vars over
    * a per-column length dimension (the reference's N-D variables),
    * strings as rank-2 NC_CHAR vars. Rows are appended through a chunk
    * buffer of `chunkBytes` (the analogue of the reference's
    * chunk_size_mb budget); numRecs is patched into the header on
    * close, so the record count need not be known up front — exactly
    * the reference's streamNumpyData contract.
    *
    * `gatts` / `vatts` are user NC_CHAR attributes (global and
    * per-variable — the reference surfaces netCDF4 file/variable
    * metadata the same way); `fixedVars` are non-record NC_DOUBLE
    * coordinate variables, each over its own fixed dimension, whose
    * data is laid out between the header and the record data exactly
    * as the classic spec requires. */
  final class Writer(path: String, schema: StructType, chunkBytes: Int = 4 << 20,
      arrayLens: Map[String, Int] = Map.empty, stringWidth: Int = 32,
      gatts: Seq[(String, String)] = Nil,
      vatts: Map[String, Seq[(String, String)]] = Map.empty,
      fixedVars: Seq[(String, Array[Double])] = Nil,
      /** store record data as independently deflated blocks with an
        * index footer (.ncz — see [[isChunked]]); the header (and its
        * close-time numrecs/zone-map patches) stays uncompressed. */
      compressChunks: Boolean = false,
      /** typed NC_DOUBLE per-variable attributes (value vectors) —
        * the CF-conventions metadata slots (scale_factor, add_offset,
        * valid_range, …) are typed numerics, not text. */
      dvatts: Map[String, Seq[(String, Array[Double])]] = Map.empty,
      /** typed NC_DOUBLE GLOBAL attributes (value vectors) — file-level
        * numeric metadata (geospatial bounds, grid spacing, version
        * numbers), the global counterpart of [[dvatts]]. */
      dgatts: Seq[(String, Array[Double])] = Nil,
      /** per-variable block-size budgets in bytes (netCDF4's
        * `chunksizes=`): any named variable buffers its own blocks of
        * ~this many bytes; others inherit `chunkBytes`. Non-empty maps
        * switch the .ncz sink to the var-major v2 layout
        * ([[NCZ2_MAGIC]]). Requires `compressChunks`. */
      varChunkBytes: Map[String, Int] = Map.empty,
      /** per-variable codec (netCDF4's `zlib=`): "deflate" (default —
        * per-block store fallback when deflate doesn't shrink) or
        * "store" (never run the Deflater: the right call for
        * high-entropy columns, where at 100 TB attempted-then-discarded
        * compression is pure wasted CPU). Requires `compressChunks`. */
      varCodecs: Map[String, String] = Map.empty) {
    private val specs: Array[VarSpec] =
      schema.fields.map(f => varSpecOf(f, arrayLens, stringWidth))
    require(vatts.keySet.subsetOf(schema.fieldNames.toSet),
      s"vatts for unknown columns: ${vatts.keySet -- schema.fieldNames}")
    require(dvatts.keySet.subsetOf(schema.fieldNames.toSet),
      s"dvatts for unknown columns: ${dvatts.keySet -- schema.fieldNames}")
    require(varChunkBytes.keySet.subsetOf(schema.fieldNames.toSet),
      s"varChunkBytes for unknown columns: ${varChunkBytes.keySet -- schema.fieldNames}")
    require(varCodecs.keySet.subsetOf(schema.fieldNames.toSet),
      s"varCodecs for unknown columns: ${varCodecs.keySet -- schema.fieldNames}")
    require(varCodecs.values.forall(Set("store", "deflate", "zstd")),
      s"varCodecs values must be store|deflate: ${varCodecs.values.toSet}")
    require(compressChunks || (varChunkBytes.isEmpty && varCodecs.isEmpty),
      "per-variable chunk/codec maps require compressChunks (.ncz)")
    private val version = if (specs.exists(_.ncType == NC_INT64)) 5 else 2
    private val single = schema.size == 1
    private val slabPad: Array[Int] =
      specs.map(v => if (single) 0 else pad4(v.slab.toLong).toInt)
    // extra dims follow the record dim: one per array/string column,
    // then one per fixed variable
    private val extraDims: Seq[(String, Long)] = specs.toSeq
      .filter(v => v.isArray || v.isString)
      .map(v => (s"${v.name}_dim", v.extra.toLong)) ++
      fixedVars.map { case (n, vs) => (s"${n}_dim", vs.length.toLong) }
    private val dimIdOf: Map[String, Int] =
      extraDims.zipWithIndex.map { case ((n, _), i) => n -> (i + 1) }.toMap
    private var numRecs = 0L
    // zone-map tracking for scalar numeric vars: exact Long range for
    // the integer family, Double range for float/double
    private val isTracked: Array[Boolean] =
      specs.map(v => !v.isArray && !v.isString)
    private val isIntFamily: Array[Boolean] =
      specs.map(v => v.ncType == NC_BYTE || v.ncType == NC_SHORT
        || v.ncType == NC_INT || v.ncType == NC_INT64)
    private val minL = Array.fill(specs.length)(Long.MaxValue)
    private val maxL = Array.fill(specs.length)(Long.MinValue)
    private val minD = Array.fill(specs.length)(Double.PositiveInfinity)
    private val maxD = Array.fill(specs.length)(Double.NegativeInfinity)
    /** absolute offset of each tracked var's actual_range value bytes */
    private val rangeValueOffset = Array.fill(specs.length)(-1L)
    private val headerBytes = buildHeader()
    private val out = new DataOutputStream(new BufferedOutputStream(
      new FileOutputStream(path), chunkBytes))
    out.write(headerBytes)
    // fixed (non-record) variable data sits between the header and the
    // record data, each slab padded to a 4-byte boundary (uncompressed
    // in .ncz too — coordinate-scale data, and readFixedVar seeks to it)
    fixedVars.foreach { case (_, vs) =>
      vs.foreach(out.writeDouble)
      (0 until pad4(8L * vs.length).toInt).foreach(_ => out.writeByte(0))
    }

    // --- chunk-compressed (.ncz) record sink ---
    /** per-variable record stride (slab + inter-var pad), the unit both
      * block layouts are built from */
    private val strideW: Array[Int] =
      specs.indices.map(i => specs(i).slab.toInt + slabPad(i)).toArray
    private val recSizeW: Long = strideW.map(_.toLong).sum
    private val recordsPerBlock: Int =
      math.max(1L, chunkBytes / math.max(recSizeW, 1L)).toInt
    /** var-major v2 layout: engaged by any per-variable option */
    private val v2: Boolean =
      compressChunks && (varChunkBytes.nonEmpty || varCodecs.nonEmpty)
    private val blockBytes =
      if (compressChunks && !v2) new java.io.ByteArrayOutputStream(chunkBytes) else null
    private val blockOut = if (compressChunks && !v2) new DataOutputStream(blockBytes) else null
    // v2 state: one block buffer + budget + codec + index per variable
    private val varRpb: Array[Int] = specs.indices.map { i =>
      math.max(1L, varChunkBytes.getOrElse(specs(i).name, chunkBytes).toLong
        / math.max(strideW(i).toLong, 1L)).toInt
    }.toArray
    private val varStore: Array[Boolean] =
      specs.map(v => varCodecs.get(v.name).contains("store"))
    private val varZstd: Array[Boolean] =
      specs.map(v => varCodecs.get(v.name).contains("zstd"))
    private val varBlockBytes: Array[java.io.ByteArrayOutputStream] =
      if (v2) Array.fill(specs.length)(new java.io.ByteArrayOutputStream(64 << 10)) else null
    private val varBlockOut: Array[DataOutputStream] =
      if (v2) varBlockBytes.map(new DataOutputStream(_)) else null
    private val varBlockRecs: Array[Int] = if (v2) new Array[Int](specs.length) else null
    private val varBlockIndex: Array[scala.collection.mutable.ArrayBuffer[(Long, Int, Int)]] =
      if (v2) Array.fill(specs.length)(scala.collection.mutable.ArrayBuffer.empty) else null
    /** variable currently being written by writeRow (v2 routing) */
    private var curVar = 0
    /** record bytes go to the current var's block buffer (v2), the
      * shared block buffer (v1 .ncz), or straight to the file */
    private def rec: DataOutputStream =
      if (v2) varBlockOut(curVar) else if (compressChunks) blockOut else out
    private var blockRecs = 0
    private val blockIndex = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Int)]
    private var filePos: Long = headerBytes.length.toLong +
      fixedVars.map { case (_, vs) => val sz = 8L * vs.length; sz + pad4(sz) }.sum

    private def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val tmp = new Array[Byte](64 << 10)
      val baos = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
      while (!d.finished()) { val n = d.deflate(tmp); baos.write(tmp, 0, n) }
      d.end()
      baos.toByteArray
    }

    private def flushBlock(): Unit = if (blockRecs > 0) {
      blockOut.flush()
      val raw = blockBytes.toByteArray
      val comp = deflate(raw)
      // store-vs-deflate per block: keep raw when deflate doesn't
      // shrink (negative compLen in the index marks a stored block)
      if (comp.length < raw.length) {
        out.write(comp)
        blockIndex += ((filePos, comp.length, blockRecs))
        filePos += comp.length
      } else {
        out.write(raw)
        blockIndex += ((filePos, -raw.length, blockRecs))
        filePos += raw.length
      }
      blockBytes.reset()
      blockRecs = 0
    }

    /** v2: flush variable `j`'s pending block. A "store" codec never
      * runs the Deflater; "deflate" keeps the per-block raw fallback. */
    private def flushVarBlock(j: Int): Unit = if (varBlockRecs(j) > 0) {
      varBlockOut(j).flush()
      val raw = varBlockBytes(j).toByteArray
      val comp =
        if (varStore(j)) null
        else if (varZstd(j)) com.github.luben.zstd.Zstd.compress(raw, 3)
        else deflate(raw)
      if (comp != null && comp.length < raw.length) {
        out.write(comp)
        varBlockIndex(j) += ((filePos, comp.length, varBlockRecs(j)))
        filePos += comp.length
      } else {
        out.write(raw)
        varBlockIndex(j) += ((filePos, -raw.length, varBlockRecs(j)))
        filePos += raw.length
      }
      varBlockBytes(j).reset()
      varBlockRecs(j) = 0
    }

    private def nonNegBytes(v: Long): Array[Byte] =
      if (version == 5) ByteBuffer.allocate(8).putLong(v).array()
      else ByteBuffer.allocate(4).putInt(v.toInt).array()

    private def buildHeader(): Array[Byte] = {
      val buf = new java.io.ByteArrayOutputStream()
      val d = new DataOutputStream(buf)
      val nnW = if (version == 5) 8 else 4
      def nn(v: Long): Unit = d.write(nonNegBytes(v))
      def name(s: String): Unit = {
        val b = s.getBytes(StandardCharsets.UTF_8)
        nn(b.length.toLong); d.write(b)
        (0 until pad4(b.length.toLong).toInt).foreach(_ => d.writeByte(0))
      }
      def utf8Len(s: String): Int = s.getBytes(StandardCharsets.UTF_8).length
      def nameLen(s: String): Int = { val nb = utf8Len(s); nnW + nb + pad4(nb.toLong).toInt }
      // one user NC_CHAR attribute: name + nc_type + nelems + padded value
      def charAttrLen(kv: (String, String)): Int =
        nameLen(kv._1) + 4 + nnW + { val vb = utf8Len(kv._2); vb + pad4(vb.toLong).toInt }
      def writeCharAttr(kv: (String, String)): Unit = {
        name(kv._1)
        d.writeInt(NC_CHAR)
        val b = kv._2.getBytes(StandardCharsets.UTF_8)
        nn(b.length.toLong); d.write(b)
        (0 until pad4(b.length.toLong).toInt).foreach(_ => d.writeByte(0))
      }
      // one typed NC_DOUBLE attribute: 8-byte elements need no padding
      def dblAttrLen(kv: (String, Array[Double])): Int =
        nameLen(kv._1) + 4 + nnW + 8 * kv._2.length
      def writeDblAttr(kv: (String, Array[Double])): Unit = {
        name(kv._1)
        d.writeInt(NC_DOUBLE)
        nn(kv._2.length.toLong)
        kv._2.foreach(d.writeDouble)
      }
      d.writeBytes("CDF"); d.writeByte(version)
      nn(0L) // numRecs placeholder (patched on close)
      // dim_list: unlimited `record` + one fixed dim per array/string
      // var + one per fixed variable
      d.writeInt(TAG_DIM); nn(1L + extraDims.size)
      name("record"); nn(0L)
      extraDims.foreach { case (dn, dl) => name(dn); nn(dl) }
      // gatt_list: user global attributes (NC_CHAR text + typed NC_DOUBLE)
      if (gatts.isEmpty && dgatts.isEmpty) { d.writeInt(0); nn(0L) }
      else {
        d.writeInt(TAG_ATT); nn((gatts.size + dgatts.size).toLong)
        gatts.foreach(writeCharAttr)
        dgatts.foreach(writeDblAttr)
      }
      // var_list: record vars then fixed coordinate vars
      d.writeInt(TAG_VAR); nn(schema.size.toLong + fixedVars.size)
      // two passes: sizes depend only on names/types/ranks/attrs, so
      // compute the header length first, then assign begins
      // scalar numeric vars carry a 2-element actual_range attribute
      // (CF convention) whose value bytes are patched on close
      val rangeAttrLen: Int => Int = i =>
        if (!isTracked(i)) 0
        else {
          val valueBytes = 2 * typeSize(specs(i).ncType)
          nameLen("actual_range") + 4 + nnW + valueBytes + pad4(valueBytes.toLong).toInt
        }
      val userAttrs: Int => Seq[(String, String)] = i => vatts.getOrElse(specs(i).name, Nil)
      val userDblAttrs: Int => Seq[(String, Array[Double])] =
        i => dvatts.getOrElse(specs(i).name, Nil)
      val varHeaderLen = specs.zipWithIndex.map { case (v, i) =>
        val rank = if (v.isArray || v.isString) 2 else 1
        nameLen(v.name) +
          nnW + // rank
          rank * nnW + // dimids
          (4 + nnW) + userAttrs(i).map(charAttrLen).sum +
          userDblAttrs(i).map(dblAttrLen).sum + rangeAttrLen(i) + // vatt_list
          4 + // nc_type
          nnW + // vsize
          8 // begin (CDF-2/5)
      }.sum
      val fixedHeaderLen = fixedVars.map { case (n, _) =>
        nameLen(n) + nnW + nnW + (4 + nnW) + 4 + nnW + 8
      }.sum
      val headerLen = buf.size() + varHeaderLen + fixedHeaderLen
      var begin = headerLen + pad4(headerLen.toLong)
      // fixed variable data precedes record data
      val fixedBegins = fixedVars.map { case (_, vs) =>
        val b = begin
        begin += { val sz = 8L * vs.length; sz + pad4(sz) }
        b
      }
      specs.zipWithIndex.foreach { case (v, i) =>
        name(v.name)
        if (v.isArray || v.isString) {
          nn(2L); nn(0L); nn(dimIdOf(s"${v.name}_dim").toLong)
        } else {
          nn(1L); nn(0L)
        }
        val nAtts = userAttrs(i).size + userDblAttrs(i).size + (if (isTracked(i)) 1 else 0)
        if (nAtts == 0) { d.writeInt(0); nn(0L) } // absent vatt_list
        else {
          d.writeInt(TAG_ATT); nn(nAtts.toLong)
          userAttrs(i).foreach(writeCharAttr)
          userDblAttrs(i).foreach(writeDblAttr)
          if (isTracked(i)) {
            name("actual_range")
            d.writeInt(v.ncType); nn(2L)
            rangeValueOffset(i) = buf.size().toLong
            val valueBytes = 2 * typeSize(v.ncType)
            (0 until valueBytes + pad4(valueBytes.toLong).toInt)
              .foreach(_ => d.writeByte(0)) // placeholder, patched on close
          }
        }
        d.writeInt(v.ncType)
        nn(v.slab.toLong + slabPad(i))
        d.writeLong(begin)
        begin += v.slab + slabPad(i)
      }
      fixedVars.zip(fixedBegins).foreach { case ((n, vs), b) =>
        name(n)
        nn(1L); nn(dimIdOf(s"${n}_dim").toLong)
        d.writeInt(0); nn(0L) // no vatts on coordinate vars
        d.writeInt(NC_DOUBLE)
        nn({ val sz = 8L * vs.length; sz + pad4(sz) })
        d.writeLong(b)
      }
      // NOTE: record var begins point at each var's slab offset within
      // record 0; successive records advance by recSize.
      val bytes = buf.toByteArray
      bytes ++ new Array[Byte](pad4(bytes.length.toLong).toInt)
    }

    private def writeScalar(ncType: Int, v: Any): Unit = ncType match {
      case NC_DOUBLE => rec.writeDouble(v.asInstanceOf[Double])
      case NC_FLOAT => rec.writeFloat(v.asInstanceOf[Float])
      case NC_INT => rec.writeInt(v.asInstanceOf[Int])
      case NC_INT64 => rec.writeLong(v.asInstanceOf[Long])
      case NC_SHORT => rec.writeShort(v.asInstanceOf[Short].toInt)
      case NC_BYTE => rec.writeByte(v.asInstanceOf[Byte].toInt)
      case NC_CHAR => rec.writeByte(v.asInstanceOf[Byte].toInt)
    }

    /** Append one record. `get(i)` must return: scalar columns — the
      * boxed value; array columns — Array[_] of exactly the declared
      * length; string columns — Array[Byte] (UTF-8), truncated/padded
      * to the declared width. */
    def writeRow(get: Int => Any): Unit = {
      var i = 0
      while (i < specs.length) {
        curVar = i
        val v = specs(i)
        if (v.isString) {
          val b = get(i).asInstanceOf[Array[Byte]]
          val n = math.min(b.length, v.extra)
          rec.write(b, 0, n)
          (n until v.extra).foreach(_ => rec.writeByte(0))
        } else if (v.isArray) {
          val arr = get(i).asInstanceOf[Array[_]]
          require(arr.length == v.extra,
            s"array column ${v.name}: row has ${arr.length} elements, declared ${v.extra}")
          arr.foreach(e => writeScalar(v.ncType, e))
        } else {
          val value = get(i)
          if (isIntFamily(i)) {
            val l = value match {
              case x: Byte => x.toLong
              case x: Short => x.toLong
              case x: Int => x.toLong
              case x: Long => x
            }
            if (l < minL(i)) minL(i) = l
            if (l > maxL(i)) maxL(i) = l
          } else {
            val dv = value match {
              case x: Float => x.toDouble
              case x: Double => x
            }
            if (dv < minD(i)) minD(i) = dv
            if (dv > maxD(i)) maxD(i) = dv
          }
          writeScalar(v.ncType, value)
        }
        (0 until slabPad(i)).foreach(_ => rec.writeByte(0))
        i += 1
      }
      numRecs += 1
      if (v2) {
        var j = 0
        while (j < specs.length) {
          varBlockRecs(j) += 1
          if (varBlockRecs(j) == varRpb(j)) flushVarBlock(j)
          j += 1
        }
      } else if (compressChunks) {
        blockRecs += 1
        if (blockRecs == recordsPerBlock) flushBlock()
      }
    }

    def close(): Unit = {
      if (v2) {
        specs.indices.foreach(flushVarBlock) // partial tail blocks
        val footerStart = filePos
        out.writeInt(specs.length)
        specs.indices.foreach { j =>
          out.writeLong(varRpb(j).toLong)
          out.writeByte(if (varStore(j)) 0 else if (varZstd(j)) 2 else 1)
          out.writeInt(varBlockIndex(j).size)
          varBlockIndex(j).foreach { case (off, clen, nrecs) =>
            out.writeLong(off); out.writeInt(clen); out.writeInt(nrecs)
          }
        }
        out.writeLong(footerStart)
        out.writeInt(NCZ2_MAGIC)
      } else if (compressChunks) {
        flushBlock() // partial tail block
        val footerStart = filePos
        out.writeInt(blockIndex.size)
        out.writeLong(recordsPerBlock.toLong)
        blockIndex.foreach { case (off, clen, nrecs) =>
          out.writeLong(off); out.writeInt(clen); out.writeInt(nrecs)
        }
        out.writeLong(footerStart)
        out.writeInt(NCZ_MAGIC)
      }
      out.close()
      val raf = new RandomAccessFile(path, "rw")
      try {
        raf.seek(4)
        raf.write(nonNegBytes(numRecs))
        // patch the per-var actual_range zone maps (only when records
        // were written; zero-record files keep the zero placeholder and
        // are pruned by numRecs anyway)
        if (numRecs > 0) {
          specs.indices.foreach { i =>
            if (isTracked(i)) {
              raf.seek(rangeValueOffset(i))
              specs(i).ncType match {
                case NC_DOUBLE => raf.writeDouble(minD(i)); raf.writeDouble(maxD(i))
                case NC_FLOAT =>
                  raf.writeFloat(minD(i).toFloat); raf.writeFloat(maxD(i).toFloat)
                case NC_INT => raf.writeInt(minL(i).toInt); raf.writeInt(maxL(i).toInt)
                case NC_INT64 => raf.writeLong(minL(i)); raf.writeLong(maxL(i))
                case NC_SHORT =>
                  raf.writeShort(minL(i).toInt); raf.writeShort(maxL(i).toInt)
                case NC_BYTE => raf.writeByte(minL(i).toInt); raf.writeByte(maxL(i).toInt)
              }
            }
          }
        }
      } finally raf.close()
    }
  }

  // ---------------------------------------------------------- chunk read

  /** Chunked reader over a record range [r0, r1) of one file —
    * yieldNumpyData semantics: pulls `recordsPerChunk` records into one
    * buffer per call and exposes typed accessors for the requested
    * variables only. */
  final class RangeReader(
      fs: FileSystem,
      path: Path,
      meta: NcMeta,
      r0: Long,
      r1: Long,
      wanted: Seq[String],
      chunkBytes: Int = 4 << 20) {

    private val raf = openData(fs, path)
    // chunk loads move strictly forward through the record range, so a
    // decompressing (forward-only) stream works: seeks become skips.
    private var pos = 0L
    private def seekTo(target: Long): Unit = raf match {
      case s: FSDataInputStream => s.seek(target); pos = target
      case _ =>
        require(target >= pos,
          s"$path: compressed NetCDF input is forward-only (at $pos, asked $target)")
        var left = target - pos
        while (left > 0) {
          val sk = raf.skip(left)
          if (sk <= 0) throw new EOFException(s"failed to skip to $target in $path")
          left -= sk
        }
        pos = target
    }
    private val recSize = meta.recSize
    /** .ncz: block-index footer; chunk loads become (seek, readFully
      * compLen, inflate) per block — random access into compressed
      * data, which is what makes the file splittable. */
    /** v2 (per-variable) block index, when the footer is var-major. */
    private var ncz2: NczIndex2 = null
    private val nczIdx: NczIndex = if (isChunked(path)) {
      readNczAny(fs, path) match {
        case Left(v1) => v1
        case Right(v2) => ncz2 = v2; null
      }
    } else {
      // loud-reject posture: a block-compressed file misnamed `.nc`
      // would otherwise decode deflate streams as record bytes —
      // silent garbage. One 4-byte tail read per reader open (plain
      // seekable inputs only; gzip streams are forward-only and their
      // .gz name IS the codec contract).
      raf match {
        case s: FSDataInputStream =>
          val len = fs.getFileStatus(path).getLen
          if (len >= 12) {
            s.seek(len - 12)
            val tail = new Array[Byte](12)
            s.readFully(tail)
            val bb = java.nio.ByteBuffer.wrap(tail)
            val footerStart = bb.getLong
            val magic = bb.getInt
            // magic alone could collide with record data (2^-32); a
            // colliding file would also need a valid footer pointer
            if ((magic == NCZ_MAGIC || magic == NCZ2_MAGIC) &&
                footerStart >= 0 && footerStart <= len - 12)
              throw new java.io.IOException(
                s"$path: block-compressed (.ncz) footer magic in a file not named .ncz — " +
                  "rename it or read it through the .ncz path")
            s.seek(0L)
          }
        case _ =>
      }
      null
    }

    /** (var, offsetWithinRecord) for requested vars, in request order. */
    private val slots: Seq[(NcVarMeta, Long)] = {
      var off = 0L
      val offsets = meta.recordVars.map { v =>
        val o = off
        val s = v.slabSize(meta.dims)
        off += (if (meta.recordVars.size == 1) s else s + pad4(s))
        v.name -> (v, o)
      }.toMap
      wanted.map(offsets(_))
    }

    /** v2 assembly plan per wanted var: (index into ncz2.vars — header
      * var order, record stride, interleave offset within the record). */
    private val v2Slots: Array[(Int, Int, Int)] = if (ncz2 == null) null else {
      var off = 0L
      val byName = meta.recordVars.zipWithIndex.map { case (v, j) =>
        val s = v.slabSize(meta.dims)
        val stride = if (meta.recordVars.size == 1) s else s + pad4(s)
        val o = off
        off += stride
        v.name -> ((j, stride.toInt, o.toInt))
      }.toMap
      wanted.map(byName(_)).toArray
    }
    // one-block inflate cache per wanted var: sequential chunk loads
    // re-slice the same var block until it is exhausted, so each block
    // is read+inflated exactly once per partition interior
    private val v2Cache: Array[Array[Byte]] =
      if (ncz2 == null) null else new Array[Array[Byte]](wanted.size)
    private val v2CacheBlock: Array[Int] =
      if (ncz2 == null) null else Array.fill(wanted.size)(-1)

    val recordsPerChunk: Int =
      if (ncz2 != null) {
        // the chunk grid follows the finest-chunked WANTED var (others
        // are sliced from their cached larger blocks); count-only scans
        // (no wanted vars) just need any bounded stride
        val rs: Seq[Long] =
          if (v2Slots.nonEmpty) v2Slots.toSeq.map(t => ncz2.vars(t._1).recordsPerBlock)
          else ncz2.vars.toSeq.map(_.recordsPerBlock)
        math.max(1L, rs.min).toInt
      } else if (nczIdx != null) nczIdx.recordsPerBlock.toInt
      else math.max(1L, chunkBytes / math.max(recSize, 1L)).toInt
    private val dataStart: Long = meta.recordVars.map(_.begin).minOption.getOrElse(0L)

    private var next = r0
    private var buf: Array[Byte] = Array.emptyByteArray
    private var bufStart = 0L // record index of buf(0)
    private var bufCount = 0

    def hasNext: Boolean = next < r1

    /** Load the next chunk; returns the number of records loaded. */
    def loadChunk(): Int =
      if (ncz2 != null) loadNcz2Chunk()
      else if (nczIdx != null) loadNczBlock() else {
      val n = math.min(recordsPerChunk.toLong, r1 - next).toInt
      val bytes = (n * recSize).toInt
      if (buf.length < bytes) buf = new Array[Byte](bytes)
      seekTo(dataStart + next * recSize)
      raf.readFully(buf, 0, bytes)
      pos += bytes
      bufStart = next
      bufCount = n
      next += n
      n
    }

    /** .ncz chunk load: inflate the block covering `next` and expose
      * its in-range records. A partition whose bounds are not
      * block-aligned re-inflates only its two boundary blocks (the
      * autotuned split size is a multiple of the chunk size, so with
      * matching chunkBytes the bounds align and nothing is re-read). */
    private def loadNczBlock(): Int = {
      val rpb = nczIdx.recordsPerBlock
      val b = (next / rpb).toInt
      val (off, clen, nrecs) = nczIdx.blocks(b)
      val rawLen = nrecs * recSize.toInt
      if (buf.length < rawLen) buf = new Array[Byte](rawLen)
      if (clen < 0) {
        // stored block (incompressible): raw bytes, no inflation
        require(-clen == rawLen, s"$path block $b: stored ${-clen} != $rawLen bytes")
        seekTo(off)
        raf.readFully(buf, 0, rawLen)
        pos += rawLen
      } else {
        val comp = new Array[Byte](clen)
        seekTo(off)
        raf.readFully(comp)
        pos += clen
        val inf = new java.util.zip.Inflater()
        inf.setInput(comp)
        var filled = 0
        while (filled < rawLen && !inf.finished()) {
          val n = inf.inflate(buf, filled, rawLen - filled)
          if (n == 0 && inf.needsInput()) throw new EOFException(s"truncated .ncz block $b in $path")
          filled += n
        }
        inf.end()
        require(filled == rawLen, s"$path block $b: inflated $filled of $rawLen bytes")
      }
      val startInBlock = (next - b * rpb).toInt
      val n = math.min(nrecs.toLong - startInBlock, r1 - next).toInt
      // shift the in-range records to the front so slot offsets (which
      // assume the chunk starts at record `bufStart`) stay uniform
      if (startInBlock > 0)
        System.arraycopy(buf, startInBlock * recSize.toInt, buf, 0, n * recSize.toInt)
      bufStart = next
      bufCount = n
      next += n
      n
    }

    /** v2 (per-variable blocks) chunk load: the chunk extent stops at
      * the nearest wanted-var block boundary; each wanted var's covering
      * block is read+inflated once (per-var cache) and its record slabs
      * are interleaved into `buf` at the var's record offset, so every
      * accessor keeps the uniform record-major layout. Variables NOT in
      * the projection are never read — columnar pruning the interleaved
      * v1 layout cannot do. */
    private def loadNcz2Chunk(): Int = {
      var n: Long = r1 - next
      var s = 0
      while (s < v2Slots.length) {
        val rpb = ncz2.vars(v2Slots(s)._1).recordsPerBlock
        val boundary = (next / rpb + 1L) * rpb
        if (boundary - next < n) n = boundary - next
        s += 1
      }
      if (n > recordsPerChunk) n = recordsPerChunk // count-only scans
      val nI = n.toInt
      val bytes = nI * recSize.toInt
      if (buf.length < bytes) buf = new Array[Byte](bytes)
      s = 0
      while (s < v2Slots.length) {
        val (vj, stride, slotOff) = v2Slots(s)
        val vi = ncz2.vars(vj)
        val rpb = vi.recordsPerBlock
        val b = (next / rpb).toInt
        if (v2CacheBlock(s) != b) {
          val (off, clen, nrecs) = vi.blocks(b)
          val rawLen = nrecs * stride
          val raw = new Array[Byte](rawLen)
          if (clen < 0) {
            require(-clen == rawLen, s"$path var $vj block $b: stored ${-clen} != $rawLen bytes")
            seekTo(off)
            raf.readFully(raw, 0, rawLen)
            pos += rawLen
          } else {
            val comp = new Array[Byte](clen)
            seekTo(off)
            raf.readFully(comp)
            pos += clen
            if (vi.codec == 2) {
              // zstd block (codec byte 2)
              val k = com.github.luben.zstd.Zstd.decompress(raw, comp)
              require(k == rawLen, s"$path var $vj block $b: zstd $k of $rawLen bytes")
            } else {
              val inf = new java.util.zip.Inflater()
              inf.setInput(comp)
              var filled = 0
              while (filled < rawLen && !inf.finished()) {
                val k = inf.inflate(raw, filled, rawLen - filled)
                if (k == 0 && inf.needsInput())
                  throw new EOFException(s"truncated .ncz var $vj block $b in $path")
                filled += k
              }
              inf.end()
              require(filled == rawLen, s"$path var $vj block $b: inflated $filled of $rawLen bytes")
            }
          }
          v2Cache(s) = raw
          v2CacheBlock(s) = b
        }
        val startInBlock = (next - b.toLong * rpb).toInt
        val src = v2Cache(s)
        var k = 0
        while (k < nI) {
          System.arraycopy(src, (startInBlock + k) * stride, buf, k * recSize.toInt + slotOff, stride)
          k += 1
        }
        s += 1
      }
      bufStart = next
      bufCount = nI
      next += nI
      nI
    }

    def chunkStartRecord: Long = bufStart

    /** nc_type of slot `slot` (for typed columnar fills). */
    def slotType(slot: Int): Int = slots(slot)._1.ncType

    /** Whether slot `slot` is a scalar (single-element slab). */
    def slotIsScalar(slot: Int): Boolean = {
      val (v, _) = slots(slot)
      v.ncType != NC_CHAR && v.slabSize(meta.dims) == typeSize(v.ncType)
    }

    private def slotBase(slot: Int, i: Int): Int = (i * recSize + slots(slot)._2).toInt

    /** Element count of slot `slot`'s per-record slab. */
    def slotElems(slot: Int): Int = {
      val (v, _) = slots(slot)
      (v.slabSize(meta.dims) / typeSize(v.ncType)).toInt
    }

    /** Raw chunk buffer + slab offset, for zero-copy columnar fills of
      * NC_CHAR slabs (the caller trims trailing NULs). */
    def rawBuf: Array[Byte] = buf
    def slotOffset(slot: Int, i: Int): Int = slotBase(slot, i)

    // element accessors for multi-element (rank-2) numeric slabs
    def getDoubleElem(slot: Int, i: Int, k: Int): Double =
      ByteBuffer.wrap(buf, slotBase(slot, i) + 8 * k, 8).getDouble
    def getFloatElem(slot: Int, i: Int, k: Int): Float =
      ByteBuffer.wrap(buf, slotBase(slot, i) + 4 * k, 4).getFloat
    def getIntElem(slot: Int, i: Int, k: Int): Int =
      ByteBuffer.wrap(buf, slotBase(slot, i) + 4 * k, 4).getInt
    def getLongElem(slot: Int, i: Int, k: Int): Long =
      ByteBuffer.wrap(buf, slotBase(slot, i) + 8 * k, 8).getLong

    def getDoubleAt(slot: Int, i: Int): Double = ByteBuffer.wrap(buf, slotBase(slot, i), 8).getDouble
    def getFloatAt(slot: Int, i: Int): Float = ByteBuffer.wrap(buf, slotBase(slot, i), 4).getFloat
    def getIntAt(slot: Int, i: Int): Int = ByteBuffer.wrap(buf, slotBase(slot, i), 4).getInt
    def getLongAt(slot: Int, i: Int): Long = ByteBuffer.wrap(buf, slotBase(slot, i), 8).getLong
    def getShortAt(slot: Int, i: Int): Short = ByteBuffer.wrap(buf, slotBase(slot, i), 2).getShort
    def getByteAt(slot: Int, i: Int): Byte = buf(slotBase(slot, i))

    /** Read slot `slot` of in-chunk record `i` as a double (widening). */
    def getDouble(slot: Int, i: Int): Double = {
      val (v, off) = slots(slot)
      val base = (i * recSize + off).toInt
      v.ncType match {
        case NC_DOUBLE => ByteBuffer.wrap(buf, base, 8).getDouble
        case NC_FLOAT => ByteBuffer.wrap(buf, base, 4).getFloat.toDouble
        case NC_INT => ByteBuffer.wrap(buf, base, 4).getInt.toDouble
        case NC_INT64 => ByteBuffer.wrap(buf, base, 8).getLong.toDouble
        case NC_SHORT => ByteBuffer.wrap(buf, base, 2).getShort.toDouble
        case NC_BYTE => buf(base).toDouble
      }
    }

    /** Read slot `slot` of in-chunk record `i` boxed in its own type.
      * NC_CHAR slabs come back as Array[Byte] (zero-trimmed by the
      * caller); multi-element numeric slabs as Array[_]. */
    def getValue(slot: Int, i: Int): Any = {
      val (v, off) = slots(slot)
      val base = (i * recSize + off).toInt
      val nElems = (v.slabSize(meta.dims) / typeSize(v.ncType)).toInt
      def scalar(pos: Int): Any = v.ncType match {
        case NC_DOUBLE => ByteBuffer.wrap(buf, pos, 8).getDouble
        case NC_FLOAT => ByteBuffer.wrap(buf, pos, 4).getFloat
        case NC_INT => ByteBuffer.wrap(buf, pos, 4).getInt
        case NC_INT64 => ByteBuffer.wrap(buf, pos, 8).getLong
        case NC_SHORT => ByteBuffer.wrap(buf, pos, 2).getShort
        case NC_BYTE | NC_CHAR => buf(pos)
      }
      if (v.ncType == NC_CHAR) {
        java.util.Arrays.copyOfRange(buf, base, base + nElems)
      } else if (nElems > 1) {
        val ts = typeSize(v.ncType)
        Array.tabulate[Any](nElems)(k => scalar(base + k * ts))
      } else scalar(base)
    }

    def close(): Unit = raf.close()
  }
}
