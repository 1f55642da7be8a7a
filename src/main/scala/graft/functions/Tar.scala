package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** From-spec POSIX ustar codec (SURVEY.md §2C multimodal packaging —
  * WebDataset shards ARE tar files, so materializing real shard BYTES
  * is the step between `mm_pack_shards`' planning and something a
  * training loader mounts). Layout per the POSIX.1-1988 ustar format:
  * 512-byte headers (name, octal size/mode/mtime, checksum over the
  * header with the checksum field blanked, `ustar` magic, and the
  * 155-byte prefix field for member paths of 101-255 bytes split at a
  * '/' boundary), 512-padded payloads, two zero blocks at the end.
  *
  * Writer determinism: mode 0644, uid/gid 0, mtime 0 — identical
  * input entries render identical shard bytes on every engine run,
  * so byte lengths and member offsets are oracle-checkable
  * arithmetic. The parser VERIFIES magic and checksum on every header
  * and bounds every payload — a flipped header byte or truncated
  * shard rejects loudly, never a silently wrong member table.
  *
  * Both directions are native Catalyst expressions whose generated
  * code calls these (static-forwarded) methods — the per-SHARD call
  * rides inside whole-stage codegen without a UDF. */
object TarCodec {

  private val BLOCK = 512

  private def pad(n: Long): Long = ((n + BLOCK - 1) / BLOCK) * BLOCK

  private def putOctal(hdr: Array[Byte], off: Int, width: Int, v: Long): Unit = {
    // width-1 octal digits + NUL, zero-padded (the GNU/ustar norm)
    var i = width - 2
    var x = v
    hdr(off + width - 1) = 0
    while (i >= 0) { hdr(off + i) = ('0' + (x & 7).toInt).toByte; x >>= 3; i -= 1 }
    require(x == 0, s"octal field overflow: $v in width $width")
  }

  /** One 512-byte header + 512-padded payload. `nameField` fills the
    * 100-byte name slot; `prefix` (may be empty) the 155-byte POSIX
    * prefix slot at 345. */
  private def writeMember(bos: java.io.ByteArrayOutputStream, nameField: Array[Byte],
      prefix: Array[Byte], typeflag: Byte, data: Array[Byte]): Unit = {
    val hdr = new Array[Byte](BLOCK)
    System.arraycopy(nameField, 0, hdr, 0, nameField.length)
    System.arraycopy(prefix, 0, hdr, 345, prefix.length)
    putOctal(hdr, 100, 8, 0x1a4) // mode 0644
    putOctal(hdr, 108, 8, 0) // uid
    putOctal(hdr, 116, 8, 0) // gid
    putOctal(hdr, 124, 12, data.length.toLong)
    putOctal(hdr, 136, 12, 0) // mtime: fixed for determinism
    java.util.Arrays.fill(hdr, 148, 156, ' '.toByte) // chksum blank
    hdr(156) = typeflag
    System.arraycopy("ustar".getBytes("ASCII"), 0, hdr, 257, 5)
    hdr(263) = '0'; hdr(264) = '0' // version
    var sum = 0L
    var j = 0
    while (j < BLOCK) { sum += hdr(j) & 0xff; j += 1 }
    putOctal(hdr, 148, 7, sum) // 6 digits + NUL...
    hdr(155) = ' ' // ...+ space, the historical chksum framing
    bos.write(hdr)
    bos.write(data)
    val padN = (pad(data.length.toLong) - data.length).toInt
    var k = 0
    while (k < padN) { bos.write(0); k += 1 }
  }

  private val emptyPrefix = new Array[Byte](0)
  private val longLinkName = "././@LongLink".getBytes("ASCII")

  /** Render one ustar archive from (name, data) entries.
    *
    * Name encoding ladder, most-portable first (r14, r13 verdict #8):
    * <= 100 bytes inline; 101-255 bytes with a '/' on the legal
    * boundary via the POSIX prefix split (pure ustar, reads anywhere);
    * otherwise a GNU type-'L' "././@LongLink" member carries the full
    * NUL-terminated path and the real header gets the first 100 bytes
    * — the encoding GNU/BSD tar and every WebDataset loader read, so
    * re-sharding wild archives with deep key paths roundtrips instead
    * of rejecting. Determinism holds: the ladder depends only on the
    * name bytes. */
  def pack(entries: ArrayData): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < entries.numElements()) {
      val row = entries.getStruct(i, 2)
      val nameB = row.getUTF8String(0).getBytes
      val data = row.getBinary(1)
      require(nameB.length > 0, "empty tar member name")
      if (nameB.length <= 100) {
        writeMember(bos, nameB, emptyPrefix, '0', data)
      } else {
        // POSIX ustar prefix split: full path = prefix + '/' + name,
        // prefix <= 155 bytes (header offset 345), name <= 100 bytes.
        // The split must land on a '/'; the leftmost valid one keeps
        // the name part longest and is deterministic. Real WebDataset
        // member keys (URL-derived ids) exceed 100 chars routinely.
        var cut = -1
        if (nameB.length <= 255) {
          var j = math.max(nameB.length - 101, 1)
          val hi = math.min(155, nameB.length - 2)
          while (cut < 0 && j <= hi) { if (nameB(j) == '/') cut = j; j += 1 }
        }
        if (cut > 0) {
          writeMember(bos, java.util.Arrays.copyOfRange(nameB, cut + 1, nameB.length),
            java.util.Arrays.copyOfRange(nameB, 0, cut), '0', data)
        } else {
          // no legal ustar split: GNU long-name escape
          writeMember(bos, longLinkName, emptyPrefix, 'L',
            java.util.Arrays.copyOf(nameB, nameB.length + 1)) // + trailing NUL
          // fallback name for pure-ustar readers that ignore the 'L'
          // record (r15, r14 ADVICE): truncate at the last UTF-8
          // boundary <= 99 bytes so the field never cuts mid-sequence
          // (raw 100-byte truncation rendered full-width mojibake),
          // and leave byte `cut` zero — the NUL terminator — matching
          // GNU tar's friendlier degradation for non-GNU readers
          var cut = 99
          while (cut > 0 && (nameB(cut) & 0xC0) == 0x80) cut -= 1
          writeMember(bos, java.util.Arrays.copyOf(nameB, cut), emptyPrefix, '0', data)
        }
      }
      i += 1
    }
    bos.write(new Array[Byte](2 * BLOCK)) // end-of-archive
    bos.toByteArray
  }

  /** Parse an archive's member table: (name, payload offset, size).
    * Verifies magic + checksum per header and payload bounds.
    *
    * r13 (r12 verdict #8 — wild archives): READS the two long-name
    * encodings real tools emit past ustar's 255-byte/split limits —
    *  - GNU type-'L' ("././@LongLink"): the payload is the NEXT
    *    member's full path, NUL-terminated;
    *  - GNU type-'K': the next member's long LINK TARGET — consumed,
    *    not a data member (r14; link targets aren't surfaced);
    *  - PAX type-'x' extended headers: "len key=value\n" records whose
    *    `path` key overrides the next member's name (other keys are
    *    metadata we don't surface and safely skip).
    * A PAX GLOBAL header (type 'g') carrying `path` stays a LOUD
    * reject — a global name override is ambiguous for a member table.
    * The WRITER emits type-'L' for beyond-ustar paths (r14) so
    * re-sharding wild archives roundtrips; it never emits PAX. */
  def members(bytes: Array[Byte]): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var off = 0
    var done = false
    var pendingName: String = null // from a preceding 'L' or PAX 'x' header
    while (!done) {
      if (off + BLOCK > bytes.length)
        throw new java.io.IOException(s"tar truncated: header at $off past ${bytes.length}")
      var allZero = true
      var j = 0
      while (allZero && j < BLOCK) { if (bytes(off + j) != 0) allZero = false; j += 1 }
      if (allZero) done = true // end-of-archive marker
      else {
        if (!(bytes(off + 257) == 'u' && bytes(off + 258) == 's' &&
            bytes(off + 259) == 't' && bytes(off + 260) == 'a' && bytes(off + 261) == 'r'))
          throw new java.io.IOException(s"tar header at $off: bad ustar magic")
        var sum = 0L
        j = 0
        while (j < BLOCK) {
          sum += (if (j >= 148 && j < 156) ' '.toInt else bytes(off + j) & 0xff)
          j += 1
        }
        val stored = parseOctal(bytes, off + 148, 8)
        if (stored != sum)
          throw new java.io.IOException(
            s"tar header at $off: checksum mismatch (stored $stored, computed $sum)")
        val size = parseOctal(bytes, off + 124, 12)
        if (off + BLOCK + size > bytes.length)
          throw new java.io.IOException(
            s"tar header at $off: payload $size overruns archive ${bytes.length}")
        val typeflag = bytes(off + 156).toChar
        typeflag match {
          case 'L' => // GNU long name: payload names the NEXT member
            var end = size.toInt
            while (end > 0 && bytes(off + BLOCK + end - 1) == 0) end -= 1
            pendingName = new String(bytes, off + BLOCK, end, "UTF-8")
          case 'K' =>
            // GNU long LINKNAME: payload is the next member's link
            // target. The member table doesn't surface link targets,
            // so the record is consumed (never emitted as a bogus
            // "././@LongLink" data member) and the next header parses
            // normally. r14 (r13 ADVICE): previously fell into the
            // default branch — a silent misparse.
            ()
          case 'x' | 'g' =>
            val path = paxPath(bytes, off + BLOCK, size.toInt)
            if (typeflag == 'g' && path != null)
              throw new java.io.IOException(
                s"tar PAX global header at $off carries a path override — unsupported")
            if (typeflag == 'x' && path != null) pendingName = path
          case _ =>
            var nl = 0
            while (nl < 100 && bytes(off + nl) != 0) nl += 1
            // POSIX prefix field (offset 345, 155 bytes): when
            // non-empty, the full path is prefix + '/' + name — unless
            // a long-name record already named this member (PAX rule:
            // the extended header wins over the ustar fields)
            var pl = 0
            while (pl < 155 && bytes(off + 345 + pl) != 0) pl += 1
            val name =
              if (pendingName != null) pendingName
              else if (pl == 0) new String(bytes, off, nl, "UTF-8")
              else new String(bytes, off + 345, pl, "UTF-8") + "/" +
                new String(bytes, off, nl, "UTF-8")
            pendingName = null
            out += InternalRow(UTF8String.fromString(name), (off + BLOCK).toLong, size)
        }
        off += (BLOCK + pad(size)).toInt
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** The `path` record of a PAX extended-header payload, or null.
    * Records are "<len> <key>=<value>\n" with len counting the WHOLE
    * record (len digits, space, key, '=', value, newline); a malformed
    * length or framing rejects loudly. */
  private def paxPath(bytes: Array[Byte], start: Int, size: Int): String = {
    var p = start
    val end = start + size
    var path: String = null
    while (p < end) {
      var q = p
      var len = 0
      while (q < end && bytes(q) >= '0' && bytes(q) <= '9') {
        len = len * 10 + (bytes(q) - '0'); q += 1
      }
      if (q == p || q >= end || bytes(q) != ' ' || len <= 0 || p + len > end ||
          bytes(p + len - 1) != '\n')
        throw new java.io.IOException(s"malformed PAX record at $p")
      val rec = new String(bytes, q + 1, p + len - 1 - (q + 1), "UTF-8")
      val eq = rec.indexOf('=')
      if (eq < 0) throw new java.io.IOException(s"PAX record without '=' at $p")
      if (rec.substring(0, eq) == "path") path = rec.substring(eq + 1)
      p += len
    }
    path
  }

  /** Octal field: leading spaces/zeros, digits, then a NUL/space
    * terminator; bytes after the terminator must be NUL or space
    * (padding). A digit after the terminator (e.g. "123\0 45") is a
    * malformed field and rejects loudly instead of silently parsing
    * 0o12345 the way a scan-all-digits loop would. */
  private def parseOctal(bytes: Array[Byte], off: Int, width: Int): Long = {
    var v = 0L
    var i = 0
    var seen = false
    var terminated = false
    while (i < width) {
      val c = bytes(off + i) & 0xff
      if (c >= '0' && c <= '7') {
        if (terminated) throw new java.io.IOException(
          s"octal digit after field terminator in tar header at ${off + i}")
        v = (v << 3) | (c - '0'); seen = true
      } else if (c == ' ' || c == 0) {
        if (seen) terminated = true
        else if (c == 0) throw new java.io.IOException(
          s"NUL before any digit in tar header octal field at ${off + i}")
        // leading space before digits: legal padding, skip
      } else throw new java.io.IOException(
        s"bad octal byte 0x${c.toHexString} in tar header field at ${off + i}")
      i += 1
    }
    require(seen, s"empty octal field at $off")
    v
  }

  private val memberType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("size", LongType, nullable = false)))

  case class TarPack(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StructType(Array(
          StructField(_, StringType, _, _), StructField(_, BinaryType, _, _))), _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case o => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"tar_pack needs array<struct<string, binary>>, got $o")
      }
    override def nullSafeEval(v: Any): Any =
      TarCodec.pack(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TarCodec.pack($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class TarMembers(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(memberType, containsNull = false)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case BinaryType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case o => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"tar_members needs binary, got $o")
      }
    override def nullSafeEval(v: Any): Any =
      TarCodec.members(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TarCodec.members($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def tar_pack(entries: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      TarPack(org.apache.spark.sql.GraftBridge.expression(entries)))
  def tar_members(archive: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      TarMembers(org.apache.spark.sql.GraftBridge.expression(archive)))
}
