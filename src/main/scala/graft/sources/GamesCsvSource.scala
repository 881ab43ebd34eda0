package graft.sources

import java.util.{Map => JMap}

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite,
  Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter,
  DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate,
  Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter,
  GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField,
  StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A REAL custom connector: the games CSV as a DataSource V2
  * `TableProvider` — the "build the source yourself" rung of the
  * sources surface ([[GamesSource.readCsv]] is the builtin-reader
  * production path; this one owns every byte). What it implements,
  * the way a 100 TB source must:
  *
  *  - **parallel byte-range splits**: the file is planned as newline-
  *    aligned `[start, end)` partitions (`maxSplitBytes` option; a
  *    reader that starts mid-line skips to the next boundary, and the
  *    previous reader finishes the straddling line — the classic
  *    text-split contract, so N executors read one file with no
  *    coordination and no double-reads);
  *  - **column pruning** (`SupportsPushDownRequiredColumns`): only the
  *    projected fields are converted and carried — `explain` shows the
  *    scan emitting exactly the pruned output;
  *  - **filter pushdown** (`SupportsPushDownFilters`): integer
  *    comparisons on `AppID` are accepted into the scan and evaluated
  *    before a row is materialized; everything else is returned as a
  *    residual for Spark to apply;
  *  - **quirk-preserving parsing**: quoted fields with embedded
  *    commas, doubled-quote escapes, empty→NULL fields, and
  *    short/corrupt rows dropped — the same rows the builtin PERMISSIVE
  *    reader captures-and-excludes and DuckDB's `ignore_errors`
  *    rejects, so all three readers agree (the g23 gate pins this
  *    against the SAME oracle as g22). Embedded newlines are out of
  *    contract, exactly like the builtin reader's default
  *    `multiLine=false`.
  *
  * Registered as `games-csv` via `DataSourceRegister`; the fully
  * qualified class name works too.
  */
class GamesCsvSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "games-csv"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GamesCsvSource.dataSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "games-csv requires a path")
    new GamesCsvSource.GamesCsvTable(path)
  }
}

object GamesCsvSource {

  /** [[GamesSource.schema]] minus the corrupt-capture column: this
    * reader drops malformed rows instead of capturing them. */
  val dataSchema: StructType = StructType(Seq(
    StructField("AppID", IntegerType),
    StructField("Name", StringType),
    StructField("release_date", StringType),
    StructField("clean_price", StringType),
    StructField("avg_owners", StringType),
    StructField("Developers", StringType),
    StructField("Genres", StringType)))

  val defaultSplitBytes: Long = 128L * 1024 * 1024

  private val nFields = dataSchema.length

  /** RFC-4180-style line parse (quote `"`, doubled-quote escape).
    * Returns null for a row with the wrong field count. */
  private[graft] def parseLine(line: String): Array[String] = {
    val out = new ArrayBuffer[String](nFields)
    val sb = new java.lang.StringBuilder
    var i = 0
    var inQ = false
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') {
            sb.append('"'); i += 1
          } else inQ = false
        } else sb.append(c)
      } else c match {
        case ',' => out += sb.toString; sb.setLength(0)
        case '"' => inQ = true
        case other => sb.append(other)
      }
      i += 1
    }
    out += sb.toString
    if (out.length == nFields) out.toArray else null
  }

  private final class GamesCsvTable(path: String)
      extends Table with SupportsRead with SupportsWrite {
    override def name(): String = s"games_csv($path)"
    override def schema(): StructType = dataSchema
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new GamesCsvScanBuilder(path,
        options.getLong("maxSplitBytes", defaultSplitBytes))
    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
      new GamesCsvWriteBuilder(path, info)
  }

  private final class GamesCsvScanBuilder(path: String, splitBytes: Long)
      extends ScanBuilder
      with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
    private var required: StructType = dataSchema
    private var pushed: Array[Filter] = Array.empty

    override def pruneColumns(requiredSchema: StructType): Unit =
      required = requiredSchema

    private def supportedFilter(f: Filter): Boolean = f match {
      case EqualTo("AppID", _: Integer)            => true
      case GreaterThan("AppID", _: Integer)        => true
      case GreaterThanOrEqual("AppID", _: Integer) => true
      case LessThan("AppID", _: Integer)           => true
      case LessThanOrEqual("AppID", _: Integer)    => true
      case IsNotNull("AppID")                      => true
      case _                                       => false
    }

    override def pushFilters(filters: Array[Filter]): Array[Filter] = {
      val (sup, residual) = filters.partition(supportedFilter)
      pushed = sup
      residual
    }
    override def pushedFilters(): Array[Filter] = pushed

    override def build(): Scan = new GamesCsvScan(path, splitBytes,
      required, pushed)
  }

  // -------------------------------------------------------------------------
  // WRITE path — the full DSv2 write ladder (WriteBuilder → Write →
  // BatchWrite → DataWriterFactory → DataWriter) with the standard
  // two-phase commit: every task writes an isolated part file under a
  // hidden staging directory and reports it in its commit MESSAGE; only
  // the DRIVER's commit() assembles the destination (header + parts in
  // partition order), so a failed/speculative task attempt can never
  // leave bytes in the target, and abort() just drops the staging dir.
  // The destination is the same single-file games_cleaned.csv contract
  // the read side owns (RFC-4180 quoting, doubled-quote escapes,
  // null→empty) — a directory-of-parts sink is what production would
  // keep, but then it would also just use the parquet writer; the point
  // here is the commit protocol and the byte format, both of which the
  // g24 gate proves by ROUND TRIP: read → write → read must hash-match
  // the same DuckDB oracle as the original file (g22's).
  // -------------------------------------------------------------------------

  /** RFC-4180 field encode: quote iff the value contains a comma,
    * quote, or newline; escape quotes by doubling; null → empty —
    * the exact inverse of [[parseLine]]'s accepted grammar. */
  private[graft] def csvField(v: String): String =
    if (v == null) ""
    else if (v.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + v.replace("\"", "\"\"") + "\""
    else v

  private final case class CsvPartMessage(path: String, partitionId: Int)
      extends WriterCommitMessage

  private final class GamesCsvWriteBuilder(path: String,
      info: LogicalWriteInfo) extends WriteBuilder with SupportsTruncate {
    private var replace = false
    override def truncate(): WriteBuilder = { replace = true; this }
    override def build(): Write = {
      require(info.schema().fieldNames.sameElements(dataSchema.fieldNames),
        s"games-csv write expects columns ${dataSchema.fieldNames.mkString(",")}, " +
          s"got ${info.schema().fieldNames.mkString(",")}")
      new GamesCsvWrite(path, replace, info.queryId())
    }
  }

  private final class GamesCsvWrite(path: String, replace: Boolean,
      queryId: String) extends Write {
    override def toBatch: BatchWrite =
      new GamesCsvBatchWrite(path, replace, queryId)
  }

  private final class GamesCsvBatchWrite(path: String, replace: Boolean,
      queryId: String) extends BatchWrite {
    // staging is namespaced by the write's queryId: two concurrent writes
    // to the same destination must not share a staging dir, or either
    // job's commit()/abort() cleanup would destroy the other's part files
    private val staging = path + s".__staging__$queryId"

    override def createBatchWriterFactory(info: PhysicalWriteInfo)
        : DataWriterFactory = new GamesCsvWriterFactory(staging)

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val p = new Path(path)
      val fs = FileSystem.get(p.toUri, new Configuration())
      if (!replace)
        require(!fs.exists(p),
          s"games-csv append target $path already exists — " +
            "use overwrite for the single-file contract")
      // assemble OFF-TARGET and rename into place: truncating the
      // destination first would destroy the old file before the new one
      // exists, so a driver crash (or a part-read IOException) mid-copy
      // would leave a silently truncated CSV. The rename is the commit
      // point; until it happens the old file is intact.
      val tmp = new Path(staging, "__assembled__.csv")
      val out = fs.create(tmp, true)
      try {
        out.write((dataSchema.fieldNames.mkString(",") + "\n").getBytes("UTF-8"))
        // partition order: deterministic assembly; DSv2 delivers exactly
        // one committed message per partition
        messages.map(_.asInstanceOf[CsvPartMessage]).sortBy(_.partitionId)
          .foreach { m =>
            val in = fs.open(new Path(m.path))
            try {
              val buf = new Array[Byte](64 * 1024)
              var n = in.read(buf)
              while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
            } finally in.close()
          }
      } finally out.close()
      // atomic replace: move the old file ASIDE (not delete) so a failed
      // rename can restore it — delete-then-rename would lose the
      // destination if the rename throws between the two steps. The
      // aside lives NEXT TO the destination, never inside staging:
      // after a failed commit Spark calls abort(), which deletes the
      // whole staging dir — an aside parked there would destroy the
      // only copy of the old data. Outside staging, a crash between
      // the renames leaves the old bytes recoverable at a well-known
      // sibling path, and the restore rename is CHECKED so a silent
      // restore failure cannot masquerade as a clean abort.
      val aside = new Path(path + s".__replaced__$queryId")
      val hadOld = fs.exists(p)
      if (hadOld)
        require(fs.rename(p, aside), s"games-csv commit: move-aside $p failed")
      try
        require(fs.rename(tmp, p), s"games-csv commit rename $tmp -> $p failed")
      catch {
        case e: Throwable =>
          if (hadOld && !fs.exists(p) && !fs.rename(aside, p))
            e.addSuppressed(new java.io.IOException(
              s"restore of $aside -> $p ALSO failed — old data preserved " +
                "at the aside path"))
          throw e
      }
      if (hadOld) fs.delete(aside, false)
      fs.delete(new Path(staging), true)
      ()
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      val fs = FileSystem.get(new Path(staging).toUri, new Configuration())
      fs.delete(new Path(staging), true)
      ()
    }
  }

  private final class GamesCsvWriterFactory(staging: String)
      extends DataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long)
        : DataWriter[InternalRow] = new GamesCsvWriter(staging, partitionId, taskId)
  }

  private final class GamesCsvWriter(staging: String, partitionId: Int,
      taskId: Long) extends DataWriter[InternalRow] {
    private val appIdPos = dataSchema.fieldIndex("AppID")
    private val partPath =
      new Path(staging, f"part-$partitionId%05d-$taskId.csv")
    private val fs = FileSystem.get(partPath.toUri, new Configuration())
    private val out = fs.create(partPath, true)

    override def write(row: InternalRow): Unit = {
      val fields = dataSchema.fields.indices.map { i =>
        if (row.isNullAt(i)) null
        else if (i == appIdPos) row.getInt(i).toString
        else row.getUTF8String(i).toString
      }
      out.write((fields.map(csvField).mkString(",") + "\n").getBytes("UTF-8"))
    }

    override def commit(): WriterCommitMessage = {
      out.close()
      CsvPartMessage(partPath.toString, partitionId)
    }

    override def abort(): Unit = {
      out.close()
      fs.delete(partPath, false)
      ()
    }

    override def close(): Unit = ()
  }

  /** `aligned` marks a start known to sit on a line boundary (the
    * post-header offset); an unaligned reader skips its partial first
    * line, which the previous reader finishes. */
  private final case class CsvRange(start: Long, end: Long, aligned: Boolean)
      extends InputPartition

  private final class GamesCsvScan(path: String, splitBytes: Long,
      required: StructType, filters: Array[Filter]) extends Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"GamesCsvScan path=$path, ReadSchema=${required.fieldNames.mkString(",")}, " +
        s"PushedFilters=[${filters.mkString(", ")}]"

    override def planInputPartitions(): Array[InputPartition] = {
      val p = new Path(path)
      val fs = FileSystem.get(p.toUri, new Configuration())
      val len = fs.getFileStatus(p).getLen
      // header ends at the first newline — partition 0 starts after it
      val in = fs.open(p)
      val headerEnd = try {
        var pos = 0L
        while (pos < len && in.read() != '\n') pos += 1
        pos + 1
      } finally in.close()
      val span = math.max(1L, len - headerEnd)
      val n = math.max(1L, math.min((span + splitBytes - 1) / splitBytes, 32L))
      val step = span / n
      (0L until n).map { i =>
        val s = headerEnd + i * step
        val e = if (i == n - 1) len else headerEnd + (i + 1) * step
        CsvRange(s, e, aligned = i == 0): InputPartition
      }.toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new GamesCsvReaderFactory(path, required, filters)
  }

  private final class GamesCsvReaderFactory(path: String,
      required: StructType, filters: Array[Filter])
      extends PartitionReaderFactory {
    override def createReader(partition: InputPartition)
        : PartitionReader[InternalRow] = {
      val r = partition.asInstanceOf[CsvRange]
      new GamesCsvReader(path, r.start, r.end, r.aligned, required, filters)
    }
  }

  /** Reads every line that STARTS inside (start, end] — the Hadoop
    * `LineRecordReader` convention: a line that straddles `end` is
    * finished by this reader, AND the line that starts exactly at
    * `end` is read by this reader too, because the next reader
    * (seeking to `end`) unconditionally skips through its first
    * newline. Owning [start, end) exclusive-of-`end` on BOTH sides
    * would lose every line whose start byte lands exactly on a split
    * boundary — silent, data-dependent row loss. */
  private final class GamesCsvReader(path: String, start: Long, end: Long,
      aligned: Boolean, required: StructType, filters: Array[Filter])
      extends PartitionReader[InternalRow] {

    private val fieldIdx = required.fieldNames.map(n =>
      dataSchema.fieldIndex(n))
    private val appIdPos = dataSchema.fieldIndex("AppID")

    private val in = {
      val p = new Path(path)
      FileSystem.get(p.toUri, new Configuration()).open(p)
    }
    private var pos: Long = start
    private var linesExhausted = false
    private var current: InternalRow = _

    // a reader starting mid-line skips the partial line it landed in
    in.seek(start)
    if (!aligned) {
      var c = in.read()
      pos += (if (c >= 0) 1 else 0)
      while (c >= 0 && c != '\n') { c = in.read(); pos += 1 }
      if (c < 0) linesExhausted = true
    }

    /** Next raw line decoded as UTF-8, or null at range end / EOF.
      * Lines starting at pos <= `end` belong to this reader (the line
      * starting exactly at `end` is the one the next reader's
      * skip-first-line fast-forward throws away). Bytes are
      * accumulated raw and decoded once per line — decoding byte-at-
      * a-time via `toChar` would be Latin-1 and corrupt any multi-byte
      * character the builtin CSV reader and DuckDB read as UTF-8. */
    private def nextLine(): String = {
      if (linesExhausted || pos > end) return null
      val buf = new java.io.ByteArrayOutputStream(128)
      var c = in.read()
      if (c < 0) { linesExhausted = true; return null }
      while (c >= 0 && c != '\n') {
        if (c != '\r') buf.write(c)
        pos += 1
        c = in.read()
      }
      if (c >= 0) pos += 1 else linesExhausted = true
      new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    }

    private def appId(fields: Array[String]): Integer = {
      val s = fields(appIdPos)
      if (s == null || s.isEmpty) null
      else try Integer.valueOf(s.trim.toInt)
      catch { case _: NumberFormatException => null }
    }

    private def passes(id: Integer): Boolean = filters.forall {
      case IsNotNull("AppID")                 => id != null
      case EqualTo("AppID", v: Integer)       => id != null && id == v
      case GreaterThan("AppID", v: Integer)   => id != null && id > v
      case GreaterThanOrEqual("AppID", v: Integer) => id != null && id >= v
      case LessThan("AppID", v: Integer)      => id != null && id < v
      case LessThanOrEqual("AppID", v: Integer)    => id != null && id <= v
      case _                                  => true
    }

    override def next(): Boolean = {
      var line = nextLine()
      while (line != null) {
        val fields = parseLine(line)
        if (fields != null) {
          val id = appId(fields)
          if (passes(id)) {
            val values = fieldIdx.map { i =>
              val raw = fields(i)
              if (i == appIdPos) appId(fields).asInstanceOf[Any]
              else if (raw == null || raw.isEmpty) null
              else UTF8String.fromString(raw)
            }
            current = new GenericInternalRow(values.asInstanceOf[Array[Any]])
            return true
          }
        }
        line = nextLine()
      }
      false
    }

    override def get(): InternalRow = current
    override def close(): Unit = in.close()
  }
}
