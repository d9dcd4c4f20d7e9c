package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In, IsNotNull}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 reader for the OpenAQ-shaped snapshot payloads — the
  * reference's server-side query surface (`main.py:107-119` S2: the
  * `iso`/`monitor`/`mobile` params filter ON THE SERVER before any row
  * reaches the client) made literal as connector-level filter pushdown,
  * and its pagination (`limit=100` per page, `main.py:111,126` S3) made
  * literal as one input partition per page.
  *
  * Capabilities:
  *  - `SupportsPushDownFilters`: `EqualTo`/`In`/`IsNotNull` on any
  *    TOP-LEVEL atomic column (city — the per-run iso tag — plus
  *    monitor/mobile when the schema declares them) are evaluated inside
  *    the reader and reported as fully pushed, so Catalyst plans no
  *    residual Filter for them — exactly the reference's server-side
  *    contract. Anything else (nested fields, ranges) stays Spark-side.
  *  - `SupportsPushDownRequiredColumns`: the reader materializes only the
  *    requested top-level columns; the PERMISSIVE `_corrupt_record`
  *    column prunes away unless asked for.
  *  - Partition-per-page: `planInputPartitions` slices each snapshot file
  *    into `pageSize`-line pages (default 100 — the API's `limit`).
  *    Planning counts lines per file (metadata-scale for snapshot pages;
  *    a lake-scale deployment would split by byte ranges exactly as
  *    Spark's own FileScan does — the page layout here mirrors the
  *    API semantics the source stands in for).
  *
  * Parse semantics mirror Spark's PERMISSIVE JSON reader over the same
  * explicit schema (the previous implementation of [[Snapshots]], kept
  * bit-compatible so `q_flagship`'s oracle hash is unchanged): a
  * malformed line — invalid JSON, non-object root, or any field whose
  * token cannot convert to the declared type — yields an all-null row
  * with the raw line in `_corrupt_record`; an absent field or JSON null
  * is a null column with no corruption.
  */
class SnapshotSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-snapshot"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Snapshots.locationSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-snapshot: 'path' required"))
    val pageSize = Option(properties.get("pageSize")).map(_.toInt).getOrElse(100)
    new SnapshotTable(schema, path, pageSize)
  }
}

private[sources] class SnapshotTable(schema: StructType, path: String,
    pageSize: Int) extends Table with SupportsRead {
  override def name(): String = s"graft-snapshot($path)"
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def schema(): StructType = schema
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SnapshotScanBuilder(schema, path, pageSize)
}

private[sources] class SnapshotScanBuilder(fullSchema: StructType,
    path: String, pageSize: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = fullSchema
  private var limit: Option[Int] = None

  /** A filter is accepted iff the reader can decide it alone: equality /
    * membership / not-null on a top-level atomic column. Accepted filters
    * are NOT returned as residual — the source owns them completely, as
    * the reference's server owns iso/monitor/mobile.
    */
  private def atomicTopLevel(attr: String): Boolean =
    fullSchema.fields.exists(f => f.name == attr && (f.dataType match {
      case _: StructType | _: ArrayType | _: MapType => false
      case _ => true
    }))
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, residual) = filters.partition {
      case EqualTo(a, _) => atomicTopLevel(a)
      case In(a, _) => atomicTopLevel(a)
      case IsNotNull(a) => atomicTopLevel(a)
      case _ => false
    }
    pushed = ours
    // Order-independence guard (ADVICE r11): the pushLimit acceptance
    // below is sound ONLY with zero pushed filters. Spark today calls
    // pushFilters before pushLimit, but nothing in the DSv2 contract
    // promises that — if any filter lands AFTER a limit was accepted,
    // revoke the limit here so planInputPartitions can never prune pages
    // by raw line counts while the reader drops filtered rows.
    if (ours.nonEmpty) limit = None
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** S3's server contract completed (VERDICT r10 ask #7): a LIMIT reaching
    * the scan plans only the pages needed to produce it — the reference
    * stops issuing page requests once it has its rows (`main.py:126-127`,
    * 5 pages × limit=100), and so does this source. Accepted only when no
    * filter is pushed: every non-blank line then yields exactly one row
    * (parse failures surface as corrupt rows, not drops), so cumulative
    * non-blank line counts are a sound lower bound on produced rows. With
    * pushed filters the per-page yield is unknowable at planning time and
    * pruning pages could lose rows — the limit is declined and Spark's own
    * Limit operator (which remains in the plan either way, as
    * `isPartiallyPushed` advertises) does the bounding.
    */
  override def pushLimit(l: Int): Boolean =
    if (pushed.isEmpty) { limit = Some(l); true } else false
  override def isPartiallyPushed(): Boolean = true

  override def build(): Scan =
    new SnapshotScan(fullSchema, required, pushed, path, pageSize, limit)
}

private[sources] case class SnapshotPage(file: String, startLine: Long,
    endLine: Long) extends InputPartition

private[sources] class SnapshotScan(fullSchema: StructType,
    required: StructType, pushed: Array[Filter], path: String, pageSize: Int,
    limit: Option[Int] = None)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-snapshot $path pages=$pageSize pushed=[${pushed.mkString(", ")}]" +
      limit.map(l => s" pushedLimit=$l").getOrElse("")

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = org.apache.spark.SparkContext.getOrCreate().hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val files: Seq[Path] =
      if (fs.getFileStatus(root).isDirectory)
        fs.listStatus(root).filter(_.isFile).map(_.getPath).toSeq
          .sortBy(_.getName)
      else Seq(root)
    // Pages per file on RAW line indices (the reader's seek unit); the
    // per-page NON-BLANK count is tallied in the same streaming pass —
    // O(pages) planner memory, never O(lines). With no pushed filters
    // every non-blank line emits exactly one row, so a pushed LIMIT stops
    // planning pages once the cumulative non-blank count covers it
    // (pushLimit declines when filters are pushed, so a set `limit`
    // implies the one-row-per-non-blank-line regime).
    val all: Seq[(SnapshotPage, Long)] = files.flatMap { f =>
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(fs.open(f), "UTF-8"))
      val pages = scala.collection.mutable.ArrayBuffer.empty[(SnapshotPage, Long)]
      try {
        var idx = 0L; var pageStart = 0L; var nonBlank = 0L
        Iterator.continually(in.readLine()).takeWhile(_ != null).foreach { l =>
          if (l.trim.nonEmpty) nonBlank += 1
          idx += 1
          if (idx - pageStart == pageSize) {
            pages += ((SnapshotPage(f.toString, pageStart, idx), nonBlank))
            pageStart = idx; nonBlank = 0L
          }
        }
        if (idx > pageStart)
          pages += ((SnapshotPage(f.toString, pageStart, idx), nonBlank))
      } finally in.close()
      pages
    }
    limit match {
      case None => all.map(_._1).toArray
      case Some(l) =>
        // smallest page prefix whose non-blank lines cover the limit
        val cum = all.scanLeft(0L)(_ + _._2).tail
        val keep = cum.indexWhere(_ >= l) match {
          case -1 => all.size
          case i => i + 1
        }
        all.take(keep).map(_._1).toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SnapshotReaderFactory(fullSchema, required, pushed, pageSize)
}

private[sources] class SnapshotReaderFactory(fullSchema: StructType,
    required: StructType, pushed: Array[Filter], pageSize: Int)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val page = p.asInstanceOf[SnapshotPage]
    new SnapshotReader(fullSchema, required, pushed, page)
  }
}

private[sources] class SnapshotReader(fullSchema: StructType,
    required: StructType, pushed: Array[Filter], page: SnapshotPage)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val fs = {
    val conf = new org.apache.hadoop.conf.Configuration()
    new Path(page.file).getFileSystem(conf)
  }
  private val in = new java.io.BufferedReader(
    new java.io.InputStreamReader(fs.open(new Path(page.file)), "UTF-8"))
  (0L until page.startLine).foreach(_ => in.readLine())
  private var read = page.startLine
  private var row: InternalRow = _

  // signals a token that cannot convert to the declared type — the whole
  // row degrades to corrupt, matching Spark's PERMISSIVE JSON semantics
  private final class BadField extends RuntimeException

  private def convert(node: JsonNode, dt: DataType): Any =
    if (node == null || node.isNull) null
    else dt match {
      case StringType =>
        // raw-token fidelity: a non-string scalar lands as its lexical
        // form, an object/array as compact JSON (Spark's behavior)
        UTF8String.fromString(
          if (node.isTextual) node.asText else node.toString)
      case LongType =>
        if (node.canConvertToLong) node.asLong else throw new BadField
      case IntegerType =>
        if (node.canConvertToInt) node.asInt else throw new BadField
      case DoubleType =>
        if (node.isNumber) node.asDouble else throw new BadField
      case BooleanType =>
        if (node.isBoolean) node.asBoolean else throw new BadField
      case st: StructType =>
        if (!node.isObject) throw new BadField
        else new GenericInternalRow(
          st.fields.map(f => convert(node.get(f.name), f.dataType)))
      case ArrayType(et, _) =>
        if (!node.isArray) throw new BadField
        else new GenericArrayData(
          node.elements().asScala.map(convert(_, et)).toArray)
      case other =>
        throw new UnsupportedOperationException(s"snapshot type: $other")
    }

  /** Pushed-filter evaluation straight off the parsed payload — the
    * "server side" of the scan. Null fields fail EqualTo/In (SQL
    * three-valued logic collapses to false for a filter).
    */
  private def accept(node: JsonNode): Boolean = pushed.forall {
    case EqualTo(a, v) =>
      val n = node.get(a)
      n != null && !n.isNull && (convert(n, fieldType(a)) match {
        case s: UTF8String => s.toString == v
        case x => x == v
      })
    case In(a, vs) =>
      val n = node.get(a)
      n != null && !n.isNull && {
        val x = convert(n, fieldType(a)) match {
          case s: UTF8String => s.toString
          case o => o
        }
        vs.contains(x)
      }
    case IsNotNull(a) =>
      val n = node.get(a); n != null && !n.isNull
    case _ => true
  }
  private def fieldType(a: String): DataType =
    fullSchema.fields.find(_.name == a).get.dataType

  private def toRow(line: String): Option[InternalRow] = {
    val parsed: Either[Unit, JsonNode] =
      try {
        val n = mapper.readTree(line)
        if (n != null && n.isObject) Right(n) else Left(())
      } catch { case scala.util.control.NonFatal(_) => Left(()) }
    parsed match {
      case Right(node) =>
        if (!accept(node)) None
        else try {
          Some(new GenericInternalRow(required.fields.map { f =>
            if (f.name == "_corrupt_record") null
            else convert(node.get(f.name), f.dataType)
          }))
        } catch {
          case _: BadField => corruptRow(line)
        }
      case Left(_) => corruptRow(line)
    }
  }

  // all-null row + raw text in _corrupt_record; a pushed filter on any
  // column drops it (null never equals), matching post-scan Filter
  // behavior over Spark's PERMISSIVE output
  private def corruptRow(line: String): Option[InternalRow] =
    if (pushed.exists {
      case EqualTo(_, _) | In(_, _) | IsNotNull(_) => true
      case _ => false
    }) None
    else Some(new GenericInternalRow(required.fields.map[Any] { f =>
      if (f.name == "_corrupt_record") UTF8String.fromString(line)
      else null
    }))

  override def next(): Boolean = {
    row = null
    while (row == null && read < page.endLine) {
      val line = in.readLine()
      read += 1
      if (line == null) return false
      if (line.trim.nonEmpty) toRow(line).foreach(r => row = r)
    }
    row != null
  }
  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
