package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, IsNotNull, StringStartsWith}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector for the reference's landing zone — the
  * `pages/<slug>.md` tree the extract pipeline writes (frontmatter +
  * markdown body; commands/extract.md page-store layout). Exposed as
  *
  *   spark.read.format("graftpages").load(rootDir)
  *
  * with schema (path, slug, title, body, n_chars). This is the
  * engine-complete form of S1/S2/S10: a typed TABLE over the page
  * store, planned and read on executors, instead of a wholetext scan
  * plus per-query parsing.
  *
  * Scale posture:
  *  - planning lists files once on the driver (standard DSv2 file-source
  *    planning) and packs them round-robin into input partitions sized
  *    by `partitions` (default 8) — each partition is an independent
  *    executor task;
  *  - COLUMN PRUNING IS REAL IO PRUNING: the reader materializes a
  *    file's bytes only when the projection needs title/body/n_chars.
  *    `select(slug)` over 100 TB of markdown never opens a single file —
  *    the row comes entirely from the directory listing;
  *  - title = frontmatter `title:` if present, else the first `# `
  *    heading, else the slug (the reference's INDEX.md fallback order).
  */
class PagesSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftpages"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagesSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val root = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graftpages requires .load(<root dir>)"))
    val nParts = Option(properties.get("partitions")).map(_.toInt).getOrElse(8)
    new PagesTable(root, nParts)
  }
}

object PagesSource {
  val Schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("slug", StringType, nullable = false),
    StructField("title", StringType, nullable = true),
    StructField("body", StringType, nullable = true),
    StructField("n_chars", IntegerType, nullable = true)))

  /** Columns derivable from the file PATH alone — a projection inside
    * this set never reads file contents.
    */
  val MetadataOnly: Set[String] = Set("path", "slug")

  private[sources] def slugOf(p: String): String = {
    val name = p.substring(p.lastIndexOf('/') + 1)
    if (name.endsWith(".md")) name.dropRight(3) else name
  }

  /** frontmatter `title:` > first `# ` heading > slug. */
  private[sources] def titleOf(body: String, slug: String): String = {
    val lines = body.linesIterator.toSeq
    val fmTitle =
      if (lines.headOption.contains("---")) {
        val fm = lines.drop(1).takeWhile(_ != "---")
        fm.collectFirst { case l if l.startsWith("title:") =>
          l.substring(6).trim }
      } else None
    fmTitle
      .orElse(lines.collectFirst { case l if l.startsWith("# ") =>
        l.substring(2).trim })
      .getOrElse(slug)
  }
}

class PagesTable(root: String, nParts: Int) extends Table with SupportsRead {
  override def name(): String = s"graftpages(`$root`)"
  override def schema(): StructType = PagesSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagesScanBuilder(root, nParts)
}

/** Filter pushdown prunes the FILE LIST at planning time: a slug
  * equality/prefix predicate never plans (let alone reads) a
  * non-matching file — partition pruning for a directory-shaped store.
  * Unsupported predicates stay residual (Spark re-applies them).
  */
class PagesScanBuilder(root: String, nParts: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = PagesSource.Schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("slug", _: String) => true
      case StringStartsWith("slug", _) => true
      case IsNotNull("slug") | IsNotNull("path") => true // never null here
      case _ => false
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new PagesScan(root, nParts, required, pushed)
}

case class PagesPartition(files: Array[String]) extends InputPartition

class PagesScan(root: String, nParts: Int, required: StructType,
    pushed: Array[Filter] = Array.empty)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = {
    val ioFree = required.fieldNames.forall(PagesSource.MetadataOnly)
    s"graftpages root=$root cols=${required.fieldNames.mkString(",")}" +
      s" pushed=[${pushed.mkString(",")}]" +
      (if (ioFree) " [metadata-only: no file IO]" else "")
  }

  private def keepSlug(slug: String): Boolean = pushed.forall {
    case EqualTo("slug", v: String) => slug == v
    case StringStartsWith("slug", pre) => slug.startsWith(pre)
    case _ => true
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val rootPath = Paths.get(root)
    val files: Seq[String] =
      if (!Files.exists(rootPath)) Seq.empty
      else {
        val s = Files.walk(rootPath)
        try s.iterator().asScala
          .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".md"))
          .map(_.toString)
          .filter(f => keepSlug(PagesSource.slugOf(f)))
          .toVector.sorted
        finally s.close()
      }
    val n = math.max(1, math.min(nParts, files.size))
    (0 until n).map { i =>
      PagesPartition(files.zipWithIndex.collect {
        case (f, idx) if idx % n == i => f
      }.toArray): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagesReaderFactory(required)
}

class PagesReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PagesReader(partition.asInstanceOf[PagesPartition].files, required)
}

class PagesReader(files: Array[String], required: StructType)
    extends PartitionReader[InternalRow] {
  private var i = -1
  private var row: InternalRow = _
  private val needsContent =
    !required.fieldNames.forall(PagesSource.MetadataOnly)

  override def next(): Boolean = {
    i += 1
    if (i >= files.length) return false
    val path = files(i)
    val slug = PagesSource.slugOf(path)
    // the pruning contract: metadata-only projections never touch the
    // filesystem beyond the planning-time listing
    val body = if (needsContent)
      new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)
    else null
    val values: Array[Any] = required.fieldNames.map {
      case "path"  => UTF8String.fromString(path)
      case "slug"  => UTF8String.fromString(slug)
      case "title" => UTF8String.fromString(PagesSource.titleOf(body, slug))
      case "body"  => UTF8String.fromString(body)
      case "n_chars" => Integer.valueOf(body.length)
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }.toArray[Any]
    row = new GenericInternalRow(values)
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}
