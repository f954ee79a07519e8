package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
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

class PagesTable(root: String, nParts: Int)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graftpages($root)"
  override def schema(): StructType = PagesSource.Schema
  // ACCEPT_ANY_SCHEMA: writes carry only (slug, body[, title]) — the
  // derived read columns (path, title, n_chars) are not write inputs,
  // so by-name resolution against the read schema must be bypassed;
  // PagesWriteBuilder validates the required columns itself.
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.ACCEPT_ANY_SCHEMA).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagesScanBuilder(root, nParts)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new PagesWriteBuilder(root, info)
}

/** DSv2 WRITE path — the page store as a sink:
  *
  *   df.write.format("graftpages").mode("append"|"overwrite").save(root)
  *
  * Input needs (slug, body); an optional `title` column becomes
  * frontmatter. Two-phase commit: each task writes
  * `<slug>.md.<task>.tmp` and reports the pairs in its commit message;
  * only the DRIVER's job-level commit renames them into place (and,
  * under overwrite, clears the previous store first), so a failed or
  * speculated task never leaves a half-written page visible — the same
  * rename-on-commit protocol Spark's file sources use. Local-fs rename
  * here; a 100 TB deployment points root at a store where rename is
  * atomic (HDFS) or swaps in a manifest committer, with the same
  * task/driver split.
  */
class PagesWriteBuilder(root: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = {
    val names = info.schema().fieldNames.toSet
    require(names.contains("slug") && names.contains("body"),
      s"graftpages write needs slug+body columns, got ${names.mkString(",")}")
    new PagesWrite(root, info.schema(), doTruncate)
  }
}

case class PagesCommit(pairs: Array[(String, String)]) extends WriterCommitMessage

class PagesWrite(root: String, schema: StructType, truncate: Boolean)
    extends Write with BatchWrite {
  override def toBatch: BatchWrite = this
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new PagesWriterFactory(root, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val rootPath = Paths.get(root)
    // Validate BEFORE any destructive step (truncate / first rename):
    // a cross-task slug collision would otherwise resolve silently
    // last-write-wins — or, half-committed, leave an emptied store.
    val dupFins = messages.toSeq
      .flatMap { case PagesCommit(pairs) => pairs.map(_._2) }
      .groupBy(identity).collect { case (fin, hits) if hits.size > 1 => fin }
    require(dupFins.isEmpty,
      s"graftpages: duplicate slug(s) across tasks, aborting commit before " +
        s"any rename: ${dupFins.toSeq.sorted.take(5).mkString(", ")}")
    if (truncate && Files.exists(rootPath)) {
      val s = Files.walk(rootPath)
      try s.iterator().asScala.toVector
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".md"))
        .foreach(Files.delete)
      finally s.close()
    }
    Files.createDirectories(rootPath)
    messages.foreach { case PagesCommit(pairs) =>
      pairs.foreach { case (tmp, fin) =>
        Files.move(Paths.get(tmp), Paths.get(fin),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case PagesCommit(pairs) =>
        pairs.foreach { case (tmp, _) => Files.deleteIfExists(Paths.get(tmp)) }
      case _ => ()
    }
}

class PagesWriterFactory(root: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new PagesWriter(root, schema, taskId)
}

class PagesWriter(root: String, schema: StructType, taskId: Long)
    extends DataWriter[InternalRow] {
  private val slugIdx = schema.fieldIndex("slug")
  private val bodyIdx = schema.fieldIndex("body")
  private val titleIdx =
    if (schema.fieldNames.contains("title")) schema.fieldIndex("title") else -1
  private val pairs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
  private val seen = scala.collection.mutable.HashSet.empty[String]

  override def write(r: InternalRow): Unit = {
    require(!r.isNullAt(slugIdx), "graftpages: slug must not be null")
    val slug = r.getUTF8String(slugIdx).toString
    // a repeated slug in one task would produce two identical
    // (tmp, fin) pairs and break the driver's rename-on-commit (the
    // second move of the same tmp throws mid-commit) — fail fast here
    require(seen.add(slug),
      s"graftpages: duplicate slug within task: $slug")
    val body = if (r.isNullAt(bodyIdx)) "" else r.getUTF8String(bodyIdx).toString
    val title =
      if (titleIdx >= 0 && !r.isNullAt(titleIdx))
        Some(r.getUTF8String(titleIdx).toString)
      else None
    val content = title match {
      case Some(t) if !body.startsWith("---") => s"---\ntitle: $t\n---\n$body"
      case _ => body
    }
    Files.createDirectories(Paths.get(root))
    val fin = Paths.get(root, s"$slug.md").toString
    val tmp = s"$fin.$taskId.tmp"
    Files.write(Paths.get(tmp), content.getBytes(StandardCharsets.UTF_8))
    pairs += ((tmp, fin))
  }

  override def commit(): WriterCommitMessage = PagesCommit(pairs.toArray)
  override def abort(): Unit =
    pairs.foreach { case (tmp, _) => Files.deleteIfExists(Paths.get(tmp)) }
  override def close(): Unit = ()
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
