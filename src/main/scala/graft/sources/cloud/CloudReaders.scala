package graft.sources.cloud

import java.io.{BufferedReader, ByteArrayInputStream, ByteArrayOutputStream, InputStreamReader}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import scala.collection.mutable

import CloudIO.CloudResult

/** Cloud object readers/writers with transparent compression and glob
  * expansion (reference: src/io/cloud/readers.rs:1-639). Works against
  * any [[ObjectIO]] — fakes in tests, a provider adapter in
  * production.
  *
  * Where the reference's JSONL functions are typed via serde, the
  * Scala-idiomatic equivalent is an explicit per-line codec
  * (`T => String` / `String => T`) — no reflection, caller-controlled
  * schema. Compression is keyed off the key extension like the
  * reference: `.gz`/`.gzip` via java.util.zip, `.zst`/`.zstd` via the
  * zstd-jni already on Spark's classpath; other compressed extensions
  * are an InvalidInput error (mirroring the reference's disabled
  * feature-flag branches, readers.rs:237-291).
  *
  * Scale stance: these are control-plane helpers (manifests, small
  * side inputs, checkpointed metadata). Bulk data at 100 TB flows
  * through the distributed readers in [[graft.sources.IOOps]].
  */
object CloudReaders {

  /** Read a JSONL object into typed values, one per non-blank line
    * (reference: read_cloud_jsonl_vec, readers.rs:131-183).
    * Decompresses by extension. A decode failure reports the 1-based
    * line number like the reference.
    */
  def readCloudJsonlVec[T](storage: ObjectIO, bucket: String, key: String)(
      decode: String => T
  ): CloudResult[Seq[T]] =
    storage.getObject(bucket, key).flatMap { data =>
      // only stream CONSTRUCTION is a "decompression setup" failure;
      // an error later in the loop (e.g. a truncated gzip body throwing
      // from readLine) must be reported as a read failure at its line,
      // not misattributed to setup after N lines were already parsed
      val setup =
        try Right(decompressStream(data, key))
        catch {
          case e: Exception =>
            Left(CloudIOError(
              ErrorKind.InternalError,
              s"Failed to setup decompression for $key: ${e.getMessage}"))
        }
      setup.flatMap { in =>
        val reader = new BufferedReader(new InputStreamReader(in, UTF_8))
        try {
          val out = Seq.newBuilder[T]
          var lineNum = 0
          var line = reader.readLine()
          var failed: Option[CloudIOError] = None
          while (failed.isEmpty && line != null) {
            lineNum += 1
            if (line.trim.nonEmpty) {
              try out += decode(line)
              catch {
                case e: Exception =>
                  failed = Some(CloudIOError(
                    ErrorKind.InternalError,
                    s"Failed to parse JSONL line $lineNum in $bucket/$key: ${e.getMessage}"))
              }
            }
            line = reader.readLine()
          }
          failed.toLeft(out.result())
        } catch {
          case e: Exception =>
            Left(CloudIOError(
              ErrorKind.InternalError,
              s"Failed reading $bucket/$key (corrupt or truncated stream): ${e.getMessage}"))
        } finally reader.close()
      }
    }

  /** Write typed values as one JSONL object, one line each, compressed
    * by extension (reference: write_cloud_jsonl_vec,
    * readers.rs:218-299). Returns the number of items written.
    */
  def writeCloudJsonlVec[T](storage: ObjectIO, bucket: String, key: String, data: Seq[T])(
      encode: T => String
  ): CloudResult[Long] = {
    val body = new StringBuilder
    data.foreach { item =>
      body.append(encode(item)).append('\n')
    }
    compressBytes(body.toString.getBytes(UTF_8), key).flatMap { bytes =>
      storage.putObject(bucket, key, bytes).map(_ => data.size.toLong)
    }
  }

  /** Expand a glob over a bucket listing, sorted for deterministic
    * processing order (reference: expand_cloud_glob,
    * readers.rs:481-509). Uses the static prefix before the first
    * wildcard for the listing call so providers can prune server-side.
    */
  def expandCloudGlob(storage: ObjectIO, bucket: String, pattern: String): CloudResult[Seq[String]] = {
    val regex =
      try globToRegex(pattern).r
      catch {
        case e: Exception =>
          return Left(CloudIOError(ErrorKind.InvalidInput, s"Invalid glob pattern '$pattern': ${e.getMessage}"))
      }
    storage.listObjects(bucket, extractPrefixBeforeWildcard(pattern)).map { objects =>
      objects.iterator
        .map(_.key)
        .filter(k => regex.pattern.matcher(k).matches())
        .toSeq.sorted
    }
  }

  /** Strict variant: zero matches is a NotFound error (reference:
    * expand_cloud_glob_required, readers.rs:621-639).
    */
  def expandCloudGlobRequired(storage: ObjectIO, bucket: String, pattern: String): CloudResult[Seq[String]] =
    expandCloudGlob(storage, bucket, pattern).flatMap { keys =>
      if (keys.isEmpty)
        Left(CloudIOError(ErrorKind.NotFound,
          s"No objects found matching pattern '$pattern' in bucket '$bucket'"))
      else Right(keys)
    }

  /** Read and concatenate every JSONL object matching a glob
    * (reference: read_cloud_jsonl_glob, readers.rs:593-608).
    */
  def readCloudJsonlGlob[T](storage: ObjectIO, bucket: String, pattern: String)(
      decode: String => T
  ): CloudResult[Seq[T]] =
    expandCloudGlob(storage, bucket, pattern).flatMap { keys =>
      val out = Seq.newBuilder[T]
      val it = keys.iterator
      var failed: Option[CloudIOError] = None
      while (failed.isEmpty && it.hasNext) {
        readCloudJsonlVec(storage, bucket, it.next())(decode) match {
          case Left(err) => failed = Some(err)
          case Right(rs) => out ++= rs
        }
      }
      failed.toLeft(out.result())
    }

  /** Glob → anchored regex: `**` crosses path segments, `*` stays
    * within one, `?` is any single char (reference: glob_to_regex,
    * readers.rs:518-546 — same escaping set).
    */
  private[cloud] def globToRegex(pattern: String): String = {
    val sb = new mutable.StringBuilder("^")
    var i = 0
    while (i < pattern.length) {
      pattern.charAt(i) match {
        case '*' if i + 1 < pattern.length && pattern.charAt(i + 1) == '*' =>
          sb.append(".*"); i += 1
        case '*' => sb.append("[^/]*")
        case '?' => sb.append('.')
        case '.' => sb.append("\\.")
        case c @ ('+' | '(' | ')' | '|' | '[' | ']' | '{' | '}' | '^' | '$' | '\\') =>
          sb.append('\\').append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('$').toString
  }

  /** Static prefix before the first wildcard, for server-side listing
    * (reference: extract_prefix_before_wildcard, readers.rs:551-562).
    */
  private[cloud] def extractPrefixBeforeWildcard(pattern: String): Option[String] = {
    val pos = pattern.indexWhere(c => c == '*' || c == '?')
    if (pos < 0) Some(pattern)
    else if (pos == 0) None
    else Some(pattern.substring(0, pos))
  }

  // ---- compression by key extension ----

  private def extensionOf(key: String): String = {
    val base = key.toLowerCase
    val dot = base.lastIndexOf('.')
    if (dot < 0) "" else base.substring(dot + 1)
  }

  private def decompressStream(data: Array[Byte], key: String): java.io.InputStream = {
    val raw = new ByteArrayInputStream(data)
    extensionOf(key) match {
      case "gz" | "gzip" => new GZIPInputStream(raw)
      case "zst" | "zstd" => new com.github.luben.zstd.ZstdInputStream(raw)
      case _ => raw
    }
  }

  private def compressBytes(bytes: Array[Byte], key: String): CloudResult[Array[Byte]] =
    extensionOf(key) match {
      case "gz" | "gzip" =>
        val buf = new ByteArrayOutputStream()
        val gz = new GZIPOutputStream(buf)
        gz.write(bytes); gz.finish(); gz.close()
        Right(buf.toByteArray)
      case "zst" | "zstd" =>
        Right(com.github.luben.zstd.Zstd.compress(bytes, 3))
      case "bz2" | "bzip2" | "xz" =>
        Left(CloudIOError(ErrorKind.InvalidInput,
          s"Cannot write $key: ${extensionOf(key)} compression not enabled"))
      case _ => Right(bytes)
    }
}
