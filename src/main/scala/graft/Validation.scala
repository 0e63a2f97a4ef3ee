package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, sum, when}
import org.apache.spark.util.CollectionAccumulator

/** Record validation (reference: src/validation.rs + helpers/validation.rs):
  * a `Validate` trait, skip / fail-fast / dead-letter / log-and-continue
  * modes, the stock validator set, and the [[Validation.ErrorCollector]]
  * with JSON export. Distributed realization: validation is a narrow
  * map producing Either, so it fuses into the surrounding stage — no
  * shuffle, no driver collection except the explicit fail-fast action;
  * error collection rides Spark's accumulator channel (per-task deltas
  * merged on the driver as jobs run), never a shuffle or a collect.
  */
object Validation {

  /** Result of validating one record: empty = valid. */
  type Errors = List[String]

  /** Structured per-field validation error (reference:
    * src/validation.rs:100-150 `ValidationError` — field/message/code
    * with the same Display rendering).
    */
  final case class ValidationError(
      field: Option[String],
      message: String,
      code: Option[String]
  ) {
    def withCode(c: String): ValidationError = copy(code = Some(c))

    /** Reference Display form: `[field] message (code: c)`. */
    def render: String = {
      val head = field.fold(message)(f => s"[$f] $message")
      code.fold(head)(c => s"$head (code: $c)")
    }

    def toJson: String = {
      def opt(o: Option[String]) = o.fold("null")(JsonText.quote)
      s"""{"field":${opt(field)},"message":${JsonText.quote(message)},"code":${opt(code)}}"""
    }
  }

  object ValidationError {
    def apply(message: String): ValidationError = ValidationError(None, message, None)
    def field(field: String, message: String): ValidationError =
      ValidationError(Some(field), message, None)
  }

  /** A failed record's identity plus its errors (reference:
    * src/validation.rs:172-180 `RecordError`; JSON field names match
    * the reference's serde output).
    */
  final case class RecordError(recordId: Option[String], errors: Seq[ValidationError]) {
    def toJson: String = {
      val id = recordId.fold("null")(JsonText.quote)
      s"""{"record_id":$id,"errors":[${errors.map(_.toJson).mkString(",")}]}"""
    }
  }

  /** Accumulates per-record validation errors for batch reporting, with
    * JSON export (reference: src/validation.rs:163-238
    * `ErrorCollector`). Two construction modes:
    *
    *  - [[ErrorCollector.apply]]: driver-local buffer — the reference's
    *    exact contract for driver-side accumulation and unit tests.
    *  - [[ErrorCollector.distributed]]: backed by a Spark
    *    `CollectionAccumulator`, so executor-side `addError` calls
    *    (e.g. from [[ValidationOps.validateLogAndContinue]]) merge into
    *    the driver as each task completes — the accumulator channel is
    *    Spark's native realization of "collect errors while the
    *    pipeline runs"; no shuffle, no job, no driver round-trip.
    *    Standard accumulator caveats apply: a retried task re-adds its
    *    errors, so counts are at-least-once under failure; and because
    *    the validated collection is lazy and cache-free, EVERY action on
    *    it re-runs validation and re-adds every record's errors (e.g.
    *    `count()` then `collect()` doubles `errorCount`) — run a single
    *    terminal action, `cache()` the collection first, or
    *    snapshot-and-`clear()` between actions when exact counts
    *    matter. Use `validatePartition`'s dead-letter stream when an
    *    exactly-once audit trail matters.
    */
  final class ErrorCollector private (
      acc: Option[CollectionAccumulator[RecordError]]
  ) extends Serializable {
    @transient private lazy val local =
      if (acc.isEmpty) new java.util.concurrent.ConcurrentLinkedQueue[RecordError]() else null

    // true only on the ORIGINAL driver-side instance: @transient vals
    // deserialize to their zero value, so a driver-local collector that
    // gets closure-shipped to an executor sees false here and addError
    // fails loudly — a lazily re-initialized queue on the executor
    // would otherwise swallow every error (tasks discard their copy)
    @transient private val driverInstance: Boolean = true

    def addError(recordId: Option[String], errs: Seq[ValidationError]): Unit = {
      val re = RecordError(recordId, errs)
      acc match {
        case Some(a) => a.add(re)
        case None =>
          require(driverInstance,
            "driver-local ErrorCollector used inside a distributed pipeline — " +
              "its executor-side adds cannot reach the driver; use ErrorCollector.distributed(spark)")
          local.add(re): Unit
      }
    }

    def errorCount: Int = errors.size

    def errors: Seq[RecordError] = acc match {
      case Some(a) => a.value.asScala.toSeq
      case None    => local.asScala.toSeq
    }

    def clear(): Unit = acc match {
      case Some(a) => a.reset()
      case None    => local.clear()
    }

    /** reference: print_errors — record id (or index) per line. */
    def printErrors(): Unit =
      errors.zipWithIndex.foreach { case (re, idx) =>
        val id = re.recordId.map(i => s"Record $i").getOrElse(s"Record #$idx")
        System.err.println(s"$id: ${re.errors.map(_.render).mkString(", ")}")
      }

    /** JSON array of record errors, field names matching the
      * reference's serde export (`record_id`, `errors[].field/message/
      * code`).
      */
    def toJson: String = errors.map(_.toJson).mkString("[", ",", "]")

    def writeToFile(path: java.nio.file.Path): Unit = {
      java.nio.file.Files.write(path, toJson.getBytes("UTF-8")): Unit
    }

    override def toString: String = s"ErrorCollector($errorCount errors)"
  }

  object ErrorCollector {
    /** Driver-local collector (reference parity; not for executor-side
      * adds).
      */
    def apply(): ErrorCollector = new ErrorCollector(None)

    /** Accumulator-backed collector whose executor-side adds merge into
      * the driver as tasks complete.
      */
    def distributed(spark: SparkSession): ErrorCollector =
      new ErrorCollector(Some(
        spark.sparkContext.collectionAccumulator[RecordError]("graft.validation.errors")))
  }

  /** Minimal JSON string escaping for the hand-rolled export (no JSON
    * library on the classpath; the format is fixed and machine-read).
    */
  private object JsonText {
    def quote(s: String): String = {
      val b = new StringBuilder("\"")
      s.foreach {
        case '"'           => b.append("\\\"")
        case '\\'          => b.append("\\\\")
        case '\n'          => b.append("\\n")
        case '\r'          => b.append("\\r")
        case '\t'          => b.append("\\t")
        case c if c < ' '  => b.append(f"\\u${c.toInt}%04x")
        case c             => b.append(c)
      }
      b.append('"').toString
    }
  }

  trait Validate[T] extends Serializable {
    def validate(t: T): Errors
  }

  /** Stock validators (reference: src/validation.rs Validators). */
  object Validators {
    def notEmpty(name: String)(v: String): Errors =
      if (v == null || v.isEmpty) List(s"$name: must not be empty") else Nil

    def contains(name: String, needle: String)(v: String): Errors =
      if (v != null && v.contains(needle)) Nil else List(s"$name: must contain '$needle'")

    def inRange[N](name: String, min: N, max: N)(v: N)(implicit num: Numeric[N]): Errors =
      if (num.gteq(v, min) && num.lteq(v, max)) Nil
      else List(s"$name: $v not in [$min, $max]")

    private val emailRe = "^[^@\\s]+@[^@\\s]+\\.[^@\\s]+$".r
    def isEmail(name: String)(v: String): Errors =
      if (v != null && emailRe.matches(v)) Nil else List(s"$name: not an email")

    def minLength(name: String, n: Int)(v: String): Errors =
      if (v != null && v.length >= n) Nil else List(s"$name: shorter than $n")

    def maxLength(name: String, n: Int)(v: String): Errors =
      if (v != null && v.length <= n) Nil else List(s"$name: longer than $n")

    /** Combine validators. */
    def all[T](vs: (T => Errors)*): T => Errors = t => vs.toList.flatMap(_(t))
  }

  private val validationMetricSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  implicit final class ValidationOps[T](private val self: PCollection[T]) {

    /** Keep only valid records (reference: validate_skip_invalid). */
    def validateSkipInvalid(v: T => Errors): PCollection[T] =
      self.filter(t => v(t).isEmpty)

    /** Valid records + dead-letter stream of (record, errors) —
      * the reference's error-collector mode as a distributed pair.
      */
    def validatePartition(v: T => Errors)(implicit
        tEnc: Encoder[T],
        dlqEnc: Encoder[(T, String)],
        pairEnc: Encoder[(Option[T], Option[(T, String)])],
        errEnc: Encoder[(T, Seq[String])]
    ): (PCollection[T], PCollection[(T, Seq[String])]) = {
      val (ok, dlq) = self.mapCatching { t =>
        val errs = v(t)
        if (errs.nonEmpty) throw new IllegalArgumentException(errs.mkString("; "))
        t
      }(tEnc, dlqEnc, pairEnc)
      (ok, new PCollection(dlq.ds.map { case (t, msg) => (t, msg.split("; ").toSeq) }(errEnc)))
    }

    /** Log-and-continue mode (reference: ValidationMode::LogAndContinue
      * + validate_with_mode): invalid records are dropped from the
      * output and their errors land in `collector` — use
      * [[ErrorCollector.distributed]] so executor-side adds merge into
      * the driver via the accumulator channel as tasks complete. The
      * stream is also `observe`d: every action on the result reports
      * `<metricName>.total_rows` / `invalid_rows` metrics to query
      * listeners, so monitoring sees per-run validation rates without
      * any extra job or a trip through the collector. Observation names
      * must be unique within one query, so each call defaults to a
      * fresh `graft_validation_<n>` — pass `metricName` explicitly when
      * monitoring needs a stable name (and keep it unique per plan).
      *
      * @param idOf record identity for the error report (None = indexed)
      */
    def validateLogAndContinue(
        v: T => Errors,
        collector: ErrorCollector,
        idOf: T => Option[String] = (_: T) => None,
        metricName: String = null
    )(implicit tEnc: Encoder[T], pairEnc: Encoder[(T, Int)]): PCollection[T] =
      new PCollection({
        val name = Option(metricName).getOrElse(
          s"graft_validation_${validationMetricSeq.incrementAndGet()}")
        val scored = self.ds.mapPartitions(_.map { t =>
          val errs = v(t)
          if (errs.nonEmpty) collector.addError(idOf(t), errs.map(ValidationError(_)))
          (t, errs.size)
        })(pairEnc)
        scored
          .observe(
            name,
            count(lit(1)).as("total_rows"),
            sum(when(col("_2") > 0, 1L).otherwise(0L)).as("invalid_rows"))
          .filter(col("_2") === 0)
          .map(_._1)(tEnc)
      })

    /** Throw on the first invalid record when the job runs
      * (reference: validate_fail_fast).
      */
    def validateFailFast(v: T => Errors): PCollection[T] =
      self.filter { t =>
        val errs = v(t)
        if (errs.nonEmpty) throw new IllegalArgumentException(s"validation failed: ${errs.mkString("; ")}")
        true
      }
  }
}
