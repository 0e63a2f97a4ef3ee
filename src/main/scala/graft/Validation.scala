package graft

import org.apache.spark.sql.Encoder

/** Record validation (reference: src/validation.rs + helpers/validation.rs):
  * a `Validate` trait, skip / fail-fast / dead-letter modes, and the
  * stock validator set. Distributed realization: validation is a narrow
  * map producing Either, so it fuses into the surrounding stage — no
  * shuffle, no driver collection except the explicit fail-fast action.
  */
object Validation {

  /** Result of validating one record: empty = valid. */
  type Errors = List[String]

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
