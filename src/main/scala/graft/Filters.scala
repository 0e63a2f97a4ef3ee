package graft

import org.apache.spark.sql.Encoder
import scala.language.implicitConversions

/** Enhanced predicate helpers (reference: src/helpers/filter.rs — all
  * thin wrappers over `filter`, kept for surface parity). On the
  * DataFrame path these are plain Column predicates and get Catalyst
  * pushdown for free; the typed wrappers here preserve the reference's
  * fluent API.
  */
final class FilterOps[T](private val self: PCollection[T]) extends AnyVal {

  def filterEq[V](extract: T => V, v: V): PCollection[T] = self.filter(extract(_) == v)
  def filterNe[V](extract: T => V, v: V): PCollection[T] = self.filter(extract(_) != v)

  def filterLt[V: Ordering](extract: T => V, v: V): PCollection[T] =
    self.filter(t => implicitly[Ordering[V]].lt(extract(t), v))
  def filterLe[V: Ordering](extract: T => V, v: V): PCollection[T] =
    self.filter(t => implicitly[Ordering[V]].lteq(extract(t), v))
  def filterGt[V: Ordering](extract: T => V, v: V): PCollection[T] =
    self.filter(t => implicitly[Ordering[V]].gt(extract(t), v))
  def filterGe[V: Ordering](extract: T => V, v: V): PCollection[T] =
    self.filter(t => implicitly[Ordering[V]].gteq(extract(t), v))

  /** [min, max) — exclusive max like the reference (filter.rs:224). */
  def filterRange[V: Ordering](extract: T => V, min: V, max: V): PCollection[T] = {
    val ord = implicitly[Ordering[V]]
    self.filter { t => val v = extract(t); ord.gteq(v, min) && ord.lt(v, max) }
  }

  /** [min, max] (filter.rs:249). */
  def filterRangeInclusive[V: Ordering](extract: T => V, min: V, max: V): PCollection[T] = {
    val ord = implicitly[Ordering[V]]
    self.filter { t => val v = extract(t); ord.gteq(v, min) && ord.lteq(v, max) }
  }

  /** Filter on an extracted field (filter.rs:305). */
  def filterBy[V](extract: T => V)(pred: V => Boolean): PCollection[T] =
    self.filter(t => pred(extract(t)))
}

/** Regex surface on string collections (reference: src/helpers/regex.rs).
  * The DataFrame analogs (`rlike`, `regexp_extract`, `regexp_replace`,
  * `split`) are preferred in column pipelines; these typed versions
  * compile each pattern once per closure (Pattern is Serializable and
  * re-compiles once per task on deserialization, never per element).
  */
final class RegexOps(private val self: PCollection[String]) extends AnyVal {

  /** Keep strings containing a match (regex.rs:88). */
  def regexMatches(pattern: String): PCollection[String] = {
    val re = pattern.r
    self.filter(s => re.findFirstIn(s).isDefined)
  }

  /** Extract capture group; non-matches dropped (regex.rs:127). */
  def regexExtract(pattern: String, group: Int)(implicit e: Encoder[String]): PCollection[String] = {
    val re = pattern.r
    self.filterMap { s =>
      // a group index outside [0, groupCount] is a non-match (dropped),
      // not an executor-killing IndexOutOfBounds — negative indices
      // would throw on EVERY matching row, the exact failure the upper
      // bound already prevents
      re.findFirstMatchIn(s)
        .filter(m => group >= 0 && m.groupCount >= group)
        .flatMap(m => Option(m.group(group)))
    }
  }

  /** Two capture groups -> (key, value); non-matches dropped (regex.rs:171). */
  def regexExtractKv(pattern: String)(implicit e: Encoder[(String, String)]): PCollection[(String, String)] = {
    val re = pattern.r
    self.filterMap { s =>
      re.findFirstMatchIn(s).collect {
        case m if m.groupCount >= 2 => (m.group(1), m.group(2))
      }
    }
  }

  /** First match substring; non-matches dropped (regex.rs:221). */
  def regexFind(pattern: String)(implicit e: Encoder[String]): PCollection[String] = {
    val re = pattern.r
    self.filterMap(s => re.findFirstIn(s))
  }

  /** Replace all matches (regex.rs:261). */
  def regexReplaceAll(pattern: String, replacement: String)(implicit e: Encoder[String]): PCollection[String] = {
    val re = pattern.r
    val r = replacement
    self.map(s => re.replaceAllIn(s, r))
  }

  /** Split by pattern (regex.rs:302). */
  def regexSplit(pattern: String)(implicit e: Encoder[Seq[String]]): PCollection[Seq[String]] = {
    val re = java.util.regex.Pattern.compile(pattern)
    self.map(s => re.split(s, -1).toSeq)
  }
}

object Filters {
  implicit def toFilterOps[T](pc: PCollection[T]): FilterOps[T] = new FilterOps(pc)
  implicit def toRegexOps(pc: PCollection[String]): RegexOps = new RegexOps(pc)
}
