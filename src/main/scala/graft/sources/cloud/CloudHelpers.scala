package graft.sources.cloud

import scala.concurrent.duration.Duration

import CloudIO.CloudResult

/** Retry schedule (reference: RetryConfig,
  * src/io/cloud/utils.rs:52-56; same defaults).
  */
final case class RetryConfig(
    maxAttempts: Int = 3,
    initialDelayMs: Long = 100,
    maxDelayMs: Long = 10000,
    backoffMultiplier: Double = 2.0
)

/** reference: PaginationConfig, src/io/cloud/utils.rs:212-214 */
final case class PaginationConfig(
    pageSize: Int = 100,
    maxPages: Option[Int] = None
)

/** reference: BatchConfig, src/helpers/cloud.rs:283-295 */
final case class BatchConfig(
    chunkSize: Int = 100,
    parallel: Boolean = false
)

/** Cloud operation runners: retry-with-backoff, chunked batching,
  * pagination and a fluent builder — the utilities reference users
  * wrap every provider call in (reference: src/helpers/cloud.rs:165-677
  * and src/io/cloud/utils.rs:89-278). Driver-side control-plane
  * helpers; per-record work belongs in Spark plans, not here.
  */
object CloudHelpers {

  /** Retry with exponential backoff; only TRANSIENT error kinds retry
    * (reference: retry_with_backoff, src/io/cloud/utils.rs:89-148 —
    * auth/not-found/invalid-input fail fast there too).
    */
  def runWithRetry[T](config: RetryConfig)(operation: () => CloudResult[T]): CloudResult[T] = {
    var attempt = 1
    var delayMs = config.initialDelayMs
    var last: CloudResult[T] = operation()
    while (last.isLeft && attempt < config.maxAttempts &&
           last.swap.toOption.exists(e => ErrorKind.isTransient(e.kind))) {
      Thread.sleep(delayMs)
      delayMs = math.min((delayMs * config.backoffMultiplier).toLong, config.maxDelayMs)
      attempt += 1
      last = operation()
    }
    last
  }

  /** Process items in fixed-size chunks, concatenating results; fails
    * on the first failing chunk (reference: batch_in_chunks,
    * src/io/cloud/utils.rs:187-208 via run_batch_operation,
    * src/helpers/cloud.rs:268-279).
    */
  def runBatch[T, R](items: Seq[T], config: BatchConfig)(
      processor: Seq[T] => CloudResult[Seq[R]]
  ): CloudResult[Seq[R]] = {
    val out = Seq.newBuilder[R]
    val it = items.grouped(math.max(config.chunkSize, 1))
    while (it.hasNext) {
      processor(it.next()) match {
        case Left(err) => return Left(err)
        case Right(rs) => out ++= rs
      }
    }
    Right(out.result())
  }

  /** Drain a paginated API: `fetchPage(pageIndex, pageSize)` returns
    * (items, hasMore); stops on hasMore=false or the maxPages cap
    * (reference: paginate, src/io/cloud/utils.rs:242-278 via
    * run_paginated_operation, src/helpers/cloud.rs:325-334).
    */
  def runPaginated[T](config: PaginationConfig)(
      fetchPage: (Int, Int) => CloudResult[(Seq[T], Boolean)]
  ): CloudResult[Seq[T]] = {
    val out = Seq.newBuilder[T]
    var page = 0
    var more = true
    while (more && config.maxPages.forall(page < _)) {
      fetchPage(page, config.pageSize) match {
        case Left(err) => return Left(err)
        case Right((items, hasMore)) =>
          out ++= items
          more = hasMore
          page += 1
      }
    }
    Right(out.result())
  }

  /** Run with a wall-clock deadline; a late result is discarded and
    * reported as Timeout (reference: with_timeout,
    * src/io/cloud/utils.rs:150-185).
    */
  def runWithTimeout[T](timeout: Duration)(operation: () => CloudResult[T]): CloudResult[T] = {
    import java.util.concurrent.{Executors, TimeUnit, TimeoutException}
    val ex = Executors.newSingleThreadExecutor(r => {
      val t = new Thread(r, "graft-cloud-timeout"); t.setDaemon(true); t
    })
    try {
      val fut = ex.submit(() => operation())
      try fut.get(timeout.toMillis, TimeUnit.MILLISECONDS)
      catch {
        case _: TimeoutException =>
          fut.cancel(true)
          Left(CloudIOError(ErrorKind.Timeout, s"operation timed out after $timeout"))
      }
    } finally ex.shutdownNow(): Unit
  }

  /** Fluent combination of retry + timeout (reference:
    * OperationBuilder, src/helpers/cloud.rs:359-407).
    */
  final case class OperationBuilder(
      retry: Option[RetryConfig] = None,
      timeout: Option[Duration] = None
  ) {
    def withRetry(c: RetryConfig): OperationBuilder = copy(retry = Some(c))
    def withTimeout(d: Duration): OperationBuilder = copy(timeout = Some(d))
    def execute[T](operation: () => CloudResult[T]): CloudResult[T] = {
      val timed: () => CloudResult[T] =
        timeout.fold(operation)(d => () => runWithTimeout(d)(operation))
      retry.fold(timed())(c => runWithRetry(c)(timed))
    }
  }
}
