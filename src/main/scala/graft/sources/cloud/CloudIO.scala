package graft.sources.cloud

/** Provider-agnostic cloud I/O abstraction layer: the reference ships
  * 14 capability traits plus in-memory fakes so pipeline code (and its
  * tests) never bind to a concrete provider SDK
  * (reference: src/io/cloud/traits.rs:68-1093). This port covers the
  * four highest-traffic capabilities — object storage, key-value/
  * document store, message queue, pub/sub — with the same method
  * surfaces and error taxonomy; results are `Either[CloudIOError, T]`
  * (Scala's idiomatic `CloudResult`).
  *
  * Scale stance: these are control-plane/driver-side abstractions (list
  * a bucket, drain a queue, publish progress) — bulk DATA always flows
  * through the Spark readers/writers ([[graft.sources.IOOps]] etc.), so
  * no implementation here ever holds more than a batch of messages.
  */
object CloudIO {
  type CloudResult[T] = Either[CloudIOError, T]
}

import CloudIO.CloudResult

/** Error taxonomy (reference: ErrorKind, src/io/cloud/traits.rs:23-36). */
sealed trait ErrorKind
object ErrorKind {
  case object Authentication extends ErrorKind
  case object Authorization extends ErrorKind
  case object NotFound extends ErrorKind
  case object AlreadyExists extends ErrorKind
  case object InvalidInput extends ErrorKind
  case object Network extends ErrorKind
  case object Timeout extends ErrorKind
  case object ServiceUnavailable extends ErrorKind
  case object RateLimited extends ErrorKind
  case object InternalError extends ErrorKind
  case object Other extends ErrorKind

  /** Transient kinds are retryable; the rest fail fast (the contract
    * [[CloudHelpers.runWithRetry]] enforces).
    */
  def isTransient(k: ErrorKind): Boolean = k match {
    case Network | Timeout | ServiceUnavailable | RateLimited => true
    case _ => false
  }
}

/** reference: CloudIOError, src/io/cloud/traits.rs:16-21 */
final case class CloudIOError(
    kind: ErrorKind,
    message: String,
    source: Option[String] = None
) {
  def withSource(s: String): CloudIOError = copy(source = Some(s))
  override def toString: String =
    s"CloudIOError($kind: $message${source.fold("")(s => s", source=$s")})"
}

/** Provider-scoped resource name (reference: ResourceId,
  * src/io/cloud/traits.rs:122-149).
  */
final case class ResourceId(
    provider: String,
    resourceType: String,
    name: String,
    namespace: Option[String] = None
) {
  def withNamespace(ns: String): ResourceId = copy(namespace = Some(ns))
  override def toString: String =
    namespace.fold(s"$provider:$resourceType:$name")(ns => s"$provider:$resourceType:$ns/$name")
}

/** reference: ObjectMetadata, src/io/cloud/traits.rs:237-245 */
final case class ObjectMetadata(
    key: String,
    size: Long,
    contentType: Option[String] = None,
    lastModified: Option[Long] = None,
    etag: Option[String] = None,
    customMetadata: Map[String, String] = Map.empty
)

/** Object storage operations (reference: ObjectIO,
  * src/io/cloud/traits.rs:247-306).
  */
trait ObjectIO {
  def putObject(bucket: String, key: String, data: Array[Byte]): CloudResult[Unit]
  def getObject(bucket: String, key: String): CloudResult[Array[Byte]]
  def deleteObject(bucket: String, key: String): CloudResult[Unit]
  def listObjects(bucket: String, prefix: Option[String]): CloudResult[Seq[ObjectMetadata]]
  def objectExists(bucket: String, key: String): CloudResult[Boolean]
  def getMetadata(bucket: String, key: String): CloudResult[ObjectMetadata]
  def copyObject(srcBucket: String, srcKey: String, dstBucket: String, dstKey: String): CloudResult[Unit]
}

/** reference: Document, src/io/cloud/traits.rs:453-458 */
final case class Document(
    key: String,
    data: Map[String, String],
    version: Option[String] = None
)

/** Key-value / document store operations (reference: KeyValueIO,
  * src/io/cloud/traits.rs:460-523).
  */
trait KeyValueIO {
  def put(collection: String, key: String, data: Map[String, String]): CloudResult[Unit]
  def get(collection: String, key: String): CloudResult[Option[Document]]
  def delete(collection: String, key: String): CloudResult[Unit]
  def query(collection: String, filter: Map[String, String], limit: Option[Int]): CloudResult[Seq[Document]]
  def batchGet(collection: String, keys: Seq[String]): CloudResult[Seq[Option[Document]]]
  def batchPut(collection: String, items: Seq[(String, Map[String, String])]): CloudResult[Unit]
  def exists(collection: String, key: String): CloudResult[Boolean]
}

/** reference: QueueMessage, src/io/cloud/traits.rs:700-707 */
final case class QueueMessage(
    id: String,
    receiptHandle: String,
    body: String,
    attributes: Map[String, String] = Map.empty,
    receiveCount: Int = 0
)

/** Message queue operations (reference: QueueIO,
  * src/io/cloud/traits.rs:709-777).
  */
trait QueueIO {
  def send(queue: String, body: String, attributes: Map[String, String]): CloudResult[String]
  def sendBatch(queue: String, bodies: Seq[String]): CloudResult[Seq[String]]
  def receive(queue: String, maxMessages: Int): CloudResult[Seq[QueueMessage]]
  def delete(queue: String, receiptHandle: String): CloudResult[Unit]
  def deleteBatch(queue: String, receiptHandles: Seq[String]): CloudResult[Unit]
  def queueSize(queue: String): CloudResult[Long]
  def purge(queue: String): CloudResult[Unit]
}

/** reference: Message, src/io/cloud/traits.rs:310-316 */
final case class PubSubMessage(
    id: String,
    data: Array[Byte],
    attributes: Map[String, String] = Map.empty,
    publishTime: Option[Long] = None
)

/** Pub/sub streaming operations (reference: PubSubIO,
  * src/io/cloud/traits.rs:318-375).
  */
trait PubSubIO {
  def publish(topic: String, data: Array[Byte], attributes: Map[String, String]): CloudResult[String]
  def publishBatch(topic: String, messages: Seq[Array[Byte]]): CloudResult[Seq[String]]
  def subscribe(topic: String, subscriptionName: String): CloudResult[Unit]
  def pull(subscription: String, maxMessages: Int): CloudResult[Seq[PubSubMessage]]
  def acknowledge(subscription: String, ackIds: Seq[String]): CloudResult[Unit]
  def topicExists(topic: String): CloudResult[Boolean]
}
