package graft.sources.cloud

/** Provider-agnostic cloud I/O abstraction layer: the reference ships
  * 14 capability traits plus in-memory fakes so pipeline code (and its
  * tests) never bind to a concrete provider SDK
  * (reference: src/io/cloud/traits.rs:68-1125). This port covers all
  * fourteen — object storage, key-value/document store, message queue,
  * pub/sub, warehouse, relational database (+ transactions), search,
  * metrics, config, cache, graph, serverless compute, notifications,
  * ML inference — with the same method surfaces and error taxonomy;
  * results are `Either[CloudIOError, T]` (Scala's idiomatic
  * `CloudResult`).
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

/** Service credentials (reference: CloudCredentials,
  * src/io/cloud/traits.rs:68-86).
  */
trait CloudCredentials {
  def identifier: String
  def credentialType: String
  def validate(): CloudResult[Unit]
  def metadata: Map[String, String] = Map.empty
}

/** Service configuration (reference: CloudConfig,
  * src/io/cloud/traits.rs:89-114; same defaults).
  */
trait CloudConfig {
  def region: Option[String] = None
  def endpoint: Option[String] = None
  def timeoutSecs: Long = 30
  def maxRetries: Int = 3
  def extra: Map[String, String] = Map.empty
}

/** reference: QueryResult, src/io/cloud/traits.rs:170-174 */
final case class QueryResult(
    columns: Seq[String],
    rows: Seq[Seq[String]],
    rowCount: Int
)

/** Analytical warehouse operations (reference: WarehouseIO,
  * src/io/cloud/traits.rs:177-229). Control-plane surface: submit SQL
  * to a remote engine, stage loads/exports by URI — bulk data still
  * moves engine-side, never through this JVM.
  */
trait WarehouseIO {
  def query(sql: String): CloudResult[QueryResult]
  def execute(sql: String): CloudResult[Unit]
  def loadData(table: String, sourceUri: String, options: Map[String, String]): CloudResult[Unit]
  def exportData(sql: String, destinationUri: String, options: Map[String, String]): CloudResult[Unit]
  def tableExists(table: String): CloudResult[Boolean]
  def getSchema(table: String): CloudResult[Seq[(String, String)]]
}

/** Relational database operations (reference: DatabaseIO,
  * src/io/cloud/traits.rs:379-414; `Row` alias :376).
  */
trait DatabaseIO {
  def query(sql: String, params: Seq[String]): CloudResult[Seq[Map[String, String]]]
  def execute(sql: String, params: Seq[String]): CloudResult[Long]
  def beginTransaction(): CloudResult[Transaction]
  def tableExists(table: String): CloudResult[Boolean]
  def getSchema(table: String): CloudResult[Seq[(String, String)]]
}

/** Database transaction handle (reference: Transaction,
  * src/io/cloud/traits.rs:417-445). `commit`/`rollback` consume the
  * handle; further use is a caller error.
  */
trait Transaction {
  def query(sql: String, params: Seq[String]): CloudResult[Seq[Map[String, String]]]
  def execute(sql: String, params: Seq[String]): CloudResult[Long]
  def commit(): CloudResult[Unit]
  def rollback(): CloudResult[Unit]
}

/** reference: SearchHit, src/io/cloud/traits.rs:525-529 */
final case class SearchHit(
    id: String,
    score: Double,
    fields: Map[String, String]
)

/** reference: SearchQuery, src/io/cloud/traits.rs:532-538 */
final case class SearchQuery(
    query: String,
    filters: Map[String, String] = Map.empty,
    limit: Int = 10,
    offset: Int = 0
)

/** Search / log index operations (reference: SearchIO,
  * src/io/cloud/traits.rs:541-587).
  */
trait SearchIO {
  def index(index: String, id: String, document: Map[String, String]): CloudResult[Unit]
  def batchIndex(index: String, documents: Seq[(String, Map[String, String])]): CloudResult[Unit]
  def search(index: String, query: SearchQuery): CloudResult[Seq[SearchHit]]
  def delete(index: String, id: String): CloudResult[Unit]
  def get(index: String, id: String): CloudResult[Option[Map[String, String]]]
  def indexExists(index: String): CloudResult[Boolean]
}

/** reference: MetricPoint, src/io/cloud/traits.rs:595-600 */
final case class MetricPoint(
    name: String,
    value: Double,
    timestamp: Long,
    tags: Map[String, String] = Map.empty
)

/** reference: MetricQuery, src/io/cloud/traits.rs:604-610 */
final case class MetricQuery(
    metricName: String,
    startTime: Long,
    endTime: Long,
    aggregation: Option[String] = None,
    tags: Map[String, String] = Map.empty
)

/** Metrics / monitoring operations (reference: MetricIO,
  * src/io/cloud/traits.rs:613-641).
  */
trait MetricIO {
  def putMetric(namespace: String, metric: MetricPoint): CloudResult[Unit]
  def putMetrics(namespace: String, metrics: Seq[MetricPoint]): CloudResult[Unit]
  def queryMetrics(namespace: String, query: MetricQuery): CloudResult[Seq[MetricPoint]]
  def listMetrics(namespace: String): CloudResult[Seq[String]]
}

/** reference: ConfigValue, src/io/cloud/traits.rs:649-654 */
final case class ConfigValue(
    key: String,
    value: String,
    version: Option[String] = None,
    isSecret: Boolean = false
)

/** Configuration / secret store operations (reference: ConfigIO,
  * src/io/cloud/traits.rs:657-692).
  */
trait ConfigIO {
  def get(key: String): CloudResult[ConfigValue]
  def set(key: String, value: String, isSecret: Boolean): CloudResult[Unit]
  def delete(key: String): CloudResult[Unit]
  def list(prefix: Option[String]): CloudResult[Seq[String]]
  def batchGet(keys: Seq[String]): CloudResult[Seq[Option[ConfigValue]]]
}

/** In-memory cache operations (reference: CacheIO,
  * src/io/cloud/traits.rs:779-835).
  */
trait CacheIO {
  def get(key: String): CloudResult[Option[Array[Byte]]]
  def set(key: String, value: Array[Byte], ttlSecs: Option[Long]): CloudResult[Unit]
  def delete(key: String): CloudResult[Unit]
  def exists(key: String): CloudResult[Boolean]
  def getBatch(keys: Seq[String]): CloudResult[Seq[Option[Array[Byte]]]]
  def setBatch(items: Seq[(String, Array[Byte], Option[Long])]): CloudResult[Unit]
  def increment(key: String, delta: Long): CloudResult[Long]
  def flush(): CloudResult[Unit]
}

/** reference: GraphNode, src/io/cloud/traits.rs:843-847 */
final case class GraphNode(
    id: String,
    labels: Seq[String],
    properties: Map[String, String]
)

/** reference: GraphEdge, src/io/cloud/traits.rs:851-857 */
final case class GraphEdge(
    id: String,
    label: String,
    fromNode: String,
    toNode: String,
    properties: Map[String, String]
)

/** reference: EdgeDirection, src/io/cloud/traits.rs:940-945 */
sealed trait EdgeDirection
object EdgeDirection {
  case object Outgoing extends EdgeDirection
  case object Incoming extends EdgeDirection
  case object Both extends EdgeDirection
}

/** Graph database operations (reference: GraphIO,
  * src/io/cloud/traits.rs:860-938).
  */
trait GraphIO {
  def addNode(labels: Seq[String], properties: Map[String, String]): CloudResult[String]
  def getNode(id: String): CloudResult[Option[GraphNode]]
  def updateNode(id: String, properties: Map[String, String]): CloudResult[Unit]
  def deleteNode(id: String): CloudResult[Unit]
  def addEdge(from: String, to: String, label: String, properties: Map[String, String]): CloudResult[String]
  def getEdge(id: String): CloudResult[Option[GraphEdge]]
  def deleteEdge(id: String): CloudResult[Unit]
  def query(query: String, params: Map[String, String]): CloudResult[Seq[Map[String, String]]]
  def getNeighbors(nodeId: String, direction: EdgeDirection): CloudResult[Seq[GraphNode]]
}

/** reference: ComputeResult, src/io/cloud/traits.rs:953-958 */
final case class ComputeResult(
    statusCode: Int,
    output: Array[Byte],
    logs: Option[String] = None,
    executionTimeMs: Long = 0
)

/** reference: InvocationStatus, src/io/cloud/traits.rs:991-998 */
sealed trait InvocationStatus
object InvocationStatus {
  case object Pending extends InvocationStatus
  case object Running extends InvocationStatus
  case object Succeeded extends InvocationStatus
  case object Failed extends InvocationStatus
  case object TimedOut extends InvocationStatus
}

/** Serverless compute operations (reference: ComputeIO,
  * src/io/cloud/traits.rs:961-989).
  */
trait ComputeIO {
  def invoke(functionName: String, payload: Array[Byte]): CloudResult[ComputeResult]
  def invokeAsync(functionName: String, payload: Array[Byte]): CloudResult[String]
  def getInvocationStatus(invocationId: String): CloudResult[InvocationStatus]
  def listFunctions(): CloudResult[Seq[String]]
}

/** reference: Notification, src/io/cloud/traits.rs:1006-1011 */
final case class Notification(
    target: String,
    subject: Option[String],
    message: String,
    attributes: Map[String, String] = Map.empty
)

/** reference: NotificationStatus, src/io/cloud/traits.rs:1020-1025 */
sealed trait NotificationStatus
object NotificationStatus {
  case object Sent extends NotificationStatus
  case object Failed extends NotificationStatus
  case object Pending extends NotificationStatus
}

/** reference: NotificationResult, src/io/cloud/traits.rs:1014-1018 */
final case class NotificationResult(
    messageId: String,
    status: NotificationStatus
)

/** Push-notification operations (reference: NotificationIO,
  * src/io/cloud/traits.rs:1028-1070).
  */
trait NotificationIO {
  def send(notification: Notification): CloudResult[NotificationResult]
  def sendBatch(notifications: Seq[Notification]): CloudResult[Seq[NotificationResult]]
  def subscribe(topic: String, endpoint: String, protocol: String): CloudResult[String]
  def unsubscribe(subscriptionId: String): CloudResult[Unit]
  def createTopic(name: String): CloudResult[String]
  def deleteTopic(topic: String): CloudResult[Unit]
}

/** reference: InferenceInput, src/io/cloud/traits.rs:1078-1081 */
final case class InferenceInput(
    data: Array[Byte],
    contentType: String
)

/** reference: InferenceOutput, src/io/cloud/traits.rs:1085-1090 */
final case class InferenceOutput(
    data: Array[Byte],
    contentType: String,
    modelVersion: Option[String] = None,
    inferenceTimeMs: Long = 0
)

/** ML model inference operations (reference: IntelligenceIO,
  * src/io/cloud/traits.rs:1093-1125).
  */
trait IntelligenceIO {
  def predict(modelName: String, input: InferenceInput): CloudResult[InferenceOutput]
  def predictBatch(modelName: String, inputs: Seq[InferenceInput]): CloudResult[Seq[InferenceOutput]]
  def listModels(): CloudResult[Seq[String]]
  def getModelInfo(modelName: String): CloudResult[Map[String, String]]
}
