package graft.sources.cloud

import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable

import CloudIO.CloudResult

/** In-memory fake implementations of the cloud traits, mirroring the
  * reference's test doubles (reference: src/io/cloud/fake.rs — e.g.
  * FakeObjectIO :220-340, FakePubSubIO :343-452, FakeKeyValueIO :570,
  * FakeQueueIO :940-1053). Semantics preserved: object get/metadata on
  * a missing key is NotFound, listing a missing bucket is NotFound,
  * pulls/receives drain FIFO up to the max, queue delete/ack are no-ops
  * (the fake drains on receive), ids are a "msg-<n>" counter. All state
  * is behind a single lock per fake — these are test doubles, not
  * throughput paths.
  */
final class FakeObjectIO extends ObjectIO {
  private val storage = mutable.Map.empty[String, mutable.Map[String, Array[Byte]]]

  private def notFound(bucket: String, key: String) =
    CloudIOError(ErrorKind.NotFound, s"Object $bucket/$key not found")

  override def putObject(bucket: String, key: String, data: Array[Byte]): CloudResult[Unit] =
    synchronized {
      storage.getOrElseUpdate(bucket, mutable.Map.empty).update(key, data.clone())
      Right(())
    }

  override def getObject(bucket: String, key: String): CloudResult[Array[Byte]] =
    synchronized {
      storage.get(bucket).flatMap(_.get(key)).map(_.clone()).toRight(notFound(bucket, key))
    }

  override def deleteObject(bucket: String, key: String): CloudResult[Unit] =
    synchronized {
      storage.get(bucket).foreach(_.remove(key))
      Right(())
    }

  override def listObjects(bucket: String, prefix: Option[String]): CloudResult[Seq[ObjectMetadata]] =
    synchronized {
      storage.get(bucket)
        .toRight(CloudIOError(ErrorKind.NotFound, s"Bucket $bucket not found"))
        .map { b =>
          b.iterator
            .filter { case (k, _) => prefix.forall(k.startsWith) }
            .map { case (k, d) => meta(k, d) }
            .toSeq.sortBy(_.key)
        }
    }

  override def objectExists(bucket: String, key: String): CloudResult[Boolean] =
    synchronized { Right(storage.get(bucket).exists(_.contains(key))) }

  override def getMetadata(bucket: String, key: String): CloudResult[ObjectMetadata] =
    synchronized {
      storage.get(bucket).flatMap(_.get(key)).map(d => meta(key, d)).toRight(notFound(bucket, key))
    }

  override def copyObject(srcBucket: String, srcKey: String, dstBucket: String, dstKey: String): CloudResult[Unit] =
    getObject(srcBucket, srcKey).flatMap(d => putObject(dstBucket, dstKey, d))

  private def meta(key: String, data: Array[Byte]) =
    ObjectMetadata(key, data.length.toLong, Some("application/octet-stream"), Some(0L), Some(s"etag-$key"))
}

final class FakeKeyValueIO extends KeyValueIO {
  private val collections = mutable.Map.empty[String, mutable.Map[String, Document]]

  override def put(collection: String, key: String, data: Map[String, String]): CloudResult[Unit] =
    synchronized {
      val coll = collections.getOrElseUpdate(collection, mutable.Map.empty)
      val version = coll.get(key).flatMap(_.version).flatMap(_.toLongOption).getOrElse(0L) + 1
      coll.update(key, Document(key, data, Some(version.toString)))
      Right(())
    }

  override def get(collection: String, key: String): CloudResult[Option[Document]] =
    synchronized { Right(collections.get(collection).flatMap(_.get(key))) }

  override def delete(collection: String, key: String): CloudResult[Unit] =
    synchronized {
      collections.get(collection).foreach(_.remove(key))
      Right(())
    }

  override def query(collection: String, filter: Map[String, String], limit: Option[Int]): CloudResult[Seq[Document]] =
    synchronized {
      val docs = collections.get(collection).map(_.values.toSeq).getOrElse(Seq.empty)
        .filter(d => filter.forall { case (k, v) => d.data.get(k).contains(v) })
        .sortBy(_.key)
      Right(limit.fold(docs)(docs.take))
    }

  override def batchGet(collection: String, keys: Seq[String]): CloudResult[Seq[Option[Document]]] =
    synchronized { Right(keys.map(k => collections.get(collection).flatMap(_.get(k)))) }

  override def batchPut(collection: String, items: Seq[(String, Map[String, String])]): CloudResult[Unit] = {
    items.foreach { case (k, d) => put(collection, k, d) }
    Right(())
  }

  override def exists(collection: String, key: String): CloudResult[Boolean] =
    synchronized { Right(collections.get(collection).exists(_.contains(key))) }
}

final class FakeQueueIO extends QueueIO {
  private val queues = mutable.Map.empty[String, mutable.ArrayDeque[QueueMessage]]
  private val counter = new AtomicLong(0)

  override def send(queue: String, body: String, attributes: Map[String, String]): CloudResult[String] =
    synchronized {
      val id = s"msg-${counter.incrementAndGet()}"
      queues.getOrElseUpdate(queue, mutable.ArrayDeque.empty)
        .append(QueueMessage(id, s"receipt-$id", body, attributes))
      Right(id)
    }

  override def sendBatch(queue: String, bodies: Seq[String]): CloudResult[Seq[String]] =
    Right(bodies.map(b => send(queue, b, Map.empty).toOption.get))

  override def receive(queue: String, maxMessages: Int): CloudResult[Seq[QueueMessage]] =
    synchronized {
      val q = queues.getOrElseUpdate(queue, mutable.ArrayDeque.empty)
      val n = math.min(math.max(maxMessages, 0), q.size)
      Right((0 until n).map(_ => q.removeHead().copy(receiveCount = 1)))
    }

  override def delete(queue: String, receiptHandle: String): CloudResult[Unit] = Right(())

  override def deleteBatch(queue: String, receiptHandles: Seq[String]): CloudResult[Unit] = Right(())

  override def queueSize(queue: String): CloudResult[Long] =
    synchronized { Right(queues.get(queue).map(_.size.toLong).getOrElse(0L)) }

  override def purge(queue: String): CloudResult[Unit] =
    synchronized {
      queues.get(queue).foreach(_.clear())
      Right(())
    }
}

final class FakePubSubIO extends PubSubIO {
  private val topics = mutable.Map.empty[String, mutable.ArrayBuffer[PubSubMessage]]
  private val subscriptions = mutable.Map.empty[String, mutable.ArrayDeque[PubSubMessage]]
  // subscription key -> EXACT topic: fan-out must not match by key
  // prefix, which would leak "news" messages to a "news/sports"
  // subscriber (nested topic names are legal)
  private val subscriptionTopic = mutable.Map.empty[String, String]
  private val counter = new AtomicLong(0)

  override def publish(topic: String, data: Array[Byte], attributes: Map[String, String]): CloudResult[String] =
    synchronized {
      val id = s"msg-${counter.incrementAndGet()}"
      val msg = PubSubMessage(id, data.clone(), attributes, Some(0L))
      topics.getOrElseUpdate(topic, mutable.ArrayBuffer.empty).append(msg)
      // fan out to exactly this topic's subscriptions
      subscriptionTopic.iterator
        .collect { case (key, t) if t == topic => key }
        .foreach(subscriptions(_).append(msg))
      Right(id)
    }

  override def publishBatch(topic: String, messages: Seq[Array[Byte]]): CloudResult[Seq[String]] =
    Right(messages.map(m => publish(topic, m, Map.empty).toOption.get))

  override def subscribe(topic: String, subscriptionName: String): CloudResult[Unit] =
    synchronized {
      val key = s"$topic/$subscriptionName"
      subscriptions.update(key, mutable.ArrayDeque.empty)
      subscriptionTopic.update(key, topic)
      Right(())
    }

  override def pull(subscription: String, maxMessages: Int): CloudResult[Seq[PubSubMessage]] =
    synchronized {
      val q = subscriptions.getOrElseUpdate(subscription, mutable.ArrayDeque.empty)
      val n = math.min(math.max(maxMessages, 0), q.size)
      Right((0 until n).map(_ => q.removeHead()))
    }

  override def acknowledge(subscription: String, ackIds: Seq[String]): CloudResult[Unit] = Right(())

  override def topicExists(topic: String): CloudResult[Boolean] =
    synchronized { Right(topics.contains(topic)) }
}

/** reference: FakeCredentials, fake.rs:29-52 — empty identifier is an
  * Authentication failure.
  */
final case class FakeCredentials(
    identifier: String,
    credentialType: String
) extends CloudCredentials {
  override def validate(): CloudResult[Unit] =
    if (identifier.isEmpty) Left(CloudIOError(ErrorKind.Authentication, "Empty identifier"))
    else Right(())
}

/** reference: FakeConfig, fake.rs:55-89 (same defaults as CloudConfig) */
final case class FakeConfig(
    override val region: Option[String] = None,
    override val endpoint: Option[String] = None,
    override val timeoutSecs: Long = 30,
    override val maxRetries: Int = 3
) extends CloudConfig

/** reference: FakeWarehouseIO, fake.rs:96-213. Fake SQL semantics
  * preserved: `query` only understands "SELECT * FROM <table>" (4th
  * whitespace token is the table; unknown table is NotFound; anything
  * else returns an empty result), `execute`/`export_data` are no-ops,
  * `load_data` creates the table if absent.
  */
final class FakeWarehouseIO extends WarehouseIO {
  private val tables = mutable.Map.empty[String, Seq[Seq[String]]]
  private val schemas = mutable.Map.empty[String, Seq[(String, String)]]

  def addTable(name: String, schema: Seq[(String, String)], data: Seq[Seq[String]]): Unit =
    synchronized {
      tables.update(name, data)
      schemas.update(name, schema)
    }

  override def query(sql: String): CloudResult[QueryResult] = synchronized {
    val parts = sql.split("\\s+").filter(_.nonEmpty)
    if (parts.length >= 4 && parts(0).equalsIgnoreCase("SELECT")) {
      val table = parts(3)
      (tables.get(table), schemas.get(table)) match {
        case (Some(data), Some(schema)) =>
          Right(QueryResult(schema.map(_._1), data, data.size))
        case _ =>
          Left(CloudIOError(ErrorKind.NotFound, s"Table $table not found"))
      }
    } else Right(QueryResult(Seq.empty, Seq.empty, 0))
  }

  override def execute(sql: String): CloudResult[Unit] = Right(())

  override def loadData(table: String, sourceUri: String, options: Map[String, String]): CloudResult[Unit] =
    synchronized {
      if (!tables.contains(table)) tables.update(table, Seq.empty)
      Right(())
    }

  override def exportData(sql: String, destinationUri: String, options: Map[String, String]): CloudResult[Unit] =
    Right(())

  override def tableExists(table: String): CloudResult[Boolean] =
    synchronized { Right(tables.contains(table)) }

  override def getSchema(table: String): CloudResult[Seq[(String, String)]] =
    synchronized {
      schemas.get(table).toRight(CloudIOError(ErrorKind.NotFound, s"Table $table not found"))
    }
}

/** reference: FakeDatabaseIO + FakeTransaction, fake.rs:452-563.
  * Same fake SQL: `query` handles "SELECT * FROM <table>" (NotFound on
  * unknown), `execute` reports 1 affected row iff the statement
  * contains INSERT; transactions delegate to the shared store (the
  * reference fake has no isolation either).
  */
final class FakeDatabaseIO extends DatabaseIO {
  private val tables = mutable.Map.empty[String, Seq[Map[String, String]]]
  private val schemas = mutable.Map.empty[String, Seq[(String, String)]]

  def addTable(name: String, schema: Seq[(String, String)]): Unit = synchronized {
    tables.update(name, Seq.empty)
    schemas.update(name, schema)
  }

  override def query(sql: String, params: Seq[String]): CloudResult[Seq[Map[String, String]]] =
    synchronized {
      val parts = sql.split("\\s+").filter(_.nonEmpty)
      if (parts.length >= 4 && parts(0).equalsIgnoreCase("SELECT")) {
        val table = parts(3)
        tables.get(table).toRight(CloudIOError(ErrorKind.NotFound, s"Table $table not found"))
      } else Right(Seq.empty)
    }

  override def execute(sql: String, params: Seq[String]): CloudResult[Long] =
    Right(if (sql.toUpperCase.contains("INSERT")) 1L else 0L)

  override def beginTransaction(): CloudResult[Transaction] =
    Right(new FakeTransaction(this))

  override def tableExists(table: String): CloudResult[Boolean] =
    synchronized { Right(tables.contains(table)) }

  override def getSchema(table: String): CloudResult[Seq[(String, String)]] =
    synchronized {
      schemas.get(table).toRight(CloudIOError(ErrorKind.NotFound, s"Table $table not found"))
    }
}

final class FakeTransaction(db: FakeDatabaseIO) extends Transaction {
  override def query(sql: String, params: Seq[String]): CloudResult[Seq[Map[String, String]]] =
    db.query(sql, params)
  override def execute(sql: String, params: Seq[String]): CloudResult[Long] =
    db.execute(sql, params)
  override def commit(): CloudResult[Unit] = Right(())
  override def rollback(): CloudResult[Unit] = Right(())
}

/** reference: FakeSearchIO, fake.rs:676-775. Match = query substring
  * appears in ANY field value AND all filters equal; constant score
  * 1.0; offset/limit window over id-sorted hits (the reference sorts
  * by score only, which is constant — id order keeps it deterministic).
  */
final class FakeSearchIO extends SearchIO {
  private val indices = mutable.Map.empty[String, mutable.Map[String, Map[String, String]]]

  override def index(index: String, id: String, document: Map[String, String]): CloudResult[Unit] =
    synchronized {
      indices.getOrElseUpdate(index, mutable.Map.empty).update(id, document)
      Right(())
    }

  override def batchIndex(index: String, documents: Seq[(String, Map[String, String])]): CloudResult[Unit] = {
    documents.foreach { case (id, doc) => this.index(index, id, doc) }
    Right(())
  }

  override def search(index: String, query: SearchQuery): CloudResult[Seq[SearchHit]] =
    synchronized {
      indices.get(index)
        .toRight(CloudIOError(ErrorKind.NotFound, s"Index $index not found"))
        .map { idx =>
          val hits = idx.iterator
            .filter { case (_, doc) =>
              doc.values.exists(_.contains(query.query)) &&
                query.filters.forall { case (k, v) => doc.get(k).contains(v) }
            }
            .map { case (id, fields) => SearchHit(id, 1.0, fields) }
            .toSeq.sortBy(_.id)
          hits.slice(query.offset, math.min(query.offset + query.limit, hits.size))
        }
    }

  override def delete(index: String, id: String): CloudResult[Unit] =
    synchronized {
      indices.get(index).foreach(_.remove(id))
      Right(())
    }

  override def get(index: String, id: String): CloudResult[Option[Map[String, String]]] =
    synchronized { Right(indices.get(index).flatMap(_.get(id))) }

  override def indexExists(index: String): CloudResult[Boolean] =
    synchronized { Right(indices.contains(index)) }
}

/** reference: FakeMetricIO, fake.rs:782-858. Query filters on exact
  * name, inclusive time range, and tag-subset match; list is
  * sorted-deduped names; unknown namespace is NotFound.
  */
final class FakeMetricIO extends MetricIO {
  private val metrics = mutable.Map.empty[String, mutable.ArrayBuffer[MetricPoint]]

  override def putMetric(namespace: String, metric: MetricPoint): CloudResult[Unit] =
    synchronized {
      metrics.getOrElseUpdate(namespace, mutable.ArrayBuffer.empty).append(metric)
      Right(())
    }

  override def putMetrics(namespace: String, points: Seq[MetricPoint]): CloudResult[Unit] = {
    points.foreach(putMetric(namespace, _))
    Right(())
  }

  override def queryMetrics(namespace: String, query: MetricQuery): CloudResult[Seq[MetricPoint]] =
    synchronized {
      metrics.get(namespace)
        .toRight(CloudIOError(ErrorKind.NotFound, s"Namespace $namespace not found"))
        .map(_.iterator.filter { m =>
          m.name == query.metricName &&
            m.timestamp >= query.startTime && m.timestamp <= query.endTime &&
            query.tags.forall { case (k, v) => m.tags.get(k).contains(v) }
        }.toSeq)
    }

  override def listMetrics(namespace: String): CloudResult[Seq[String]] =
    synchronized {
      metrics.get(namespace)
        .toRight(CloudIOError(ErrorKind.NotFound, s"Namespace $namespace not found"))
        .map(_.map(_.name).distinct.sorted.toSeq)
    }
}

/** reference: FakeConfigIO, fake.rs:865-933. Set stamps version "v1";
  * get on a missing key is NotFound; list is prefix-filtered sorted
  * keys; batch_get preserves order with None for misses.
  */
final class FakeConfigIO extends ConfigIO {
  private val config = mutable.Map.empty[String, ConfigValue]

  override def get(key: String): CloudResult[ConfigValue] =
    synchronized {
      config.get(key).toRight(CloudIOError(ErrorKind.NotFound, s"Config key $key not found"))
    }

  override def set(key: String, value: String, isSecret: Boolean): CloudResult[Unit] =
    synchronized {
      config.update(key, ConfigValue(key, value, Some("v1"), isSecret))
      Right(())
    }

  override def delete(key: String): CloudResult[Unit] =
    synchronized {
      config.remove(key)
      Right(())
    }

  override def list(prefix: Option[String]): CloudResult[Seq[String]] =
    synchronized {
      Right(config.keysIterator.filter(k => prefix.forall(k.startsWith)).toSeq.sorted)
    }

  override def batchGet(keys: Seq[String]): CloudResult[Seq[Option[ConfigValue]]] =
    synchronized { Right(keys.map(config.get)) }
}

/** reference: FakeCacheIO, fake.rs:1055-1136. TTL is accepted but
  * ignored (the reference fake never expires); increment parses the
  * current value as a UTF-8 integer, treating absent/garbage as 0.
  */
final class FakeCacheIO extends CacheIO {
  private val cache = mutable.Map.empty[String, Array[Byte]]

  override def get(key: String): CloudResult[Option[Array[Byte]]] =
    synchronized { Right(cache.get(key).map(_.clone())) }

  override def set(key: String, value: Array[Byte], ttlSecs: Option[Long]): CloudResult[Unit] =
    synchronized {
      cache.update(key, value.clone())
      Right(())
    }

  override def delete(key: String): CloudResult[Unit] =
    synchronized {
      cache.remove(key)
      Right(())
    }

  override def exists(key: String): CloudResult[Boolean] =
    synchronized { Right(cache.contains(key)) }

  override def getBatch(keys: Seq[String]): CloudResult[Seq[Option[Array[Byte]]]] =
    synchronized { Right(keys.map(k => cache.get(k).map(_.clone()))) }

  override def setBatch(items: Seq[(String, Array[Byte], Option[Long])]): CloudResult[Unit] =
    synchronized {
      items.foreach { case (k, v, _) => cache.update(k, v.clone()) }
      Right(())
    }

  override def increment(key: String, delta: Long): CloudResult[Long] =
    synchronized {
      val current = cache.get(key)
        .flatMap(b => new String(b, "UTF-8").toLongOption)
        .getOrElse(0L)
      val next = current + delta
      cache.update(key, next.toString.getBytes("UTF-8"))
      Right(next)
    }

  override def flush(): CloudResult[Unit] =
    synchronized {
      cache.clear()
      Right(())
    }
}

/** reference: FakeGraphIO, fake.rs:1143-1325. Ids are "node-<n>" /
  * "edge-<n>" counters; update_node merges properties (NotFound on a
  * missing node); deletes are idempotent; `query` returns empty (same
  * as the reference fake); neighbors resolve through live edges only.
  */
final class FakeGraphIO extends GraphIO {
  private val nodes = mutable.LinkedHashMap.empty[String, GraphNode]
  private val edges = mutable.LinkedHashMap.empty[String, GraphEdge]
  private val nodeCounter = new AtomicLong(0)
  private val edgeCounter = new AtomicLong(0)

  override def addNode(labels: Seq[String], properties: Map[String, String]): CloudResult[String] =
    synchronized {
      val id = s"node-${nodeCounter.incrementAndGet()}"
      nodes.update(id, GraphNode(id, labels, properties))
      Right(id)
    }

  override def getNode(id: String): CloudResult[Option[GraphNode]] =
    synchronized { Right(nodes.get(id)) }

  override def updateNode(id: String, properties: Map[String, String]): CloudResult[Unit] =
    synchronized {
      nodes.get(id) match {
        case Some(n) =>
          nodes.update(id, n.copy(properties = n.properties ++ properties))
          Right(())
        case None =>
          Left(CloudIOError(ErrorKind.NotFound, s"Node $id not found"))
      }
    }

  override def deleteNode(id: String): CloudResult[Unit] =
    synchronized {
      nodes.remove(id)
      Right(())
    }

  override def addEdge(from: String, to: String, label: String, properties: Map[String, String]): CloudResult[String] =
    synchronized {
      val id = s"edge-${edgeCounter.incrementAndGet()}"
      edges.update(id, GraphEdge(id, label, from, to, properties))
      Right(id)
    }

  override def getEdge(id: String): CloudResult[Option[GraphEdge]] =
    synchronized { Right(edges.get(id)) }

  override def deleteEdge(id: String): CloudResult[Unit] =
    synchronized {
      edges.remove(id)
      Right(())
    }

  override def query(query: String, params: Map[String, String]): CloudResult[Seq[Map[String, String]]] =
    Right(Seq.empty)

  override def getNeighbors(nodeId: String, direction: EdgeDirection): CloudResult[Seq[GraphNode]] =
    synchronized {
      val neighborIds = edges.valuesIterator.flatMap { e =>
        direction match {
          case EdgeDirection.Outgoing => if (e.fromNode == nodeId) Some(e.toNode) else None
          case EdgeDirection.Incoming => if (e.toNode == nodeId) Some(e.fromNode) else None
          case EdgeDirection.Both =>
            if (e.fromNode == nodeId) Some(e.toNode)
            else if (e.toNode == nodeId) Some(e.fromNode)
            else None
        }
      }.toSeq
      Right(neighborIds.flatMap(nodes.get))
    }
}

/** reference: FakeComputeIO, fake.rs:1332-1415. Registered handlers
  * run synchronously (status 200, canned logs, 10 ms); unknown
  * function is NotFound; async invokes return an "inv-<n>" id and
  * always report Succeeded.
  */
final class FakeComputeIO extends ComputeIO {
  private val functions = mutable.Map.empty[String, Array[Byte] => Array[Byte]]
  private val invocationCounter = new AtomicLong(0)

  def registerFunction(name: String)(func: Array[Byte] => Array[Byte]): Unit =
    synchronized { functions.update(name, func) }

  override def invoke(functionName: String, payload: Array[Byte]): CloudResult[ComputeResult] =
    synchronized {
      functions.get(functionName)
        .toRight(CloudIOError(ErrorKind.NotFound, s"Function $functionName not found"))
        .map(f => ComputeResult(200, f(payload), Some("Fake function executed"), 10))
    }

  override def invokeAsync(functionName: String, payload: Array[Byte]): CloudResult[String] =
    Right(s"inv-${invocationCounter.incrementAndGet()}")

  override def getInvocationStatus(invocationId: String): CloudResult[InvocationStatus] =
    Right(InvocationStatus.Succeeded)

  override def listFunctions(): CloudResult[Seq[String]] =
    synchronized { Right(functions.keysIterator.toSeq.sorted) }
}

/** reference: FakeNotificationIO, fake.rs:1422-1509. Send appends to
  * the target topic's log (creating it), ids are "msg-<n>";
  * subscription ids are "sub-<topic>-<endpoint>".
  */
final class FakeNotificationIO extends NotificationIO {
  private val topics = mutable.Map.empty[String, mutable.ArrayBuffer[Notification]]
  private val subscriptions = mutable.Map.empty[String, String]
  private val messageCounter = new AtomicLong(0)

  /** Test hook: notifications delivered to a target so far. */
  def delivered(target: String): Seq[Notification] =
    synchronized { topics.get(target).map(_.toSeq).getOrElse(Seq.empty) }

  def topicExists(topic: String): Boolean = synchronized { topics.contains(topic) }

  override def send(notification: Notification): CloudResult[NotificationResult] =
    synchronized {
      val id = s"msg-${messageCounter.incrementAndGet()}"
      topics.getOrElseUpdate(notification.target, mutable.ArrayBuffer.empty).append(notification)
      Right(NotificationResult(id, NotificationStatus.Sent))
    }

  override def sendBatch(notifications: Seq[Notification]): CloudResult[Seq[NotificationResult]] =
    Right(notifications.map(n => send(n).toOption.get))

  override def subscribe(topic: String, endpoint: String, protocol: String): CloudResult[String] =
    synchronized {
      val subId = s"sub-$topic-$endpoint"
      subscriptions.update(subId, topic)
      Right(subId)
    }

  override def unsubscribe(subscriptionId: String): CloudResult[Unit] =
    synchronized {
      subscriptions.remove(subscriptionId)
      Right(())
    }

  override def createTopic(name: String): CloudResult[String] =
    synchronized {
      topics.update(name, mutable.ArrayBuffer.empty)
      Right(name)
    }

  override def deleteTopic(topic: String): CloudResult[Unit] =
    synchronized {
      topics.remove(topic)
      Right(())
    }
}

/** reference: FakeIntelligenceIO, fake.rs:1516-1600. Registered model
  * closures answer predictions (json content type, version v1, 50 ms);
  * unknown model is NotFound; model info is name+version.
  */
final class FakeIntelligenceIO extends IntelligenceIO {
  private val models = mutable.Map.empty[String, Array[Byte] => Array[Byte]]

  def registerModel(name: String)(model: Array[Byte] => Array[Byte]): Unit =
    synchronized { models.update(name, model) }

  override def predict(modelName: String, input: InferenceInput): CloudResult[InferenceOutput] =
    synchronized {
      models.get(modelName)
        .toRight(CloudIOError(ErrorKind.NotFound, s"Model $modelName not found"))
        .map(m => InferenceOutput(m(input.data), "application/json", Some("v1"), 50))
    }

  override def predictBatch(modelName: String, inputs: Seq[InferenceInput]): CloudResult[Seq[InferenceOutput]] = {
    val out = Seq.newBuilder[InferenceOutput]
    val it = inputs.iterator
    var failed: Option[CloudIOError] = None
    while (failed.isEmpty && it.hasNext) {
      predict(modelName, it.next()) match {
        case Left(err) => failed = Some(err)
        case Right(o) => out += o
      }
    }
    failed.toLeft(out.result())
  }

  override def listModels(): CloudResult[Seq[String]] =
    synchronized { Right(models.keysIterator.toSeq.sorted) }

  override def getModelInfo(modelName: String): CloudResult[Map[String, String]] =
    synchronized {
      if (models.contains(modelName)) Right(Map("name" -> modelName, "version" -> "v1"))
      else Left(CloudIOError(ErrorKind.NotFound, s"Model $modelName not found"))
    }
}
