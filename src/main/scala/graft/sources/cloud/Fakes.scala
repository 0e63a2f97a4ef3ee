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
  private val counter = new AtomicLong(0)

  override def publish(topic: String, data: Array[Byte], attributes: Map[String, String]): CloudResult[String] =
    synchronized {
      val id = s"msg-${counter.incrementAndGet()}"
      val msg = PubSubMessage(id, data.clone(), attributes, Some(0L))
      topics.getOrElseUpdate(topic, mutable.ArrayBuffer.empty).append(msg)
      // fan out to this topic's subscriptions
      subscriptions.keysIterator
        .filter(_.startsWith(s"$topic/"))
        .foreach(subscriptions(_).append(msg))
      Right(id)
    }

  override def publishBatch(topic: String, messages: Seq[Array[Byte]]): CloudResult[Seq[String]] =
    Right(messages.map(m => publish(topic, m, Map.empty).toOption.get))

  override def subscribe(topic: String, subscriptionName: String): CloudResult[Unit] =
    synchronized {
      subscriptions.update(s"$topic/$subscriptionName", mutable.ArrayDeque.empty)
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
