package graft.engine

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** A notification that could not be delivered (dead-lettered). */
final case class DeadLetter(event: TriggerEvent, error: String, atMs: Long)

/** REST notification transport for event triggers — the production binding
  * for the seam [[GraftCatalog.onTrigger]] leaves open (the default binding
  * records firings in-process for specs and operators).
  *
  * The reference delivers trigger notifications over the wire: one REST
  * (or JMS) notification per put/delete on a trigger-registered container,
  * carrying the GSTriggerInfo fields — trigger name, container, event type,
  * column set (CreateDropTriggerHandler,
  * /root/reference/server/transaction_service_base.cpp:5058). This transport
  * POSTs that payload as JSON to the trigger's registered URI.
  *
  * Delivery is FIRE-AND-FORGET by design: notification is best-effort in
  * the reference too, and a dead or slow endpoint must never stall the
  * ingest hot path — so sends are async with a short timeout, the
  * foreachBatch/put thread never blocks on the endpoint, and failures land
  * in a bounded dead-letter log (oldest evicted first) that an operator can
  * drain and alert on instead of an exception unwinding the stream. JMS
  * triggers (no broker in a Spark deployment's scope) and malformed URIs
  * dead-letter immediately with a reason.
  */
final class RestTriggerNotifier(timeout: Duration = Duration.ofSeconds(2),
                                maxDeadLetters: Int = 1024) {

  private val client = HttpClient.newBuilder().connectTimeout(timeout).build()
  private val dead = scala.collection.mutable.ArrayDeque[DeadLetter]()

  /** Undeliverable notifications, oldest first (bounded at maxDeadLetters). */
  def deadLetters: Seq[DeadLetter] = dead.synchronized { dead.toList }

  private def record(e: TriggerEvent, err: String): Unit = dead.synchronized {
    if (dead.size >= maxDeadLetters) dead.removeHead()
    dead.append(DeadLetter(e, err, System.currentTimeMillis()))
    ()
  }

  /** GSTriggerInfo-shaped JSON payload — shared with the JMS transport. */
  private[graft] def body(e: TriggerEvent): String = TriggerJson.body(e)

  /** The transport function: POST REST triggers async; dead-letter anything
    * undeliverable. Pass to [[GraftCatalog.onTrigger]] (or use [[install]]). */
  def notify(e: TriggerEvent): Unit = {
    if (!"REST".equalsIgnoreCase(e.trigger.triggerType)) {
      record(e, s"unsupported transport '${e.trigger.triggerType}' on the REST " +
        "notifier — route JMS triggers to JmsTriggerNotifier (TriggerTransports.routed)")
      return
    }
    try {
      val req = HttpRequest.newBuilder(URI.create(e.trigger.uri))
        .timeout(timeout)
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(body(e)))
        .build()
      client.sendAsync(req, HttpResponse.BodyHandlers.discarding())
        .whenComplete { (resp, err) =>
          if (err != null) record(e, String.valueOf(err))
          else if (resp.statusCode() >= 400) record(e, s"HTTP ${resp.statusCode()}")
        }
      ()
    } catch {
      case scala.util.control.NonFatal(ex) => record(e, ex.toString)
    }
  }

  /** Bind this transport to a catalog: every subsequent trigger firing
    * (batch put/remove and streaming intoContainer alike — they share
    * GraftCatalog's firing path) notifies over HTTP. */
  def install(cat: GraftCatalog): this.type = { cat.onTrigger(notify); this }
}
