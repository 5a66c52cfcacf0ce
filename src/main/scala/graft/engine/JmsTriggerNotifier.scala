package graft.engine

/** Shared GSTriggerInfo-shaped JSON payload for trigger transports (name,
  * container, event, columns; `rows` is the batch's affected-row count —
  * micro-batch granularity is this engine's documented firing unit). */
private[graft] object TriggerJson {
  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
  def body(e: TriggerEvent): String = {
    val cols = e.trigger.columns.map(c => "\"" + esc(c) + "\"").mkString("[", ",", "]")
    s"""{"trigger":"${esc(e.trigger.name)}","container":"${esc(e.trigger.table)}",""" +
      s""""event":"${esc(e.event)}","rows":${e.rows},"columns":$cols}"""
  }
}

/** The JMS producer seam: one method mirroring a JMS TextMessage send to a
  * named destination. The reference's trigger API carries exactly these
  * fields (gridstore.h:817 GS_TRIGGER_JMS; :859-868 jmsDestinationType,
  * jmsDestinationName, user, password).
  *
  * The provider is INJECTED rather than linked: a Spark deployment carries
  * no broker client on its classpath (and this build is zero-egress), so
  * the deployment implements send() with its real javax.jms producer
  * (ActiveMQ, Artemis, ...) — typically a pooled connection per executor —
  * and tests inject an in-memory sender. Implementations should not block
  * indefinitely: the notifier treats a throw as a dead-letter, mirroring
  * the REST transport's fire-and-forget discipline.
  */
trait JmsMessageSender {
  /** @param destinationType "queue" or "topic" (GSTriggerInfo
    *   jmsDestinationType; the reference leaves it free-form)
    * @param destinationName JMS destination to publish to
    * @param user/password optional broker credentials from the trigger
    * @param body the GSTriggerInfo-shaped JSON TextMessage payload */
  def send(destinationType: String, destinationName: String,
           user: Option[String], password: Option[String], body: String): Unit
}

/** JMS notification transport for event triggers — the second transport the
  * reference's client API declares (GS_TRIGGER_JMS). Note the CE server
  * itself REJECTS trigger creation ("Trigger not support",
  * /root/reference/server/transaction_service_base.cpp:5078), so both
  * transports here are additive relative to the running reference; the
  * surface matches the CLIENT contract, which is what user code compiles
  * against.
  *
  * Same dead-letter discipline as [[RestTriggerNotifier]]: undeliverable
  * notifications (wrong transport routed here, missing destination, sender
  * throw) land in a bounded log instead of unwinding the ingest path.
  */
final class JmsTriggerNotifier(sender: JmsMessageSender,
                               maxDeadLetters: Int = 1024) {

  private val dead = scala.collection.mutable.ArrayDeque[DeadLetter]()

  /** Undeliverable notifications, oldest first (bounded at maxDeadLetters). */
  def deadLetters: Seq[DeadLetter] = dead.synchronized { dead.toList }

  private def record(e: TriggerEvent, err: String): Unit = dead.synchronized {
    if (dead.size >= maxDeadLetters) dead.removeHead()
    dead.append(DeadLetter(e, err, System.currentTimeMillis()))
    ()
  }

  def notify(e: TriggerEvent): Unit = {
    if (!"JMS".equalsIgnoreCase(e.trigger.triggerType)) {
      record(e, s"unsupported transport '${e.trigger.triggerType}' on the JMS " +
        "notifier — route REST triggers to RestTriggerNotifier (TriggerTransports.routed)")
      return
    }
    e.trigger.jmsDestinationName.filter(_.nonEmpty) match {
      case None => record(e, "JMS trigger has no jmsDestinationName")
      case Some(dest) =>
        try sender.send(e.trigger.jmsDestinationType.getOrElse("queue"), dest,
          e.trigger.user, e.trigger.password, TriggerJson.body(e))
        catch {
          case scala.util.control.NonFatal(ex) => record(e, ex.toString)
        }
    }
  }

  /** Bind this transport alone to a catalog (REST triggers dead-letter). */
  def install(cat: GraftCatalog): this.type = { cat.onTrigger(notify); this }
}

/** Transport router: dispatch each firing by the trigger's declared type —
  * the binding a deployment with both REST and JMS triggers installs:
  * {{{ cat.onTrigger(TriggerTransports.routed(rest, jms)) }}} */
object TriggerTransports {
  def routed(rest: RestTriggerNotifier, jms: JmsTriggerNotifier): TriggerEvent => Unit =
    e => if ("JMS".equalsIgnoreCase(e.trigger.triggerType)) jms.notify(e)
         else rest.notify(e)
}
