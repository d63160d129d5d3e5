package graft.report

/** Pluggable event-reporter SPI — capability parity with the reference's
  * reflection-loaded reporter interface
  * (ref `reporter/StreamingLensEventsReporterInterface.scala:20-29`,
  * loading at `helper/StreamingLensReportingHelper.scala:48-64`).
  */
trait EventsReporter {
  def init(options: Map[String, String], queryId: String): Unit
  def sendEvent(json: String): Unit
  def close(): Unit = ()
}

object EventsReporter {
  /** Reflection-load a reporter by class name; it must implement
    * [[EventsReporter]] and have a no-arg constructor. */
  def load(className: String, options: Map[String, String],
           queryId: String): EventsReporter = {
    val cls = Class.forName(className)
    require(classOf[EventsReporter].isAssignableFrom(cls),
      s"$className does not implement graft.report.EventsReporter")
    val r = cls.getDeclaredConstructor().newInstance().asInstanceOf[EventsReporter]
    r.init(options, queryId)
    r
  }
}

/** Default reporter: driver log via println (the reference's log sink,
  * `QueryInsightsManager.scala:206-232`). */
class LogReporter extends EventsReporter {
  override def init(options: Map[String, String], queryId: String): Unit = ()
  override def sendEvent(json: String): Unit = println(s"[graft-report] $json")
}
