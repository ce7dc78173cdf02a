package graft.pipeline

import java.util.concurrent.LinkedBlockingQueue

/** Pluggable pipeline logging, mirroring the reference's `logging`
  * package (console / channel / no-op; /root/reference/logging).
  * Driver-side only: executors never call these.
  */
object LogLevel extends Enumeration {
  val Debug, Info, Warn, Error = Value
}

trait GraftLogger extends Serializable {
  def debug(msg: => String): Unit
  def info(msg: => String): Unit
  def warn(msg: => String): Unit
  def error(msg: => String): Unit
  /** Release any resources (reference logging.Logger.Close). */
  def close(): Unit = ()
}

/** Discards everything (reference logging/noops.go). */
object NoOpLogger extends GraftLogger {
  def debug(msg: => String): Unit = ()
  def info(msg: => String): Unit = ()
  def warn(msg: => String): Unit = ()
  def error(msg: => String): Unit = ()
}

/** Prints to stdout/stderr at-or-above `level`
  * (reference logging/console.go).
  */
final class ConsoleLogger(level: LogLevel.Value) extends GraftLogger {
  private def log(l: LogLevel.Value, tag: String, msg: => String): Unit =
    if (l >= level) {
      val line = s"[$tag] $msg"
      if (l == LogLevel.Error) System.err.println(line) else println(line)
    }
  def debug(msg: => String): Unit = log(LogLevel.Debug, "DEBUG", msg)
  def info(msg: => String): Unit = log(LogLevel.Info, "INFO", msg)
  def warn(msg: => String): Unit = log(LogLevel.Warn, "WARN", msg)
  def error(msg: => String): Unit = log(LogLevel.Error, "ERROR", msg)
}

/** Pushes formatted lines onto a queue the caller drains — the
  * JVM-idiomatic analogue of the reference's channel logger
  * (logging/channel.go).
  */
final class ChannelLogger(level: LogLevel.Value,
                          val queue: LinkedBlockingQueue[String] = new LinkedBlockingQueue[String]())
    extends GraftLogger {
  private def log(l: LogLevel.Value, tag: String, msg: => String): Unit =
    if (l >= level) queue.offer(s"[$tag] $msg")
  def debug(msg: => String): Unit = log(LogLevel.Debug, "DEBUG", msg)
  def info(msg: => String): Unit = log(LogLevel.Info, "INFO", msg)
  def warn(msg: => String): Unit = log(LogLevel.Warn, "WARN", msg)
  def error(msg: => String): Unit = log(LogLevel.Error, "ERROR", msg)
}
