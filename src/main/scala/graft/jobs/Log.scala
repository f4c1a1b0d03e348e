package graft.jobs

import org.slf4j.LoggerFactory

/** Structured job logging (reference's dedicated logger module,
  * `/root/reference/src/helper/logger.py:1-43`, which tags every line
  * with the workflow/execution context). Rendered as `key=value`
  * pairs after the message so log aggregators can parse fields
  * without a custom layout; transport stays slf4j → Spark's log4j2
  * config, so driver/executor routing matches every other Spark log
  * line. */
final class Log(name: String) {
  private val underlying = LoggerFactory.getLogger(name)

  private def render(msg: String, fields: Seq[(String, Any)]): String =
    if (fields.isEmpty) msg
    else fields.map { case (k, v) => s"$k=$v" }.mkString(s"$msg ", " ", "")

  def info(msg: String, fields: (String, Any)*): Unit =
    underlying.info(render(msg, fields))
  def warn(msg: String, fields: (String, Any)*): Unit =
    underlying.warn(render(msg, fields))
  def error(msg: String, e: Throwable, fields: (String, Any)*): Unit =
    underlying.error(render(msg, fields), e)
}

object Log {
  def apply(clazz: Class[_]): Log = new Log(clazz.getName.stripSuffix("$"))
}
