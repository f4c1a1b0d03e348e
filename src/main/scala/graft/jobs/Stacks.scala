package graft.jobs

import java.io.{PrintWriter, StringWriter}

/** Full-stack-trace rendering for monitor rows — the reference stores
  * the complete traceback string with each failed execution
  * (`/root/reference/src/helper/postgres.py:45-63`), not just the
  * message. */
object Stacks {
  def render(e: Throwable): String = {
    val sw = new StringWriter()
    e.printStackTrace(new PrintWriter(sw))
    sw.toString
  }
}
