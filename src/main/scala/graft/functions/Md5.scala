package graft.functions

/** The one MD5-hex implementation for imperative (non-Catalyst)
  * sites — the multimodal codec passes and s20's segment keys all
  * hash content to the same 32-char lowercase hex as SQL `md5()`,
  * and the discipline (charset, casing) must not drift between them.
  * Thread-local digest: per-row calls reuse one instance per task
  * thread instead of re-allocating.
  */
object Md5 {
  private val local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hex(bytes: Array[Byte]): String = {
    val md = local.get()
    md.reset()
    val d = md.digest(bytes)
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  def hex(s: String): String =
    hex(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}
