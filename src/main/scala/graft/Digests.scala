package graft

/** Shared per-thread MD5 instance for executor hot paths.
  *
  * `MessageDigest.getInstance` does a provider lookup plus an
  * allocation on every call, and the instance is not thread-safe — so
  * kernels that digest per TOKEN (SimHash sketching) or per
  * (token, dimension) (the hash embedder) were paying that setup cost
  * millions of times per partition. `digest()` leaves the instance
  * reset, so one thread-local instance serves every call on a task
  * thread safely. */
private[graft] object Digests {
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  def md5(bytes: Array[Byte]): Array[Byte] = md5Local.get().digest(bytes)
}
