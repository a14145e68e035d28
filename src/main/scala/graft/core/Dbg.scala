package graft.core

/** Env-gated section timer for driver-phase attribution inside
  * operators (guide §7.3) — `GRAFT_PHASE_DEBUG=1` prints one stderr
  * line per wrapped section; otherwise zero overhead beyond a val
  * read. Diagnostic only; never wired into results. */
object Dbg {
  val on: Boolean = sys.env.get("GRAFT_PHASE_DEBUG").contains("1")
  def t[A](label: String)(body: => A): A =
    if (!on) body
    else {
      val t0 = System.nanoTime()
      val a = body
      System.err.println(
        f"[dbg] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      a
    }
}
