package graft.tools

/** Shared splitmix64 mix + uniform-[0,1) derivation — ONE definition of
  * the deterministic-generator idiom the probe corpora key on
  * (Sf1Bench and HeapsProbe previously held private copies, which
  * could drift independently and silently change the other tool's
  * corpus). Serializable: generator closures capture the module. */
private[tools] object Splitmix extends Serializable {
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  def u01(z: Long): Double = (mix(z) >>> 11) * (1.0 / (1L << 53))
}
