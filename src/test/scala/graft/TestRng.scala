package graft.statements

/** Test-only deterministic jitter source for fixture vectors (the engine's
  * sampling now runs on PortableRng; specs that just need reproducible
  * noise keep using this splitmix64 stream). */
final class SplitmixRng(seed: Long) {
  private var state = seed
  def nextLong(): Long = {
    state += 0x9e3779b97f4a7c15L
    var z = state
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
}
