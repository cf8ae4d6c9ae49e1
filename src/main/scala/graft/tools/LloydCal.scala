package graft.tools

/** Driver-Lloyd cost-model calibration (r17 verdict task 5): times
  * [[graft.operators.VectorSearch.localLloyd]] at several (n, d, k)
  * points and fits the achieved flops/s, so `smallFitMaxFlops` — the
  * ceiling under which buildIvf's flat fit runs on the driver — is
  * justified as "≤ X ms on THIS driver at the measured rate" instead of
  * "covers the bench's own shapes". No Spark session, no writes; pure
  * CPU. Flop accounting matches the gate's: k·n·d·iters with iters = 10
  * (localLloyd may stop earlier on convergence — the gate prices the
  * worst case, so the measured wall per priced flop is conservative).
  *
  * Usage: sbt "runMain graft.tools.LloydCal"
  */
object LloydCal {
  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(42)
    def mk(n: Int, d: Int): Array[Array[Float]] =
      Array.fill(n)(Array.fill(d)(rnd.nextFloat()))
    // (n, d, k) grid spanning the flat-fit regime: bench shapes (16 cells
    // over 10k×2688 and 50k×64), a mid shape, and a near-ceiling shape
    val points = Seq(
      (10000, 2688, 16),
      (50000, 64, 16),
      (20000, 384, 128),
      (16384, 2688, 45)) // ≈ 2e10 priced flops — the current ceiling
    // JIT warmup on a small shape
    graft.operators.VectorSearch.localLloyd(mk(2000, 64), 8, 1L, 10,
      parallel = true, farthestInit = true)
    println("n,d,k,priced_flops,wall_s,flops_per_s")
    val rates = points.map { case (n, d, k) =>
      val pts = mk(n, d)
      // min-of-3: GC/JIT phase noise
      val wall = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.operators.VectorSearch.localLloyd(pts, k, 7L, 10,
          parallel = true, farthestInit = true)
        (System.nanoTime() - t0) / 1e9
      }.min
      val flops = k.toDouble * n * d * 10
      val rate = flops / wall
      println(f"$n,$d,$k,$flops%.3e,$wall%.3f,$rate%.3e")
      rate
    }
    val gm = math.exp(rates.map(math.log).sum / rates.size)
    println(f"geomean_flops_per_s=$gm%.3e")
    println(f"current_ceiling_2e10_wall_s=${2e10 / gm}%.3f")
  }
}
