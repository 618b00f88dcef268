package graft.tools

/** The IVF+BQ crossover, measured instead of extrapolated (round-14
  * verdict item #7): BENCH_NOTES' round-14 entry claimed the routed
  * bit rung pays off at ~10× the 10M smoke's 625k rows/shard — an
  * extrapolation. This probe drives the BIT-LEVEL serve kernels at
  * 10M/50M/100M rows per shard (the bit matrix is 16 B/row at 128
  * dims, so 100M rows is 1.6 GB — sandbox-driveable where the full
  * SQ8 envelope would be 12.8 GB) and prints the probe-depth curve:
  * per-query wall for the FLAT Hamming sweep vs the ROUTED
  * cell-distance + probed-member sweep, plus the ROUTING RECALL (the
  * fraction of the flat sweep's Hamming top-k the probed cells can
  * still see — the SQ8 rerank is identical on both sides given the
  * shortlist, so this overlap isolates exactly what routing loses).
  *
  * Synthetic geometry mirrors the 10M smoke's clustered family:
  * nCells sign-pattern centers, each corpus row a center with i.i.d.
  * bit flips (p = 0.125 via AND of three random words), rows grouped
  * by true cluster in CSR-position order (the sequential-bits layout
  * the real index uses). Routing here is by Hamming to the cell
  * center — the bits-only analog of the real kernel's centroid-dot
  * routing, and the IDEALIZED best case for IVF+BQ (cells == true
  * clusters), so a crossover found here is an upper bound on the
  * rung's real advantage. Deterministic: splitmix64 streams keyed by
  * row/query index.
  *
  * Run: SPARK_DRIVER_MEM=24g sbt "runMain graft.tools.IvfBqCrossoverProbe [nMillions...]"
  */
object IvfBqCrossoverProbe {
  private val Dim = 128
  private val NWords = Dim / 64
  private val NCells = 256
  private val Q = 64
  private val K = 10
  private val Shortlist = 2000

  private def splitmix64(seed0: Long): () => Long = {
    var seed = seed0
    () => {
      seed += 0x9E3779B97F4A7C15L
      var z = seed
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
  }

  def main(args: Array[String]): Unit = {
    val scales = if (args.nonEmpty) args.map(_.toInt) else Array(10, 50, 100)
    // HIERARCHICAL cell sign centers: 32 super-centers, each with 8
    // perturbed variants (flip p=1/4 from the super-center) — sibling
    // cells are genuinely confusable, so a query's true Hamming
    // neighbors spread across several cells and the nProbe curve
    // measures real routing loss instead of a degenerate 1.0 (the
    // first cut used independent random centers: every query routed
    // perfectly at nProbe=4, which is not a curve)
    val centerRnd = splitmix64(42L)
    val superCenters = Array.fill((NCells / 8) * NWords)(centerRnd())
    val centers = Array.tabulate(NCells * NWords) { i =>
      val c = i / NWords; val w = i % NWords
      superCenters((c / 8) * NWords + w) ^ (centerRnd() & centerRnd())
    }
    scales.foreach { millions =>
      val n = millions * 1000000
      val perCell = n / NCells
      val words = new Array[Long](n.toLong.toInt * NWords)
      // rows grouped by cell (CSR-position order): row slot p belongs
      // to cell p / perCell; bits = center XOR flip-noise(p=1/8)
      java.util.stream.IntStream.range(0, n).parallel().forEach { p =>
        val cell = math.min(p / perCell, NCells - 1)
        val rnd = splitmix64(0xC0FFEEL + p)
        // every row is a 50/50 bit-blend of its cell center and a
        // SIBLING center (same super-center group), plus flip noise —
        // rows genuinely sit between confusable cells, so a query's
        // true Hamming neighbors straddle cell boundaries and the
        // nProbe curve measures real routing loss (a pure
        // center+noise corpus routes perfectly at nProbe=1, which is
        // no curve at all)
        val sib = (cell & ~7) | (((cell & 7) + 1 + ((rnd() >>> 1) % 7)).toInt & 7)
        var w = 0
        while (w < NWords) {
          val blend = rnd()
          val base2 = (centers(cell * NWords + w) & ~blend) |
            (centers(sib * NWords + w) & blend)
          val flips = rnd() & rnd() & rnd()
          words(p * NWords + w) = base2 ^ flips
          w += 1
        }
      }
      val cellStart = Array.tabulate(NCells + 1)(c => math.min(c * perCell, n))
      // queries: noisy members of spread clusters
      val qWords = new Array[Long](Q * NWords)
      val qCell = new Array[Int](Q)
      for (q <- 0 until Q) {
        val rnd = splitmix64(0xBEEFL + q)
        val cell = ((rnd() >>> 1) % NCells).toInt
        qCell(q) = cell
        val sib = (cell & ~7) | (((cell & 7) + 1 + ((rnd() >>> 1) % 7)).toInt & 7)
        for (w <- 0 until NWords) {
          // queries blend cells the same way the corpus does
          val blend = rnd()
          val base2 = (centers(cell * NWords + w) & ~blend) |
            (centers(sib * NWords + w) & blend)
          qWords(q * NWords + w) = base2 ^ (rnd() & rnd() & rnd())
        }
      }

      // the flat sweep: Hamming top-Shortlist over every row (the
      // topkBq pass-1 loop, mask-free), per query, 32-way parallel
      def flatTopk(q: Int, cap: Int): Array[Int] = {
        val selIdx = new Array[Int](cap)
        val selHam = new Array[Int](cap)
        var size = 0
        var g = 0
        while (g < n) {
          var ham = 0
          var w = 0
          val base = g * NWords
          while (w < NWords) {
            ham += java.lang.Long.bitCount(qWords(q * NWords + w) ^ words(base + w))
            w += 1
          }
          val beats = size < cap || ham < selHam(size - 1) ||
            (ham == selHam(size - 1) && g < selIdx(size - 1))
          if (beats) {
            var pos = if (size < cap) size else cap - 1
            while (pos > 0 && (ham < selHam(pos - 1) ||
              (ham == selHam(pos - 1) && g < selIdx(pos - 1)))) {
              selHam(pos) = selHam(pos - 1); selIdx(pos) = selIdx(pos - 1)
              pos -= 1
            }
            selHam(pos) = ham; selIdx(pos) = g
            if (size < cap) size += 1
          }
          g += 1
        }
        java.util.Arrays.copyOf(selIdx, math.min(size, cap))
      }

      // the routed sweep: Hamming to every cell center (the routing
      // tax), then the probed cells' members only
      def routedTopk(q: Int, nProbe: Int, cap: Int): Array[Int] = {
        val cellHam = new Array[Int](NCells)
        var c = 0
        while (c < NCells) {
          var ham = 0
          var w = 0
          while (w < NWords) {
            ham += java.lang.Long.bitCount(
              qWords(q * NWords + w) ^ centers(c * NWords + w))
            w += 1
          }
          cellHam(c) = ham
          c += 1
        }
        val probed = (0 until NCells).sortBy(c2 => (cellHam(c2), c2)).take(nProbe)
        val selIdx = new Array[Int](cap)
        val selHam = new Array[Int](cap)
        var size = 0
        probed.foreach { cell =>
          var p = cellStart(cell)
          val end = cellStart(cell + 1)
          while (p < end) {
            var ham = 0
            var w = 0
            val base = p * NWords
            while (w < NWords) {
              ham += java.lang.Long.bitCount(qWords(q * NWords + w) ^ words(base + w))
              w += 1
            }
            val beats = size < cap || ham < selHam(size - 1) ||
              (ham == selHam(size - 1) && p < selIdx(size - 1))
            if (beats) {
              var pos = if (size < cap) size else cap - 1
              while (pos > 0 && (ham < selHam(pos - 1) ||
                (ham == selHam(pos - 1) && p < selIdx(pos - 1)))) {
                selHam(pos) = selHam(pos - 1); selIdx(pos) = selIdx(pos - 1)
                pos -= 1
              }
              selHam(pos) = ham; selIdx(pos) = p
              if (size < cap) size += 1
            }
            p += 1
          }
        }
        java.util.Arrays.copyOf(selIdx, math.min(size, cap))
      }

      def timeParallel(body: Int => Array[Int]): (Double, Array[Array[Int]]) = {
        val out = new Array[Array[Int]](Q)
        val t0 = System.nanoTime()
        java.util.stream.IntStream.range(0, Q).parallel()
          .forEach(q => out(q) = body(q))
        ((System.nanoTime() - t0) / 1e6 / Q, out)
      }

      // warm + measure the flat sweep (top-K ground truth at full
      // shortlist depth is the same arrays' prefix)
      timeParallel(q => flatTopk(q, 64)) // JIT warm on a small cap
      timeParallel(q => routedTopk(q, 4, 64))
      val (flatMs, flatSel) = timeParallel(q => flatTopk(q, Shortlist))
      val flatTop = flatSel.map(_.take(K).toSet)
      println(f"CROSSOVER n=${millions}M flat_ms_per_q=$flatMs%.1f")
      for (nProbe <- Seq(4, 16, 64, NCells)) {
        val (routedMs, routedSel) = timeParallel(q => routedTopk(q, nProbe, Shortlist))
        val recall = (0 until Q).map { q =>
          (flatTop(q) & routedSel(q).take(K).toSet).size.toDouble / K
        }.sum / Q
        println(f"CROSSOVER n=${millions}M nProbe=$nProbe%3d " +
          f"routed_ms_per_q=$routedMs%.1f speedup=${flatMs / routedMs}%.1fx " +
          f"routing_recall@$K=$recall%.3f")
      }
    }
  }
}
