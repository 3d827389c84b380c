package graft

/**
 * Entry-selection experiment (not part of the suite). Run:
 *   sbt "Test/runMain graft.NswEntryExperiment"
 *
 * Question: does the node-0 beam entry become a bottleneck as a
 * partition graph grows (would √n pivot entry selection or hnswlib-
 * style multi-layer descent pay for itself)?
 *
 * Measured answer (2026-08-12, this machine): NO. Greedy-insertion NSW
 * gives early-inserted nodes long-range links, so the node-0 descent
 * costs a near-constant ~200 distance evals from n=20k to n=100k —
 * evals/query at fixed ef are essentially flat in n (this program
 * prints them), while a √n pivot scan costs 141 evals at 20k and 316
 * at 100k ON TOP of the descent it barely shortens. An A/B of the
 * pivot-entry variant (implemented, measured, then removed — see git
 * history of this file) showed it ADDS 7-119% evals at every (n, ef):
 *   n=20k:  ef=10 +48%, ef=50 +19%, ef=100 +11%, ef=200 +7%
 *   n=100k: ef=10 +119%, ef=50 +48%, ef=100 +27%, ef=200 +15%
 * Multi-layer descent replaces the same ~200-eval descent with
 * ~M·log(n) upper-layer evals, so it cannot materially win either at
 * the 250k partition cap. Node-0 entry stays.
 */
object NswEntryExperiment {
  def main(args: Array[String]): Unit = {
    import graft.pipeline.Nsw
    val rnd = new scala.util.Random(7)
    for (n <- Seq(20000, 100000)) {
      val vecs = Array.fill(n)(Array.fill(16)(rnd.nextGaussian().toFloat))
      val keys = vecs.indices.map(_.toString).toArray
      val t0 = System.nanoTime()
      val g = Nsw.buildLocal(keys, vecs, m = 8, efConstruction = 60, metric = "L2")
      println(f"n=$n build ${(System.nanoTime() - t0) / 1e9}%.1fs " +
        f"(sqrt-n pivot scan would cost ${math.sqrt(n.toDouble)}%.0f evals/query)")
      val queries = Array.fill(30)(Array.fill(16)(rnd.nextGaussian().toFloat))
      for (ef <- Seq(10, 50, 100, 200)) {
        var evals = 0L
        queries.foreach { q =>
          val st = new Nsw.SearchStats
          Nsw.searchLocal(g.vecs, g.adj.map(_.toIndexedSeq), q, ef, -1, "L2",
            stats = st)
          evals += st.distEvals
        }
        println(s"n=$n ef=$ef evals/query=${evals / queries.length}")
      }
    }
  }
}
